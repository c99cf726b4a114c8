"""Shared stub installer for the reference-subprocess runners.

The reference imports imgaug and pycocotools (absent from this image) and
calls ``yaml.load`` without a Loader (rejected by modern PyYAML). Every
``ref_*_runner.py`` subprocess needs the same shims; they live here once.

Two pycocotools flavors:

* ``rle_codec=False`` — empty module stubs, enough to satisfy imports
  (model/loss/cluster/train runners, which never touch masks-as-RLE);
* ``rle_codec=True``  — ``pycocotools.mask`` backed by our independently
  tested RLE codec (``stemseg_tpu/utils/rle.py``), for runners that
  execute the reference's writer/inference stack for golden diffs.
"""

import sys
import types


def install_stubs(rle_codec: bool = False, repo_root: str = "/root/repo"):
    for mod_name in ("imgaug", "imgaug.augmenters",
                     "imgaug.augmentables", "imgaug.augmentables.segmaps"):
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            mod.__path__ = []
            sys.modules[mod_name] = mod
            parent, _, child = mod_name.rpartition(".")
            if parent:
                setattr(sys.modules[parent], child, mod)
    sys.modules["imgaug.augmentables.segmaps"].SegmentationMapsOnImage = object

    if rle_codec:
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from stemseg_tpu.utils import rle as codec

        pm = types.ModuleType("pycocotools")
        pm.__path__ = []
        mask_mod = types.ModuleType("pycocotools.mask")
        mask_mod.encode = codec.encode
        mask_mod.decode = codec.decode
        mask_mod.area = codec.area
        mask_mod.toBbox = codec.toBbox
        pm.mask = mask_mod
        sys.modules["pycocotools"] = pm
        sys.modules["pycocotools.mask"] = mask_mod
    else:
        for mod_name in ("pycocotools", "pycocotools.mask"):
            if mod_name not in sys.modules:
                mod = types.ModuleType(mod_name)
                mod.__path__ = []
                sys.modules[mod_name] = mod
                parent, _, child = mod_name.rpartition(".")
                if parent:
                    setattr(sys.modules[parent], child, mod)

    import yaml

    if not getattr(yaml, "_stemseg_patched", False):
        orig = yaml.load
        yaml.load = lambda s, Loader=None: orig(
            s, Loader=Loader or yaml.SafeLoader)
        yaml._stemseg_patched = True
