"""Subprocess helper: run the REFERENCE output writers (DAVIS / YT-VIS /
KITTI-MOTS) on pipeline outputs produced by our framework, for byte-level
golden diffs of the final artifact files.

``python tests/ref_writer_runner.py <in.npz> <out_dir>``. Input keys:

* ``labels`` [T, h, w] int64 dense track labels (-1 = outlier/bg)
* ``category`` (optional) [T, h, w, C] float semseg logits (ytvis) or
  [T, h, w] int64 argmax labels (kitti)
* ``meta`` json: dataset ('davis'|'ytvis'|'kittimots'), seq_id, image_dims
  (h, w), min_dim, max_dim, mask_scale, max_tracks, upscaled_inputs,
  counts / lifetimes as [[id, value], ...] preserving insertion order (the
  reference's keep-ranking uses a stable sort, so dict order matters),
  category_names (ytvis)

pycocotools is absent from this image; its ``mask`` module is stubbed with
our RLE codec (``stemseg_tpu/utils/rle.py``) which is independently tested
against hand-derived COCO-format vectors — so the diff checks geometry,
ordering and format, with the codec as shared trusted ground.
"""

import json
import sys
import types


from _ref_stubs import install_stubs


def _install_stubs(*a, **k):
    install_stubs(rle_codec=True)


class _Seq:
    def __init__(self, seq_id, image_dims):
        self.id = seq_id
        self.seq_id = seq_id
        self.image_dims = tuple(image_dims)


def main(in_npz, out_dir, reference_root="/root/reference"):
    import numpy as np

    sys.path.insert(0, reference_root)
    _install_stubs()

    import torch

    torch.set_num_threads(2)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False

    data = np.load(in_npz)
    meta = json.loads(str(data["meta"]))

    from stemseg.config import cfg

    cfg.INPUT.update_param("MIN_DIM", meta["min_dim"])
    cfg.INPUT.update_param("MAX_DIM", meta["max_dim"])

    labels = torch.from_numpy(data["labels"])
    t, h, w = labels.shape

    # per-frame coordinate lists + label vectors (the reference contract);
    # coords cover every non-background pixel — outlier (-1) labels among
    # them never match a kept id, exactly as in the reference pipeline
    track_mask_idxes, track_mask_labels = [], []
    for ti in range(t):
        ys, xs = (labels[ti] != -1).nonzero(as_tuple=True)
        track_mask_idxes.append((ys, xs))
        track_mask_labels.append(labels[ti][ys, xs])

    counts = dict((int(k), int(v)) for k, v in meta["counts"])
    lifetimes = dict((int(k), int(v)) for k, v in meta["lifetimes"])

    category_masks = None
    if "category" in data.files:
        cat = torch.from_numpy(data["category"])
        if cat.dim() == 4:  # [T, h, w, C] logits -> reference layout [T,C,h,w]
            category_masks = cat.permute(0, 3, 1, 2).float()
        else:
            category_masks = cat.long()

    seq = _Seq(meta["seq_id"], meta["image_dims"])
    kwargs = dict(upscaled_inputs=meta["upscaled_inputs"])

    if meta["dataset"] == "davis":
        from stemseg.inference.output_utils.davis import DavisOutputGenerator

        gen = DavisOutputGenerator(out_dir, -1, False, **kwargs)
    elif meta["dataset"] == "ytvis":
        from stemseg.inference.output_utils.youtube_vis import (
            YoutubeVISOutputGenerator,
        )

        gen = YoutubeVISOutputGenerator(out_dir, -1, False, None,
                                        meta["category_names"], **kwargs)
    else:
        from stemseg.inference.output_utils.kitti_mots import (
            KittiMOTSOutputGenerator,
        )

        gen = KittiMOTSOutputGenerator(out_dir, -1, False, **kwargs)

    gen.process_sequence(
        seq, track_mask_idxes, track_mask_labels, counts, lifetimes,
        category_masks, (h, w), meta["mask_scale"], meta["max_tracks"],
        device="cpu")
    if meta["dataset"] == "ytvis":
        gen.save()
    elif meta["dataset"] == "kittimots":
        # write the raw txt only — NMS postprocessing is compared separately
        pass


if __name__ == "__main__":
    main(*sys.argv[1:])
