"""Subprocess helper: run the reference PyTorch model and dump golden data.

Executed as ``python tests/ref_runner.py <input.npz> <out.npz>`` in a clean
process (torch and JAX dislike sharing one process's thread pools). Reads a
clip from ``input.npz`` (key ``x``: [N, T, H, W, 3] float32, channels-last),
builds the reference ``TrainingModel`` on its default config, and writes:

* ``state/<torch key>`` — every state-dict entry,
* ``embeddings`` / ``semseg`` — head outputs, converted to [N, T, H, W, C].

pycocotools / imgaug are stubbed (the reference's package ``__init__`` drags
in its data layer, irrelevant here).
"""

import sys
import types

import numpy as np


from _ref_stubs import install_stubs


def _install_stubs(*a, **k):
    install_stubs(rle_codec=False)


def main(input_npz: str, out_npz: str, variant: str = "default",
         reference_root: str = "/root/reference"):
    sys.path.insert(0, reference_root)
    _install_stubs()

    import torch

    torch.set_num_threads(max(1, (torch.get_num_threads() or 2) // 2))

    import os as _os

    from stemseg.config import cfg  # noqa: E402
    from stemseg.utils import RepoPaths  # noqa: E402

    preset_files = {"default": None, "davis": "davis_1.yaml",
                    "ytvis": "youtube_vis.yaml", "x101": None}
    preset = preset_files[variant]
    if preset:
        cfg.merge_from_file(_os.path.join(RepoPaths.configs_dir(), preset))

    if variant == "x101":
        # The reference registers the X-101-FPN backbone key
        # (backbone/__init__.py:9) but its _STAGE_SPECS table lacks it — a
        # latent KeyError. Patch the spec in (same stage layout as R-101,
        # maskrcnn-benchmark convention) and set the ResNeXt group widths so
        # the grouped-conv bottlenecks are actually exercised.
        import stemseg.modeling.backbone.resnet as ref_resnet

        ref_resnet._STAGE_SPECS["X-101-FPN"] = ref_resnet.ResNet101FPNStagesTo5
        cfg.MODEL.BACKBONE.update_param("TYPE", "X-101-FPN")
        cfg.MODEL.RESNETS.update_param("NUM_GROUPS", 32)
        cfg.MODEL.RESNETS.update_param("WIDTH_PER_GROUP", 8)

    from stemseg.modeling.model_builder import build_model  # noqa: E402

    tm = build_model()
    tm.eval()

    x = np.load(input_npz)["x"]  # [N, T, H, W, 3]
    n, t, h, w, _ = x.shape

    out = {}
    for key, val in tm.state_dict().items():
        out[f"state/{key}"] = val.detach().numpy()

    with torch.no_grad():
        xt = torch.from_numpy(
            np.ascontiguousarray(np.transpose(x.reshape(n * t, h, w, 3), (0, 3, 1, 2))))
        feats = tm.backbone(xt)  # finest (4x) first

        def lift(f):
            return f.view(n, t, *f.shape[1:]).permute(0, 2, 1, 3, 4)

        emb = tm.embedding_head([lift(f) for f in feats[::-1]])
        out["embeddings"] = emb.permute(0, 2, 3, 4, 1).numpy()
        if tm.semseg_head is not None:
            semseg = tm.semseg_head([lift(f) for f in feats])
            out["semseg"] = semseg.permute(0, 2, 3, 4, 1).numpy()
        if tm.seediness_head is not None:
            seed = tm.seediness_head([lift(f) for f in feats[::-1]])
            out["seediness"] = seed.permute(0, 2, 3, 4, 1).numpy()

    np.savez(out_npz, **out)


if __name__ == "__main__":
    main(*sys.argv[1:])
