"""Subprocess helper: evaluate the reference losses on synthetic inputs.

``python tests/ref_loss_runner.py <in.npz> <out.npz>``. Input keys:

* ``embedding_map`` — [N, C, T, H, W] float32 (C = E + V + 1)
* ``masks_<i>`` — [I_i, T, H, W] uint8 per sequence (I_i may be 0)
* ``ignore_<i>`` — [T, H, W] uint8 per sequence
* ``semseg_logits`` — [N, T, cls, H, W] float32
* ``semseg_labels_<i>`` — [T, H, W] int64
* ``fg_logits`` — [N, T, H, W] float32
* ``meta`` — json string with embedding_size, n_free_dims, free_dim_stds

Outputs: scalar loss values from the reference ``EmbeddingLoss``,
``CrossEntropyLoss`` and ``TrainingModel.compute_fg_loss`` math.
"""

import json
import sys
import types


from _ref_stubs import install_stubs


def _install_stubs(*a, **k):
    install_stubs(rle_codec=False)


def main(in_npz, out_npz, reference_root="/root/reference"):
    import numpy as np

    sys.path.insert(0, reference_root)
    _install_stubs()

    import torch
    import torch.nn.functional as F

    torch.set_num_threads(2)

    from stemseg.modeling.losses import EmbeddingLoss, CrossEntropyLoss
    from stemseg.utils import ModelOutputConsts as M, LossConsts as L

    data = np.load(in_npz, allow_pickle=True)
    meta = json.loads(str(data["meta"]))

    emb_map = torch.from_numpy(data["embedding_map"])
    n = emb_map.shape[0]

    targets = []
    for i in range(n):
        targets.append({
            "masks": torch.from_numpy(data[f"masks_{i}"]),
            "ignore_masks": torch.from_numpy(data[f"ignore_{i}"]).bool(),
            "semseg_masks": torch.from_numpy(data[f"semseg_labels_{i}"]),
        })

    criterion = EmbeddingLoss(
        4,
        embedding_size=meta["embedding_size"],
        nbr_free_dims=meta["n_free_dims"],
        weight_regularization=0.001,
        weight_lovasz=1.0,
        weight_variance_smoothness=10.0,
        weight_seediness=1.0,
        weight=1.0,
        free_dim_stds=meta["free_dim_stds"],
    )
    out_dict = {M.OPTIMIZATION_LOSSES: {}, M.OTHERS: {}}
    criterion(emb_map, targets, out_dict)

    results = {
        "embedding_total": out_dict[M.OPTIMIZATION_LOSSES][L.EMBEDDING].item(),
        "lovasz": float(out_dict[M.OTHERS][L.LOVASZ_LOSS]),
        "smoothness": float(out_dict[M.OTHERS][L.VARIANCE_SMOOTHNESS]),
        "seediness": float(out_dict[M.OTHERS][L.SEEDINESS_LOSS]),
    }

    # semseg CE — reference computes per-seq scalar CE then the masked no-op
    semseg_logits = torch.from_numpy(data["semseg_logits"])  # [N, T, cls, H, W]
    ce = CrossEntropyLoss()
    ce_out = {M.OPTIMIZATION_LOSSES: {}, M.OTHERS: {}}
    ce(semseg_logits, targets, ce_out)
    results["semseg_ce"] = float(ce_out[M.OTHERS][L.SEMSEG])

    # fg BCE — replicate TrainingModel.compute_fg_loss (model_builder.py:210-244)
    fg_logits = torch.from_numpy(data["fg_logits"])
    loss = 0.0
    for i in range(n):
        gt_fg = (targets[i]["semseg_masks"] > 0).float()
        seq = F.binary_cross_entropy_with_logits(fg_logits[i], gt_fg, reduction="none")
        keep = 1.0 - targets[i]["ignore_masks"].float()
        loss = loss + (seq * keep).sum() / keep.sum()
    results["fg_bce"] = float(loss / n)

    np.savez(out_npz, **results)


if __name__ == "__main__":
    main(*sys.argv[1:])
