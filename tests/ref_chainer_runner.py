"""Subprocess helper: run the reference OnlineChainer + SequentialClustering.

``python tests/ref_chainer_runner.py <in.npz> <out.npz>``. Input keys:
``fg`` [T, H, W] uint8; per window i: ``frames_<i>`` [Tw] int64,
``emb_<i>`` [E, Tw, H, W], ``bw_<i>`` [V, Tw, H, W], ``seed_<i>``
[1, Tw, H, W]; ``meta`` json (cluster thresholds, n_windows).

Output: ``labels`` [T, H, W] int64 dense track labels (-1 = outlier/bg),
scattered from the reference's per-frame fg-pixel label vectors.
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

    torch.set_num_threads(2)
    # the reference chainer moves tensors to CUDA; fake it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False

    from stemseg.inference.clusterers import SequentialClustering
    from stemseg.inference.online_chainer import OnlineChainer

    data = np.load(in_npz)
    meta = json.loads(str(data["meta"]))

    clusterer = SequentialClustering(
        primary_prob_thresh=meta["primary"],
        secondary_prob_thresh=meta["secondary"],
        min_seediness_prob=meta["min_seediness"],
        n_free_dims=meta["n_free_dims"],
        free_dim_stds=meta["free_dim_stds"],
        device="cpu",
        max_instances=meta["max_instances"],
    )
    chainer = OnlineChainer(clusterer, embedding_resize_factor=1.0)

    fg = torch.from_numpy(data["fg"]).byte()
    subseqs = []
    for i in range(meta["n_windows"]):
        subseqs.append({
            "frames": data[f"frames_{i}"].tolist(),
            "embeddings": torch.from_numpy(data[f"emb_{i}"]),
            "bandwidths": torch.from_numpy(data[f"bw_{i}"]),
            "seediness": torch.from_numpy(data[f"seed_{i}"]),
        })

    (track_labels, _, _), mask_idxes, _, _, _ = chainer.process(fg, subseqs)

    t, h, w = fg.shape
    dense = np.full((t, h, w), -1, np.int64)
    for ti in range(t):
        ys, xs = mask_idxes[ti]
        dense[ti, ys.numpy(), xs.numpy()] = track_labels[ti].numpy()

    np.savez(out_npz, labels=dense)


if __name__ == "__main__":
    main(*sys.argv[1:])
