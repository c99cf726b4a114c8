"""Subprocess helper: run the reference SequentialClustering on CPU.

``python tests/ref_cluster_runner.py <in.npz> <out.npz>``. Input keys:
``embeddings`` [P, E], ``bandwidths`` [P, V], ``seediness`` [P, 1] (fg points
only), ``meta`` json (thresholds, free dims, label_start).
Output: ``labels`` [P] int64.
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

    from stemseg.inference.clusterers import SequentialClustering

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
    labels, _ = clusterer(
        torch.from_numpy(data["embeddings"]),
        bandwidths=torch.from_numpy(data["bandwidths"]),
        seediness=torch.from_numpy(data["seediness"]),
        cluster_label_start=meta["label_start"],
    )
    np.savez(out_npz, labels=labels.numpy())


if __name__ == "__main__":
    main(*sys.argv[1:])
