"""Full stitching parity: our chainer+clusterer vs the reference
OnlineChainer+SequentialClustering on a synthetic multi-window multi-instance
sequence. Track id VALUES differ by design (disjoint per-window blocks vs
highest+1 — see chainer.py docstring), so the comparison is on canonical
label PARTITIONS."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


def _canonicalize(labels: np.ndarray) -> np.ndarray:
    """Rename ids by first occurrence (row-major scan); -1 stays."""
    out = np.full_like(labels, -1)
    mapping = {}
    flat = labels.reshape(-1)
    of = out.reshape(-1)
    for idx in np.flatnonzero(flat != -1):
        lab = flat[idx]
        if lab not in mapping:
            mapping[lab] = len(mapping)
        of[idx] = mapping[lab]
    return out


def _make_sequence(rng, t_total=10, h=24, w=32, e=3):
    """Two instances moving through the sequence + one appearing later."""
    fg = np.zeros((t_total, h, w), np.uint8)
    emb = rng.randn(t_total, h, w, e).astype(np.float32) * 0.02
    seed = np.full((t_total, h, w), 0.1, np.float32)

    instances = [
        (np.asarray([0.5, -0.4, 0.2]), lambda t: (2, 2 + t)),       # moves right
        (np.asarray([-0.6, 0.5, -0.3]), lambda t: (14, 20 - t)),    # moves left
        (np.asarray([0.1, 0.7, 0.6]), lambda t: (8, 10) if t >= 5 else None),
    ]
    for center_emb, pos in instances:
        for t in range(t_total):
            p = pos(t)
            if p is None:
                continue
            y0, x0 = p
            fg[t, y0:y0 + 6, x0:x0 + 8] = 1
            emb[t, y0:y0 + 6, x0:x0 + 8] += center_emb
            seed[t, y0:y0 + 6, x0:x0 + 8] = 0.95
    bw = np.full((t_total, h, w, e), 40.0, np.float32)
    return fg, emb, bw, seed


def test_chainer_parity(tmp_path):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")

    import jax.numpy as jnp

    from stemseg_tpu.inference.chainer import OnlineChainer
    from stemseg_tpu.inference.clustering import ClusterParams, cluster_window
    from stemseg_tpu.inference.windows import get_subsequence_frames

    rng = np.random.RandomState(0)
    t_total = 10
    fg, emb, bw, seed = _make_sequence(rng, t_total)
    windows, _ = get_subsequence_frames(t_total, 4, 2)

    meta = dict(primary=0.5, secondary=0.3, min_seediness=0.8,
                n_free_dims=0, free_dim_stds=[], max_instances=8,
                n_windows=len(windows))
    case = {"fg": fg, "meta": json.dumps(meta)}
    for i, win in enumerate(windows):
        idx = np.asarray(win)
        case[f"frames_{i}"] = idx.astype(np.int64)
        case[f"emb_{i}"] = np.transpose(emb[idx], (3, 0, 1, 2))   # [E,Tw,H,W]
        case[f"bw_{i}"] = np.transpose(bw[idx], (3, 0, 1, 2))
        case[f"seed_{i}"] = seed[idx][None]                        # [1,Tw,H,W]

    in_npz, out_npz = str(tmp_path / "in.npz"), str(tmp_path / "out.npz")
    np.savez(in_npz, **case)
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "ref_chainer_runner.py"),
         in_npz, out_npz],
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        pytest.fail(f"ref_chainer_runner failed:\n{proc.stdout}\n{proc.stderr}")
    ref_labels = np.load(out_npz)["labels"]

    params = ClusterParams(max_instances=8)

    def cluster_fn(e_, b_, s_, m_, start):
        return cluster_window(e_, b_, s_, m_, params, label_start=start)

    chainer = OnlineChainer(cluster_fn, max_instances=8)
    ours_windows = []
    for win in windows:
        idx = np.asarray(win)
        ours_windows.append({
            "frames": list(win),
            "embeddings": jnp.asarray(emb[idx]),
            "bandwidths": jnp.asarray(bw[idx]),
            "seediness": jnp.asarray(seed[idx]),
        })
    labels, counts, lifetimes, _ = chainer.process(fg.astype(bool), ours_windows)

    np.testing.assert_array_equal(_canonicalize(labels),
                                  _canonicalize(ref_labels))
    # three tracks expected
    assert len([i for i in np.unique(labels) if i != -1]) == 3
