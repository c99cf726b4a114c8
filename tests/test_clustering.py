"""Clustering parity vs the reference SequentialClustering + window schedule
and chainer association behavior."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


def _synthetic_points(rng, n_clusters=4, pts_per=300, e=3, n_free=0, noise=0.05):
    """Gaussian blobs in embedding space with seediness peaked at centers."""
    v = e - n_free
    centers = rng.uniform(-0.8, 0.8, size=(n_clusters, e)).astype(np.float32)
    pts, bws, seeds = [], [], []
    for k in range(n_clusters):
        p = centers[k] + rng.randn(pts_per, e).astype(np.float32) * noise
        d = np.linalg.norm(p - centers[k], axis=1)
        s = np.exp(-d / (2 * noise)) * 0.19 + 0.8  # in [0.8, ~0.99]
        pts.append(p)
        bws.append(np.full((pts_per, v), np.log(3.0), np.float32))  # pre-act
        seeds.append(s.astype(np.float32))
    # plus scattered outliers with low seediness
    n_out = 100
    pts.append(rng.uniform(-1, 1, size=(n_out, e)).astype(np.float32))
    bws.append(np.full((n_out, v), np.log(3.0), np.float32))
    seeds.append(rng.uniform(0.0, 0.5, n_out).astype(np.float32))

    emb = np.concatenate(pts)
    bw = np.exp(np.concatenate(bws)) * 10.0  # activated, as the model emits
    seed = np.concatenate(seeds)
    perm = rng.permutation(len(emb))
    return emb[perm], bw[perm], seed[perm]


def _run_reference(emb, bw, seed, meta, tmp_path):
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    in_npz, out_npz = str(tmp_path / "in.npz"), str(tmp_path / "out.npz")
    np.savez(in_npz, embeddings=emb, bandwidths=bw, seediness=seed[:, None],
             meta=json.dumps(meta))
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "ref_cluster_runner.py"), in_npz, out_npz],
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        pytest.fail(f"ref_cluster_runner failed:\n{proc.stdout}\n{proc.stderr}")
    return np.load(out_npz)["labels"]


@pytest.mark.parametrize("n_free,free_stds,max_instances", [
    (0, (), 20),
    (2, (0.3, 0.3), 20),
    (0, (), 2),   # exhausts max_instances -> exercises the stale-mask quirk
])
def test_cluster_parity(n_free, free_stds, max_instances, tmp_path):
    import jax.numpy as jnp

    from stemseg_tpu.inference.clustering import ClusterParams, cluster_window

    rng = np.random.RandomState(0)
    e = 3 + n_free
    emb, bw, seed = _synthetic_points(rng, e=e, n_free=n_free)
    p = len(emb)

    meta = dict(primary=0.5, secondary=0.3, min_seediness=0.8,
                n_free_dims=n_free, free_dim_stds=list(free_stds),
                max_instances=max_instances, label_start=5)
    ref_labels = _run_reference(emb, bw, seed, meta, tmp_path)

    # ours: dense grid [1, 1, P] with all-fg mask
    params = ClusterParams(primary_prob_thresh=0.5, secondary_prob_thresh=0.3,
                           min_seediness_prob=0.8, max_instances=max_instances,
                           n_free_dims=n_free, free_dim_stds=free_stds)
    res = cluster_window(jnp.asarray(emb.reshape(1, 1, p, e)),
                         jnp.asarray(bw.reshape(1, 1, p, -1)),
                         jnp.asarray(seed.reshape(1, 1, p)),
                         jnp.ones((1, 1, p), bool), params, label_start=5)
    ours = np.asarray(res.labels).reshape(p)

    np.testing.assert_array_equal(ours, ref_labels)


def test_cluster_with_bg_mask():
    """Non-fg points must come out as outliers and not affect clustering."""
    import jax.numpy as jnp

    from stemseg_tpu.inference.clustering import ClusterParams, cluster_window

    rng = np.random.RandomState(1)
    emb, bw, seed = _synthetic_points(rng)
    p = len(emb)
    fg = rng.rand(p) > 0.3

    params = ClusterParams()
    res_masked = cluster_window(jnp.asarray(emb.reshape(1, 1, p, 3)),
                                jnp.asarray(bw.reshape(1, 1, p, 3)),
                                jnp.asarray(seed.reshape(1, 1, p)),
                                jnp.asarray(fg.reshape(1, 1, p)), params)
    labels = np.asarray(res_masked.labels).reshape(p)
    assert (labels[~fg] == -1).all()

    # equals clustering the fg subset alone
    pf = int(fg.sum())
    res_subset = cluster_window(jnp.asarray(emb[fg].reshape(1, 1, pf, 3)),
                                jnp.asarray(bw[fg].reshape(1, 1, pf, 3)),
                                jnp.asarray(seed[fg].reshape(1, 1, pf)),
                                jnp.ones((1, 1, pf), bool), params)
    np.testing.assert_array_equal(labels[fg],
                                  np.asarray(res_subset.labels).reshape(pf))


def test_window_schedule():
    from stemseg_tpu.inference import get_subsequence_frames

    # standard: DAVIS T=8 overlap=6, 20-frame video
    wins, pad = get_subsequence_frames(20, 8, 6)
    assert pad is None
    assert wins[0] == list(range(8))
    assert all(len(w) == 8 for w in wins)
    assert wins[1][0] == 2  # stride = 8 - 6
    assert wins[-1][-1] == 19
    # tail window: anchored to end when stride doesn't land exactly
    wins2, _ = get_subsequence_frames(21, 8, 6)
    assert wins2[-1] == list(range(13, 21))
    # short sequence: front-padded with frame 0
    wins3, pad3 = get_subsequence_frames(5, 8, 6)
    assert wins3 == [[0, 0, 0, 0, 1, 2, 3, 4]]
    assert pad3 == [True] * 3 + [False] * 5


def test_chainer_stitching():
    """Two windows, one moving instance: labels must chain across windows."""
    import jax.numpy as jnp

    from stemseg_tpu.inference.chainer import OnlineChainer
    from stemseg_tpu.inference.clustering import ClusterParams, cluster_window

    t_total, h, w, e = 6, 8, 12, 3
    rng = np.random.RandomState(2)

    # one instance: embedding constant over time, fg box moving right
    fg = np.zeros((t_total, h, w), bool)
    emb = np.zeros((t_total, h, w, e), np.float32)
    for t in range(t_total):
        fg[t, 2:6, t:t + 4] = True
    emb[..., :] = 0.25
    emb += rng.randn(*emb.shape).astype(np.float32) * 0.01
    bw = np.full((t_total, h, w, e), 30.0, np.float32)
    seed = np.where(fg, 0.95, 0.1).astype(np.float32)

    windows = []
    for frames in ([0, 1, 2, 3], [2, 3, 4, 5]):
        idx = np.asarray(frames)
        windows.append({
            "frames": frames,
            "embeddings": jnp.asarray(emb[idx]),
            "bandwidths": jnp.asarray(bw[idx]),
            "seediness": jnp.asarray(seed[idx]),
        })

    params = ClusterParams(max_instances=5)

    def cluster_fn(e_, b_, s_, m_, start):
        return cluster_window(e_, b_, s_, m_, params, label_start=start)

    chainer = OnlineChainer(cluster_fn)
    labels, counts, lifetimes, _ = chainer.process(fg, windows)

    assert labels.shape == (t_total, h, w)
    fg_labels = labels[fg]
    ids = np.unique(fg_labels)
    assert len(ids) == 1 and ids[0] == 1, f"expected single chained track, got {ids}"
    assert lifetimes[1] == t_total - 1


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas kernel requires TPU hardware")
def test_pallas_backend_matches_xla():
    """On TPU hardware the fused Pallas kernel must be label-exact vs XLA."""
    import jax.numpy as jnp

    from stemseg_tpu.inference.clustering import ClusterParams, cluster_window

    rng = np.random.RandomState(4)
    emb, bw, seed = _synthetic_points(rng)
    p = len(emb)
    fg = rng.rand(p) > 0.3
    for mode in ("reference", "nearest"):
        params = ClusterParams(secondary_assignment=mode)
        args = (jnp.asarray(emb.reshape(1, 1, p, 3)),
                jnp.asarray(bw.reshape(1, 1, p, 3)),
                jnp.asarray(seed.reshape(1, 1, p)),
                jnp.asarray(fg.reshape(1, 1, p)))
        r_x = cluster_window(*args, params, backend="xla")
        r_p = cluster_window(*args, params, backend="pallas")
        np.testing.assert_array_equal(np.asarray(r_x.labels), np.asarray(r_p.labels))


def test_cluster_time_log():
    """Per-point-count duration buckets (reference ClustererBase,
    clusterers.py:8-29), opt-in via cluster_window(time_log=...)."""
    import jax.numpy as jnp

    from stemseg_tpu.inference.clustering import (ClusterParams,
                                                  ClusterTimeLog,
                                                  cluster_window)

    rng = np.random.RandomState(5)
    emb, bw, seed = _synthetic_points(rng)
    p = len(emb)
    fg = rng.rand(p) > 0.3
    log = ClusterTimeLog()
    params = ClusterParams()
    args = (jnp.asarray(emb.reshape(1, 1, p, 3)),
            jnp.asarray(bw.reshape(1, 1, p, 3)),
            jnp.asarray(seed.reshape(1, 1, p)),
            jnp.asarray(fg.reshape(1, 1, p)))
    r1 = cluster_window(*args, params, backend="xla", time_log=log)
    cluster_window(*args, params, backend="xla", time_log=log)
    r0 = cluster_window(*args, params, backend="xla")  # no log -> unchanged

    assert list(log.summary()) == [p]
    n_calls, mean_s = log.summary()[p]
    assert n_calls == 2 and mean_s > 0
    assert log.average_time > 0
    np.testing.assert_array_equal(np.asarray(r1.labels), np.asarray(r0.labels))
    log.reset_time_log()
    assert log.summary() == {} and log.average_time == 0.0


def _tiled_case(rng, p, e=3, n_free=0):
    emb, bw, seed = _synthetic_points(rng, e=e, n_free=n_free)
    reps = int(np.ceil(p / len(emb)))
    emb = np.tile(emb, (reps, 1))[:p] + rng.randn(p, e).astype(np.float32) * 0.01
    bw = np.tile(bw, (reps, 1))[:p]
    seed = np.clip(np.tile(seed, reps)[:p]
                   + rng.randn(p).astype(np.float32) * 0.01, 0.0, 1.0)
    fg = rng.rand(p) > 0.3
    return emb, bw, seed, fg


@pytest.mark.parametrize("mode,max_instances", [
    ("reference", 20),
    ("nearest", 20),
    ("reference", 2),  # exhausts max_instances -> stale-mask quirk
])
def test_tiled_pallas_interpret_matches_xla(mode, max_instances):
    """The HBM-streaming tiled kernel (interpreter mode on CPU, tiny tiles so
    several tiles + the cross-tile argmax reduction are exercised) must be
    label- and meta-exact vs the XLA fori_loop path."""
    import jax.numpy as jnp

    from stemseg_tpu.inference.clustering import ClusterParams, _cluster
    from stemseg_tpu.ops import cluster_points_pallas_tiled

    rng = np.random.RandomState(7)
    p = 1300 + 17  # not a multiple of the tile size -> exercises padding
    emb, bw, seed, fg = _tiled_case(rng, p)
    params = ClusterParams(secondary_assignment=mode,
                           max_instances=max_instances)

    r_x = _cluster(jnp.asarray(emb), jnp.asarray(bw), jnp.asarray(seed),
                   jnp.asarray(fg), params)

    labels_t, meta = cluster_points_pallas_tiled(
        jnp.asarray(emb), jnp.asarray(bw), jnp.asarray(seed), jnp.asarray(fg),
        e_dims=3, max_instances=max_instances,
        primary=params.primary_prob_thresh,
        secondary=params.secondary_prob_thresh,
        min_seediness=params.min_seediness_prob,
        reference_secondary=(mode == "reference"),
        tile_rows=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(r_x.labels), np.asarray(labels_t))
    k = max_instances
    np.testing.assert_allclose(np.asarray(meta[:k, :3]),
                               np.asarray(r_x.centers), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(meta[:k, 3:6]),
                               np.asarray(r_x.bandwidths), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(meta[:k, -1] > 0.5),
                                  np.asarray(r_x.valid))
    np.testing.assert_allclose(np.asarray(meta[:k, -2]),
                               np.asarray(r_x.seed_probs), rtol=0, atol=0)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas kernel requires TPU hardware")
def test_tiled_pallas_backend_matches_xla_large():
    """On TPU hardware: a >PALLAS_POINT_LIMIT window routes to the tiled
    kernel through the public dispatch and stays label-exact vs XLA."""
    import jax.numpy as jnp

    from stemseg_tpu.inference.clustering import ClusterParams, cluster_window
    from stemseg_tpu.ops import PALLAS_POINT_LIMIT

    rng = np.random.RandomState(11)
    p = PALLAS_POINT_LIMIT + 70_000  # ~330k points -> tiled path
    emb, bw, seed, fg = _tiled_case(rng, p)
    for mode in ("reference", "nearest"):
        params = ClusterParams(secondary_assignment=mode)
        args = (jnp.asarray(emb.reshape(1, 1, p, 3)),
                jnp.asarray(bw.reshape(1, 1, p, 3)),
                jnp.asarray(seed.reshape(1, 1, p)),
                jnp.asarray(fg.reshape(1, 1, p)))
        r_x = cluster_window(*args, params, backend="xla")
        r_p = cluster_window(*args, params, backend="pallas")
        np.testing.assert_array_equal(np.asarray(r_x.labels),
                                      np.asarray(r_p.labels))
