"""Per-phase time attribution of the FUSED one-jit sequence pipeline
(VERDICT r2 item 5 / weak #1).

The fused graph (``inference/fused_pipeline.py``) runs, for a 64-frame 480p
DAVIS sequence with overlap-6 windows: a prelude backbone over window 0's
8 frames, then per window — backbone on the <=2 new frames, the 3D heads
over the window's 8 gathered feature rows, a semseg scatter-add — then the
window-average ``derive_masks``, and per window again — clustering and the
intersection one-hot matmuls. ``bench_components.py`` attributes the bare
forward; this tool attributes the fused graph by measuring each phase AT
THE EXACT SHAPES the fused graph uses and multiplying by the schedule's
invocation counts, then comparing the sum against the measured fused
on-chip time (``bench.py e2e_device_fps``): the residual is scan/cond/
gather machinery. It also reports the head-recompute factor — with stride
T - overlap = 2 every frame's heads are recomputed in ~4 windows, which is
the algorithmic cost of the reference's overlap-6 window averaging
(``/root/reference/stemseg/inference/main.py:23-49``), not an
implementation inefficiency.

Microbenchmark methodology (CLAUDE.md): each phase runs R repetitions
inside ONE jit via ``lax.scan``; iteration i's input is perturbed value-
preservingly by the carry scalar and the carry is updated from the phase's
full output, so XLA can neither hoist the phase out of the loop nor DCE
it. Two repetition counts (R1, R2) are measured and differenced to cancel
the fixed dispatch/fetch overhead of the tunnel. Cheap memory-bound phases
carry a small positive bias (one extra read pass of their output for the
carry reduction) — noted per row as ``bias``.

Prints one JSON object. Run on the real chip: ``python bench_fused_phases.py``.
"""

import json
import time

import numpy as np


def _sync(x):
    np.asarray(np.ravel(np.asarray(x))[:1])


def time_ingraph(fn, args, r1=6, r2=30):
    """On-chip per-invocation seconds of ``fn(*args)`` via the two-count
    in-graph scan method. ``fn`` must be traceable; args a flat tuple."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(args)
    float_idx = [i for i, l in enumerate(leaves)
                 if hasattr(l, "dtype") and
                 jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    assert float_idx, "need at least one floating input to carry-perturb"

    def make_loop(reps):
        @jax.jit
        def loop(leaves):
            def body(c, _):
                # perturb EVERY float input with the carry: a compute path
                # fed only by unperturbed inputs is loop-invariant and XLA
                # hoists it out of the scan, yielding impossibly fast times
                pl = list(leaves)
                for i in float_idx:
                    # cast back: bf16 * f32-carry promotes to f32, which
                    # would silently measure the phase on f32 inputs
                    pl[i] = (pl[i] * (1.0 + 1e-30 * c)).astype(pl[i].dtype)
                out = fn(*jax.tree.unflatten(treedef, pl))
                s = jnp.float32(0.0)
                for leaf in jax.tree.leaves(out):
                    s = s + jnp.sum(jnp.abs(jnp.asarray(leaf)
                                            .astype(jnp.float32)))
                return c + 1e-30 * s, None
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=reps)
            return c
        return loop

    loops = {r: make_loop(r) for r in (r1, r2)}
    for r, lp in loops.items():
        _sync(lp(leaves))  # compile + warm
    times = {}
    for r, lp in loops.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(lp(leaves))
            best = min(best, time.perf_counter() - t0)
        times[r] = best
    return (times[r2] - times[r1]) / (r2 - r1)


def main():
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import default_config
    from stemseg_tpu.inference.clustering import (ClusterParams,
                                                  _cluster_window_jit)
    from stemseg_tpu.inference.engine import InferenceEngine, derive_masks
    from stemseg_tpu.inference.windows import get_subsequence_frames

    cfg = default_config()
    t_win, overlap = cfg.input.num_frames, 6
    l_total = 64
    h, w = 480, 864
    h4, w4 = h // 4, w // 4
    windows, _ = get_subsequence_frames(l_total, t_win, overlap)
    n_win = len(windows)
    s_new = t_win - overlap
    l_pad = ((l_total + 15) // 16) * 16

    model_key = jax.random.PRNGKey(0)
    from stemseg_tpu.models import build_model

    model = build_model(cfg, for_training=False)
    variables = model.init(model_key,
                           np.zeros((1, t_win, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    results = {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        eng = InferenceEngine(cfg, variables, dtype=dtype)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        frames_new = jax.random.normal(k1, (s_new, h, w, 3)) * 50.0
        frames_win = jax.random.normal(k2, (t_win, h, w, 3)) * 50.0

        # ---- phase: backbone on the per-window NEW frames ----
        bb_new_s = time_ingraph(
            lambda fr: eng._backbone_features(fr), (frames_new,))
        # ---- phase: prelude backbone (window 0, all T frames) ----
        bb_pre_s = time_ingraph(
            lambda fr: eng._backbone_features(fr), (frames_win,))

        feats = jax.jit(lambda fr: eng._backbone_features(fr))(frames_win)
        coarsest_first = [f[None] for f in feats[::-1]]

        # ---- phase: 3D heads on one window's gathered rows ----
        heads_s = time_ingraph(
            lambda *cf: eng._heads_from_features(list(cf)),
            tuple(coarsest_first))

        # ---- phase: semseg scatter-add accumulate (per window) ----
        n_ch = cfg.input.num_classes + 1
        acc = jnp.zeros((l_pad + 1, h4, w4, n_ch), jnp.float32)
        cnt = jnp.zeros((l_pad + 1,), jnp.float32)
        wmap = jax.random.normal(jax.random.PRNGKey(2),
                                 (t_win, h4, w4, n_ch))
        tgt = jnp.arange(t_win, dtype=jnp.int32)

        def scatter(acc, cnt, wmap):
            return acc.at[tgt].add(wmap), cnt.at[tgt].add(1.0)

        scatter_s = time_ingraph(scatter, (acc, cnt, wmap), r1=40, r2=200)

        # ---- phase: derive_masks over the averaged volume (once) ----
        mean = jax.random.uniform(jax.random.PRNGKey(3),
                                  (l_pad + 1, h4, w4, n_ch))

        def derive(m):
            return derive_masks(m, has_semseg=True,
                                semseg_output_type="probs",
                                seediness_fg_threshold=0.25)

        derive_s = time_ingraph(derive, (mean,), r1=40, r2=200)

        # ---- phase: clustering one window (fp32 by design) ----
        params = ClusterParams(max_instances=20)
        ek = jax.random.PRNGKey(4)
        e_dim, v_dim = eng.embedding_size, eng.variance_channels
        emb = jax.random.normal(ek, (t_win, h4, w4, e_dim))
        bw = jax.random.uniform(ek, (t_win, h4, w4, v_dim)) * 2
        seed = jax.random.uniform(ek, (t_win, h4, w4))
        fg = jax.random.uniform(ek, (t_win, h4, w4)) > 0.5
        from stemseg_tpu.ops import pallas_clustering_supported

        backend = ("pallas" if pallas_clustering_supported(
            t_win * h4 * w4, params.max_instances, e_dims=e_dim) else "xla")

        def cluster(emb, bw, seed):
            return _cluster_window_jit(emb, bw, seed, fg, jnp.int32(1),
                                       params, backend)

        cluster_s = time_ingraph(cluster, (emb, bw, seed), r1=40, r2=200)

        # ---- phase: intersection one-hots + matmul + commit ----
        k = params.max_instances
        band = 80
        # committed passed as FLOAT so time_ingraph's carry perturbation
        # reaches it — as int32 its one-hot path would be loop-invariant
        # and LICM'd out of the timing scan (in the real graph it is the
        # scan carry and changes every window)
        committed_f = jnp.full((l_pad + 1, h4, w4), -1.0, jnp.float32)
        labels = jax.random.randint(jax.random.PRNGKey(5),
                                    (t_win, h4, w4), -1, 40)
        ov = jnp.asarray([1.0] * overlap + [0.0] * s_new)[:, None, None]
        win_frames = jnp.arange(t_win, dtype=jnp.int32)
        labels_f = labels.astype(jnp.float32)

        def intersect(committed_f, labels_f):
            committed = committed_f.astype(jnp.int32)
            labels_i = labels_f.astype(jnp.int32)
            existing = committed[win_frames]
            a = jnp.where(ov > 0.5, existing, -7).reshape(-1)
            b = jnp.where(ov > 0.5, labels_i, -7).reshape(-1)
            cand1 = jnp.maximum(1 + jnp.arange(band, dtype=jnp.int32), 0)
            cand2 = 41 + jnp.arange(k, dtype=jnp.int32)
            oh1 = (a[None, :] == cand1[:, None]).astype(jnp.float32)
            oh2 = (b[None, :] == cand2[:, None]).astype(jnp.float32)
            inter = jax.lax.dot_general(
                oh1, oh2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            com = committed.at[win_frames].set(labels_i)
            return inter, jnp.sum(oh1, 1), jnp.sum(oh2, 1), com

        inter_s = time_ingraph(intersect, (committed_f, labels_f),
                               r1=40, r2=200)

        # ---- schedule counts & ledger ----
        counts = {
            "prelude_backbone": (1, bb_pre_s),
            "backbone_new_frames": (n_win - 1, bb_new_s),
            "heads_per_window": (n_win, heads_s),
            "semseg_scatter": (n_win, scatter_s),
            "derive_masks": (1, derive_s),
            "cluster_per_window": (n_win, cluster_s),
            "intersect_commit": (n_win - 1, inter_s),
        }
        ledger = {ph: {"count": c, "ms_each": round(s * 1e3, 3),
                       "ms_total": round(c * s * 1e3, 2)}
                  for ph, (c, s) in counts.items()}
        predicted_s = sum(c * s for c, s in counts.values())

        # measured fused pipeline on-chip time at the same workload
        from bench import bench_e2e  # reuse the driver bench's fused runner

        _, _, device_fps = bench_e2e(cfg, variables, dtype=dtype, wall=False)
        measured_s = l_total / device_fps

        # algorithmic floor: every frame's backbone+heads computed ONCE
        per_frame_heads = heads_s / t_win + bb_new_s / s_new
        floor_s = (l_total * per_frame_heads + n_win * cluster_s
                   + (n_win - 1) * inter_s + derive_s)

        results[name] = {
            "phases": ledger,
            "predicted_ms": round(predicted_s * 1e3, 1),
            "measured_ms": round(measured_s * 1e3, 1),
            "residual_pct": round(
                100 * (measured_s - predicted_s) / measured_s, 1),
            "head_recompute_factor": round(n_win * t_win / l_total, 2),
            "algorithmic_floor_fps": round(l_total / floor_s, 1),
            "measured_fps": round(device_fps, 1),
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
