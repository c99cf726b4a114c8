"""IN-SITU ablation attribution of the fused sequence pipeline.

``bench_fused_phases.py`` measures each phase in isolation at the fused
shapes; the sum under-predicts the measured program (~33% residual in
round 3) because isolated phases fuse freely while the in-situ versions
pay the scan/cond machinery — ring-buffer carry copies, gather layouts,
scan-output stacking. This tool localizes those costs by ABLATION: rebuild
the pipeline with one phase stubbed to same-shape zeros (graph structure
preserved) and difference whole-program on-chip times:

* ``no_heads``        — ``engine._heads_from_features`` stubbed: the delta
  is the true in-situ cost of the 3D heads including their ring gathers;
* ``no_backbone_new`` — schedule with ``has_new=False`` past window 0: the
  per-window incremental backbone's ``lax.cond`` takes the pass-through
  branch at runtime (same executable as the baseline — directly
  comparable), isolating its in-situ cost;
* ``no_cluster``      — ``_cluster_window_jit`` stubbed: scan B's
  clustering cost in place.

DCE guard: a stub that returns pure zeros makes everything upstream of it
dead (the no_heads run would DCE the whole backbone, the no_cluster run
would DCE the heads) and the deltas would double-count. Every stub
therefore carries a value-preserving ``1e-30 * sum(input)`` dependency on
its full input, exactly like ``bench_fused_phases.time_ingraph`` — the
upstream phases stay live, only the stubbed phase's own compute vanishes.

Ablated outputs are garbage by construction; only times matter. The
residual after subtracting the deltas and the isolated prelude estimate is
the irreducible machinery (scan/carry, scatter/derive, intersections).
Since round 4 the Hungarian association runs IN-GRAPH (``lsap.lsa_masked``
inside scan B — no host round trips); its in-situ cost is ablated like the
other phases by stubbing ``fp.lsa_masked``.

Run on the real chip: ``python bench_fused_ablation.py``.
"""

import contextlib
import json
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def _time_pipeline(pipe, frames_dev, windows, iters=3):
    def run():
        labels_dev, _, _, fg_dev, _ = pipe.run(
            frames_dev, windows, resize_hw=(480, 854), device_outputs=True)
        _sync(labels_dev)

    run()  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_graph_only(pipe, frames_dev, windows, iters=3):
    """Time ONLY the fused graph dispatch with the schedule prebuilt: the
    difference vs ``_time_pipeline`` is the per-call host overhead
    (``_Schedule`` construction + dispatch). The association round-trip
    stall this used to isolate (54 ms fp32 / 36 ms bf16 through the tunnel
    in round 4's first half) is gone by design — the Hungarian runs
    in-graph."""
    import jax.numpy as jnp

    from stemseg_tpu.inference import fused_pipeline as fp

    t_total = max(max(w) for w in windows) + 1
    l_pad = fp._round_up(t_total, 16)
    w_pad = fp._round_up(len(windows), 4)
    sched = fp._Schedule(windows, pipe.cluster_params.max_instances,
                         l_pad, w_pad)
    band = pipe._band(sched.lookback)
    variables = {"params": pipe.engine.params,
                 "constants": pipe.engine.constants}
    shape_key = (l_pad, w_pad, sched.t_win, sched.ring_rows)
    backend = pipe._cluster_backend(
        sched.t_win * (480 // 4) * (864 // 4))
    xs = sched.as_xs()

    def run():
        out = pipe._fused(variables, jnp.asarray(frames_dev), xs,
                          resize_hw=(480, 854), semseg_output_type="probs",
                          seediness_fg_threshold=0.25, backend=backend,
                          shape_key=shape_key, band=band)
        _sync(out["labels"])

    run()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def _patched(obj, name, value):
    orig = getattr(obj, name)
    setattr(obj, name, value)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import default_config
    from stemseg_tpu.inference import fused_pipeline as fp
    from stemseg_tpu.inference.clustering import ClusterParams, ClusterResult
    from stemseg_tpu.inference.engine import InferenceEngine as _Engine
    from stemseg_tpu.inference.windows import get_subsequence_frames
    from stemseg_tpu.models import build_model
    from stemseg_tpu.models.embedding_utils import get_nb_free_dims

    # --bf16: the CLI's --bf16 path (compute-dtype backbone/heads/rings;
    # clustering, averaging and the committed volume stay fp32 — the cond
    # branches pin them, fused_pipeline.py scan_a). Skips the intersection/
    # scatter stubs, which measured as differencing noise in fp32 and only
    # exist to prove that; each skipped stub saves one ~2 min 64-frame
    # graph compile through the tunnel.
    bf16 = "--bf16" in sys.argv[1:]
    eng_dtype = jnp.bfloat16 if bf16 else None

    def InferenceEngine(cfg, variables):
        return _Engine(cfg, variables, dtype=eng_dtype)

    cfg = default_config()
    t_total, h0, w0 = 64, 480, 854
    windows, _ = get_subsequence_frames(t_total, cfg.input.num_frames, 6)
    t_win = cfg.input.num_frames

    model = build_model(cfg, for_training=False)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), np.zeros((1, t_win, 64, 96, 3), np.float32)))

    params = ClusterParams(
        primary_prob_thresh=cfg.clustering.primary_prob_threshold,
        secondary_prob_thresh=cfg.clustering.secondary_prob_threshold,
        min_seediness_prob=cfg.clustering.min_seediness_prob,
        max_instances=cfg.clustering.max_instances,
        n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
        free_dim_stds=tuple(cfg.training.losses.embedding.free_dim_stds))

    # frames generated ON-DEVICE (CLAUDE.md: no >10 MB device_put through
    # the tunnel); values are irrelevant — ablated outputs are garbage
    l_pad = fp._round_up(t_total, 16)
    frames_dev = jax.jit(lambda key: jax.random.randint(
        key, (l_pad, h0, w0, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
        jax.random.PRNGKey(0))
    _sync(frames_dev)

    results = {"dtype": "bf16" if bf16 else "fp32"}

    # ---- full (baseline) ----
    eng = InferenceEngine(cfg, variables)
    pipe = fp.FusedSequencePipeline(eng, params)
    t_full = _time_pipeline(pipe, frames_dev, windows)
    results["full_ms"] = round(t_full * 1e3, 1)

    # ---- graph-only: prebuilt schedule; the delta vs full is the per-call
    # host overhead (schedule build + dispatch), NOT an association stall —
    # the Hungarian runs in-graph since round 4. ----
    t_graph = _time_graph_only(pipe, frames_dev, windows)
    results["graph_only_ms"] = round(t_graph * 1e3, 1)
    results["host_overhead_ms"] = round((t_full - t_graph) * 1e3, 1)

    # ---- no_association: the in-graph Hungarian (lsap.lsa_masked) stubbed
    # to no-matches; the relabel then degenerates to identity but its
    # broadcast-compare remains, so the delta is the LSA loops alone ----
    def zero_lsa(cost, row_valid, col_valid):
        # DCE guard: keep the IoU/intersection chain alive through the
        # returned indices (constant -1s would let XLA kill the matmuls)
        dep = (jnp.sum(cost) * 1e-30 > 1.0).astype(jnp.int32)
        c4r = jnp.full((cost.shape[0],), -1, jnp.int32) + dep
        r4c = jnp.full((cost.shape[1],), -1, jnp.int32) + dep
        return c4r, r4c

    with _patched(fp, "lsa_masked", zero_lsa):
        pipe_a = fp.FusedSequencePipeline(InferenceEngine(cfg, variables),
                                          params)
        t = _time_graph_only(pipe_a, frames_dev, windows)
    results["no_association_graph_ms"] = round(t * 1e3, 1)
    results["association_in_situ_ms"] = round((t_graph - t) * 1e3, 1)

    if not bf16:
        # ---- no_intersections: the one-hot + matmul block stubbed ----
        def zero_intersections(existing, labels, ov, cand1, cand2):
            # DCE guard: inter must depend on existing/labels (else the
            # committed gather and the cluster labels feeding it die)
            eps = 1e-30 * (jnp.sum(existing.astype(jnp.float32))
                           + jnp.sum(labels.astype(jnp.float32)))
            return (eps + jnp.zeros((cand1.shape[0], cand2.shape[0]),
                                    jnp.float32),
                    eps + jnp.zeros((cand1.shape[0],), jnp.float32),
                    eps + jnp.zeros((cand2.shape[0],), jnp.float32))

        with _patched(fp, "_intersection_block", zero_intersections):
            pipe_i = fp.FusedSequencePipeline(InferenceEngine(cfg, variables),
                                              params)
            t = _time_graph_only(pipe_i, frames_dev, windows)
        results["no_intersections_graph_ms"] = round(t * 1e3, 1)
        results["intersections_in_situ_ms"] = round((t_graph - t) * 1e3, 1)

        # ---- no_scatter: semseg accumulation stubbed (derive_masks then
        # sees constant zeros; clustering still runs on live emb/bw/seed) ----
        def zero_scatter(acc, cnt, start, wmap):
            eps = 1e-30 * jnp.sum(wmap)  # keep the heads' wmap output alive
            t_win = wmap.shape[0]
            cblk = jax.lax.dynamic_slice_in_dim(cnt, start, t_win, axis=0)
            cnt = jax.lax.dynamic_update_slice_in_dim(cnt, cblk + 1.0, start,
                                                      axis=0)
            return acc + eps, cnt

        with _patched(fp, "_semseg_scatter", zero_scatter):
            pipe_s = fp.FusedSequencePipeline(InferenceEngine(cfg, variables),
                                              params)
            t = _time_graph_only(pipe_s, frames_dev, windows)
        results["no_scatter_graph_ms"] = round(t * 1e3, 1)
        results["scatter_in_situ_ms"] = round((t_graph - t) * 1e3, 1)
    else:
        results["no_intersections_graph_ms"] = None
        results["intersections_in_situ_ms"] = 0.0
        results["no_scatter_graph_ms"] = None
        results["scatter_in_situ_ms"] = 0.0

    # ---- no_backbone_new: same executable, has_new=False at runtime ----
    orig_init = fp._Schedule.__init__

    def patched_init(self, *a, **k):
        orig_init(self, *a, **k)
        self.has_new = np.zeros_like(self.has_new)

    with _patched(fp._Schedule, "__init__", patched_init):
        # run()'s schedule memoization (round 5) would hand back the
        # unpatched baseline schedule — drop it so the patched __init__
        # actually builds this ablation's has_new=False schedule
        pipe._schedule_cache.clear()
        t = _time_pipeline(pipe, frames_dev, windows)
    pipe._schedule_cache.clear()  # don't leak the ablated schedule back
    results["no_backbone_new_ms"] = round(t * 1e3, 1)
    results["backbone_new_in_situ_ms"] = round((t_full - t) * 1e3, 1)

    # ---- no_heads: stub the 3D heads to same-shape zeros ----
    eng2 = InferenceEngine(cfg, variables)
    n_map_ch = cfg.input.num_classes + (
        1 if (eng2.semseg_head is not None
              and eng2.semseg_head.foreground_channel) else 0)
    ss = eng2.semseg_resize_scale

    def zero_heads(coarsest_first, variables=None):
        f = coarsest_first[-1]  # finest level [1, T, h4, w4, C]
        h4, w4 = f.shape[2], f.shape[3]
        dt = jnp.float32
        # DCE guard: keep the backbone + ring gathers alive via a full-input
        # reduction (the FPN's finest map depends on every backbone stage)
        eps = 1e-30 * jnp.sum(f.astype(dt))
        semseg = (eps + jnp.zeros((t_win, int(h4 * ss), int(w4 * ss),
                                   n_map_ch), dt)
                  if eng2.semseg_head is not None else None)
        return (eps + jnp.zeros((t_win, h4, w4, eng2.embedding_size), dt),
                eps + jnp.zeros((t_win, h4, w4, eng2.variance_channels), dt),
                eps + jnp.zeros((t_win, h4, w4), dt),
                semseg)

    eng2._heads_from_features = zero_heads
    pipe2 = fp.FusedSequencePipeline(eng2, params)
    t = _time_pipeline(pipe2, frames_dev, windows)
    results["no_heads_ms"] = round(t * 1e3, 1)
    results["heads_in_situ_ms"] = round((t_full - t) * 1e3, 1)

    # ---- no_cluster: clustering stubbed to empty result ----
    def zero_cluster(emb, bw, seed, fg, label_base, cp, backend):
        k = cp.max_instances
        t_w, hh, ww = seed.shape
        e_full = emb.shape[-1]
        # DCE guard: full-input reduction keeps scan A's heads (which
        # produce emb/bw/seed) alive; flows out via seed_probs/centers,
        # which are jit outputs
        eps = 1e-30 * (jnp.sum(emb) + jnp.sum(bw) + jnp.sum(seed))
        # labels must be data-dependent too: constant labels would let XLA
        # constant-fold the downstream one-hot intersection matmuls
        return ClusterResult(
            labels=jnp.full((t_w, hh, ww), -1, jnp.int32)
            + (eps > 1.0).astype(jnp.int32),
            centers=eps + jnp.zeros((k, e_full), jnp.float32),
            bandwidths=jnp.zeros((k, e_full), jnp.float32),
            valid=jnp.zeros((k,), bool),
            seed_probs=eps + jnp.zeros((k,), jnp.float32))

    with _patched(fp, "_cluster_window_jit", zero_cluster):
        pipe3 = fp.FusedSequencePipeline(InferenceEngine(cfg, variables),
                                         params)
        t = _time_pipeline(pipe3, frames_dev, windows)
    results["no_cluster_ms"] = round(t * 1e3, 1)
    results["cluster_in_situ_ms"] = round((t_full - t) * 1e3, 1)

    explained = (results["heads_in_situ_ms"]
                 + results["backbone_new_in_situ_ms"]
                 + results["cluster_in_situ_ms"]
                 + results["host_overhead_ms"]
                 + results["association_in_situ_ms"]
                 + results["intersections_in_situ_ms"]
                 + results["scatter_in_situ_ms"])
    results["machinery_residual_ms"] = round(results["full_ms"] - explained, 1)
    results["note"] = ("machinery_residual = full - in-situ deltas - host "
                       "overhead: prelude backbone, scan/carry overhead, "
                       "derive, differencing bias")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
