"""Benchmark: 480p 8-frame clips/sec/chip, plus end-to-end pipeline fps.

Mirrors the reference's self-measured fps report
(``/root/reference/stemseg/inference/main.py:119-123``, Timer-based, image
I/O excluded):

* ``clips/s`` — the jitted flagship forward (ResNet-101-FPN + embedding +
  semseg 3D heads) on a fixed 480p bucket [1, 8, 480, 864, 3], fp32 and
  bf16, with MFU vs the chip's nominal bf16 peak (fp32 convs on TPU already
  execute as single bf16 MXU passes at JAX's default precision, so fp32 MFU
  is also quoted against the bf16 peak — see BASELINE.md);
* ``e2e_fps`` — the fused one-jit pipeline on a synthetic 64-frame 480p
  sequence: sliding windows (overlap 6) + clustering + track stitching.
  ``e2e_device_fps`` ships the frames to HBM first and keeps outputs on
  device — the on-chip number, independent of the axon tunnel's highly
  variable bulk bandwidth (measured 8-116 MB/s run-to-run); the wall number
  includes those transfers (best + median of 5).

* ``train_step_ms_*`` — one optimizer iteration of the jitted train step at
  the production geometry [1, T, 736, 1248] (davis_1 fp32 + mixed
  precision, davis_2 16-frame + remat), with train-step MFU from XLA cost
  analysis and the samples/s the step consumes — the reference's sec/iter
  report (``training/main.py:232-238``);
* ``tunnel_h2d_mbps`` — measured bulk host->device bandwidth, printed so
  wall-clock e2e regressions are attributable to the rig vs the code.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the reference's V100 fps — unpublished (BASELINE.md),
so null until a reference measurement exists.
"""

import json
import time

import numpy as np

# nominal dense-matmul peaks (TFLOP/s) by device kind, bf16
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def sync_tiny(x):
    # NOTE: block_until_ready does not actually synchronize through the
    # axon tunnel — force execution by fetching a tiny slice (slicing on
    # device so the fetch itself is 4 bytes, not the whole array).
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def bench_forward(cfg, variables, model, dtype_name="fp32"):
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.models import build_model

    n, t, h, w = 1, 8, 480, 864
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.randn(n, t, h, w, 3).astype(np.float32) * 50)

    m = (model if dtype_name == "fp32"
         else build_model(cfg, for_training=False, dtype=jnp.bfloat16))
    # AOT-compile once; the same executable serves both the timing loop and
    # the FLOP count (a second jax.jit would recompile the whole graph
    # through the remote-compile service)
    fwd = jax.jit(m.apply).lower(variables, images).compile()
    out = fwd(variables, images)
    sync_tiny(out["embeddings"])

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images)
    sync_tiny(out["embeddings"])
    dt = (time.perf_counter() - start) / iters

    try:
        ca = fwd.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    dev_kind = jax.devices()[0].device_kind
    peak = _PEAK_TFLOPS.get(dev_kind, 0.0) * 1e12
    mfu = flops / dt / peak if (flops and peak) else None
    return n / dt, mfu


def bench_e2e(cfg, variables, dtype=None, wall=True):
    """Fused one-jit pipeline (the CLI path): whole sequence -> labels in
    <=3 host round-trips. Wall fps (best AND median of 5 — tunnel transfer
    bandwidth varies 10x run to run) plus the on-chip number with frames
    pre-staged in HBM and outputs left on device. ``dtype=bfloat16``
    measures the CLI's ``--bf16`` path (device fps only, skip wall);
    ``wall=False`` skips the bulk-H2D wall loop for callers that only
    consume ``device_fps`` (each wall run ships ~39 MB through the
    tunnel)."""
    import jax

    from stemseg_tpu.inference.clustering import ClusterParams
    from stemseg_tpu.inference.engine import InferenceEngine
    from stemseg_tpu.inference.fused_pipeline import FusedSequencePipeline, _round_up
    from stemseg_tpu.inference.windows import get_subsequence_frames
    from stemseg_tpu.models.embedding_utils import get_nb_free_dims

    # RAW uint8 frames — resize/normalize run on device (the CLI fast path)
    t_total, h0, w0 = 64, 480, 854
    rng = np.random.RandomState(0)
    frames = (rng.rand(t_total, h0, w0, 3) * 255).astype(np.uint8)
    windows, _ = get_subsequence_frames(t_total, cfg.input.num_frames, 6)

    engine = InferenceEngine(cfg, variables, dtype=dtype)
    params = ClusterParams(
        primary_prob_thresh=cfg.clustering.primary_prob_threshold,
        secondary_prob_thresh=cfg.clustering.secondary_prob_threshold,
        min_seediness_prob=cfg.clustering.min_seediness_prob,
        max_instances=cfg.clustering.max_instances,
        n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
        free_dim_stds=tuple(cfg.training.losses.embedding.free_dim_stds))
    pipe = FusedSequencePipeline(engine, params)

    if dtype is None and wall:
        def run_wall():
            return pipe.run(frames, windows, resize_hw=(480, 854))[0]

        run_wall()  # warmup / compile
        times = []
        for _ in range(5):
            start = time.perf_counter()
            run_wall()
            times.append(time.perf_counter() - start)
        times.sort()
        wall_best = t_total / times[0]
        wall_median = t_total / times[len(times) // 2]
    else:
        wall_best = wall_median = None

    # on-chip: frames pre-staged in HBM, outputs stay on device (the two
    # association round-trips and the tiny inters fetch remain — they are
    # part of the algorithm)
    l_pad = _round_up(t_total, 16)
    frames_padded = np.concatenate(
        [frames, np.zeros((l_pad - t_total, h0, w0, 3), np.uint8)], axis=0)
    frames_dev = jax.device_put(frames_padded)
    sync_tiny(frames_dev)

    def run_device():
        labels_dev, _, _, fg_dev, _ = pipe.run(
            frames_dev, windows, resize_hw=(480, 854), device_outputs=True)
        sync_tiny(labels_dev)

    run_device()
    dev_times = []
    for _ in range(3):
        start = time.perf_counter()
        run_device()
        dev_times.append(time.perf_counter() - start)
    device_fps = t_total / min(dev_times)
    return wall_best, wall_median, device_fps


def bench_h2d():
    """Measured tunnel/PCIe host->device bandwidth on a bulk uint8 transfer
    (~39 MB, the shape of a 32-frame 480p raw-uint8 ship). The axon tunnel's
    bulk bandwidth varies 10x run to run; reporting it beside the wall e2e
    number makes regressions attributable to the rig vs the code."""
    import jax

    arr = np.zeros((32, 480, 854, 3), np.uint8)
    x = jax.device_put(arr)  # warm the transfer path / layouts
    sync_tiny(x)
    times = []
    for _ in range(3):
        start = time.perf_counter()
        x = jax.device_put(arr)
        sync_tiny(x)
        times.append(time.perf_counter() - start)
    return arr.nbytes / min(times) / 1e6


def bench_train(preset, mixed_precision=False, remat=False, n_instances=8):
    """One optimizer iteration of the real jitted train step (forward +
    losses + backward + SGD update) at the preset's production geometry
    [1, T, 736, 1248] — the reference's sec/iter report semantics
    (``/root/reference/stemseg/training/main.py:232-238``), measured on
    device. Returns (step_ms, samples/s, mfu)."""
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_preset, merge
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training.step import create_train_state, make_train_step

    cfg = load_preset(preset)
    if mixed_precision:
        cfg = merge(cfg, {"training": {"mixed_precision": True}})
    t = cfg.input.num_frames
    h, w = 736, 1248

    model = build_model(cfg, for_training=True, remat_backbone=remat)
    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jnp.zeros((1, t, 64, 96, 3), jnp.float32))
    state = jax.device_put(state)
    step_fn = make_train_step(model, cfg, tx, donate=False)

    # batch generated ON-DEVICE (bulk H2D through the tunnel can crawl)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "images": jax.random.normal(k1, (1, t, h, w, 3), jnp.float32) * 50.0,
        "masks": (jax.random.uniform(k2, (1, n_instances, t, h, w))
                  < 0.2).astype(jnp.uint8),
        "ignore_masks": jnp.zeros((1, t, h, w), jnp.uint8),
        "category_ids": jnp.ones((1, n_instances), jnp.int32),
    }
    compiled = step_fn.lower(state, batch).compile()

    state, metrics = compiled(state, batch)
    sync_tiny(metrics["total"])

    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = compiled(state, batch)
    sync_tiny(metrics["total"])
    dt = (time.perf_counter() - start) / iters

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    dev_kind = jax.devices()[0].device_kind
    peak = _PEAK_TFLOPS.get(dev_kind, 0.0) * 1e12
    mfu = flops / dt / peak if (flops and peak) else None
    return dt * 1e3, 1.0 / dt, mfu


def main():
    import sys

    import jax

    from stemseg_tpu.config import default_config
    from stemseg_tpu.models import build_model

    cfg = default_config()
    model = build_model(cfg, for_training=False)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, cfg.input.num_frames, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    import jax.numpy as jnp

    # the headline metric fails loudly; every later stage degrades to null —
    # the axon tunnel can drop mid-run and the driver must still capture the
    # stages that completed (exactly one JSON line either way)
    clips_fp32, mfu_fp32 = bench_forward(cfg, variables, model, "fp32")

    print("bench: forward fp32 done", file=sys.stderr, flush=True)

    # soft deadline: the axon tunnel's first-compile + bulk-transfer latency
    # varies by >10x session to session; past the budget the remaining
    # stages are skipped (fields null) so the driver ALWAYS captures the
    # JSON line with whatever completed. Override with BENCH_DEADLINE_S.
    import os
    deadline = time.monotonic() + float(os.environ.get("BENCH_DEADLINE_S",
                                                       "2700"))

    def stage(fn, n_out=1, name=""):
        if time.monotonic() > deadline:
            print(f"bench: {name} skipped (deadline)", file=sys.stderr,
                  flush=True)
            return (None,) * n_out if n_out > 1 else None
        try:
            out = fn()
            print(f"bench: {name} done", file=sys.stderr, flush=True)
            return out
        except Exception as exc:  # tunnel hiccup: keep what we have
            print(f"bench stage {name} failed: {exc!r}", file=sys.stderr,
                  flush=True)
            return (None,) * n_out if n_out > 1 else None

    clips_bf16, mfu_bf16 = stage(
        lambda: bench_forward(cfg, variables, model, "bf16"), 2,
        name="forward bf16")
    e2e_fps, e2e_fps_median, e2e_device_fps = stage(
        lambda: bench_e2e(cfg, variables), 3, name="e2e fp32")
    _, _, e2e_device_fps_bf16 = stage(
        lambda: bench_e2e(cfg, variables, dtype=jnp.bfloat16), 3,
        name="e2e bf16")
    h2d_mbps = stage(bench_h2d, name="h2d")

    train_ms, train_sps, train_mfu = stage(
        lambda: bench_train("davis_1"), 3, name="train davis_1 fp32")
    train_ms_bf16, _, train_mfu_bf16 = stage(
        lambda: bench_train("davis_1", mixed_precision=True), 3,
        name="train davis_1 bf16")
    train_ms_d2, _, _ = stage(
        lambda: bench_train("davis_2", remat=True), 3, name="train davis_2")

    def r(x, nd):
        return round(x, nd) if x is not None else None

    print(json.dumps({
        "metric": "480p_8frame_clips_per_sec_per_chip",
        "value": round(clips_fp32, 4),
        "unit": "clips/s",
        "vs_baseline": None,
        "forward_frames_per_sec": round(clips_fp32 * 8, 2),
        "forward_clips_per_sec_bf16": r(clips_bf16, 4),
        "forward_mfu_fp32": r(mfu_fp32, 4),
        "forward_mfu_bf16": r(mfu_bf16, 4),
        "e2e_pipeline_fps": r(e2e_fps, 2),
        "e2e_pipeline_fps_median": r(e2e_fps_median, 2),
        "e2e_device_fps": r(e2e_device_fps, 2),
        "e2e_device_fps_bf16": r(e2e_device_fps_bf16, 2),
        "tunnel_h2d_mbps": r(h2d_mbps, 1),
        "train_step_ms_davis1_fp32": r(train_ms, 1),
        "train_step_ms_davis1_bf16": r(train_ms_bf16, 1),
        "train_step_ms_davis2_remat": r(train_ms_d2, 1),
        "train_samples_per_sec_davis1": r(train_sps, 3),
        "train_mfu_davis1_fp32": r(train_mfu, 4),
        "train_mfu_davis1_bf16": r(train_mfu_bf16, 4),
    }))


if __name__ == "__main__":
    main()
