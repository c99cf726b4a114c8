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
  includes those transfers (best + median of 3).

* ``train_step_ms_*`` — one optimizer iteration of the jitted train step at
  the production geometry [1, T, 736, 1248] (davis_1 fp32 + mixed
  precision, davis_2 16-frame + remat), with train-step MFU from XLA cost
  analysis and the samples/s the step consumes — the reference's sec/iter
  report (``training/main.py:232-238``);
* ``tunnel_h2d_mbps`` — measured bulk host->device bandwidth, printed so
  wall-clock e2e regressions are attributable to the rig vs the code.

Output contract: the CUMULATIVE JSON line is re-printed after EVERY stage
(pending fields null) — the driver takes the LAST parseable line, so a kill
at any point still captures everything that completed. Round 3 lost its
entire perf record because the line printed exactly once at the very end
and the driver's budget expired during the final stage's compile.

``vs_baseline``: the reference publishes no fps (BASELINE.md), so the
machine-readable baseline is this repo's ROUND-1 capture of the same
headline metric (24.97 clips/s, ``BENCH_r01.json``) — the field carries the
cumulative speedup over the first working implementation.

Compile-latency variance (measured round 5): under the axon tunnel
``.lower().compile()`` returns in <1 s — the REAL compile happens
server-side and blocks the first execution, taking 160-1100 s for the SAME
480p forward HLO depending on service load, and the persistent client
cache cannot shortcut it (entries are written but first-exec still blocks
on the server). Stage order therefore puts first-ever measurements right
after the headline; re-measurements of fields with prior-round records run
last and absorb any overrun.

Failure semantics (per advisor round 3): a stage that raises logs its FULL
traceback to stderr and nulls its fields; a stage that HANGS past the
deadline is abandoned via a watchdog thread (the stuck thread keeps the
device, so all later stages are skipped and the process exits via
os._exit with the JSON already printed). Failed/abandoned stage names are
recorded in the JSON's ``failed_stages`` so driver logs distinguish code
bugs from tunnel drops; exit code stays 0 whenever the headline metric
exists so the driver parses the line.
"""

import json
import os
import sys
import threading
import time
import traceback

import numpy as np

# round-1 headline capture (BENCH_r01.json value) — the reference publishes
# no fps numbers, so vs_baseline is quoted against our own first measurement
_ROUND1_CLIPS_PER_SEC = 24.9653

# nominal dense-matmul peaks (TFLOP/s) by device kind, bf16
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def _enable_compile_cache():
    """Persistent compilation cache: the full bench compiles ~10 programs
    and first-compile latency dominated round 3's overrun. Shared with the
    multichip dryrun (round 4's rc=124 was the same failure mode there)."""
    from stemseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


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
    ONE dispatch + one fetch (in-graph Hungarian association since round
    4). Wall fps (best AND median of 3 — tunnel transfer
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
        for _ in range(3):
            start = time.perf_counter()
            run_wall()
            times.append(time.perf_counter() - start)
        times.sort()
        wall_best = t_total / times[0]
        wall_median = t_total / times[len(times) // 2]
    else:
        wall_best = wall_median = None

    # on-chip: frames pre-staged in HBM, outputs stay on device; since the
    # round-4 in-graph association (lsap.lsa_masked in scan B) this is ONE
    # dispatch with zero intermediate host round-trips
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


def bench_e2e_preset(preset, raw_hw, t_total, resize_embeddings=False,
                     input_dims=None):
    """On-chip e2e fps of the fused pipeline at a non-DAVIS flagship
    geometry — the two configs VERDICT r4 flagged as CPU-verified but
    never measured on real HBM/VMEM:

    * ``youtube_vis`` + ``resize_embeddings=True``: the reference's
      ``--resize_embeddings`` path (4x-upsampled embeddings clustered at
      FULL resolution, ``online_chainer.py:127-140``) — the tiled
      HBM-streaming Pallas clustering kernel's raison d'être (~5.9M points
      per window at 640x1152);
    * ``kitti_mots_2`` + ``input_dims=(800, 1948)``: the reference's
      ``--max_dim 1948`` KITTI-MOTS inference geometry
      (``inference/main.py:201-235``; min_dim rescaled by the CLI's aspect
      logic, 1792/736 ratio -> 800).

    Synthetic raw uint8 frames at the dataset's native camera resolution;
    frames pre-staged in HBM and outputs left on device (same protocol as
    ``bench_e2e``'s device number). Returns (device_fps, backend_used).
    """
    import jax

    from stemseg_tpu.config import load_preset, merge
    from stemseg_tpu.inference.clustering import ClusterParams
    from stemseg_tpu.inference.engine import InferenceEngine
    from stemseg_tpu.inference.fused_pipeline import FusedSequencePipeline, _round_up
    from stemseg_tpu.inference.windows import get_subsequence_frames
    from stemseg_tpu.models import build_model
    from stemseg_tpu.models.embedding_utils import get_nb_free_dims
    from stemseg_tpu.structures.geometry import compute_resize_params

    cfg = load_preset(preset)
    if input_dims is not None:
        cfg = merge(cfg, {"input": {"min_dim": input_dims[0],
                                    "max_dim": input_dims[1]}})

    model = build_model(cfg, for_training=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, cfg.input.num_frames, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    engine = InferenceEngine(
        cfg, variables,
        semseg_resize_scale=4.0 if resize_embeddings else 1.0)
    ccfg = cfg.clustering
    params = ClusterParams(
        primary_prob_thresh=ccfg.primary_prob_threshold,
        secondary_prob_thresh=ccfg.secondary_prob_threshold,
        min_seediness_prob=ccfg.min_seediness_prob,
        max_instances=ccfg.max_instances,
        n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
        free_dim_stds=tuple(cfg.training.losses.embedding.free_dim_stds),
        secondary_assignment=ccfg.secondary_assignment)
    pipe = FusedSequencePipeline(engine, params,
                                 cluster_full_scale=resize_embeddings)

    h0, w0 = raw_hw
    new_w, new_h, _ = compute_resize_params((w0, h0), cfg.input.min_dim,
                                            cfg.input.max_dim)
    overlaps = {"youtube_vis": cfg.data.youtube_vis.inference_frame_overlap,
                "kitti_mots_2": cfg.data.kitti_mots.inference_frame_overlap}
    windows, _ = get_subsequence_frames(t_total, cfg.input.num_frames,
                                        overlaps[preset])

    import jax.numpy as jnp

    # frames generated ON-DEVICE (CLAUDE.md benchmark rule: never
    # device_put >10 MB host arrays — these geometries are ~44 MB and the
    # tunnel's bulk H2D can crawl at 8 MB/s)
    l_pad = _round_up(t_total, 16)
    frames_dev = jax.jit(lambda key: jax.random.randint(
        key, (l_pad, h0, w0, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
        jax.random.PRNGKey(0))
    sync_tiny(frames_dev)

    semseg_output_type = "logits" if preset == "youtube_vis" else "argmax"

    def run_device():
        labels_dev, _, _, fg_dev, _ = pipe.run(
            frames_dev, windows, resize_hw=(new_h, new_w),
            semseg_output_type=semseg_output_type, device_outputs=True)
        sync_tiny(labels_dev)

    run_device()
    times = []
    for _ in range(3):
        start = time.perf_counter()
        run_device()
        times.append(time.perf_counter() - start)
    from stemseg_tpu.structures.geometry import pad_to_multiple

    ph, pw = pad_to_multiple(new_h, new_w)
    scale = 1 if resize_embeddings else 4
    backend = pipe._cluster_backend(
        len(windows[0]) * (ph // scale) * (pw // scale))
    return t_total / min(times), backend


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

    iters = 3
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
    import jax

    _enable_compile_cache()

    from stemseg_tpu.config import default_config
    from stemseg_tpu.models import build_model

    t_bench_start = time.monotonic()
    cfg = default_config()
    model = build_model(cfg, for_training=False)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, cfg.input.num_frames, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    import jax.numpy as jnp

    # Soft deadline: past it, remaining stages are skipped (fields stay
    # null). Round-3 evidence puts the driver's budget below 2700 s, so the
    # default is 15 min. Override with BENCH_DEADLINE_S.
    deadline = time.monotonic() + float(os.environ.get("BENCH_DEADLINE_S",
                                                       "900"))

    def r(x, nd):
        return round(x, nd) if x is not None else None

    # cumulative output — re-emitted after every stage (latest line wins)
    out = {
        "metric": "480p_8frame_clips_per_sec_per_chip",
        "value": None,
        "unit": "clips/s",
        "vs_baseline": None,
        "forward_frames_per_sec": None,
        "forward_clips_per_sec_bf16": None,
        "forward_mfu_fp32": None,
        "forward_mfu_bf16": None,
        "e2e_pipeline_fps": None,
        "e2e_pipeline_fps_median": None,
        "e2e_device_fps": None,
        "e2e_device_fps_bf16": None,
        "e2e_device_fps_ytvis_resize": None,
        "ytvis_cluster_backend": None,
        "e2e_device_fps_kitti_1948": None,
        "kitti_cluster_backend": None,
        "tunnel_h2d_mbps": None,
        "train_step_ms_davis1_fp32": None,
        "train_step_ms_davis1_bf16": None,
        "train_step_ms_davis2_remat": None,
        "train_samples_per_sec_davis1": None,
        "train_mfu_davis1_fp32": None,
        "train_mfu_davis1_bf16": None,
        "sustained_run_recorded": None,
        "failed_stages": [],
    }

    # RECORDED (not re-measured): the round-5 sustained Trainer-loop run on
    # the real chip — 150 steps at the production davis_1 geometry through
    # the actual training/main.py loop (prefetch -> jitted step -> logging
    # -> SIGINT checkpoint at step 60 -> auto-resume -> completion) with a
    # decreasing synthetic-task loss. scripts/train_sustained.py reproduces
    # it; SUSTAINED_r05.json is its committed summary. Surfaced here so the
    # driver record carries the trainability evidence alongside the step
    # timings (the run itself takes ~25 min — too long for a bench stage).
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "SUSTAINED_r05.json")) as fh:
            s = json.load(fh)
        out["sustained_run_recorded"] = {
            "steps": s["steps"], "interrupted_at": s["interrupted_at"],
            "resumed": s["resumed"], "loss_first_k": s["loss_first_k"],
            "loss_last_k": s["loss_last_k"],
            "steps_per_sec_incl_compile":
                s["phase2_steps_per_sec_incl_compile"]}
    except Exception:
        pass

    def emit():
        print(json.dumps(out), flush=True)

    state = {"abandoned": False}

    def stage(fn, n_out=1, name="", exempt=False):
        """Run one bench stage under a watchdog thread. Three outcomes:
        (a) completes -> result; (b) raises -> full traceback to stderr,
        nulls; (c) still running at the deadline -> ABANDONED: the stuck
        thread keeps the device busy, so every later stage is skipped and
        main() exits via os._exit once the JSON is out.

        ``exempt=True`` (the headline stage): never abandoned — the axon
        server-side compile blocks the first execution for 160-1100 s
        depending on service load (round-5 measurements, same HLO), and a
        null headline exits rc=1, which is strictly worse than letting the
        driver's own budget decide. After an exempt stage finishes, later
        stages are guaranteed a 500 s window even if it overran the
        deadline (incremental emission makes a driver kill graceful)."""
        nonlocal deadline
        nulls = (None,) * n_out if n_out > 1 else None
        now = time.monotonic()
        if not exempt and (state["abandoned"] or now > deadline):
            print(f"bench: {name} skipped (deadline)", file=sys.stderr,
                  flush=True)
            out["failed_stages"].append(f"{name}:skipped")
            return nulls
        box = {}

        def run():
            try:
                box["out"] = fn()
            except BaseException:
                box["exc"] = traceback.format_exc()

        th = threading.Thread(target=run, daemon=True, name=f"bench-{name}")
        th.start()
        if exempt:
            th.join()
            deadline = max(deadline, time.monotonic() + 500.0)
        else:
            th.join(max(1.0, deadline - now))
        elapsed = time.monotonic() - now
        if th.is_alive():
            state["abandoned"] = True
            print(f"bench: {name} ABANDONED after {elapsed:.0f}s (deadline); "
                  "device held by stuck stage — skipping the rest",
                  file=sys.stderr, flush=True)
            out["failed_stages"].append(f"{name}:abandoned")
            return nulls
        if "exc" in box:
            print(f"bench: {name} FAILED after {elapsed:.0f}s\n{box['exc']}",
                  file=sys.stderr, flush=True)
            out["failed_stages"].append(f"{name}:error")
            return nulls
        print(f"bench: {name} done in {elapsed:.0f}s", file=sys.stderr,
              flush=True)
        return box["out"]

    # emit the all-null skeleton (with the recorded sustained-run field)
    # BEFORE the headline stage: the headline is watchdog-exempt, so a
    # driver kill during its unbounded join must still leave one parseable
    # line on stdout (round 3 lost its whole record to exactly this)
    emit()

    # the headline metric also runs under the watchdog, but a null headline
    # exits nonzero at the end (the driver must see a real `value`)
    hl = stage(lambda: bench_forward(cfg, variables, model, "fp32"), 2,
               name="forward fp32", exempt=True)
    clips_fp32, mfu_fp32 = hl
    if clips_fp32 is not None:
        out["value"] = round(clips_fp32, 4)
        out["forward_frames_per_sec"] = round(clips_fp32 * 8, 2)
        out["forward_mfu_fp32"] = r(mfu_fp32, 4)
        # ratio vs this repo's ROUND-1 capture (24.97 clips/s, BENCH_r01):
        # the reference publishes no fps (BASELINE.json "published": {}),
        # so the machine-readable baseline is our own first measurement —
        # the cumulative speedup the optimization log delivered
        out["vs_baseline"] = round(clips_fp32 / _ROUND1_CLIPS_PER_SEC, 3)
    emit()

    clips_bf16, mfu_bf16 = stage(
        lambda: bench_forward(cfg, variables, model, "bf16"), 2,
        name="forward bf16")
    out["forward_clips_per_sec_bf16"] = r(clips_bf16, 4)
    out["forward_mfu_bf16"] = r(mfu_bf16, 4)
    emit()

    # the two non-DAVIS flagship inference geometries (VERDICT r4 item 2)
    # run EARLY — right after the headline — because they are the fields
    # with no prior-round record (every later stage has a BENCH_r04 value;
    # a budget overrun should cost re-measurements, not first measurements).
    # YT-VIS --resize_embeddings clusters at FULL scale (tiled Pallas
    # kernel); KITTI-MOTS at --max_dim 1948.
    ytvis = stage(
        lambda: bench_e2e_preset("youtube_vis", raw_hw=(720, 1280),
                                 t_total=16, resize_embeddings=True), 2,
        name="e2e ytvis resize_embeddings")
    fps_ytvis, be_ytvis = ytvis
    out["e2e_device_fps_ytvis_resize"] = r(fps_ytvis, 2)
    out["ytvis_cluster_backend"] = be_ytvis
    emit()

    kitti = stage(
        lambda: bench_e2e_preset("kitti_mots_2", raw_hw=(375, 1242),
                                 t_total=32, input_dims=(800, 1948)), 2,
        name="e2e kitti 1948")
    fps_kitti, be_kitti = kitti
    out["e2e_device_fps_kitti_1948"] = r(fps_kitti, 2)
    out["kitti_cluster_backend"] = be_kitti
    emit()

    # train stages BEFORE the davis e2e stages: round 3 lost the train
    # fields to a budget overrun; forward+train together cover both
    # headline surfaces even if the run is killed mid-way
    train_ms, train_sps, train_mfu = stage(
        lambda: bench_train("davis_1"), 3, name="train davis_1 fp32")
    out["train_step_ms_davis1_fp32"] = r(train_ms, 1)
    out["train_samples_per_sec_davis1"] = r(train_sps, 3)
    out["train_mfu_davis1_fp32"] = r(train_mfu, 4)
    emit()

    train_ms_bf16, _, train_mfu_bf16 = stage(
        lambda: bench_train("davis_1", mixed_precision=True), 3,
        name="train davis_1 bf16")
    out["train_step_ms_davis1_bf16"] = r(train_ms_bf16, 1)
    out["train_mfu_davis1_bf16"] = r(train_mfu_bf16, 4)
    emit()

    e2e_fps, e2e_fps_median, e2e_device_fps = stage(
        lambda: bench_e2e(cfg, variables), 3, name="e2e fp32")
    out["e2e_pipeline_fps"] = r(e2e_fps, 2)
    out["e2e_pipeline_fps_median"] = r(e2e_fps_median, 2)
    out["e2e_device_fps"] = r(e2e_device_fps, 2)
    emit()

    _, _, e2e_device_fps_bf16 = stage(
        lambda: bench_e2e(cfg, variables, dtype=jnp.bfloat16), 3,
        name="e2e bf16")
    out["e2e_device_fps_bf16"] = r(e2e_device_fps_bf16, 2)
    emit()

    h2d_mbps = stage(bench_h2d, name="h2d")
    out["tunnel_h2d_mbps"] = r(h2d_mbps, 1)
    emit()

    # davis_2's 16-frame remat compile is the longest of the run (it killed
    # round 3) — last, so an overrun costs only this one field
    train_ms_d2, _, _ = stage(
        lambda: bench_train("davis_2", remat=True), 3, name="train davis_2")
    out["train_step_ms_davis2_remat"] = r(train_ms_d2, 1)
    emit()

    total = time.monotonic() - t_bench_start
    print(f"bench: all stages finished in {total:.0f}s "
          f"(failed: {out['failed_stages'] or 'none'})",
          file=sys.stderr, flush=True)
    # os._exit: an abandoned stage's thread may be stuck inside the XLA
    # runtime; normal interpreter teardown could hang on it and eat the
    # JSON we already printed. Nonzero only when the headline is missing.
    rc = 0 if out["value"] is not None else 1
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)


if __name__ == "__main__":
    main()
