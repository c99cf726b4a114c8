"""Capture + analyze an xplane device trace of the fused pipeline.

This is the tool that found the round-5 transposed-ring win (a 28.5
ms/sequence whole-ring layout copy hidden inside the heads' in-situ
ablation delta). The ablation harness (``bench_fused_ablation.py``)
attributes WHOLE PHASES by stub-differencing with +-15 ms session noise;
this tool names individual HLO ops, so use it when the residual needs a
target, then verify any fix with the ablation/bench protocols.

Environment notes (this image, discovered round 5):

* ``jax.profiler.trace`` works through the axon tunnel; the capture adds
  no measurable overhead to the traced dispatch;
* the tensorboard profile plugin's converter is BROKEN here (protobuf
  descriptor mismatch AND a missing ``xspace_to_tools_data`` pywrap
  symbol) — parse the ``*.xplane.pb`` directly with the proto bindings at
  ``tensorflow.tsl.profiler.protobuf.xplane_pb2`` under
  ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python``;
* per-op durations on the ``XLA Ops`` line are additive self-times;
  ``Async XLA Ops`` events (copy-start/slice-start DMA) span start->done
  and OVERLAP compute — never sum them as cost;
* while/cond entries carry their whole body's time (nesting
  double-counts); use them for per-scan attribution, not totals.

Usage (on the chip):  python scripts/profile_fused.py [--bf16] [--top N]
"""

import argparse
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(bf16: bool, outdir: str):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import default_config
    from stemseg_tpu.inference.clustering import ClusterParams
    from stemseg_tpu.inference.engine import InferenceEngine
    from stemseg_tpu.inference.fused_pipeline import (FusedSequencePipeline,
                                                      _round_up)
    from stemseg_tpu.inference.windows import get_subsequence_frames
    from stemseg_tpu.models import build_model
    from stemseg_tpu.models.embedding_utils import get_nb_free_dims
    from stemseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = default_config()
    model = build_model(cfg, for_training=False)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64, 96, 3), np.float32)))

    t_total, h0, w0 = 64, 480, 854
    windows, _ = get_subsequence_frames(t_total, 8, 6)
    l_pad = _round_up(t_total, 16)
    frames = jax.jit(lambda key: jax.random.randint(
        key, (l_pad, h0, w0, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
        jax.random.PRNGKey(0))
    np.asarray(frames.ravel()[:1])

    engine = InferenceEngine(cfg, variables,
                             dtype=jnp.bfloat16 if bf16 else None)
    c = cfg.clustering
    params = ClusterParams(
        primary_prob_thresh=c.primary_prob_threshold,
        secondary_prob_thresh=c.secondary_prob_threshold,
        min_seediness_prob=c.min_seediness_prob,
        max_instances=c.max_instances,
        n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
        free_dim_stds=tuple(cfg.training.losses.embedding.free_dim_stds))
    pipe = FusedSequencePipeline(engine, params)

    def run():
        labels, _, _, _, _ = pipe.run(frames, windows, resize_hw=(480, 854),
                                      device_outputs=True)
        np.asarray(labels.ravel()[:1])

    run()
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(f"warm run {dt*1e3:.1f} ms = {t_total/dt:.1f} fps", flush=True)
    with jax.profiler.trace(outdir):
        run()
    print(f"trace captured -> {outdir}", flush=True)


def analyze(outdir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    if not pbs:
        sys.exit(f"no xplane.pb under {outdir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if "TPU" in p.name] or list(xs.planes)
    plane = max(planes, key=lambda p: sum(len(l.events) for l in p.lines))
    print(f"plane {plane.name!r}")
    emeta = plane.event_metadata
    for line in plane.lines:
        if not line.events:
            continue
        by_op = defaultdict(float)
        for ev in line.events:
            by_op[emeta[ev.metadata_id].name] += ev.duration_ps / 1e9
        rows = sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
        print(f"\n== line {line.name!r} — top {len(rows)} by summed "
              f"duration (ms) ==")
        for name, ms in rows:
            print(f"{ms:9.3f}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default=None,
                    help="existing trace dir to re-analyze (skips capture)")
    args = ap.parse_args()
    outdir = args.outdir
    if outdir is None:
        outdir = tempfile.mkdtemp(prefix="fused_profile_")
        capture(args.bf16, outdir)
    analyze(outdir, args.top)


if __name__ == "__main__":
    main()
