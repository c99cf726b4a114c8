"""Benchmark: 480p 8-frame clips/sec/chip, plus end-to-end pipeline fps.

Mirrors the reference's self-measured fps report
(``/root/reference/stemseg/inference/main.py:119-123``, Timer-based, image
I/O excluded):

* ``clips/s`` — the jitted flagship forward (ResNet-101-FPN + embedding +
  semseg 3D heads) on a fixed 480p bucket [1, 8, 480, 864, 3];
* ``e2e_fps`` — the full streaming pipeline on a synthetic 64-frame 480p
  sequence: sliding-window engine (overlap 6) + fused clustering + track
  chaining, i.e. the reference's "overall fps" with output writing excluded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the reference's V100 fps — unpublished (BASELINE.md),
so null until a reference measurement exists.
"""

import json
import time

import numpy as np


def sync(x):
    # NOTE: block_until_ready does not actually synchronize through the
    # axon tunnel — force execution by fetching a tiny slice.
    np.asarray(x)


def bench_forward(cfg, variables, model):
    import jax

    n, t, h, w = 1, 8, 480, 864
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.randn(n, t, h, w, 3).astype(np.float32) * 50)
    fwd = jax.jit(model.apply)
    out = fwd(variables, images)
    sync(out["embeddings"][0, 0, 0, 0, :1])

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images)
    sync(out["embeddings"][0, 0, 0, 0, :1])
    return iters * n / (time.perf_counter() - start)


def bench_e2e(cfg, variables):
    """Fused one-jit pipeline (the CLI path): whole sequence -> labels in
    <=3 host round-trips. Reports best AND median of 5 (tunnel overhead
    varies run to run; median is the stable regression signal)."""
    from stemseg_tpu.inference.clustering import ClusterParams
    from stemseg_tpu.inference.engine import InferenceEngine
    from stemseg_tpu.inference.fused_pipeline import FusedSequencePipeline
    from stemseg_tpu.inference.windows import get_subsequence_frames
    from stemseg_tpu.models.embedding_utils import get_nb_free_dims

    # RAW uint8 frames — resize/normalize run on device (the CLI fast path)
    t_total, h0, w0 = 64, 480, 854
    rng = np.random.RandomState(0)
    frames = (rng.rand(t_total, h0, w0, 3) * 255).astype(np.uint8)
    windows, _ = get_subsequence_frames(t_total, cfg.input.num_frames, 6)

    engine = InferenceEngine(cfg, variables)
    params = ClusterParams(
        primary_prob_thresh=cfg.clustering.primary_prob_threshold,
        secondary_prob_thresh=cfg.clustering.secondary_prob_threshold,
        min_seediness_prob=cfg.clustering.min_seediness_prob,
        max_instances=cfg.clustering.max_instances,
        n_free_dims=get_nb_free_dims(cfg.model.embedding_dim_mode),
        free_dim_stds=tuple(cfg.training.losses.embedding.free_dim_stds))
    pipe = FusedSequencePipeline(engine, params)

    def run():
        return pipe.run(frames, windows, resize_hw=(480, 854))[0]

    run()  # warmup / compile
    times = []
    for _ in range(5):
        start = time.perf_counter()
        run()
        times.append(time.perf_counter() - start)
    times.sort()
    return t_total / times[0], t_total / times[len(times) // 2]


def main():
    import jax

    from stemseg_tpu.config import default_config
    from stemseg_tpu.models import build_model

    cfg = default_config()
    model = build_model(cfg, for_training=False)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, cfg.input.num_frames, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    clips_per_sec = bench_forward(cfg, variables, model)
    e2e_fps, e2e_fps_median = bench_e2e(cfg, variables)

    print(json.dumps({
        "metric": "480p_8frame_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s",
        "vs_baseline": None,
        "forward_frames_per_sec": round(clips_per_sec * 8, 2),
        "e2e_pipeline_fps": round(e2e_fps, 2),
        "e2e_pipeline_fps_median": round(e2e_fps_median, 2),
    }))


if __name__ == "__main__":
    main()
