"""Benchmark: 480p 8-frame clips/sec/chip on the flagship model forward.

Mirrors the reference's self-measured "model fps" report
(``/root/reference/stemseg/inference/main.py:119-123``, Timer-based, image
I/O excluded): we time only the jitted device forward (ResNet-101-FPN +
embedding + semseg 3D heads) on a fixed 480p bucket ([1, 8, 480, 864, 3]),
steady-state, and convert to clips/sec (1 clip = one 8-frame window) and
frames/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the reference's V100 fps — unpublished (BASELINE.md),
so we report against the conservative estimate recorded there once measured;
until a reference measurement exists it is null.
"""

import json
import time

import numpy as np


def main():
    import jax

    from stemseg_tpu.config import default_config
    from stemseg_tpu.models import build_model

    cfg = default_config()
    model = build_model(cfg, for_training=False, dtype=None)

    n, t, h, w = 1, 8, 480, 864
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.randn(n, t, h, w, 3).astype(np.float32) * 50)

    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, t, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    fwd = jax.jit(model.apply)

    def sync(o):
        # NOTE: block_until_ready does not actually synchronize through the
        # axon tunnel — force execution by fetching a tiny output slice.
        np.asarray(o["embeddings"][0, 0, 0, 0, :1])

    # warmup / compile
    out = fwd(variables, images)
    sync(out)

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images)
    sync(out)  # device executes in order: last-done ≈ all-done
    elapsed = time.perf_counter() - start

    clips_per_sec = iters * n / elapsed
    print(json.dumps({
        "metric": "480p_8frame_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s",
        "vs_baseline": None,
        "frames_per_sec": round(clips_per_sec * t, 2),
    }))


if __name__ == "__main__":
    main()
