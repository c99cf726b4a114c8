"""Component-level forward profiler on the real chip.

Attributes the flagship forward's time (480p 8-frame clip) to backbone,
FPN, and each 3D head, fp32 vs bf16, with XLA cost-analysis FLOPs and
bytes-accessed so each block can be classified compute- vs memory-bound.
This is the attribution tool behind the bf16/forward optimization work
(VERDICT r1 weak #2); not part of the driver bench contract (bench.py is).
"""

import json
import time

import numpy as np


def sync_tiny(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def analyze(fn, *args):
    import jax

    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))

    out = jitted(*args)
    sync_tiny(out)
    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    sync_tiny(out)
    dt = (time.perf_counter() - start) / iters
    return dt, flops, nbytes


def main():
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import default_config
    from stemseg_tpu.inference.engine import InferenceEngine
    from stemseg_tpu.models import build_model

    cfg = default_config()
    model = build_model(cfg, for_training=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, cfg.input.num_frames, 64, 96, 3), np.float32))
    variables = jax.device_put(variables)

    t, h, w = cfg.input.num_frames, 480, 864
    rng = np.random.RandomState(0)
    frames = jax.device_put(rng.randn(t, h, w, 3).astype(np.float32) * 50)

    rows = {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        eng = InferenceEngine(cfg, variables, dtype=dtype)

        # backbone + FPN
        def bb(fr):
            return eng._backbone_features(fr)

        dt_bb, fl_bb, by_bb = analyze(bb, frames)

        feats = jax.jit(bb)(frames)
        coarsest_first = [f[None] for f in feats[::-1]]

        # body alone vs fpn alone
        def body_only(fr):
            return eng.body.apply({"params": eng.params["body"],
                                   "constants": eng.constants["body"]}, fr)

        dt_body, fl_body, by_body = analyze(body_only, frames)
        feats_body = jax.jit(body_only)(frames)

        def fpn_only(fb):
            return eng.fpn.apply({"params": eng.params["fpn"]}, fb)

        dt_fpn, fl_fpn, by_fpn = analyze(fpn_only, feats_body)

        # heads together
        def heads(cf):
            return eng._heads_from_features(cf)

        dt_heads, fl_heads, by_heads = analyze(heads, coarsest_first)

        # embedding head alone
        def emb_head(cf):
            return eng.embedding_head.apply(
                {"params": eng.params["embedding_head"],
                 "constants": eng.constants["embedding_head"]}, cf)

        dt_emb, fl_emb, by_emb = analyze(emb_head, coarsest_first)

        # semseg head alone
        def ss_head(cf):
            return eng.semseg_head.apply(
                {"params": eng.params["semseg_head"]}, cf)

        dt_ss, fl_ss, by_ss = analyze(ss_head, coarsest_first)

        # full forward for reference
        m = model if dtype is None else build_model(cfg, for_training=False,
                                                    dtype=dtype)

        def full(v, im):
            return m.apply(v, im)

        dt_full, fl_full, by_full = analyze(full, variables, frames[None])

        rows[name] = {
            "full_ms": round(dt_full * 1e3, 2),
            "backbone_fpn_ms": round(dt_bb * 1e3, 2),
            "body_ms": round(dt_body * 1e3, 2),
            "fpn_ms": round(dt_fpn * 1e3, 2),
            "heads_ms": round(dt_heads * 1e3, 2),
            "embedding_head_ms": round(dt_emb * 1e3, 2),
            "semseg_head_ms": round(dt_ss * 1e3, 2),
            "full_gflops": round(fl_full / 1e9, 1),
            "body_gflops": round(fl_body / 1e9, 1),
            "fpn_gflops": round(fl_fpn / 1e9, 1),
            "emb_gflops": round(fl_emb / 1e9, 1),
            "ss_gflops": round(fl_ss / 1e9, 1),
            "full_gbytes": round(by_full / 1e9, 2),
            "body_gbytes": round(by_body / 1e9, 2),
            "fpn_gbytes": round(by_fpn / 1e9, 2),
            "emb_gbytes": round(by_emb / 1e9, 2),
            "ss_gbytes": round(by_ss / 1e9, 2),
        }
        print(name, json.dumps(rows[name]), flush=True)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
