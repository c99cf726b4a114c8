"""Train-step time attribution: forward / loss / backward / optimizer
(VERDICT r2 item 4 / weak #2).

``bench.py`` reports the whole train step (the reference's sec/iter,
``/root/reference/stemseg/training/main.py:232-238``); this tool splits it
at the davis production geometry [1, T, 736, 1248] by compiling NESTED
subgraphs of the real step and differencing wall times and XLA-counted
flops:

* ``loss_only``  — ``make_output_loss_fn`` on precomputed network outputs
  (target prep + embedding/Lovász/CE/BCE math);
* ``fwd_loss``   — the full loss function (network forward + the above);
  ``forward = fwd_loss - loss_only``;
* ``fwd_bwd``    — ``jax.value_and_grad`` of the loss;
  ``backward = fwd_bwd - fwd_loss``;
* ``full_step``  — the real ``make_train_step`` (adds the SGD update);
  ``optimizer = full_step - fwd_bwd``.

A standalone ``jit(model.apply)`` is deliberately NOT used as the forward
yardstick: materializing the raw head outputs as program results forces
layouts/fusions the embedded forward never pays for (measured 267 ms vs
89 ms for the same math at this geometry) — differencing nested graphs is
the honest split.

MFU follows the repo convention (BASELINE.md): quoted against the chip's
nominal bf16 matmul peak for BOTH fp32 and bf16 runs, since fp32 convs
already execute as single-pass bf16 MXU ops at JAX's default precision.

Each subgraph is >= 50 ms on-chip, far above the ~2.5 ms tunnel dispatch
overhead, so plain wall timing with a tiny-slice sync is accurate
(CLAUDE.md's in-graph scan rules apply only to sub-10 ms ops).

Variants: davis_1 fp32 / mixed precision (bf16 compute, fp32 params — the
reference's apex AMP equivalent, ``training/main.py:53-58``); davis_2
16-frame with and without remat — davis_2 freezes the whole backbone, and
since the frozen-stage stop_gradient means the backward never replays it,
remat there is pure memory headroom, not time.

Prints one JSON object. Run on the real chip: ``python
bench_train_phases.py``.
"""

import json
import time

# single source of truth for the per-device peak table and the tunnel-safe
# tiny-slice sync (CLAUDE.md: block_until_ready doesn't sync through axon)
from bench import _PEAK_TFLOPS, _enable_compile_cache, sync_tiny as _sync


def _time_compiled(compiled, args, iters=6):
    out = compiled(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_variant(preset, mixed_precision=False, remat=False, n_instances=8,
                  hw=(736, 1248)):
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.config import load_preset, merge
    from stemseg_tpu.models import build_model
    from stemseg_tpu.training.step import (create_train_state, make_loss_fn,
                                           make_output_loss_fn,
                                           make_train_step)

    cfg = load_preset(preset)
    if mixed_precision:
        cfg = merge(cfg, {"training": {"mixed_precision": True}})
    t = cfg.input.num_frames
    h, w = hw

    model = build_model(cfg, for_training=True, remat_backbone=remat)
    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jnp.zeros((1, t, 64, 96, 3), jnp.float32))
    state = jax.device_put(state)

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "images": jax.random.normal(k1, (1, t, h, w, 3), jnp.float32) * 50.0,
        "masks": (jax.random.uniform(k2, (1, n_instances, t, h, w))
                  < 0.2).astype(jnp.uint8),
        "ignore_masks": jnp.zeros((1, t, h, w), jnp.uint8),
        "category_ids": jnp.ones((1, n_instances), jnp.int32),
    }

    loss_fn = make_loss_fn(model, cfg)
    output_loss_fn = make_output_loss_fn(model, cfg)

    # precomputed network outputs for the loss-only subgraph
    outs = jax.jit(lambda p, c, im: model.apply(
        {"params": p, "constants": c}, im))(
        state.params, state.constants, batch["images"])
    outs = jax.tree.map(jax.device_put, outs)

    loss_only = jax.jit(lambda o, b: output_loss_fn(o, b)[0])
    c_loss_only = loss_only.lower(outs, batch).compile()

    fwd_loss = jax.jit(lambda p, c, b: loss_fn(p, c, b)[0])
    c_loss = fwd_loss.lower(state.params, state.constants, batch).compile()

    fwd_bwd = jax.jit(lambda p, c, b: jax.value_and_grad(
        lambda pp: loss_fn(pp, c, b)[0])(p))
    c_bwd = fwd_bwd.lower(state.params, state.constants, batch).compile()

    step_fn = make_train_step(model, cfg, tx, donate=False)
    c_step = step_fn.lower(state, batch).compile()

    t_loss_only = _time_compiled(c_loss_only, (outs, batch))
    t_loss = _time_compiled(c_loss, (state.params, state.constants, batch))
    t_bwd = _time_compiled(c_bwd, (state.params, state.constants, batch))
    t_step = _time_compiled(c_step, (state, batch), iters=5)

    dev_kind = jax.devices()[0].device_kind
    peak = _PEAK_TFLOPS.get(dev_kind, 0.0) * 1e12

    f_loss_only, f_loss, f_bwd = (_flops(c) for c in
                                  (c_loss_only, c_loss, c_bwd))
    fwd_s = max(t_loss - t_loss_only, 1e-9)
    bwd_s = max(t_bwd - t_loss, 1e-9)
    fwd_flops = max(f_loss - f_loss_only, 0.0)
    bwd_flops = max(f_bwd - f_loss, 0.0)

    def mfu(fl, s):
        return round(fl / s / peak, 4) if (fl and peak) else None

    return {
        "forward_ms": round(fwd_s * 1e3, 1),
        "loss_ms": round(t_loss_only * 1e3, 1),
        "backward_ms": round(bwd_s * 1e3, 1),
        "optimizer_ms": round((t_step - t_bwd) * 1e3, 1),
        "full_step_ms": round(t_step * 1e3, 1),
        "fwd_mfu": mfu(fwd_flops, fwd_s),
        "bwd_mfu": mfu(bwd_flops, bwd_s),
        "step_mfu": mfu(_flops(c_step), t_step),
        "bwd_over_fwd_flops": round(bwd_flops / fwd_flops, 2)
        if fwd_flops else None,
        "bwd_over_fwd_time": round(bwd_s / fwd_s, 2),
    }


def main():
    # print each variant AS IT COMPLETES — the tunnel can die mid-run and
    # partial results must not be lost
    variants = [
        ("davis_1_fp32", dict(preset="davis_1")),
        ("davis_1_bf16", dict(preset="davis_1", mixed_precision=True)),
        # inference-bench geometry with the SAME embedded-differencing
        # method: separates geometry from method in the fwd-MFU comparison
        # against bench.py's standalone 480p forward (0.43)
        ("davis_1_fp32_480p", dict(preset="davis_1", hw=(480, 864))),
        ("davis_2_16f_remat", dict(preset="davis_2", remat=True)),
        ("davis_2_16f_noremat", dict(preset="davis_2", remat=False)),
    ]
    _enable_compile_cache()
    results = {}
    for name, kw in variants:
        results[name] = bench_variant(**kw)
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
