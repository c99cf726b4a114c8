"""One-off probe: two-sort Lovász (unsort-in-forward) vs current impl at
davis_1 production loss geometry. Run on the real chip."""

import time

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.losses import lovasz

    I, T, H, W = 8, 8, 184, 312
    P = T * H * W
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (I, P), jnp.float32)
    labels = (jax.random.uniform(k2, (I, P)) < 0.2).astype(jnp.float32)

    def lovasz2(lg, lb):
        lb = lb.astype(lg.dtype)
        signs = 2.0 * lb - 1.0
        errors = 1.0 - lg * signs
        p = errors.shape[-1]
        iota = jax.lax.iota(jnp.int32, p)
        packed = (iota << 1) | lb.astype(jnp.int32)
        _, packed_sorted = jax.lax.sort((-errors, packed), num_keys=1)
        gt_sorted = (packed_sorted & 1).astype(lg.dtype)
        perm = packed_sorted >> 1
        w = lovasz.lovasz_grad_from_sorted(gt_sorted)
        _, u = jax.lax.sort((perm, w), num_keys=1)
        return jnp.dot(jax.nn.relu(errors), jax.lax.stop_gradient(u))

    # value check vs current
    ref = jax.jit(jax.vmap(lovasz.lovasz_hinge))(logits, labels)
    new = jax.jit(jax.vmap(lovasz2))(logits, labels)
    err = float(jnp.max(jnp.abs(ref - new) / jnp.maximum(jnp.abs(ref), 1e-6)))

    # grad check
    def loss_ref(lg):
        return jnp.sum(jax.vmap(lovasz.lovasz_hinge)(lg, labels))

    def loss_new(lg):
        return jnp.sum(jax.vmap(lovasz2)(lg, labels))

    g_ref = jax.jit(jax.grad(loss_ref))
    g_new = jax.jit(jax.grad(loss_new))
    gr, gn = g_ref(logits), g_new(logits)
    gerr = float(jnp.max(jnp.abs(gr - gn)) / jnp.maximum(jnp.max(jnp.abs(gr)), 1e-12))

    t_fwd_ref = timeit(jax.jit(jax.vmap(lovasz.lovasz_hinge)), logits, labels)
    t_fwd_new = timeit(jax.jit(jax.vmap(lovasz2)), logits, labels)
    vg_ref = jax.jit(jax.value_and_grad(loss_ref))
    vg_new = jax.jit(jax.value_and_grad(loss_new))
    t_vg_ref = timeit(vg_ref, logits)
    t_vg_new = timeit(vg_new, logits)

    print({
        "P": P, "I": I,
        "value_relerr": err, "grad_relerr": gerr,
        "fwd_ref_ms": round(t_fwd_ref * 1e3, 2),
        "fwd_new_ms": round(t_fwd_new * 1e3, 2),
        "fwdbwd_ref_ms": round(t_vg_ref * 1e3, 2),
        "fwdbwd_new_ms": round(t_vg_new * 1e3, 2),
    })


if __name__ == "__main__":
    main()
