"""One-off probe: single u64 packed sort vs 2-operand 32-bit sort at the
davis_1 loss geometry, plus the full output-loss fwd+bwd split (what remains
after the Lovász custom VJP). Run on the real chip."""

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

    I, T, H, W = 8, 8, 184, 312
    P = T * H * W
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (I, P), jnp.float32)
    labels = (jax.random.uniform(k2, (I, P)) < 0.2).astype(jnp.float32)

    def errors_of(lg, lb):
        return 1.0 - lg * (2.0 * lb - 1.0)

    # current forward sort: (f32 key, i32 payload)
    def sort2(lg, lb):
        errors = errors_of(lg, lb)
        iota = jax.lax.iota(jnp.int32, errors.shape[-1])
        packed = (iota << 1) | lb.astype(jnp.int32)
        neg_sorted, ps = jax.lax.sort((-errors, packed), num_keys=1)
        return neg_sorted[..., :1] + ps[..., :1].astype(jnp.float32)

    # u64 packed: monotone key bits in high 32, payload in low 32
    def sort64(lg, lb):
        errors = errors_of(lg, lb)
        neg = -errors
        bits = jax.lax.bitcast_convert_type(neg, jnp.uint32)
        mono = jnp.where((bits >> 31) == 0, bits | jnp.uint32(1 << 31), ~bits)
        iota = jax.lax.iota(jnp.uint32, errors.shape[-1])
        payload = (iota << 1) | lb.astype(jnp.uint32)
        packed = (mono.astype(jnp.uint64) << 32) | payload.astype(jnp.uint64)
        s = jax.lax.sort(packed)
        return s[..., :1].astype(jnp.float32)

    # backward-unsort shapes: (i32 key, f32 payload) vs u64
    perm = jax.random.permutation(k1, P)[None].repeat(I, 0)
    w = jax.random.normal(k2, (I, P), jnp.float32)

    def unsort2(p, ww):
        _, u = jax.lax.sort((p, ww), num_keys=1)
        return u[..., :1]

    def unsort64(p, ww):
        bits = jax.lax.bitcast_convert_type(ww, jnp.uint32)
        packed = (p.astype(jnp.uint64) << 32) | bits.astype(jnp.uint64)
        s = jax.lax.sort(packed)
        lo = (s & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(lo, jnp.float32)[..., :1]

    t_s2 = timeit(jax.jit(jax.vmap(sort2)), logits, labels)
    t_s64 = timeit(jax.jit(jax.vmap(sort64)), logits, labels)
    t_u2 = timeit(jax.jit(jax.vmap(unsort2)), perm.astype(jnp.int32), w)
    t_u64 = timeit(jax.jit(jax.vmap(unsort64)), perm.astype(jnp.uint32), w)

    # ---- loss fwd+bwd split: full embedding loss vs lovasz term alone ----
    from stemseg_tpu.losses import EmbeddingLossParams, embedding_loss
    from stemseg_tpu.losses.lovasz import lovasz_hinge

    emb_map = jax.random.normal(k1, (1, T, H, W, 7), jnp.float32)
    masks = (jax.random.uniform(k2, (1, I, T, H, W)) < 0.2).astype(jnp.float32)
    ignore = jnp.zeros((1, T, H, W), jnp.float32)
    params = EmbeddingLossParams()

    def full_loss(em):
        return embedding_loss(em, masks, ignore, params)[0]

    g_full = jax.jit(jax.value_and_grad(full_loss))
    t_full = timeit(g_full, emb_map)

    def lov_only(lg):
        return jnp.sum(jax.vmap(lovasz_hinge)(lg, labels))

    g_lov = jax.jit(jax.value_and_grad(lov_only))
    t_lov = timeit(g_lov, logits)

    print({
        "sort2_ms": round(t_s2 * 1e3, 2),
        "sort64_ms": round(t_s64 * 1e3, 2),
        "unsort2_ms": round(t_u2 * 1e3, 2),
        "unsort64_ms": round(t_u64 * 1e3, 2),
        "embedding_loss_fwdbwd_ms": round(t_full * 1e3, 2),
        "lovasz_fwdbwd_ms": round(t_lov * 1e3, 2),
    })


if __name__ == "__main__":
    main()
