"""One-off probe: split loss_only into Lovász-sort vs everything else at the
davis_1 production loss geometry (quarter-res [8, 184, 312], I=8 padded
instances). Times the isolated vmap'd key-value sort (the suspected
dominant op) and a sort-free variant of the full loss for a differenced
estimate. Run on the real chip."""

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

    # full lovasz (sort + cumsums + dot)
    lov = jax.jit(jax.vmap(lovasz.lovasz_hinge))
    t_lov = timeit(lov, logits, labels)

    # the sort alone
    def sort_only(lg, lb):
        neg_sorted, gt_sorted = jax.lax.sort((-lg, lb), num_keys=1)
        return neg_sorted[..., :1] + gt_sorted[..., :1]

    srt = jax.jit(jax.vmap(sort_only))
    t_sort = timeit(srt, logits, labels)

    # single-key packed sort: bitcast f32 keys to a sortable uint32 order
    # and pack the binary label into bit 0 (keys spaced >= 2 ulps apart so
    # the packed bit never reorders distinct keys — here just a THROUGHPUT
    # probe of 1-array vs 2-array sort)
    def packed_sort(lg, lb):
        bits = jax.lax.bitcast_convert_type(-lg, jnp.uint32)
        mono = jnp.where(bits >> 31 == 0, bits | jnp.uint32(1 << 31),
                         ~bits)  # monotone total order for floats
        packed = (mono & jnp.uint32(0xFFFFFFFE)) | lb.astype(jnp.uint32)
        s = jax.lax.sort(packed)
        return s[..., :1]

    psrt = jax.jit(jax.vmap(packed_sort))
    t_packed = timeit(psrt, logits, labels)

    # value_and_grad of the lovasz term (the training-relevant cost)
    def loss(lg):
        return jnp.sum(jax.vmap(lovasz.lovasz_hinge)(lg, labels))

    g = jax.jit(jax.value_and_grad(loss))
    t_grad = timeit(g, logits)

    print({
        "P": P, "I": I,
        "lovasz_fwd_ms": round(t_lov * 1e3, 2),
        "sort_only_ms": round(t_sort * 1e3, 2),
        "packed_sort_ms": round(t_packed * 1e3, 2),
        "lovasz_fwd_bwd_ms": round(t_grad * 1e3, 2),
    })


if __name__ == "__main__":
    main()
