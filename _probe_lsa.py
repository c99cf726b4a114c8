"""One-off probe: on-chip cost of the jittable LSA at the association
geometry (band=40 x k=20), chained over 28 windows inside one jit (the
scan-B usage pattern). Run on the real chip."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stemseg_tpu.inference.lsap import lsa_masked

    B, K, W = 40, 20, 28
    rng = np.random.default_rng(0)
    costs = (rng.integers(0, 9, (W, B, K)) / 8.0).astype(np.float32)
    rvs = rng.random((W, B)) < 0.5
    cvs = rng.random((W, K)) < 0.7

    def chained(costs, rvs, cvs):
        def step(carry, x):
            c, rv, cv = x
            # data-depend on the previous result so windows serialize
            c4r, r4c = lsa_masked(c + 0.0 * carry.astype(c.dtype).sum(), rv, cv)
            return c4r, (c4r, r4c)

        init = jnp.zeros((B,), jnp.int32)
        _, ys = jax.lax.scan(step, init, (costs, rvs, cvs))
        return ys

    fn = jax.jit(chained)
    out = fn(costs, rvs, cvs)
    np.asarray(out[0][:1, :1])  # sync

    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = fn(costs, rvs, cvs)
    np.asarray(out[0][:1, :1])
    dt = (time.perf_counter() - t0) / iters
    print({"chained_28_ms": round(dt * 1e3, 3),
           "per_window_ms": round(dt * 1e3 / W, 4)})

    # correctness spot-check vs scipy on chip results
    from scipy.optimize import linear_sum_assignment
    c4rs = np.asarray(out[0])
    bad = 0
    for w in range(W):
        rows = np.where(rvs[w])[0]
        cols = np.where(cvs[w])[0]
        want = np.full(B, -1, np.int32)
        if len(rows) and len(cols):
            r, c = linear_sum_assignment(costs[w][np.ix_(rows, cols)])
            for rr, cc in zip(r, c):
                want[rows[rr]] = cols[cc]
        if not (c4rs[w] == want).all():
            bad += 1
    print({"mismatched_windows": bad})


if __name__ == "__main__":
    main()
