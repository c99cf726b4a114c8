"""Fuzz the LSA replicas against scipy — exact equality, incl. ties.

The device association (fused pipeline scan B) depends on reproducing
scipy's tie-breaking bit-for-bit, so these tests compare INDICES, not
costs: any deviation in which optimum is returned fails.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from stemseg_tpu.inference.lsap import lsa_masked, lsa_numpy


def _cases(seed, n_cases):
    rng = np.random.default_rng(seed)
    for _ in range(n_cases):
        nr = int(rng.integers(1, 13))
        nc = int(rng.integers(1, 13))
        kind = rng.integers(0, 4)
        if kind == 0:
            cost = rng.random((nr, nc))
        elif kind == 1:  # heavy ties: tiny integer alphabet
            cost = rng.integers(0, 3, (nr, nc)).astype(np.float64)
        elif kind == 2:  # all-equal rows/cols mixed with zeros
            cost = np.zeros((nr, nc))
            cost[rng.random((nr, nc)) < 0.3] = 1.0
        else:  # quantized — ties at many magnitudes
            cost = np.round(rng.random((nr, nc)) * 4) / 4
        yield cost


def test_lsa_numpy_matches_scipy():
    for cost in _cases(0, 400):
        r_ref, c_ref = linear_sum_assignment(cost)
        r, c = lsa_numpy(cost)
        np.testing.assert_array_equal(r, r_ref)
        np.testing.assert_array_equal(c, c_ref)


@pytest.mark.slow
def test_lsa_masked_matches_scipy_compacted():
    """lsa_masked on a padded matrix == scipy on the compacted matrix."""
    import jax

    rng = np.random.default_rng(1)
    fn = jax.jit(lsa_masked)
    for case_i, cost in enumerate(_cases(2, 150)):
        nr, nc = cost.shape
        r_pad = nr + int(rng.integers(0, 4))
        c_pad = nc + int(rng.integers(0, 4))
        row_valid = np.zeros(r_pad, bool)
        col_valid = np.zeros(c_pad, bool)
        rows = np.sort(rng.choice(r_pad, nr, replace=False))
        cols = np.sort(rng.choice(c_pad, nc, replace=False))
        row_valid[rows] = True
        col_valid[cols] = True
        full = np.full((r_pad, c_pad), 7.7, np.float32)  # junk in dead slots
        full[np.ix_(rows, cols)] = cost

        c4r, r4c = jax.device_get(fn(full, row_valid, col_valid))

        r_ref, c_ref = linear_sum_assignment(cost.astype(np.float32))
        want_c4r = np.full(r_pad, -1, np.int32)
        want_r4c = np.full(c_pad, -1, np.int32)
        for rr, cc in zip(r_ref, c_ref):
            want_c4r[rows[rr]] = cols[cc]
            want_r4c[cols[cc]] = rows[rr]
        np.testing.assert_array_equal(c4r, want_c4r, err_msg=f"case {case_i}")
        np.testing.assert_array_equal(r4c, want_r4c, err_msg=f"case {case_i}")


def test_lsa_masked_empty_sides():
    import jax

    cost = np.zeros((4, 5), np.float32)
    c4r, r4c = jax.jit(lsa_masked)(
        cost, np.zeros(4, bool), np.ones(5, bool))
    assert (np.asarray(c4r) == -1).all() and (np.asarray(r4c) == -1).all()
    c4r, r4c = jax.jit(lsa_masked)(
        cost, np.ones(4, bool), np.zeros(5, bool))
    assert (np.asarray(c4r) == -1).all() and (np.asarray(r4c) == -1).all()


@pytest.mark.parametrize("shape", [(20, 40), (40, 20)])
def test_lsa_masked_association_shapes(shape):
    """The production association geometry (band x k) with partial masks."""
    import jax

    rng = np.random.default_rng(3)
    fn = jax.jit(lsa_masked)
    for _ in range(25):
        cost = (rng.integers(0, 5, shape) / 4.0).astype(np.float32)
        row_valid = rng.random(shape[0]) < 0.6
        col_valid = rng.random(shape[1]) < 0.6
        c4r, r4c = jax.device_get(fn(cost, row_valid, col_valid))
        rows = np.where(row_valid)[0]
        cols = np.where(col_valid)[0]
        if len(rows) == 0 or len(cols) == 0:
            assert (c4r == -1).all() and (r4c == -1).all()
            continue
        r_ref, c_ref = linear_sum_assignment(cost[np.ix_(rows, cols)])
        want_c4r = np.full(shape[0], -1, np.int32)
        for rr, cc in zip(r_ref, c_ref):
            want_c4r[rows[rr]] = cols[cc]
        np.testing.assert_array_equal(c4r, want_c4r)
