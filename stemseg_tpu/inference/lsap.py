"""Linear sum assignment (rectangular Hungarian) — an exact, jittable
replica of ``scipy.optimize.linear_sum_assignment``.

Why this exists: the chainer's cross-window association (behavioral
reference ``/root/reference/stemseg/inference/online_chainer.py:330-343``)
accepts EVERY Hungarian pair regardless of IoU, so when several optimal
assignments exist (all-zero IoU rows are common: any new cluster with no
overlap pixels ties with every track) the particular optimum scipy
returns determines the final track labels. Running the association on-device
therefore requires replicating scipy's algorithm — shortest-augmenting-path
(Crouse 2016, ``scipy/optimize/rectangular_lsap/rectangular_lsap.cpp``) —
including its tie-breaking:

* ``remaining`` columns are visited in DESCENDING index order (scipy fills
  the vector in reverse "so the solution of a constant cost matrix is the
  identity"), with swap-remove compaction;
* among minimum-reduced-cost columns, the LAST unassigned one in
  ``remaining`` order wins; if none is unassigned, the FIRST seen wins
  (strict ``<`` keeps the first, ``== && row4col[j]==-1`` overrides);
* a tall matrix (nr > nc) is solved transposed.

``lsa_numpy`` is the float64 host replica (validated against scipy by
``tests/test_lsap.py`` fuzzing, incl. heavy-tie integer matrices);
``lsa_masked`` is the jittable float32 version over a PADDED cost matrix
with row/column validity masks — it behaves exactly as scipy would on the
COMPACTED (valid rows x valid cols) matrix, which is how the host path
feeds scipy (``chainer.fold_and_associate`` drops n1==0 rows / n2==0 cols
before calling it). float32 vs scipy's float64 can only disagree when two
assignments' total costs differ by less than f32 eps — sub-ulp near-ties
where both assignments are equally meaningful; exact ties (equal IoU
ratios) produce identical comparisons in both precisions.
"""

from __future__ import annotations

import numpy as np

__all__ = ["lsa_numpy", "lsa_masked"]


def lsa_numpy(cost: np.ndarray):
    """Exact float64 replica of scipy's ``linear_sum_assignment`` (minimize).

    :param cost: [nr, nc] finite cost matrix
    :return: (row_ind, col_ind) — identical arrays to scipy's
    """
    cost = np.asarray(cost, dtype=np.float64)
    nr, nc = cost.shape
    if nr == 0 or nc == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    transpose = nc < nr
    if transpose:
        cost = cost.T.copy()
        nr, nc = nc, nr

    u = np.zeros(nr)
    v = np.zeros(nc)
    path = np.full(nc, -1, np.int64)
    col4row = np.full(nr, -1, np.int64)
    row4col = np.full(nc, -1, np.int64)

    for cur_row in range(nr):
        # ---- augmenting path from cur_row (scipy's augmenting_path) ----
        min_val = 0.0
        i = cur_row
        remaining = [nc - it - 1 for it in range(nc)]  # descending
        num_remaining = nc
        sr = np.zeros(nr, bool)
        sc = np.zeros(nc, bool)
        spc = np.full(nc, np.inf)
        sink = -1
        while sink == -1:
            index = -1
            lowest = np.inf
            sr[i] = True
            for it in range(num_remaining):
                j = remaining[it]
                r = min_val + cost[i, j] - u[i] - v[j]
                if r < spc[j]:
                    path[j] = i
                    spc[j] = r
                if spc[j] < lowest or (spc[j] == lowest and row4col[j] == -1):
                    lowest = spc[j]
                    index = it
            min_val = lowest
            if min_val == np.inf:
                raise ValueError("infeasible cost matrix")
            j = remaining[index]
            if row4col[j] == -1:
                sink = j
            else:
                i = row4col[j]
            sc[j] = True
            num_remaining -= 1
            remaining[index] = remaining[num_remaining]

        # ---- dual update ----
        u[cur_row] += min_val
        for i in range(nr):
            if sr[i] and i != cur_row:
                u[i] += min_val - spc[col4row[i]]
        for j in range(nc):
            if sc[j]:
                v[j] -= min_val - spc[j]

        # ---- augment ----
        j = sink
        while True:
            i = path[j]
            row4col[j] = i
            col4row[i], j = j, col4row[i]
            if i == cur_row:
                break

    if transpose:
        order = np.argsort(col4row)
        return col4row[order], order.astype(np.int64)
    return np.arange(nr, dtype=np.int64), col4row


def lsa_masked(cost, row_valid, col_valid):
    """Jittable masked LSA: scipy's result on the COMPACTED matrix, in
    original index space.

    :param cost: [R, C] float array (any finite values in invalid slots)
    :param row_valid: [R] bool
    :param col_valid: [C] bool
    :return: (col4row [R] int32, row4col [C] int32) — matched ORIGINAL
        column per valid row / row per valid column, -1 where unmatched or
        invalid. min(n_valid_rows, n_valid_cols) pairs are matched.
    """
    import jax
    import jax.numpy as jnp

    cost = jnp.asarray(cost)
    row_valid = jnp.asarray(row_valid)
    col_valid = jnp.asarray(col_valid)
    r_dim, c_dim = cost.shape
    b = max(r_dim, c_dim)
    # square-pad so both transpose orientations share one solver shape;
    # padded slots are invalid and never touched (masks gate everything)
    cost_sq = jnp.zeros((b, b), cost.dtype)
    cost_sq = jax.lax.dynamic_update_slice(cost_sq, cost, (0, 0))
    rv = jnp.zeros((b,), bool).at[:r_dim].set(row_valid)
    cv = jnp.zeros((b,), bool).at[:c_dim].set(col_valid)

    nr_c = jnp.sum(rv.astype(jnp.int32))
    nc_c = jnp.sum(cv.astype(jnp.int32))

    def solve(args):
        c4r, r4c = _solve_square(*args)
        return c4r, r4c

    def solve_t(args):
        c_sq, rvv, cvv = args
        c4r_t, r4c_t = _solve_square(c_sq.T, cvv, rvv)
        return r4c_t, c4r_t  # transposed roles map straight back

    col4row, row4col = jax.lax.cond(
        nc_c < nr_c, solve_t, solve, (cost_sq, rv, cv))
    return col4row[:r_dim], row4col[:c_dim]


def _solve_square(cost, row_valid, col_valid):
    """Core solver on a [B, B] padded square matrix; requires
    #valid rows <= #valid cols (caller transposes otherwise). Mirrors
    scipy's solve() loop structure exactly — see module docstring."""
    import jax
    import jax.numpy as jnp

    b = cost.shape[0]
    iota = jnp.arange(b, dtype=jnp.int32)
    inf = jnp.asarray(jnp.inf, cost.dtype)
    nc_c = jnp.sum(col_valid.astype(jnp.int32))

    # valid column ids in DESCENDING order, padded tail with -1 (scipy
    # fills `remaining` in reverse index order)
    desc = jnp.sort(jnp.where(col_valid, iota, -1))[::-1]

    u0 = jnp.zeros((b,), cost.dtype)
    v0 = jnp.zeros((b,), cost.dtype)
    path0 = jnp.full((b,), -1, jnp.int32)
    col4row0 = jnp.full((b,), -1, jnp.int32)
    row4col0 = jnp.full((b,), -1, jnp.int32)

    def aug_cond(st):
        return st["sink"] < 0

    def aug_body(st):
        i = st["i"]
        sr = st["sr"].at[i].set(True)
        r_all = st["min_val"] + cost[i, :] - st["u"][i] - st["v"]
        upd = st["in_rem"] & (r_all < st["spc"])
        spc = jnp.where(upd, r_all, st["spc"])
        path = jnp.where(upd, i, st["path"])

        rem = st["remaining"]
        pos_ok = iota < st["num_remaining"]
        rem_c = jnp.maximum(rem, 0)
        spc_pos = jnp.where(pos_ok, spc[rem_c], inf)
        lowest = jnp.min(spc_pos)
        ach = pos_ok & (spc_pos == lowest)
        unass = st["row4col"][rem_c] == -1
        au = ach & unass
        # last unassigned achiever if any, else first achiever — scipy's
        # running-scan tie rule (see module docstring)
        idx_last_au = jnp.max(jnp.where(au, iota, -1))
        idx_first = jnp.min(jnp.where(ach, iota, b))
        index = jnp.where(jnp.any(au), idx_last_au, idx_first)

        j = rem[index]
        row_j = st["row4col"][j]
        found = row_j == -1
        sink = jnp.where(lowest == inf, -2,  # infeasible guard: bail out
                         jnp.where(found, j, -1))
        i_next = jnp.where(found, i, row_j)
        sc = st["sc"].at[j].set(True)
        in_rem = st["in_rem"].at[j].set(False)
        n_rem = st["num_remaining"] - 1
        remaining = rem.at[index].set(rem[n_rem])
        return dict(st, sink=sink, i=i_next, min_val=lowest, u=st["u"],
                    sr=sr, sc=sc, spc=spc, path=path, in_rem=in_rem,
                    remaining=remaining, num_remaining=n_rem)

    def row_step(cur_row, carry):
        u, v, path, col4row, row4col = carry

        def run(_):
            st0 = dict(
                sink=jnp.int32(-1), i=cur_row,
                min_val=jnp.asarray(0.0, cost.dtype), u=u, v=v,
                sr=jnp.zeros((b,), bool), sc=jnp.zeros((b,), bool),
                spc=jnp.full((b,), jnp.inf, cost.dtype), path=path,
                in_rem=col_valid, remaining=desc, num_remaining=nc_c,
                row4col=row4col,
            )
            st = jax.lax.while_loop(aug_cond, aug_body, st0)
            min_val, spc, sr, sc = st["min_val"], st["spc"], st["sr"], st["sc"]
            sink, pth = st["sink"], st["path"]

            # dual update (SR rows other than cur_row are all assigned)
            du = min_val - spc[jnp.maximum(col4row, 0)]
            u2 = u + jnp.where(sr & (iota != cur_row), du, 0.0)
            u2 = u2.at[cur_row].add(min_val)
            v2 = v - jnp.where(sc, min_val - spc, 0.0)

            # augment along path
            def a_cond(s):
                return s[0]

            def a_body(s):
                _, j, r4c, c4r = s
                i = pth[j]
                r4c = r4c.at[j].set(i)
                j_next = c4r[i]
                c4r = c4r.at[i].set(j)
                return (i != cur_row, j_next, r4c, c4r)

            _, _, r4c2, c4r2 = jax.lax.while_loop(
                a_cond, a_body, (True, sink, row4col, col4row))
            return u2, v2, pth, c4r2, r4c2

        def skip(_):
            return u, v, path, col4row, row4col

        return jax.lax.cond(row_valid[cur_row], run, skip, None)

    u, v, path, col4row, row4col = jax.lax.fori_loop(
        0, b, row_step, (u0, v0, path0, col4row0, row4col0))
    return col4row, row4col
