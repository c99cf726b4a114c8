"""Fused Pallas TPU kernel for sequential seeded clustering.

The XLA version (``stemseg_tpu/inference/clustering.py``) lowers to ~20
sequential fusions, each streaming the point set plus a [K, P] distance
matrix through HBM (~8 ms for a DAVIS-sized window). This kernel keeps the
ENTIRE clustering state resident in VMEM — embeddings, bandwidths,
seediness, labels, and a running best-distance/cluster pair per point — so
the 20-iteration loop never touches HBM: one read of the inputs, one write
of the outputs.

Semantics are identical to ``clustering._cluster`` (which is label-exact
against the reference ``SequentialClustering``):

* seed = first argmax of seediness among unassigned fg points; sticky stop
  when its seediness < min_seediness_prob;
* cluster center/bandwidth = the seed pixel's own values, gathered with a
  factored lane-then-row masked reduction (no dynamic lane indexing);
* distance ``sqrt(Σ (e-c)²·bw)``, prob ``exp(-0.5·d)``, primary assignment
  among currently-unassigned points;
* secondary pass: the reference's farthest-cluster quirk is reproduced by a
  RUNNING max of masked distances (first-occurrence tie-breaks match the
  stacked argmax); ``"nearest"`` mode keeps a running min instead;
* the stale availability mask of the last executed iteration gates the
  secondary assignment exactly as in the reference.

Embedding/bandwidth planes are passed as SEPARATE 2-D [R, 128] refs (E is
tiny and static) — Mosaic lays 2-D planes out far better than a 3-D array
indexed in a Python loop.

Capacity: the single-block kernel requires the point set resident in VMEM
(``PALLAS_POINT_LIMIT``); larger windows (e.g. YT-VIS full-scale clustering
at >400k points, full-res DAVIS) stream through the TILED kernel below
(``_cluster_kernel_tiled``) which keeps only per-iteration scalars resident
and pipelines point tiles HBM->VMEM, up to ``TILED_POINT_LIMIT`` points.
``cluster_points_pallas`` dispatches between the two on the static point
count; ``pallas_clustering_supported`` covers both.

Tiled kernel structure — the sequential dependency (each iteration's seed
is a GLOBAL argmax over all unassigned points) is restructured into K+2
SWEEPS over the tiles (grid = (K+2, T), sequential on one core):

* sweep ``s`` applies iteration ``s-1``'s assignment to every tile (the
  seed/center chosen at the end of sweep ``s-1``, held in SMEM) and in the
  same pass accumulates iteration ``s``'s argmax + the seed pixel's
  embedding/bandwidth (one-hot gather) into SMEM — fusing "assign k-1" with
  "seed k" halves the HBM traffic vs two passes;
* per-point state (labels, running best distance/cluster as bitcast int32,
  stale availability mask) lives in one packed HBM output buffer
  [n_tiles, 4, tr, 128], manually DMA'd tile-by-tile VMEM<->HBM each sweep
  (explicit ``make_async_copy`` — no reliance on output-block revisit or
  aliasing semantics);
* the final sweep applies the secondary assignment using the global
  any-cluster / had-unassigned flags accumulated in SMEM.

HBM traffic: (2E+10 read + 4 written) planes x (K+2) sweeps — ~2 ms for a
1M-point window at v5e bandwidth vs ~10x that for the XLA fori_loop path
(which re-streams everything per fusion and cannot alias in-place).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES
VMEM_BUDGET_BYTES = 14 * 1024 * 1024  # leave headroom under the ~16 MB core
PALLAS_POINT_LIMIT = 256 * 1024  # coarse cap (exact check is E-dependent)
TILED_POINT_LIMIT = 16 * 1024 * 1024  # HBM-streaming kernel cap (state planes)
TILE_ROWS = 512  # tiled kernel: 512x128 = 64k points per tile
K_PAD = 32  # meta output rows (>= max_instances, sublane-aligned)


def _single_block_supported(n_points: int, max_instances: int,
                            e_dims: int) -> bool:
    """The single-block kernel keeps (2E input planes + seed + fg + labels +
    best_d + best_idx + avail_last) f32/int32 planes resident: (2E + 6)·4
    bytes per point must fit the VMEM budget."""
    per_point = (2 * e_dims + 6) * 4
    return (n_points * per_point <= VMEM_BUDGET_BYTES
            and max_instances <= K_PAD)


def pallas_clustering_supported(n_points: int, max_instances: int,
                                e_dims: int = 4) -> bool:
    """True when a Pallas backend (single-block VMEM-resident or tiled
    HBM-streaming) can run this clustering problem."""
    return (
        jax.default_backend() == "tpu"
        and max_instances <= K_PAD
        and e_dims <= 8
        and n_points <= TILED_POINT_LIMIT
    )


def _cluster_kernel(*refs, e_dims: int, max_instances: int,
                    primary: float, secondary: float, min_seediness: float,
                    reference_secondary: bool):
    emb_refs = refs[:e_dims]
    bw_refs = refs[e_dims:2 * e_dims]
    seed_ref, fg_ref = refs[2 * e_dims], refs[2 * e_dims + 1]
    labels_ref, meta_ref = refs[2 * e_dims + 2], refs[2 * e_dims + 3]
    best_d_ref, best_idx_ref, avail_last_ref = refs[2 * e_dims + 4:]

    r = seed_ref.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    flat_iota = row_iota * LANES + col_iota
    p_total = r * LANES
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    fg = fg_ref[:] > 0.5
    seed = seed_ref[:]

    labels_ref[:] = jnp.full((r, LANES), -1, jnp.int32)
    meta_ref[:] = jnp.zeros((K_PAD, LANES), jnp.float32)
    if reference_secondary:
        best_d_ref[:] = jnp.full((r, LANES), -jnp.inf, jnp.float32)
    else:
        best_d_ref[:] = jnp.full((r, LANES), jnp.inf, jnp.float32)
    best_idx_ref[:] = jnp.zeros((r, LANES), jnp.int32)
    avail_last_ref[:] = fg.astype(jnp.float32)

    def body(k, carry):
        stopped, any_cluster = carry
        labels = labels_ref[:]
        avail = (labels == -1) & fg

        scores = jnp.where(avail, seed, -jnp.inf)
        max_score = jnp.max(scores)
        # first-occurrence argmax via min-iota over the max set
        idx = jnp.min(jnp.where(scores == max_score, flat_iota, p_total))

        # max_score == -inf <=> no available points
        active = (jnp.logical_not(stopped) & (max_score > -jnp.inf)
                  & (max_score >= min_seediness))
        executed = jnp.logical_not(stopped)

        # stale-mask semantics for the secondary pass
        avail_last_ref[:] = jnp.where(executed, avail.astype(jnp.float32),
                                      avail_last_ref[:])

        # gather the seed pixel's values with one-hot masked reductions
        onehot = (flat_iota == idx).astype(jnp.float32)

        d2 = jnp.zeros((r, LANES), jnp.float32)
        meta_row = jnp.zeros((1, LANES), jnp.float32)
        for e in range(e_dims):
            c_e = jnp.sum(emb_refs[e][:] * onehot)
            cbw_e = jnp.sum(bw_refs[e][:] * onehot)
            d2 = d2 + (emb_refs[e][:] - c_e) ** 2 * cbw_e
            meta_row = jnp.where(lane_iota == e, c_e, meta_row)
            meta_row = jnp.where(lane_iota == e_dims + e, cbw_e, meta_row)

        d = jnp.sqrt(d2)
        probs = jnp.exp(-0.5 * d)
        match = (probs > primary) & avail & active
        labels_ref[:] = jnp.where(match, k, labels)

        # running farthest (reference) / nearest distance per point over the
        # masked distance rows (1e8 where the point was not available)
        d_masked = jnp.where(avail & active, d, 1e8)
        if reference_secondary:
            upd = active & (d_masked > best_d_ref[:])
        else:
            upd = active & (d_masked < best_d_ref[:])
        best_idx_ref[:] = jnp.where(upd, k, best_idx_ref[:])
        best_d_ref[:] = jnp.where(upd, d_masked, best_d_ref[:])

        meta_row = jnp.where(lane_iota == LANES - 2, max_score, meta_row)
        meta_row = jnp.where(lane_iota == LANES - 1, 1.0, meta_row)
        meta_ref[pl.ds(k, 1), :] = jnp.where(active, meta_row,
                                             jnp.zeros((1, LANES), jnp.float32))

        return (jnp.logical_not(active), jnp.logical_or(any_cluster, active))

    _, any_cluster = jax.lax.fori_loop(
        0, max_instances, body, (jnp.asarray(False), jnp.asarray(False)))

    # secondary assignment; "unassigned points remained" <=> the last
    # executed iteration's availability mask is non-empty
    had_unassigned = jnp.max(avail_last_ref[:]) > 0.5
    do_secondary = any_cluster & had_unassigned
    sec_probs = jnp.exp(-0.5 * best_d_ref[:])
    if reference_secondary:
        gate = avail_last_ref[:] > 0.5
    else:
        gate = (labels_ref[:] == -1) & fg
    update = (sec_probs > secondary) & gate & do_secondary
    labels_ref[:] = jnp.where(update, best_idx_ref[:], labels_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("e_dims", "max_instances", "primary", "secondary",
                     "min_seediness", "reference_secondary"))
def cluster_points_pallas(embeddings: jnp.ndarray, bandwidths: jnp.ndarray,
                          seediness: jnp.ndarray, fg_mask: jnp.ndarray,
                          *, e_dims: int, max_instances: int, primary: float,
                          secondary: float, min_seediness: float,
                          reference_secondary: bool
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:param embeddings: [P, E] (padded points must have fg=0)
    :param bandwidths: [P, E] FULL per-point bandwidths (free dims already
        appended as constants)
    :param seediness: [P]
    :param fg_mask: [P] bool
    :return: (labels [P] int32 — cluster slot or -1, meta [K_PAD, 128]
        float32 rows: [center(E) | bw(E) | ... | seed_prob, valid])

    Dispatches on the static point count: VMEM-resident single-block kernel
    when the point set fits, HBM-streaming tiled kernel otherwise.
    """
    kwargs = dict(e_dims=e_dims, max_instances=max_instances, primary=primary,
                  secondary=secondary, min_seediness=min_seediness,
                  reference_secondary=reference_secondary)
    if _single_block_supported(embeddings.shape[0], max_instances, e_dims):
        return _cluster_points_single(embeddings, bandwidths, seediness,
                                      fg_mask, **kwargs)
    return cluster_points_pallas_tiled(embeddings, bandwidths, seediness,
                                       fg_mask, **kwargs)


def _cluster_points_single(embeddings, bandwidths, seediness, fg_mask,
                           *, e_dims, max_instances, primary, secondary,
                           min_seediness, reference_secondary):
    p = embeddings.shape[0]
    p_pad = int(np.ceil(p / BLOCK)) * BLOCK
    if p_pad != p:
        pad = p_pad - p
        embeddings = jnp.pad(embeddings, ((0, pad), (0, 0)))
        bandwidths = jnp.pad(bandwidths, ((0, pad), (0, 0)))
        seediness = jnp.pad(seediness, ((0, pad),))
        fg_mask = jnp.pad(fg_mask, ((0, pad),))

    r = p_pad // LANES
    inputs = ([embeddings[:, e].reshape(r, LANES) for e in range(e_dims)]
              + [bandwidths[:, e].reshape(r, LANES) for e in range(e_dims)]
              + [seediness.reshape(r, LANES),
                 fg_mask.astype(jnp.float32).reshape(r, LANES)])

    kernel = functools.partial(
        _cluster_kernel, e_dims=e_dims, max_instances=max_instances,
        primary=primary, secondary=secondary, min_seediness=min_seediness,
        reference_secondary=reference_secondary)

    labels, meta = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, LANES), jnp.int32),
            jax.ShapeDtypeStruct((K_PAD, LANES), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((r, LANES), jnp.float32),   # best_d
            pltpu.VMEM((r, LANES), jnp.int32),     # best_idx
            pltpu.VMEM((r, LANES), jnp.float32),   # avail_last
        ],
    )(*inputs)

    return labels.reshape(p_pad)[:p], meta


# ---------------------------------------------------------------------------
# Tiled HBM-streaming kernel (point sets too large for VMEM residency)
# ---------------------------------------------------------------------------

# SMEM float slot layout (committed = chosen at end of previous sweep,
# cand = running argmax candidate within the current sweep)
_SF_RUN_MAX = 0
_SF_CENTER = 8       # [8+e] committed center_e
_SF_CBW = 16         # [16+e] committed bandwidth_e
_SF_CAND_C = 24      # [24+e] candidate center_e
_SF_CAND_B = 32      # [32+e] candidate bandwidth_e
_SF_SLOTS = 40
# SMEM int slots
_SI_STOPPED = 0
_SI_ACTIVE_PREV = 1
_SI_EXEC_PREV = 2
_SI_ANY_CLUSTER = 3
_SI_HAD_UNASSIGNED = 4
_SI_SLOTS = 8
# per-point state planes packed in one [n_tiles, 4, tr, LANES] int32 HBM
# buffer (best_d carried as bitcast int32)
_ST_LABELS = 0
_ST_BEST_D = 1
_ST_BEST_IDX = 2
_ST_AVAIL_LAST = 3


def _cluster_kernel_tiled(*refs, e_dims: int, max_instances: int,
                          primary: float, secondary: float,
                          min_seediness: float, reference_secondary: bool):
    k_max = max_instances
    emb_refs = refs[:e_dims]
    bw_refs = refs[e_dims:2 * e_dims]
    seed_ref, fg_ref = refs[2 * e_dims], refs[2 * e_dims + 1]
    (state_hbm, meta_hbm,                       # outputs (ANY -> HBM)
     state_vm, meta_vm, sf, si, sem_in, sem_out, sem_meta
     ) = refs[2 * e_dims + 2:]

    s = pl.program_id(0)   # sweep: 0..K+1
    t = pl.program_id(1)   # tile
    n_tiles = pl.num_programs(1)

    r = seed_ref.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    flat_iota = row_iota * LANES + col_iota  # tile-local
    p_tile = r * LANES
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    fg = fg_ref[:] > 0.5
    seed = seed_ref[:]

    @pl.when((s == 0) & (t == 0))
    def _init():
        si[_SI_STOPPED] = 0
        si[_SI_ACTIVE_PREV] = 0
        si[_SI_EXEC_PREV] = 0
        si[_SI_ANY_CLUSTER] = 0
        si[_SI_HAD_UNASSIGNED] = 0
        for e in range(e_dims):
            sf[_SF_CENTER + e] = 0.0
            sf[_SF_CBW + e] = 0.0
        meta_vm[:] = jnp.zeros((K_PAD, LANES), jnp.float32)

    @pl.when(t == 0)
    def _sweep_reset():
        sf[_SF_RUN_MAX] = -jnp.inf

    # ---- per-point state: init in sweep 0, else DMA the tile in ----
    @pl.when(s == 0)
    def _state_init():
        init_d = -jnp.inf if reference_secondary else jnp.inf
        state_vm[_ST_LABELS] = jnp.full((r, LANES), -1, jnp.int32)
        state_vm[_ST_BEST_D] = pltpu.bitcast(
            jnp.full((r, LANES), init_d, jnp.float32), jnp.int32)
        state_vm[_ST_BEST_IDX] = jnp.zeros((r, LANES), jnp.int32)
        state_vm[_ST_AVAIL_LAST] = fg.astype(jnp.int32)

    @pl.when(s > 0)
    def _state_load():
        dma = pltpu.make_async_copy(state_hbm.at[t], state_vm, sem_in)
        dma.start()
        dma.wait()

    labels = state_vm[_ST_LABELS]
    best_d = pltpu.bitcast(state_vm[_ST_BEST_D], jnp.float32)
    best_idx = state_vm[_ST_BEST_IDX]
    avail_last_i = state_vm[_ST_AVAIL_LAST]

    # ---- phase A: apply iteration s-1's assignment (branchless; the
    # is_assign mask kills every effect in sweeps 0 and K+1) ----
    is_assign = (s >= 1) & (s <= k_max)
    active_prev = (si[_SI_ACTIVE_PREV] == 1) & is_assign
    exec_prev = (si[_SI_EXEC_PREV] == 1) & is_assign

    avail_prev = (labels == -1) & fg
    # int32 select — Mosaic cannot legalize vector selects on i1 operands
    avail_last_new = jnp.where(exec_prev, avail_prev.astype(jnp.int32),
                               avail_last_i)

    d2 = jnp.zeros((r, LANES), jnp.float32)
    for e in range(e_dims):
        d2 = d2 + (emb_refs[e][:] - sf[_SF_CENTER + e]) ** 2 * sf[_SF_CBW + e]
    d = jnp.sqrt(d2)
    probs = jnp.exp(-0.5 * d)
    match = (probs > primary) & avail_prev & active_prev
    labels_assigned = jnp.where(match, s - 1, labels)

    d_masked = jnp.where(avail_prev & active_prev, d, 1e8)
    if reference_secondary:
        upd = active_prev & (d_masked > best_d)
    else:
        upd = active_prev & (d_masked < best_d)
    best_idx_new = jnp.where(upd, s - 1, best_idx)
    best_d_new = jnp.where(upd, d_masked, best_d)

    # ---- phase B: this tile's contribution to iteration s's argmax ----
    @pl.when(s < k_max)
    def _phase_b():
        avail_now = (labels_assigned == -1) & fg
        scores = jnp.where(avail_now, seed, -jnp.inf)
        local_max = jnp.max(scores)
        idx = jnp.min(jnp.where(scores == local_max, flat_iota, p_tile))
        onehot = (flat_iota == idx).astype(jnp.float32)
        # tiles are visited in ascending global-index order, so a strictly-
        # greater running max reproduces argmax's first-occurrence tie-break
        better = local_max > sf[_SF_RUN_MAX]

        @pl.when(better)
        def _():
            sf[_SF_RUN_MAX] = local_max
            for e in range(e_dims):
                sf[_SF_CAND_C + e] = jnp.sum(emb_refs[e][:] * onehot)
                sf[_SF_CAND_B + e] = jnp.sum(bw_refs[e][:] * onehot)

    # final availability mask is complete once sweep K's phase A ran
    @pl.when(s == k_max)
    def _had_unassigned():
        si[_SI_HAD_UNASSIGNED] = jnp.maximum(si[_SI_HAD_UNASSIGNED],
                                             jnp.max(avail_last_new))

    # ---- secondary assignment sweep ----
    is_secondary = s == k_max + 1
    sec_probs = jnp.exp(-0.5 * best_d_new)
    if reference_secondary:
        gate = avail_last_new == 1
    else:
        gate = (labels_assigned == -1) & fg
    do_secondary = (is_secondary & (si[_SI_ANY_CLUSTER] == 1)
                    & (si[_SI_HAD_UNASSIGNED] == 1))
    sec_upd = (sec_probs > secondary) & gate & do_secondary
    labels_final = jnp.where(sec_upd, best_idx_new, labels_assigned)

    state_vm[_ST_LABELS] = labels_final
    state_vm[_ST_BEST_D] = pltpu.bitcast(best_d_new, jnp.int32)
    state_vm[_ST_BEST_IDX] = best_idx_new
    state_vm[_ST_AVAIL_LAST] = avail_last_new
    dma_out = pltpu.make_async_copy(state_vm, state_hbm.at[t], sem_out)
    dma_out.start()
    dma_out.wait()

    # ---- end of sweep: finalize iteration s's seed ----
    @pl.when((t == n_tiles - 1) & (s < k_max))
    def _finalize():
        max_score = sf[_SF_RUN_MAX]
        stopped = si[_SI_STOPPED]
        active = ((stopped == 0) & (max_score > -jnp.inf)
                  & (max_score >= min_seediness))
        si[_SI_ACTIVE_PREV] = active.astype(jnp.int32)
        si[_SI_EXEC_PREV] = 1 - stopped
        si[_SI_STOPPED] = 1 - active.astype(jnp.int32)
        si[_SI_ANY_CLUSTER] = jnp.maximum(si[_SI_ANY_CLUSTER],
                                          active.astype(jnp.int32))
        for e in range(e_dims):
            sf[_SF_CENTER + e] = sf[_SF_CAND_C + e]
            sf[_SF_CBW + e] = sf[_SF_CAND_B + e]

        meta_row = jnp.zeros((1, LANES), jnp.float32)
        for e in range(e_dims):
            meta_row = jnp.where(lane_iota == e, sf[_SF_CAND_C + e], meta_row)
            meta_row = jnp.where(lane_iota == e_dims + e,
                                 sf[_SF_CAND_B + e], meta_row)
        meta_row = jnp.where(lane_iota == LANES - 2, max_score, meta_row)
        meta_row = jnp.where(lane_iota == LANES - 1, 1.0, meta_row)
        meta_vm[pl.ds(s, 1), :] = jnp.where(
            active, meta_row, jnp.zeros((1, LANES), jnp.float32))

    @pl.when((s == k_max + 1) & (t == n_tiles - 1))
    def _flush_meta():
        dma = pltpu.make_async_copy(meta_vm, meta_hbm, sem_meta)
        dma.start()
        dma.wait()


def cluster_points_pallas_tiled(embeddings: jnp.ndarray,
                                bandwidths: jnp.ndarray,
                                seediness: jnp.ndarray, fg_mask: jnp.ndarray,
                                *, e_dims: int, max_instances: int,
                                primary: float, secondary: float,
                                min_seediness: float,
                                reference_secondary: bool,
                                tile_rows: int = TILE_ROWS,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``cluster_points_pallas``, for point sets too large
    for VMEM residency. ``tile_rows``/``interpret`` exist for tests (small
    tiles on the interpreter exercise the multi-tile paths on CPU)."""
    assert e_dims <= 8, e_dims
    assert max_instances <= K_PAD, max_instances
    p = embeddings.shape[0]
    tile_p = tile_rows * LANES
    n_tiles = max(2, int(np.ceil(p / tile_p)))
    p_pad = n_tiles * tile_p
    if p_pad != p:
        pad = p_pad - p
        embeddings = jnp.pad(embeddings, ((0, pad), (0, 0)))
        bandwidths = jnp.pad(bandwidths, ((0, pad), (0, 0)))
        seediness = jnp.pad(seediness, ((0, pad),))
        fg_mask = jnp.pad(fg_mask, ((0, pad),))

    r_total = p_pad // LANES
    inputs = ([embeddings[:, e].reshape(r_total, LANES) for e in range(e_dims)]
              + [bandwidths[:, e].reshape(r_total, LANES) for e in range(e_dims)]
              + [seediness.reshape(r_total, LANES),
                 fg_mask.astype(jnp.float32).reshape(r_total, LANES)])

    kernel = functools.partial(
        _cluster_kernel_tiled, e_dims=e_dims, max_instances=max_instances,
        primary=primary, secondary=secondary, min_seediness=min_seediness,
        reference_secondary=reference_secondary)

    def plane():
        return pl.BlockSpec((tile_rows, LANES), lambda s, t: (t, 0),
                            memory_space=pltpu.VMEM)

    state, meta = pl.pallas_call(
        kernel,
        grid=(max_instances + 2, n_tiles),
        in_specs=[plane() for _ in range(len(inputs))],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 4, tile_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((K_PAD, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, tile_rows, LANES), jnp.int32),   # state_vm
            pltpu.VMEM((K_PAD, LANES), jnp.float32),        # meta_vm
            pltpu.SMEM((_SF_SLOTS,), jnp.float32),
            pltpu.SMEM((_SI_SLOTS,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),                     # sem_in
            pltpu.SemaphoreType.DMA(()),                     # sem_out
            pltpu.SemaphoreType.DMA(()),                     # sem_meta
        ],
        interpret=interpret,
    )(*inputs)

    labels = state[:, _ST_LABELS].reshape(p_pad)[:p]
    return labels, meta
