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

Capacity: the point set must fit VMEM (``PALLAS_POINT_LIMIT``); larger
windows (e.g. YT-VIS full-scale clustering) fall back to the XLA path
automatically via ``pallas_clustering_supported``.
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
K_PAD = 32  # meta output rows (>= max_instances, sublane-aligned)


def pallas_clustering_supported(n_points: int, max_instances: int,
                                e_dims: int = 4) -> bool:
    """The kernel keeps (2E input planes + seed + fg + labels + best_d +
    best_idx + avail_last) f32/int32 planes resident: (2E + 6)·4 bytes per
    point must fit the VMEM budget."""
    per_point = (2 * e_dims + 6) * 4
    return (
        jax.default_backend() == "tpu"
        and n_points * per_point <= VMEM_BUDGET_BYTES
        and max_instances <= K_PAD
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
    """
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
