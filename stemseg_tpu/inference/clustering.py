"""Sequential seeded clustering of spatio-temporal embeddings — TPU-native.

Behavioral reference: ``/root/reference/stemseg/inference/clusterers.py:34-175``
(``SequentialClustering``). The reference gathers the window's fg-pixel
embeddings into a ragged list and loops on the GPU driver thread; here the
loop is a fixed-trip ``lax.fori_loop`` (≤ ``max_instances``) over the DENSE
point set with validity masking — static shapes, one compiled graph per
window geometry, zero host round-trips.

Semantics preserved exactly:

* seed = argmax seediness among unassigned fg points (:168-175); stop when
  its seediness < ``min_seediness_prob`` (:117) — sticky stop flag;
* the SEED PIXEL's own bandwidth is used for the whole cluster (no
  averaging, :109-120), free dims get fixed ``1/std²`` (:100-104);
* distance ``sqrt(Σ (e-c)²·bw)`` (:57-58), prob ``exp(-0.5·d)`` (:52-54) —
  note this differs from the training prob (no sqrt there), a documented
  reference quirk (SURVEY.md §7);
* primary assignment: prob > primary_thresh among currently-unassigned
  (:139-145);
* secondary pass (:148-159): reference takes ``.max(dim=1)`` over cluster
  DISTANCES — i.e. assigns leftovers to the *farthest* cluster whose prob
  still exceeds the secondary threshold, and gates on the availability mask
  captured at the start of the last executed loop iteration (stale when the
  loop exhausts ``max_instances``). ``secondary_assignment="reference"``
  replicates both quirks; ``"nearest"`` uses min-distance and the fresh mask.

Dense-vs-ragged: operating on all T·H·W points with an fg mask wastes a few
arithmetic lanes on bg points but keeps every shape static and lets the VPU
stream the distance computation; bg points are masked out of seeding,
assignment and output labels.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp


class ClusterTimeLog:
    """Per-call clustering durations bucketed by point count — the
    observability feature of the reference's ``ClustererBase``
    (``/root/reference/stemseg/inference/clusterers.py:8-29``).

    Opt-in (``--profile_clustering``): timing one window requires syncing on
    its result, which defeats the pipeline's async dispatch — so the log is
    only attached when profiling, and only on the streaming path (the fused
    path compiles all windows into one XLA program, so per-window durations
    do not exist there)."""

    def __init__(self):
        from collections import defaultdict

        self._time_log = defaultdict(list)

    def record(self, n_points: int, duration: float) -> None:
        self._time_log[int(n_points)].append(duration)

    def reset_time_log(self) -> None:
        for v in self._time_log.values():
            v.clear()
        self._time_log.clear()

    @property
    def average_time(self) -> float:
        all_times = [t for v in self._time_log.values() for t in v]
        return sum(all_times) / float(len(all_times)) if all_times else 0.0

    def summary(self):
        """{point_count: (n_calls, mean_seconds)} sorted by point count."""
        return {p: (len(v), sum(v) / len(v))
                for p, v in sorted(self._time_log.items())}


class ClusterParams(NamedTuple):
    primary_prob_thresh: float = 0.5
    secondary_prob_thresh: float = 0.3
    min_seediness_prob: float = 0.8
    max_instances: int = 20
    n_free_dims: int = 0
    free_dim_stds: Tuple[float, ...] = ()
    secondary_assignment: str = "reference"  # or "nearest"


class ClusterResult(NamedTuple):
    labels: jnp.ndarray        # [P] int32; -1 = bg / unassigned (outlier)
    centers: jnp.ndarray       # [max_instances, E]
    bandwidths: jnp.ndarray    # [max_instances, E] (activated, incl. free dims)
    valid: jnp.ndarray         # [max_instances] bool — cluster was created
    seed_probs: jnp.ndarray    # [max_instances] seediness of each seed


@partial(jax.jit, static_argnums=(4,))
def _cluster(embeddings, bandwidths, seediness, fg_mask, params: ClusterParams):
    p, e = embeddings.shape
    k = params.max_instances
    f = len(params.free_dim_stds)
    free_bw = jnp.asarray([1.0 / (s * s) for s in params.free_dim_stds],
                          embeddings.dtype)

    labels0 = jnp.full((p,), -1, jnp.int32)
    reference_mode = params.secondary_assignment == "reference"

    class Carry(NamedTuple):
        labels: jnp.ndarray
        centers: jnp.ndarray
        bws: jnp.ndarray
        valid: jnp.ndarray
        seed_probs: jnp.ndarray
        # running farthest (reference) / nearest masked distance per point —
        # equivalent to the reference's stacked [K, P] argmax/argmin with
        # first-occurrence tie-breaks, at 1/K the memory traffic
        best_d: jnp.ndarray         # [P]
        best_idx: jnp.ndarray       # [P]
        stopped: jnp.ndarray        # bool
        avail_last: jnp.ndarray     # availability mask at start of last executed iter
        n_unassigned_last: jnp.ndarray

    init = Carry(
        labels=labels0,
        centers=jnp.zeros((k, e), embeddings.dtype),
        bws=jnp.zeros((k, e), embeddings.dtype),
        valid=jnp.zeros((k,), bool),
        seed_probs=jnp.zeros((k,), embeddings.dtype),
        best_d=jnp.full((p,), -jnp.inf if reference_mode else jnp.inf,
                        embeddings.dtype),
        best_idx=jnp.zeros((p,), jnp.int32),
        stopped=jnp.asarray(False),
        avail_last=fg_mask,
        n_unassigned_last=jnp.sum(fg_mask.astype(jnp.int32)),
    )

    def body(i, c: Carry) -> Carry:
        avail = (c.labels == -1) & fg_mask
        n_avail = jnp.sum(avail.astype(jnp.int32))

        seed_scores = jnp.where(avail, seediness, -jnp.inf)
        seed_idx = jnp.argmax(seed_scores)
        seed_prob = seediness[seed_idx]

        active = (~c.stopped) & (n_avail > 0) & (seed_prob >= params.min_seediness_prob)
        # the reference records the availability mask of every *executed*
        # iteration (incl. the breaking one); the break happens before
        # assignment, so track it whenever we had not stopped previously
        executed = ~c.stopped
        avail_last = jnp.where(executed, avail, c.avail_last)
        n_unassigned_last = jnp.where(executed, n_avail, c.n_unassigned_last)

        center = embeddings[seed_idx]
        bw = bandwidths[seed_idx]
        full_bw = jnp.concatenate([bw, free_bw]) if f else bw

        d = jnp.sqrt(jnp.sum((embeddings - center) ** 2 * full_bw, axis=-1))
        d_masked = jnp.where(avail & active, d, 1e8)
        probs = jnp.exp(-0.5 * d)
        match = (probs > params.primary_prob_thresh) & avail & active

        if reference_mode:
            upd = active & (d_masked > c.best_d)
        else:
            upd = active & (d_masked < c.best_d)

        return Carry(
            labels=jnp.where(match, i, c.labels),
            centers=c.centers.at[i].set(jnp.where(active, center, 0.0)),
            bws=c.bws.at[i].set(jnp.where(active, full_bw, 0.0)),
            valid=c.valid.at[i].set(active),
            seed_probs=c.seed_probs.at[i].set(jnp.where(active, seed_prob, 0.0)),
            best_d=jnp.where(upd, d_masked, c.best_d),
            best_idx=jnp.where(upd, i, c.best_idx),
            stopped=~active,
            avail_last=avail_last,
            n_unassigned_last=n_unassigned_last,
        )

    c = jax.lax.fori_loop(0, k, body, init)

    # secondary assignment (clusterers.py:148-159)
    any_cluster = jnp.any(c.valid)
    gate_mask = c.avail_last if reference_mode else ((c.labels == -1) & fg_mask)
    sec_probs = jnp.exp(-0.5 * c.best_d)
    do_secondary = any_cluster & (c.n_unassigned_last > 0)
    update = (sec_probs > params.secondary_prob_thresh) & gate_mask & do_secondary
    labels = jnp.where(update, c.best_idx, c.labels)

    return ClusterResult(labels=labels, centers=c.centers, bandwidths=c.bws,
                         valid=c.valid, seed_probs=c.seed_probs)


def cluster_window(embeddings: jnp.ndarray, bandwidths: jnp.ndarray,
                   seediness: jnp.ndarray, fg_mask: jnp.ndarray,
                   params: ClusterParams, label_start: int = 1,
                   backend: str = "auto",
                   time_log: "ClusterTimeLog" = None) -> ClusterResult:
    """Cluster one window.

    :param embeddings: [T, H, W, E] (grid offsets included)
    :param bandwidths: [T, H, W, E - n_free] activated (exp·10) bandwidths
    :param seediness: [T, H, W]
    :param fg_mask: [T, H, W] bool
    :param label_start: first label id to assign (labels are globally unique
        across windows, reference ``clusterers.py:121``)
    :param backend: 'auto' (Pallas kernel on TPU — VMEM-resident or tiled —
        else XLA), 'pallas', or 'xla'
    :param time_log: optional ClusterTimeLog — forces a sync per window to
        record its duration bucketed by point count
    :return: ClusterResult with ``labels`` reshaped to [T, H, W]; assigned
        labels are ``label_start + k`` for cluster slot k, -1 elsewhere.
    """
    import time

    p = int(np.prod(fg_mask.shape))
    if backend == "auto":
        from stemseg_tpu.ops import pallas_clustering_supported

        e_full = embeddings.shape[-1]
        backend = "pallas" if pallas_clustering_supported(
            p, params.max_instances, e_dims=e_full) else "xla"

    if time_log is None:
        return _cluster_window_jit(embeddings, bandwidths, seediness, fg_mask,
                                   jnp.asarray(label_start, jnp.int32), params,
                                   backend)

    np.asarray(jnp.ravel(seediness)[:1])  # drain queued work before timing
    start = time.perf_counter()
    res = _cluster_window_jit(embeddings, bandwidths, seediness, fg_mask,
                              jnp.asarray(label_start, jnp.int32), params,
                              backend)
    np.asarray(jnp.ravel(res.labels)[:1])  # sync (tunnel-safe tiny fetch)
    time_log.record(p, time.perf_counter() - start)
    return res


@partial(jax.jit, static_argnums=(5, 6))
def _cluster_window_jit(embeddings, bandwidths, seediness, fg_mask,
                        label_start, params: ClusterParams, backend: str
                        ) -> ClusterResult:
    """One compiled graph per (shape, params, backend): input flattening,
    free-dim bandwidth append, the clustering itself (fused Pallas kernel or
    XLA fori_loop) and the label relabeling all fuse — no eager per-op
    dispatches (each costs ~ms of host->device latency)."""
    shape = fg_mask.shape
    e = embeddings.shape[-1]
    flat_emb = embeddings.reshape(-1, e)
    flat_bw = bandwidths.reshape(-1, bandwidths.shape[-1])
    flat_seed = seediness.reshape(-1)
    flat_fg = fg_mask.reshape(-1)
    p = flat_emb.shape[0]

    if backend == "pallas":
        from stemseg_tpu.ops import cluster_points_pallas

        f = len(params.free_dim_stds)
        if f:
            free_bw = jnp.asarray([1.0 / (s * s) for s in params.free_dim_stds],
                                  flat_bw.dtype)
            flat_bw = jnp.concatenate(
                [flat_bw, jnp.broadcast_to(free_bw, (p, f))], axis=-1)
        labels_flat, meta = cluster_points_pallas(
            flat_emb, flat_bw, flat_seed, flat_fg,
            e_dims=e, max_instances=params.max_instances,
            primary=params.primary_prob_thresh,
            secondary=params.secondary_prob_thresh,
            min_seediness=params.min_seediness_prob,
            reference_secondary=params.secondary_assignment == "reference")
        k = params.max_instances
        res = ClusterResult(
            labels=labels_flat,
            centers=meta[:k, :e],
            bandwidths=meta[:k, e:2 * e],
            valid=meta[:k, -1] > 0.5,
            seed_probs=meta[:k, -2],
        )
    else:
        res = _cluster(flat_emb, flat_bw, flat_seed, flat_fg, params)

    labels = jnp.where(res.labels >= 0, res.labels + label_start, -1)
    return res._replace(labels=labels.reshape(shape))
