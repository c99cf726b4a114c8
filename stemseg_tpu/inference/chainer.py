"""Cross-window track stitching (the "online chainer").

Behavioral reference: ``/root/reference/stemseg/inference/online_chainer.py``.
TPU-native redesign: the reference keeps ragged per-frame label vectors over
fg-pixel coordinate lists, computes the overlap IoU matrix with a Python
double loop (:317-328) and synchronizes with the device at every window.
Here labels are DENSE ``[H, W]`` int32 maps (-1 = outlier/bg) that stay ON
DEVICE, and the whole stitching pass is restructured into three phases so
that NO device->host sync happens inside the per-window loop:

1. DISPATCH: every window is clustered in its own disjoint raw id block
   (``1 + i·K``), and the intersection-count matrices between each window's
   clusters and the raw labels committed on its overlap frames are queued as
   one-hot MXU matmuls — handles only, no fetches;
2. ASSOCIATE (host): all matrices are fetched after the device queue is
   full (fetch latency overlaps device compute), raw ids are folded to
   global track ids (intersections are additive over the disjoint per-chunk
   pixel sets, so chained identities aggregate exactly as the reference's
   IoU over relabeled maps), and the Hungarian assignment runs per window —
   every pair accepted regardless of IoU, like the reference (:330-343);
3. RELABEL: each committed chunk gets one jitted id-rewrite, the volume is
   stacked and crosses to the host ONCE.

Known deviation: the reference numbers new tracks ``highest_committed + 1``
(:45-50); disjoint per-window blocks give different (still globally unique)
id VALUES. Ids are arbitrary handles everywhere downstream except the
KITTI-MOTS overlap tie-break, which uses the per-pixel max of original ids
(``output_utils/kitti_mots.py:155-162``) and may therefore break ties
differently than the reference in the rare multi-track-overlap case.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

OUTLIER_LABEL = -1


def _pad_ids(ids: Sequence[int], multiple: int = 8) -> List[int]:
    """Pad an id list with -2 (an id that never occurs; -1 is the outlier)
    to a multiple, limiting the number of distinct jit signatures."""
    n = len(ids)
    target = ((n + multiple - 1) // multiple) * multiple
    return list(ids) + [-2] * (target - n)


@jax.jit
def _intersection_counts(existing: jnp.ndarray, new: jnp.ndarray,
                         cand1: jnp.ndarray, cand2: jnp.ndarray):
    """Pixel intersection matrix + per-id pixel counts between candidate id
    sets on the overlap frames — one dispatch, intersection on the MXU."""
    a = existing.reshape(-1)
    b = new.reshape(-1)
    onehot1 = (a[None, :] == cand1[:, None]).astype(jnp.float32)  # [C1, P]
    onehot2 = (b[None, :] == cand2[:, None]).astype(jnp.float32)  # [C2, P]
    inter = onehot1 @ onehot2.T
    return inter, jnp.sum(onehot1, axis=1), jnp.sum(onehot2, axis=1)


@jax.jit
def _relabel(labels: jnp.ndarray, src_ids: jnp.ndarray, dst_ids: jnp.ndarray):
    """Rewrite ids: labels == src_ids[k] -> dst_ids[k]. One dispatch."""
    out = labels
    eq = labels[None] == src_ids[:, None, None, None]  # [K, n, H, W]
    for k in range(src_ids.shape[0]):
        out = jnp.where(eq[k], dst_ids[k], out)
    return out


def associate_labels(existing: np.ndarray, new: np.ndarray
                     ) -> List[Tuple[int, int]]:
    """Host-side reference-shaped association (tests / small-scale callers):
    Hungarian over 1 - IoU between present ids."""
    ids1 = np.setdiff1d(np.unique(existing), [OUTLIER_LABEL])
    ids2 = np.setdiff1d(np.unique(new), [OUTLIER_LABEL])
    if len(ids1) == 0 or len(ids2) == 0:
        return []
    assert not set(ids1.tolist()) & set(ids2.tolist()), "label spaces overlap"
    inter, n1, n2 = _intersection_counts(
        jnp.asarray(existing), jnp.asarray(new),
        jnp.asarray(ids1), jnp.asarray(ids2))
    inter = np.asarray(inter)
    union = np.asarray(n1)[:, None] + np.asarray(n2)[None, :] - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
    rows, cols = linear_sum_assignment(1.0 - iou)
    return [(int(ids1[r]), int(ids2[c])) for r, c in zip(rows, cols)]


def fold_and_associate(jobs) -> Tuple[Dict[int, int], Dict[int, List[Tuple[int, int]]]]:
    """Host-side phase 2 shared by OnlineChainer and the fused pipeline.

    :param jobs: iterable of ``(window_idx, cand1, cand2, inter, n1, n2)``
        where ``cand1`` / ``cand2`` are the RAW candidate id lists the
        intersection matrix rows / cols correspond to (cand1 may be padded —
        extra rows must have ``n1 == 0``), ``inter`` [len(cand1)+, len(cand2)]
        pixel intersections on the overlap frames, ``n1`` / ``n2`` per-id
        pixel counts there. Jobs MUST be in window order (identity chains
        fold forward).
    :return: (gmap raw id -> global id, associations per window)
    """
    gmap: Dict[int, int] = {}
    assoc_by_window: Dict[int, List[Tuple[int, int]]] = {}

    for i, cand1, cand2, inter, n1, n2 in jobs:
        inter = np.asarray(inter)[:len(cand1)]
        n1 = np.asarray(n1)[:len(cand1)]
        n2 = np.asarray(n2)

        # fold raw candidate rows into global track ids (intersections
        # and counts are additive over disjoint chunk pixel sets)
        global_rows: Dict[int, np.ndarray] = {}
        global_counts: Dict[int, float] = {}
        for r, raw in enumerate(cand1):
            if n1[r] <= 0:
                continue
            g = gmap.get(raw, raw)
            if g in global_rows:
                global_rows[g] = global_rows[g] + inter[r]
                global_counts[g] += float(n1[r])
            else:
                global_rows[g] = inter[r].copy()
                global_counts[g] = float(n1[r])

        present_new = [c for c, raw in enumerate(cand2) if n2[c] > 0]
        if not global_rows or not present_new:
            continue

        g_ids = sorted(global_rows)
        inter_g = np.stack([global_rows[g] for g in g_ids])[:, present_new]
        ng = np.asarray([global_counts[g] for g in g_ids])
        nn = n2[present_new]
        union = ng[:, None] + nn[None, :] - inter_g
        iou = np.where(union > 0, inter_g / np.maximum(union, 1.0), 0.0)

        rows, cols = linear_sum_assignment(1.0 - iou)
        assoc = [(g_ids[r], cand2[present_new[c]]) for r, c in zip(rows, cols)]
        assoc_by_window[i] = assoc
        for g, new_raw in assoc:
            gmap[new_raw] = g
    return gmap, assoc_by_window


def track_stats(labels: np.ndarray) -> Tuple[Dict[int, int], Dict[int, int]]:
    """Per-track pixel counts and lifetimes from a dense [T, H, W] label
    volume (reference ``online_chainer.py:94-117``)."""
    counts: Dict[int, int] = {}
    first: Dict[int, int] = {}
    last: Dict[int, int] = {}
    for t in range(labels.shape[0]):
        ids, cnt = np.unique(labels[t], return_counts=True)
        for iid, c in zip(ids.tolist(), cnt.tolist()):
            counts[iid] = counts.get(iid, 0) + c
            first.setdefault(iid, t)
            last[iid] = t
    lifetimes = {iid: last[iid] - first[iid] for iid in counts}
    return counts, lifetimes


def relabel(labels: np.ndarray, associations: List[Tuple[int, int]]) -> np.ndarray:
    """Host-side rewrite of new-window ids to matched global ids."""
    out = labels.copy()
    for old_id, new_id in associations:
        out[labels == new_id] = old_id
    return out


class OnlineChainer:
    """Drives clustering per window and stitches labels across windows.
    Reference: ``online_chainer.py:120-243``.

    ``cluster_fn(embeddings, bandwidths, seediness, fg_mask, label_start)``
    must return a ClusterResult whose ``labels`` is a dense [Tw, H, W] int32
    device map with ids in ``[label_start, label_start + max_instances)``
    (see ``clustering.cluster_window``).
    """

    def __init__(self, cluster_fn, max_instances: int = 20):
        self.cluster_fn = cluster_fn
        self.max_instances = max_instances

    def process(self, fg_masks, windows: List[dict]):
        """:param fg_masks: [T, H, W] bool — full-sequence foreground
            (device or host array)
        :param windows: list of dicts with keys ``frames`` (unique sorted
            frame ids), ``embeddings`` [Tw,H,W,E], ``bandwidths`` [Tw,H,W,V],
            ``seediness`` [Tw,H,W] (device arrays)
        :return: (labels [T,H,W] int32 host array, counts dict,
                  lifetimes dict, per-window ClusterResult list)
        """
        fg_masks = jnp.asarray(fg_masks)
        num_frames = fg_masks.shape[0]
        k = self.max_instances

        # ---------------- phase 1: dispatch everything ----------------
        metas = []
        chunks: List[Tuple[List[int], jnp.ndarray]] = []  # (frames, raw labels)
        committed_by: Dict[int, int] = {}  # frame -> chunk index
        chunk_window: List[int] = []       # chunk index -> window index
        assoc_jobs = []  # per window i>0: (cand1_raw_padded, cand2_raw_padded, handles)

        prev_frames: List[int] = []
        for i, win in enumerate(windows):
            frames = list(win["frames"])
            idx = jnp.asarray(frames)
            window_fg = fg_masks[idx]
            label_start = 1 + i * k

            result = self.cluster_fn(win["embeddings"], win["bandwidths"],
                                     win["seediness"], window_fg, label_start)
            metas.append(result)

            if i == 0:
                new_frames = frames
                chunk_rows = result.labels
            else:
                overlap = sorted(set(frames) & set(prev_frames))
                cur_idx = jnp.asarray([frames.index(t) for t in overlap])
                cur_overlap = result.labels[cur_idx]

                src_chunks = sorted({committed_by[t] for t in overlap})
                # frame-aligned with cur_overlap (intersections are per-pixel)
                existing = jnp.stack(
                    [chunks[committed_by[t]][1][chunks[committed_by[t]][0].index(t)]
                     for t in overlap])
                cand1 = []
                for ci in src_chunks:
                    wj = chunk_window[ci]
                    cand1.extend(range(1 + wj * k, 1 + (wj + 1) * k))
                cand1 = sorted(set(cand1))
                cand2 = list(range(label_start, label_start + k))

                inter, n1, n2 = _intersection_counts(
                    existing, cur_overlap,
                    jnp.asarray(_pad_ids(cand1)), jnp.asarray(cand2))
                assoc_jobs.append((i, cand1, cand2, inter, n1, n2))

                new_frames = [t for t in frames if t not in overlap]
                new_idx = jnp.asarray([frames.index(t) for t in new_frames])
                chunk_rows = result.labels[new_idx]

            ci = len(chunks)
            chunks.append((new_frames, chunk_rows))
            chunk_window.append(i)
            for t in new_frames:
                committed_by[t] = ci
            prev_frames = frames

        # ------------- phase 2: fetch + associate on host -------------
        # ONE batched transfer for every queued matrix (each individual
        # fetch is a full host<->device round trip)
        fetched = jax.device_get([(j[3], j[4], j[5]) for j in assoc_jobs])
        gmap, _ = fold_and_associate(
            (i, cand1, cand2, inter, n1, n2)
            for (i, cand1, cand2, _, _, _), (inter, n1, n2)
            in zip(assoc_jobs, fetched))

        # ------------------ phase 3: relabel + gather ------------------
        final_rows: List[Optional[Tuple[jnp.ndarray, int]]] = [None] * num_frames
        for ci, (frames, rows) in enumerate(chunks):
            wi = chunk_window[ci]
            raw_ids = [1 + wi * k + j for j in range(k)]
            lut = [(raw, gmap[raw]) for raw in raw_ids
                   if gmap.get(raw, raw) != raw]
            if lut:
                src = jnp.asarray([s for s, _ in lut])
                dst = jnp.asarray([d for _, d in lut])
                rows = _relabel(rows, src, dst)
            for row_i, t in enumerate(frames):
                final_rows[t] = (rows, row_i)

        stacked = jnp.stack(
            [final_rows[t][0][final_rows[t][1]] for t in range(num_frames)])
        labels = np.asarray(stacked)  # ONE device->host transfer

        counts, lifetimes = track_stats(labels)
        return labels, counts, lifetimes, metas
