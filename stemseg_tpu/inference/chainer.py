"""Cross-window track stitching (the "online chainer").

Behavioral reference: ``/root/reference/stemseg/inference/online_chainer.py``.
TPU-native redesign: the reference keeps ragged per-frame label vectors over
fg-pixel coordinate lists and computes the overlap IoU matrix with a Python
double loop (:317-328). Here labels are DENSE ``[H, W]`` int32 maps (-1 =
outlier/bg) that stay ON DEVICE end-to-end:

* clustering emits dense label maps directly (``clustering.py``);
* the IoU matrix between existing and new labels on the overlap frames is a
  one-hot ``[K1, P] @ [P, K2]`` matmul on the MXU inside ONE jitted graph
  (one device dispatch instead of K1·K2 Python iterations);
* only the ≤max_instances² cost matrix and per-id presence vectors cross to
  the host for the Hungarian assignment
  (``scipy.optimize.linear_sum_assignment``, as in :330);
* relabeling through the association mapping is a jitted lookup, and the
  stitched per-frame labels accumulate as device arrays — one single
  device->host transfer of the full [T, H, W] label volume at the end.

Semantics preserved: label spaces are globally unique across windows
(``cluster_label_start`` threading, :186-198); association runs on the shared
overlap frames only, between ids actually PRESENT there; every Hungarian
pair is accepted regardless of IoU — including zero-overlap pairs — exactly
like the reference (:330-343); non-overlap frames of the new window are
relabeled through the mapping and appended (:219-229); overlap frames keep
their existing labels.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

OUTLIER_LABEL = -1


class TrackContainer:
    """Final stitched labels per frame, as dense [H, W] int32 device maps.
    Frames are committed in window-sized [n, H, W] chunks to avoid per-frame
    device ops. Reference: ``online_chainer.py:25-117``."""

    def __init__(self, num_frames: int):
        self._num_frames = num_frames
        # frame -> (chunk_array, row_index)
        self._where: List[Optional[Tuple[jnp.ndarray, int]]] = [None] * num_frames
        # frame -> host-known superset of ids in that frame (avoids device
        # syncs when building association candidate lists)
        self._frame_ids: List[Optional[set]] = [None] * num_frames
        self._highest_instance_id = 0

    def add_label_chunk(self, frame_nums: Sequence[int], labels: jnp.ndarray,
                        highest_id: int, id_set: set) -> int:
        """:param labels: [len(frame_nums), H, W] int32 device array
        :param highest_id: max id assigned so far (host-tracked; the
            reference derives it from committed ``labels.max()`` — ours can
            run ahead of it when a window's highest cluster id gets matched
            away, so our id NUMBERING may skip values the reference would
            reuse; ids stay globally unique either way)
        :param id_set: host-known superset of ids present in this chunk"""
        assert labels.shape[0] == len(frame_nums)
        for i, t in enumerate(frame_nums):
            assert self._where[t] is None, f"frame {t} already labeled"
            self._where[t] = (labels, i)
            self._frame_ids[t] = set(id_set)
        self._highest_instance_id = max(self._highest_instance_id, highest_id)
        return self._highest_instance_id + 1

    def candidate_ids(self, frame_nums: Sequence[int]) -> List[int]:
        out = set()
        for t in frame_nums:
            out |= self._frame_ids[t] or set()
        return sorted(out)

    def labels_exist(self, frame_num: int) -> bool:
        return self._where[frame_num] is not None

    def get_labels_stacked(self, frame_nums: Sequence[int]) -> jnp.ndarray:
        """[len(frame_nums), H, W] device stack (one dispatch)."""
        assert all(self.labels_exist(t) for t in frame_nums)
        return jnp.stack([self._where[t][0][self._where[t][1]]
                          for t in frame_nums])

    def get_track_labels(self) -> Tuple[np.ndarray, Dict[int, int], Dict[int, int]]:
        """:return: (labels [T, H, W] int32 HOST array, per-track pixel
        counts, per-track lifetimes last-first) — reference ``:94-117`` (the
        dicts include the outlier id, as there). One device->host transfer."""
        stacked = self.get_labels_stacked(list(range(self._num_frames)))
        labels = np.asarray(stacked)
        counts: Dict[int, int] = {}
        first: Dict[int, int] = {}
        last: Dict[int, int] = {}
        for t in range(labels.shape[0]):
            ids, cnt = np.unique(labels[t], return_counts=True)
            for i, c in zip(ids.tolist(), cnt.tolist()):
                counts[i] = counts.get(i, 0) + c
                first.setdefault(i, t)
                last[i] = t
        lifetimes = {i: last[i] - first[i] for i in counts}
        return labels, counts, lifetimes


def _pad_ids(ids: Sequence[int], multiple: int = 8) -> List[int]:
    """Pad an id list with -2 (an id that never occurs; -1 is the outlier)
    to a multiple, limiting the number of distinct jit signatures."""
    n = len(ids)
    target = ((n + multiple - 1) // multiple) * multiple
    return list(ids) + [-2] * (target - n)


@jax.jit
def _iou_and_presence(existing: jnp.ndarray, new: jnp.ndarray,
                      cand1: jnp.ndarray, cand2: jnp.ndarray):
    """IoU matrix + presence masks between candidate id sets on the overlap
    frames — one dispatch, intersection on the MXU."""
    a = existing.reshape(-1)
    b = new.reshape(-1)
    onehot1 = (a[None, :] == cand1[:, None]).astype(jnp.float32)  # [C1, P]
    onehot2 = (b[None, :] == cand2[:, None]).astype(jnp.float32)  # [C2, P]
    inter = onehot1 @ onehot2.T
    n1 = jnp.sum(onehot1, axis=1)
    n2 = jnp.sum(onehot2, axis=1)
    union = n1[:, None] + n2[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    return iou, n1 > 0, n2 > 0


@jax.jit
def _relabel(labels: jnp.ndarray, src_ids: jnp.ndarray, dst_ids: jnp.ndarray):
    """Rewrite ids: labels == src_ids[k] -> dst_ids[k] (identity rows where
    src == dst). One dispatch."""
    out = labels
    eq = labels[None] == src_ids[:, None, None, None]  # [K, n, H, W]
    for k in range(src_ids.shape[0]):
        out = jnp.where(eq[k], dst_ids[k], out)
    return out


def associate_labels(existing: np.ndarray, new: np.ndarray
                     ) -> List[Tuple[int, int]]:
    """Host-side reference-shaped association (used by tests and small-scale
    callers): Hungarian over 1 - IoU between present ids."""
    ids1 = np.setdiff1d(np.unique(existing), [OUTLIER_LABEL])
    ids2 = np.setdiff1d(np.unique(new), [OUTLIER_LABEL])
    if len(ids1) == 0 or len(ids2) == 0:
        return []
    assert not set(ids1.tolist()) & set(ids2.tolist()), "label spaces overlap"
    iou, p1, p2 = _iou_and_presence(jnp.asarray(existing), jnp.asarray(new),
                                    jnp.asarray(ids1), jnp.asarray(ids2))
    rows, cols = linear_sum_assignment(1.0 - np.asarray(iou))
    return [(int(ids1[r]), int(ids2[c])) for r, c in zip(rows, cols)]


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
    device map with globally-unique ids (see ``clustering.cluster_window``).

    Per window this costs ~5 device dispatches plus two small host syncs
    (the cluster validity vector and the ≤K² cost matrix); pixel data never
    leaves the device until the final label volume transfer.
    """

    def __init__(self, cluster_fn):
        self.cluster_fn = cluster_fn

    def process(self, fg_masks, windows: List[dict]):
        """:param fg_masks: [T, H, W] bool — full-sequence foreground
            (device or host array)
        :param windows: list of dicts with keys ``frames`` (unique sorted
            frame ids), ``embeddings`` [Tw,H,W,E], ``bandwidths`` [Tw,H,W,V],
            ``seediness`` [Tw,H,W] (device arrays)
        :return: (labels [T,H,W] int32 host array, counts dict,
                  lifetimes dict, per-window meta list)
        """
        fg_masks = jnp.asarray(fg_masks)
        num_frames = fg_masks.shape[0]
        container = TrackContainer(num_frames)
        next_label = 1
        metas = []

        prev_frames: List[int] = []

        for i, win in enumerate(windows):
            frames = list(win["frames"])
            idx = jnp.asarray(frames)
            window_fg = fg_masks[idx]

            result = self.cluster_fn(win["embeddings"], win["bandwidths"],
                                     win["seediness"], window_fg, next_label)
            metas.append(result)
            # small sync: which cluster slots were created
            valid = np.asarray(result.valid)
            new_ids = [next_label + k for k in range(len(valid)) if valid[k]]
            highest = max([next_label - 1] + new_ids)

            if i == 0:
                next_label = container.add_label_chunk(frames, result.labels,
                                                       highest, set(new_ids))
                prev_frames = frames
                continue

            overlap = sorted(set(frames) & set(prev_frames))
            cur_idx = [frames.index(t) for t in overlap]
            existing = container.get_labels_stacked(overlap)
            cur_overlap = result.labels[jnp.asarray(cur_idx)]

            cand_ids = container.candidate_ids(overlap)
            associations = []
            if cand_ids and new_ids:
                # pad candidate lists (id -2 never occurs) so the jitted IoU
                # graph is reused across windows
                c1 = _pad_ids(cand_ids)
                c2 = _pad_ids(new_ids)
                iou, p1, p2 = _iou_and_presence(existing, cur_overlap,
                                                jnp.asarray(c1), jnp.asarray(c2))
                iou = np.asarray(iou)  # small sync (<= C1 x C2 floats)
                present1 = np.asarray(p1)
                present2 = np.asarray(p2)
                rows = [r for r in range(len(cand_ids)) if present1[r]]
                cols = [c for c in range(len(new_ids)) if present2[c]]
                if rows and cols:
                    sub = 1.0 - iou[np.ix_(rows, cols)]
                    ri, ci = linear_sum_assignment(sub)
                    associations = [(cand_ids[rows[r]], new_ids[cols[c]])
                                    for r, c in zip(ri, ci)]

            new_frames = [t for t in frames if t not in overlap]
            new_idx = jnp.asarray([frames.index(t) for t in new_frames])
            chunk = result.labels[new_idx]
            if associations:
                src = jnp.asarray([n for _, n in associations])
                dst = jnp.asarray([o for o, _ in associations])
                chunk = _relabel(chunk, src, dst)

            matched_new = {n for _, n in associations}
            chunk_ids = ({n for n in new_ids if n not in matched_new}
                         | {o for o, _ in associations})
            next_label = container.add_label_chunk(new_frames, chunk, highest,
                                                   chunk_ids)
            prev_frames = frames

        labels, counts, lifetimes = container.get_track_labels()
        return labels, counts, lifetimes, metas
