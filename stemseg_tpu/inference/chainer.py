"""Cross-window track stitching (the "online chainer").

Behavioral reference: ``/root/reference/stemseg/inference/online_chainer.py``.
TPU-native redesign: the reference keeps ragged per-frame label vectors over
fg-pixel coordinate lists and computes the overlap IoU matrix with a Python
double loop (:317-328). Here labels are DENSE ``[H, W]`` int32 maps (-1 =
outlier/bg) end-to-end:

* clustering emits dense label maps directly (``clustering.py``);
* the IoU matrix between existing and new labels on the overlap frames is a
  one-hot ``[K1, P] @ [P, K2]`` matmul on the MXU (one device op instead of
  K1·K2 Python iterations);
* only the ≤max_instances² cost matrix crosses to the host for the Hungarian
  assignment (``scipy.optimize.linear_sum_assignment``, as in :330).

Semantics preserved: label spaces are globally unique across windows
(``cluster_label_start`` threading, :186-198); association runs on the shared
overlap frames only; every Hungarian pair is accepted regardless of IoU —
including zero-overlap pairs — exactly like the reference (:330-343);
non-overlap frames of the new window are relabeled through the association
mapping and appended (:219-229); overlap frames keep their existing labels.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

OUTLIER_LABEL = -1


class TrackContainer:
    """Final stitched labels per frame, as dense [H, W] int32 maps.
    Reference: ``online_chainer.py:25-117``."""

    def __init__(self, num_frames: int):
        self._frame_labels: List[Optional[np.ndarray]] = [None] * num_frames
        self._highest_instance_id = 0

    def add_labels(self, frame_nums: Sequence[int], labels: Sequence[np.ndarray]) -> int:
        for t, lab in zip(frame_nums, labels):
            assert self._frame_labels[t] is None, f"frame {t} already labeled"
            lab = np.asarray(lab)
            self._frame_labels[t] = lab
            if lab.size:
                self._highest_instance_id = max(self._highest_instance_id,
                                                int(lab.max()))
        return self._highest_instance_id + 1

    def labels_exist(self, frame_num: int) -> bool:
        return self._frame_labels[frame_num] is not None

    def get_labels(self, frame_nums: Sequence[int]) -> List[np.ndarray]:
        assert all(self.labels_exist(t) for t in frame_nums)
        return [self._frame_labels[t] for t in frame_nums]

    def get_track_labels(self) -> Tuple[np.ndarray, Dict[int, int], Dict[int, int]]:
        """:return: (labels [T, H, W] int32, per-track pixel counts,
        per-track lifetimes last-first) — reference ``:94-117`` (the count and
        lifetime dicts include the outlier id, as there)."""
        labels = np.stack(self._frame_labels, axis=0)
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


def associate_labels(existing: np.ndarray, new: np.ndarray
                     ) -> List[Tuple[int, int]]:
    """Hungarian-match label ids between two dense label stacks over the same
    overlap frames. Reference ``online_chainer.py:291-343``.

    :param existing: [O, H, W] int32 global labels
    :param new: [O, H, W] int32 current-window labels (disjoint id space)
    :return: list of (existing_id, new_id) matches
    """
    ids1 = np.setdiff1d(np.unique(existing), [OUTLIER_LABEL])
    ids2 = np.setdiff1d(np.unique(new), [OUTLIER_LABEL])
    if len(ids1) == 0 or len(ids2) == 0:
        return []
    assert not set(ids1.tolist()) & set(ids2.tolist()), "label spaces overlap"

    # one-hot on device, intersection via MXU matmul
    a = jnp.asarray(existing.reshape(-1))
    b = jnp.asarray(new.reshape(-1))
    onehot1 = (a[None, :] == jnp.asarray(ids1)[:, None]).astype(jnp.float32)  # [K1, P]
    onehot2 = (b[None, :] == jnp.asarray(ids2)[:, None]).astype(jnp.float32)  # [K2, P]
    intersection = np.asarray(onehot1 @ onehot2.T)  # [K1, K2]
    n1 = np.asarray(jnp.sum(onehot1, axis=1))
    n2 = np.asarray(jnp.sum(onehot2, axis=1))
    union = n1[:, None] + n2[None, :] - intersection
    iou = intersection / np.maximum(union, 1.0)

    rows, cols = linear_sum_assignment(1.0 - iou)
    return [(int(ids1[r]), int(ids2[c])) for r, c in zip(rows, cols)]


def relabel(labels: np.ndarray, associations: List[Tuple[int, int]]) -> np.ndarray:
    """Rewrite new-window ids to their matched global ids."""
    out = labels.copy()
    for old_id, new_id in associations:
        out[labels == new_id] = old_id
    return out


class OnlineChainer:
    """Drives clustering per window and stitches labels across windows.
    Reference: ``online_chainer.py:120-243``.

    ``cluster_fn(embeddings, bandwidths, seediness, fg_mask, label_start)``
    must return a ClusterResult whose ``labels`` is a dense [Tw, H, W] int32
    map with globally-unique ids (see ``clustering.cluster_window``).
    """

    def __init__(self, cluster_fn):
        self.cluster_fn = cluster_fn

    def process(self, fg_masks: np.ndarray, windows: List[dict]):
        """:param fg_masks: [T, H, W] bool — full-sequence foreground
        :param windows: list of dicts with keys ``frames`` (unique sorted
            frame ids), ``embeddings`` [Tw,H,W,E], ``bandwidths`` [Tw,H,W,V],
            ``seediness`` [Tw,H,W] (device arrays ok)
        :return: (labels [T,H,W] int32, counts dict, lifetimes dict,
                  per-window meta list)
        """
        num_frames = fg_masks.shape[0]
        container = TrackContainer(num_frames)
        next_label = 1
        metas = []

        prev_frames: List[int] = []
        for i, win in enumerate(windows):
            frames = list(win["frames"])
            window_fg = jnp.asarray(fg_masks[np.asarray(frames)])

            result = self.cluster_fn(win["embeddings"], win["bandwidths"],
                                     win["seediness"], window_fg, next_label)
            labels = np.asarray(result.labels)  # [Tw, H, W]
            metas.append(result)

            if i == 0:
                next_label = container.add_labels(frames, list(labels))
                prev_frames = frames
                continue

            overlap = sorted(set(frames) & set(prev_frames))
            existing = np.stack(container.get_labels(overlap))
            cur_overlap = np.stack([labels[frames.index(t)] for t in overlap])
            associations = associate_labels(existing, cur_overlap)

            new_frames = [t for t in frames if t not in overlap]
            for t in new_frames:
                relabeled = relabel(labels[frames.index(t)], associations)
                next_label = container.add_labels([t], [relabeled])
            prev_frames = frames

        labels, counts, lifetimes = container.get_track_labels()
        return labels, counts, lifetimes, metas
