"""CLEAR-MOTS metrics for KITTI-MOTS (sMOTSA / MOTSA / MOTSP).

Semantics follow the MOTS paper (Voigtlaender et al., CVPR'19) and the
official ``mots_tools`` scorer the reference's README defers to:

* Per frame, ground-truth masks and hypothesis masks are matched by mask
  IoU with Hungarian assignment; a pair counts as TP iff IoU > 0.5.
* ``IDS`` (id switches): a TP whose ground-truth track was previously
  matched to a different hypothesis id.
* Hypotheses overlapping an *ignore region* by more than 0.5 of their own
  area (and matching no ground truth) are removed before counting FPs.
* ``sMOTSA = (soft_TP - FP - IDS) / num_gt`` where ``soft_TP`` is the sum
  of matched IoUs; ``MOTSA = (TP - FP - IDS) / num_gt``;
  ``MOTSP = soft_TP / TP``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy.optimize import linear_sum_assignment


def _mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(bool)
    b = b.astype(bool)
    inter = float(np.logical_and(a, b).sum())
    union = float(np.logical_or(a, b).sum())
    return inter / union if union > 0 else 0.0


def evaluate_mots(gt_frames: Sequence[Dict[int, np.ndarray]],
                  hyp_frames: Sequence[Dict[int, np.ndarray]],
                  ignore_frames: Optional[Sequence[Optional[np.ndarray]]] = None
                  ) -> Dict[str, float]:
    """Score one sequence (or a concatenation of sequences with disjoint
    track ids).

    :param gt_frames: per frame, {gt_track_id: [H, W] mask}
    :param hyp_frames: per frame, {hyp_track_id: [H, W] mask}
    :param ignore_frames: optional per-frame ignore-region mask
    :return: {sMOTSA, MOTSA, MOTSP, TP, FP, FN, IDS, soft_TP, num_gt}
    """
    assert len(gt_frames) == len(hyp_frames)
    if ignore_frames is None:
        ignore_frames = [None] * len(gt_frames)

    tp = fp = fn = ids = 0
    soft_tp = 0.0
    num_gt = 0
    last_match: Dict[int, int] = {}  # gt track -> hyp id of last match

    for gt, hyp, ignore in zip(gt_frames, hyp_frames, ignore_frames):
        g_ids = sorted(gt)
        h_ids = sorted(hyp)
        num_gt += len(g_ids)

        iou = np.zeros((len(g_ids), len(h_ids)))
        for i, gi in enumerate(g_ids):
            for j, hj in enumerate(h_ids):
                iou[i, j] = _mask_iou(gt[gi], hyp[hj])

        matched_h: set = set()
        matched_g: set = set()
        if g_ids and h_ids:
            rows, cols = linear_sum_assignment(-iou)
            for i, j in zip(rows, cols):
                if iou[i, j] > 0.5:
                    tp += 1
                    soft_tp += float(iou[i, j])
                    matched_g.add(g_ids[i])
                    matched_h.add(h_ids[j])
                    prev = last_match.get(g_ids[i])
                    if prev is not None and prev != h_ids[j]:
                        ids += 1
                    last_match[g_ids[i]] = h_ids[j]

        fn += len(g_ids) - len(matched_g)

        for hj in h_ids:
            if hj in matched_h:
                continue
            if ignore is not None:
                m = hyp[hj].astype(bool)
                area = float(m.sum())
                if area > 0 and float((m & ignore.astype(bool)).sum()) / area > 0.5:
                    continue  # unmatched but inside ignore region: no FP
            fp += 1

    return {
        "sMOTSA": (soft_tp - fp - ids) / num_gt if num_gt else 0.0,
        "MOTSA": (tp - fp - ids) / num_gt if num_gt else 0.0,
        "MOTSP": soft_tp / tp if tp else 0.0,
        "TP": tp, "FP": fp, "FN": fn, "IDS": ids,
        "soft_TP": soft_tp, "num_gt": num_gt,
    }


def parse_mots_txt(path: str):
    """Read a KITTI-MOTS results/GT txt (``frame id class h w rle`` lines,
    the format our writer emits — ``output_utils/kitti_mots.py``) into
    ``(frames, track_class)``: per-frame {track_id: mask} dicts plus a
    {track_id: class_id} map from the class column. Class-10 entries
    (ignore regions in GT files) are kept with their ids; filter by
    ``track_class`` upstream — the official ``mots_tools`` scorer is
    per-class (cars and pedestrians are never cross-matched)."""
    from stemseg_tpu.utils import rle as rle_codec

    frames: Dict[int, Dict[int, np.ndarray]] = {}
    track_class: Dict[int, int] = {}
    max_t = -1
    with open(path) as fh:
        for line in fh:
            parts = line.strip().split(" ")
            if len(parts) < 6:
                continue
            t, tid, cls = int(parts[0]), int(parts[1]), int(parts[2])
            h, w = int(parts[3]), int(parts[4])
            counts = " ".join(parts[5:])
            mask = rle_codec.decode({"size": [h, w], "counts": counts})
            frames.setdefault(t, {})[tid] = mask
            track_class[tid] = cls
            max_t = max(max_t, t)
    return [frames.get(t, {}) for t in range(max_t + 1)], track_class
