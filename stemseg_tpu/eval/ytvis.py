"""YouTube-VIS average precision (video instance segmentation AP).

Semantics follow the YouTube-VIS benchmark (COCO-style, evaluated by the
codalab server the reference's README defers to):

* **Spatio-temporal mask IoU** between a predicted track and a
  ground-truth track: sum of per-frame intersections / sum of per-frame
  unions over the whole video (missing frames = empty masks).
* Per category and IoU threshold, predictions are sorted by score and
  greedily matched to the not-yet-matched ground-truth track of highest
  IoU >= threshold (COCO matching).
* **AP** = 101-point interpolated area under the precision-recall curve,
  averaged over IoU thresholds 0.50:0.05:0.95, then over categories with
  at least one ground-truth track. AP50/AP75 are also reported.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 0.96, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def st_mask_iou(a: Sequence[np.ndarray], b: Sequence[np.ndarray]) -> float:
    """Spatio-temporal IoU of two tracks given as per-frame masks (entries
    may be None for absent frames)."""
    inter = union = 0.0
    for ma, mb in zip(a, b):
        if ma is None and mb is None:
            continue
        if ma is None:
            union += float(np.asarray(mb, bool).sum())
            continue
        if mb is None:
            union += float(np.asarray(ma, bool).sum())
            continue
        ma = np.asarray(ma, bool)
        mb = np.asarray(mb, bool)
        inter += float((ma & mb).sum())
        union += float((ma | mb).sum())
    return inter / union if union > 0 else 0.0


def _ap_from_matches(scores: np.ndarray, matched: np.ndarray,
                     n_gt: int) -> float:
    """COCO 101-point AP from score-ranked TP flags."""
    if n_gt == 0:
        return float("nan")
    if scores.size == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # monotone precision envelope
    for i in range(precision.size - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < precision.size, precision[np.minimum(idx, precision.size - 1)], 0.0)
    return float(np.mean(prec_at))


def evaluate_ytvis(gt_tracks: List[Dict], pred_tracks: List[Dict]
                   ) -> Dict[str, float]:
    """Score video instance segmentation predictions.

    :param gt_tracks: [{"video": str, "category": int,
        "masks": [per-frame mask or None]}]
    :param pred_tracks: same plus "score": float
    :return: {"AP", "AP50", "AP75"} averaged over categories present in GT
    """
    categories = sorted({g["category"] for g in gt_tracks})
    ap_per_cat: List[np.ndarray] = []
    for cat in categories:
        gts = [g for g in gt_tracks if g["category"] == cat]
        preds = [p for p in pred_tracks if p["category"] == cat]
        scores = np.asarray([p.get("score", 0.0) for p in preds])
        order = np.argsort(-scores, kind="stable")

        # IoU matrix once per category (video-gated)
        iou = np.zeros((len(preds), len(gts)))
        for pi, p in enumerate(preds):
            for gi, g in enumerate(gts):
                if p["video"] == g["video"]:
                    iou[pi, gi] = st_mask_iou(p["masks"], g["masks"])

        aps = []
        for thr in IOU_THRESHOLDS:
            gt_taken = np.zeros(len(gts), bool)
            matched = np.zeros(len(preds), bool)
            for pi in order:
                best, best_gi = thr, -1
                for gi in range(len(gts)):
                    if gt_taken[gi]:
                        continue
                    if iou[pi, gi] >= best:
                        best, best_gi = iou[pi, gi], gi
                if best_gi >= 0:
                    gt_taken[best_gi] = True
                    matched[pi] = True
            aps.append(_ap_from_matches(scores, matched, len(gts)))
        ap_per_cat.append(np.asarray(aps))

    if not ap_per_cat:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}
    per_thr = np.nanmean(np.stack(ap_per_cat), axis=0)
    return {"AP": float(np.mean(per_thr)),
            "AP50": float(per_thr[0]),
            "AP75": float(per_thr[5])}


def load_ytvis_results_json(path: str) -> List[Dict]:
    """Read the writer's ``results.json`` (YT-VIS submission format,
    ``output_utils/youtube_vis.py``) into evaluate_ytvis prediction dicts."""
    import json

    from stemseg_tpu.utils import rle as rle_codec

    with open(path) as fh:
        entries = json.load(fh)
    out = []
    for e in entries:
        masks = [None if seg is None else rle_codec.decode(seg)
                 for seg in e["segmentations"]]
        out.append({"video": e["video_id"], "category": e["category_id"],
                    "score": e.get("score", 0.0), "masks": masks})
    return out
