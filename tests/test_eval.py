"""Evaluation metrics (stemseg_tpu.eval): hand-computed J / F / sMOTSA / AP
values on synthetic masks, plus format round-trips through the writers'
file formats."""

import numpy as np
import pytest

from stemseg_tpu.eval.davis import (
    db_eval_boundary,
    db_eval_iou,
    evaluate_davis,
    evaluate_davis_sequence,
)
from stemseg_tpu.eval.mots import evaluate_mots, parse_mots_txt
from stemseg_tpu.eval.ytvis import evaluate_ytvis, st_mask_iou


def _rect(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), np.uint8)
    m[r0:r1, c0:c1] = 1
    return m


# ---------------------------------------------------------------------------
# DAVIS J&F
# ---------------------------------------------------------------------------


def test_j_exact_values():
    gt = np.stack([_rect(20, 20, 0, 10, 0, 10)])          # 100 px
    pred = np.stack([_rect(20, 20, 0, 10, 5, 15)])        # overlap 50, union 150
    np.testing.assert_allclose(db_eval_iou(gt, pred), [50.0 / 150.0])

    # both empty -> 1.0; one empty -> 0.0
    empty = np.zeros((1, 20, 20), np.uint8)
    np.testing.assert_allclose(db_eval_iou(empty, empty), [1.0])
    np.testing.assert_allclose(db_eval_iou(gt, empty), [0.0])


def test_f_identical_and_disjoint():
    m = np.stack([_rect(64, 64, 10, 30, 10, 30)])
    np.testing.assert_allclose(db_eval_boundary(m, m), [1.0])
    far = np.stack([_rect(64, 64, 40, 60, 40, 60)])
    assert db_eval_boundary(m, far)[0] < 0.2
    # empty/empty -> 1, one-sided -> 0
    empty = np.zeros((1, 64, 64), np.uint8)
    np.testing.assert_allclose(db_eval_boundary(empty, empty), [1.0])
    np.testing.assert_allclose(db_eval_boundary(m, empty), [0.0])


# --- official davis2017-evaluation boundary algorithm, transcribed ---------
#
# The official package is absent from this image; this is a LITERAL
# transcription of ``davis2017/metrics.py::db_eval_boundary`` + ``_seg2bmap``
# (loop-level, deliberately un-vectorized so it shares no code with the
# implementation under test), used to cross-check our vectorized
# ``eval/davis.py`` on adversarial masks. Notes on official quirks:
#
# * ``_seg2bmap`` has a downsampling branch (width/height args with a
#   floor-index remap); ``db_eval_boundary`` always calls it WITHOUT those
#   args, so the branch is dead in the official evaluator — our
#   implementation intentionally omits it.
# * radius = ``np.ceil(bound_th * np.linalg.norm(mask.shape))`` (float
#   ceil of the image diagonal).
# * dilation uses ``skimage.morphology.disk(radius)`` = the elementwise
#   {y²+x² <= r²} ball; we replicate it literally and dilate with scipy
#   (origin-centered, zero-padded borders) — our implementation uses
#   cv2.dilate with the same element, which these tests prove equivalent
#   including masks touching the borders.
# * zero-boundary cases: (P, R) = (1, 0) / (0, 1) / (1, 1) for
#   empty-pred / empty-gt / both-empty — F works out to 0 / 0 / 1, which is
#   what our implementation returns directly.


def _official_seg2bmap(seg):
    seg = np.asarray(seg, bool)
    h, w = seg.shape
    b = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            p = seg[y, x]
            e = seg[y, x + 1] if x + 1 < w else False
            s = seg[y + 1, x] if y + 1 < h else False
            se = seg[y + 1, x + 1] if (y + 1 < h and x + 1 < w) else False
            if y < h - 1 and x < w - 1:
                b[y, x] = (p ^ e) | (p ^ s) | (p ^ se)
            elif y == h - 1 and x < w - 1:
                b[y, x] = p ^ e
            elif y < h - 1 and x == w - 1:
                b[y, x] = p ^ s
            else:  # bottom-right corner: never boundary
                b[y, x] = False
    return b


def _official_db_eval_boundary(pred, gt, bound_th=0.008):
    from scipy.ndimage import binary_dilation

    bound_pix = np.ceil(bound_th * np.linalg.norm(pred.shape))
    r = int(bound_pix)
    yy, xx = np.ogrid[-r:r + 1, -r:r + 1]
    disk = (xx * xx + yy * yy <= bound_pix * bound_pix)

    fg_boundary = _official_seg2bmap(pred)
    gt_boundary = _official_seg2bmap(gt)
    fg_dil = binary_dilation(fg_boundary, disk)
    gt_dil = binary_dilation(gt_boundary, disk)
    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil
    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()
    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = fg_match.sum() / float(n_fg)
        recall = gt_match.sum() / float(n_gt)
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def _adversarial_masks(h, w, rng):
    """Masks that stress the seg2bmap edge rules and dilation borders:
    thin 1-px structures, border-touching rectangles, single pixels at the
    corners (incl. bottom-right, which seg2bmap never marks), full / empty
    masks, random noise, and diagonal 1-px lines."""
    masks = [np.zeros((h, w), np.uint8), np.ones((h, w), np.uint8)]
    for y, x in [(0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1),
                 (h // 2, w // 2)]:
        m = np.zeros((h, w), np.uint8)
        m[y, x] = 1
        masks.append(m)
    m = np.zeros((h, w), np.uint8)
    m[h // 2, :] = 1                      # full-width 1-px line
    masks.append(m)
    m = np.zeros((h, w), np.uint8)
    m[:, w - 1] = 1                       # last column
    masks.append(m)
    m = np.zeros((h, w), np.uint8)
    m[h - 1, :] = 1                       # last row
    masks.append(m)
    m = np.zeros((h, w), np.uint8)
    for i in range(min(h, w)):
        m[i, i] = 1                       # diagonal
    masks.append(m)
    masks.append(_rect(h, w, 0, h, 0, 2))   # border-flush tall strip
    masks.append(_rect(h, w, h // 3, 2 * h // 3, w // 3, 2 * w // 3))
    for _ in range(3):
        masks.append((rng.rand(h, w) > 0.7).astype(np.uint8))
    return masks


@pytest.mark.parametrize("h,w", [(16, 16), (17, 31), (24, 13), (64, 113)])
def test_f_matches_official_transcription(h, w):
    """Our vectorized db_eval_boundary must equal the literal official
    algorithm (seg2bmap edge rules, float-radius disk, dilation borders,
    zero-boundary P/R table) on every adversarial mask pair."""
    rng = np.random.RandomState(h * 100 + w)
    masks = _adversarial_masks(h, w, rng)
    pairs = [(a, b) for a in masks for b in masks[:6]]
    pairs += list(zip(masks, masks))
    for gt, pred in pairs:
        want = _official_db_eval_boundary(np.asarray(pred, bool),
                                          np.asarray(gt, bool))
        got = db_eval_boundary(gt[None], pred[None])[0]
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=(
            f"F mismatch at {h}x{w}: gt.sum={gt.sum()} pred.sum={pred.sum()}"))


def test_f_radius_follows_official_ceil():
    """The dilation radius is ceil(0.008 * diag) — check the rounding at
    sizes that straddle integer radii: diag(64,113)=129.9 -> r=2;
    diag(88,88)=124.5 -> r=1; diag(89,89)=125.9 -> r=2 (0.008*125.865=1.0069).
    A 2-px boundary shift then flips F at the radius step."""
    for (h, w), expect_r in [((64, 113), 2), ((88, 88), 1), ((89, 89), 2)]:
        assert int(np.ceil(0.008 * np.linalg.norm((h, w)))) == expect_r
        a = np.zeros((h, w), np.uint8)
        b = np.zeros((h, w), np.uint8)
        a[10:h - 10, 10:w - 20] = 1
        b[10:h - 10, 12:w - 18] = 1      # 2-px horizontal shift
        f = db_eval_boundary(a[None], b[None])[0]
        if expect_r >= 2:
            # every boundary pixel within the disk of the counterpart
            assert f == 1.0, (h, w, f)
        else:
            assert f < 1.0, (h, w, f)


def test_f_tolerates_small_shift():
    """A 1-px shift stays within the dilation radius at 64x64 (radius
    ceil(0.008*diag)=1), so F stays 1.0."""
    a = np.stack([_rect(64, 64, 10, 30, 10, 30)])
    b = np.stack([_rect(64, 64, 10, 30, 11, 31)])
    np.testing.assert_allclose(db_eval_boundary(a, b), [1.0])


def test_unsupervised_matching_swapped_proposals():
    """Two objects, proposals given in swapped order -> Hungarian recovers
    the right assignment; a third junk proposal is ignored."""
    o1 = np.stack([_rect(32, 32, 2, 10, 2, 10)] * 3)
    o2 = np.stack([_rect(32, 32, 20, 30, 20, 30)] * 3)
    junk = np.stack([_rect(32, 32, 0, 2, 30, 32)] * 3)
    j_means, f_means = evaluate_davis_sequence([o1, o2], [o2, junk, o1])
    np.testing.assert_allclose(j_means, [1.0, 1.0])
    np.testing.assert_allclose(f_means, [1.0, 1.0])

    # unmatched object scores 0
    j_means, f_means = evaluate_davis_sequence([o1, o2], [o1])
    np.testing.assert_allclose(j_means, [1.0, 0.0])


def test_evaluate_davis_global_mean():
    o1 = np.stack([_rect(32, 32, 2, 10, 2, 10)] * 2)
    half = np.stack([_rect(32, 32, 2, 10, 2, 6)] * 2)  # J = 32/64 = 0.5
    res = evaluate_davis({"a": [o1]}, {"a": [half]})
    np.testing.assert_allclose(res["J_mean"], 0.5)
    assert 0.0 < res["J&F"] <= 1.0


def test_davis_results_dir_loader(tmp_path):
    from PIL import Image

    from stemseg_tpu.eval.davis import load_davis_results_dir
    from stemseg_tpu.utils.vis import create_color_map

    seq = tmp_path / "seqA"
    seq.mkdir()
    for t in range(2):
        arr = np.zeros((8, 10), np.uint8)
        arr[2:5, 3:7] = 1
        arr[6:8, 0:2] = 2
        img = Image.fromarray(arr, mode="P")
        img.putpalette(create_color_map().flatten().tolist())
        img.save(seq / f"{t:05d}.png")
    masks = load_davis_results_dir(str(seq))
    assert len(masks) == 2
    assert masks[0].shape == (2, 8, 10)
    assert masks[0].sum() == 2 * 12 and masks[1].sum() == 2 * 4


# ---------------------------------------------------------------------------
# KITTI-MOTS CLEAR-MOTS
# ---------------------------------------------------------------------------


def test_smotsa_perfect():
    g = [{1: _rect(16, 16, 0, 8, 0, 8)}, {1: _rect(16, 16, 0, 8, 0, 8)}]
    res = evaluate_mots(g, [{7: g[0][1]}, {7: g[1][1]}])
    assert res["TP"] == 2 and res["FP"] == 0 and res["IDS"] == 0
    np.testing.assert_allclose(res["sMOTSA"], 1.0)
    np.testing.assert_allclose(res["MOTSP"], 1.0)


def test_smotsa_id_switch_and_fp():
    m = _rect(16, 16, 0, 8, 0, 8)
    other = _rect(16, 16, 10, 16, 10, 16)
    # frame 0: hyp 7 matches gt 1; frame 1: hyp 8 matches gt 1 (id switch)
    # plus an unmatched hypothesis (FP) in frame 1
    g = [{1: m}, {1: m}]
    h = [{7: m}, {8: m, 9: other}]
    res = evaluate_mots(g, h)
    assert res["TP"] == 2 and res["IDS"] == 1 and res["FP"] == 1
    # sMOTSA = (2.0 - 1 - 1) / 2 = 0.0
    np.testing.assert_allclose(res["sMOTSA"], 0.0)
    # MOTSA = (2 - 1 - 1) / 2 = 0.0
    np.testing.assert_allclose(res["MOTSA"], 0.0)


def test_smotsa_soft_iou_and_fn():
    gt_m = _rect(16, 16, 0, 8, 0, 16)       # 128 px
    hyp_m = _rect(16, 16, 0, 8, 0, 12)      # 96 px, inter 96, union 128
    g = [{1: gt_m, 2: _rect(16, 16, 12, 16, 0, 4)}]
    h = [{7: hyp_m}]
    res = evaluate_mots(g, h)
    assert res["TP"] == 1 and res["FN"] == 1
    np.testing.assert_allclose(res["soft_TP"], 96.0 / 128.0)
    np.testing.assert_allclose(res["sMOTSA"], (96.0 / 128.0) / 2.0)


def test_ignore_region_suppresses_fp():
    m = _rect(16, 16, 0, 8, 0, 8)
    ignore = _rect(16, 16, 0, 8, 0, 8)
    res = evaluate_mots([{}], [{7: m}], [ignore])
    assert res["FP"] == 0
    res = evaluate_mots([{}], [{7: m}], [None])
    assert res["FP"] == 1


def test_parse_mots_txt_roundtrip(tmp_path):
    from stemseg_tpu.utils import rle as rle_codec

    m0 = _rect(12, 14, 2, 6, 3, 9)
    m1 = _rect(12, 14, 0, 4, 0, 4)
    lines = []
    for t, (tid, m) in enumerate([(2001, m0), (2001, m1)]):
        enc = rle_codec.encode(m)
        lines.append(f"{t} {tid} 2 12 14 {enc['counts'].decode()}")
    p = tmp_path / "0002.txt"
    p.write_text("\n".join(lines) + "\n")
    frames, track_class = parse_mots_txt(str(p))
    assert len(frames) == 2
    assert track_class == {2001: 2}
    np.testing.assert_array_equal(frames[0][2001], m0)
    np.testing.assert_array_equal(frames[1][2001], m1)


# ---------------------------------------------------------------------------
# YT-VIS AP
# ---------------------------------------------------------------------------


def test_st_mask_iou():
    a = [_rect(8, 8, 0, 4, 0, 8), _rect(8, 8, 0, 4, 0, 8)]   # 32+32
    b = [_rect(8, 8, 0, 4, 0, 4), None]                      # 16+0
    # inter = 16 + 0, union = 32 + 32
    np.testing.assert_allclose(st_mask_iou(a, b), 16.0 / 64.0)


def test_ytvis_ap_perfect_and_half():
    m = _rect(16, 16, 0, 8, 0, 8)
    gt = [{"video": "v", "category": 1, "masks": [m, m]}]
    pred_perfect = [{"video": "v", "category": 1, "score": 0.9,
                     "masks": [m, m]}]
    res = evaluate_ytvis(gt, pred_perfect)
    np.testing.assert_allclose(res["AP"], 1.0)
    np.testing.assert_allclose(res["AP50"], 1.0)

    # IoU 0.6 prediction: matches at thresholds .50/.55/.60 only
    # -> AP = 3/10, AP50 = 1, AP75 = 0
    m6 = _rect(16, 16, 0, 8, 0, 5)   # inter 40, union... 64+40-40=64 -> 0.625
    pred_part = [{"video": "v", "category": 1, "score": 0.9,
                  "masks": [m6, m6]}]
    res = evaluate_ytvis(gt, pred_part)
    np.testing.assert_allclose(res["AP50"], 1.0)
    np.testing.assert_allclose(res["AP75"], 0.0)
    np.testing.assert_allclose(res["AP"], 3.0 / 10.0)


def test_ytvis_ap_ranking():
    """A high-scored FP above a TP halves interpolated precision at full
    recall; with one GT, AP50 = precision at the TP = 0.5."""
    m = _rect(16, 16, 0, 8, 0, 8)
    far = _rect(16, 16, 10, 16, 10, 16)
    gt = [{"video": "v", "category": 1, "masks": [m]}]
    preds = [
        {"video": "v", "category": 1, "score": 0.9, "masks": [far]},  # FP
        {"video": "v", "category": 1, "score": 0.5, "masks": [m]},    # TP
    ]
    res = evaluate_ytvis(gt, preds)
    np.testing.assert_allclose(res["AP50"], 0.5)


def test_ytvis_category_averaging():
    m = _rect(16, 16, 0, 8, 0, 8)
    gt = [{"video": "v", "category": 1, "masks": [m]},
          {"video": "v", "category": 2, "masks": [m]}]
    preds = [{"video": "v", "category": 1, "score": 0.9, "masks": [m]}]
    res = evaluate_ytvis(gt, preds)  # cat 1 perfect, cat 2 zero
    np.testing.assert_allclose(res["AP"], 0.5)


def test_ytvis_area_buckets():
    """AP_S/M/L use the track's average per-frame area with COCO buckets
    (< 32², 32²-96², > 96²) and COCO ignore semantics: a prediction
    matched to an out-of-bucket GT is ignored, not an FP."""
    small = _rect(32, 32, 0, 16, 0, 16)        # 256 px  -> S
    medium = _rect(64, 64, 0, 40, 0, 40)       # 1600 px -> M
    large = _rect(128, 128, 0, 100, 0, 100)    # 10000 px -> L
    gt = [{"video": "vs", "category": 1, "masks": [small]},
          {"video": "vm", "category": 1, "masks": [medium]},
          {"video": "vl", "category": 1, "masks": [large]}]
    preds = [{"video": "vs", "category": 1, "score": 0.9, "masks": [small]},
             {"video": "vm", "category": 1, "score": 0.8, "masks": [medium]}]
    res = evaluate_ytvis(gt, preds)
    np.testing.assert_allclose(res["AP_S"], 1.0)
    np.testing.assert_allclose(res["AP_M"], 1.0)
    np.testing.assert_allclose(res["AP_L"], 0.0)
    # pooled: 2 TPs at precision 1, third gt unmatched -> recall tops at 2/3;
    # 101-pt interpolation: points 0.00-0.66 score 1.0 -> AP = 67/101
    np.testing.assert_allclose(res["AP"], 67.0 / 101.0)


def test_ytvis_ar_at_maxdets():
    """AR@1 caps each video at its single highest-scored prediction; AR@10
    admits both."""
    m1 = _rect(16, 16, 0, 8, 0, 8)
    m2 = _rect(16, 16, 8, 16, 8, 16)
    gt = [{"video": "v", "category": 1, "masks": [m1]},
          {"video": "v", "category": 1, "masks": [m2]}]
    preds = [{"video": "v", "category": 1, "score": 0.9, "masks": [m1]},
             {"video": "v", "category": 1, "score": 0.5, "masks": [m2]}]
    res = evaluate_ytvis(gt, preds)
    np.testing.assert_allclose(res["AR10"], 1.0)
    np.testing.assert_allclose(res["AR1"], 0.5)
    np.testing.assert_allclose(res["AP"], 1.0)


def test_ytvis_coco_tie_break_last_gt_wins():
    """pycocotools' matching loop is `if iou < best: continue` then an
    unconditional update, so on an exact IoU tie the LATER gt in
    (ignore-sorted, stable) order takes the match. Two identical gts, one
    perfect prediction: the second gt gets matched either way — the
    observable contract is exactly one TP and one FN."""
    m = _rect(16, 16, 0, 8, 0, 8)
    gt = [{"video": "v", "category": 1, "masks": [m]},
          {"video": "v", "category": 1, "masks": [m]}]
    preds = [{"video": "v", "category": 1, "score": 0.9, "masks": [m]}]
    res = evaluate_ytvis(gt, preds)
    # one of two gts matched at every threshold -> AR10 = 0.5
    np.testing.assert_allclose(res["AR10"], 0.5)


def test_ytvis_no_input_mutation_and_maxdets_prefix():
    """evaluate_ytvis must not write into the caller's track dicts, and
    AR@k must equal a run where each video's predictions are pre-truncated
    to its k highest-scored (greedy matching is prefix-stable, COCOeval's
    accumulate-time maxDets slicing)."""
    rng = np.random.RandomState(7)
    gt, preds = [], []
    for vid in ("a", "b"):
        for k in range(2):
            msk = [rng.rand(24, 24) > 0.5 for _ in range(3)]
            gt.append({"video": vid, "category": 1, "masks": msk})
            preds.append({"video": vid, "category": 1,
                          "score": 0.9 - 0.2 * k, "masks": msk})
        # low-scored FP in each video
        preds.append({"video": vid, "category": 1, "score": 0.1,
                      "masks": [rng.rand(24, 24) > 0.5 for _ in range(3)]})
    res = evaluate_ytvis(gt, preds)
    assert all(set(g) == {"video", "category", "masks"} for g in gt)
    assert all(set(p) == {"video", "category", "masks", "score"}
               for p in preds)

    top1 = [max((p for p in preds if p["video"] == vid),
                key=lambda p: p["score"]) for vid in ("a", "b")]
    res_top1 = evaluate_ytvis(gt, top1)
    np.testing.assert_allclose(res["AR1"], res_top1["AR10"])


def test_ytvis_results_json_loader(tmp_path):
    import json

    from stemseg_tpu.eval.ytvis import load_ytvis_results_json
    from stemseg_tpu.utils import rle as rle_codec

    m = _rect(10, 12, 2, 6, 3, 9)
    enc = rle_codec.encode(m)
    enc["counts"] = enc["counts"].decode("utf-8")
    entries = [{"video_id": "v1", "score": 0.7, "category_id": 3,
                "segmentations": [enc, None]}]
    p = tmp_path / "results.json"
    p.write_text(json.dumps(entries))
    tracks = load_ytvis_results_json(str(p))
    assert tracks[0]["video"] == "v1" and tracks[0]["category"] == 3
    np.testing.assert_array_equal(tracks[0]["masks"][0], m)
    assert tracks[0]["masks"][1] is None


def test_davis_recall_and_decay():
    """Recall = fraction of frames with score > 0.5; decay = first-bin mean
    minus last-bin mean with the official inclusive binning: for N=4,
    ids = round(linspace(1,4,5)+1e-10)-1 = [0,1,2,2,3], so the first bin is
    series[0:2] and the last bin series[2:4]."""
    from stemseg_tpu.eval.davis import _decay, _recall

    series = np.array([1.0, 1.0, 0.4, 0.2])
    np.testing.assert_allclose(_recall(series), 0.5)
    np.testing.assert_allclose(_decay(series), 1.0 - 0.3)

    # end-to-end: prediction perfect for the first half of 4 frames, absent
    # in the second half -> J series [1, 1, 0, 0]: recall 0.5, decay 1.0
    full = np.stack([_rect(16, 16, 0, 8, 0, 8)] * 4)
    half = full.copy()
    half[2:] = 0
    res = evaluate_davis({"s": [full]}, {"s": [half]})
    np.testing.assert_allclose(res["J_recall"], 0.5)
    np.testing.assert_allclose(res["J_decay"], 1.0)
    np.testing.assert_allclose(res["J_mean"], 0.5)
