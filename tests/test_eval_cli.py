"""Eval CLI (stemseg_tpu.eval.main) end-to-end on synthetic datasets:
predictions identical to ground truth must score perfectly in every
format (DAVIS PNGs, YT-VIS results.json, KITTI-MOTS txt)."""

import json
import os

import numpy as np
import pytest

from stemseg_tpu.utils import rle as rle_codec


def _rect(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), np.uint8)
    m[r0:r1, c0:c1] = 1
    return m


def _write_gt_json(path, seq_id, masks_by_iid, categories, h, w, n_frames,
                   image_ext="jpg"):
    """masks_by_iid: {iid: [per-frame mask]}"""
    segmentations = []
    for t in range(n_frames):
        seg_t = {}
        for iid, frames in masks_by_iid.items():
            if frames[t] is not None and frames[t].any():
                seg_t[str(iid)] = rle_codec.encode(
                    frames[t])["counts"].decode("utf-8")
        segmentations.append(seg_t)
    ds = {"meta": {"category_labels": {str(c): f"cat{c}"
                                       for c in set(categories.values())}},
          "sequences": [{"id": seq_id, "height": h, "width": w,
                         "image_paths": [f"{seq_id}/{t:05d}.{image_ext}"
                                         for t in range(n_frames)],
                         "categories": {str(i): c
                                        for i, c in categories.items()},
                         "segmentations": segmentations}]}
    with open(path, "w") as fh:
        json.dump(ds, fh)


def test_eval_cli_davis_perfect(tmp_path, monkeypatch):
    from PIL import Image

    from stemseg_tpu.eval.main import main as eval_main
    from stemseg_tpu.utils.vis import create_color_map

    h, w, t_total = 40, 48, 3
    m1 = [_rect(h, w, 5, 15, 5, 20) for _ in range(t_total)]
    m2 = [_rect(h, w, 25, 35, 30, 45) for _ in range(t_total)]

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    _write_gt_json(str(ann_dir / "davis_val.json"), "seqA",
                   {1: m1, 2: m2}, {1: 1, 2: 1}, h, w, t_total)
    monkeypatch.setenv("DAVIS_BASE_DIR", str(tmp_path / "davis"))
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", str(ann_dir))

    # results PNGs: object ids swapped relative to GT order (unsupervised
    # protocol must not care)
    res = tmp_path / "results" / "seqA"
    res.mkdir(parents=True)
    palette = create_color_map().flatten().tolist()
    for t in range(t_total):
        arr = (m1[t] * 2 + m2[t] * 1).astype(np.uint8)
        img = Image.fromarray(arr, mode="P")
        img.putpalette(palette)
        img.save(res / f"{t:05d}.png")

    metrics = eval_main(["--dataset", "davis",
                         "--results", str(tmp_path / "results")])
    assert metrics["J_mean"] == pytest.approx(1.0)
    assert metrics["F_mean"] == pytest.approx(1.0)
    assert metrics["J&F"] == pytest.approx(1.0)


def test_eval_cli_ytvis_perfect(tmp_path, monkeypatch):
    from stemseg_tpu.eval.main import main as eval_main

    h, w, t_total = 32, 40, 2
    m1 = [_rect(h, w, 2, 12, 2, 12) for _ in range(t_total)]

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    _write_gt_json(str(ann_dir / "youtube_vis_val.json"), "v1",
                   {5: m1}, {5: 7}, h, w, t_total)
    monkeypatch.setenv("YOUTUBE_VIS_BASE_DIR", str(tmp_path / "yv"))
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", str(ann_dir))

    entries = []
    segs = []
    for t in range(t_total):
        enc = rle_codec.encode(m1[t])
        enc["counts"] = enc["counts"].decode("utf-8")
        segs.append(enc)
    entries.append({"video_id": "v1", "score": 0.9, "category_id": 7,
                    "segmentations": segs})
    results = tmp_path / "results.json"
    results.write_text(json.dumps(entries))

    metrics = eval_main(["--dataset", "ytvis", "--results", str(results)])
    assert metrics["AP"] == pytest.approx(1.0)
    assert metrics["AP50"] == pytest.approx(1.0)


def test_eval_cli_kittimots_with_ignore(tmp_path, monkeypatch):
    from stemseg_tpu.eval.main import main as eval_main

    h, w, t_total = 32, 40, 2
    car = [_rect(h, w, 2, 12, 2, 12) for _ in range(t_total)]
    ignore = [_rect(h, w, 20, 30, 20, 30) for _ in range(t_total)]

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    # category 3 = ignore region (reference mots_data_loader.py:100-115)
    _write_gt_json(str(ann_dir / "kittimots_val.json"), "0002",
                   {1: car, 9: ignore}, {1: 1, 9: 3}, h, w, t_total,
                   image_ext="png")
    monkeypatch.setenv("KITTIMOTS_BASE_DIR", str(tmp_path / "km"))
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", str(ann_dir))

    res_dir = tmp_path / "results"
    res_dir.mkdir()
    lines = []
    for t in range(t_total):
        enc = rle_codec.encode(car[t])
        lines.append(f"{t} 1001 1 {h} {w} {enc['counts'].decode()}")
        # a junk hypothesis fully inside the ignore region: must NOT count FP
        enc2 = rle_codec.encode(ignore[t])
        lines.append(f"{t} 1002 1 {h} {w} {enc2['counts'].decode()}")
    (res_dir / "0002.txt").write_text("\n".join(lines) + "\n")

    metrics = eval_main(["--dataset", "kittimots",
                         "--results", str(res_dir)])
    assert metrics["TP"] == 2 and metrics["FP"] == 0 and metrics["IDS"] == 0
    assert metrics["sMOTSA"] == pytest.approx(1.0)
    # per-class split: all GT is cars, so the pedestrian bucket is empty
    assert metrics["sMOTSA_car"] == pytest.approx(1.0)
    assert metrics["sMOTSA_pedestrian"] == 0.0


def test_eval_cli_kittimots_class_separation(tmp_path, monkeypatch):
    """mots_tools is per-class: a car hypothesis exactly on top of a
    pedestrian GT must not TP-match it — it is a car FP and a pedestrian
    FN. The pre-round-3 pooled scorer wrongly scored this perfect."""
    from stemseg_tpu.eval.main import main as eval_main

    h, w, t_total = 32, 40, 2
    ped = [_rect(h, w, 2, 12, 2, 12) for _ in range(t_total)]

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    _write_gt_json(str(ann_dir / "kittimots_val.json"), "0002",
                   {1: ped}, {1: 2}, h, w, t_total, image_ext="png")
    monkeypatch.setenv("KITTIMOTS_BASE_DIR", str(tmp_path / "km"))
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", str(ann_dir))

    res_dir = tmp_path / "results"
    res_dir.mkdir()
    lines = []
    for t in range(t_total):
        enc = rle_codec.encode(ped[t])
        lines.append(f"{t} 1001 1 {h} {w} {enc['counts'].decode()}")  # car!
    (res_dir / "0002.txt").write_text("\n".join(lines) + "\n")

    metrics = eval_main(["--dataset", "kittimots",
                         "--results", str(res_dir)])
    assert metrics["TP"] == 0
    assert metrics["FP"] == 2            # car hypotheses, no car GT
    assert metrics["FN"] == 2            # pedestrian GT unmatched
    assert metrics["sMOTSA_pedestrian"] == pytest.approx(0.0)
    assert metrics["MOTSA_pedestrian"] == pytest.approx(0.0)
