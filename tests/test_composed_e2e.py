"""COMPOSED end-to-end golden parity against the reference inference stack.

The stage-wise parity suites (model forward, losses, clustering labels,
chainer partitions, writer outputs) prove each link; these tests prove the
*composition*: the reference's actual ``inference/main.py`` ``main()`` —
``InferenceModel`` (``modeling/inference_model.py:64-231``) →
``OnlineChainer`` + ``SequentialClustering`` (``online_chainer.py:143-236``)
→ the dataset writers (``output_utils/davis.py:38-159`` et al.) — runs as
ONE torch subprocess (``ref_e2e_runner.py``) on a synthetic mini-dataset
and a structured-random torch checkpoint, our CLI runs on the SAME inputs
and the SAME ``.pth`` (through the weight converter), and the FINAL
artifacts are diffed.

Dataset design per the composition-risk checklist: >= 2 sequences, two
geometry buckets that both require un-padding at write time (right-pad and
bottom-pad), a short sequence (< num_frames) exercising the padded-window
path, and frames with two crossing boxes (occlusion) so embeddings are
structured.

Comparison contract: the measured typical case is BYTE-IDENTICAL output
(0 mismatched pixels over 293k in the davis smoke run); the assertion
allows ``PIXEL_BUDGET`` stray pixels per sequence because torch's and XLA's
last-ULP float differences can legitimately flip a pixel sitting exactly on
a clustering/threshold decision boundary. Genuine divergence (a wrong stage
contract) flips thousands of pixels or changes the track structure, which
the structural asserts catch regardless of the budget.
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

from stemseg_tpu.utils import rle as rle_codec

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not available")

# stray-pixel allowance per sequence (knife-edge decisions only; typical = 0)
PIXEL_BUDGET = 20

_RUNNER = os.path.join(os.path.dirname(__file__), "ref_e2e_runner.py")

DAVIS_CFG = """\
INPUT:
  MIN_DIM: 96
  MAX_DIM: 160
  NUM_CLASSES: 2
  NUM_FRAMES: 4
MODEL:
  BACKBONE:
    TYPE: "R-50-FPN"
  EMBEDDING_DIM_MODE: "xyff"
  USE_SEEDINESS_HEAD: true
  USE_SEMSEG_HEAD: false
  EMBEDDINGS:
    EMBEDDING_SIZE: 4
TRAINING:
  LOSSES:
    EMBEDDING:
      FREE_DIM_STDS: [0.3, 0.3]
"""

YTVIS_CFG = """\
INPUT:
  MIN_DIM: 96
  MAX_DIM: 160
  NUM_CLASSES: 5
  NUM_FRAMES: 4
MODEL:
  BACKBONE:
    TYPE: "R-50-FPN"
  EMBEDDING_DIM_MODE: "xyff"
  USE_SEEDINESS_HEAD: false
  USE_SEMSEG_HEAD: true
  EMBEDDINGS:
    EMBEDDING_SIZE: 4
  SEMSEG:
    INTER_CHANNELS: [256, 256, 256, 256]
TRAINING:
  LOSSES:
    EMBEDDING:
      FREE_DIM_STDS: [0.3, 0.3]
"""

KITTI_CFG = """\
INPUT:
  MIN_DIM: 96
  MAX_DIM: 160
  NUM_CLASSES: 3
  NUM_FRAMES: 4
MODEL:
  BACKBONE:
    TYPE: "R-50-FPN"
  EMBEDDING_DIM_MODE: "xyt"
  USE_SEEDINESS_HEAD: false
  USE_SEMSEG_HEAD: true
"""


def _make_frames(rng, n, h, w):
    """Structured frames: gradient background + two moving boxes that cross
    mid-sequence (occlusion) + mild noise."""
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        img = (40 + 120 * xx / w + 40 * yy / h).astype(np.float32)
        img = np.stack([img, img * 0.8 + 20, img * 0.6 + 40], -1)
        x1 = int(w * 0.1) + t * max(1, w // (2 * n))
        x2 = int(w * 0.7) - t * max(1, w // (2 * n))
        y1, y2 = h // 4, h // 2
        img[y1:y1 + h // 3, x1:x1 + w // 5] = [220, 60, 60]
        img[y2:y2 + h // 3, x2:x2 + w // 5] = [60, 200, 220]
        img += rng.randn(h, w, 3) * 6
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return frames


def _write_dataset(base_dir, ann_file, seqs, n_categories=1, ext="jpg"):
    """seqs: [(seq_id, n_frames, h, w)]. Two geometry buckets among the
    callers: (120, 180) -> resized (96, 144), padded (96, 160) = right
    un-pad; (144, 90) -> resized (154, 96), padded (160, 96) = bottom
    un-pad (``structures/geometry.py`` formulas)."""
    entries = []
    rng = np.random.RandomState(7)
    for sid, n, h, w in seqs:
        os.makedirs(os.path.join(base_dir, str(sid)), exist_ok=True)
        image_paths, segmentations = [], []
        for t, img in enumerate(_make_frames(rng, n, h, w)):
            rel = f"{sid}/{t:05d}.{ext}" if ext == "jpg" else f"{sid}/{t:06d}.{ext}"
            cv2.imwrite(os.path.join(base_dir, rel), img)
            image_paths.append(rel)
            m = np.zeros((h, w), np.uint8)
            m[h // 4:h // 2, 4:12] = 1
            segmentations.append({"1": rle_codec.encode(m)["counts"].decode()})
        entries.append({"id": sid, "height": h, "width": w,
                        "image_paths": image_paths, "categories": {"1": 1},
                        "segmentations": segmentations})
    ds = {"meta": {"category_labels": {str(i): f"cat{i}"
                                       for i in range(1, n_categories + 1)}},
          "sequences": entries}
    os.makedirs(os.path.dirname(ann_file), exist_ok=True)
    with open(ann_file, "w") as fh:
        json.dump(ds, fh)


def _make_shared_checkpoint(tmp_path, cfg_text, env):
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.yaml"), "w") as fh:
        fh.write(cfg_text)
    res = subprocess.run(
        [sys.executable, _RUNNER, "make_ckpt", model_dir, "0"],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, f"make_ckpt failed:\n{res.stderr[-3000:]}"
    return os.path.join(model_dir, "model.pth")


def _run_reference(tmp_path, model_pth, dataset, env):
    ref_out = str(tmp_path / "ref_out")
    res = subprocess.run(
        [sys.executable, _RUNNER, "infer", model_pth, dataset, ref_out,
         "5", "2", "0.1"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert res.returncode == 0, f"reference inference failed:\n{res.stderr[-4000:]}"
    return ref_out


def _run_ours(tmp_path, model_pth, dataset):
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.utils.timer import Timer

    Timer.reset()
    our_out = str(tmp_path / "our_out")
    inference_main.main([model_pth, "-o", our_out, "--dataset", dataset,
                         "--max_tracks", "5", "--frame_overlap", "2",
                         "-msp", "0.1"])
    return our_out


def _diff_pixels(a, b, name):
    # No hard value-set assert: a single budgeted knife-edge pixel can
    # legitimately remove a tiny track's only pixel from one frame (or add
    # a stray id), changing the frame's value set. Every such pixel is
    # already counted here and charged against PIXEL_BUDGET.
    bad = int((a != b).sum())
    if bad and sorted(np.unique(a).tolist()) != sorted(np.unique(b).tolist()):
        print(f"{name}: value sets differ: {np.unique(a)} vs {np.unique(b)} "
              f"({bad} px)")
    return bad


def test_composed_e2e_davis(tmp_path, monkeypatch):
    """Reference main() vs our CLI on identical weights + frames: DAVIS
    indexed-palette PNGs. Measured typical case: byte-identical."""
    from PIL import Image

    base_dir = str(tmp_path / "davis_data")
    ann_dir = str(tmp_path / "ann")
    seqs = [("seqA", 7, 120, 180), ("seqB", 6, 144, 90), ("seqC", 3, 120, 180)]
    _write_dataset(base_dir, os.path.join(ann_dir, "davis_val.json"), seqs)

    env = dict(os.environ, DAVIS_BASE_DIR=base_dir,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, DAVIS_CFG, env)
    ref_out = _run_reference(tmp_path, model_pth, "davis", env)

    monkeypatch.setenv("DAVIS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)
    our_out = _run_ours(tmp_path, model_pth, "davis")

    for sid, n_frames, _, _ in seqs:
        ref_dir = os.path.join(ref_out, "results", sid)
        our_dir = os.path.join(our_out, "results", sid)
        ref_files = sorted(os.listdir(ref_dir))
        assert ref_files == sorted(os.listdir(our_dir))
        assert len(ref_files) == n_frames
        seq_bad = 0
        for fn in ref_files:
            ra = Image.open(os.path.join(ref_dir, fn))
            oa = Image.open(os.path.join(our_dir, fn))
            assert ra.mode == oa.mode == "P"
            assert ra.getpalette() == oa.getpalette()
            seq_bad += _diff_pixels(np.array(ra), np.array(oa),
                                    f"{sid}/{fn}")
        assert seq_bad <= PIXEL_BUDGET, \
            f"{sid}: {seq_bad} mismatched pixels across the sequence"


def test_composed_e2e_ytvis(tmp_path, monkeypatch):
    """YT-VIS family: semseg head with foreground channel, logits-mode
    category averaging, results.json tracks (category, score, RLE masks)."""
    base = str(tmp_path / "ytvis_data")
    base_dir = os.path.join(base, "valid")
    ann_dir = str(tmp_path / "ann")
    seqs = [(11, 6, 120, 180), (12, 5, 144, 90), (13, 3, 120, 180)]
    _write_dataset(base_dir, os.path.join(ann_dir, "youtube_vis_val.json"),
                   seqs, n_categories=4)

    env = dict(os.environ, YOUTUBE_VIS_BASE_DIR=base,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, YTVIS_CFG, env)
    ref_out = _run_reference(tmp_path, model_pth, "ytvis", env)

    monkeypatch.setenv("YOUTUBE_VIS_BASE_DIR", base)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)
    our_out = _run_ours(tmp_path, model_pth, "ytvis")

    with open(os.path.join(ref_out, "results.json")) as fh:
        ref_tracks = json.load(fh)
    with open(os.path.join(our_out, "results.json")) as fh:
        our_tracks = json.load(fh)

    assert len(ref_tracks) == len(our_tracks) and ref_tracks
    for k, (rt, ot) in enumerate(zip(ref_tracks, our_tracks)):
        assert rt["video_id"] == ot["video_id"]
        assert rt["category_id"] == ot["category_id"]
        # score = mean semseg prob over the track's pixels; forward float
        # differences bound the deviation
        assert abs(rt["score"] - ot["score"]) < 1e-4, f"track {k} score"
        assert len(rt["segmentations"]) == len(ot["segmentations"])
        bad = 0
        for t, (rs, os_) in enumerate(zip(rt["segmentations"],
                                          ot["segmentations"])):
            assert rs["size"] == os_["size"]
            if rs["counts"] == os_["counts"]:
                continue
            rm = rle_codec.decode({"size": rs["size"],
                                   "counts": rs["counts"].encode()})
            om = rle_codec.decode({"size": os_["size"],
                                   "counts": os_["counts"].encode()})
            bad += _diff_pixels(rm, om, f"track {k} frame {t}")
        assert bad <= PIXEL_BUDGET, f"track {k}: {bad} mismatched pixels"


def test_composed_e2e_kittimots(tmp_path, monkeypatch):
    """KITTI-MOTS family: argmax semseg classes, xyt embeddings, MOTS txt
    lines (all non-mask fields byte-exact, masks within budget)."""
    base_dir = str(tmp_path / "kitti_data")
    ann_dir = str(tmp_path / "ann")
    seqs = [("0002", 6, 120, 180), ("0006", 3, 144, 90)]
    _write_dataset(base_dir, os.path.join(ann_dir, "kittimots_val.json"),
                   seqs, n_categories=2, ext="png")

    env = dict(os.environ, KITTIMOTS_BASE_DIR=base_dir,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, KITTI_CFG, env)
    ref_out = _run_reference(tmp_path, model_pth, "kittimots", env)

    monkeypatch.setenv("KITTIMOTS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)
    our_out = _run_ours(tmp_path, model_pth, "kittimots")

    for sid, _, _, _ in seqs:
        ref_txt = os.path.join(ref_out, "results", f"{sid}.txt")
        our_txt = os.path.join(our_out, "results", f"{sid}.txt")
        with open(ref_txt) as fh:
            ref_lines = [l.split(" ", 5) for l in fh.read().splitlines()]
        with open(our_txt) as fh:
            our_lines = [l.split(" ", 5) for l in fh.read().splitlines()]
        assert len(ref_lines) == len(our_lines)
        bad = 0
        for rl, ol in zip(ref_lines, our_lines):
            assert rl[:5] == ol[:5], f"{sid}: line fields {rl[:5]} vs {ol[:5]}"
            if rl[5] == ol[5]:
                continue
            hh, ww = int(rl[3]), int(rl[4])
            rm = rle_codec.decode({"size": [hh, ww], "counts": rl[5].encode()})
            om = rle_codec.decode({"size": [hh, ww], "counts": ol[5].encode()})
            bad += int((rm != om).sum())
        assert bad <= PIXEL_BUDGET, f"{sid}: {bad} mismatched mask pixels"
