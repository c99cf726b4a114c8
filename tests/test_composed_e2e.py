"""COMPOSED end-to-end golden parity against the reference inference stack.

The stage-wise parity suites (model forward, losses, clustering labels,
chainer partitions, writer outputs) prove each link; these tests prove the
*composition*: the reference's actual ``inference/main.py`` ``main()`` —
``InferenceModel`` (``modeling/inference_model.py:64-231``) →
``OnlineChainer`` + ``SequentialClustering`` (``online_chainer.py:143-236``)
→ the dataset writers (``output_utils/davis.py:38-159`` et al.) — runs as
ONE torch subprocess (``ref_e2e_runner.py``) on a synthetic mini-dataset
and a structured-random torch checkpoint, our CLI runs on the SAME inputs
and the SAME ``.pth`` (through the weight converter), and the results are
diffed at TWO stages:

1. **Pre-writer state, EXACT**: the reference runner dumps the stitched
   dense label volume + per-track counts/lifetimes per sequence
   (``ref_e2e_runner._install_label_dump``); our writer inputs are captured
   in-process. The volumes must be EXACTLY equal modulo a track-id
   bijection (ids are arbitrary handles — our chainer numbers tracks in
   disjoint per-window blocks, ``chainer.py`` module docstring), and
   counts/lifetimes must map through the same bijection. Any clustering /
   stitching divergence fails HERE, attributably.
2. **Final artifacts, knife-edge-proven**: with identical pre-writer state,
   a final-artifact mismatch can only come from the writer's
   upsample+unpad+resize chain. Every disagreeing pixel must be PROVEN
   knife-edge via the pre-threshold float map recomputed from the (shared)
   label volume (``knife_edge.assert_equal_mod_knife_edge`` — same contract
   as ``test_writer_golden_diff``), within an ABSOLUTE per-map budget.
   Sequences whose final resize is the identity (network dims == original
   dims) only go through the exact-arithmetic x4 upsample and un-pad crop,
   so there the budget is 0 — byte-identical output.

Dataset design per the composition-risk checklist: >= 2 sequences, two
geometry buckets that both require un-padding at write time (right-pad and
bottom-pad), one identity-resize geometry (byte-exact contract), a short
sequence (< num_frames) exercising the padded-window streaming path, and
frames with two crossing boxes (occlusion) so embeddings are structured.
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

from knife_edge import (
    PIXEL_BUDGET_ABS,
    assert_equal_mod_knife_edge,
    instance_float_maps,
)
from stemseg_tpu.utils import rle as rle_codec

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not available")]

_RUNNER = os.path.join(os.path.dirname(__file__), "ref_e2e_runner.py")

MIN_DIM, MAX_DIM = 96, 160
MAX_TRACKS = 5

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
    """seqs: [(seq_id, n_frames, h, w)]. Geometry buckets among the callers:
    (120, 180) -> resized (96, 144), padded (96, 160) = right un-pad + final
    resize; (144, 90) -> resized (154, 96), padded (160, 96) = bottom un-pad
    + resize; (96, 144) -> resize identity, padded (96, 160) = right un-pad,
    IDENTITY final resize => byte-exact contract
    (``structures/geometry.py`` formulas)."""
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
    """Runs the reference main() and returns (out_dir, pre-writer dump dir)."""
    ref_out = str(tmp_path / "ref_out")
    dump_dir = str(tmp_path / "ref_dump")
    res = subprocess.run(
        [sys.executable, _RUNNER, "infer", model_pth, dataset, ref_out,
         str(MAX_TRACKS), "2", "0.1", dump_dir],
        capture_output=True, text=True, timeout=1800, env=env)
    assert res.returncode == 0, f"reference inference failed:\n{res.stderr[-4000:]}"
    return ref_out, dump_dir


def _run_ours(tmp_path, model_pth, dataset, monkeypatch):
    """Runs our CLI; returns (out_dir, captured pre-writer state per seq id:
    {sid: (labels [T,h,w] int, counts dict, lifetimes dict)})."""
    from stemseg_tpu.inference import main as inference_main
    from stemseg_tpu.inference.output_utils import (
        DavisOutputGenerator,
        KittiMOTSOutputGenerator,
        YoutubeVISOutputGenerator,
    )
    from stemseg_tpu.utils.timer import Timer

    captured = {}
    for cls in (DavisOutputGenerator, YoutubeVISOutputGenerator,
                KittiMOTSOutputGenerator):
        orig = cls.process_sequence

        def wrapper(self, sequence, labels, counts, lifetimes, *a,
                    _orig=orig, **kw):
            captured[str(sequence.id)] = (np.asarray(labels).copy(),
                                          dict(counts), dict(lifetimes))
            return _orig(self, sequence, labels, counts, lifetimes, *a, **kw)

        monkeypatch.setattr(cls, "process_sequence", wrapper)

    Timer.reset()
    our_out = str(tmp_path / "our_out")
    inference_main.main([model_pth, "-o", our_out, "--dataset", dataset,
                         "--max_tracks", str(MAX_TRACKS),
                         "--frame_overlap", "2", "-msp", "0.1"])
    return our_out, captured


def _load_ref_dump(dump_dir, sid):
    d = np.load(os.path.join(dump_dir, f"{sid}.npz"))
    counts = {int(k): int(v) for k, v in d["counts"]}
    lifetimes = {int(k): int(v) for k, v in d["lifetimes"]}
    return d["labels"], counts, lifetimes


def _assert_prewriter_exact(dump_dir, captured, sid):
    """Stage-1 contract: label volumes EXACTLY equal modulo a track-id
    bijection; counts/lifetimes map through it. Returns ref id -> our id."""
    ref_labels, ref_counts, ref_life = _load_ref_dump(dump_dir, sid)
    our_labels, our_counts, our_life = captured[str(sid)]
    assert ref_labels.shape == our_labels.shape, \
        f"{sid}: pre-writer volume shapes {ref_labels.shape} vs {our_labels.shape}"
    assert np.array_equal(ref_labels == -1, our_labels == -1), \
        f"{sid}: outlier/background footprints differ"
    mapping = {}
    for rid in np.unique(ref_labels):
        rid = int(rid)
        if rid == -1:
            continue
        m = ref_labels == rid
        t, y, x = np.argwhere(m)[0]
        oid = int(our_labels[t, y, x])
        assert oid != -1 and np.array_equal(m, our_labels == oid), \
            f"{sid}: ref track {rid} has no exact counterpart (probe -> {oid})"
        mapping[rid] = oid
    assert len(set(mapping.values())) == len(mapping), \
        f"{sid}: id mapping is not a bijection"
    # stats through the bijection; the -1 entry is NOT comparable (the
    # reference counts fg-pixel outliers only, ours counts the whole dense
    # background — neither is consumed by the writers for real tracks)
    for rid, oid in mapping.items():
        assert ref_counts[rid] == our_counts[oid], \
            f"{sid}: counts differ for ref id {rid}"
        assert ref_life[rid] == our_life[oid], \
            f"{sid}: lifetimes differ for ref id {rid}"
    return mapping


def _identity_resize(image_dims):
    from stemseg_tpu.structures.geometry import compute_resize_params

    h, w = image_dims
    new_w, new_h, _ = compute_resize_params((w, h), MIN_DIM, MAX_DIM)
    return (new_h, new_w) == (h, w)


def _kept_mapped(dump_dir, captured, sid, by="lifetime"):
    """Kept-track lists on both sides + the assertion that they correspond
    index-for-index through the bijection (the PNG value / track order IS
    the kept index, so a ranking divergence must fail loudly here, not be
    miscounted as knife-edge pixels)."""
    from stemseg_tpu.inference.output_utils.common import select_instances_to_keep

    mapping = _assert_prewriter_exact(dump_dir, captured, sid)
    _, ref_counts, ref_life = _load_ref_dump(dump_dir, sid)
    our_labels, our_counts, our_life = captured[str(sid)]
    if by == "count":
        kept_ref = select_instances_to_keep(ref_life, -1, MAX_TRACKS,
                                            by="count", counts=ref_counts)
        kept_ours = select_instances_to_keep(our_life, -1, MAX_TRACKS,
                                             by="count", counts=our_counts)
    else:
        kept_ref = select_instances_to_keep(ref_life, -1, MAX_TRACKS)
        kept_ours = select_instances_to_keep(our_life, -1, MAX_TRACKS)
    assert [mapping[r] for r in kept_ref] == list(kept_ours), \
        f"{sid}: kept-track ranking diverges (tie broken differently?)"
    return our_labels, our_life, list(kept_ours)


def test_composed_e2e_davis(tmp_path, monkeypatch):
    """Reference main() vs our CLI on identical weights + frames: DAVIS
    indexed-palette PNGs. Pre-writer labels exact; PNG pixels knife-edge-
    proven (byte-exact for the identity-resize sequence)."""
    from PIL import Image

    base_dir = str(tmp_path / "davis_data")
    ann_dir = str(tmp_path / "ann")
    seqs = [("seqA", 7, 120, 180), ("seqB", 6, 144, 90),
            ("seqC", 3, 120, 180), ("seqD", 5, 96, 144)]
    _write_dataset(base_dir, os.path.join(ann_dir, "davis_val.json"), seqs)

    env = dict(os.environ, DAVIS_BASE_DIR=base_dir,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, DAVIS_CFG, env)
    ref_out, dump_dir = _run_reference(tmp_path, model_pth, "davis", env)

    monkeypatch.setenv("DAVIS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)
    our_out, captured = _run_ours(tmp_path, model_pth, "davis", monkeypatch)

    any_knife = 0
    for sid, n_frames, h, w in seqs:
        labels, _, kept = _kept_mapped(dump_dir, captured, sid)
        image_dims = (h, w)
        budget = 0 if _identity_resize(image_dims) else PIXEL_BUDGET_ABS

        ref_dir = os.path.join(ref_out, "results", sid)
        our_dir = os.path.join(our_out, "results", sid)
        ref_files = sorted(os.listdir(ref_dir))
        assert ref_files == sorted(os.listdir(our_dir))
        assert len(ref_files) == n_frames
        for t, fn in enumerate(ref_files):
            ra = Image.open(os.path.join(ref_dir, fn))
            oa = Image.open(os.path.join(our_dir, fn))
            assert ra.mode == oa.mode == "P"
            assert ra.getpalette() == oa.getpalette()
            ref_map, our_map = np.array(ra), np.array(oa)
            if not kept:
                assert np.array_equal(ref_map, our_map)
                continue
            floats = instance_float_maps(labels[t], kept, image_dims,
                                         MIN_DIM, MAX_DIM)
            # PNG value v = kept-instance index v-1; 0 = background
            any_knife += assert_equal_mod_knife_edge(
                ref_map, our_map, floats,
                lambda r, o: [v - 1 for v in (int(r), int(o)) if v > 0],
                f"{sid}/{fn}", budget=budget)
    # measured typical case is fully byte-identical; print when it isn't
    if any_knife:
        print(f"davis composed e2e: {any_knife} knife-edge pixels (proven)")


def test_composed_e2e_ytvis(tmp_path, monkeypatch):
    """YT-VIS family: semseg head with foreground channel, logits-mode
    category averaging, results.json tracks (category, score, RLE masks).
    Pre-writer labels exact; mask mismatches knife-edge-proven."""
    base = str(tmp_path / "ytvis_data")
    base_dir = os.path.join(base, "valid")
    ann_dir = str(tmp_path / "ann")
    seqs = [(11, 6, 120, 180), (12, 5, 144, 90), (13, 3, 120, 180),
            (14, 5, 96, 144)]
    _write_dataset(base_dir, os.path.join(ann_dir, "youtube_vis_val.json"),
                   seqs, n_categories=4)

    env = dict(os.environ, YOUTUBE_VIS_BASE_DIR=base,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, YTVIS_CFG, env)
    ref_out, dump_dir = _run_reference(tmp_path, model_pth, "ytvis", env)

    monkeypatch.setenv("YOUTUBE_VIS_BASE_DIR", base)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)
    our_out, captured = _run_ours(tmp_path, model_pth, "ytvis", monkeypatch)

    with open(os.path.join(ref_out, "results.json")) as fh:
        ref_tracks = json.load(fh)
    with open(os.path.join(our_out, "results.json")) as fh:
        our_tracks = json.load(fh)

    dims_by_vid = {sid: (h, w) for sid, _, h, w in seqs}
    state_by_vid = {sid: _kept_mapped(dump_dir, captured, sid)
                    for sid, *_ in seqs}

    assert len(ref_tracks) == len(our_tracks) and ref_tracks
    track_rank = {}  # kept index of the k-th emitted track per video
    for k, (rt, ot) in enumerate(zip(ref_tracks, our_tracks)):
        vid = rt["video_id"]
        assert vid == ot["video_id"]
        assert rt["category_id"] == ot["category_id"]
        # score = mean semseg prob over the track's pixels; forward float
        # differences bound the deviation
        assert abs(rt["score"] - ot["score"]) < 1e-4, f"track {k} score"
        assert len(rt["segmentations"]) == len(ot["segmentations"])

        labels, _, kept = state_by_vid[vid]
        image_dims = dims_by_vid[vid]
        budget = 0 if _identity_resize(image_dims) else PIXEL_BUDGET_ABS
        ki = track_rank[vid] = track_rank.get(vid, -1) + 1
        assert ki < len(kept)
        for t, (rs, os_) in enumerate(zip(rt["segmentations"],
                                          ot["segmentations"])):
            assert rs["size"] == os_["size"]
            if rs["counts"] == os_["counts"]:
                continue
            rm = rle_codec.decode({"size": rs["size"],
                                   "counts": rs["counts"].encode()})
            om = rle_codec.decode({"size": os_["size"],
                                   "counts": os_["counts"].encode()})
            floats = instance_float_maps(labels[t], kept, image_dims,
                                         MIN_DIM, MAX_DIM)
            assert_equal_mod_knife_edge(rm, om, floats, lambda r, o: [ki],
                                        f"track {k} frame {t}", budget=budget)


def test_composed_e2e_kittimots(tmp_path, monkeypatch):
    """KITTI-MOTS family: argmax semseg classes, xyt embeddings, MOTS txt
    lines. Pre-writer labels exact; all non-mask fields byte-exact; mask
    mismatches knife-edge-proven."""
    base_dir = str(tmp_path / "kitti_data")
    ann_dir = str(tmp_path / "ann")
    seqs = [("0002", 6, 120, 180), ("0006", 3, 144, 90),
            ("0010", 5, 96, 144)]
    _write_dataset(base_dir, os.path.join(ann_dir, "kittimots_val.json"),
                   seqs, n_categories=2, ext="png")

    env = dict(os.environ, KITTIMOTS_BASE_DIR=base_dir,
               STEMSEG_JSON_ANNOTATIONS_DIR=ann_dir)
    model_pth = _make_shared_checkpoint(tmp_path, KITTI_CFG, env)
    ref_out, dump_dir = _run_reference(tmp_path, model_pth, "kittimots", env)

    monkeypatch.setenv("KITTIMOTS_BASE_DIR", base_dir)
    monkeypatch.setenv("STEMSEG_JSON_ANNOTATIONS_DIR", ann_dir)
    our_out, captured = _run_ours(tmp_path, model_pth, "kittimots",
                                  monkeypatch)

    for sid, _, h, w in seqs:
        # KITTI ranks by pixel count, then renumbers by ascending lifetime
        labels, our_life, kept = _kept_mapped(dump_dir, captured, sid,
                                              by="count")
        kept = sorted(kept, key=lambda x: our_life[x])
        image_dims = (h, w)
        budget = 0 if _identity_resize(image_dims) else PIXEL_BUDGET_ABS

        ref_txt = os.path.join(ref_out, "results", f"{sid}.txt")
        our_txt = os.path.join(our_out, "results", f"{sid}.txt")
        with open(ref_txt) as fh:
            ref_lines = [l.split(" ", 5) for l in fh.read().splitlines()]
        with open(our_txt) as fh:
            our_lines = [l.split(" ", 5) for l in fh.read().splitlines()]
        assert len(ref_lines) == len(our_lines)
        for rl, ol in zip(ref_lines, our_lines):
            assert rl[:5] == ol[:5], f"{sid}: line fields {rl[:5]} vs {ol[:5]}"
            if rl[5] == ol[5]:
                continue
            t = int(rl[0])
            hh, ww = int(rl[3]), int(rl[4])
            rm = rle_codec.decode({"size": [hh, ww], "counts": rl[5].encode()})
            om = rle_codec.decode({"size": [hh, ww], "counts": ol[5].encode()})
            floats = instance_float_maps(labels[t], kept, image_dims,
                                         MIN_DIM, MAX_DIM)
            # the per-pixel max over instance ids means any kept instance's
            # knife-edge flip can move a pixel between tracks
            assert_equal_mod_knife_edge(rm, om, floats,
                                        lambda r, o: range(len(kept)),
                                        f"{sid} line frame {t} id {rl[1]}",
                                        budget=budget)
