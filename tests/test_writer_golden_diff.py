"""Golden diff of the final output artifacts against the REFERENCE writers.

The upstream stages already have exact parity suites (model forward, losses,
clustering labels, chainer partitions); this closes the last link: identical
pipeline outputs (dense label volumes + category maps + counts/lifetimes)
are fed to the reference DAVIS / YT-VIS / KITTI-MOTS output generators (run
in a torch subprocess, ``ref_writer_runner.py``) and to ours, and the FINAL
FILES — indexed-palette PNGs, ``results.json``, MOTS txt — are compared.
Two geometry buckets are exercised, both requiring un-padding (right-pad and
bottom-pad), since the pad-crop-resize chain is where the output geometry
can silently diverge (reference ``davis.py:87-107``).

Comparison contract: byte-for-byte EXCEPT pixels whose bilinear value sits
exactly on the 0.5 threshold ("knife-edge"). There, torch's and XLA's
last-ULP rounding legitimately differ (measured: torch 0.5000001 vs jax
0.5000000 on an exact-0.5 pixel), so byte parity is unattainable without
replicating torch's rounding-error pattern bit-for-bit. Every disagreeing
pixel must therefore be PROVEN knife-edge via the pre-threshold float map
(``mask_resize_floats``), and the budget is an ABSOLUTE pixel count per
map, not a fraction. Geometries whose final resize is the identity (the
padded-network-dims buckets, including the production 480x854 -> 480x864
DAVIS geometry) only go through the exact-arithmetic x4 upsample (1/8-
multiple weights, exact in fp32), so there the contract is 0 mismatches —
byte-identical output.

pycocotools is absent from this image; the subprocess stubs its ``mask``
module with our RLE codec (independently tested against hand-derived
COCO-format vectors), so the diff checks geometry/order/format on shared
codec ground.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from knife_edge import (
    PIXEL_BUDGET_ABS,
    assert_equal_mod_knife_edge as _assert_equal_mod_knife_edge_impl,
    instance_float_maps,
)

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not available")

MIN_DIM, MAX_DIM = 32, 64


class _Seq:
    def __init__(self, seq_id, image_dims):
        self.id = seq_id
        self.image_dims = tuple(image_dims)


def _synthetic_labels(t=6, h=8, w=16, seed=0):
    """Dense label volume: moving rectangles with distinct lifetimes/counts
    (stable keep-ranking, no tie sensitivity), plus outlier fg pixels."""
    rng = np.random.RandomState(seed)
    labels = np.full((t, h, w), -1, np.int64)
    # (id, first_frame, last_frame, y, x, side) — ids look like chainer blocks
    tracks = [(3, 0, 5, 1, 1, 3), (21, 0, 3, 4, 6, 3), (22, 2, 5, 1, 9, 2),
              (41, 4, 5, 5, 12, 2), (43, 3, 3, 0, 13, 2)]
    for iid, t0, t1, y, x, side in tracks:
        for ti in range(t0, t1 + 1):
            xx = min(x + (ti - t0), w - side)
            labels[ti, y:y + side, xx:xx + side] = iid
    # sprinkle unassigned-outlier pixels
    for ti in range(t):
        ys, xs = rng.randint(0, h, 3), rng.randint(0, w, 3)
        for yy, xx in zip(ys, xs):
            if labels[ti, yy, xx] == -1 and rng.rand() < 0.7:
                pass  # already outlier — the writers ignore -1 either way
    return labels


def _run_reference_writer(tmp_path, name, labels, meta, category=None):
    in_npz = str(tmp_path / f"{name}_in.npz")
    out_dir = str(tmp_path / f"{name}_ref")
    arrays = {"labels": labels, "meta": json.dumps(meta)}
    if category is not None:
        arrays["category"] = category
    np.savez(in_npz, **arrays)
    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "ref_writer_runner.py"), in_npz, out_dir],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, f"reference writer failed:\n{res.stderr[-3000:]}"
    return out_dir


def _meta(dataset, seq_id, image_dims, labels, counts, lifetimes,
          min_dim=MIN_DIM, max_dim=MAX_DIM, **extra):
    base = {
        "dataset": dataset, "seq_id": seq_id, "image_dims": list(image_dims),
        "min_dim": min_dim, "max_dim": max_dim, "mask_scale": 4,
        "max_tracks": 4, "upscaled_inputs": False,
        "counts": [[int(k), int(v)] for k, v in counts.items()],
        "lifetimes": [[int(k), int(v)] for k, v in lifetimes.items()],
    }
    base.update(extra)
    return base


# (image_dims, mask_hw, min_dim, max_dim, budget):
# (40, 60) -> resized (32, 48), padded (32, 64) => right un-pad + final
# bilinear resize (knife-edge pixels possible); (48, 30) -> resized
# (51, 32), padded (64, 32) => bottom un-pad + resize; (32, 64) -> resized
# == original == padded => no un-pad, identity resize, byte-exact contract;
# (480, 854) with the production 480/864 policy -> padded (480, 864) =>
# the REAL DAVIS right un-pad geometry, identity final resize, byte-exact.
GEOMETRIES = [
    pytest.param((40, 60), (8, 16), 32, 64, PIXEL_BUDGET_ABS,
                 id="right_unpad"),
    pytest.param((48, 30), (16, 8), 32, 64, PIXEL_BUDGET_ABS,
                 id="bottom_unpad"),
    pytest.param((32, 64), (8, 16), 32, 64, 0, id="identity_exact"),
]
PRODUCTION_GEOMETRY = [
    pytest.param((480, 854), (120, 216), 480, 864, 0,
                 id="production_480p_unpad_exact"),
]


def _instance_float_maps(labels_t, kept, image_dims, min_dim=MIN_DIM,
                         max_dim=MAX_DIM):
    return instance_float_maps(labels_t, kept, image_dims, min_dim, max_dim)


_assert_equal_mod_knife_edge = _assert_equal_mod_knife_edge_impl


@pytest.mark.parametrize("image_dims,mask_hw,min_dim,max_dim,budget",
                         GEOMETRIES + PRODUCTION_GEOMETRY)
def test_davis_writer_golden_diff(tmp_path, image_dims, mask_hw, min_dim,
                                  max_dim, budget):
    from stemseg_tpu.inference.chainer import track_stats
    from stemseg_tpu.inference.output_utils import DavisOutputGenerator

    h, w = mask_hw
    labels = _synthetic_labels(h=h, w=w)
    counts, lifetimes = track_stats(labels)
    seq_id = "golden_seq"
    meta = _meta("davis", seq_id, image_dims, labels, counts, lifetimes,
                 min_dim=min_dim, max_dim=max_dim)

    ref_dir = _run_reference_writer(tmp_path, f"davis_{image_dims[0]}",
                                    labels, meta)

    our_dir = str(tmp_path / "ours")
    gen = DavisOutputGenerator(our_dir)
    gen.process_sequence(_Seq(seq_id, image_dims), labels.astype(np.int32),
                         counts, lifetimes, None, mask_scale=4, max_tracks=4,
                         min_dim=min_dim, max_dim=max_dim)

    from PIL import Image
    from stemseg_tpu.inference.output_utils.common import select_instances_to_keep

    kept = select_instances_to_keep(lifetimes, -1, 4)
    ref_pngs = sorted(os.listdir(os.path.join(ref_dir, "results", seq_id)))
    our_pngs = sorted(os.listdir(os.path.join(our_dir, "results", seq_id)))
    assert ref_pngs == our_pngs and len(ref_pngs) == labels.shape[0]
    for t, fname in enumerate(ref_pngs):
        ref_img = Image.open(os.path.join(ref_dir, "results", seq_id, fname))
        our_img = Image.open(os.path.join(our_dir, "results", seq_id, fname))
        assert ref_img.mode == our_img.mode == "P"
        assert ref_img.getpalette() == our_img.getpalette()
        ref_map, our_map = np.array(ref_img), np.array(our_img)
        floats = _instance_float_maps(labels[t], kept, image_dims,
                                      min_dim, max_dim)
        # a disagreeing pixel involves the index map values on both sides
        # (PNG value v = kept-instance index v-1; 0 = background)
        _assert_equal_mod_knife_edge(
            ref_map, our_map, floats,
            lambda r, o: [v - 1 for v in (int(r), int(o)) if v > 0],
            f"davis {fname}", budget=budget)


@pytest.mark.parametrize("image_dims,mask_hw,min_dim,max_dim,budget",
                         GEOMETRIES)
def test_ytvis_writer_golden_diff(tmp_path, image_dims, mask_hw, min_dim,
                                  max_dim, budget):
    from stemseg_tpu.inference.chainer import track_stats
    from stemseg_tpu.inference.output_utils import YoutubeVISOutputGenerator

    h, w = mask_hw
    labels = _synthetic_labels(h=h, w=w)
    counts, lifetimes = track_stats(labels)
    rng = np.random.RandomState(1)
    n_classes = 5  # incl. background channel 0
    category = (rng.randn(labels.shape[0], h, w, n_classes) * 3).astype(np.float32)
    names = {i: f"cls{i}" for i in range(1, n_classes)}
    meta = _meta("ytvis", 7, image_dims, labels, counts, lifetimes,
                 min_dim=min_dim, max_dim=max_dim, category_names=names)

    ref_dir = _run_reference_writer(tmp_path, f"ytvis_{image_dims[0]}",
                                    labels, meta, category=category)

    our_dir = str(tmp_path / "ours")
    gen = YoutubeVISOutputGenerator(our_dir, category_names=names)
    gen.process_sequence(_Seq(7, image_dims), labels.astype(np.int32),
                         counts, lifetimes, category, mask_scale=4,
                         max_tracks=4, min_dim=min_dim, max_dim=max_dim)
    gen.save()

    from stemseg_tpu.inference.output_utils.common import select_instances_to_keep
    from stemseg_tpu.utils import rle as rle_codec

    with open(os.path.join(ref_dir, "results.json")) as f:
        ref_inst = json.load(f)
    with open(os.path.join(our_dir, "results.json")) as f:
        our_inst = json.load(f)

    kept = select_instances_to_keep(lifetimes, -1, 4)
    assert len(ref_inst) == len(our_inst) == len(kept)
    for k, (ri, oi) in enumerate(zip(ref_inst, our_inst)):
        # everything except mask geometry must be EXACT (same track order,
        # same confidence floats, same classification)
        assert ri["video_id"] == oi["video_id"] == 7
        assert ri["score"] == oi["score"]
        assert ri["category_id"] == oi["category_id"]
        assert len(ri["segmentations"]) == len(oi["segmentations"])
        for t, (rs, os_) in enumerate(zip(ri["segmentations"],
                                          oi["segmentations"])):
            assert rs["size"] == os_["size"]
            if rs["counts"] == os_["counts"]:
                continue
            ref_m = rle_codec.decode(
                {"size": rs["size"], "counts": rs["counts"].encode()})
            our_m = rle_codec.decode(
                {"size": os_["size"], "counts": os_["counts"].encode()})
            floats = _instance_float_maps(labels[t], kept, image_dims,
                                          min_dim, max_dim)
            _assert_equal_mod_knife_edge(ref_m, our_m, floats,
                                         lambda r, o: [k],
                                         f"ytvis track {k} frame {t}",
                                         budget=budget)


@pytest.mark.parametrize("image_dims,mask_hw,min_dim,max_dim,budget",
                         GEOMETRIES)
def test_kitti_writer_golden_diff(tmp_path, image_dims, mask_hw, min_dim,
                                  max_dim, budget):
    from stemseg_tpu.inference.chainer import track_stats
    from stemseg_tpu.inference.output_utils import KittiMOTSOutputGenerator

    h, w = mask_hw
    labels = _synthetic_labels(h=h, w=w)
    counts, lifetimes = track_stats(labels)
    rng = np.random.RandomState(2)
    # argmax semseg labels {0, 1, 2}, biased to nonzero on instance pixels
    category = rng.randint(0, 3, labels.shape).astype(np.int64)
    category[labels > 0] = 1 + (category[labels > 0] % 2)
    meta = _meta("kittimots", "0002", image_dims, labels, counts, lifetimes,
                 min_dim=min_dim, max_dim=max_dim)

    ref_dir = _run_reference_writer(tmp_path, f"kitti_{image_dims[0]}",
                                    labels, meta, category=category)

    our_dir = str(tmp_path / "ours")
    gen = KittiMOTSOutputGenerator(our_dir)
    gen.process_sequence(_Seq("0002", image_dims), labels.astype(np.int32),
                         counts, lifetimes, category, mask_scale=4,
                         max_tracks=4, min_dim=min_dim, max_dim=max_dim)

    from stemseg_tpu.inference.output_utils.common import select_instances_to_keep
    from stemseg_tpu.utils import rle as rle_codec

    with open(os.path.join(ref_dir, "results", "0002.txt")) as f:
        ref_lines = [l.split(" ", 5) for l in f.read().splitlines()]
    with open(os.path.join(our_dir, "results", "0002.txt")) as f:
        our_lines = [l.split(" ", 5) for l in f.read().splitlines()]

    # KITTI ranks by pixel count then renumbers by ascending lifetime
    kept = select_instances_to_keep(lifetimes, -1, 4, by="count",
                                    counts=counts)
    kept = sorted(kept, key=lambda x: lifetimes[x])

    assert len(ref_lines) == len(our_lines)
    for rl, ol in zip(ref_lines, our_lines):
        # all non-mask fields byte-exact: frame, class*1000+id, class, h, w
        assert rl[:5] == ol[:5], f"line fields differ: {rl[:5]} vs {ol[:5]}"
        if rl[5] == ol[5]:
            continue
        t = int(rl[0])
        hh, ww = int(rl[3]), int(rl[4])
        ref_m = rle_codec.decode({"size": [hh, ww], "counts": rl[5].encode()})
        our_m = rle_codec.decode({"size": [hh, ww], "counts": ol[5].encode()})
        floats = _instance_float_maps(labels[t], kept, image_dims,
                                      min_dim, max_dim)
        # the per-pixel max over instance ids means any kept instance's
        # knife-edge flip can move a pixel between tracks
        _assert_equal_mod_knife_edge(ref_m, our_m, floats,
                                     lambda r, o: range(len(kept)),
                                     f"kitti line frame {t} id {rl[1]}",
                                     budget=budget)
