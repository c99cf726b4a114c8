"""Output generators: geometry chain, DAVIS PNGs, YT-VIS json, KITTI txt+NMS."""

import json
import os

import numpy as np
import pytest


class FakeSequence:
    def __init__(self, seq_id, image_dims):
        self.id = seq_id
        self.image_dims = image_dims


def _toy_tracks(t=4, h=16, w=24):
    """Dense labels with two tracks: id 1 (big, all frames), id 2 (small,
    frames 1-2 only), plus outlier pixels."""
    labels = np.full((t, h, w), -1, np.int32)
    for i in range(t):
        labels[i, 2:10, 2:12] = 1
    labels[1, 12:15, 14:20] = 2
    labels[2, 12:15, 14:20] = 2
    counts = {-1: int((labels == -1).sum()), 1: int((labels == 1).sum()),
              2: int((labels == 2).sum())}
    lifetimes = {-1: t - 1, 1: t - 1, 2: 1}
    return labels, counts, lifetimes


def test_masks_to_original_dims_geometry():
    from stemseg_tpu.inference.output_utils import masks_to_original_dims

    # image 100x180, min_dim 64, max_dim 128 -> scale=128/180, resized (71, 128)
    # padded to /32 -> (96, 128); at 4x scale -> (24, 32)
    masks = np.zeros((1, 24, 32), np.float32)
    masks[0, :18, :] = 1.0  # covers the valid region
    out = np.asarray(masks_to_original_dims(masks, 4, (100, 180), 64, 128))
    assert out.shape == (1, 100, 180)
    assert out[0, 50, 90]  # center is fg
    assert out.dtype == bool


def test_davis_png_output(tmp_path):
    from PIL import Image

    from stemseg_tpu.inference.output_utils import DavisOutputGenerator

    labels, counts, lifetimes = _toy_tracks()
    seq = FakeSequence("camel", (64, 96))
    gen = DavisOutputGenerator(str(tmp_path))
    kept, _ = gen.process_sequence(seq, labels, counts, lifetimes, None,
                                   mask_scale=4, max_tracks=20,
                                   min_dim=64, max_dim=96)
    assert kept == [1, 2]  # ranked by lifetime, outlier excluded

    files = sorted(os.listdir(tmp_path / "results" / "camel"))
    assert files == [f"{t:05d}.png" for t in range(4)]
    img = Image.open(tmp_path / "results" / "camel" / "00001.png")
    assert img.mode == "P"
    arr = np.array(img)
    assert set(np.unique(arr)) == {0, 1, 2}
    # track 1 occupies the big box region (scaled 4x)
    assert arr[20, 20] == 1


def test_ytvis_json_output(tmp_path):
    from stemseg_tpu.inference.output_utils import YoutubeVISOutputGenerator
    from stemseg_tpu.utils import rle as rle_codec

    labels, counts, lifetimes = _toy_tracks()
    t, h, w = labels.shape
    # logits: channel 0 bg, channels 1..3 classes; make class 2 win for
    # track 1 and class 3 for track 2
    category_masks = np.zeros((t, h, w, 4), np.float32)
    category_masks[..., 2] = np.where(labels == 1, 5.0, 0.0)
    category_masks[..., 3] = np.where(labels == 2, 7.0, 0.0)

    seq = FakeSequence(17, (64, 96))
    gen = YoutubeVISOutputGenerator(str(tmp_path))
    kept, _ = gen.process_sequence(seq, labels, counts, lifetimes,
                                   category_masks, mask_scale=4, max_tracks=10,
                                   min_dim=64, max_dim=96)
    gen.save()

    with open(tmp_path / "results.json") as fh:
        results = json.load(fh)
    assert len(results) == 2
    by_cat = {r["category_id"]: r for r in results}
    assert set(by_cat) == {2, 3}
    assert by_cat[2]["score"] == 1.0  # biggest track
    assert by_cat[3]["score"] < 1.0
    assert len(by_cat[2]["segmentations"]) == 4
    m = rle_codec.decode({"size": by_cat[2]["segmentations"][0]["size"],
                          "counts": by_cat[2]["segmentations"][0]["counts"]})
    assert m.shape == (64, 96) and m.sum() > 0
    assert os.path.exists(tmp_path / "results.zip")


def test_kitti_txt_output_and_nms(tmp_path):
    from stemseg_tpu.inference.output_utils import KittiMOTSOutputGenerator
    from stemseg_tpu.inference.output_utils.kitti_mots_postprocessing import (
        Detection,
        postprocess_results,
    )

    labels, counts, lifetimes = _toy_tracks()
    t, h, w = labels.shape
    category_masks = np.where(labels == 1, 1, np.where(labels == 2, 2, 0))

    seq = FakeSequence(2, (64, 96))
    gen = KittiMOTSOutputGenerator(str(tmp_path))
    kept, inverse_mapping = gen.process_sequence(
        seq, labels, counts, lifetimes, category_masks, mask_scale=4,
        max_tracks=1000, min_dim=64, max_dim=96)

    txt_path = tmp_path / "results" / "0002.txt"
    with open(txt_path) as fh:
        lines = [Detection.from_txt(l) for l in fh]
    assert len(lines) == 4 + 2  # track 1 on 4 frames, track 2 on 2
    class_ids = {d.track_id // 1000 for d in lines}
    assert class_ids == {1, 2}
    # ids are class*1000 + mapped id
    for d in lines:
        assert d.track_id % 1000 in (1, 2)
        assert d._mask["size"] == (64, 96)
        assert d.pixel_area > 0

    # NMS: default min pedestrian track length (10) kills the short track 2
    postprocess_results(str(tmp_path / "results"))
    with open(str(tmp_path / "results_nms") + "/0002.txt") as fh:
        kept_lines = [Detection.from_txt(l) for l in fh]
    kept_classes = {d.class_id for d in kept_lines}
    assert 2 not in kept_classes  # pedestrian track too short
    assert all(d.class_id == 1 for d in kept_lines)
