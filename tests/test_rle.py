"""RLE codec: round-trips, hand-derived format vectors, area/bbox."""

import numpy as np
import pytest

from stemseg_tpu.utils import rle


def test_hand_derived_vectors():
    # all-background 3x3: one run of 9 -> varint('9')
    m = np.zeros((3, 3), np.uint8)
    enc = rle.encode(m)
    assert enc["size"] == [3, 3]
    assert enc["counts"] == b"9"

    # all-foreground 3x3: runs [0, 9] -> '0', '9'
    enc = rle.encode(np.ones((3, 3), np.uint8))
    assert enc["counts"] == b"09"

    # single fg pixel at (0,0) of 2x2: runs [0,1,3] -> '0','1','3'
    m = np.zeros((2, 2), np.uint8)
    m[0, 0] = 1
    assert rle.encode(m)["counts"] == b"013"

    # value 32 needs two chars: 32 = 0b100000 -> c0=0|0x20 cont, c1=1
    # runs [32] for a 32x1 empty mask
    enc = rle.encode(np.zeros((32, 1), np.uint8))
    assert enc["counts"] == bytes([0 + 48 + 32, 1 + 48])


def test_round_trip_random():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (7, 5), (64, 48), (37, 91)]:
        for density in (0.0, 0.2, 0.5, 0.9, 1.0):
            m = (rng.rand(*shape) < density).astype(np.uint8)
            enc = rle.encode(m)
            dec = rle.decode(enc)
            np.testing.assert_array_equal(dec, m)
            assert rle.area(enc) == int(m.sum())


def test_round_trip_blobby():
    """Blobby masks exercise the delta encoding (long similar runs)."""
    rng = np.random.RandomState(1)
    yy, xx = np.mgrid[0:100, 0:80]
    for _ in range(5):
        cy, cx, r = rng.randint(20, 80), rng.randint(20, 60), rng.randint(5, 25)
        m = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.uint8)
        enc = rle.encode(m)
        np.testing.assert_array_equal(rle.decode(enc), m)


def test_str_counts_accepted():
    m = (np.random.RandomState(2).rand(20, 30) < 0.4).astype(np.uint8)
    enc = rle.encode(m)
    enc_str = {"size": enc["size"], "counts": enc["counts"].decode("ascii")}
    np.testing.assert_array_equal(rle.decode(enc_str), m)


def test_uncompressed_counts_accepted():
    m = np.zeros((4, 4), np.uint8)
    m[1:3, 1:3] = 1
    enc = rle.encode(m)
    raw = rle.string_to_counts(enc["counts"])
    np.testing.assert_array_equal(
        rle.decode({"size": [4, 4], "counts": raw}), m)


def test_bbox():
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:9] = 1
    bbox = rle.toBbox(rle.encode(m))
    np.testing.assert_array_equal(bbox, [3, 2, 6, 3])  # [x, y, w, h]

    # empty mask
    np.testing.assert_array_equal(rle.toBbox(rle.encode(np.zeros((5, 5), np.uint8))),
                                  [0, 0, 0, 0])

    # full-column-spanning run
    m2 = np.zeros((4, 3), np.uint8)
    m2[:, 1] = 1
    np.testing.assert_array_equal(rle.toBbox(rle.encode(m2)), [1, 0, 1, 4])


def test_multi_mask():
    rng = np.random.RandomState(3)
    masks = (rng.rand(16, 20, 3) < 0.3).astype(np.uint8)
    encs = rle.encode(masks)
    assert len(encs) == 3
    dec = rle.decode(encs)
    np.testing.assert_array_equal(dec, masks)
    areas = rle.area(encs)
    np.testing.assert_array_equal(areas, masks.sum(axis=(0, 1)))


def test_iou_masks():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8] = 1
    ious = rle.iou_masks([rle.encode(a)], [rle.encode(b)])
    np.testing.assert_allclose(ious, [[20.0 / 80.0]])
