"""BinaryMask / BinaryMaskSequenceList and ImageList behavior."""

import numpy as np

from stemseg_tpu.structures import (
    BinaryMask,
    BinaryMaskSequenceList,
    ImageList,
    compute_resize_params,
)


def test_binary_mask_ops():
    m = np.zeros((20, 30), np.uint8)
    m[5:15, 10:25] = 1
    bm = BinaryMask(m)
    assert bm.area() == 10 * 15
    assert bm.bbox() == (10, 5, 25, 15)

    r = bm.resize((15, 10))  # (width, height)
    assert r.shape == (10, 15)
    assert r.area() > 0

    f = bm.flip_horizontal()
    assert f.bbox() == (30 - 25, 5, 30 - 10, 15)

    p = bm.pad(2, 3)
    assert p.shape == (23, 32)
    assert p.area() == bm.area()

    c = bm.crop(10, 5, 15, 10)
    assert c.area() == c.numpy().size  # fully foreground

    inv = ~bm
    assert inv.area() == 20 * 30 - bm.area()


def test_mask_sequence_list():
    frames = []
    for t in range(3):
        m1 = np.zeros((12, 16), np.uint8)
        m1[2:6, 3 + t:9 + t] = 1
        m2 = np.zeros((12, 16), np.uint8)
        m2[7:11, 1:5] = 1
        frames.append([m1, m2])
    msl = BinaryMaskSequenceList.from_numpy(frames)
    assert msl.num_frames == 3 and msl.num_instances == 2

    arr = msl.numpy()
    assert arr.shape == (3, 2, 12, 16)

    rev = msl.reverse()
    np.testing.assert_array_equal(rev.numpy()[0], arr[2])

    resized = msl.resize((8, 6))
    assert resized.numpy().shape == (3, 2, 6, 8)


def test_image_list_padding():
    clips = [np.ones((2, 37, 53, 3), np.float32),
             np.ones((2, 40, 60, 3), np.float32)]
    il = ImageList.from_image_sequence_list(clips)
    n, t, h, w, c = il.tensors.shape
    assert (n, t, c) == (2, 2, 3)
    assert h % 32 == 0 and w % 32 == 0
    assert h >= 40 and w >= 60
    assert il.image_sizes == [(37, 53), (40, 60)]
    # padding is zero
    assert il.tensors[0, :, 37:, :].sum() == 0


def test_resize_params_examples():
    # min-side driven
    assert compute_resize_params((854, 480), 480, 864) == (854, 480, 1.0)
    # max-side capped
    w, h, s = compute_resize_params((1920, 1080), 800, 1333)
    assert w == 1333 and h == round(1080 * 1333 / 1920)
