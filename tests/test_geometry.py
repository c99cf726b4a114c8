import numpy as np
import pytest

from stemseg_tpu.structures import (
    ImageList,
    compute_padding,
    compute_resize_params,
    pad_to_multiple,
)


@pytest.mark.parametrize("dims,min_dim,max_dim,expected", [
    # DAVIS 480p at davis_2 dims (736/1248): 854x480 -> scale by 736/480
    ((854, 480), 736, 1248, (1248, 701)),   # capped by max_dim: 854*1.533>1248
    # KITTI at kitti_mots_2 dims
    ((1242, 375), 736, 1792, (1792, 541)),
    # already-limiting min side
    ((640, 480), 800, 1333, (1067, 800)),
])
def test_compute_resize_params(dims, min_dim, max_dim, expected):
    w, h, scale = compute_resize_params(dims, min_dim, max_dim)
    # replicate the reference formula independently
    lower, higher = float(min(dims)), float(max(dims))
    s = min_dim / lower
    if higher * s > max_dim:
        s = max_dim / higher
    assert (w, h) == (round(s * dims[0]), round(s * dims[1]))
    assert (w, h) == expected
    assert scale == pytest.approx(s)


def test_compute_padding():
    assert compute_padding(1248, 701) == (0, 3)  # 701 -> 704
    assert compute_padding(32, 32) == (0, 0)
    assert compute_padding(33, 1) == (31, 31)
    assert pad_to_multiple(701, 1248) == (704, 1248)


def test_image_list_padding_and_sizes():
    seqs = [
        np.ones((8, 701, 1248, 3), dtype=np.float32),
        np.ones((8, 480, 854, 3), dtype=np.float32) * 2,
    ]
    il = ImageList.from_image_sequence_list(seqs, original_image_sizes=[(1920, 1080), (854, 480)])
    assert il.tensors.shape == (2, 8, 704, 1248, 3)
    assert il.num_seqs == 2 and il.num_frames == 8
    assert il.image_sizes == [(701, 1248), (480, 854)]
    # zero padding outside the true extent
    assert il.tensors[1, :, :480, :854].min() == 2
    assert il.tensors[1, :, 480:, :].max() == 0
    assert il.tensors[0, :, 701:, :].max() == 0


def test_image_list_min_dims_bucketing():
    seqs = [np.ones((4, 100, 200, 3), dtype=np.float32)]
    il = ImageList.from_image_sequence_list(seqs, min_dims=(256, 512))
    assert il.tensors.shape == (1, 4, 256, 512, 3)


def test_image_list_rejects_mismatched_frame_counts():
    seqs = [np.zeros((4, 64, 64, 3)), np.zeros((8, 64, 64, 3))]
    with pytest.raises(AssertionError):
        ImageList.from_image_sequence_list(seqs)
