"""Host-side image transforms (numpy/cv2, channels-last).

Behavioral reference: ``/root/reference/stemseg/data/common.py:12-30``
(``scale_and_normalize_images``) and the resize convention used throughout
(torch ``F.interpolate(mode='bilinear', align_corners=False)`` — cv2's
``INTER_LINEAR`` uses the same half-pixel sampling, verified by the resize
parity tests). Images flow as [T, H, W, 3] float32 BGR (cv2-native order);
normalization applies Caffe-style means per channel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import cv2
import numpy as np


def scale_and_normalize_images(images: np.ndarray, means: Sequence[float],
                               scales: Sequence[float], invert_channels: bool,
                               normalize_to_unit_scale: bool) -> np.ndarray:
    """:param images: [T, H, W, 3] float32 (BGR as loaded by cv2)"""
    images = images.astype(np.float32)
    if normalize_to_unit_scale:
        images = images / 255.0
    images = (images - np.asarray(means, np.float32)) / np.asarray(scales, np.float32)
    if invert_channels:
        images = images[..., ::-1]
    return images


def resize_images(images: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize [T, H, W, C] -> [T, h, w, C] (half-pixel convention)."""
    h, w = out_hw
    return np.stack([cv2.resize(im, (w, h), interpolation=cv2.INTER_LINEAR)
                     for im in images], axis=0)


def resize_mask(mask: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Binary mask resize: bilinear on float then > 0.5, matching the
    reference's ``BinaryMask.resize`` (``structures/mask.py``)."""
    h, w = out_hw
    resized = cv2.resize(mask.astype(np.float32), (w, h),
                         interpolation=cv2.INTER_LINEAR)
    return (resized > 0.5).astype(np.uint8)


def pad_image_to(images: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad [T, H, W, C] on bottom/right to (H', W')."""
    t, h, w, c = images.shape
    ph, pw = out_hw
    assert ph >= h and pw >= w
    out = np.zeros((t, ph, pw, c), images.dtype)
    out[:, :h, :w] = images
    return out
