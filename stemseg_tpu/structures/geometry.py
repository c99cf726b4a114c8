"""Resize / pad geometry shared by the data pipeline and the output writers.

These formulas must be *exact* replicas of the reference because they leak
into output geometry via un-padding at write time:

* ``compute_resize_params`` ←→ ``compute_resize_params_2``
  (``/root/reference/stemseg/data/common.py:142-159``): scale so the smaller
  side equals ``min_dim`` unless the larger side would exceed ``max_dim``;
  new dims use Python ``round`` (banker's rounding), matching the reference.
* ``compute_padding`` ←→ ``/root/reference/stemseg/data/common.py:33-36`` and
  the ImageList pad-to-32 (``structures/image_list.py:94-95``).
"""

from __future__ import annotations

import math
from typing import Tuple


def compute_resize_params(image_dims: Tuple[int, int], min_resize_dim: int,
                          max_resize_dim: int) -> Tuple[int, int, float]:
    """:param image_dims: (width, height)
    :return: (new_width, new_height, scale_factor)"""
    lower_size = float(min(image_dims))
    higher_size = float(max(image_dims))

    scale_factor = min_resize_dim / lower_size
    if (higher_size * scale_factor) > max_resize_dim:
        scale_factor = max_resize_dim / higher_size

    width, height = image_dims
    new_height, new_width = round(scale_factor * height), round(scale_factor * width)

    return new_width, new_height, scale_factor


def round_to_nearest_multiple(value: int, multiple: int = 32) -> int:
    return int(math.ceil(value / multiple)) * multiple


def compute_padding(width: int, height: int, multiple: int = 32) -> Tuple[int, int]:
    """:return: (pad_right, pad_bottom) to reach the next multiple."""
    pad_right = round_to_nearest_multiple(width, multiple) - width
    pad_bottom = round_to_nearest_multiple(height, multiple) - height
    return pad_right, pad_bottom


def pad_to_multiple(height: int, width: int, multiple: int = 32) -> Tuple[int, int]:
    """:return: (padded_height, padded_width)."""
    return (round_to_nearest_multiple(height, multiple),
            round_to_nearest_multiple(width, multiple))
