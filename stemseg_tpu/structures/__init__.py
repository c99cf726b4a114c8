from stemseg_tpu.structures.geometry import (
    compute_padding,
    compute_resize_params,
    pad_to_multiple,
    round_to_nearest_multiple,
)
from stemseg_tpu.structures.image_list import ImageList

__all__ = [
    "ImageList",
    "compute_padding",
    "compute_resize_params",
    "pad_to_multiple",
    "round_to_nearest_multiple",
]
