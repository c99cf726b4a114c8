from stemseg_tpu.structures.geometry import (
    compute_padding,
    compute_resize_params,
    pad_to_multiple,
    round_to_nearest_multiple,
)
from stemseg_tpu.structures.image_list import ImageList
from stemseg_tpu.structures.mask import BinaryMask, BinaryMaskSequenceList

__all__ = [
    "BinaryMask",
    "BinaryMaskSequenceList",
    "ImageList",
    "compute_padding",
    "compute_resize_params",
    "pad_to_multiple",
    "round_to_nearest_multiple",
]
