"""Binary mask wrappers: per-mask geometry ops and clip-level collections.

Behavioral reference: ``/root/reference/stemseg/structures/mask.py``
(``BinaryMask`` :7-100, ``BinaryMaskSequenceList`` :103-209). Backed by
numpy (the reference wraps torch tensors); resize follows the bilinear>0.5
convention used everywhere else in the pipeline.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np

from stemseg_tpu.data.transforms import resize_mask


class BinaryMask:
    def __init__(self, mask: np.ndarray):
        mask = np.asarray(mask)
        assert mask.ndim == 2, f"mask must be 2-D, got shape {mask.shape}"
        self._mask = mask.astype(np.uint8)

    def numpy(self) -> np.ndarray:
        return self._mask

    # reference exposes ``tensor()``; keep the name as an alias
    tensor = numpy

    @property
    def shape(self) -> Tuple[int, int]:
        return self._mask.shape

    def resize(self, width_height: Tuple[int, int]) -> "BinaryMask":
        """:param width_height: (width, height) — reference argument order"""
        w, h = width_height
        return BinaryMask(resize_mask(self._mask, (h, w)))

    def pad(self, pad_right: int, pad_bottom: int) -> "BinaryMask":
        return BinaryMask(np.pad(self._mask, ((0, pad_bottom), (0, pad_right))))

    def crop(self, x0: int, y0: int, width: int, height: int) -> "BinaryMask":
        return BinaryMask(self._mask[y0:y0 + height, x0:x0 + width])

    def flip_horizontal(self) -> "BinaryMask":
        return BinaryMask(np.flip(self._mask, axis=1))

    def warp_affine(self, matrix: np.ndarray, out_wh: Optional[Tuple[int, int]] = None
                    ) -> "BinaryMask":
        h, w = self._mask.shape
        out_wh = out_wh or (w, h)
        return BinaryMask(cv2.warpAffine(self._mask, np.asarray(matrix, np.float32),
                                         out_wh, flags=cv2.INTER_NEAREST))

    def bbox(self) -> Optional[Tuple[int, int, int, int]]:
        """(x_min, y_min, x_max, y_max) exclusive max, or None if empty."""
        from stemseg_tpu.data.instance_duplicator import bbox_from_mask

        return bbox_from_mask(self._mask)

    def area(self) -> int:
        return int(self._mask.sum())

    def __invert__(self) -> "BinaryMask":
        return BinaryMask(1 - self._mask)


class BinaryMaskSequenceList:
    """T-major list of per-frame instance mask lists with broadcast ops.
    ``tensor()`` -> [T, N, H, W] uint8 (reference ``mask.py:103-209``)."""

    def __init__(self, mask_sequence_list: List[List[BinaryMask]]):
        assert mask_sequence_list
        n = len(mask_sequence_list[0])
        assert all(len(m) == n for m in mask_sequence_list), \
            "all frames must have the same number of instances"
        self._masks = mask_sequence_list

    @property
    def num_frames(self) -> int:
        return len(self._masks)

    @property
    def num_instances(self) -> int:
        return len(self._masks[0])

    @classmethod
    def from_numpy(cls, masks: List[List[np.ndarray]]) -> "BinaryMaskSequenceList":
        return cls([[BinaryMask(m) for m in frame] for frame in masks])

    def _map(self, fn) -> "BinaryMaskSequenceList":
        return BinaryMaskSequenceList([[fn(m) for m in frame] for frame in self._masks])

    def resize(self, width_height: Tuple[int, int]) -> "BinaryMaskSequenceList":
        return self._map(lambda m: m.resize(width_height))

    def flip_horizontal(self) -> "BinaryMaskSequenceList":
        return self._map(lambda m: m.flip_horizontal())

    def pad(self, pad_right: int, pad_bottom: int) -> "BinaryMaskSequenceList":
        return self._map(lambda m: m.pad(pad_right, pad_bottom))

    def reverse(self) -> "BinaryMaskSequenceList":
        return BinaryMaskSequenceList(self._masks[::-1])

    def numpy(self) -> np.ndarray:
        """[T, N, H, W] uint8 (empty instance axis handled)."""
        t, n = self.num_frames, self.num_instances
        if n == 0:
            return np.zeros((t, 0, 0, 0), np.uint8)
        return np.stack([np.stack([m.numpy() for m in frame]) for frame in self._masks])

    tensor = numpy
