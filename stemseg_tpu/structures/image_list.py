"""Zero-padded, ÷32-aligned clip batches.

TPU-native equivalent of the reference ``ImageList``
(``/root/reference/stemseg/structures/image_list.py:8-111``): batches a list of
variable-size ``[T, H, W, 3]`` clips into one zero-padded ``[N, T, Hp, Wp, 3]``
numpy array (channels-LAST — the TPU conv layout), with H/W rounded up to a
multiple of 32, remembering each clip's true size and original (pre-resize)
dims so outputs can be un-padded and resized back exactly.

This is a host-side structure: it produces fixed-shape numpy buffers that are
fed to jitted device functions. Shape bucketing (so XLA compiles once per
bucket) is done by padding to caller-supplied minimum dims.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from stemseg_tpu.structures.geometry import pad_to_multiple


class ImageList:
    def __init__(self, tensors: np.ndarray, image_sizes: List[Tuple[int, int]],
                 original_image_sizes: Optional[List[Tuple[int, int]]] = None):
        """:param tensors: [N, T, Hp, Wp, 3] float array (padded)
        :param image_sizes: per-sequence true (height, width) before padding
        :param original_image_sizes: per-sequence original (width, height)
        """
        self.tensors = tensors
        self.image_sizes = list(image_sizes)
        self.original_image_sizes = list(original_image_sizes) if original_image_sizes else None

    @property
    def num_seqs(self) -> int:
        return self.tensors.shape[0]

    @property
    def num_frames(self) -> int:
        return self.tensors.shape[1]

    @property
    def max_size(self) -> Tuple[int, int]:
        return self.tensors.shape[2], self.tensors.shape[3]

    def __len__(self):
        return self.num_seqs

    @classmethod
    def from_image_sequence_list(
        cls,
        image_sequences: Sequence[np.ndarray],
        original_image_sizes: Optional[List[Tuple[int, int]]] = None,
        size_divisibility: int = 32,
        min_dims: Optional[Tuple[int, int]] = None,
        dtype=np.float32,
    ) -> "ImageList":
        """:param image_sequences: list of [T, H, W, 3] arrays
        :param min_dims: optional (H, W) lower bound for the padded size —
            used for shape bucketing so XLA compiles one graph per bucket.
        """
        assert len(image_sequences) > 0
        num_frames = image_sequences[0].shape[0]
        assert all(seq.shape[0] == num_frames for seq in image_sequences), \
            "All clips in a batch must have the same number of frames"

        image_sizes = [(int(seq.shape[1]), int(seq.shape[2])) for seq in image_sequences]
        max_h = max(h for h, _ in image_sizes)
        max_w = max(w for _, w in image_sizes)
        if min_dims is not None:
            max_h = max(max_h, min_dims[0])
            max_w = max(max_w, min_dims[1])
        pad_h, pad_w = pad_to_multiple(max_h, max_w, size_divisibility)

        batch = np.zeros(
            (len(image_sequences), num_frames, pad_h, pad_w, 3), dtype=dtype)
        for i, seq in enumerate(image_sequences):
            h, w = image_sizes[i]
            batch[i, :, :h, :w, :] = seq

        return cls(batch, image_sizes, original_image_sizes)
