"""Temporal pooling / upsampling schedules and shared 3D blocks.

Reference: ``/root/reference/stemseg/modeling/common.py``. The reference reads
the clip length from the global config *at module import time*
(``common.py:15-35``); here both schedules are pure functions of
``num_frames`` passed explicitly by the model builder.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from stemseg_tpu.models.layers import Conv


def get_pooling_flags(num_frames: int) -> List[bool]:
    """Which of the decoder's three pooling slots actually pool temporally
    (True) vs are identity (False). Reference ``common.py:15-24``."""
    if num_frames == 2:
        return [False, False, False]
    if num_frames == 4:
        return [True, False, False]
    if num_frames == 8:
        return [True, True, False]
    if num_frames in (16, 24, 32):
        return [True, True, True]
    raise NotImplementedError(f"No temporal pooling schedule for num_frames={num_frames}")


def get_temporal_scales(num_frames: int) -> List[int]:
    """Per-stage temporal upsample factors for the 32->16->8->4 cascade.
    Reference ``common.py:27-35``."""
    if num_frames == 2:
        return [1, 1, 1]
    if num_frames == 4:
        return [1, 1, 2]
    if num_frames == 8:
        return [1, 2, 2]
    if num_frames in (16, 24, 32):
        return [2, 2, 2]
    raise NotImplementedError(f"No temporal scale schedule for num_frames={num_frames}")


class AtrousPyramid3D(nn.Module):
    """3D ASPP: parallel dilated 3x3x3 convs (+1x1x1) concatenated, optional
    ReLU+1x1x1 projection. Reference ``common.py:38-67``. Used by the dilated
    decoder variant. Input/output: [N, T, H, W, C]."""

    pyramid_channels: int
    dilation_rates: Sequence[Tuple[int, int, int]]
    out_channels: Optional[int] = None
    include_1x1_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, rate in enumerate(self.dilation_rates):
            outs.append(Conv(self.pyramid_channels, (3, 3, 3), padding=tuple(rate),
                             dilation=tuple(rate), use_bias=False, dtype=self.dtype,
                             name=f"atrous_convs_{i}")(x))
        if self.include_1x1_conv:
            outs.append(Conv(self.pyramid_channels, (1, 1, 1), use_bias=False,
                             dtype=self.dtype,
                             name=f"atrous_convs_{len(self.dilation_rates)}")(x))
        y = jnp.concatenate(outs, axis=-1)
        if self.out_channels:
            y = nn.relu(y)
            y = Conv(self.out_channels, (1, 1, 1), use_bias=False, dtype=self.dtype,
                     name="conv_out")(y)
        return y
