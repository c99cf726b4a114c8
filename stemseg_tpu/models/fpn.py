"""Feature Pyramid Network (top-down, 4 levels, 256 channels).

Behavioral reference: ``/root/reference/stemseg/modeling/backbone/fpn.py``.
Lateral 1x1 convs + 3x3 output convs (kaiming-uniform a=1 init, bias zero —
``make_layers.py:66-93`` with use_gn/use_relu False as in
``backbone.py:16-18``), nearest... no — *bilinear* (align_corners=False)
2x top-down upsampling (``fpn.py:64``).

Input: backbone stage features, increasing depth (4x..32x strides).
Output: tuple of 4 maps, highest resolution first, all ``out_channels``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from stemseg_tpu.models.layers import Conv, upsample_bilinear


class FPN(nn.Module):
    out_channels: int = 256
    num_levels: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        assert len(features) == self.num_levels

        inner = [
            Conv(self.out_channels, (1, 1), use_bias=True, kernel_init="kaiming_a1",
                 zero_bias=True, dtype=self.dtype, name=f"fpn_inner{i + 1}")
            for i in range(self.num_levels)
        ]
        layer = [
            Conv(self.out_channels, (3, 3), use_bias=True, kernel_init="kaiming_a1",
                 zero_bias=True, dtype=self.dtype, name=f"fpn_layer{i + 1}")
            for i in range(self.num_levels)
        ]

        last_inner = inner[-1](features[-1])
        results = [layer[-1](last_inner)]
        for idx in range(self.num_levels - 2, -1, -1):
            top_down = upsample_bilinear(last_inner, 2.0)
            lateral = inner[idx](features[idx])
            last_inner = lateral + top_down
            results.insert(0, layer[idx](last_inner))

        return tuple(results)
