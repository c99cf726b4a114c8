"""ResNet-50/101 backbone with FrozenBatchNorm, channels-last, TPU-first.

Behavioral reference: ``/root/reference/stemseg/modeling/backbone/resnet.py``
(itself derived from maskrcnn-benchmark). Differences by design:

* channels-last ``[N, H, W, C]`` tensors (XLA's preferred TPU conv layout);
* stage freezing is two-sided: the optimizer masks updates over the frozen
  param subtree (``training/optim.py:param_freeze_labels``), and the module
  applies ``jax.lax.stop_gradient`` at the frozen-stage boundary so the
  backward never computes those stages' weight grads — the FLOP-for-FLOP
  equivalent of the reference's ``requires_grad=False`` autograd pruning
  (``resnet.py:94-103``; torch records no graph below frozen leaves);
* FrozenBatchNorm buffers live in the ``constants`` collection.

Weight-name layout mirrors the reference state-dict so the checkpoint
converter is a mechanical rename: ``stem.conv1``, ``layer{i}.{j}.conv{1,2,3}``,
``layer{i}.{j}.downsample.{0,1}``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stemseg_tpu.models.layers import Conv, FrozenBatchNorm, max_pool_2d


class StageSpec(NamedTuple):
    index: int
    block_count: int
    return_features: bool


# Reference ``resnet.py:26-46``
RESNET50_FPN_STAGES = tuple(StageSpec(i, c, True) for i, c in ((1, 3), (2, 4), (3, 6), (4, 3)))
RESNET101_FPN_STAGES = tuple(StageSpec(i, c, True) for i, c in ((1, 3), (2, 4), (3, 23), (4, 3)))

STAGE_SPECS = {
    "R-50-FPN": RESNET50_FPN_STAGES,
    "R-101-FPN": RESNET101_FPN_STAGES,
    # ResNeXt-101: same stage layout; the grouped-conv width comes from
    # cfg.model.resnets (num_groups=32, width_per_group=8). The reference
    # registers this key (backbone/__init__.py:9) but its _STAGE_SPECS table
    # lacks it — a latent KeyError there; functional here.
    "X-101-FPN": RESNET101_FPN_STAGES,
}


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with FrozenBN and optional projection
    shortcut. Reference ``resnet.py:193-283``. ``stride_in_1x1=True`` places
    the stride on the first 1x1 conv (Caffe/MSRA convention used by the
    pretrained Mask R-CNN weights)."""

    bottleneck_channels: int
    out_channels: int
    num_groups: int = 1
    stride_in_1x1: bool = True
    stride: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        identity = x

        stride = 1 if self.dilation > 1 else self.stride
        stride_1x1, stride_3x3 = (stride, 1) if self.stride_in_1x1 else (1, stride)

        out = Conv(self.bottleneck_channels, (1, 1), strides=(stride_1x1, stride_1x1),
                   use_bias=False, kernel_init="kaiming_a1", dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn1")(out)
        out = nn.relu(out)

        out = Conv(self.bottleneck_channels, (3, 3), strides=(stride_3x3, stride_3x3),
                   padding=(self.dilation, self.dilation), dilation=(self.dilation, self.dilation),
                   groups=self.num_groups, use_bias=False, kernel_init="kaiming_a1",
                   dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn2")(out)
        out = nn.relu(out)

        out = Conv(self.out_channels, (1, 1), use_bias=False, kernel_init="kaiming_a1",
                   dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.out_channels, name="bn3")(out)

        if in_channels != self.out_channels:
            down_stride = stride if self.dilation == 1 else 1
            identity = Conv(self.out_channels, (1, 1), strides=(down_stride, down_stride),
                            use_bias=False, kernel_init="kaiming_a1", dtype=self.dtype,
                            name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.out_channels, name="downsample_bn")(identity)

        return nn.relu(out + identity)


class Stem(nn.Module):
    """7x7/2 conv + FrozenBN + ReLU + 3x3/2 maxpool. Reference
    ``resnet.py:285-305``."""

    out_channels: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.out_channels, (7, 7), strides=(2, 2), padding=(3, 3),
                 use_bias=False, kernel_init="kaiming_a1", dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(self.out_channels, name="bn1")(x)
        x = nn.relu(x)
        return max_pool_2d(x, (3, 3), (2, 2), (1, 1))


class ResNet(nn.Module):
    """Full backbone body: stem + 4 stages, returning every stage's feature
    map (4x, 8x, 16x, 32x strides). Reference ``resnet.py:49-115``."""

    stage_specs: Sequence[StageSpec] = RESNET101_FPN_STAGES
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    # stop grads below this stage: 1 = stem frozen, 2 = stem + layer1, ...
    # (maskrcnn-benchmark FREEZE_CONV_BODY_AT numbering). 0 = no pruning —
    # inference models pass 0 since no backward exists.
    freeze_at_stage: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Stem(self.stem_out_channels, dtype=self.dtype, name="stem")(x)
        if self.freeze_at_stage >= 1:
            # everything below here serves only frozen params — prune the
            # whole sub-backward, exactly as torch autograd does when
            # stem/layerN have requires_grad=False
            x = jax.lax.stop_gradient(x)

        outputs = []
        for spec in self.stage_specs:
            factor = 2 ** (spec.index - 1)
            bottleneck_channels = self.num_groups * self.width_per_group * factor
            out_channels = self.res2_out_channels * factor
            first_stride = 1 if spec.index == 1 else 2
            for block_idx in range(spec.block_count):
                x = Bottleneck(
                    bottleneck_channels=bottleneck_channels,
                    out_channels=out_channels,
                    num_groups=self.num_groups,
                    stride_in_1x1=self.stride_in_1x1,
                    stride=first_stride if block_idx == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{spec.index}_{block_idx}",
                )(x)
            if spec.index < self.freeze_at_stage:
                x = jax.lax.stop_gradient(x)
            if spec.return_features:
                outputs.append(x)

        return outputs

    @property
    def stage_out_channels(self) -> Tuple[int, ...]:
        return tuple(self.res2_out_channels * (2 ** (s.index - 1)) for s in self.stage_specs)
