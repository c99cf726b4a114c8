"""3D squeeze-expand decoders (embedding / seediness / semseg heads).

Behavioral reference:
``/root/reference/stemseg/modeling/embedding_decoder.py:11-145``,
``seediness_decoder.py:11-112``, ``semseg_decoder.py:12-120``.

All three heads share one topology over the 4 FPN maps lifted to video
tensors [N, T, H, W, C]:

* per-scale "squeeze" blocks of Conv3D(3x3x3)+Norm+ReLU with temporal
  stride-(2,1,1) avg/max pools — the 32x block has 3 conv+pool slots, 16x
  has 2, 8x has 1, 4x has a single conv (no pool). Which slots actually
  pool is the ``num_frames``-keyed schedule from ``common3d``.
* an "expand" cascade: trilinear upsample (t_scale, 2, 2) -> concat with the
  next-finer squeezed map -> 1x1x1 fuse conv (bias-free).
* head-specific 1x1x1 output convs.

The semseg head receives features ordered (4x, 8x, 16x, 32x) and reverses
them internally (reference ``semseg_decoder.py:94``); the embedding and
seediness heads receive (32x, ..., 4x) directly. Our shared module always
takes coarsest-first and the builder handles ordering.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stemseg_tpu.models.common3d import get_pooling_flags, get_temporal_scales
from stemseg_tpu.models.embedding_utils import (
    add_spatiotemporal_offset,
    get_nb_embedding_dims,
    get_nb_free_dims,
)
from stemseg_tpu.models.layers import Conv, GroupNorm, avg_pool_3d, max_pool_3d, upsample_trilinear
from stemseg_tpu.utils.registry import Registry

# head_type config strings -> trunk modules (reference registers whole
# decoders under "squeeze_expand_decoder", embedding_decoder.py:8-11; the
# dilated variant exists unregistered there, registered here)
TRUNK_REGISTRY = Registry.get("DecoderTrunk")


def _norm(norm_type: str, gn_groups: int, name: str):
    if norm_type == "gn":
        return GroupNorm(gn_groups, name=name)
    if norm_type == "none":
        return None
    raise ValueError(f"Unknown normalization layer {norm_type!r}")


def _pool(pool_type: str, x):
    if pool_type == "avg":
        return avg_pool_3d(x, (3, 3, 3), (2, 1, 1), (1, 1, 1))
    if pool_type == "max":
        return max_pool_3d(x, (3, 3, 3), (2, 1, 1), (1, 1, 1))
    raise ValueError(f"Unknown pool type {pool_type!r}")


class _ConvKernel(nn.Module):
    """Bare conv-kernel param holder. Named ``conv`` by its parent so the
    param path matches the ``Conv`` wrapper's (``<parent>/conv/kernel``) —
    converted reference checkpoints load unchanged."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        from stemseg_tpu.models.layers import torch_default_conv_init

        return self.param("kernel", torch_default_conv_init, self.shape)


class FuseConv(nn.Module):
    """One expand-cascade step — reference semantics: trilinear-upsample
    ``a`` by (t_scale, 2, 2), concat with ``b``, bias-free 1x1x1 conv
    (``embedding_decoder.py:101-145``). Computed as
    ``up(conv_a(a)) + conv_b(b)``: a 1x1 conv is a per-pixel linear map and
    trilinear interpolation a per-channel linear map, so they commute
    exactly — running the ``a`` slice at the COARSE resolution does
    (t_scale*4)x fewer MACs for that half of the kernel. Parameter tree is
    identical to ``Conv(features, (1,1,1), use_bias=False)``."""

    features: int
    t_scale: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        in_a, in_b = a.shape[-1], b.shape[-1]
        kernel = _ConvKernel((1, 1, 1, in_a + in_b, self.features),
                             name="conv")()
        ka, kb = kernel[..., :in_a, :], kernel[..., in_a:, :]
        if self.dtype is not None:
            a, b = a.astype(self.dtype), b.astype(self.dtype)
            ka, kb = ka.astype(self.dtype), kb.astype(self.dtype)
        dn = ("NTHWC", "THWIO", "NTHWC")
        ya = jax.lax.conv_general_dilated(a, ka, (1, 1, 1), [(0, 0)] * 3,
                                          dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(b, kb, (1, 1, 1), [(0, 0)] * 3,
                                          dimension_numbers=dn)
        return upsample_trilinear(ya, (self.t_scale, 2.0, 2.0)) + yb


class SqueezeExpandTrunk(nn.Module):
    """The shared squeeze-expand trunk. Input: 4 maps coarsest-first
    (32x, 16x, 8x, 4x), each [N, T, H_s, W_s, C]. Output: [N, T, H/4, W/4,
    inter_channels[-1]]."""

    inter_channels: Tuple[int, int, int, int] = (256, 256, 128, 128)
    num_frames: int = 8
    norm_type: str = "none"
    gn_groups: int = 32
    pool_type: str = "avg"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        assert len(feats) == 4, f"Expected 4 feature maps, got {len(feats)}"
        f32, f16, f8, f4 = feats
        pool_flags = get_pooling_flags(self.num_frames)
        t_scales = get_temporal_scales(self.num_frames)

        def conv_block(x, ch, slot, block_name, conv_idx):
            x = Conv(ch, (3, 3, 3), use_bias=True, dtype=self.dtype,
                     name=f"{block_name}_conv{conv_idx}")(x)
            norm = _norm(self.norm_type, self.gn_groups, f"{block_name}_norm{conv_idx}")
            if norm is not None:
                x = norm(x)
            x = nn.relu(x)
            if slot is not None and pool_flags[slot]:
                x = _pool(self.pool_type, x)
            return x

        # squeeze blocks — slot indices follow the reference's
        # PoolingLayerCallbacks ordering (embedding_decoder.py:20-62)
        x32 = f32
        for i in range(3):
            x32 = conv_block(x32, self.inter_channels[0], i, "block_32x", i)
        x16 = f16
        for i in range(2):
            x16 = conv_block(x16, self.inter_channels[1], i, "block_16x", i)
        x8 = conv_block(f8, self.inter_channels[2], 0, "block_8x", 0)
        x4 = conv_block(f4, self.inter_channels[3], None, "block_4x", 0)

        # expand cascade (split-kernel formulation, see FuseConv)
        x = FuseConv(self.inter_channels[1], t_scales[0], dtype=self.dtype,
                     name="conv_16")(x32, x16)
        x = FuseConv(self.inter_channels[2], t_scales[1], dtype=self.dtype,
                     name="conv_8")(x, x8)
        x = FuseConv(self.inter_channels[3], t_scales[2], dtype=self.dtype,
                     name="conv_4")(x, x4)
        return x


TRUNK_REGISTRY.add("squeeze_expand_decoder", SqueezeExpandTrunk)


class EmbeddingDecoder(nn.Module):
    """Embedding head: trunk + conv_embedding (optionally 0.25*tanh) +
    coordinate-grid offset, conv_variance, optional fused conv_seediness.
    Output [N, T, H/4, W/4, E + V (+1)] — channel order (emb | var | seed)
    matching reference ``embedding_decoder.py:131-145``."""

    inter_channels: Tuple[int, int, int, int] = (256, 256, 128, 128)
    embedding_size: int = 3
    embedding_dim_mode: str = "xyt"
    tanh_activation: bool = True
    seediness_output: bool = True
    num_frames: int = 8
    norm_type: str = "none"
    gn_groups: int = 32
    pool_type: str = "avg"
    trunk_type: str = "squeeze_expand_decoder"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats_coarsest_first: Sequence[jnp.ndarray]):
        x = TRUNK_REGISTRY[self.trunk_type](
            self.inter_channels, self.num_frames, self.norm_type, self.gn_groups,
            self.pool_type, dtype=self.dtype, name="trunk")(feats_coarsest_first)

        n_free = get_nb_free_dims(self.embedding_dim_mode)
        emb_out = get_nb_embedding_dims(self.embedding_dim_mode)
        var_channels = self.embedding_size - n_free

        embeddings = Conv(emb_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
                          name="conv_embedding")(x)
        if self.tanh_activation:
            embeddings = jnp.tanh(embeddings * 0.25)

        # reference inits the buffer to 1.0 and only a ckpt load changes it
        # (embedding_decoder.py:99; see parity note in config.py)
        time_scale = self.variable("constants", "time_scale",
                                   lambda: jnp.asarray(1.0, jnp.float32)).value
        embeddings = add_spatiotemporal_offset(embeddings, time_scale, self.embedding_dim_mode)

        variances = Conv(var_channels, (1, 1, 1), use_bias=True, dtype=self.dtype,
                         name="conv_variance")(x)

        if self.seediness_output:
            seediness = nn.sigmoid(Conv(1, (1, 1, 1), use_bias=False, dtype=self.dtype,
                                        name="conv_seediness")(x))
            return jnp.concatenate([embeddings, variances, seediness], axis=-1)
        return jnp.concatenate([embeddings, variances], axis=-1)


class SeedinessDecoder(nn.Module):
    """Separate seediness head (DAVIS configs): trunk + 1-channel sigmoid.
    Reference ``seediness_decoder.py:11-112``."""

    inter_channels: Tuple[int, int, int, int] = (256, 256, 128, 128)
    num_frames: int = 8
    norm_type: str = "none"
    gn_groups: int = 32
    pool_type: str = "avg"
    trunk_type: str = "squeeze_expand_decoder"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats_coarsest_first: Sequence[jnp.ndarray]):
        x = TRUNK_REGISTRY[self.trunk_type](
            self.inter_channels, self.num_frames, self.norm_type, self.gn_groups,
            self.pool_type, dtype=self.dtype, name="trunk")(feats_coarsest_first)
        # the reference names this head's output conv ``conv_out``
        # (seediness_decoder.py:80), unlike the fused one (``conv_seediness``)
        return nn.sigmoid(Conv(1, (1, 1, 1), use_bias=False, dtype=self.dtype,
                               name="conv_out")(x))


class DilatedSqueezeExpandTrunk(nn.Module):
    """Dilated trunk variant: the 32x/16x squeeze blocks use 3D ASPP
    pyramids instead of plain convs, with (3,1,1) temporal-only pools.
    Reference ``embedding_decoder.py:148-244`` (``SqueezingExpandDilatedDecoder``
    — defined but not registered there; provided here for completeness)."""

    inter_channels: Tuple[int, int, int, int] = (256, 256, 128, 128)
    num_frames: int = 8
    norm_type: str = "none"
    gn_groups: int = 32
    pool_type: str = "avg"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        from stemseg_tpu.models.common3d import AtrousPyramid3D
        from stemseg_tpu.models.layers import avg_pool_3d, max_pool_3d

        assert len(feats) == 4
        f32, f16, f8, f4 = feats
        pool_flags = get_pooling_flags(self.num_frames)
        t_scales = get_temporal_scales(self.num_frames)

        def tpool(x, slot):
            if not pool_flags[slot]:
                return x
            pool = avg_pool_3d if self.pool_type == "avg" else max_pool_3d
            return pool(x, (3, 1, 1), (2, 1, 1), (1, 0, 0))

        def norm_relu(x, name):
            norm = _norm(self.norm_type, self.gn_groups, name)
            if norm is not None:
                x = norm(x)
            return nn.relu(x)

        x32 = f32
        for i, rates in enumerate([((1, 3, 3), (1, 6, 6), (1, 9, 9))] * 3):
            x32 = AtrousPyramid3D(64, rates, self.inter_channels[0],
                                  dtype=self.dtype, name=f"block_32x_aspp{i}")(x32)
            x32 = tpool(norm_relu(x32, f"block_32x_norm{i}"), i)
        x16 = f16
        for i in range(2):
            x16 = AtrousPyramid3D(64, ((1, 4, 4), (1, 8, 8), (1, 12, 12)),
                                  self.inter_channels[1], dtype=self.dtype,
                                  name=f"block_16x_aspp{i}")(x16)
            x16 = tpool(norm_relu(x16, f"block_16x_norm{i}"), i)

        def conv_block(x, ch, slot, name):
            x = Conv(ch, (3, 3, 3), use_bias=True, dtype=self.dtype,
                     name=f"{name}_conv0")(x)
            x = norm_relu(x, f"{name}_norm0")
            if slot is not None and pool_flags[slot]:
                pool = _pool(self.pool_type, x)
                return pool
            return x

        x8 = conv_block(f8, self.inter_channels[2], 0, "block_8x")
        x4 = conv_block(f4, self.inter_channels[3], None, "block_4x")

        x = FuseConv(self.inter_channels[1], t_scales[0], dtype=self.dtype,
                     name="conv_16")(x32, x16)
        x = FuseConv(self.inter_channels[2], t_scales[1], dtype=self.dtype,
                     name="conv_8")(x, x8)
        x = FuseConv(self.inter_channels[3], t_scales[2], dtype=self.dtype,
                     name="conv_4")(x, x4)
        return x


TRUNK_REGISTRY.add("squeeze_expand_dilated_decoder", DilatedSqueezeExpandTrunk)


class SemsegDecoder(nn.Module):
    """Semantic segmentation head: trunk + (num_classes [+1 fg]) logits.
    Reference ``semseg_decoder.py:12-120``."""

    num_classes: int = 2
    inter_channels: Tuple[int, int, int, int] = (256, 256, 128, 128)
    foreground_channel: bool = True
    num_frames: int = 8
    norm_type: str = "none"
    gn_groups: int = 32
    pool_type: str = "avg"
    trunk_type: str = "squeeze_expand_decoder"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats_coarsest_first: Sequence[jnp.ndarray]):
        x = TRUNK_REGISTRY[self.trunk_type](
            self.inter_channels, self.num_frames, self.norm_type, self.gn_groups,
            self.pool_type, dtype=self.dtype, name="trunk")(feats_coarsest_first)
        out_ch = self.num_classes + 1 if self.foreground_channel else self.num_classes
        return Conv(out_ch, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_out")(x)
