"""Primitive layers shared by the backbone and the 3D decoders.

TPU-native reimplementation of the reference's layer zoo:

* ``FrozenBatchNorm`` ←→ ``/root/reference/stemseg/modeling/backbone/make_layers.py:37-63``
  — batch statistics and affine parameters are fixed buffers; the whole layer
  is a per-channel fused multiply-add, which XLA fuses into the preceding conv.
* kaiming-uniform conv initializers ←→ ``make_layers.py:66-93`` and the
  ``nn.init.kaiming_uniform_(w, a=1)`` calls in ``resnet.py``.
* ``avg_pool_temporal`` / ``max_pool_temporal`` ←→ ``nn.AvgPool3d(3,
  stride=(2,1,1), padding=1)`` with ``count_include_pad=True`` (torch default)
  used throughout the squeeze-expand decoders
  (``embedding_decoder.py:20-60``).
* ``upsample_trilinear`` ←→ ``UpsampleTrilinear3D`` (``modeling/common.py:70-79``,
  ``align_corners=False``). ``jax.image.resize(method="linear")`` uses
  half-pixel sampling, matching torch's ``align_corners=False`` convention for
  upsampling (verified by parity test).

Layouts are channels-LAST: 2D tensors are ``[N, H, W, C]``, 3D (video) tensors
are ``[N, T, H, W, C]`` — the layouts XLA tiles best onto the TPU MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initializers replicating torch semantics
# ---------------------------------------------------------------------------

# torch nn.init.kaiming_uniform_(w, a=1): gain = sqrt(2/(1+a^2)) = 1
#   => bound = sqrt(3 / fan_in)  => variance_scaling(scale=1.0, fan_in, uniform)
kaiming_uniform_a1 = jax.nn.initializers.variance_scaling(1.0, "fan_in", "uniform")

# torch default conv init: kaiming_uniform_(w, a=sqrt(5)): gain = sqrt(1/3)
#   => bound = sqrt(1 / fan_in)  => variance_scaling(scale=1/3, fan_in, uniform)
torch_default_conv_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(kernel_shape_fn):
    """torch conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = kernel_shape_fn()
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# FrozenBatchNorm
# ---------------------------------------------------------------------------


class FrozenBatchNorm(nn.Module):
    """Per-channel fixed affine: ``x * scale + shift`` where
    ``scale = weight * rsqrt(running_var + eps)`` and
    ``shift = bias - running_mean * scale``.

    The four buffers live in the non-trainable ``constants`` collection so
    they can never receive gradients, matching the reference where they are
    registered buffers (``make_layers.py:44-48``). ``epsilon=0`` matches the
    reference default.
    """

    features: int
    epsilon: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        weight = self.variable("constants", "weight", jnp.ones, (self.features,)).value
        bias = self.variable("constants", "bias", jnp.zeros, (self.features,)).value
        running_mean = self.variable("constants", "running_mean", jnp.zeros, (self.features,)).value
        running_var = self.variable("constants", "running_var", jnp.ones, (self.features,)).value

        scale = weight * jax.lax.rsqrt(running_var + self.epsilon)
        shift = bias - running_mean * scale
        dtype = self.dtype or x.dtype
        return x * scale.astype(dtype) + shift.astype(dtype)


# ---------------------------------------------------------------------------
# Conv wrappers (channels-last)
# ---------------------------------------------------------------------------


class Conv(nn.Module):
    """N-d conv with torch-compatible default init and explicit padding.

    ``kernel_size``/``strides``/``dilation`` are tuples whose length selects
    2D vs 3D. Padding is symmetric ints per spatial dim (torch-style).
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Optional[Tuple[int, ...]] = None
    padding: Optional[Tuple[int, ...]] = None
    dilation: Optional[Tuple[int, ...]] = None
    groups: int = 1
    use_bias: bool = True
    kernel_init: str = "torch_default"  # or "kaiming_a1"
    zero_bias: bool = False  # reference's make_conv zeroes bias (make_layers.py:84)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel_size)
        strides = self.strides or (1,) * nd
        dilation = self.dilation or (1,) * nd
        if self.padding is None:
            padding = tuple(d * (k - 1) // 2 for k, d in zip(self.kernel_size, dilation))
        else:
            padding = self.padding
        pad = [(p, p) for p in padding]

        kernel_init = kaiming_uniform_a1 if self.kernel_init == "kaiming_a1" else torch_default_conv_init

        in_features = x.shape[-1]
        fan_in = (in_features // self.groups) * int(np.prod(self.kernel_size))

        conv = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=strides,
            padding=pad,
            kernel_dilation=dilation,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=(jax.nn.initializers.zeros if self.zero_bias
                       else torch_default_bias_init(lambda: fan_in)),
            dtype=self.dtype,
            name="conv",
        )
        return conv(x)


class GroupNorm(nn.Module):
    """GroupNorm matching ``torch.nn.GroupNorm(num_groups, C)`` (eps 1e-5)."""

    num_groups: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # flax GroupNorm normalizes over groups of the last dim + all
        # spatial dims, same reduction set as torch for channels-last input.
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                            dtype=self.dtype, name="gn")(x)


# ---------------------------------------------------------------------------
# Pooling (video tensors [N, T, H, W, C])
# ---------------------------------------------------------------------------


def _pool_separable(x: jnp.ndarray, window, strides, padding, init, op):
    """Sequential 1-D ``reduce_window`` per non-unit spatial axis.

    Mathematically identical to the joint N-D window for both monoids used
    here — sum (zero padding contributes zero to every pass) and max — but
    ~5x faster on TPU: the joint 27-tap window lowers to 27 shifted adds of
    the full tensor, the separable form to 3+3+3 (measured 4.4 ms -> 0.9 ms
    at [1,8,60,108,128] on v5e). Spatial axes are ``x.shape[1:-1]``.
    """
    nsp = x.ndim - 2
    for axis in range(nsp):
        if window[axis] == 1 and strides[axis] == 1 and padding[axis] == 0:
            continue
        dims = [1] * x.ndim
        dims[1 + axis] = window[axis]
        st = [1] * x.ndim
        st[1 + axis] = strides[axis]
        pad = [(0, 0)] * x.ndim
        pad[1 + axis] = (padding[axis], padding[axis])
        # init value must be a literal (not a traced array) for JAX to
        # recognize the monoid and support reverse-mode autodiff
        x = jax.lax.reduce_window(x, init, op, tuple(dims), tuple(st),
                                  tuple(pad))
    return x


def avg_pool_3d(x: jnp.ndarray, window: Tuple[int, int, int],
                strides: Tuple[int, int, int], padding: Tuple[int, int, int]) -> jnp.ndarray:
    """AvgPool3d with ``count_include_pad=True`` (torch default): the divisor
    is the full window size, padded zeros included.
    ``x``: [N, T, H, W, C]."""
    summed = _pool_separable(x, window, strides, padding, 0.0, jax.lax.add)
    return summed / float(np.prod(window))


def max_pool_3d(x: jnp.ndarray, window: Tuple[int, int, int],
                strides: Tuple[int, int, int], padding: Tuple[int, int, int]) -> jnp.ndarray:
    return _pool_separable(x, window, strides, padding, -np.inf, jax.lax.max)


def max_pool_2d(x: jnp.ndarray, window: Tuple[int, int],
                strides: Tuple[int, int], padding: Tuple[int, int]) -> jnp.ndarray:
    """MaxPool2d for [N, H, W, C] (backbone stem, ``resnet.py:301``)."""
    return _pool_separable(x, window, strides, padding, -np.inf, jax.lax.max)


# ---------------------------------------------------------------------------
# Resizing (half-pixel / align_corners=False convention)
# ---------------------------------------------------------------------------


def upsample_trilinear(x: jnp.ndarray, scale_factor: Tuple[float, float, float]) -> jnp.ndarray:
    """Trilinear upsample of [N, T, H, W, C] over (T, H, W).

    Matches torch ``F.interpolate(mode='trilinear', align_corners=False)``:
    output size = floor(in * scale); half-pixel source sampling.
    """
    n, t, h, w, c = x.shape
    out = (n, int(t * scale_factor[0]), int(h * scale_factor[1]), int(w * scale_factor[2]), c)
    return jax.image.resize(x, out, method="linear", antialias=False)


def upsample_bilinear(x: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Bilinear upsample of [N, H, W, C] (FPN top-down path, ``fpn.py:64``)."""
    n, h, w, c = x.shape
    out = (n, int(h * scale_factor), int(w * scale_factor), c)
    return jax.image.resize(x, out, method="linear", antialias=False)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of trailing-2-spatial-dims tensors [..., H, W, C] to
    exact (H', W'), half-pixel convention. NOTE: torch's *downsampling*
    ``F.interpolate(align_corners=False)`` does NOT antialias, so neither do
    we (antialias=False) — required for mask-downscale parity
    (``model_builder.py:139-147``)."""
    shape = x.shape[:-3] + (out_hw[0], out_hw[1]) + x.shape[-1:]
    return jax.image.resize(x, shape, method="linear", antialias=False)
