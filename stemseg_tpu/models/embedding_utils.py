"""Embedding dimension modes and the fixed spatio-temporal coordinate grid.

Reference: ``/root/reference/stemseg/modeling/embedding_utils.py``. Pure jnp
functions — the grid is a compile-time constant for a fixed (T, H, W), so XLA
folds it into the graph.

Channel order convention (matches the reference, ``embedding_utils.py:44-121``):
for mode "xyt" the embedding channels are offset by (t, y, x) in that order;
free dims always receive zero offset.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_MODE_EMB_DIMS = {
    "xy": 2, "ff": 2,
    "xyt": 3, "xyf": 3,
    "xytf": 4, "xyff": 4,
    "xytff": 5, "xyfff": 5,
}

_MODE_FREE_DIMS = {
    "xyf": 1, "xytf": 1,
    "xyff": 2, "xytff": 2,
    "xyfff": 3,
}


def get_nb_embedding_dims(mode: str) -> int:
    try:
        return _MODE_EMB_DIMS[mode]
    except KeyError:
        raise ValueError(f"Invalid embedding dim mode: {mode!r}")


def get_nb_free_dims(mode: str) -> int:
    return _MODE_FREE_DIMS.get(mode, 0)


def create_spatiotemporal_grid(height: int, width: int, time: int, t_scale,
                               dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aspect-normalized coordinate grids, each [T, H, W].

    x spans ±max(1, w/h), y spans ±max(1, h/w), t spans ±t_scale.
    Reference ``embedding_utils.py:28-41``.
    """
    x_abs = max(1.0, width / float(height))
    y_abs = max(1.0, height / float(width))

    x = jnp.linspace(-x_abs, x_abs, width, dtype=jnp.float32).astype(dtype)
    y = jnp.linspace(-y_abs, y_abs, height, dtype=jnp.float32).astype(dtype)
    t = (jnp.linspace(-1.0, 1.0, time, dtype=jnp.float32) * t_scale).astype(dtype)

    tg, yg, xg = jnp.meshgrid(t, y, x, indexing="ij")
    return tg, yg, xg


def add_spatiotemporal_offset(embeddings: jnp.ndarray, time_scale, mode: str) -> jnp.ndarray:
    """Add the fixed coordinate grid to the embedding channels.

    :param embeddings: [N, T, H, W, E] (channels-last; reference is NCTHW)
    :param time_scale: scalar (the decoder's ``time_scale`` buffer)
    :param mode: embedding dim mode string
    """
    n, t_len, h, w, e = embeddings.shape
    tg, yg, xg = create_spatiotemporal_grid(h, w, t_len, time_scale, embeddings.dtype)
    zeros = jnp.zeros_like(xg)

    if mode == "x":
        grid_channels = [xg]
    elif mode == "xy":
        grid_channels = [yg, xg]
    elif mode == "xyt":
        grid_channels = [tg, yg, xg]
    elif mode == "xyf":
        grid_channels = [yg, xg, zeros]
    elif mode == "ff":
        return embeddings
    elif mode == "xytf":
        grid_channels = [tg, yg, xg, zeros]
    elif mode == "xyff":
        grid_channels = [yg, xg, zeros, zeros]
    elif mode == "xytff":
        grid_channels = [tg, yg, xg, zeros, zeros]
    elif mode == "xyfff":
        grid_channels = [yg, xg, zeros, zeros, zeros]
    elif mode == "xyffff":
        grid_channels = [yg, xg, zeros, zeros, zeros, zeros]
    else:
        raise ValueError(f"Invalid embedding dim mode: {mode!r}")

    grid = jnp.stack(grid_channels, axis=-1)[None]  # [1, T, H, W, E]
    # The grid is constant (the reference detaches it); lax.stop_gradient
    # keeps that explicit even though a constant has no gradient anyway.
    return embeddings + jax.lax.stop_gradient(grid)
