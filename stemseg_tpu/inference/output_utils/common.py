"""Shared output-geometry helpers.

The un-pad/resize chain must be an exact replica of the reference because it
determines final mask geometry (SURVEY.md §7 "hard parts" #1):

1. upsample the 4x-scale masks to network input size (bilinear,
   align_corners=False) — skipped when inputs were already upscaled;
2. crop the /32 zero padding (crop to ``compute_resize_params`` dims);
3. bilinear-resize to the original image dims and threshold at 0.5.

Reference: ``output_utils/davis.py:87-107`` (same chain in youtube_vis.py
and kitti_mots.py).

The chain runs as one jitted device function per (K, h, w) shape —
per-frame one-hot mask stacks stay on device until RLE/PNG encode.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from stemseg_tpu.structures.geometry import compute_resize_params


def _mask_float_chain(masks: jnp.ndarray, mask_scale: int,
                      resized_hw: Tuple[int, int],
                      image_hw: Tuple[int, int],
                      upscaled_inputs: bool) -> jnp.ndarray:
    """The production resize chain BEFORE the 0.5 threshold — the single
    source of truth shared by the writers (thresholded) and the golden-diff
    tests (float, to prove disagreements are knife-edge)."""
    k, h, w = masks.shape
    x = masks.astype(jnp.float32)
    if not upscaled_inputs:
        x = jax.image.resize(x, (k, h * mask_scale, w * mask_scale),
                             method="linear", antialias=False)
    x = x[:, :resized_hw[0], :resized_hw[1]]
    x = jax.image.resize(x, (k,) + tuple(image_hw), method="linear",
                         antialias=False)
    return x


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _masks_to_original_dims(masks: jnp.ndarray, mask_scale: int,
                            resized_hw: Tuple[int, int],
                            image_hw: Tuple[int, int],
                            upscaled_inputs: bool) -> jnp.ndarray:
    return _mask_float_chain(masks, mask_scale, resized_hw, image_hw,
                             upscaled_inputs) > 0.5


def masks_to_original_dims(masks, mask_scale: int, image_dims: Tuple[int, int],
                           min_dim: int, max_dim: int,
                           upscaled_inputs: bool = False) -> jnp.ndarray:
    """[K, h, w] mask stack at network-output scale -> [K, H_img, W_img] bool.

    :param image_dims: original (height, width)
    """
    image_height, image_width = image_dims
    resized_w, resized_h, _ = compute_resize_params((image_width, image_height),
                                                    min_dim, max_dim)
    padded_h = masks.shape[1] * (1 if upscaled_inputs else mask_scale)
    padded_w = masks.shape[2] * (1 if upscaled_inputs else mask_scale)
    assert padded_h >= resized_h and padded_w >= resized_w, (
        f"network dims without padding ({resized_h},{resized_w}) should be <= "
        f"padded dims ({padded_h},{padded_w})")
    return _masks_to_original_dims(jnp.asarray(masks), mask_scale,
                                   (resized_h, resized_w),
                                   (image_height, image_width),
                                   upscaled_inputs)


def mask_resize_floats(masks, mask_scale: int, image_dims: Tuple[int, int],
                       min_dim: int, max_dim: int,
                       upscaled_inputs: bool = False) -> np.ndarray:
    """The PRE-threshold float maps of ``masks_to_original_dims`` — used by
    the golden-diff tests to prove that any pixel disagreeing with the
    reference sits exactly on the 0.5 knife edge (where torch's and XLA's
    last-ULP rounding legitimately differ)."""
    image_height, image_width = image_dims
    resized_w, resized_h, _ = compute_resize_params((image_width, image_height),
                                                    min_dim, max_dim)
    return np.asarray(_mask_float_chain(
        jnp.asarray(masks), mask_scale, (resized_h, resized_w),
        (image_height, image_width), upscaled_inputs))


def select_instances_to_keep(instance_lifetimes: Dict[int, int],
                             outlier_label: int, max_tracks: int,
                             by: str = "lifetime",
                             counts: Dict[int, int] = None) -> List[int]:
    """Top-``max_tracks`` track ids. DAVIS/YT-VIS rank by lifetime
    (``davis.py:58-66``); KITTI-MOTS ranks by pixel count (``kitti_mots.py:57-62``)."""
    metric = instance_lifetimes if by == "lifetime" else counts
    kept = [iid for iid, _ in sorted(metric.items(), key=lambda x: x[1],
                                     reverse=True) if iid != outlier_label]
    return kept[:max_tracks]


def annotate_instance(image: np.ndarray, mask: np.ndarray, color,
                      text: str = None, font_size: float = 0.5) -> np.ndarray:
    """Overlay an instance mask + label text for the --save_vis path.
    Reference: ``output_utils/common.py`` (annotate_instance)."""
    from stemseg_tpu.utils.vis import overlay_mask_on_image

    image = overlay_mask_on_image(image, mask.astype(bool), mask_color=color)
    if text:
        ys, xs = np.nonzero(mask)
        if len(ys):
            org = (int(xs.min()), max(int(ys.min()) - 2, 10))
            cv2.putText(image, text, org, cv2.FONT_HERSHEY_SIMPLEX, font_size,
                        (255, 255, 255), 1, cv2.LINE_AA)
    return image
