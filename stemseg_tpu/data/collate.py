"""Batch assembly: samples -> fixed-shape device-ready arrays.

Behavioral reference: ``/root/reference/stemseg/data/common.py:77-81``
(``collate_fn``: pad images into an ImageList, pad masks to the padded
size). TPU additions: the instance axis is ALSO padded (to
``max_instances``) so the jitted train step sees one static shape, and the
padded H/W can be bucketed to caller-supplied minimum dims so XLA compiles
once per bucket rather than once per odd geometry.

Masks ship as uint8 (cast to float32 on device by the train step) — a 4x
H2D bandwidth cut over float32 through the axon tunnel.

Instance overflow (the reference keeps ragged lists and never caps):
``overflow="ignore"`` keeps the largest-area instances and folds the rest
into the ignore mask — the same policy Mapillary applies beyond its top-30
(reference ``mapillary_data_loader.py:76-103``) — so overflowed pixels are
excluded from the loss rather than punished as background.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from stemseg_tpu.structures.geometry import pad_to_multiple


def _select_instances(masks: np.ndarray, category_ids: np.ndarray,
                      max_instances: int, overflow: str):
    """Apply the overflow policy; returns (masks, category_ids,
    overflow_mask or None) with at most ``max_instances`` instances."""
    n_inst = masks.shape[0]
    if n_inst <= max_instances:
        return masks, category_ids, None
    if overflow == "error":
        raise ValueError(
            f"sample has {n_inst} instances > max_instances={max_instances} "
            f"(set training.max_instances or instance_overflow)")
    if overflow == "drop":
        return masks[:max_instances], category_ids[:max_instances], None
    if overflow == "ignore":
        areas = masks.reshape(n_inst, -1).sum(axis=1)
        order = np.argsort(-areas, kind="stable")
        keep, spill = order[:max_instances], order[max_instances:]
        keep = np.sort(keep)  # preserve original relative order
        overflow_mask = (masks[spill].sum(axis=0) > 0).astype(np.uint8)
        return masks[keep], category_ids[keep], overflow_mask
    raise ValueError(f"unknown instance_overflow policy {overflow!r}")


def collate_fn(samples: List[Dict], max_instances: int = 8,
               min_dims: Optional[Tuple[int, int]] = None,
               overflow: str = "ignore") -> Dict[str, np.ndarray]:
    """:param samples: list of VideoDataset/ImageClipDataset sample dicts
    :param max_instances: fixed instance-axis size
    :param min_dims: optional (H, W) lower bound for shape bucketing
    :param overflow: "ignore" | "drop" | "error" — policy for samples with
        more than ``max_instances`` instances
    :return: batch dict matching the train-step contract (step.py)
    """
    n = len(samples)
    t = samples[0]["images"].shape[0]
    max_h = max(s["images"].shape[1] for s in samples)
    max_w = max(s["images"].shape[2] for s in samples)
    if min_dims is not None:
        max_h, max_w = max(max_h, min_dims[0]), max(max_w, min_dims[1])
    ph, pw = pad_to_multiple(max_h, max_w)

    images = np.zeros((n, t, ph, pw, 3), np.float32)
    masks = np.zeros((n, max_instances, t, ph, pw), np.uint8)
    ignore = np.zeros((n, t, ph, pw), np.uint8)
    category_ids = np.zeros((n, max_instances), np.int32)
    image_sizes = []
    orig_dims = []

    for i, s in enumerate(samples):
        _, h, w, _ = s["images"].shape
        images[i, :, :h, :w] = s["images"]
        s_masks, s_cats, spill = _select_instances(
            np.asarray(s["masks"]), np.asarray(s["category_ids"]),
            max_instances, overflow)
        n_inst = s_masks.shape[0]
        masks[i, :n_inst, :, :h, :w] = s_masks
        ignore[i, :, :h, :w] = s["ignore_masks"]
        if spill is not None:
            ignore[i, :, :h, :w] |= spill.astype(np.uint8)
        category_ids[i, :n_inst] = s_cats
        image_sizes.append((h, w))
        orig_dims.append(s["orig_dims"])

    return {
        "images": images,
        "masks": masks,
        "ignore_masks": ignore,
        "category_ids": category_ids,
        "image_sizes": image_sizes,
        "orig_dims": orig_dims,
    }
