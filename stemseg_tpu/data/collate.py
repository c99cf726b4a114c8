"""Batch assembly: samples -> fixed-shape device-ready arrays.

Behavioral reference: ``/root/reference/stemseg/data/common.py:77-81``
(``collate_fn``: pad images into an ImageList, pad masks to the padded
size). TPU additions: the instance axis is ALSO padded (to
``max_instances``) so the jitted train step sees one static shape, and the
padded H/W can be bucketed to caller-supplied minimum dims so XLA compiles
once per bucket rather than once per odd geometry.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from stemseg_tpu.structures.geometry import pad_to_multiple


def collate_fn(samples: List[Dict], max_instances: int = 8,
               min_dims: Optional[Tuple[int, int]] = None) -> Dict[str, np.ndarray]:
    """:param samples: list of VideoDataset/ImageClipDataset sample dicts
    :param max_instances: fixed instance-axis size (extra instances beyond
        this are dropped with a warning — the reference keeps ragged lists)
    :param min_dims: optional (H, W) lower bound for shape bucketing
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
    masks = np.zeros((n, max_instances, t, ph, pw), np.float32)
    ignore = np.zeros((n, t, ph, pw), np.float32)
    category_ids = np.zeros((n, max_instances), np.int32)
    image_sizes = []
    orig_dims = []

    for i, s in enumerate(samples):
        _, h, w, _ = s["images"].shape
        images[i, :, :h, :w] = s["images"]
        n_inst = s["masks"].shape[0]
        if n_inst > max_instances:
            print(f"[collate] WARN: sample has {n_inst} instances; keeping "
                  f"first {max_instances}")
            n_inst = max_instances
        masks[i, :n_inst, :, :h, :w] = s["masks"][:n_inst]
        ignore[i, :, :h, :w] = s["ignore_masks"]
        category_ids[i, :n_inst] = s["category_ids"][:n_inst]
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
