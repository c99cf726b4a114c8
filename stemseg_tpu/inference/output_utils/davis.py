"""DAVIS output writer: indexed-palette PNGs in the official eval layout.

Behavioral reference: ``/root/reference/stemseg/inference/output_utils/davis.py``.
Tracks are ranked by temporal lifetime, capped at ``max_tracks``; per frame
the kept instance masks are lifted to original image dims (shared jitted
geometry chain) and condensed into one uint8 index map where LATER kept
instances overwrite earlier ones on overlap (``davis.py:108-112``), then
written as ``results/<seq>/00000.png`` with the Pascal-VOC palette.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image

from stemseg_tpu.inference.chainer import OUTLIER_LABEL
from stemseg_tpu.inference.output_utils.common import (
    masks_to_original_dims,
    select_instances_to_keep,
)
from stemseg_tpu.utils.vis import create_color_map


class DavisOutputGenerator:
    def __init__(self, output_dir: str, save_visualization: bool = False,
                 upscaled_inputs: bool = False, outlier_label: int = OUTLIER_LABEL):
        self.results_output_dir = os.path.join(output_dir, "results")
        self.vis_output_dir = os.path.join(output_dir, "vis")
        self.outlier_label = outlier_label
        self.save_visualization = save_visualization
        self.upscaled_inputs = upscaled_inputs

    def process_sequence(self, sequence, track_labels: np.ndarray,
                         instance_pt_counts: Dict[int, int],
                         instance_lifetimes: Dict[int, int],
                         category_masks, mask_scale: int, max_tracks: int,
                         min_dim: int, max_dim: int):
        """:param sequence: object with ``id``, ``image_dims`` (h, w) and
            optionally ``load_images()``
        :param track_labels: dense [T, h, w] int32 global labels (-1 outlier)
        :param category_masks: unused for DAVIS
        """
        assert max_tracks < 256
        image_dims = tuple(sequence.image_dims)

        kept = select_instances_to_keep(instance_lifetimes, self.outlier_label,
                                        max_tracks, by="lifetime")
        num_tracks = len(kept)

        cmap = create_color_map().flatten()
        kept_arr = np.asarray(kept, np.int32).reshape(-1, 1, 1) if kept else \
            np.zeros((0, 1, 1), np.int32)

        pngs = []
        for t in range(track_labels.shape[0]):
            if num_tracks:
                onehot = (track_labels[t][None] == kept_arr)  # [K, h, w]
                full = np.asarray(masks_to_original_dims(
                    onehot, mask_scale, image_dims, min_dim, max_dim,
                    self.upscaled_inputs))
                condensed = np.zeros(image_dims, np.uint8)
                for n in range(num_tracks):  # later kept ids overwrite
                    condensed[full[n]] = n + 1
            else:
                condensed = np.zeros(image_dims, np.uint8)

            img = Image.fromarray(condensed)
            img.putpalette(cmap)
            pngs.append(img)

        seq_results_dir = os.path.join(self.results_output_dir, str(sequence.id))
        os.makedirs(seq_results_dir, exist_ok=True)
        for t, img in enumerate(pngs):
            img.save(os.path.join(seq_results_dir, f"{t:05d}.png"))

        if self.save_visualization:
            self._save_visualizations(sequence, pngs)

        return kept, {}

    def _save_visualizations(self, sequence, pngs):
        import cv2

        from stemseg_tpu.utils.vis import overlay_mask_on_image

        seq_vis_dir = os.path.join(self.vis_output_dir, str(sequence.id))
        os.makedirs(seq_vis_dir, exist_ok=True)
        cmap = create_color_map()
        images = sequence.load_images()
        for t, (image, png) in enumerate(zip(images, pngs)):
            mask = np.array(png)
            for n in sorted(set(np.unique(mask)) - {0}):
                image = overlay_mask_on_image(image, mask == n, mask_color=cmap[n])
            cv2.imwrite(os.path.join(seq_vis_dir, f"{t:05d}.jpg"), image)

    def save(self, *args, **kwargs):
        pass
