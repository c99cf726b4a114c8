"""KITTI-MOTS output writer: official MOTS txt format + NMS postprocessing.

Behavioral reference:
``/root/reference/stemseg/inference/output_utils/kitti_mots.py``. Tracks are
ranked by pixel count (:57-62), then reordered ascending by lifetime and
remapped to ids 1..N (:67-72); per frame the per-instance masks at original
dims are flattened with overlaps resolved by per-pixel max of the ORIGINAL
global instance id (:155-162 — the comment there claims lifetime order but
the computation takes the max id; replicated as computed); each instance's
class is the pixel-majority vote of the argmax semseg over the whole track
(:113-120, :179-190); lines are ``frame_id class*1000+id class h w rle``.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from stemseg_tpu.inference.chainer import OUTLIER_LABEL
from stemseg_tpu.inference.output_utils.common import (
    masks_to_original_dims,
    select_instances_to_keep,
)
from stemseg_tpu.utils import rle as rle_codec

CATEGORIES = (1, 2)  # car, pedestrian


class KittiMOTSOutputGenerator:
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
        """:param category_masks: [T, h, w] int argmax semseg class ids"""
        image_dims = tuple(sequence.image_dims)
        t_total = track_labels.shape[0]

        kept = select_instances_to_keep(instance_lifetimes, self.outlier_label,
                                        max_tracks, by="count",
                                        counts=instance_pt_counts)
        if not kept:
            raise ValueError(f"Zero instances detected in sequence: {sequence.id}")

        # ascending lifetime order; mapped ids 1..N (kitti_mots.py:67-72)
        kept = sorted(kept, key=lambda i: instance_lifetimes[i])
        id_mapping = {iid: i for i, iid in enumerate(kept, 1)}

        category_masks = np.asarray(category_masks)
        votes = {mapped: {c: 0 for c in CATEGORIES} for mapped in id_mapping.values()}
        detections = {mapped: [] for mapped in id_mapping.values()}

        kept_arr = np.asarray(kept, np.int64).reshape(-1, 1, 1)
        for t in range(t_total):
            onehot = track_labels[t][None] == kept_arr  # [K, h, w]
            active = [i for i in range(len(kept)) if onehot[i].any()]
            if not active:
                continue

            for i in active:
                labels, counts = np.unique(category_masks[t][onehot[i]],
                                           return_counts=True)
                for lab, cnt in zip(labels.tolist(), counts.tolist()):
                    if lab != 0 and lab in votes[id_mapping[kept[i]]]:
                        votes[id_mapping[kept[i]]][lab] += cnt

            full = np.asarray(masks_to_original_dims(
                onehot, mask_scale, image_dims, min_dim, max_dim,
                self.upscaled_inputs))  # [K, H, W] bool

            # overlap resolution: per-pixel max of ORIGINAL instance id
            id_map = full.astype(np.int64) * kept_arr.reshape(-1, 1, 1)
            flat = id_map.max(axis=0)  # [H, W]

            for i in active:
                iid = kept[i]
                enc = rle_codec.encode((flat == iid).astype(np.uint8))
                detections[id_mapping[iid]].append({
                    "frame_id": t,
                    "image_height": image_dims[0],
                    "image_width": image_dims[1],
                    "mask": enc["counts"].decode("utf-8"),
                })

        self._write_sequence(sequence, detections, votes)
        return kept, {v: k for k, v in id_mapping.items()}

    def _write_sequence(self, sequence, detections, votes):
        for mapped_id, dets in detections.items():
            max_label = max(votes[mapped_id].items(), key=lambda x: x[1])[0]
            for d in dets:
                d["category_id"] = max_label

        os.makedirs(self.results_output_dir, exist_ok=True)
        path = os.path.join(self.results_output_dir, f"{int(sequence.id):04d}.txt")
        with open(path, "w") as fh:
            for mapped_id, dets in detections.items():
                for d in dets:
                    fh.write("{} {} {} {} {} {}\n".format(
                        d["frame_id"],
                        d["category_id"] * 1000 + mapped_id,
                        d["category_id"],
                        d["image_height"],
                        d["image_width"],
                        d["mask"]))

    def save(self, *args, **kwargs):
        from stemseg_tpu.inference.output_utils.kitti_mots_postprocessing import (
            postprocess_results,
        )

        print("Applying NMS to results...")
        postprocess_results(results_dir=self.results_output_dir)
