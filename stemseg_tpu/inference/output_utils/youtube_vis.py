"""YouTube-VIS output writer: submission-format ``results.json`` + zip.

Behavioral reference:
``/root/reference/stemseg/inference/output_utils/youtube_vis.py``. Per kept
track: per-frame RLE masks at original dims, a confidence = track pixel
count / max track pixel count (:38-48), and a class = softmax of the
per-pixel-summed multiclass LOGITS over all track pixels, normalized by
track area, background channel dropped, argmax + 1 (:100-126, :167-191).
"""

from __future__ import annotations

import json
import os
from typing import Dict
from zipfile import ZIP_DEFLATED, ZipFile

import numpy as np

from stemseg_tpu.inference.chainer import OUTLIER_LABEL
from stemseg_tpu.inference.output_utils.common import (
    masks_to_original_dims,
    select_instances_to_keep,
)
from stemseg_tpu.utils import rle as rle_codec


def _softmax(x):
    e = np.exp(x - np.max(x))
    return e / e.sum()


class YoutubeVISOutputGenerator:
    def __init__(self, output_dir: str, category_names=None,
                 save_visualization: bool = False, upscaled_inputs: bool = False,
                 outlier_label: int = OUTLIER_LABEL):
        os.makedirs(output_dir, exist_ok=True)
        self.output_dir = output_dir
        self.outlier_label = outlier_label
        self.save_visualization = save_visualization
        self.upscaled_inputs = upscaled_inputs
        self.category_names = category_names or {}
        self.instances = []

    def process_sequence(self, sequence, track_labels: np.ndarray,
                         instance_pt_counts: Dict[int, int],
                         instance_lifetimes: Dict[int, int],
                         category_masks, mask_scale: int, max_tracks: int,
                         min_dim: int, max_dim: int):
        """:param category_masks: [T, h, w, C] multiclass LOGITS (channel 0 =
            background class; the fg channel was split off upstream)"""
        assert max_tracks < 256
        image_dims = tuple(sequence.image_dims)
        t_total = track_labels.shape[0]

        kept = select_instances_to_keep(instance_lifetimes, self.outlier_label,
                                        max_tracks, by="lifetime")
        if not kept:
            print(f"No instances detected for sequence {sequence.id}")
            return [], {}

        counts_kept = {i: instance_pt_counts[i] for i in kept}
        max_pts = float(max(counts_kept.values()))
        confidences = {i: c / max_pts for i, c in counts_kept.items()}

        category_masks = np.asarray(category_masks)

        label_logit_sums = {i: 0.0 for i in kept}
        areas = {i: 0.0 for i in kept}
        rle_masks = {i: [] for i in kept}

        kept_arr = np.asarray(kept, np.int32).reshape(-1, 1, 1)
        for t in range(t_total):
            onehot = track_labels[t][None] == kept_arr  # [K, h, w]
            for k, iid in enumerate(kept):
                m = onehot[k]
                areas[iid] += float(m.sum())
                # sum of per-pixel class logits, background channel dropped
                label_logit_sums[iid] = label_logit_sums[iid] + \
                    category_masks[t][m].sum(axis=0)[1:]

            full = np.asarray(masks_to_original_dims(
                onehot, mask_scale, image_dims, min_dim, max_dim,
                self.upscaled_inputs))
            for k, iid in enumerate(kept):
                enc = rle_codec.encode(full[k].astype(np.uint8))
                enc["counts"] = enc["counts"].decode("utf-8")
                rle_masks[iid].append(enc)

        for iid in kept:
            probs = _softmax(np.asarray(label_logit_sums[iid]) / max(areas[iid], 1.0))
            category_id = int(np.argmax(probs)) + 1
            self.instances.append({
                "video_id": sequence.id,
                "score": confidences[iid],
                "category_id": category_id,
                "segmentations": rle_masks[iid],
            })

        return kept, {}

    def save(self, *args, **kwargs):
        output_json_path = os.path.join(self.output_dir, "results.json")
        with open(output_json_path, "w") as fh:
            json.dump(self.instances, fh)
        with ZipFile(os.path.join(self.output_dir, "results.zip"), "w",
                     ZIP_DEFLATED) as zf:
            zf.write(output_json_path, arcname="results.json")
