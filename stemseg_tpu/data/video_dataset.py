"""Base class for video datasets: subsequence sampling + augmentation +
resize + normalization.

Behavioral reference: ``/root/reference/stemseg/data/video_dataset.py``.
Everything is numpy/cv2 host-side; the sample contract is channels-last:

``{"images": [T, H, W, 3] float32 normalized (resized, unpadded),
   "masks": [N, T, H, W] uint8, "ignore_masks": [T, H, W] uint8,
   "category_ids": [N] int32, "orig_dims": (w, h), "meta": dict}``

Notes vs the reference:

* explicit config values (clip length, resize dims, normalization) are
  constructor parameters — no global ``cfg`` reads;
* ``apply_random_augmentation`` faithfully augments masks per frame (the
  reference has a latent bug appending the wrong variable,
  ``video_dataset.py:139`` — harmless there because every video loader
  passes ``apply_augmentation=False``; fixed here);
* subsequence creation (shared verbatim logic across the DAVIS / YT-VIS /
  MOTS loaders in the reference, e.g. ``davis_data_loader.py:28-71``) lives
  here once as ``create_training_subsequences``.
"""

from __future__ import annotations

import math
import random
from typing import Dict

import numpy as np

from stemseg_tpu.config import InputConfig
from stemseg_tpu.data.augmenter import ImageToSeqAugmenter
from stemseg_tpu.data.parsers import parse_generic_video_dataset
from stemseg_tpu.data.transforms import (
    resize_images,
    resize_mask,
    scale_and_normalize_images,
)
from stemseg_tpu.structures.geometry import compute_resize_params


class VideoDataset:
    def __init__(self, base_dir: str, vds_json: str, clip_length: int,
                 apply_augmentations: bool, input_cfg: InputConfig, **kwargs):
        self.sequences, self.meta_info = parse_generic_video_dataset(base_dir, vds_json)
        self.clip_length = clip_length
        self.apply_augmentations = apply_augmentations
        self.input_cfg = input_cfg

        if clip_length == 2:
            self.augmenter = ImageToSeqAugmenter(
                perspective=kwargs.get("perspective_transform", False),
                affine=kwargs.get("affine_transform", True),
                motion_blur=kwargs.get("motion_blur", True),
                motion_blur_prob=kwargs.get("motion_blur_prob", 0.3),
                motion_blur_kernel_sizes=kwargs.get("motion_blur_kernel_sizes", (5, 7)),
                scale_range=kwargs.get("scale_range", (0.8, 1.2)),
                rotation_range=kwargs.get("rotation_range", (-15, 15)))
        else:
            self.augmenter = ImageToSeqAugmenter(
                perspective=kwargs.get("perspective_transform", False),
                affine=kwargs.get("affine_transform", False),
                motion_blur=kwargs.get("motion_blur", False),
                motion_blur_prob=kwargs.get("motion_blur_prob", 0.3),
                motion_blur_kernel_sizes=kwargs.get("motion_blur_kernel_sizes", (5, 7)),
                scale_range=kwargs.get("scale_range", (0.9, 1.1)),
                rotation_range=kwargs.get("rotation_range", (-7, 7)),
                translate_range=kwargs.get("translation_range",
                                           {"x": (-0.1, 0.1), "y": (-0.1, 0.1)}))

    # -- shared sequence plumbing ------------------------------------------

    def filter_zero_instance_frames(self):
        for seq in self.sequences:
            seq.filter_zero_instance_frames()
        self.sequences = [s for s in self.sequences if len(s) > 0]

    def filter_categories(self, cat_ids_to_keep):
        for seq in self.sequences:
            seq.filter_categories(cat_ids_to_keep)
        self.sequences = [s for s in self.sequences if len(s) > 0]

    def create_training_subsequences(self, num_subsequences: int,
                                     frame_gap_lower: int, frame_gap_upper: int):
        """Linspace-sampled fixed-length subsequences with a random temporal
        span in [gap_lower, gap_upper]; per-sequence quotas proportional to
        length; excess randomly subsampled. Reference
        ``davis_data_loader.py:28-71`` (identical in ytvis/mots loaders)."""
        frame_range = list(range(frame_gap_lower, frame_gap_upper + 1))
        subseq_length = self.clip_length

        min_sequence_length = frame_range[0] + 1
        sequences = [s for s in self.sequences if len(s) > min_sequence_length]
        assert sequences, "no sequences long enough for subsequence sampling"

        total_frames = sum(len(s) for s in sequences)
        samples_per_seq = [max(1, int(math.ceil((len(s) / total_frames) * num_subsequences)))
                           for s in sequences]

        subsequence_idxes = []
        for sequence, num_samples in zip(sequences, samples_per_seq):
            for _ in range(num_samples):
                span = min(random.choice(frame_range), len(sequence) - 1)
                max_start = len(sequence) - span - 1
                assert max_start >= 0
                start = 0 if max_start == 0 else random.randint(0, max_start)
                idxes = np.round(np.linspace(start, start + span,
                                             subseq_length)).astype(np.int32).tolist()
                assert len(set(idxes)) == len(idxes)
                subsequence_idxes.append((sequence.id, idxes))

        assert len(subsequence_idxes) >= num_subsequences
        subsequence_idxes = random.sample(subsequence_idxes, num_subsequences)
        random.shuffle(subsequence_idxes)

        by_id = {s.id: s for s in sequences}
        return [by_id[vid].extract_subsequence(idxes)
                for vid, idxes in subsequence_idxes]

    # -- per-sample pipeline ------------------------------------------------

    def parse_sample_at(self, idx):
        """Subclass hook: returns (images list[T] of HxWx3 uint8,
        masks list[T] of list[N] of HxW uint8, category_ids list[N],
        meta dict with 'ignore_masks' list[T] of HxW uint8)."""
        raise NotImplementedError

    def __getitem__(self, index: int) -> Dict:
        images, masks, category_ids, meta = self.parse_sample_at(index)
        ignore_masks = meta.pop("ignore_masks")

        image_height, image_width = images[0].shape[:2]

        images, masks, ignore_masks = self._random_flip(images, masks, ignore_masks)
        images, masks, ignore_masks, invalid = self._random_augmentation(
            images, masks, ignore_masks)
        images = [np.where(invalid[t][..., None], 0, images[t])
                  for t in range(self.clip_length)]
        images, masks, ignore_masks = self._random_reversal(images, masks, ignore_masks)

        icfg = self.input_cfg
        new_w, new_h, _ = compute_resize_params((image_width, image_height),
                                                icfg.min_dim, icfg.max_dim)

        images = resize_images(np.stack(images).astype(np.float32), (new_h, new_w))
        images = scale_and_normalize_images(images, icfg.image_mean, icfg.image_std,
                                            not icfg.bgr_input,
                                            icfg.normalize_to_unit_scale)

        n_inst = len(masks[0])
        masks_np = np.zeros((n_inst, self.clip_length, new_h, new_w), np.uint8)
        for t in range(self.clip_length):
            for n in range(n_inst):
                masks_np[n, t] = resize_mask(masks[t][n], (new_h, new_w))
        ignore_np = np.stack([resize_mask(m, (new_h, new_w)) for m in ignore_masks])

        return {
            "images": np.ascontiguousarray(images, np.float32),
            "masks": masks_np,
            "ignore_masks": ignore_np,
            "category_ids": np.asarray(category_ids, np.int32),
            "orig_dims": (image_width, image_height),
            "meta": meta,
        }

    def _random_flip(self, images, masks, ignore_masks):
        if self.apply_augmentations and random.random() < 0.5:
            images = [np.flip(im, axis=1) for im in images]
            masks = [[np.flip(m, axis=1) for m in masks_t] for masks_t in masks]
            ignore_masks = [np.flip(m, axis=1) for m in ignore_masks]
        return images, masks, ignore_masks

    def _random_reversal(self, images, masks, ignore_masks):
        if self.apply_augmentations and random.random() < 0.5:
            return images[::-1], masks[::-1], ignore_masks[::-1]
        return images, masks, ignore_masks

    def _random_augmentation(self, images, masks, ignore_masks):
        if not self.apply_augmentations:
            h, w = images[0].shape[:2]
            return images, masks, ignore_masks, \
                [np.zeros((h, w), bool) for _ in range(self.clip_length)]

        out_images, out_masks, out_ignores, invalids = [], [], [], []
        for t in range(self.clip_length):
            concat = list(masks[t]) + [ignore_masks[t]]
            aug_im, aug_masks, invalid = self.augmenter(images[t], concat)
            out_images.append(aug_im)
            out_masks.append(aug_masks[:-1])
            out_ignores.append(aug_masks[-1])
            invalids.append(invalid)
        return out_images, out_masks, out_ignores, invalids
