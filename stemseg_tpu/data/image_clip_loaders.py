"""Image -> synthetic-clip training datasets: COCO, Pascal VOC, Mapillary.

Behavioral reference: ``/root/reference/stemseg/data/coco_data_loader.py``,
``pascal_voc_data_loader.py``, ``mapillary_data_loader.py``. One still image
plus (T-1) augmenter-perturbed copies plus a random temporal shuffle
synthesize a pseudo video (``coco_data_loader.py:89-105``); invalid
(warped-in) pixels are zeroed AFTER normalization, as there (``:115-118``).
Category tables come from ``data/metainfo/*.yaml`` (keep flags + id
remapping per target benchmark).

Sample contract matches ``VideoDataset.__getitem__``.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np
import yaml

from stemseg_tpu.config import InputConfig
from stemseg_tpu.data.augmenter import ImageToSeqAugmenter
from stemseg_tpu.data.parsers import parse_generic_image_dataset
from stemseg_tpu.data.transforms import (
    resize_images,
    resize_mask,
    scale_and_normalize_images,
)
from stemseg_tpu.structures.geometry import compute_resize_params
from stemseg_tpu.utils.constants import RepoPaths


def _load_category_table(name: str) -> Dict[int, dict]:
    with open(os.path.join(RepoPaths.dataset_meta_info_dir(), name)) as fh:
        return yaml.safe_load(fh)


class ImageClipDataset:
    """Shared image->clip synthesis pipeline."""

    def __init__(self, base_dir: str, ids_json_file: str, input_cfg: InputConfig,
                 augmenter: ImageToSeqAugmenter):
        self.samples, self.meta_info = parse_generic_image_dataset(base_dir, ids_json_file)
        self.input_cfg = input_cfg
        self.num_frames = input_cfg.num_frames
        self.augmenter = augmenter

    def __len__(self):
        return len(self.samples)

    # subclass hook -------------------------------------------------------
    def load_instances(self, sample):
        """returns (image, instance_masks list[N], category_ids list[N],
        ignore_mask [H,W] uint8 or None)"""
        raise NotImplementedError

    def __getitem__(self, index: int) -> Dict:
        sample = self.samples[index]
        image, instance_masks, category_ids, ignore_mask = self.load_instances(sample)
        image_height, image_width = image.shape[:2]
        if ignore_mask is None:
            ignore_mask = np.zeros((image_height, image_width), np.uint8)

        # random horizontal flip
        if random.random() < 0.5:
            image = np.flip(image, axis=1)
            instance_masks = [np.flip(m, axis=1) for m in instance_masks]
            ignore_mask = np.flip(ignore_mask, axis=1)

        seq_images = [np.ascontiguousarray(image)]
        seq_masks = [[np.ascontiguousarray(m) for m in instance_masks]]
        seq_ignores = [np.ascontiguousarray(ignore_mask)]
        seq_invalid = [np.zeros((image_height, image_width), bool)]

        for _ in range(self.num_frames - 1):
            concat = list(instance_masks) + [ignore_mask]
            aug_im, aug_masks, invalid = self.augmenter(
                np.ascontiguousarray(image), [np.ascontiguousarray(m) for m in concat])
            seq_images.append(aug_im)
            seq_masks.append(aug_masks[:-1])
            seq_ignores.append(aug_masks[-1])
            seq_invalid.append(invalid)

        # random temporal shuffle (coco_data_loader.py:152-160)
        perm = list(range(self.num_frames))
        random.shuffle(perm)
        seq_images = [seq_images[i] for i in perm]
        seq_masks = [seq_masks[i] for i in perm]
        seq_ignores = [seq_ignores[i] for i in perm]
        seq_invalid = [seq_invalid[i] for i in perm]

        icfg = self.input_cfg
        images = scale_and_normalize_images(
            np.stack(seq_images).astype(np.float32), icfg.image_mean,
            icfg.image_std, not icfg.bgr_input, icfg.normalize_to_unit_scale)
        # invalid points zeroed AFTER normalization (coco_data_loader.py:115-118)
        images = images * (1.0 - np.stack(seq_invalid)[..., None].astype(np.float32))

        new_w, new_h, _ = compute_resize_params((image_width, image_height),
                                                icfg.min_dim, icfg.max_dim)
        images = resize_images(images, (new_h, new_w))

        n_inst = len(seq_masks[0])
        masks_np = np.zeros((n_inst, self.num_frames, new_h, new_w), np.uint8)
        for t in range(self.num_frames):
            for n in range(n_inst):
                masks_np[n, t] = resize_mask(seq_masks[t][n], (new_h, new_w))
        ignore_np = np.stack([resize_mask(m, (new_h, new_w)) for m in seq_ignores])

        return {
            "images": np.ascontiguousarray(images, np.float32),
            "masks": masks_np,
            "ignore_masks": ignore_np,
            "category_ids": np.asarray(category_ids, np.int32),
            "orig_dims": (image_width, image_height),
            "meta": {},
        }


class CocoDataLoader(ImageClipDataset):
    """Reference ``coco_data_loader.py:18-158``."""

    def __init__(self, base_dir, ids_json_file, input_cfg: InputConfig,
                 category_agnostic: bool):
        table = _load_category_table("coco.yaml")
        if category_agnostic:  # davis
            keep = [cid for cid, a in table.items() if a["keep_davis"]]
            self.category_id_mapping = {cid: 1 for cid in keep}
        else:  # youtube-vis
            keep = [cid for cid, a in table.items() if a["keep_ytvis"]]
            self.category_id_mapping = {cid: table[cid]["id_ytvis"] for cid in keep}

        augmenter = ImageToSeqAugmenter(
            perspective=True, affine=True, motion_blur=True,
            rotation_range=(-12, 12), perspective_magnitude=0.08,
            hue_saturation_range=(-5, 5), brightness_range=(-40, 40),
            motion_blur_prob=0.25, motion_blur_kernel_sizes=(9, 11),
            translate_range=(-0.1, 0.1))
        super().__init__(base_dir, ids_json_file, input_cfg, augmenter)

        for s in self.samples:
            s.filter_categories(keep)
        self.samples = [s for s in self.samples if len(s.segmentations) > 0]

    def load_instances(self, sample):
        cats = [self.category_id_mapping[c] for c in sample.categories]
        return sample.load_image(), sample.load_masks(), cats, None


class PascalVOCDataLoader(ImageClipDataset):
    """Reference ``pascal_voc_data_loader.py:18-180``: min-area filter +
    explicit ignore RLE."""

    def __init__(self, base_dir, ids_json_file, input_cfg: InputConfig,
                 category_agnostic: bool, min_instance_size: int = 50):
        table = _load_category_table("pascal_voc.yaml")
        if category_agnostic:
            keep = [cid for cid, a in table.items() if a["keep_davis"]]
            self.category_id_mapping = {cid: 1 for cid in keep}
        else:
            keep = [cid for cid, a in table.items() if a["keep_ytvis"]]
            self.category_id_mapping = {cid: table[cid]["id_ytvis"] for cid in keep}

        augmenter = ImageToSeqAugmenter(
            perspective=True, affine=True, motion_blur=True,
            rotation_range=(-10, 10), perspective_magnitude=0.08,
            hue_saturation_range=(-5, 5), brightness_range=(-40, 40),
            motion_blur_prob=0.25, motion_blur_kernel_sizes=(9, 11),
            translate_range=(-0.1, 0.1))
        super().__init__(base_dir, ids_json_file, input_cfg, augmenter)

        filtered = []
        for s in self.samples:
            areas = s.mask_areas()
            keep_idx = [i for i in range(len(s.segmentations))
                        if areas[i] >= min_instance_size and s.categories[i] in keep]
            s.segmentations = [s.segmentations[i] for i in keep_idx]
            s.categories = [s.categories[i] for i in keep_idx]
            if s.segmentations:
                filtered.append(s)
        self.samples = filtered

    def load_instances(self, sample):
        cats = [self.category_id_mapping[c] for c in sample.categories]
        return sample.load_image(), sample.load_masks(), cats, sample.load_ignore_mask()


class MapillaryDataLoader(ImageClipDataset):
    """Reference ``mapillary_data_loader.py:19-202``: min-area filter, top-30
    instances kept by area, the rest plus ignore-category instances merged
    into the ignore mask; categories mapped to KITTI-MOTS ids."""

    def __init__(self, base_dir, ids_json_file, input_cfg: InputConfig,
                 min_instance_size: int = 30, max_nbr_instances: int = 30):
        table = _load_category_table("mapillary.yaml")
        self.cat_ids_to_keep = [cid for cid, a in table.items() if a["keep"]]
        self.cat_ids_to_ignore = [cid for cid, a in table.items() if a["ignore_mask"]]
        self.category_id_mapping = {cid: table[cid]["id_kittimots"]
                                    for cid in self.cat_ids_to_keep}
        self.max_nbr_instances = max_nbr_instances

        augmenter = ImageToSeqAugmenter(
            perspective=True, affine=True, motion_blur=True,
            rotation_range=(-10, 10), perspective_magnitude=0.08,
            hue_saturation_range=(-5, 5), brightness_range=(-40, 40),
            motion_blur_prob=0.0, translate_range=(-0.1, 0.1))
        super().__init__(base_dir, ids_json_file, input_cfg, augmenter)

        filtered = []
        for s in self.samples:
            areas = s.mask_areas()
            keep_idx = [i for i in range(len(s.segmentations))
                        if areas[i] >= min_instance_size]
            s.segmentations = [s.segmentations[i] for i in keep_idx]
            s.categories = [s.categories[i] for i in keep_idx]
            if not any(c in self.cat_ids_to_keep for c in s.categories):
                continue
            keep_idx = [i for i in range(len(s.segmentations))
                        if s.categories[i] in self.cat_ids_to_keep + self.cat_ids_to_ignore]
            s.segmentations = [s.segmentations[i] for i in keep_idx]
            s.categories = [s.categories[i] for i in keep_idx]
            filtered.append(s)
        self.samples = filtered

    def load_instances(self, sample):
        masks = sample.load_masks()
        areas = sample.mask_areas()

        # descending area; top max_nbr kept, rest -> ignore (":76-103")
        order = sorted(range(len(masks)), key=lambda i: areas[i], reverse=True)
        kept_masks, kept_cats, ignore_masks = [], [], []
        for rank, i in enumerate(order):
            if rank < self.max_nbr_instances and sample.categories[i] in self.cat_ids_to_keep:
                kept_masks.append(masks[i])
                kept_cats.append(self.category_id_mapping[sample.categories[i]])
            else:
                ignore_masks.append(masks[i])

        if ignore_masks:
            ignore = np.any(np.stack(ignore_masks), axis=0).astype(np.uint8)
        else:
            ignore = np.zeros_like(masks[0]) if masks else None
        return sample.load_image(), kept_masks, kept_cats, ignore
