"""Video training datasets: DAVIS, YouTube-VIS, KITTI-MOTS.

Behavioral reference: ``/root/reference/stemseg/data/davis_data_loader.py``,
``youtube_vis_data_loader.py``, ``mots_data_loader.py``. The subsequence
sampling logic (identical across all three in the reference) lives in
``VideoDataset.create_training_subsequences``.
"""

from __future__ import annotations

from typing import List

import numpy as np

from stemseg_tpu.config import InputConfig
from stemseg_tpu.data.instance_duplicator import InstanceDuplicator
from stemseg_tpu.data.video_dataset import VideoDataset


class DavisDataLoader(VideoDataset):
    """DAVIS'17 clips; category-agnostic (all instances 'object'); optional
    single-instance copy-paste duplication; background-as-ignore.
    Reference ``davis_data_loader.py:11-103``."""

    def __init__(self, base_dir, vds_json_file, input_cfg: InputConfig,
                 samples_to_create: int, frame_gap_lower: int = 16,
                 frame_gap_upper: int = 16, apply_augmentation: bool = False,
                 single_instance_duplication: bool = False,
                 background_as_ignore_region: bool = True):
        super().__init__(base_dir, vds_json_file, input_cfg.num_frames,
                         apply_augmentation, input_cfg)
        self.filter_zero_instance_frames()
        self.samples = self.create_training_subsequences(
            samples_to_create, frame_gap_lower, frame_gap_upper)
        self.instance_duplicator = InstanceDuplicator()
        self.single_instance_duplication = single_instance_duplication
        self.background_as_ignore_region = background_as_ignore_region

    def parse_sample_at(self, idx):
        sample = self.samples[idx]
        images = sample.load_images()
        masks = sample.load_masks()  # list(T, list(N))

        if len(sample.instance_ids) == 1 and self.single_instance_duplication:
            flat = [m[0] for m in masks]
            aug_images, aug_masks = self.instance_duplicator(images, flat)
            if aug_images is not None:
                images = aug_images
                masks = [list(pair) for pair in zip(*aug_masks)]  # N-major -> T-major

        if self.background_as_ignore_region:
            ignore_masks = [(~np.any(np.stack(mt), axis=0)).astype(np.uint8)
                            for mt in masks]
        else:
            ignore_masks = [np.zeros_like(masks[0][0]) for _ in masks]

        categories = [1] * len(masks[0])
        return images, masks, categories, {
            "ignore_masks": ignore_masks, "seq_name": sample.id}

    def __len__(self):
        return len(self.samples)


class YoutubeVISDataLoader(VideoDataset):
    """YouTube-VIS clips; category-agnostic for DAVIS-mode training or
    40-class; optional single-instance duplication.
    Reference ``youtube_vis_data_loader.py:11-103``."""

    def __init__(self, base_dir, vds_json_file, input_cfg: InputConfig,
                 samples_to_create: int, frame_gap_lower: int = 8,
                 frame_gap_upper: int = 8, apply_augmentation: bool = False,
                 category_agnostic: bool = True,
                 single_instance_duplication: bool = False):
        super().__init__(base_dir, vds_json_file, input_cfg.num_frames,
                         apply_augmentation, input_cfg)
        self.filter_zero_instance_frames()
        self.category_agnostic = category_agnostic
        assert samples_to_create > 0
        self.samples = self.create_training_subsequences(
            samples_to_create, frame_gap_lower, frame_gap_upper)
        self.instance_duplicator = InstanceDuplicator()
        self.single_instance_duplication = single_instance_duplication

    def parse_sample_at(self, idx):
        sample = self.samples[idx]
        images = sample.load_images()
        masks = sample.load_masks()

        if self.category_agnostic:
            categories = [1] * len(sample.instance_ids)
        else:
            categories = list(sample.category_labels)

        if len(sample.instance_ids) == 1 and self.single_instance_duplication:
            flat = [m[0] for m in masks]
            aug_images, aug_masks = self.instance_duplicator(images, flat)
            if aug_images is not None:
                images = aug_images
                masks = [list(pair) for pair in zip(*aug_masks)]
                categories.append(categories[-1])

        h, w = images[0].shape[:2]
        ignore_masks = [np.zeros((h, w), np.uint8) for _ in range(self.clip_length)]
        return images, masks, categories, {
            "ignore_masks": ignore_masks, "seq_name": sample.id}

    def __len__(self):
        return len(self.samples)


class MOTSDataLoader(VideoDataset):
    """KITTI-MOTS clips. Sequences are split at >5-frame gaps of zero
    car/pedestrian instances; category 3 annotations become the ignore mask.
    Reference ``mots_data_loader.py:10-136``."""

    IGNORE_MASK_CAT_ID = 3

    def __init__(self, base_dir, vds_json_file, input_cfg: InputConfig,
                 samples_to_create: int, frame_gap_lower: int = 8,
                 frame_gap_upper: int = 8, apply_augmentation: bool = False):
        super().__init__(base_dir, vds_json_file, input_cfg.num_frames,
                         apply_augmentation, input_cfg)

        split_sequences = []
        for seq in self.sequences:
            suffix = 1
            gap_len = 0
            frame_idxes: List[int] = []
            for t in range(len(seq)):
                cats_t = {seq.instance_categories[iid]
                          for iid in seq.segmentations[t].keys()}
                if not (cats_t - {self.IGNORE_MASK_CAT_ID}):
                    gap_len += 1
                    if gap_len == 6 and frame_idxes:
                        split_sequences.append(
                            seq.extract_subsequence(frame_idxes, f"{seq.id}_{suffix}"))
                        suffix += 1
                        frame_idxes = []
                else:
                    gap_len = 0
                    frame_idxes.append(t)
            if frame_idxes:
                split_sequences.append(
                    seq.extract_subsequence(frame_idxes, f"{seq.id}_{suffix}"))
        self.sequences = split_sequences

        assert samples_to_create > 0
        self.samples = self.create_training_subsequences(
            samples_to_create, frame_gap_lower, frame_gap_upper)

    def parse_sample_at(self, idx):
        sample = self.samples[idx]
        images = sample.load_images()
        masks = sample.load_masks()
        categories = list(sample.category_labels)

        if self.IGNORE_MASK_CAT_ID in categories:
            ignore_idx = categories.index(self.IGNORE_MASK_CAT_ID)
            categories.remove(self.IGNORE_MASK_CAT_ID)
            ignore_masks = [mt[ignore_idx] for mt in masks]
            other = [i for i in range(len(sample.instance_ids)) if i != ignore_idx]
            masks = [[mt[i] for i in other] for mt in masks]
        else:
            h, w = images[0].shape[:2]
            ignore_masks = [np.zeros((h, w), np.uint8) for _ in range(len(images))]

        if not masks[0]:
            raise ValueError(f"No instances exist in the masks (seq: {sample.id})")

        return images, masks, categories, {
            "ignore_masks": ignore_masks, "seq_name": sample.id}

    def __len__(self):
        return len(self.samples)
