"""Parsers for the project-standard video / image dataset JSON formats.

Behavioral reference:
``/root/reference/stemseg/data/generic_video_dataset_parser.py`` and
``generic_image_dataset_parser.py``. Same JSON contracts:

* video: ``{meta: {category_labels}, sequences: [{id, height, width,
  image_paths, categories: {iid: cat}, segmentations: [ {iid: rle_str} per
  frame ]}]}``;
* image: ``{meta, images: [{image_path, height, width, categories,
  segmentations, ignore?}]}``.

RLE mask strings decode through our pycocotools-compatible codec
(``stemseg_tpu/utils/rle.py``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from stemseg_tpu.utils import rle as rle_codec


def parse_generic_video_dataset(base_dir: str, dataset_json: str):
    with open(dataset_json, "r") as fh:
        dataset = json.load(fh)

    meta_info = dataset["meta"]
    meta_info["category_labels"] = {
        int(k): v for k, v in meta_info["category_labels"].items()}

    if dataset["sequences"] and "segmentations" in dataset["sequences"][0]:
        for seq in dataset["sequences"]:
            seq["categories"] = {int(iid): cat for iid, cat in seq["categories"].items()}
            seq["segmentations"] = [
                {int(iid): seg for iid, seg in seg_t.items()}
                for seg_t in seq["segmentations"]
            ]
            seg_iids = set().union(*[set(s.keys()) for s in seq["segmentations"]]) \
                if seq["segmentations"] else set()
            assert seg_iids == set(seq["categories"].keys()), (
                f"Instance ID mismatch: {seg_iids} vs {set(seq['categories'].keys())}")

    seqs = [GenericVideoSequence(seq, base_dir) for seq in dataset["sequences"]]
    return seqs, meta_info


class GenericVideoSequence:
    def __init__(self, seq_dict: Dict, base_dir: str):
        self.base_dir = base_dir
        self.image_paths: List[str] = seq_dict["image_paths"]
        self.image_dims: Tuple[int, int] = (seq_dict["height"], seq_dict["width"])
        self.id = seq_dict["id"]
        self.segmentations = seq_dict.get("segmentations", None)
        self.instance_categories: Optional[Dict[int, int]] = seq_dict.get("categories", None)

    @property
    def instance_ids(self) -> List[int]:
        return list(self.instance_categories.keys())

    @property
    def category_labels(self) -> List[int]:
        return [self.instance_categories[iid] for iid in self.instance_ids]

    def __len__(self):
        return len(self.image_paths)

    def load_images(self, frame_idxes=None) -> List[np.ndarray]:
        if frame_idxes is None:
            frame_idxes = range(len(self.image_paths))
        images = []
        for t in frame_idxes:
            path = os.path.join(self.base_dir, self.image_paths[t])
            im = cv2.imread(path, cv2.IMREAD_COLOR)
            if im is None:
                raise ValueError(f"No image found at path: {path}")
            images.append(im)
        return images

    def load_masks(self, frame_idxes=None) -> List[List[np.ndarray]]:
        """:return: list over frames of list over instances of [H, W] uint8."""
        if frame_idxes is None:
            frame_idxes = range(len(self.image_paths))
        masks = []
        for t in frame_idxes:
            masks_t = []
            for iid in self.instance_ids:
                if iid in self.segmentations[t]:
                    masks_t.append(rle_codec.decode({
                        "counts": self.segmentations[t][iid].encode("utf-8"),
                        "size": self.image_dims,
                    }))
                else:
                    masks_t.append(np.zeros(self.image_dims, np.uint8))
            masks.append(masks_t)
        return masks

    def filter_categories(self, cat_ids_to_keep):
        keep = sorted(iid for iid, cat in self.instance_categories.items()
                      if cat in cat_ids_to_keep)
        for t in range(len(self)):
            self.segmentations[t] = {iid: seg for iid, seg in self.segmentations[t].items()
                                     if iid in keep}
        self.instance_categories = {iid: self.instance_categories[iid] for iid in keep}

    def filter_zero_instance_frames(self):
        t_keep = [t for t in range(len(self)) if self.segmentations[t]]
        self.image_paths = [self.image_paths[t] for t in t_keep]
        self.segmentations = [self.segmentations[t] for t in t_keep]

    def apply_category_id_mapping(self, mapping: Dict[int, int]):
        assert set(mapping.keys()) == set(self.instance_categories.keys())
        self.instance_categories = {
            iid: mapping[cat] for iid, cat in self.instance_categories.items()}

    def extract_subsequence(self, frame_idxes, new_id="") -> "GenericVideoSequence":
        assert all(t in range(len(self)) for t in frame_idxes)
        keep_iids = set().union(*[set(self.segmentations[t].keys()) for t in frame_idxes])
        subseq_dict = {
            "id": new_id if new_id else self.id,
            "height": self.image_dims[0],
            "width": self.image_dims[1],
            "image_paths": [self.image_paths[t] for t in frame_idxes],
            "categories": {iid: self.instance_categories[iid] for iid in keep_iids},
            "segmentations": [
                {iid: seg_t[iid] for iid in seg_t if iid in keep_iids}
                for t, seg_t in enumerate(self.segmentations) if t in frame_idxes
            ],
        }
        return self.__class__(subseq_dict, self.base_dir)


def parse_generic_image_dataset(base_dir: str, dataset_json: str):
    with open(dataset_json, "r") as fh:
        dataset = json.load(fh)

    meta_info = dataset["meta"]
    meta_info["category_labels"] = {
        int(k): v for k, v in meta_info["category_labels"].items()}
    samples = [GenericImageSample(base_dir, s) for s in dataset["images"]]
    return samples, meta_info


class GenericImageSample:
    def __init__(self, base_dir: str, sample: Dict):
        self.height = sample["height"]
        self.width = sample["width"]
        self.path = os.path.join(base_dir, sample["image_path"])
        self.categories = [int(c) for c in sample["categories"]]
        self.segmentations = sample["segmentations"]
        self.ignore = sample.get("ignore", None)

    def mask_areas(self) -> List[int]:
        return [rle_codec.area({"size": (self.height, self.width),
                                "counts": seg.encode("utf-8")})
                for seg in self.segmentations]

    def load_image(self) -> np.ndarray:
        im = cv2.imread(self.path, cv2.IMREAD_COLOR)
        if im is None:
            raise ValueError(f"No image found at path: {self.path}")
        return im

    def load_ignore_mask(self) -> Optional[np.ndarray]:
        if self.ignore is None:
            return None
        return rle_codec.decode({"size": (self.height, self.width),
                                 "counts": self.ignore.encode("utf-8")})

    def load_masks(self) -> List[np.ndarray]:
        return [rle_codec.decode({"size": (self.height, self.width),
                                  "counts": seg.encode("utf-8")})
                for seg in self.segmentations]

    def filter_categories(self, cat_ids_to_keep):
        kept = [(cat, seg) for cat, seg in zip(self.categories, self.segmentations)
                if cat in cat_ids_to_keep]
        self.categories = [c for c, _ in kept]
        self.segmentations = [s for _, s in kept]
