"""Frame loading / preprocessing for inference, with background prefetch.

Behavioral reference:
``/root/reference/stemseg/data/inference_image_loader.py`` (cv2 read ->
resize to (MIN_DIM, MAX_DIM) policy -> normalize) plus the reference's
DataLoader worker pool (``modeling/inference_model.py:76-78``). Here a small
thread pool prefetches and preprocesses frames ahead of the device (cv2
releases the GIL), and frames come out channels-last, /32-padded, ready for
``InferenceEngine.infer_sequence``.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple, Union

import cv2
import numpy as np

from stemseg_tpu.config import InputConfig
from stemseg_tpu.data.transforms import scale_and_normalize_images
from stemseg_tpu.structures.geometry import compute_resize_params, pad_to_multiple


def preprocess_frame(image: Union[str, np.ndarray], input_cfg: InputConfig,
                     pad: bool = True) -> Tuple[np.ndarray, Tuple[int, int]]:
    """:return: (frame [H', W', 3] float32 normalized (+padded to /32),
    original (width, height))."""
    if isinstance(image, str):
        path = image
        image = cv2.imread(path, cv2.IMREAD_COLOR)
        if image is None:
            raise ValueError(f"No image found at path: {path}")
    h, w = image.shape[:2]
    new_w, new_h, _ = compute_resize_params((w, h), input_cfg.min_dim,
                                            input_cfg.max_dim)
    resized = cv2.resize(image.astype(np.float32), (new_w, new_h),
                         interpolation=cv2.INTER_LINEAR)
    normalized = scale_and_normalize_images(
        resized[None], input_cfg.image_mean, input_cfg.image_std,
        not input_cfg.bgr_input, input_cfg.normalize_to_unit_scale)[0]
    if pad:
        ph, pw = pad_to_multiple(new_h, new_w)
        out = np.zeros((ph, pw, 3), np.float32)
        out[:new_h, :new_w] = normalized
        normalized = out
    return normalized, (w, h)


def load_sequence_frames(images: List[Union[str, np.ndarray]],
                         input_cfg: InputConfig,
                         num_workers: int = 4) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Load+preprocess a whole sequence with a thread pool.
    :return: (frames [T, Hp, Wp, 3] float32, original (width, height))"""
    if num_workers > 1 and len(images) > 1:
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            results = list(pool.map(lambda im: preprocess_frame(im, input_cfg), images))
    else:
        results = [preprocess_frame(im, input_cfg) for im in images]
    frames = np.stack([r[0] for r in results])
    return frames, results[0][1]
