"""Image -> pseudo-video augmentation pipeline (cv2-based; imgaug is not in
this image).

Behavioral equivalent of
``/root/reference/stemseg/data/image_to_seq_augmenter.py`` (which wraps
imgaug): each call applies

1. a photometric jitter to the source image — ``iaa.SomeOf((1, None))``
   semantics: n ∈ {1, 2} uniformly, that many of {brightness add,
   hue+saturation add} chosen without replacement and applied in LISTED
   order (``random_order`` defaults to False, so brightness precedes
   hue/sat whenever both fire); ``iaa.AddToHueAndSaturation`` draws ONE
   value shared by the hue and saturation channels;
2. one random geometric transform shared by image, masks and the
   validity map: optional perspective jitter matching
   ``iaa.PerspectiveTransform(scale, keep_size=True)`` — each corner moves
   INWARD by ``|N(0, scale)|``·dim and the shrunken quad is stretched back
   to the full canvas (one homography; the stretch-back composes exactly
   because a 4-point correspondence determines the homography) — composed
   with an affine (uniform scale / translate-percent / rotation);
3. optional motion blur (probability ``motion_blur_prob``, random kernel
   size from ``motion_blur_kernel_sizes``, random direction).

The match to imgaug is distributional, not bit-level (imgaug is absent from
this image): ``tests/test_augmenter_stats.py`` pins the corner-displacement
moments, affine parameter ranges, op application frequencies and
invalid-mask statistics against the imgaug model's analytic values.
Ignored imgaug detail: it caps |N| displacements via ``mod 0.32``
(P(|N(0,0.12)| > 0.32) ≈ 0.8% — negligible).

The invalid-pixel map is produced by warping an all-ones image with the SAME
geometric transform (one transform matrix — no re-seeding trick needed,
unlike the reference's imgaug workaround at ``:76-84``). Masks warp with
nearest-neighbor like imgaug segmentation maps.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np


class ImageToSeqAugmenter:
    def __init__(self, perspective: bool = True, affine: bool = True,
                 motion_blur: bool = True,
                 brightness_range: Tuple[float, float] = (-50, 50),
                 hue_saturation_range: Tuple[float, float] = (-15, 15),
                 perspective_magnitude: float = 0.12,
                 scale_range: Union[float, Tuple[float, float]] = 1.0,
                 translate_range: Union[Tuple[float, float], Dict] = None,
                 rotation_range: Tuple[float, float] = (-20, 20),
                 motion_blur_kernel_sizes: Sequence[int] = (7, 9),
                 motion_blur_prob: float = 0.5):
        self.perspective = perspective
        self.affine = affine
        self.motion_blur = motion_blur
        self.brightness_range = brightness_range
        self.hue_saturation_range = hue_saturation_range
        self.perspective_magnitude = perspective_magnitude
        self.scale_range = scale_range
        self.translate_range = translate_range if translate_range is not None \
            else {"x": (-0.15, 0.15), "y": (-0.15, 0.15)}
        self.rotation_range = rotation_range
        self.motion_blur_kernel_sizes = tuple(motion_blur_kernel_sizes)
        self.motion_blur_prob = motion_blur_prob

    # ------------------------------------------------------------------

    @staticmethod
    def _sample_photometric_ops() -> List[str]:
        # iaa.SomeOf((1, None), [...]): n uniform in {1, 2}, that many ops
        # chosen without replacement, applied in LISTED order (SomeOf's
        # default random_order=False — brightness always precedes hue/sat
        # when both are selected; they do not commute under uint8 clipping)
        ops = ["brightness", "hue_sat"]
        n = random.randint(1, 2)
        chosen = sorted(random.sample(range(len(ops)), n))
        return [ops[i] for i in chosen]

    def _photometric(self, image: np.ndarray) -> np.ndarray:
        out = image
        ops = self._sample_photometric_ops()
        for op in ops:
            if op == "brightness":
                shifted = out.astype(np.int16) + int(random.uniform(*self.brightness_range))
                out = np.clip(shifted, 0, 255).astype(np.uint8)
            else:
                # iaa.AddToHueAndSaturation draws ONE value (per_channel
                # defaults False) added to both the hue and saturation planes
                val = int(random.uniform(*self.hue_saturation_range))
                hsv = cv2.cvtColor(out, cv2.COLOR_BGR2HSV).astype(np.int16)
                hsv[..., 0] = (hsv[..., 0] + val) % 180
                hsv[..., 1] = np.clip(hsv[..., 1] + val, 0, 255)
                out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        return out

    def _sample_geometric(self, h: int, w: int) -> Optional[np.ndarray]:
        """One 3x3 homography combining perspective + affine (or None)."""
        mat = np.eye(3, dtype=np.float64)

        if self.perspective:
            # iaa.PerspectiveTransform(scale, keep_size=True): corners move
            # INWARD by |N(0, scale)|·dim; the shrunken quad is stretched
            # back over the full canvas (keep_size) — one homography mapping
            # the jittered source quad onto the full-image corners
            full = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
            jitter = np.abs(np.random.normal(
                0, self.perspective_magnitude, (4, 2))).astype(np.float32) \
                * np.float32([w, h])
            inward = np.float32([[1, 1], [-1, 1], [-1, -1], [1, -1]])
            src = full + jitter * inward
            mat = cv2.getPerspectiveTransform(src, full).astype(np.float64) @ mat

        if self.affine:
            if isinstance(self.scale_range, (tuple, list)):
                scale = random.uniform(*self.scale_range)
            else:
                scale = float(self.scale_range)
            if isinstance(self.translate_range, dict):
                tx = random.uniform(*self.translate_range["x"]) * w
                ty = random.uniform(*self.translate_range["y"]) * h
            else:
                tx = random.uniform(*self.translate_range) * w
                ty = random.uniform(*self.translate_range) * h
            angle = random.uniform(*self.rotation_range)

            center = (w / 2.0, h / 2.0)
            rot = cv2.getRotationMatrix2D(center, angle, scale)  # 2x3
            rot33 = np.vstack([rot, [0, 0, 1]])
            rot33[0, 2] += tx
            rot33[1, 2] += ty
            mat = rot33 @ mat

        if self.perspective or self.affine:
            return mat
        return None

    @staticmethod
    def _warp(image: np.ndarray, mat: np.ndarray, interp: int) -> np.ndarray:
        h, w = image.shape[:2]
        return cv2.warpPerspective(image, mat, (w, h), flags=interp,
                                   borderMode=cv2.BORDER_CONSTANT, borderValue=0)

    def _motion_blur(self, image: np.ndarray) -> np.ndarray:
        if not self.motion_blur or random.random() >= self.motion_blur_prob:
            return image
        ksize = random.choice(self.motion_blur_kernel_sizes)
        angle = random.uniform(0, 360)
        kernel = np.zeros((ksize, ksize), np.float32)
        c = (ksize - 1) / 2.0
        dx, dy = math.cos(math.radians(angle)), math.sin(math.radians(angle))
        for i in range(ksize):
            t = i - c
            x, y = int(round(c + t * dx)), int(round(c + t * dy))
            if 0 <= x < ksize and 0 <= y < ksize:
                kernel[y, x] = 1.0
        kernel /= max(kernel.sum(), 1.0)
        return cv2.filter2D(image, -1, kernel)

    # ------------------------------------------------------------------

    def __call__(self, image: np.ndarray, masks: Optional[List[np.ndarray]] = None):
        """:param image: [H, W, 3] uint8 BGR
        :param masks: optional list of [H, W] uint8/bool masks
        :return: (aug_image, aug_masks, invalid_pts_mask [H, W] bool) — or
            (aug_image, invalid_pts_mask) when masks is None
        """
        h, w = image.shape[:2]
        out = self._photometric(image)
        mat = self._sample_geometric(h, w)

        if mat is not None:
            out = self._warp(out, mat, cv2.INTER_LINEAR)
            valid = self._warp(np.ones((h, w), np.uint8), mat, cv2.INTER_NEAREST)
        else:
            valid = np.ones((h, w), np.uint8)

        out = self._motion_blur(out)
        invalid = valid == 0

        if masks is None:
            return out, invalid

        aug_masks = []
        for m in masks:
            m = np.asarray(m, np.uint8)
            aug_masks.append(self._warp(m, mat, cv2.INTER_NEAREST)
                             if mat is not None else m.copy())
        return out, aug_masks, invalid
