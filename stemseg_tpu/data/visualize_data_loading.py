"""Debug CLI: render training clips / masks / semseg to image files.

Behavioral reference:
``/root/reference/stemseg/data/visualize_data_loading.py:23-138`` (which
shows cv2 windows). Headless environments are the norm on TPU pods, so this
version writes annotated JPEGs to an output directory instead:

    python -m stemseg_tpu.data.visualize_data_loading --cfg davis_1 \
        --dataset davis --num_samples 4 -o /tmp/vis

One directory per sample, one JPEG per frame with instance masks (VOC
colors), the ignore mask (gray) and the per-frame semseg label map.
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from stemseg_tpu.utils.vis import create_color_map, overlay_mask_on_image


def denormalize(images: np.ndarray, mean, std, bgr_input: bool,
                unit_scale: bool) -> np.ndarray:
    """Invert ``scale_and_normalize_images`` for display."""
    out = images.copy()
    if not bgr_input:
        out = out[..., ::-1]
    out = out * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    if unit_scale:
        out = out * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


def render_sample(sample: dict, input_cfg, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    cmap = create_color_map()
    images = denormalize(sample["images"], input_cfg.image_mean,
                         input_cfg.image_std, input_cfg.bgr_input,
                         input_cfg.normalize_to_unit_scale)
    masks = sample["masks"]  # [N, T, H, W]
    ignore = sample["ignore_masks"]

    for t in range(images.shape[0]):
        frame = images[t].copy()
        frame = overlay_mask_on_image(frame, ignore[t] > 0, mask_color=(128, 128, 128))
        for n in range(masks.shape[0]):
            frame = overlay_mask_on_image(frame, masks[n, t] > 0,
                                          mask_color=tuple(int(c) for c in cmap[n + 1]))
        cv2.imwrite(os.path.join(out_dir, f"{t:05d}.jpg"), frame)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Visualize training samples")
    parser.add_argument("--cfg", required=True, help="preset name or YAML path")
    parser.add_argument("--output_dir", "-o", required=True)
    parser.add_argument("--num_samples", type=int, default=4)
    args = parser.parse_args(argv)

    from stemseg_tpu.config import load_config, load_preset

    cfg = load_config(args.cfg) if os.path.exists(args.cfg) else load_preset(args.cfg)

    from stemseg_tpu.training.datasets import create_training_dataset

    dataset = create_training_dataset(cfg, args.num_samples)
    for i in range(args.num_samples):
        sample = dataset[i]
        render_sample(sample, cfg.input, os.path.join(args.output_dir, f"sample_{i:03d}"))
        print(f"sample {i}: images {sample['images'].shape}, "
              f"{sample['masks'].shape[0]} instances")
    print(f"Wrote visualizations to {args.output_dir}")


if __name__ == "__main__":
    main()
