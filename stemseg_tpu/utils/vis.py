"""Pascal-VOC color map + mask overlay helpers.

Behavioral equivalent of ``/root/reference/stemseg/utils/vis.py:4-33``:
``create_color_map`` builds the standard VOC bit-interleaved palette (the
canonical indexed-PNG palette used by the DAVIS evaluation tools);
``overlay_mask_on_image`` alpha-blends a binary mask onto an image.
"""

import numpy as np


def create_color_map(N: int = 256, normalized: bool = False) -> np.ndarray:
    """Standard Pascal-VOC palette: color of index i is derived by
    bit-reversing i into the 3 color channels."""
    def bitget(byteval, idx):
        return (byteval & (1 << idx)) != 0

    dtype = np.float32 if normalized else np.uint8
    cmap = np.zeros((N, 3), dtype=dtype)
    for i in range(N):
        r = g = b = 0
        c = i
        for j in range(8):
            r = r | (bitget(c, 0) << (7 - j))
            g = g | (bitget(c, 1) << (7 - j))
            b = b | (bitget(c, 2) << (7 - j))
            c = c >> 3
        cmap[i] = np.array([r, g, b])

    return cmap / 255.0 if normalized else cmap


def overlay_mask_on_image(image: np.ndarray, mask: np.ndarray,
                          mask_opacity: float = 0.6,
                          mask_color=(0, 255, 0)) -> np.ndarray:
    """Alpha-blend a binary mask onto an HxWx3 uint8 image."""
    if mask.ndim == 3:
        assert mask.shape[2] == 1
        _mask = mask.squeeze(axis=2)
    else:
        _mask = mask
    mask_bgr = np.stack((_mask, _mask, _mask), axis=2)
    masked_image = np.where(mask_bgr > 0, np.asarray(mask_color, dtype=image.dtype), image)
    return ((mask_opacity * masked_image) + ((1. - mask_opacity) * image)).astype(np.uint8)
