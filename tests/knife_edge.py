"""Shared knife-edge proof helpers for output-artifact golden diffs.

Used by ``test_writer_golden_diff.py`` (reference writers on identical
synthetic label volumes) and ``test_composed_e2e.py`` (full composed
pipelines on identical weights/frames, after the pre-writer label volumes
are proven EXACTLY equal).

Contract: final artifacts must agree byte-for-byte EXCEPT pixels whose
bilinear pre-threshold value sits exactly on the 0.5 threshold
("knife-edge") — there, torch's and XLA's last-ULP rounding legitimately
differ (measured: torch 0.5000001 vs jax 0.5000000 on an exact-0.5 pixel).
Every disagreeing pixel must be PROVEN knife-edge via the pre-threshold
float map (``mask_resize_floats``), and the budget is an ABSOLUTE pixel
count per map. Geometries whose final resize is the identity only go
through the exact-arithmetic x4 upsample (1/8-multiple weights, exact in
fp32), so there the budget is 0 — byte-identical output.
"""

import numpy as np

KNIFE_EPS = 3e-6
# absolute knife-edge pixels allowed per compared map (typical case: 0)
PIXEL_BUDGET_ABS = 8


def instance_float_maps(labels_t, kept, image_dims, min_dim, max_dim):
    """Pre-threshold float maps [K, H, W] for frame ``labels_t``."""
    from stemseg_tpu.inference.output_utils.common import mask_resize_floats

    onehot = (labels_t[None] == np.asarray(kept).reshape(-1, 1, 1))
    return mask_resize_floats(onehot.astype(np.float32), 4, image_dims,
                              min_dim, max_dim)


def assert_equal_mod_knife_edge(ref_map, our_map, floats, involved_fn, name,
                                budget=PIXEL_BUDGET_ABS):
    """ref/our maps must agree except at pixels where one of the involved
    instances' float values is exactly on the 0.5 threshold.

    :param floats: [K, H, W] pre-threshold float maps of the kept instances
    :param involved_fn: (ref_val, our_val) -> iterable of kept-instance
        INDICES (0-based) whose threshold decision could explain the pixel
    :param budget: ABSOLUTE number of knife-edge pixels tolerated in this
        map; 0 for identity-resize geometries (exact arithmetic end-to-end)
    :return: number of knife-edge pixels
    """
    mism = np.nonzero(ref_map != our_map)
    n_bad = len(mism[0])
    if n_bad == 0:
        return 0
    assert n_bad <= budget, \
        f"{name}: {n_bad} mismatched pixels exceeds the knife-edge budget {budget}"
    for y, x in zip(*mism):
        cands = list(involved_fn(ref_map[y, x], our_map[y, x]))
        assert cands and any(
            abs(float(floats[k, y, x]) - 0.5) < KNIFE_EPS for k in cands), (
            f"{name}: genuine mismatch at ({y},{x}): ref={ref_map[y, x]} "
            f"ours={our_map[y, x]} floats="
            f"{[float(floats[k, y, x]) for k in cands]}")
    return n_bad
