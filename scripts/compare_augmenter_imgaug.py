#!/usr/bin/env python
"""Offline imgaug-equivalence kit for the cv2 augmenter.

``stemseg_tpu/data/augmenter.py`` replaces the reference's imgaug pipeline
(``/root/reference/stemseg/data/image_to_seq_augmenter.py:10-94``) because
imgaug is absent from the build image. Its behavior is pinned in-repo only
against an ANALYTIC model of imgaug's distributions
(``tests/test_augmenter_stats.py``) — this script closes the loop on a host
where imgaug IS installed:

    pip install imgaug opencv-python numpy   # (any imgaug >= 0.4)
    python scripts/compare_augmenter_imgaug.py

Checks (N samples per configuration, fixed seeds):

1. EXACT fixed-parameter affine: imgaug ``iaa.Affine`` with Deterministic
   scale/rotate/translate vs our homography construction, compared as the
   mapping of a keypoint grid — catches center-of-rotation / translation
   sign / op-order convention errors to sub-pixel tolerance.
2. Warp-field moments: per-grid-point mean/std of the mapped positions over
   N random draws, ours vs imgaug, for perspective-only / affine-only /
   the coco_data_loader configuration (``coco_data_loader.py:61-66``).
3. Photometric moments: per-image mean delta distributions in BGR and HSV
   space for the ``SomeOf((1, None), [Add, AddToHueAndSaturation])`` jitter.
4. Invalid-mask statistics: distribution of the invalid-pixel fraction
   produced by warping the all-ones map.
5. Mask transport: distribution of nearest-neighbor-warped mask areas.

Exit code 0 and "ALL CHECKS PASSED" when every statistic agrees within the
stated tolerances; nonzero with a per-check report otherwise.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SAMPLES = int(os.environ.get("AUG_KIT_SAMPLES", "3000"))
H, W = 240, 320
GRID = 7  # keypoint grid GRID x GRID

failures = []


def check(name, ok, detail=""):
    status = "ok  " if ok else "FAIL"
    print(f"[{status}] {name}{': ' + detail if detail else ''}")
    if not ok:
        failures.append(name)


def _grid_points():
    ys = np.linspace(0, H - 1, GRID)
    xs = np.linspace(0, W - 1, GRID)
    return np.array([(x, y) for y in ys for x in xs], np.float32)


def _apply_homography(mat, pts):
    import cv2

    return cv2.perspectiveTransform(pts.reshape(-1, 1, 2),
                                    mat.astype(np.float64)).reshape(-1, 2)


def _imgaug_pipeline(perspective, affine, **kw):
    """The reference's geometric pipeline, constructed exactly as
    ``image_to_seq_augmenter.py:22-33`` does."""
    import imgaug.augmenters as iaa

    transforms = []
    if perspective:
        transforms.append(iaa.PerspectiveTransform(
            kw.get("perspective_magnitude", 0.12)))
    if affine:
        transforms.append(iaa.Affine(
            scale=kw.get("scale_range", 1.0),
            translate_percent=kw.get("translate_range",
                                     {"x": (-0.15, 0.15), "y": (-0.15, 0.15)}),
            rotate=kw.get("rotation_range", (-20, 20)),
            order=1, backend="auto"))
    return iaa.Sequential(transforms)


def _ours(perspective, affine, **kw):
    from stemseg_tpu.data.augmenter import ImageToSeqAugmenter

    return ImageToSeqAugmenter(perspective=perspective, affine=affine,
                               motion_blur=False, **kw)


def _imgaug_warp_samples(pipeline, n, seed):
    """Mapped grid positions for n independent draws of the pipeline."""
    import imgaug
    from imgaug.augmentables.kps import Keypoint, KeypointsOnImage

    imgaug.seed(seed)
    pts = _grid_points()
    kps = KeypointsOnImage([Keypoint(x=float(x), y=float(y)) for x, y in pts],
                           shape=(H, W, 3))
    out = np.empty((n, len(pts), 2), np.float64)
    for i in range(n):
        det = pipeline.to_deterministic()
        aug = det(keypoints=kps)
        out[i] = [(kp.x, kp.y) for kp in aug.keypoints]
    return out


def _our_warp_samples(aug, n, seed):
    import random

    random.seed(seed)
    np.random.seed(seed)
    pts = _grid_points()
    out = np.empty((n, len(pts), 2), np.float64)
    for i in range(n):
        mat = aug._sample_geometric(H, W)
        out[i] = _apply_homography(mat, pts) if mat is not None else pts
    return out


def check_fixed_affine():
    """Deterministic affine params: the induced point mapping must agree to
    sub-pixel. imgaug's Affine rotates/scales about the image center and
    translates afterwards — the same composition our ``_sample_geometric``
    builds (``augmenter.py:118-136``)."""
    import imgaug.parameters as iap
    import imgaug.augmenters as iaa
    from imgaug.augmentables.kps import Keypoint, KeypointsOnImage

    from stemseg_tpu.data.augmenter import ImageToSeqAugmenter

    pts = _grid_points()
    worst = 0.0
    for scale, rot, tx, ty in [(1.0, 13.7, 0.1, -0.05),
                               (0.85, -19.0, -0.15, 0.15),
                               (1.2, 0.0, 0.0, 0.0),
                               (1.0, 0.0, 0.12, 0.03)]:
        ia_aff = iaa.Affine(scale=iap.Deterministic(scale),
                            translate_percent={"x": iap.Deterministic(tx),
                                               "y": iap.Deterministic(ty)},
                            rotate=iap.Deterministic(rot),
                            order=1, backend="auto")
        kps = KeypointsOnImage(
            [Keypoint(x=float(x), y=float(y)) for x, y in pts],
            shape=(H, W, 3))
        got_ia = np.array([(kp.x, kp.y) for kp in
                           ia_aff.to_deterministic()(keypoints=kps).keypoints])

        aug = ImageToSeqAugmenter(perspective=False, affine=True,
                                  motion_blur=False)
        import random

        # pin our sampler to the same values
        seq = iter([scale, tx, ty, rot])
        orig_uniform = random.uniform
        random.uniform = lambda a, b: next(seq)
        try:
            aug.scale_range = (scale, scale)
            mat = aug._sample_geometric(H, W)
        finally:
            random.uniform = orig_uniform
        got_ours = _apply_homography(mat, pts)
        worst = max(worst, float(np.abs(got_ia - got_ours).max()))
    check("fixed-parameter affine point mapping", worst < 0.75,
          f"max |delta| = {worst:.4f} px (tol 0.75 — imgaug skimage/cv2 "
          "backends differ by up to ~0.5 px in their center convention)")


def _moment_compare(name, a, b, mean_tol, std_rtol):
    """a, b: [n, P, 2] mapped positions. Compare per-point mean and std."""
    ma, mb = a.mean(0), b.mean(0)
    sa, sb = a.std(0), b.std(0)
    mean_err = float(np.abs(ma - mb).max())
    denom = np.maximum(np.maximum(sa, sb), 1.0)
    std_err = float((np.abs(sa - sb) / denom).max())
    check(f"{name}: per-point mean", mean_err < mean_tol,
          f"max |mean delta| = {mean_err:.3f} px (tol {mean_tol})")
    check(f"{name}: per-point std", std_err < std_rtol,
          f"max rel std delta = {std_err:.3f} (tol {std_rtol})")


def check_warp_moments():
    # sampling-error scale at N samples: std/sqrt(N) ~ 0.5 px for ~25 px
    # stds; tolerances sit at ~6 sigma
    mean_tol, std_rtol = 3.0, 0.08
    configs = [
        ("perspective-only", dict(perspective=True, affine=False)),
        ("affine-only", dict(perspective=False, affine=True)),
        ("coco config", dict(perspective=True, affine=True,
                             perspective_magnitude=0.08,
                             rotation_range=(-12, 12),
                             translate_range=(-0.1, 0.1))),
    ]
    for name, kw in configs:
        ia_kw = dict(kw)
        ours_kw = dict(kw)
        pipeline = _imgaug_pipeline(**ia_kw)
        ia_samples = _imgaug_warp_samples(pipeline, N_SAMPLES, seed=11)
        our_samples = _our_warp_samples(_ours(**ours_kw), N_SAMPLES, seed=13)
        _moment_compare(name, ia_samples, our_samples, mean_tol, std_rtol)


def _structured_image():
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([(xx * 255 / W), (yy * 255 / H),
                    ((xx + yy) * 255 / (H + W))], -1)
    return img.astype(np.uint8)


def check_photometric():
    import cv2
    import imgaug
    import imgaug.augmenters as iaa

    from stemseg_tpu.data.augmenter import ImageToSeqAugmenter

    img = _structured_image()
    basic = iaa.SomeOf((1, None), [iaa.Add((-50, 50)),
                                   iaa.AddToHueAndSaturation((-15, 15))])

    imgaug.seed(7)
    ia_v, ia_h, ia_s = [], [], []
    for _ in range(N_SAMPLES):
        out = basic(image=img)
        d = out.astype(np.int16) - img.astype(np.int16)
        ia_v.append(float(d.mean()))
        hsv0 = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int16)
        hsv1 = cv2.cvtColor(out, cv2.COLOR_BGR2HSV).astype(np.int16)
        ia_h.append(float((hsv1[..., 0] - hsv0[..., 0]).mean()))
        ia_s.append(float((hsv1[..., 1] - hsv0[..., 1]).mean()))

    import random

    random.seed(17)
    np.random.seed(17)
    aug = ImageToSeqAugmenter(perspective=False, affine=False,
                              motion_blur=False)
    our_v, our_h, our_s = [], [], []
    for _ in range(N_SAMPLES):
        out = aug._photometric(img)
        d = out.astype(np.int16) - img.astype(np.int16)
        our_v.append(float(d.mean()))
        hsv0 = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int16)
        hsv1 = cv2.cvtColor(out, cv2.COLOR_BGR2HSV).astype(np.int16)
        our_h.append(float((hsv1[..., 0] - hsv0[..., 0]).mean()))
        our_s.append(float((hsv1[..., 1] - hsv0[..., 1]).mean()))

    for name, a, b, tol in [("BGR mean delta", ia_v, our_v, 2.0),
                            ("hue mean delta", ia_h, our_h, 2.5),
                            ("saturation mean delta", ia_s, our_s, 2.0)]:
        a, b = np.asarray(a), np.asarray(b)
        qs = np.linspace(0.05, 0.95, 10)
        qa, qb = np.quantile(a, qs), np.quantile(b, qs)
        err = float(np.abs(qa - qb).max())
        check(f"photometric {name} quantiles", err < tol,
              f"max |q delta| = {err:.3f} (tol {tol})")


def check_invalid_mask_and_mask_transport():
    import imgaug

    img = _structured_image()
    mask = np.zeros((H, W), np.uint8)
    mask[H // 4:H // 2, W // 4:3 * W // 4] = 1

    from imgaug.augmentables.segmaps import SegmentationMapsOnImage

    pipeline = _imgaug_pipeline(True, True, perspective_magnitude=0.08,
                                rotation_range=(-12, 12),
                                translate_range=(-0.1, 0.1))
    imgaug.seed(23)
    ia_invalid, ia_area = [], []
    ones = np.ones((H, W, 1), np.uint8)
    segmap = SegmentationMapsOnImage(mask, shape=img.shape[:2])
    for _ in range(N_SAMPLES // 3):
        det = pipeline.to_deterministic()
        inv = det(image=ones).squeeze(2)
        ia_invalid.append(float((inv == 0).mean()))
        aug_seg = det(image=img, segmentation_maps=segmap)[1].get_arr()
        ia_area.append(float((aug_seg > 0).sum()) / max(1.0, mask.sum()))

    import random

    random.seed(29)
    np.random.seed(29)
    aug = _ours(True, True, perspective_magnitude=0.08,
                rotation_range=(-12, 12), translate_range=(-0.1, 0.1))
    our_invalid, our_area = [], []
    for _ in range(N_SAMPLES // 3):
        _, aug_masks, inv = aug(img, [mask])
        our_invalid.append(float(inv.mean()))
        our_area.append(float(aug_masks[0].sum()) / max(1.0, mask.sum()))

    for name, a, b, tol in [("invalid fraction", ia_invalid, our_invalid, 0.03),
                            ("mask area ratio", ia_area, our_area, 0.05)]:
        a, b = np.asarray(a), np.asarray(b)
        qs = np.linspace(0.1, 0.9, 9)
        err = float(np.abs(np.quantile(a, qs) - np.quantile(b, qs)).max())
        check(f"{name} quantiles", err < tol,
              f"max |q delta| = {err:.4f} (tol {tol})")


def main():
    try:
        import imgaug  # noqa: F401
    except ImportError:
        print("imgaug is not installed — run this kit on a host with\n"
              "  pip install imgaug opencv-python\n"
              "It cannot run in the stemseg_tpu build image (imgaug absent "
              "by design; see data/augmenter.py).", file=sys.stderr)
        return 2

    check_fixed_affine()
    check_warp_moments()
    check_photometric()
    check_invalid_mask_and_mask_transport()

    if failures:
        print(f"\n{len(failures)} CHECK(S) FAILED: {failures}")
        return 1
    print("\nALL CHECKS PASSED — cv2 augmenter matches imgaug within "
          "tolerances")
    return 0


if __name__ == "__main__":
    sys.exit(main())
