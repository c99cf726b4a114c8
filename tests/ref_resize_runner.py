"""Subprocess helper: run torch's resize/interpolate at the reference's
label-affecting call sites and dump goldens (torch must not share a process
with JAX — thread-pool deadlock on this image).

Sites reproduced (SURVEY.md §7 hard-part 4):

* mask ÷4 downscale with ``.byte()`` truncation —
  ``/root/reference/stemseg/modeling/model_builder.py:139-151``;
* 4x trilinear embedding upscale (``--resize_embeddings``) —
  ``/root/reference/stemseg/inference/online_chainer.py:127-140``;
* output un-pad + bilinear resize to original dims —
  ``/root/reference/stemseg/inference/output_utils/davis.py:89-106``.

Usage: ref_resize_runner.py <in.npz> <out.npz>
"""

import sys

import numpy as np


def main(in_npz, out_npz):
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(2)
    data = np.load(in_npz)

    out = {}

    # site 1: [N, I, T, H, W] float masks -> bilinear /4 -> byte()
    masks = torch.from_numpy(data["masks"])  # [I, T, H, W]
    i, t, h, w = masks.shape
    ds = F.interpolate(masks.view(i * t, 1, h, w), scale_factor=0.25,
                       mode="bilinear", align_corners=False)
    out["masks_ds"] = ds.byte().view(i, t, h // 4, w // 4).numpy()

    # site 2: [1, C, T, h, w] trilinear (1, 4, 4) upscale
    emb = torch.from_numpy(data["emb"])  # [T, h, w, C] channels-last input
    emb_t = emb.permute(3, 0, 1, 2).unsqueeze(0)  # [1, C, T, h, w]
    up = F.interpolate(emb_t, scale_factor=(1.0, 4.0, 4.0), mode="trilinear",
                       align_corners=False)
    out["emb_up"] = up.squeeze(0).permute(1, 2, 3, 0).numpy()  # [T, 4h, 4w, C]

    # site 3: dense label mask -> un-pad -> bilinear resize to original dims
    # (davis.py:89-106: masks are resized per-instance as float and
    # re-thresholded > 0.5)
    label_mask = torch.from_numpy(data["label_mask"])  # [H_pad, W_pad] uint8
    vh, vw = int(data["valid_hw"][0]), int(data["valid_hw"][1])
    oh, ow = int(data["orig_hw"][0]), int(data["orig_hw"][1])
    cropped = label_mask[:vh, :vw].float().unsqueeze(0).unsqueeze(0)
    resized = F.interpolate(cropped, size=(oh, ow), mode="bilinear",
                            align_corners=False)
    out["label_resized"] = (resized[0, 0] > 0.5).numpy().astype(np.uint8)

    np.savez(out_npz, **out)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
