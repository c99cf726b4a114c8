"""COCO-compatible run-length-encoding codec (pycocotools replacement).

The reference depends on pycocotools' C RLE codec for dataset parsing and
submission-format output (``data/generic_video_dataset_parser.py:88``,
``inference/output_utils/youtube_vis.py:159``,
``kitti_mots_postprocessing.py:41-50``). That wheel is not in this image, so
this module implements the exact same wire format:

* masks are run-length encoded in COLUMN-major (Fortran) order, runs
  alternating background/foreground starting with background;
* the compressed string is the COCO varint scheme: 5 bits per char, char 6
  (0x20) = continuation, offset by 48 into printable ASCII, with counts
  beyond the second delta-encoded against ``counts[i-2]``.

Run extraction and mask reconstruction are vectorized numpy; only the varint
pack/unpack loops over runs (a few thousand per mask). Verified by
round-trip tests plus hand-derived format vectors (tests/test_rle.py).

API mirrors ``pycocotools.mask``: ``encode`` / ``decode`` / ``area`` /
``toBbox`` accept single RLE dicts or lists thereof; ``counts`` is ``bytes``
(accepts ``str`` too). Uncompressed list-of-ints counts are also accepted.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, object]


# ---------------------------------------------------------------------------
# varint string <-> counts
# ---------------------------------------------------------------------------


def counts_to_string(counts: Sequence[int]) -> bytes:
    s = bytearray()
    counts = [int(c) for c in counts]
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5  # arithmetic shift (python ints)
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


def string_to_counts(s: Union[bytes, str]) -> List[int]:
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


# ---------------------------------------------------------------------------
# mask <-> counts
# ---------------------------------------------------------------------------


def _mask_to_counts(mask: np.ndarray) -> List[int]:
    """[H, W] {0,1} -> alternating run lengths, column-major, bg first."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    if flat.size == 0:
        return [0]
    changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(boundaries).tolist()
    if flat[0] == 1:  # first run must be background
        runs = [0] + runs
    return runs


def _counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, np.asarray(counts, np.int64))
    assert flat.size == h * w, f"RLE covers {flat.size} px, expected {h * w}"
    return flat.reshape((w, h)).T  # column-major


# ---------------------------------------------------------------------------
# pycocotools-mirror API
# ---------------------------------------------------------------------------


def _is_list(obj) -> bool:
    return isinstance(obj, (list, tuple))


def encode(mask: np.ndarray) -> Union[RLE, List[RLE]]:
    """[H, W] or [H, W, N] uint8 mask(s) -> compressed RLE dict(s)."""
    if mask.ndim == 3:
        return [encode(mask[:, :, i]) for i in range(mask.shape[2])]
    h, w = mask.shape
    return {"size": [int(h), int(w)],
            "counts": counts_to_string(_mask_to_counts(mask))}


def _decode_one(rle: RLE) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts)
    return _counts_to_mask(counts, int(h), int(w))


def decode(rle: Union[RLE, List[RLE]]) -> np.ndarray:
    """RLE dict -> [H, W] uint8; list of dicts -> [H, W, N]."""
    if _is_list(rle):
        return np.stack([_decode_one(r) for r in rle], axis=2)
    return _decode_one(rle)


def _counts_of(rle: RLE) -> List[int]:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        return string_to_counts(counts)
    return list(counts)


def area(rle: Union[RLE, List[RLE]]):
    if _is_list(rle):
        return np.asarray([area(r) for r in rle], np.uint32)
    return int(sum(_counts_of(rle)[1::2]))


def toBbox(rle: Union[RLE, List[RLE]]):
    """[x, y, w, h] float bbox(es), matching pycocotools' rleToBbox."""
    if _is_list(rle):
        return np.stack([toBbox(r) for r in rle]).astype(np.float64)
    h, w = (int(v) for v in rle["size"])
    counts = _counts_of(rle)
    if len(counts) <= 1 or sum(counts[1::2]) == 0:
        return np.zeros(4, np.float64)
    ends = np.cumsum(counts)
    starts = ends - np.asarray(counts)
    fg_starts = starts[1::2]
    fg_ends = ends[1::2] - 1  # inclusive
    # column-major: index = x * h + y
    xs_start, ys_start = fg_starts // h, fg_starts % h
    xs_end, ys_end = fg_ends // h, fg_ends % h
    # a run can span multiple columns; then it covers full column height
    spans_cols = xs_end > xs_start
    y0 = int(np.min(np.where(spans_cols, 0, ys_start)))
    y1 = int(np.max(np.where(spans_cols, h - 1, ys_end)))
    x0 = int(np.min(xs_start))
    x1 = int(np.max(xs_end))
    return np.asarray([x0, y0, x1 - x0 + 1, y1 - y0 + 1], np.float64)


def iou_masks(rles_a: List[RLE], rles_b: List[RLE]) -> np.ndarray:
    """Dense IoU matrix between two RLE lists (decodes once per list)."""
    a = decode(rles_a).reshape(-1, len(rles_a)).astype(bool)
    b = decode(rles_b).reshape(-1, len(rles_b)).astype(bool)
    inter = (a.T.astype(np.float64) @ b.astype(np.float64))
    na = a.sum(axis=0)[:, None].astype(np.float64)
    nb = b.sum(axis=0)[None, :].astype(np.float64)
    union = na + nb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)
