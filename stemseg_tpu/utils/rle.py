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

import ctypes
from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, object]

_native_checked = False
_native = None


def _native_lib():
    """The C++ codec (stemseg_tpu/native/rle.cpp), lazily built/loaded;
    None -> pure-numpy fallback paths below."""
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from stemseg_tpu.native import load_rle_lib

            _native = load_rle_lib()
        except Exception:
            _native = None
    return _native


def _as_i64_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _as_u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# varint string <-> counts
# ---------------------------------------------------------------------------


def counts_to_string(counts: Sequence[int]) -> bytes:
    lib = _native_lib()
    if lib is not None and len(counts):
        arr = np.ascontiguousarray(counts, np.int64)
        buf = ctypes.create_string_buffer(len(arr) * 13 + 16)
        n = lib.rle_counts_to_string(_as_i64_ptr(arr), len(arr), buf, len(buf))
        if n >= 0:
            return buf.raw[:n]
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
    lib = _native_lib()
    if lib is not None and len(s):
        out = np.empty(len(s) + 2, np.int64)
        n = lib.rle_string_to_counts(s, len(s), _as_i64_ptr(out), len(out))
        if n >= 0:
            return out[:n].tolist()
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
    lib = _native_lib()
    if lib is not None and mask.size:
        m = np.ascontiguousarray(mask, np.uint8)
        h, w = m.shape
        out = np.empty(h * w + 2, np.int64)
        n = lib.rle_encode(_as_u8_ptr(m), h, w, _as_i64_ptr(out), len(out))
        if n >= 0:
            return out[:n].tolist()
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
    lib = _native_lib()
    if lib is not None and h * w:
        arr = np.ascontiguousarray(counts, np.int64)
        mask = np.zeros((h, w), np.uint8)
        if lib.rle_decode(_as_i64_ptr(arr), len(arr), h, w, _as_u8_ptr(mask)) == 0:
            return mask
        raise AssertionError(f"RLE does not cover {h * w} px")
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
