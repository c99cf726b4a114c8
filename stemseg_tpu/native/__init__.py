"""Native (C++) acceleration library loading.

``librle.so`` is built from ``rle.cpp`` via the Makefile here; if absent,
we try to build it once with ``make`` (g++ is in the image) and otherwise
callers fall back to the pure-numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_NATIVE_DIR, "librle.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    try:
        result = subprocess.run(["make", "-C", _NATIVE_DIR],
                                capture_output=True, timeout=120)
        return result.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_rle_lib() -> Optional[ctypes.CDLL]:
    """The native RLE library, building it on first use; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True

    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    charp = ctypes.c_char_p

    lib.rle_encode.argtypes = [u8p, i64, i64, i64p, i64]
    lib.rle_encode.restype = i64
    lib.rle_decode.argtypes = [i64p, i64, i64, i64, u8p]
    lib.rle_decode.restype = i64
    lib.rle_counts_to_string.argtypes = [i64p, i64, ctypes.c_char_p, i64]
    lib.rle_counts_to_string.restype = i64
    lib.rle_string_to_counts.argtypes = [charp, i64, i64p, i64]
    lib.rle_string_to_counts.restype = i64

    _lib = lib
    return _lib
