"""ctypes binding for the native (C++/libpng) batch PNG decoder.

The framework's native runtime component (the reference is pure Python —
SURVEY.md §2: zero native components upstream; this is net-new).  Decodes a
patient folder's slice stack in one C call instead of per-image PIL round
trips.  Built on demand with g++ (`native/Makefile`); every caller falls
back to PIL transparently when the toolchain or libpng is unavailable, and
`VIT3D_NATIVE=0` disables it outright.
"""

from __future__ import annotations

import ctypes
import functools
import logging
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libv3dnative.so")
ABI_VERSION = 1


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "volume_loader.cpp")
    if not os.path.exists(src):
        return False
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    cmd = ["g++", "-O2", "-fPIC", "-Wall", "-shared", "-pthread",
           "-o", _SO_PATH, src, "-lpng", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain/libpng missing -> PIL fallback
        logger.debug("native build failed: %s", e)
        return False


@functools.lru_cache(maxsize=1)
def load_library() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None -> use PIL."""
    if os.environ.get("VIT3D_NATIVE", "1") == "0":
        return None
    src = os.path.join(_NATIVE_DIR, "volume_loader.cpp")
    stale = (not os.path.exists(_SO_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)))
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        logger.debug("native load failed: %s", e)
        return None
    if lib.v3d_version() != ABI_VERSION:
        logger.warning("native ABI mismatch: %d != %d", lib.v3d_version(),
                       ABI_VERSION)
        return None
    lib.v3d_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.v3d_decode_batch.restype = ctypes.c_int
    return lib


def decode_batch(paths: Sequence[str], size: int) -> Optional[np.ndarray]:
    """Decode n same-size grayscale PNGs -> (n, size, size) uint8, or None
    when the native path is unavailable or any image mismatches."""
    lib = load_library()
    if lib is None or not paths:
        return None
    n = len(paths)
    out = np.empty((n, size, size), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.v3d_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size)
    if rc != 0:
        logger.debug("native decode failed for %s", paths[rc - 1])
        return None
    return out
