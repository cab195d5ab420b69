"""ctypes bindings for the native image decoder (io/native/paif_io.cc).

Builds the shared library on first use (g++, libpng/libjpeg) and caches it
next to the source. Every entry point degrades gracefully: if the toolchain
or libraries are unavailable, callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libpaif_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO):
                subprocess.run(
                    ["make", "-C", _DIR, "libpaif_io.so"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.paif_image_size.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.paif_image_size.restype = ctypes.c_int
            lib.paif_decode_into.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.paif_decode_into.restype = ctypes.c_int
            lib.paif_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.paif_decode_batch.restype = None
            _lib = lib
        except Exception as e:  # toolchain/lib missing -> PIL fallback
            log.info("native image decoder unavailable (%s); using PIL", e)
            _failed = True
    return _lib


def available() -> bool:
    if os.environ.get("PAIF_NATIVE_IO") in ("0", "false", "False"):
        return False
    return _load() is not None


def image_size(path: str) -> Optional[Tuple[int, int, int]]:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.paif_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
        return None
    return h.value, w.value, c.value


def decode_image(path: str, channels: int) -> Optional[np.ndarray]:
    """Decode PNG/JPEG to uint8 (H, W, channels); None -> caller falls back."""
    lib = _load()
    if lib is None:
        return None
    size = image_size(path)
    if size is None:
        return None
    h, w, _ = size
    out = np.empty((h, w, channels), dtype=np.uint8)
    rc = lib.paif_decode_into(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, channels
    )
    return out if rc == 0 else None


def decode_batch(paths: List[str], h: int, w: int, channels: int, threads: int = 0) -> Optional[np.ndarray]:
    """Threaded decode of same-sized images -> uint8 (N, H, W, C)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w, channels), dtype=np.uint8)
    status = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if threads <= 0:
        threads = min(8, max(os.cpu_count() or 1, 1))
    lib.paif_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, channels,
        status, threads,
    )
    if any(status[i] != 0 for i in range(n)):
        return None
    return out
