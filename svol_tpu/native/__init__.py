"""ctypes bindings for the native clip decoder (clip_decoder.cpp).

The shared library is compiled lazily on first use (g++, ~1 s) and cached
next to the source; ``load_clip_decoder()`` returns None when the toolchain
or libjpeg is unavailable, and callers fall back to OpenCV.

Measured on this environment (single visible CPU): a 32-frame 640x360->224
clip decodes in ~117 ms natively vs ~105 ms with a cv2 loop — cv2's SIMD
decode wins when threads can't engage, so the dataset defaults to cv2 and
the native path is opt-in (``SVOLDataset(decoder='native')``) for multi-core
deployments where the one-call-per-clip threading pays off.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "clip_decoder.cpp")
_LIB = os.path.join(_HERE, "libclipdecoder.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _LIB,
        "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_clip_decoder():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.decode_clip.restype = ctypes.c_int
        lib.decode_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def decode_clip(paths: List[str], size: int, n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode a list of JPEG paths -> (T, size, size, 3) uint8 RGB, or None
    if the native library is unavailable (caller falls back)."""
    lib = load_clip_decoder()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    rc = lib.decode_clip(
        arr, n, size, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads,
    )
    if rc != 0:
        raise FileNotFoundError(f"native decode failed for {paths[rc - 1]}")
    return out
