"""ctypes bindings for the native C++ stereo loader (native/stereo_loader.cc).

The native path replaces PIL decode + resize with a libpng + thread-pool
pipeline writing float32 NHWC batches directly into numpy memory.  Built on
demand with ``make -C native`` (g++, libpng); everything degrades gracefully
to the PIL path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libstereo_loader.so"))

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.umt_decode_resize_batch.restype = ctypes.c_int
        lib.umt_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _ensure_built() is not None


def decode_resize_batch(
    paths: list[str], out_h: int, out_w: int, num_threads: int = 8
) -> np.ndarray:
    """Decode + resize `paths` into a (N, out_h, out_w, 3) float32 [0,1] batch."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native stereo loader unavailable (build failed?)")

    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.umt_decode_resize_batch(
        c_paths, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if rc != 0:
        raise IOError(f"failed to decode {paths[rc - 1]}")
    return out
