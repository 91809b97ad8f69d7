"""ctypes binding for the native batch-gather library (native/feature_gather.cc).

Loads `native/libta3n_native.so` if built (`make -C native`); callers fall
back to numpy fancy indexing when unavailable.  The native path does
bounds-checked row memcpy across a thread pool — the production host path
for large memory-mapped stores.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["load_native", "native_gather", "native_available",
           "build_native"]

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libta3n_native.so")


def build_native() -> bool:
    """Compile the library in-tree (g++)."""
    import subprocess
    native_dir = os.path.dirname(_lib_path())
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_native(build_if_missing: bool = False):
    global _LIB, _TRIED
    if _LIB is not None or (_TRIED and not build_if_missing):
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build_if_missing:
        build_native()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.gather_rows.restype = ctypes.c_int
    lib.gather_rows.argtypes = [
        ctypes.c_char_p,                      # features
        ctypes.POINTER(ctypes.c_int64),       # offsets
        ctypes.POINTER(ctypes.c_int64),       # video_idx
        ctypes.POINTER(ctypes.c_int64),       # frame_idx
        ctypes.c_char_p,                      # out
        ctypes.c_int64, ctypes.c_int64,       # num_videos, total_rows
        ctypes.c_int64, ctypes.c_int64,       # batch, frames_per_video
        ctypes.c_int64, ctypes.c_int,         # row_bytes, num_threads
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def native_gather(features: np.ndarray, offsets: np.ndarray,
                  video_idx: np.ndarray, frame_idx: np.ndarray,
                  num_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """Row gather via the native library; None if unavailable/unsuitable."""
    lib = load_native()
    if lib is None:
        return None
    if not isinstance(features, np.ndarray) or not features.flags["C_CONTIGUOUS"]:
        return None
    b, t = frame_idx.shape
    row_shape = features.shape[1:]
    row_bytes = int(np.prod(row_shape)) * features.itemsize
    out = np.empty((b, t) + row_shape, dtype=features.dtype)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    video_idx = np.ascontiguousarray(video_idx, dtype=np.int64)
    frame_idx = np.ascontiguousarray(frame_idx, dtype=np.int64)
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    rc = lib.gather_rows(
        features.ctypes.data_as(ctypes.c_char_p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        video_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        frame_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.c_char_p),
        len(offsets) - 1, features.shape[0], b, t, row_bytes, num_threads)
    if rc != 0:
        raise IndexError("native gather: index out of range")
    return out
