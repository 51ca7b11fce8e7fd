"""ctypes bindings for the native (C++) host-runtime helpers.

Wraps ``native/libfastio.so`` (single-pass multithreaded uint8→float decode
with white-background mask extraction, and the preprocessing white-out). The
library is built lazily with ``make -C native`` on first use; every entry
point has a NumPy fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decode_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.white_out.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_frame(raw: np.ndarray, n_threads: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 [C,H,W,3] → (mask [C,H,W] f32, img [C,H,W,3] f32 in [0,1])."""
    lib = _load()
    raw = np.ascontiguousarray(raw)
    C, H, W, _ = raw.shape
    if lib is None:
        img = raw.astype(np.float32) / 255.0
        mask = np.where(img[..., 0] == 1.0, 0.0, 1.0).astype(np.float32)
        return mask, img
    if n_threads <= 0:
        n_threads = min(C, len(os.sched_getaffinity(0)))
    mask = np.empty((C, H, W), np.float32)
    img = np.empty((C, H, W, 3), np.float32)
    lib.decode_frame(
        raw.ctypes.data_as(ctypes.c_void_p), C, H, W,
        mask.ctypes.data_as(ctypes.c_void_p),
        img.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return mask, img


def white_out(frames: np.ndarray, masks: np.ndarray,
              n_threads: int = 0) -> np.ndarray:
    """In-place white-out of frames [C,H,W,3] u8 where masks [C,H,W] < 128."""
    lib = _load()
    if lib is None:
        frames[masks < 128] = np.array([255, 255, 255], np.uint8)
        return frames
    frames = np.ascontiguousarray(frames)
    masks = np.ascontiguousarray(masks)
    C, H, W, _ = frames.shape
    if n_threads <= 0:
        n_threads = min(C, len(os.sched_getaffinity(0)))
    lib.white_out(
        frames.ctypes.data_as(ctypes.c_void_p),
        masks.ctypes.data_as(ctypes.c_void_p), C, H, W, n_threads,
    )
    return frames
