"""ctypes binding to the native host warp library (native/warp.cc).

Gives the host input pipeline a cv2-free perspective crop: the framework's
own C++ implementation of homography solve + bilinear warp (BORDER_REPLICATE
semantics, float arithmetic). Built on demand by tools/build_native.py; the
binding auto-builds on first use when g++ is available and falls back
gracefully (callers check ``available()``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libvgm_host.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            import sys
            sys.path.insert(0, os.path.join(
                os.path.dirname(_LIB_PATH), "..", "tools"))
            from tools.build_native import build  # type: ignore
            build(verbose=False)
        except Exception:
            try:
                import subprocess
                src = os.path.join(os.path.dirname(_LIB_PATH), "warp.cc")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                     "-o", _LIB_PATH], check=True, capture_output=True)
            except Exception:
                _load_failed = True
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vgm_solve_homography.restype = ctypes.c_int
        lib.vgm_solve_homography.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double)]
        lib.vgm_warp_u8.restype = None
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def solve_homography(src_quad: np.ndarray,
                     dst_quad: np.ndarray) -> np.ndarray:
    """3x3 homography mapping src -> dst (native double-precision solve)."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src_quad, np.float32).reshape(8)
    dst = np.ascontiguousarray(dst_quad, np.float32).reshape(8)
    out = np.zeros(9, np.float64)
    rc = lib.vgm_solve_homography(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise ValueError("degenerate quad")
    return out.reshape(3, 3)


def perspective_crop(img: np.ndarray, quad: np.ndarray, out_w: int,
                     out_h: int) -> np.ndarray:
    """uint8 (H, W, C) or (H, W) -> warped uint8 (out_h, out_w[, C])."""
    lib = _load()
    assert lib is not None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    rect = np.array([[0, 0], [out_w - 1, 0], [out_w - 1, out_h - 1],
                     [0, out_h - 1]], np.float32)
    m = solve_homography(rect, np.asarray(quad, np.float32))
    dst = np.empty((out_h, out_w, c), np.uint8)
    lib.vgm_warp_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(c),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(out_h), ctypes.c_int(out_w))
    return dst[..., 0] if squeeze else dst
