"""Host-side native resampling (ctypes bindings to native/resample.cc).

The TPU input pipeline is host-bound: every training item warps the pano
into m perspective crops (reference does this through cv2's C++ remap,
external/Perspective_and_Equirectangular/e2p.py:77-80). This module binds
the first-party C++ kernel (built by `make -C native`) and transparently
falls back to the numpy/scipy path when the shared library isn't built.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_MODES = {"bilinear": 0, "nearest": 1}
_BORDERS = {"zeros": 0, "wrap": 1, "clamp": 2}


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "libpanfusion_host.so",
    )
    if not os.path.exists(path):
        # best effort in-tree build (cheap, one TU)
        try:
            import subprocess

            subprocess.run(
                ["make", "-C", os.path.dirname(path), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ci = ctypes.c_int
    lib.pf_remap_f32.argtypes = [fp, ci, ci, ci, fp, fp, ci, ci, ci, ci, fp]
    lib.pf_remap_u8.argtypes = [u8p, ci, ci, ci, fp, fp, ci, ci, ci, ci, u8p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def remap(img: np.ndarray, x: np.ndarray, y: np.ndarray,
          mode: str = "bilinear", border: str = "wrap") -> Optional[np.ndarray]:
    """img (H, W, C) float32/uint8, x/y (h, w) pixel coords -> (h, w, C).

    Returns None when the native library is unavailable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    H, W = img.shape[:2]
    C = 1 if img.ndim == 2 else img.shape[2]
    img3 = np.ascontiguousarray(img.reshape(H, W, C))
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    # the C ABI trusts these: validate before handing out raw pointers
    if x.shape != y.shape:
        raise ValueError(f"x {x.shape} and y {y.shape} must match")
    if x.ndim != 2:
        raise ValueError(f"coords must be 2-D, got {x.shape}")
    h, w = x.shape
    m, b = _MODES[mode], _BORDERS[border]
    fp = ctypes.POINTER(ctypes.c_float)

    if img3.dtype == np.uint8:
        out = np.empty((h, w, C), np.uint8)
        lib.pf_remap_u8(
            img3.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, C,
            x.ctypes.data_as(fp), y.ctypes.data_as(fp), h, w, m, b,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    else:
        img3 = np.ascontiguousarray(img3, np.float32)
        out = np.empty((h, w, C), np.float32)
        lib.pf_remap_f32(
            img3.ctypes.data_as(fp), H, W, C,
            x.ctypes.data_as(fp), y.ctypes.data_as(fp), h, w, m, b,
            out.ctypes.data_as(fp),
        )
    if img.ndim == 2:
        return out[..., 0]
    return out
