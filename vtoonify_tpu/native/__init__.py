"""Native host runtime (C++ via ctypes) with transparent numpy fallback.

Build happens lazily on first import of `lib()`; set VTOONIFY_NO_NATIVE=1 to
force the numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "frameio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_frameio.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def lib():
    """Return the loaded ctypes library, or None (fallback)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VTOONIFY_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        L = ctypes.CDLL(_SO)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        L.bgr_to_rgb_into_batch.argtypes = [u8, u8, i64, i64, i64]
        L.rgb_to_bgr.argtypes = [u8, u8, i64]
        L.u8_to_unit_f32.argtypes = [u8, f32, i64]
        L.unit_f32_to_u8.argtypes = [f32, u8, i64]
        L.depth_to_space2_u8.argtypes = [u8, u8, i64, i64, i64, i64]
        _LIB = L
    except Exception:
        _LIB = None
    return _LIB


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bgr_to_rgb_into_batch(src_bgr: np.ndarray, dst_batch: np.ndarray,
                          slot: int) -> None:
    """Fused swizzle + pack: dst_batch[slot] = bgr→rgb(src_bgr)."""
    L = lib()
    h, w = src_bgr.shape[:2]
    if L is not None and src_bgr.flags.c_contiguous and \
            dst_batch.flags.c_contiguous:
        L.bgr_to_rgb_into_batch(_u8p(src_bgr), _u8p(dst_batch), slot, h, w)
    else:
        dst_batch[slot] = src_bgr[..., ::-1]


def rgb_to_bgr(src: np.ndarray) -> np.ndarray:
    L = lib()
    if L is not None and src.flags.c_contiguous:
        out = np.empty_like(src)
        L.rgb_to_bgr(_u8p(src), _u8p(out), src.shape[0] * src.shape[1])
        return out
    return np.ascontiguousarray(src[..., ::-1])


def depth_to_space2_u8(src: np.ndarray, bgr: bool = False) -> np.ndarray:
    """(H, W, 4C) phase-major packed uint8 → (2H, 2W, C) — the host-side
    finish of the packed synthesis tail (nn/layers.py::depth_to_space2 as a
    byte permutation). bgr=True fuses the writer's RGB→BGR swap (C must
    be 3)."""
    h, w, c4 = src.shape
    c = c4 // 4
    L = lib()
    if L is not None and src.flags.c_contiguous:
        out = np.empty((2 * h, 2 * w, c), np.uint8)
        L.depth_to_space2_u8(_u8p(src), _u8p(out), h, w, c, int(bgr))
        return out
    out = src.reshape(h, w, 2, 2, c).transpose(0, 2, 1, 3, 4).reshape(
        2 * h, 2 * w, c)
    return np.ascontiguousarray(out[..., ::-1]) if bgr else out


def u8_to_unit(src: np.ndarray) -> np.ndarray:
    L = lib()
    if L is not None and src.flags.c_contiguous:
        out = np.empty(src.shape, np.float32)
        L.u8_to_unit_f32(_u8p(src), _f32p(out), src.size)
        return out
    return src.astype(np.float32) / 127.5 - 1.0


def unit_to_u8(src: np.ndarray) -> np.ndarray:
    L = lib()
    src = np.ascontiguousarray(src, np.float32)
    if L is not None:
        out = np.empty(src.shape, np.uint8)
        L.unit_f32_to_u8(_f32p(src), _u8p(out), src.size)
        return out
    return ((np.clip(src, -1, 1) + 1) * 127.5 + 0.5).astype(np.uint8)
