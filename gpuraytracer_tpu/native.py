"""ctypes bindings for the native C++ host runtime (native/gpurt_native.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes typed wrappers. Every entry point has a pure-Python/numpy fallback in
the package, so the framework works without a toolchain; the native path is
the fast one for big images (the reference's host runtime is native Swift —
this is its C++ analog)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "gpurt_native.cpp")
_LIB = os.path.join(_HERE, "native", "libgpurt_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gpurt_tonemap.argtypes = [f32p, u8p, ctypes.c_int64,
                                  ctypes.c_float, ctypes.c_float]
    lib.gpurt_png_encode.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                     ctypes.c_int32, u8p, ctypes.c_int64]
    lib.gpurt_png_encode.restype = ctypes.c_int64
    lib.gpurt_compile_triangles.argtypes = [f32p, ctypes.c_int64, f32p]
    lib.gpurt_compile_c2.argtypes = [f32p, f32p, ctypes.c_int64, f32p]
    lib.gpurt_halton_table.argtypes = [ctypes.c_uint32, ctypes.c_int64,
                                       ctypes.c_int32, f32p]
    lib.gpurt_row_means.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def tonemap(hdr: np.ndarray, exposure: float = 2.0,
            gamma: float = 2.2) -> np.ndarray:
    """Native exposure/Reinhard/gamma -> uint8 (image.swift:46-65)."""
    lib = load()
    hdr = np.ascontiguousarray(hdr, np.float32)
    out = np.empty(hdr.shape, np.uint8)
    lib.gpurt_tonemap(_fptr(hdr), _u8ptr(out), hdr.size,
                      ctypes.c_float(exposure), ctypes.c_float(gamma))
    return out


def png_encode(rgb: np.ndarray) -> bytes:
    """Native PNG encode for [H, W, 3|4] uint8."""
    lib = load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    cap = rgb.size + rgb.size // 100 + 4096
    out = np.empty(cap, np.uint8)
    n = lib.gpurt_png_encode(_u8ptr(rgb), w, h, c, _u8ptr(out), cap)
    if n < 0:
        raise RuntimeError("gpurt_png_encode failed")
    return out[:n].tobytes()


def write_png(path: str, rgb: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(png_encode(rgb))


def compile_triangles(verts: np.ndarray):
    """Native intersection-constant precompute. verts [T, 3, 3] f32 ->
    (packed [T, 11] f32, c2 [T] f32) matching intersect.compile_scene."""
    lib = load()
    verts = np.ascontiguousarray(verts, np.float32)
    t = verts.shape[0]
    out11 = np.empty((t, 11), np.float32)
    c2 = np.empty((t,), np.float32)
    lib.gpurt_compile_triangles(_fptr(verts), t, _fptr(out11))
    lib.gpurt_compile_c2(_fptr(verts), _fptr(out11), t, _fptr(c2))
    return out11, c2


def halton_table(start: int, count: int, dim: int) -> np.ndarray:
    lib = load()
    out = np.empty(count, np.float32)
    lib.gpurt_halton_table(ctypes.c_uint32(start), count, dim, _fptr(out))
    return out


def row_means(hdr: np.ndarray) -> np.ndarray:
    lib = load()
    hdr = np.ascontiguousarray(hdr, np.float32)
    h, w, _ = hdr.shape
    out = np.empty((h, 3), np.float32)
    lib.gpurt_row_means(_fptr(hdr), h, w, _fptr(out))
    return out
