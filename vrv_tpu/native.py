"""ctypes bindings for the native host library (native/vrv_native.cpp).

Builds on demand with `make -C native` if the shared object is missing;
every entry point has a pure-Python fallback so the framework works
without a toolchain (usage sites pick `native.lib is not None`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvrv_native.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u32, f32, f64 = ctypes.c_uint32, ctypes.c_float, ctypes.c_double
    i32, i64 = ctypes.c_int32, ctypes.c_int64
    p = ctypes.POINTER

    lib.vrv_murmur3_combine.restype = u32
    lib.vrv_murmur3_combine.argtypes = [u32, u32]
    lib.vrv_murmur3_finalize.restype = u32
    lib.vrv_murmur3_finalize.argtypes = [u32]
    lib.vrv_murmur3_finalizef.restype = f32
    lib.vrv_murmur3_finalizef.argtypes = [u32]
    lib.vrv_murmur3_draw_batch.restype = None
    lib.vrv_murmur3_draw_batch.argtypes = [p(u32), u32, p(f32), i64]

    lib.vrv_dda_trace.restype = ctypes.c_int
    lib.vrv_dda_trace.argtypes = [
        p(ctypes.c_uint8), p(i64), p(ctypes.c_uint8), ctypes.c_int,
        p(f64), p(f64), f64, f64,
        p(f64), p(i32), p(i32), p(i64), p(i32),
    ]
    lib.vrv_trace_to_solid.restype = ctypes.c_int
    lib.vrv_trace_to_solid.argtypes = [
        p(ctypes.c_uint8), p(i64), p(f64), p(ctypes.c_uint8), ctypes.c_int,
        p(f64), p(f64), f64, p(i64), p(i32),
    ]
    lib.vrv_emissive_faces.restype = i64
    lib.vrv_emissive_faces.argtypes = [
        p(ctypes.c_uint8), p(i64), p(ctypes.c_uint8), p(f32), ctypes.c_int,
        p(i32), i64,
    ]
    lib.vrv_count_mesh_faces.restype = i64
    lib.vrv_count_mesh_faces.argtypes = [
        p(ctypes.c_uint8), p(i64), p(ctypes.c_uint8), ctypes.c_int,
    ]
    return lib


lib = _load()


def _cptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def murmur3_finalizef(h: int) -> float:
    assert lib is not None
    return float(lib.vrv_murmur3_finalizef(ctypes.c_uint32(h)))


def dda_trace(grid: np.ndarray, translucent: np.ndarray, origin, direction,
              t_min=0.001, t_max=1000.0) -> Optional[dict]:
    """Single-ray native DDA; None on miss. Grid-local coords."""
    assert lib is not None
    g = np.ascontiguousarray(grid, np.uint8)
    size = np.asarray(g.shape, np.int64)
    tl = np.ascontiguousarray(translucent, np.uint8)
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    t = ctypes.c_double()
    block = ctypes.c_int32()
    face = ctypes.c_int32()
    cell = np.zeros(3, np.int64)
    entering = ctypes.c_int32()
    hit = lib.vrv_dda_trace(
        _cptr(g, ctypes.c_uint8), _cptr(size, ctypes.c_int64),
        _cptr(tl, ctypes.c_uint8), len(tl),
        _cptr(o, ctypes.c_double), _cptr(d, ctypes.c_double),
        t_min, t_max,
        ctypes.byref(t), ctypes.byref(block), ctypes.byref(face),
        _cptr(cell, ctypes.c_int64), ctypes.byref(entering),
    )
    if not hit:
        return None
    return dict(t=t.value, block=block.value, face=face.value,
                cell=cell.copy(), entering=bool(entering.value))


def trace_to_solid(grid: np.ndarray, grid_origin, solid: np.ndarray,
                   origin, direction, radius: float) -> Optional[Tuple[np.ndarray, int]]:
    """Reference-style 0.01-step march (native). World coords."""
    assert lib is not None
    g = np.ascontiguousarray(grid, np.uint8)
    size = np.asarray(g.shape, np.int64)
    go = np.asarray(grid_origin, np.float64)
    so = np.ascontiguousarray(solid, np.uint8)
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    coords = np.zeros(3, np.int64)
    face = ctypes.c_int32()
    hit = lib.vrv_trace_to_solid(
        _cptr(g, ctypes.c_uint8), _cptr(size, ctypes.c_int64),
        _cptr(go, ctypes.c_double), _cptr(so, ctypes.c_uint8), len(so),
        _cptr(o, ctypes.c_double), _cptr(d, ctypes.c_double), radius,
        _cptr(coords, ctypes.c_int64), ctypes.byref(face),
    )
    if not hit:
        return None
    return coords.copy(), int(face.value)


def emissive_faces(grid: np.ndarray, translucent: np.ndarray,
                   tex_lum: np.ndarray, max_out: int = 1 << 20) -> np.ndarray:
    """(n, 4) int32 records of (x, y, z, face) for emissive exposed faces."""
    assert lib is not None
    g = np.ascontiguousarray(grid, np.uint8)
    size = np.asarray(g.shape, np.int64)
    tl = np.ascontiguousarray(translucent, np.uint8)
    lum = np.ascontiguousarray(tex_lum, np.float32)
    out = np.zeros((max_out, 4), np.int32)
    n = lib.vrv_emissive_faces(
        _cptr(g, ctypes.c_uint8), _cptr(size, ctypes.c_int64),
        _cptr(tl, ctypes.c_uint8), _cptr(lum, ctypes.c_float), len(tl),
        _cptr(out, ctypes.c_int32), max_out,
    )
    return out[: min(n, max_out)].copy()


def count_mesh_faces(grid: np.ndarray, translucent: np.ndarray) -> int:
    assert lib is not None
    g = np.ascontiguousarray(grid, np.uint8)
    size = np.asarray(g.shape, np.int64)
    tl = np.ascontiguousarray(translucent, np.uint8)
    return int(
        lib.vrv_count_mesh_faces(
            _cptr(g, ctypes.c_uint8), _cptr(size, ctypes.c_int64),
            _cptr(tl, ctypes.c_uint8), len(tl),
        )
    )
