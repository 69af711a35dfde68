"""ctypes bindings for the native C++ runtime components (native/blub_native.cpp).

Builds the shared library on first use (g++ -O3 -shared) and caches it next to
the source; every entry point has a pure-Python fallback at its call site, so
the framework degrades gracefully without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / "blub_native.cpp"
_SO = _SRC.parent / "build" / "blub_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    _SO.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO), "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / compile error -> fallback
        log.warning("native build failed (%s); using Python fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            assert lib.blub_native_abi_version() == 1
        except Exception as e:
            log.warning("native load failed (%s); using Python fallbacks", e)
            _failed = True
            return None
        _configure(lib)
        _lib = lib
    return _lib


def _configure(lib: ctypes.CDLL) -> None:
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.blub_mesh_sdf.argtypes = [f32p, i64, i32p, i64, f32p, i64, f32p]
    lib.blub_mesh_sdf.restype = None
    lib.blub_encode_png.argtypes = [u8p, i64, i64, u8p, i64]
    lib.blub_encode_png.restype = i64
    lib.blub_splat.argtypes = [f32p, f32p, f32p, f32p, u8p, i64, i64, i64, ctypes.c_float, f32p, i32p]
    lib.blub_splat.restype = None


# ---------------------------------------------------------------------------
# entry points


def mesh_sdf_native(verts: np.ndarray, tris: np.ndarray, points: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty(points.shape[0], np.float32)
    lib.blub_mesh_sdf(verts, verts.shape[0], tris, tris.shape[0], points, points.shape[0], out)
    return out


def encode_png_native(rgb: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    cap = h * (w * 3 + 1) + (h * (w * 3 + 1)) // 2 + 4096
    buf = np.empty(cap, np.uint8)
    n = lib.blub_encode_png(rgb, h, w, buf, cap)
    if n == -1:
        cap = cap * 2 + (1 << 20)
        buf = np.empty(cap, np.uint8)
        n = lib.blub_encode_png(rgb, h, w, buf, cap)
    if n < 0:
        return None
    return bytes(buf[:n].tobytes())


def splat_native(px, py, z, r_px, valid, w: int, h: int, focal: float):
    """Returns (depth f32[h,w], winner i32[h,w]) or None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    px = np.ascontiguousarray(px, np.float32)
    py = np.ascontiguousarray(py, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    r_px = np.ascontiguousarray(r_px, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    depth = np.full(h * w, np.float32(1e9), np.float32)
    winner = np.full(h * w, -1, np.int32)
    lib.blub_splat(px, py, z, r_px, valid, px.shape[0], w, h, np.float32(focal), depth, winner)
    return depth.reshape(h, w), winner.reshape(h, w)
