"""Minimal dependency-free PNG writer (stdlib zlib).

Kept as the pure-Python fallback; the native C++ encoder in native/ is used
when built (the reference encodes PNGs on worker threads,
screenshot_capture.rs — here encoding is already off the sim's critical path)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """rgb: uint8[H, W, 3] -> PNG bytes."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    assert c == 3, rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def write_png(path, rgb: np.ndarray) -> None:
    data = None
    try:
        from ..ops.native import encode_png_native

        data = encode_png_native(rgb)
    except Exception:
        pass
    if data is None:
        data = encode_png(rgb)
    with open(path, "wb") as f:
        f.write(data)
