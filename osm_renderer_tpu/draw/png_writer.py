"""In-memory PNG encoding (reference: `png_writer.rs`).

Two paths, both RGB8 like the reference's output:

* native (`native/pngenc.cpp`, libdeflate) — the serving turbo path;
  at >1000 tiles/s/chip the encoder otherwise bottlenecks the server;
* pure-Python chunk assembly over zlib — fallback when the native
  library can't build.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
import zlib

import numpy as np

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libosmr_pngenc.so")
_U8P = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")

_native = None
_native_failed = False
_native_lock = threading.Lock()


def _get_native():
    """The libdeflate encoder, or None if it can't be built here."""
    global _native, _native_failed
    if _native is not None or _native_failed:
        return _native
    with _native_lock:
        if _native is not None or _native_failed:
            return _native
        try:
            src = os.path.join(_NATIVE_DIR, "pngenc.cpp")
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(src):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.osmr_png_encode.argtypes = [
                _U8P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.osmr_png_encode.restype = ctypes.c_size_t
            _native = lib
        except Exception:
            _native_failed = True
    return _native


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def rgb_to_png(rgb: np.ndarray, compress_level: int = 6) -> bytes:
    """rgb: (H, W, 3) uint8 -> PNG bytes."""
    h, w = rgb.shape[:2]
    lib = _get_native()
    if lib is not None:
        buf = ctypes.create_string_buffer(h * w * 3 + 4096)
        rgb_c = np.ascontiguousarray(rgb, dtype=np.uint8)
        n = lib.osmr_png_encode(rgb_c, h, w, compress_level, buf, len(buf))
        if n:
            return buf.raw[:n]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # Filter byte 0 (None) per scanline.
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        _PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
