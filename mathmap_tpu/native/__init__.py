"""Native runtime support: compile-on-first-use C library loaded via ctypes.

Mirrors the reference's runtime-gcc strategy (cgen.c compiles filter code
with the system compiler and dlopens it); here the natively-compiled pieces
are the host-side IO hot loops — pixel pack/unpack and PPM/PAM codecs
(rwimg analog). Falls back to NumPy implementations when no C compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "mmnative.c")
_lib = None
_tried = False


def _build() -> str | None:
    build_dir = os.path.join(_HERE, "build")
    so_path = os.path.join(build_dir, "libmmnative.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    os.makedirs(build_dir, exist_ok=True)
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-o", so_path, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def load():
    """The ctypes library handle, or None when native support is off."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MMTPU_NO_NATIVE"):
        return None
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    lib.mm_u8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.mm_f32_to_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.mm_write_pam.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.mm_write_pam.restype = ctypes.c_int
    lib.mm_write_ppm.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.mm_write_ppm.restype = ctypes.c_int
    lib.mm_read_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mm_read_header.restype = ctypes.c_int
    lib.mm_read_pixels.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.mm_read_pixels.restype = ctypes.c_int
    _lib = lib
    return _lib


def u8_to_f32(arr: np.ndarray) -> np.ndarray:
    """uint8 (…,) -> float32 in [0,1], native when available."""
    lib = load()
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if lib is None:
        return arr.astype(np.float32) / 255.0
    out = np.empty(arr.shape, np.float32)
    lib.mm_u8_to_f32(arr.ctypes.data, out.ctypes.data, arr.size)
    return out


def f32_to_u8(arr: np.ndarray) -> np.ndarray:
    """float32 in [0,1] -> uint8 with clamp + round-to-nearest."""
    lib = load()
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    if lib is None:
        return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    out = np.empty(arr.shape, np.uint8)
    lib.mm_f32_to_u8(arr.ctypes.data, out.ctypes.data, arr.size)
    return out


def write_pam(path: str, rgba_u8: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    rgba_u8 = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    h, w, _ = rgba_u8.shape
    return lib.mm_write_pam(path.encode(), rgba_u8.ctypes.data, w, h) == 0


def write_ppm(path: str, rgba_u8: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    rgba_u8 = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    h, w, _ = rgba_u8.shape
    return lib.mm_write_ppm(path.encode(), rgba_u8.ctypes.data, w, h) == 0


def read_image_native(path: str) -> np.ndarray | None:
    """Read PPM/PAM -> uint8 (H, W, 4), or None if unsupported/unavailable."""
    lib = load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    d = ctypes.c_int()
    if lib.mm_read_header(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(d)) != 0:
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    if lib.mm_read_pixels(path.encode(), out.ctypes.data, w.value, h.value) != 0:
        return None
    return out
