"""Host-side image I/O: PNG/JPEG/GIF read/write, RGBA float <-> uint8.

Reference: `rwimg/` C codecs returning 8-bit RGBA buffers (SURVEY.md §1
layer 2 [unverified — mount empty, SURVEY.md §0]). I/O is host-side and not a
performance target (SURVEY §2.3 item 7); PIL is the codec layer. A native
C fast-path for pack/unpack lives in native/ (built lazily) for large batch
animation output.
"""

from __future__ import annotations

import numpy as np


def _pil():
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("Pillow is required for image file I/O") from exc
    return Image


def to_float_rgba(arr: np.ndarray) -> np.ndarray:
    """uint8 (H,W,{1,3,4}) or float array -> float32 (H,W,4) in [0,1]."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    if arr.shape[2] == 3:
        alpha = np.ones(arr.shape[:2] + (1,), np.float32)
        arr = np.concatenate([arr, alpha], axis=2)
    if arr.shape[2] != 4:
        raise ValueError(f"expected 1/3/4 channels, got {arr.shape[2]}")
    return arr


def to_uint8(arr: np.ndarray) -> np.ndarray:
    """float (H,W,4) in [0,1] -> uint8, with the reference's round-to-nearest
    8-bit packing."""
    arr = np.asarray(arr, dtype=np.float32)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def read_image(path: str) -> np.ndarray:
    """Read an image file -> float32 (H,W,4) RGBA in [0,1]."""
    img = _pil().open(path).convert("RGBA")
    return to_float_rgba(np.asarray(img))


def write_image(path: str, arr) -> None:
    """Write a float (H,W,4) RGBA array in [0,1] to an image file."""
    data = to_uint8(np.asarray(arr))
    img = _pil().fromarray(data, mode="RGBA")
    if path.lower().endswith((".jpg", ".jpeg")):
        img = img.convert("RGB")
    img.save(path)
