"""imgio/png.py fast encoder: standards-compliant, lossless, validated
against Pillow's decoder (the serving/preview hot path depends on it)."""

import io

import numpy as np
import pytest

from mathmap_tpu.imgio.png import encode_png


def _decode(data):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


def _frame(h=64, w=48, c=4, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, w)[None, :] * np.linspace(0, 1, h)[:, None]
    arr = np.stack([x] * c, -1)
    arr = (arr * 255).astype(np.uint8)
    return np.clip(arr.astype(np.int16)
                   + rng.integers(-9, 9, arr.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("channels", [3, 4])
def test_roundtrip_exact(level, channels):
    arr = _frame(c=channels, seed=level)
    out = _decode(encode_png(arr, level))
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_roundtrip_extremes():
    # all-0 / all-255 / alternating rows exercise the Sub filter's uint8
    # wraparound (delta is mod-256 by construction)
    h, w = 8, 8
    for fill in (0, 255):
        arr = np.full((h, w, 4), fill, np.uint8)
        np.testing.assert_array_equal(_decode(encode_png(arr)), arr)
    arr = np.zeros((h, w, 4), np.uint8)
    arr[::2] = 255
    np.testing.assert_array_equal(_decode(encode_png(arr)), arr)


def test_nonsquare_and_tiny():
    for shape in ((1, 1, 4), (1, 300, 3), (257, 3, 4)):
        arr = _frame(*shape, seed=7)
        np.testing.assert_array_equal(_decode(encode_png(arr)), arr)


def test_level0_store_is_larger_but_valid():
    arr = _frame(256, 256)
    stored = encode_png(arr, 0)
    packed = encode_png(arr, 1)
    assert len(stored) > len(packed)
    np.testing.assert_array_equal(_decode(stored), arr)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 4), np.float32))
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_png(_frame(), level=10)
    with pytest.raises(ValueError):
        encode_png(_frame(), level=-1)


def test_noncontiguous_input():
    big = _frame(64, 64)
    view = big[::2, ::2]  # strided view
    np.testing.assert_array_equal(_decode(encode_png(view)), view)
