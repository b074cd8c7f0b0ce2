"""Native C runtime support (rwimg analog): pack/unpack + PPM/PAM codecs."""

import numpy as np
import pytest

from mathmap_tpu import native
from mathmap_tpu.imgio.images import read_image, to_uint8, write_image


def test_native_lib_builds():
    assert native.load() is not None, "C toolchain present in this image; native must build"


def test_u8_f32_roundtrip():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (16, 8, 4), dtype=np.uint8)
    f = native.u8_to_f32(u8)
    assert f.dtype == np.float32 and f.max() <= 1.0
    back = native.f32_to_u8(f)
    np.testing.assert_array_equal(back, u8)


def test_f32_to_u8_clamps_and_rounds():
    f = np.array([[-0.5, 0.0, 0.5, 1.5]], np.float32).reshape(1, 1, 4)
    u = native.f32_to_u8(f)
    np.testing.assert_array_equal(u.ravel(), [0, 0, 128, 255])
    # matches the numpy fallback exactly
    np.testing.assert_array_equal(
        u.ravel(), (np.clip(f, 0, 1) * 255 + 0.5).astype(np.uint8).ravel()
    )


def test_pam_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(10, 12, 4).astype(np.float32)
    path = str(tmp_path / "frame.pam")
    write_image(path, img)
    back = read_image(path)
    np.testing.assert_array_equal(to_uint8(back), to_uint8(np.clip(img, 0, 1)))


def test_ppm_roundtrip_drops_alpha(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.rand(6, 7, 4).astype(np.float32)
    path = str(tmp_path / "frame.ppm")
    write_image(path, img)
    back = read_image(path)
    assert back.shape == (6, 7, 4)
    np.testing.assert_array_equal(to_uint8(back)[..., :3], to_uint8(np.clip(img, 0, 1))[..., :3])
    assert (back[..., 3] == 1.0).all()
