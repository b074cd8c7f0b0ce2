"""Native C runtime support (rwimg analog): pack/unpack + PPM/PAM codecs."""

import numpy as np
import pytest

import mathmap_tpu as mm
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


def test_gaussian_blur_traced_stddev_raises_with_guidance():
    """A traced (passed, non-static) stddev must RAISE, not silently blur
    with a constant sigma that diverges from the oracle (review r3)."""
    from mathmap_tpu.utils.errors import MMRuntimeError

    src = ("filter f (image in, float s: 0-10 (2)) "
           "gaussian_blur(in, s)(xy) end")
    f = mm.compile(src)
    img = np.random.RandomState(0).rand(16, 24, 4).astype(np.float32)
    with pytest.raises(MMRuntimeError, match="static"):
        f.render(img, params={"s": 5.0})
    # the three static routes all work and match the oracle
    o = f.render(img, interpret=True, params={"s": 5.0})
    j = f.render(img, params={"s": 5.0},
                 options=mm.RenderOptions(static_params=("s",)))
    np.testing.assert_allclose(np.asarray(j), np.asarray(o), atol=1e-5)
    j2 = f.render(img)  # default bakes
    o2 = f.render(img, interpret=True)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(o2), atol=1e-5)


def test_gaussian_blur_animated_input():
    f = mm.compile("filter f (image in) gaussian_blur(in, 1.5)(xy) end")
    img = np.random.RandomState(1).rand(16, 24, 4).astype(np.float32)
    anim = np.stack([img, img[::-1]])
    j = f.render(anim, width=24, height=16, frame=1.0)
    o = f.render(anim, width=24, height=16, frame=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(j), np.asarray(o), atol=1e-5)


def test_gaussian_blur_tiled_rejected():
    from mathmap_tpu.utils.errors import MMRuntimeError

    f = mm.compile("filter f (image in) gaussian_blur(in, 1.5)(xy) end")
    img = np.random.RandomState(2).rand(32, 16, 4).astype(np.float32)
    with pytest.raises(MMRuntimeError, match="tiled"):
        f.render_tiled(img, halo=4)


def test_native_cache_pins_source_array():
    """The blur cache validates the pinned source ref, not just id():
    a recycled id() must MISS (review r3: id reuse after gc returned
    another image's blur)."""
    import mathmap_tpu.runtime.native_filters as NF
    from mathmap_tpu.runtime.tracer import RenderContext
    from mathmap_tpu.runtime.value import InputImage, TupleValue

    ctx = RenderContext(be=np, width=8, height=8,
                        opts=mm.RenderOptions(), is_jax=False)

    class _Ev:
        be = np

        def __init__(self):
            self.ctx = ctx

    ev = _Ev()
    a = np.random.RandomState(3).rand(8, 8, 4).astype(np.float32)
    b = np.random.RandomState(4).rand(8, 8, 4).astype(np.float32)
    sv = TupleValue("nil", (np.float32(2.0),), const=(2.0,))
    out_a = NF.native_gaussian_blur(
        ev, TupleValue("image", payload=InputImage(pixels=a)), sv, None)
    # simulate id reuse: poison the cache entry's key with b's id
    (key, ent), = ctx._native_cache.items()
    ctx._native_cache.clear()
    ctx._native_cache[(id(b), key[1])] = ent
    out_b = NF.native_gaussian_blur(
        ev, TupleValue("image", payload=InputImage(pixels=b)), sv, None)
    assert not np.allclose(out_b.payload.pixels, out_a.payload.pixels), \
        "stale id-keyed entry must not be returned for a different array"
