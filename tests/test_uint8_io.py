"""uint8 device-side I/O: RenderOptions(output_dtype='uint8') packs the
8-bit output INSIDE the render program (runtime/render.pack_uint8), and
uint8 (…, H, W, 4) inputs normalize in-trace (runtime/render.float_inputs)
— both bit-identical to the host helpers (imgio.to_uint8 / to_float_rgba),
so the serving path can ship 4× fewer bytes each way.

Reference analog: the 8-bit pack at the end of the render loop in
mathmap_common.c [unverified — mount empty, SURVEY.md §0]; the device-side
placement is TPU-native design (host<->device transfer has no C analog).
"""

import numpy as np
import pytest

import mathmap_tpu as mm
from mathmap_tpu.imgio.images import to_float_rgba, to_uint8

H, W = 24, 32

_WARP = "filter w (image in) in(xy + [sin(y/5)*2, cos(x/7)*2]) end"


def _img_f32(seed=3, h=H, w=W):
    img = np.random.RandomState(seed).rand(h, w, 4).astype(np.float32)
    img[..., 3] = 1.0
    return img


def _img_u8(seed=3, h=H, w=W):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 4), dtype=np.uint8)


def test_output_dtype_validation():
    with pytest.raises(ValueError, match="output_dtype"):
        mm.RenderOptions(output_dtype="float16")


def test_pack_matches_host_pack_bitwise():
    """Device pack == imgio.to_uint8 of the float render, bit for bit
    (same floats in, same clip·255+0.5 floor rule)."""
    f = mm.compile_source(_WARP)
    img = _img_f32()
    f32 = f.render(img)
    u8 = f.render(img, options=mm.RenderOptions(output_dtype="uint8"))
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, to_uint8(f32))


def test_pack_formula_ties_and_bounds():
    """pack_uint8 vs native.f32_to_u8 on crafted values: exact k/255
    sample points (ties under the +0.5 rule), out-of-range values, 0, 1."""
    import jax.numpy as jnp

    from mathmap_tpu.runtime.render import pack_uint8

    vals = np.concatenate([
        np.arange(256, dtype=np.float32) / 255.0,          # exact levels
        np.float32([-.5, -1e-6, 0.0, 1.0, 1.0 + 1e-6, 2.0]),
        (np.arange(255, dtype=np.float32) + 0.5) / 255.0,  # midpoints
        np.random.RandomState(0).rand(512).astype(np.float32),
    ])
    dev = np.asarray(pack_uint8(jnp, jnp.asarray(vals)))
    host = to_uint8(vals)
    np.testing.assert_array_equal(dev, host)
    # numpy-backend pack (the oracle's) agrees too
    np.testing.assert_array_equal(pack_uint8(np, vals), host)


def test_u8_input_matches_host_converted_f32_bitwise():
    """A uint8 input renders bit-identically to its to_float_rgba twin —
    the in-trace /255 is the same operation."""
    f = mm.compile_source(_WARP)
    raw = _img_u8()
    a = f.render(raw)
    b = f.render(to_float_rgba(raw))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_u8_in_u8_out_jit_matches_oracle():
    f = mm.compile_source(_WARP)
    raw = _img_u8(5)
    opts = mm.RenderOptions(output_dtype="uint8")
    jit = f.render(raw, options=opts)
    ora = f.render(raw, options=opts, interpret=True)
    assert jit.dtype == ora.dtype == np.uint8
    # jit and oracle floats agree to ~1e-5; after packing that is at most
    # one 8-bit count on round boundaries
    diff = np.abs(jit.astype(np.int16) - ora.astype(np.int16))
    assert diff.max() <= 1


def test_u8_output_pallas_matches_gather():
    f = mm.compile_source(_WARP)
    img = _img_f32(7, 64, 96)
    a = f.render(img, options=mm.RenderOptions(
        output_dtype="uint8", sampler="pallas", pallas_precision="f32"))
    b = f.render(img, options=mm.RenderOptions(
        output_dtype="uint8", sampler="gather"))
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1


def test_animated_u8_input_matches_f32():
    src = "filter a (image in) origValXY(x, y, 1) end"
    f = mm.compile_source(src)
    anim = np.random.RandomState(9).randint(
        0, 256, size=(3, H, W, 4), dtype=np.uint8)
    a = f.render(anim, options=mm.RenderOptions(interpolation="nearest"))
    b = f.render(np.stack([to_float_rgba(fr) for fr in anim]),
                 options=mm.RenderOptions(interpolation="nearest"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_batch_device_stack_passes_through():
    """A device-resident (N, H, W, 4) stack must reach the renderer
    without a host round-trip (api conv passthrough) and render exactly
    like per-frame calls."""
    import jax
    import jax.numpy as jnp

    f = mm.compile_source(_WARP)
    frames = np.stack([_img_f32(s) for s in range(4)])
    dev = jax.device_put(jnp.asarray(frames))
    outs = f.render_batch(dev, ts=[0.0] * 4, frames=[0.0] * 4)
    for i in range(4):
        one = f.render(frames[i])
        np.testing.assert_allclose(outs[i], one, atol=1e-6)


def test_render_batch_u8_stack_and_u8_out():
    f = mm.compile_source(_WARP)
    raw = np.random.RandomState(11).randint(
        0, 256, size=(3, H, W, 4), dtype=np.uint8)
    opts = mm.RenderOptions(output_dtype="uint8")
    outs = f.render_batch(raw, ts=[0.0] * 3, frames=[0.0] * 3, options=opts)
    assert outs.dtype == np.uint8
    for i in range(3):
        one = f.render(raw[i], options=opts)
        np.testing.assert_array_equal(outs[i], one)


def test_sharded_u8_output_matches_unsharded():
    img = _img_f32(13, 32, 48)
    f = mm.compile_source(_WARP)
    opts = mm.RenderOptions(output_dtype="uint8")
    sh = f.render_sharded(img, options=opts)
    un = f.render(img, options=opts)
    assert sh.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(un))


def test_tiled_u8_output_matches_plain():
    img = _img_f32(17, 32, 48)
    f = mm.compile_source(_WARP)
    opts = mm.RenderOptions(output_dtype="uint8")
    ti = f.render_tiled(img, options=opts)
    un = f.render(img, options=opts)
    assert ti.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(un))


def test_corners_supersample_u8():
    f = mm.compile_source(_WARP)
    img = _img_f32(19)
    opts = mm.RenderOptions(supersample=2, supersample_scheme="corners",
                            output_dtype="uint8")
    u8 = f.render(img, options=opts)
    f32 = f.render(img, options=mm.RenderOptions(
        supersample=2, supersample_scheme="corners"))
    np.testing.assert_array_equal(u8, to_uint8(f32))


def test_to_uint8_passthrough_and_read_animation_u8(tmp_path):
    raw = _img_u8(23)
    assert to_uint8(raw) is raw
    # GIF round-trip keeps uint8 under as_uint8=True
    from PIL import Image

    from mathmap_tpu.imgio.images import read_animation

    p = tmp_path / "a.gif"
    Image.fromarray(raw).save(p)
    stack = read_animation(str(p), as_uint8=True)
    assert stack.dtype == np.uint8 and stack.shape == (1, H, W, 4)


# ---------------------------------------------------------------------------
# exact-u8 sampler path (sample_kernel.exact_u8_eligible): u8-sourced
# images store INTEGER bf16 pads — exact in bf16, so f32-mode split-float
# drops its third contraction and the pad halves its DMA; the kernel
# scales output by 1/255. VERDICT r4 item 7.
# ---------------------------------------------------------------------------

def test_exact_u8_eligibility_rules():
    from mathmap_tpu.pallas_kernels.sample_kernel import (exact_u8_eligible,
                                                          image_pad_plan)
    import jax.numpy as jnp

    opts = mm.RenderOptions()
    assert exact_u8_eligible(opts, True, "wrap", "reflect")
    assert exact_u8_eligible(opts, True, "clamp", "wrap")
    assert not exact_u8_eligible(opts, False, "wrap", "wrap")
    # default edge_color (0,0,0,0) sits on the u8 grid -> eligible
    assert exact_u8_eligible(opts, True, "color", "color")
    # off-grid color -> NOT eligible (the apron would quantize)
    opts_c = mm.RenderOptions(edge_color=(0.1234, 0.0, 0.0, 1.0))
    assert not exact_u8_eligible(opts_c, True, "color", "wrap")
    # on-grid non-zero color (128/255) -> eligible
    opts_g = mm.RenderOptions(edge_color=(128.0 / 255.0, 0.0, 0.0, 1.0))
    assert exact_u8_eligible(opts_g, True, "color", "color")
    # OUT-OF-GAMUT on-grid color -> NOT eligible: 511 is on the *255 grid
    # but not exact in bf16 (8-bit mantissa; 511 would round to 512,
    # a 1-LSB apron error)
    opts_o = mm.RenderOptions(edge_color=(511.0 / 255.0, 0.0, 0.0, 1.0))
    assert not exact_u8_eligible(opts_o, True, "color", "wrap")
    opts_n = mm.RenderOptions(edge_color=(-1.0 / 255.0, 0.0, 0.0, 1.0))
    assert not exact_u8_eligible(opts_n, True, "color", "wrap")
    # pad plan: exact -> bf16 even in f32 precision mode
    opts_f32 = mm.RenderOptions(pallas_precision="f32")
    dt, exact = image_pad_plan(opts_f32, True, "wrap", "wrap")
    assert exact and dt == jnp.bfloat16
    dt, exact = image_pad_plan(opts_f32, False, "wrap", "wrap")
    assert not exact and dt == jnp.float32


def test_exact_u8_round_recovers_all_values():
    """round(f32(u/255)*255) == u for every u8 value — the property the
    exact pad build (_pad_xmajor exact_u8) relies on."""
    u = np.arange(256, dtype=np.uint8)
    v = u.astype(np.float32) / np.float32(255.0)
    np.testing.assert_array_equal(np.round(v * np.float32(255.0)),
                                  u.astype(np.float32))


@pytest.mark.parametrize("prec", ["f32", "bf16"])
@pytest.mark.parametrize("interp", ["nearest", "bilinear", "bicubic"])
def test_exact_u8_pallas_matches_oracle(prec, interp):
    """u8 input through the forced-Pallas sampler (exact path) stays
    inside the precision envelope vs the oracle — every interpolation,
    wrap/reflect edges."""
    f = mm.compile_source(
        "filter tw (image in) in(xy + [sin(y/3)*4, cos(x/5)*4]) end")
    img = _img_u8(7, 64, 96)
    opts = mm.RenderOptions(interpolation=interp, edge_x="wrap",
                            edge_y="reflect", sampler="pallas",
                            pallas_precision=prec, pallas_per_tile="on")
    out = np.asarray(f.render(img, options=opts))
    ora = np.asarray(f.render(img, options=opts, interpret=True))
    lim = 2e-4 if prec == "f32" else 2e-2
    assert np.abs(out - ora).max() < lim


def test_exact_u8_color_edge_matches_oracle():
    """'color' edges with an on-grid edge_color ride the exact path and
    still match the oracle (the apron scales with the image)."""
    f = mm.compile_source("filter z (image in) in(xy*1.4 - [8, 8]) end")
    img = _img_u8(11, 48, 64)
    opts = mm.RenderOptions(edge_x="color", edge_y="color",
                            edge_color=(0.0, 128.0 / 255.0, 1.0, 1.0),
                            sampler="pallas", pallas_precision="f32")
    out = np.asarray(f.render(img, options=opts))
    ora = np.asarray(f.render(img, options=opts, interpret=True))
    assert np.abs(out - ora).max() < 2e-4


def test_exact_u8_offgrid_color_falls_back_and_matches():
    """An OFF-grid edge_color disables the exact path (plain f32 pad) —
    output still matches the oracle, apron color unquantized."""
    f = mm.compile_source("filter z (image in) in(xy*1.4 - [8, 8]) end")
    img = _img_u8(11, 48, 64)
    opts = mm.RenderOptions(edge_x="color", edge_y="color",
                            edge_color=(0.1234, 0.0, 0.5, 1.0),
                            sampler="pallas", pallas_precision="f32")
    out = np.asarray(f.render(img, options=opts))
    ora = np.asarray(f.render(img, options=opts, interpret=True))
    assert np.abs(out - ora).max() < 2e-4


def test_exact_u8_prepad_accepted_by_kernel():
    """The renderer's precomputed prepad for a u8 DEVICE input is built
    with the same exact-u8 plan the kernel expects — a plan mismatch
    would silently rebuild the pad in-trace (and a WRONG match would
    mis-scale by 255x, far outside any envelope)."""
    import jax.numpy as jnp

    f = mm.compile_source(
        "filter tw (image in) in(xy + [sin(y/3)*4, cos(x/5)*4]) end")
    img = _img_u8(5, 64, 96)
    opts = mm.RenderOptions(sampler="pallas", pallas_precision="f32")
    dev = jnp.asarray(img)  # device-resident u8 -> prepad cache path
    out = np.asarray(f.render(dev, options=opts))
    ora = np.asarray(f.render(img, options=opts, interpret=True))
    assert np.abs(out - ora).max() < 2e-4


def test_exact_u8_image_userval_param():
    """u8 image PARAMS (uservals) carry u8_src and sample exactly too —
    including across the jit boundary: the static kinds spec must mark
    the param 'image:u8' so the in-trace InputImage rebuild re-enables
    the exact path (the pixels array alone is float either way)."""
    from mathmap_tpu.runtime.render import RenderContext, _userval_pytree

    src = ("filter m (image in, image other)\n"
           "  other(xy + [sin(y/4)*3, 0])\nend")
    f = mm.compile_source(src)
    base = _img_u8(2, 48, 64)
    other = _img_u8(9, 48, 64)
    opts = mm.RenderOptions(sampler="pallas", pallas_precision="f32")

    import jax.numpy as jnp

    ctx = RenderContext(be=jnp, width=64, height=48, opts=opts,
                        inputs=[], filters=f.filters, is_jax=True)
    _, kinds = _userval_pytree(ctx, f.fdef, {"other": other})
    assert dict(kinds)["other"] == "image:u8"
    _, kinds_f = _userval_pytree(
        ctx, f.fdef, {"other": other.astype(np.float32) / 255.0})
    assert dict(kinds_f)["other"] == "image"

    out = np.asarray(f.render(base, params={"other": other}, options=opts))
    ora = np.asarray(f.render(base, params={"other": other}, options=opts,
                              interpret=True))
    assert np.abs(out - ora).max() < 2e-4


def test_sweep_unroll_option():
    """RenderOptions.sweep_unroll: validation, auto gating by frame size,
    and bitwise parity of every unroll factor with per-frame renders
    (the chunk pad path included: 7 frames at unroll 3/8)."""
    from mathmap_tpu.runtime.render import sweep_unroll_for

    o = mm.RenderOptions()
    # auto = flat map everywhere: the product-path A/B had lax.map
    # winning at both 1080p and 4K (see render.sweep_unroll_for)
    assert sweep_unroll_for(o, 3840, 2160) == 1
    assert sweep_unroll_for(o, 1920, 1080) == 1
    assert sweep_unroll_for(mm.RenderOptions(sweep_unroll=4), 8, 8) == 4
    with pytest.raises(ValueError, match="sweep_unroll"):
        mm.RenderOptions(sweep_unroll=0)
    with pytest.raises(ValueError, match="sweep_unroll"):
        mm.RenderOptions(sweep_unroll="always")

    f = mm.compile_source(
        "filter r (image in, float amp: 0-10 (2))\n"
        "  in(xy + [sin(y/6 + t*6)*amp, 0])\nend")
    img = _img_f32(0, 40, 64)
    for u in ("auto", 1, 3, 8):
        opts = mm.RenderOptions(sweep_unroll=u)
        anim = np.asarray(f.render_animation(img, num_frames=7,
                                             options=opts))
        per = np.stack([np.asarray(f.render(img, t=i / 7, frame=i,
                                            options=opts))
                        for i in range(7)])
        np.testing.assert_array_equal(anim, per)


def test_sharded_u8_input_matches_unsharded_bitwise():
    """u8 INPUTS through render_sharded take the same in-trace /255 +
    exact-u8 sampler path as unsharded renders — output must match
    BITWISE (before this, the sharded path pre-converted u8 on the host
    and lost exact-u8 eligibility, diverging at the pad level)."""
    img = _img_u8(21, 32, 48)
    f = mm.compile_source(_WARP)
    for prec in ("bf16", "f32"):
        opts = mm.RenderOptions(sampler="pallas", pallas_precision=prec)
        sh = np.asarray(f.render_sharded(img, options=opts))
        un = np.asarray(f.render(img, options=opts))
        np.testing.assert_array_equal(sh, un)


def test_tiled_u8_input_exact_path_engages():
    """u8 INPUTS through render_tiled ride the exact-u8 sampler on the
    halo-extended blocks too. Bitwise equality with the plain renderer is
    NOT the bar here (unlike render_sharded): the tiled path re-bases
    coordinates per block, which moves f32 weight arithmetic by ~1e-5
    even for FLOAT inputs (measured: 7.4e-6 float, 7.6e-6 u8 — the u8
    staging adds nothing). The sharp discriminator for the exact path is
    the bf16 IDENTITY render: integer bf16 pads reproduce u8 input to
    ~1e-7, while the non-exact bf16(v/255) pad shows its ~2e-3
    quantization envelope."""
    img = _img_u8(29, 32, 48)
    ident = mm.compile_source("filter i (image in) in(xy) end")
    opts = mm.RenderOptions(sampler="pallas", pallas_precision="bf16")
    ti = np.asarray(ident.render_tiled(img, width=48, height=32,
                                       options=opts))
    assert np.abs(ti - img.astype(np.float32) / 255.0).max() < 1e-6
    # warp parity vs the plain renderer within the path's envelope,
    # incl. on-u8-grid 'color' edges (painted halos stay eligible)
    f = mm.compile_source(_WARP)
    for prec, atol in (("bf16", 4e-3), ("f32", 1e-4)):
        for ex, ey in (("wrap", "wrap"), ("color", "color")):
            o = mm.RenderOptions(sampler="pallas", pallas_precision=prec,
                                 edge_x=ex, edge_y=ey,
                                 edge_color=(0.0, 128 / 255.0, 1.0, 1.0))
            ti = np.asarray(f.render_tiled(img, options=o))
            un = np.asarray(f.render(img, options=o))
            np.testing.assert_allclose(ti, un, atol=atol)
