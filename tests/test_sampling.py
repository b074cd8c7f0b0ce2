"""Sampling unit tests: interpolation modes and edge behaviors vs hand-rolled
NumPy references (SURVEY.md §4 item 1; origVal is THE hot path §3.6)."""

import numpy as np
import pytest

import mathmap_tpu as mm

H, W = 10, 12


def _image(seed=3):
    img = np.random.RandomState(seed).rand(H, W, 4).astype(np.float32)
    img[..., 3] = 1.0
    return img


def test_identity_sample_nearest():
    img = _image()
    f = mm.compile("origVal(xy)")
    out = f.render(img, interpret=True, options=mm.RenderOptions(interpolation="nearest"))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_identity_sample_bilinear_exact_at_centers():
    img = _image()
    f = mm.compile("origVal(xy)")
    out = f.render(img, interpret=True, options=mm.RenderOptions(interpolation="bilinear"))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_identity_sample_bicubic_exact_at_centers():
    # Catmull-Rom interpolates the sample values at integer offsets
    img = _image()
    f = mm.compile("origVal(xy)")
    out = f.render(
        img, interpret=True,
        options=mm.RenderOptions(interpolation="bicubic", edge_x="wrap", edge_y="wrap"),
    )
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_half_pixel_shift_bilinear_averages():
    img = _image()
    # shift by exactly one half pixel in x: bilinear = average of neighbors
    f = mm.compile("origVal(xy + xy:[0.5, 0])")
    out = f.render(
        img, interpret=True,
        options=mm.RenderOptions(interpolation="bilinear", edge_x="wrap", edge_y="wrap"),
    )
    expected = 0.5 * (img + np.roll(img, -1, axis=1))
    np.testing.assert_allclose(out, np.clip(expected, 0, 1), atol=1e-6)


def test_integer_shift_matches_roll_wrap():
    img = _image()
    f = mm.compile("origVal(xy + xy:[3, 0])")
    out = f.render(
        img, interpret=True,
        options=mm.RenderOptions(interpolation="nearest", edge_x="wrap", edge_y="wrap"),
    )
    np.testing.assert_allclose(out, np.roll(img, -3, axis=1), atol=1e-6)


def test_integer_shift_y_up():
    # +y in world space is up = smaller row index
    img = _image()
    f = mm.compile("origVal(xy + xy:[0, 1])")
    out = f.render(
        img, interpret=True,
        options=mm.RenderOptions(interpolation="nearest", edge_y="wrap"),
    )
    np.testing.assert_allclose(out, np.roll(img, 1, axis=0), atol=1e-6)


def test_edge_color_outside():
    img = _image()
    f = mm.compile("origVal(xy + xy:[100, 0])")  # fully outside
    opts = mm.RenderOptions(interpolation="nearest", edge_x="color", edge_color=(1, 0, 0, 1))
    out = f.render(img, interpret=True, options=opts)
    np.testing.assert_allclose(out, np.broadcast_to([1, 0, 0, 1], (H, W, 4)), atol=1e-6)


def test_edge_reflect():
    img = _image()
    f = mm.compile("origVal(xy + xy:[" + str(W) + ", 0])")  # shift by exactly W
    opts = mm.RenderOptions(interpolation="nearest", edge_x="reflect")
    out = f.render(img, interpret=True, options=opts)
    np.testing.assert_allclose(out, img[:, ::-1], atol=1e-6)


def test_edge_wrap_x_shift_full_period():
    img = _image()
    f = mm.compile("origVal(xy + xy:[" + str(W) + ", 0])")
    opts = mm.RenderOptions(interpolation="nearest", edge_x="wrap")
    out = f.render(img, interpret=True, options=opts)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_independent_edge_behaviors_per_axis():
    img = _image()
    f = mm.compile("origVal(xy + xy:[" + str(W) + ", " + str(-H) + "])")
    opts = mm.RenderOptions(interpolation="nearest", edge_x="wrap", edge_y="color",
                            edge_color=(0, 1, 0, 1))
    out = f.render(img, interpret=True, options=opts)
    np.testing.assert_allclose(out, np.broadcast_to([0, 1, 0, 1], (H, W, 4)), atol=1e-6)


def test_bicubic_weights_sum_to_one():
    from mathmap_tpu.runtime.sampling import _catmull_rom_weights

    f = np.linspace(0, 0.999, 37, dtype=np.float64)
    w = _catmull_rom_weights(np, f)
    np.testing.assert_allclose(w[0] + w[1] + w[2] + w[3], np.ones_like(f), atol=1e-12)


def test_multi_image_sampling_uses_own_pixels():
    a = np.zeros((H, W, 4), np.float32)
    b = np.ones((H, W, 4), np.float32)
    f = mm.compile("filter f (image p, image q) q(xy) end")
    out = f.render(a, b, interpret=True, options=mm.RenderOptions(interpolation="nearest"))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_pallas_sampler_matrix_matches_gather():
    """Pallas MXU sampling kernel (interpret mode off-TPU) vs the XLA gather
    path across interpolations and edge behaviors."""
    img = _image(7)
    f = mm.compile("origVal(toXY(ra:[r * 0.8, a + 0.3]))")
    for interp in ("nearest", "bilinear", "bicubic"):
        for ex, ey in (("color", "color"), ("wrap", "reflect")):
            a = f.render(img, options=mm.RenderOptions(
                interpolation=interp, edge_x=ex, edge_y=ey, sampler="gather"))
            # f32 precision: matches the gather path to f32 rounding
            b = f.render(img, options=mm.RenderOptions(
                interpolation=interp, edge_x=ex, edge_y=ey, sampler="pallas",
                pallas_precision="f32"))
            np.testing.assert_allclose(b, a, atol=2e-5, err_msg=f"{interp} {ex}/{ey}")
            # bf16 (default, 17x faster on v5e): within ~1 LSB of 8-bit
            c = f.render(img, options=mm.RenderOptions(
                interpolation=interp, edge_x=ex, edge_y=ey, sampler="pallas"))
            np.testing.assert_allclose(c, a, atol=5e-3, err_msg=f"bf16 {interp} {ex}/{ey}")


def test_pallas_overflow_falls_back():
    """Unbounded-displacement warp must trigger the whole-frame fallback and
    still match the gather path exactly."""
    img = _image(8)
    f = mm.compile("origVal(xy * xy)")  # quadratic blowup
    a = f.render(img, options=mm.RenderOptions(sampler="gather"))
    b = f.render(img, options=mm.RenderOptions(
        sampler="pallas", pallas_tiers=((8, 64, 32, 128, 0),),
        pallas_precision="f32"))
    np.testing.assert_allclose(b, a, atol=2e-5)


@pytest.mark.parametrize("hw", [(13, 37), (9, 130), (31, 257)])
def test_pallas_sampler_odd_sizes(hw):
    """Non-tile-aligned output sizes pad/slice correctly in the kernel."""
    h, w = hw
    img = np.random.RandomState(1).rand(h, w, 4).astype(np.float32)
    f = mm.compile("origVal(toXY(ra:[r * 0.9, a + 0.2]))")
    a = f.render(img, options=mm.RenderOptions(sampler="gather"))
    b = f.render(img, options=mm.RenderOptions(sampler="pallas", pallas_precision="f32"))
    np.testing.assert_allclose(b, a, atol=2e-5)


def test_pallas_lut_application_matches_take():
    """Gradient/curve application routed through the MXU sampler (treating
    the LUT as a 1-row image) must match the take-lerp path. XLA's gather
    costs ~6ns/element on TPU — one 4K gradient application measured 56ms —
    so LUT application is a first-class kernel concern (mandelbrot's
    coloring was 10x the cost of its fractal loop, r2 profiling)."""
    src = "filter g (gradient grad) grad((x + X) / W) end"
    f = mm.compile(src)
    a = f.render(np.zeros((24, 40, 4), np.float32),
                 options=mm.RenderOptions(sampler="gather"))
    b = f.render(np.zeros((24, 40, 4), np.float32),
                 options=mm.RenderOptions(sampler="pallas", pallas_precision="f32"))
    np.testing.assert_allclose(b, a, atol=2e-5)
    csrc = "filter c (curve cv) grayColor(cv((x + X) / W)) end"
    fc = mm.compile(csrc)
    a = fc.render(np.zeros((24, 40, 4), np.float32),
                  options=mm.RenderOptions(sampler="gather"))
    b = fc.render(np.zeros((24, 40, 4), np.float32),
                  options=mm.RenderOptions(sampler="pallas", pallas_precision="f32"))
    np.testing.assert_allclose(b, a, atol=2e-5)


def test_prepad_cache_only_for_device_inputs():
    """Host-array inputs must not populate the renderer prepad cache (r2
    review finding: id() of the per-call conversion misses every time and
    pins hundreds of MB per 4K entry)."""
    import jax.numpy as jnp

    img = np.random.RandomState(1).rand(16, 24, 4).astype(np.float32)
    f = mm.compile("origVal(xy)")
    opts = mm.RenderOptions(sampler="pallas", pallas_precision="f32")
    r = f._renderer(24, 16, opts, 1)
    for k in range(3):
        r([img], {}, t=0.1 * k)
    assert len(r._prepad_cache) == 0
    dimg = jnp.asarray(img)
    a = r([dimg], {}, t=0.0)
    b = r([dimg], {}, t=0.0)
    assert len(r._prepad_cache) == 1
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # device-path output matches the host path
    c = r([img], {}, t=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


# ---- per-tile tier selection (pallas_per_tile) ----------------------------

_PT_WINDOWS = dict(pallas_tiers=((8, 256, 32, 96, 0), (8, 64, 32, 112, 0),
                                 (8, 64, 64, 128, 0), (8, 128, 96, 160, 0)))


@pytest.mark.parametrize("path", ["filters/Distorts/twirl.mm",
                                  "filters/Distorts/fisheye.mm"])
def test_per_tile_selection_matches_gather(path):
    """Mixed-warp frames: tiny tier windows force mixed per-tile claims
    (masked fast pass + compacted repair passes); output must match the
    exact gather path at the f32-mode tolerance."""
    img = np.random.RandomState(7).rand(96, 160, 4).astype(np.float32)
    f = mm.compile_file(path)
    a = f.render(img, width=160, height=96, t=0.3,
                 options=mm.RenderOptions(sampler="pallas", pallas_per_tile="on",
                                          pallas_precision="f32", **_PT_WINDOWS))
    b = f.render(img, width=160, height=96, t=0.3,
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_per_tile_interpolations_match_gather():
    img = np.random.RandomState(11).rand(96, 160, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/twirl.mm")
    for interp in ("nearest", "bilinear", "bicubic"):
        a = f.render(img, width=160, height=96, t=0.3,
                     options=mm.RenderOptions(interpolation=interp,
                                              sampler="pallas",
                                              pallas_per_tile="on",
                                              pallas_precision="f32",
                                              **_PT_WINDOWS))
        b = f.render(img, width=160, height=96, t=0.3,
                     options=mm.RenderOptions(interpolation=interp,
                                              sampler="gather"))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=interp)


def test_subwindow_matches_gather():
    """Per-chunk x-sub-windows (pallas_subw): a warp whose x-displacement
    varies across the chunks of one wide fast-tier tile forces distinct
    8-aligned sub-origins; output must match the exact gather path.
    subw=80 is the tightest width that fits a 64-px chunk span (64 + 2
    bilinear taps + up to 7 alignment loss)."""
    img = np.random.RandomState(3).rand(128, 512, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/twirl.mm")
    b = f.render(img, width=512, height=128, t=0.2,
                 options=mm.RenderOptions(sampler="gather"))
    for per_tile in ("off", "on"):
        a = f.render(img, width=512, height=128, t=0.2,
                     options=mm.RenderOptions(
                         sampler="pallas", pallas_precision="f32",
                         pallas_per_tile=per_tile,
                         pallas_tiers=((8, 256, 32, 512, 80),
                                       (8, 64, 128, 128, 0))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"per_tile={per_tile}")


def test_subwindow_overflow_escalates():
    """A sub-window too small for the chunk span must fail the tier's fit
    check and escalate (narrower-tile tiers / gather), never clamp taps."""
    img = np.random.RandomState(9).rand(128, 512, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/twirl.mm")
    a = f.render(img, width=512, height=128, t=0.2,
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_precision="f32",
                                          pallas_per_tile="on",
                                          pallas_tiers=((8, 256, 32, 512, 48),
                                                        (8, 64, 128, 128, 0))))
    b = f.render(img, width=512, height=128, t=0.2,
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_empty_tier_ladder_uses_gather():
    """pallas_tiers=() must degrade cleanly to the exact gather path."""
    img = np.random.RandomState(2).rand(64, 320, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/ripple.mm")
    a = f.render(img, width=320, height=64, t=0.3,
                 options=mm.RenderOptions(sampler="pallas", pallas_tiers=(),
                                          pallas_per_tile="on"))
    b = f.render(img, width=320, height=64, t=0.3,
                 options=mm.RenderOptions(sampler="gather"))
    # both sides are the exact gather; the 1e-5-class residue is XLA
    # fusing the filter math differently on the two grid layouts
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_base_layout_rand_matches_gather_path():
    """Base-block layout (pallas path) must reproduce the gather path's
    per-pixel rand() stream bit-for-bit: the layout rebuilds the global
    pixel index from block/pixel iotas, and a mistake there would shuffle
    the noise field, not just perturb values."""
    img = np.random.RandomState(4).rand(96, 320, 4).astype(np.float32)
    src = "filter rnoise (image in)\n  in(xy + xy:[rand(-3, 3), rand(-3, 3)])\nend"
    f = mm.compile(src)
    a = f.render(img, width=320, height=96, t=0.0,
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_precision="f32"))
    b = f.render(img, width=320, height=96, t=0.0,
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_stacked_supersample_matches_oracle_loop(monkeypatch):
    """The stacked supersampling path (one evaluation over s*s grid
    segments; opt-in — measured slower than the loop on this relay) must
    match the oracle's sequential subsample loop."""
    monkeypatch.setenv("MMTPU_SS_STACK", "1")
    img = np.random.RandomState(8).rand(48, 320, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/twirl.mm")
    opts = mm.RenderOptions(supersample=2, sampler="pallas",
                            pallas_precision="f32")
    a = f.render(img, width=320, height=48, t=0.3, options=opts)
    o = f.render(img, width=320, height=48, t=0.3, interpret=True,
                 options=mm.RenderOptions(supersample=2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=1e-4)


def test_rand_in_while_engine_under_base_layout():
    """rand() inside the in-VMEM while engine under base-block layout:
    the engine's tiled sub-context offsets index INTO the base-layout
    array — rand must decode global pixel ids through them (regression:
    local tile iotas were read as global ids, max diff 0.52 vs gather)."""
    src = ("filter rwb (image in)\n"
           "  i = 0; s = 0;\n"
           "  while i < 3 do s = s + rand(0, 0.2); i = i + 1 end;\n"
           "  in(xy + xy:[s, s])\nend")
    img = np.random.RandomState(12).rand(64, 512, 4).astype(np.float32)
    f = mm.compile(src)
    a = f.render(img, width=512, height=64,
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_precision="f32",
                                          pallas_while="on"))
    b = f.render(img, width=512, height=64,
                 options=mm.RenderOptions(sampler="gather",
                                          pallas_while="off"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_rand_filter_supersample_keeps_sequential_stream():
    """rand() filters must NOT stack (the counter draws once per subsample
    evaluation): jit + supersample must still match the oracle exactly."""
    src = ("filter rss (image in)\n"
           "  grayColor(clamp(gray(in(xy)) * 0.5 + rand(0, 0.5), 0, 1))\nend")
    img = np.random.RandomState(9).rand(32, 96, 4).astype(np.float32)
    f = mm.compile(src)
    opts = mm.RenderOptions(supersample=2, sampler="pallas",
                            pallas_precision="f32")
    a = f.render(img, width=96, height=32, options=opts)
    o = f.render(img, width=96, height=32, interpret=True,
                 options=mm.RenderOptions(supersample=2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=1e-4)


def test_base_layout_supersample_matches_gather_path():
    img = np.random.RandomState(6).rand(64, 320, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/ripple.mm")
    a = f.render(img, width=320, height=64, t=0.4,
                 options=mm.RenderOptions(supersample=2, sampler="pallas",
                                          pallas_precision="f32"))
    b = f.render(img, width=320, height=64, t=0.4,
                 options=mm.RenderOptions(supersample=2, sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
def test_subchunk_tier_spiral_matches_gather(interp):
    """Extreme differential warps (spiral class): the sub-chunk tier
    samples each (8, 16) piece through a square 2-D sub-window of a tall
    tile window. 640x640: the 512-row default window does NOT cover the
    padded image there (engagement verified by tracing the subchunk
    launch). Tolerance 2e-4: the f32 split-float error grows with the
    contraction depth (<=1e-4-class target)."""
    img = np.random.RandomState(3).rand(640, 640, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/spiral_warp.mm")
    a = f.render(img, width=640, height=640, t=0.3, params={"twist": 3.0},
                 options=mm.RenderOptions(interpolation=interp,
                                          sampler="pallas",
                                          pallas_per_tile="on",
                                          pallas_precision="f32"))
    b = f.render(img, width=640, height=640, t=0.3, params={"twist": 3.0},
                 options=mm.RenderOptions(interpolation=interp,
                                          sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("edge", ["wrap", "reflect"])
def test_tiny_image_pallas_edge_behaviors(edge):
    """Review r3: images smaller than the 8-px apron crashed the Pallas
    pad's slice-based wrap/reflect construction; index-based pads handle
    any size >= 1."""
    img = np.random.RandomState(21).rand(4, 6, 4).astype(np.float32)
    f = mm.compile("origVal(xy * 2)")
    opts = mm.RenderOptions(sampler="pallas", pallas_precision="f32",
                            edge_x=edge, edge_y=edge)
    a = f.render(img, width=6, height=4, options=opts)
    b = f.render(img, width=6, height=4,
                 options=mm.RenderOptions(sampler="gather",
                                          edge_x=edge, edge_y=edge))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_nan_coords_fail_tier_fit():
    """Review r3: floor(NaN)'s int-cast sentinel (0 on CPU) passed the
    max-only fit tests, so NaN blocks were silently CLAIMED — the kernel
    clamped the sentinel into its window and fabricated finite values.
    Non-finite stats must fail every fit: finite-coord pixels match the
    gather path exactly, and NaN-coord pixels propagate NaN under
    bilinear weighting exactly where the gather path does (an int-cast
    of NaN has no defined value, so nearest-mode NaN pixels are
    program-dependent in BOTH paths — only the NaN-ness is the spec)."""
    img = np.random.RandomState(22).rand(32, 128, 4).astype(np.float32)
    # sqrt of a negative band -> NaN coords on the lower half
    src = "filter nanwarp (image in)\n  in(xy:[x + sqrt(y), y])\nend"
    f = mm.compile(src)
    a = np.asarray(f.render(img, width=128, height=32,
                            options=mm.RenderOptions(sampler="pallas",
                                                     pallas_per_tile="on",
                                                     pallas_precision="f32")))
    b = np.asarray(f.render(img, width=128, height=32,
                            options=mm.RenderOptions(sampler="gather")))
    nan_a = np.isnan(a).any(axis=-1)
    nan_b = np.isnan(b).any(axis=-1)
    np.testing.assert_array_equal(nan_a, nan_b)
    assert nan_b.any()  # the warp really produced a NaN band
    finite = ~nan_b
    np.testing.assert_allclose(a[finite], b[finite], atol=5e-5)


def test_subchunk_tier_anisotropic_matches_gather():
    """ADVICE r2 (high): the sub-chunk planner's per-piece stats must
    describe the pieces the KERNEL actually samples — (8, 16) strips. An
    anisotropic x-magnification warp (strip x-span 16*3=48 < subw=64 <
    row-pair x-span 64*3=192) distinguishes strip stats from the old
    contiguous (2, 64) row-pair slices: under the mismatch this render
    had max abs error ~1.0; rotational warps (the spiral test) cannot
    tell the two piece shapes apart."""
    img = np.random.RandomState(11).rand(128, 256, 4).astype(np.float32)
    f = mm.compile("filter aniso (image in)\n  in(xy * xy:[3,1])\nend")
    a = f.render(img, width=256, height=128,
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_per_tile="on",
                                          pallas_precision="f32",
                                          pallas_tiers=((8, 64, 96, 512, 64),)))
    b = f.render(img, width=256, height=128,
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_per_tile_unclaimed_falls_back_to_gather():
    """Tiles fitting NO tier window (strong warp, tiny windows everywhere)
    must produce exact results — via the subset patch when few blocks are
    unclaimed, or the whole-frame gather when the patch cap is exceeded."""
    img = np.random.RandomState(5).rand(96, 160, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/twirl.mm")
    a = f.render(img, width=160, height=96, t=0.9,
                 options=mm.RenderOptions(sampler="pallas", pallas_per_tile="on",
                                          pallas_precision="f32",
                                          pallas_tiers=((8, 256, 32, 32, 0),
                                                        (8, 64, 32, 48, 0),
                                                        (8, 64, 32, 64, 0))))
    b = f.render(img, width=160, height=96, t=0.9,
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("band", [0.05, 0.3, 0.8])
def test_subset_patch_capacity_ladder_exact(band):
    """VERDICT r2 weak #5: pin the patch-capacity ladder's behavior as the
    singular fraction grows. A horizontal band of the output warps with a
    huge magnification under wrap edges (source span ~ the whole image ->
    those blocks fit no tier window). 520x1024 = 1040 base blocks, so the
    rungs differentiate (min(n,128) / n/8=130 / n/2=520): band=0.05 (~52
    blocks) lands in the first rung, 0.3 (~312) in the NEW n/2 rung (the
    round-2 2-rung ladder silently sent this whole frame to the gather
    fallback — the cliff), 0.8 (~832) beyond every rung (whole-frame
    exact fallback, kernel pass discarded). All must be exact vs the
    gather path."""
    img = np.random.RandomState(17).rand(256, 1024, 4).astype(np.float32)
    frac = 1.0 - band
    src = f"filter cliff (image in)\n  in(if abs(y) > Y * {frac} then xy * 9999 else xy end)\nend"
    f = mm.compile(src)
    opts = mm.RenderOptions(sampler="pallas", pallas_per_tile="on",
                            pallas_precision="f32",
                            edge_x="wrap", edge_y="wrap")
    a = f.render(img, width=1024, height=520, options=opts)
    b = f.render(img, width=1024, height=520,
                 options=mm.RenderOptions(sampler="gather",
                                          edge_x="wrap", edge_y="wrap"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("path", ["filters/Distorts/polar_invert.mm",
                                  "filters/Distorts/inside_out.mm"])
def test_singular_warp_subset_patch_matches_gather(path):
    """Polar-inversion-class warps: the blocks at the singularity fit no
    tier window and must be PATCHED by the exact subset gather while the
    rest of the frame stays on the kernel tiers (regression: one singular
    tile used to push the whole 4K frame to the ~20 Mpix/s gather).
    512 px wide so the xrot window does NOT cover the padded image (a
    covering window would truncate the ladder and never leave unclaimed
    blocks — verified the subset path engages at this size)."""
    img = np.random.RandomState(15).rand(128, 512, 4).astype(np.float32)
    f = mm.compile_file(path)
    a = f.render(img, width=512, height=128, t=0.2,
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_per_tile="on",
                                          pallas_precision="f32"))
    b = f.render(img, width=512, height=128, t=0.2,
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_renderer_prepad_accepted_by_kernel():
    """The renderer's cached prepad must be ACCEPTED by the kernel's
    shape/dtype/edge acceptance check — drift between compute_prepads and
    the kernel formula (padded_dims/image_dtype) would silently reject
    every cached prepad and repay the pad build per frame with no test
    failure (review r3 finding). Pinned by counting _pad_xmajor calls:
    with a device-resident input the pad builds ONCE (in the renderer's
    pad program), and re-renders build none."""
    import jax.numpy as jnp

    from mathmap_tpu.pallas_kernels import sample_kernel as SK

    img = np.random.RandomState(2).rand(16, 24, 4).astype(np.float32)
    f = mm.compile("origVal(xy)")
    for prec in ("f32", "bf16"):
        opts = mm.RenderOptions(sampler="pallas", pallas_precision=prec)
        r = f._renderer(24, 16, opts, 1)
        dimg = jnp.asarray(img)
        calls = []
        orig = SK._pad_xmajor

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        SK._pad_xmajor = spy
        try:
            _ = r([dimg], {}, t=0.0)     # renderer pad program: 1 build
            n_first = len(calls)
            _ = r([dimg], {}, t=0.01)    # cached prepad: 0 further builds
            assert len(calls) == n_first, (
                f"{prec}: kernel rejected the renderer prepad "
                f"(pad rebuilt in-trace)")
            assert n_first == 1, f"{prec}: expected one pad build, got {n_first}"
        finally:
            SK._pad_xmajor = orig


def test_smem_tier_filter_static():
    """Scalar-prefetch arrays scale with the frame's block grid and can
    overflow the 1 MiB SMEM bank at COMPILE time ("Allocation would
    exceed memory, space=smem, tag='prefetched SMEM operand'" — observed
    live on an 8K render: the sub-chunk tier's (8, n_tiles) coff is
    2,076,672 bytes there). Chain-path launches prefetch full tables, so
    over-budget tiers must be DROPPED there; the per-tile path self-caps
    (run_idx positional launches), so every rung stays available."""
    from mathmap_tpu.pallas_kernels import sample_kernel as SK
    from mathmap_tpu.runtime.options import RenderOptions

    tiers = RenderOptions.pallas_tiers
    schk = (8, 64, 512, 512, 160)
    assert schk in tiers  # the ladder's spiral-class rung

    def kept(h, w, per_tile):
        nby, nbx = -(-h // 8), -(-w // 64)
        hp, wp = SK.padded_dims(h, w)
        return SK._filter_tiers(tiers, nby, nbx, hp, wp, itm=2,
                                per_tile=per_tile)

    # 4K: every tier fits outright on both paths
    assert len(kept(2160, 3840, False)) == len(tiers)
    assert len(kept(2160, 3840, True)) == len(tiers)
    # 8K chain path: exactly the sub-chunk tier is over budget (its
    # (8, n_tiles) coff alone is ~2 MB); every other rung keeps running
    k8 = kept(4320, 7680, False)
    assert len(k8) == len(tiers) - 1
    assert (8, 64, 512, 512, 160) not in k8  # _filter_tiers keeps sw
    # 16K chain path: even the oy/ox pair exceeds SMEM for every rung —
    # it must degrade to the exact gather path, not crash at compile
    assert kept(8640, 15360, False) == []
    # per-tile path: capped positional launches keep the WHOLE ladder at
    # 8K and 16K (only the VMEM window check applies)
    assert len(kept(4320, 7680, True)) == len(tiers)
    assert len(kept(8640, 15360, True)) == len(tiers)

    # footprint formula spot-checks (padded-minor i32 shapes)
    assert SK._smem_table_bytes(64800, 3) == 3 * 64896 * 4
    assert SK._tier_smem_rows(1, 512, 512, 160, 4352, 7696) == (8, False)
    assert SK._tier_smem_rows(4, 32, 512, 128, 4352, 7696) == (4, False)
    assert SK._tier_smem_rows(1, 128, 128, 0, 4352, 7696) == (0, False)


def test_smem_capped_positional_launches_exact(monkeypatch):
    """When a tier's scalar tables exceed the SMEM budget on the per-tile
    path, run_idx splits it into capped POSITIONAL launches (pre-gathered
    scalar slices). Shrink the budget so the 640x640 spiral render's
    sub-chunk tier self-caps — the same split an 8K frame takes with the
    real budget — and require exactness vs the gather path."""
    from mathmap_tpu.pallas_kernels import sample_kernel as SK

    monkeypatch.setattr(SK, "_SMEM_PREFETCH_BUDGET", 30_000)
    img = np.random.RandomState(3).rand(640, 640, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/spiral_warp.mm")
    # schk-only ladder: every fitting block claims the capped tier, so
    # the positional launches (2 at this budget: cap=640 of 800 tiles)
    # carry essentially the whole frame — exactness proves them correct
    a = f.render(img, width=640, height=640, t=0.3, params={"twist": 3.0},
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_per_tile="on",
                                          pallas_precision="f32",
                                          pallas_tiers=((8, 64, 512, 512,
                                                         160),)))
    b = f.render(img, width=640, height=640, t=0.3, params={"twist": 3.0},
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_smem_budget_chain_drop_renders_correct(monkeypatch):
    """Chain path (per-tile off): an over-budget tier is dropped and its
    would-be blocks escalate to the whole-frame exact fallback."""
    from mathmap_tpu.pallas_kernels import sample_kernel as SK

    monkeypatch.setattr(SK, "_SMEM_PREFETCH_BUDGET", 30_000)
    img = np.random.RandomState(4).rand(640, 640, 4).astype(np.float32)
    f = mm.compile_file("filters/Distorts/spiral_warp.mm")
    a = f.render(img, width=640, height=640, t=0.3, params={"twist": 3.0},
                 options=mm.RenderOptions(sampler="pallas",
                                          pallas_per_tile="off",
                                          pallas_precision="f32"))
    b = f.render(img, width=640, height=640, t=0.3, params={"twist": 3.0},
                 options=mm.RenderOptions(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


# ---------------------------------------------------------------------------
# Corner-grid + center supersampling (supersample_scheme='corners')
# ---------------------------------------------------------------------------

_WARP_SRC = "filter w (image in) in(xy + [sin(y/7)*3, cos(x/9)*2]) end"


def _corners_opts(**kw):
    return mm.RenderOptions(supersample=2, supersample_scheme="corners", **kw)


def test_corners_constant_filter_is_exact():
    """Averaging 5 samples of a constant is the constant — the combine's
    1/5 weights must sum to one exactly."""
    f = mm.compile_source("filter c () rgbColor(0.25, 0.5, 0.75) end")
    out = f.render(width=20, height=12, options=_corners_opts())
    assert np.allclose(out[..., :3], [0.25, 0.5, 0.75], atol=1e-6)


def test_corners_linear_gradient_matches_unsampled():
    """A filter LINEAR in pixel coordinates is invariant under any
    unbiased symmetric AA scheme: the 5-point quincunx mean at the pixel
    center equals the center sample. Pins the corner positions at exactly
    (+-0.5, +-0.5) — an offset bias would shift the ramp."""
    src = "filter g () rgba:[(x + X) / W, (Y - y) / H, 0.5, 1] end"
    f = mm.compile_source(src)
    aa = f.render(width=24, height=16, options=_corners_opts())
    plain = f.render(width=24, height=16)
    np.testing.assert_allclose(aa, plain, atol=1e-6)


def test_corners_jit_matches_oracle():
    img = _image(7)
    f = mm.compile_source(_WARP_SRC)
    jit = f.render(img, options=_corners_opts())
    ora = f.render(img, options=_corners_opts(), interpret=True)
    np.testing.assert_allclose(np.asarray(jit), ora, atol=1e-5)


def test_corners_pallas_base_layout_matches_gather():
    """The corner evaluation re-derives its own (H+1, W+1) base-block
    layout; the Pallas path must agree with the exact gather path."""
    img = _image(8)
    f = mm.compile_source(_WARP_SRC)
    a = f.render(img, options=_corners_opts(sampler="pallas",
                                            pallas_precision="f32"))
    b = f.render(img, options=_corners_opts(sampler="gather"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_corners_rand_filter_jit_matches_oracle():
    """The two sequential evaluations must draw DISTINCT rand() streams
    threaded through the shared context (counter copy-back), identically
    in both backends."""
    img = _image(9)
    src = ("filter r (image in) "
           "in(xy) * 0.5 + rand(0, 1) * 0.5 * [1, 1, 1, 0] + [0,0,0,0.0] end")
    f = mm.compile_source(src)
    jit = f.render(img, options=_corners_opts())
    ora = f.render(img, options=_corners_opts(), interpret=True)
    np.testing.assert_allclose(np.asarray(jit), ora, atol=1e-6)


def test_corners_sharded_matches_unsharded():
    img = np.random.RandomState(10).rand(32, 48, 4).astype(np.float32)
    img[..., 3] = 1.0
    f = mm.compile_source(_WARP_SRC)
    sh = f.render_sharded(img, options=_corners_opts())
    un = f.render(img, options=_corners_opts())
    np.testing.assert_allclose(np.asarray(sh), np.asarray(un), atol=1e-6)


def test_corners_tiled_renderer_raises():
    img = _image(11)
    f = mm.compile_source(_WARP_SRC)
    with pytest.raises(ValueError, match="corners"):
        f.render_tiled(img, options=_corners_opts())


def test_corners_differs_from_grid_on_high_frequency():
    """Sanity: the two schemes are genuinely different sample placements
    (a regression to one shared code path would silently equalize them)."""
    img = _image(12)
    f = mm.compile_source(_WARP_SRC)
    c = f.render(img, options=_corners_opts())
    g = f.render(img, options=mm.RenderOptions(supersample=2))
    assert float(np.max(np.abs(np.asarray(c) - np.asarray(g)))) > 1e-3


def test_supersample_scheme_validation():
    with pytest.raises(ValueError, match="supersample_scheme"):
        mm.RenderOptions(supersample_scheme="hexagonal")
