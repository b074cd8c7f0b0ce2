"""Real-TPU drive matrix: one small render per PATH COMBINATION, checked
against the NumPy oracle (the language spec) in-process.

    python - < benchmarks/tpu_drive_matrix.py        # from the repo cwd

Why this exists: interpret-mode tests cannot catch TPU-only divergence
classes (Mosaic lowering rejections, relayout/addressing bugs, bf16
envelope breaches). The round-3 tiled-route bug (reflected bottom rows
mirrored by make_gather's mod-global localization) was found ONLY by a
real-TPU drive — this script systematizes that: every distinct execution
path (sampler tier classes, per-tile claims, subset patching, LUTs,
noise, specials, while engine, static unroll, animated inputs, batch,
tiled/halo) gets one hardware render per round.

Each config is one remote jit compile (~10-60 s at 256 px); the full
matrix is ~10-20 min. Tolerances (hardware-calibrated round 3 — see
docs/PERFORMANCE.md "Precision modes"): the bf16 Pallas envelope is
INTERPOLATION-DEPENDENT — 'bf16n' nearest 2.5e-3 (pure value-rounding
2^-9), 'bf16' bilinear/LUT 7e-3, 'bf16c' bicubic 9e-3 (negative lobes
raise sum|w| ~1.2); 'f32' = XLA-vs-NumPy transcendental rounding (2e-4);
'iter' = escape-time fractals where +/-1 iteration near the boundary
jumps a gradient step (bounded FRACTION of differing pixels, the
documented |delta iter|<=1 class); 'exact' = 1e-5.

Replaces: the reference's on-device acceptance testing of generated code
(mathmap_common.c render loop driven per filter) [unverified -- mount
empty].
"""

import sys
import time

import numpy as np


SIZE = 256


def _img(seed=7, frames=0):
    h = w = SIZE
    if frames:
        a = np.random.RandomState(seed).rand(frames, h, w, 4).astype(np.float32)
        a[..., 3] = 1.0
        return a
    a = np.random.RandomState(seed).rand(h, w, 4).astype(np.float32)
    a[..., 3] = 1.0
    return a


def main():
    import mathmap_tpu as mm

    results = []

    def check(name, got, want, mode):
        d = np.abs(np.asarray(got) - np.asarray(want))
        mx = float(d.max())
        if mode == "iter":
            frac = float((d.max(-1) > 1e-2).mean())
            ok = frac < 0.02
            line = f"{name}: frac>{1e-2}={frac:.4f} max={mx:.3g} {'OK' if ok else 'FAIL'}"
        else:
            tol = {"bf16n": 2.5e-3, "bf16": 7e-3, "bf16c": 9e-3,
                   "f32": 2e-4, "exact": 1e-5}[mode]
            ok = mx <= tol
            line = f"{name}: max={mx:.3g} tol={tol:g} {'OK' if ok else 'FAIL'}"
        print(line, flush=True)
        results.append((name, ok))

    def drive(name, src_or_path, mode, opts=None, inputs=(), params=None,
              t=0.0):
        t0 = time.time()
        try:
            f = (mm.compile_file(src_or_path) if src_or_path.endswith(".mm")
                 else mm.compile(src_or_path))
            got = f.render(*inputs, width=SIZE, height=SIZE, t=t,
                           options=opts, params=params)
            want = f.render(*inputs, width=SIZE, height=SIZE, t=t,
                            options=opts, params=params, interpret=True)
        except Exception as e:  # a crash IS a finding — record and move on
            print(f"{name}: EXCEPTION {type(e).__name__}: {e}", flush=True)
            results.append((name, False))
            return
        check(f"{name} [{time.time()-t0:.0f}s]", got, want, mode)

    O = mm.RenderOptions
    img = _img()

    # --- sampler tier classes (bf16 kernel on TPU via sampler auto) ---
    drive("twirl/bilinear/default", "filters/Distorts/twirl.mm", "bf16",
          inputs=(img,), t=0.8)
    drive("twirl/bicubic/wrap", "filters/Distorts/twirl.mm", "bf16c",
          O(interpolation="bicubic", edge_x="wrap", edge_y="wrap"),
          inputs=(img,), t=0.8)
    drive("fisheye/nearest/mixed-edges", "filters/Distorts/fisheye.mm",
          "bf16n", O(interpolation="nearest", edge_x="reflect",
                    edge_y="color", edge_color=(0.1, 0.2, 0.3, 1.0)),
          inputs=(img,))
    drive("pond/f32", "filters/Distorts/pond.mm", "f32",
          O(pallas_precision="f32"), inputs=(img,), t=0.4)
    drive("twirl/per-tile-on", "filters/Distorts/twirl.mm", "bf16",
          O(pallas_per_tile="on"), inputs=(img,), t=0.8)
    drive("polar_invert/subset-patch", "filters/Distorts/polar_invert.mm",
          "bf16", inputs=(img,))
    drive("aniso/sub-chunk-tier",
          "filter f (image in) in(xy * xy:[3,1]) end", "f32",
          O(pallas_precision="f32"), inputs=(img,))

    # --- region (selection) render: oracle parity at a deliberately
    # unaligned origin, plus jit-vs-jit bitwise crop equality on-device ---
    REG = (97, 33, 130, 41)
    drive("twirl/region", "filters/Distorts/twirl.mm", "bf16",
          O(region=REG), inputs=(img,), t=0.8)
    try:
        t0 = time.time()
        f = mm.compile_file("filters/Distorts/twirl.mm")
        full = f.render(img, width=SIZE, height=SIZE, t=0.8)
        reg = f.render(img, width=SIZE, height=SIZE, t=0.8,
                       options=O(region=REG))
        rx, ry, rw, rh = REG
        same = np.array_equal(np.asarray(reg),
                              np.asarray(full)[ry:ry+rh, rx:rx+rw])
        print(f"region/crop-bitwise [{time.time()-t0:.0f}s]: "
              f"{'OK' if same else 'FAIL'}", flush=True)
        results.append(("region/crop-bitwise", same))
    except Exception as e:
        print(f"region/crop-bitwise: EXCEPTION {type(e).__name__}: {e}",
              flush=True)
        results.append(("region/crop-bitwise", False))

    # --- LUT application (gradient/curve through the MXU kernel) ---
    drive("gradient_map/LUT", "filters/Colors/gradient_map.mm", "bf16",
          inputs=(img,))
    drive("curve_adjust/LUT", "filters/Colors/curve_adjust.mm", "bf16",
          inputs=(img,))

    # --- ops families (XLA elementwise vs NumPy oracle) ---
    drive("clouds/noise", "filters/Noise/clouds.mm", "f32")
    drive("elliptic_rings/specials", "filters/Render/elliptic_rings.mm",
          "f32")
    drive("newton/complex-loop", "filters/Render/newton.mm", "iter")

    # --- loop engines ---
    drive("mandelbrot/while-engine", "filters/Render/mandelbrot.mm", "iter")
    drive("quat_julia/while-quat", "filters/Render/quat_julia.mm", "iter")
    drive("lissajous/static-unroll", "filters/Render/lissajous.mm", "f32")

    # --- animated input (frame-indexed sampling) ---
    anim = _img(9, frames=3)
    # nearest + scalar frame stays on the Pallas kernel on TPU -> the
    # bf16 value-rounding envelope, not exact
    drive("animated/origValXY-frame", "origValXY(x, y, 1)", "bf16n",
          O(interpolation="nearest"), inputs=(anim,))


    # --- supersampling / baked params / composition chains ---
    drive("twirl/supersample-2x2", "filters/Distorts/twirl.mm", "bf16",
          O(supersample=2), inputs=(img,), t=0.8)
    drive("twirl/static-params-baked", "filters/Distorts/twirl.mm", "bf16",
          O(static_params=("angle",)), inputs=(img,),
          params={"angle": 2.5}, t=0.8)
    try:
        from mathmap_tpu.expression_db import default_db

        fmmc = default_db().compile("frost_glass")
        got = fmmc.render(img, width=SIZE, height=SIZE)
        want = fmmc.render(img, width=SIZE, height=SIZE, interpret=True)
        check("frost_glass/.mmc-chain", got, want, "bf16")
    except Exception as e:
        print(f"frost_glass/.mmc-chain: EXCEPTION {type(e).__name__}: {e}",
              flush=True)
        results.append(("frost_glass/.mmc-chain", False))

    # --- render_batch: jit-vs-jit self-consistency (no oracle) ---
    try:
        f = mm.compile_file("filters/Distorts/ripple.mm")
        stack = np.stack([_img(s) for s in (1, 2, 3, 4)])
        ts = [0.0, 0.3, 0.6, 0.9]
        got = np.asarray(f.render_batch(stack, ts=ts))
        want = np.stack([np.asarray(f.render(stack[i], t=ts[i]))
                         for i in range(4)])
        # jit-vs-jit: the batch program fuses coords differently than the
        # lone-render program (f32 rounding), not bitwise
        check("render_batch/4-jobs", got, want, "f32")
    except Exception as e:
        print(f"render_batch/4-jobs: EXCEPTION {type(e).__name__}: {e}",
              flush=True)
        results.append(("render_batch/4-jobs", False))

    # --- tiled/halo on the 1-device mesh (the round-3 bug's path) ---
    try:
        from mathmap_tpu.parallel.halo import TiledRenderer
        from mathmap_tpu.parallel.mesh import make_mesh

        src = "origVal(xy + xy:[6 * sin(y / 19), 5 * cos(x / 23 + t)])"
        f = mm.compile(src)
        opts = O(edge_x="wrap", edge_y="reflect")
        r = TiledRenderer(make_mesh(1, 1, 1), f.filters, f.fdef, SIZE, SIZE,
                          opts, 8)
        got = np.asarray(r(img, t=0.3))
        want = f.render(img, width=SIZE, height=SIZE, t=0.3, options=opts,
                        interpret=True)
        check("tiled-1dev/wrap-reflect", got, want, "bf16")
    except Exception as e:
        print(f"tiled-1dev/wrap-reflect: EXCEPTION {type(e).__name__}: {e}",
              flush=True)
        results.append(("tiled-1dev/wrap-reflect", False))

    # --- tiled/halo with an ANIMATED stack (frame-selects the sharded
    # block before the Pallas route; frame-axis halo machinery) ---
    try:
        stack = np.stack([img, img[::-1]])
        src = "origVal(xy + xy:[5 * sin(y / 17), 4 * cos(x / 21)])"
        f = mm.compile(src)
        opts = O(edge_x="wrap", edge_y="reflect")
        r = TiledRenderer(make_mesh(1, 1, 1), f.filters, f.fdef, SIZE, SIZE,
                          opts, 8)
        got = np.asarray(r(stack, frame=1.0))
        want = f.render(stack, width=SIZE, height=SIZE, frame=1.0,
                        options=opts, interpret=True)
        check("tiled-1dev/animated-frame", got, want, "bf16")
    except Exception as e:
        print(f"tiled-1dev/animated-frame: EXCEPTION {type(e).__name__}: "
              f"{e}", flush=True)
        results.append(("tiled-1dev/animated-frame", False))

    # --- region x tiled (r5): the sharded-drawable selection semantics —
    # full-canvas output, selection == the single-chip region render's
    # crop (bf16 envelope: different block bases), pass-through == the
    # input bytes BITWISE (u8 io: the exact-u8 path through the dynamic
    # evaluation window) ---
    try:
        u8 = (np.random.RandomState(31).rand(SIZE, SIZE, 4) * 255
              ).astype(np.uint8)
        rx, ry, rw, rh = 41, 97, 90, 70
        src = "origVal(xy + xy:[5 * sin(y / 17), 4 * cos(x / 21)])"
        f = mm.compile(src)
        opts = O(region=(rx, ry, rw, rh), output_dtype="uint8")
        r = TiledRenderer(make_mesh(1, 1, 1), f.filters, f.fdef, SIZE, SIZE,
                          opts, 8)
        t0 = time.time()
        got = np.asarray(r(u8))
        crop = np.asarray(f.render(
            u8, width=SIZE, height=SIZE,
            options=O(region=(rx, ry, rw, rh), output_dtype="uint8")))
        # tiled-vs-plain is a TOLERANCE bar (per-block coordinate rebase,
        # ~7e-6 float -> <=1 u8 count), not bitwise (CLAUDE.md)
        d = np.abs(got[ry:ry+rh, rx:rx+rw].astype(np.int16)
                   - crop.astype(np.int16))
        sel_ok = int(d.max()) <= 1
        mask = np.zeros((SIZE, SIZE, 1), bool)
        mask[ry:ry+rh, rx:rx+rw] = True
        pass_ok = np.array_equal(np.where(mask, u8, got), u8)
        ok = sel_ok and pass_ok
        print(f"tiled-region/u8-inplace [{time.time()-t0:.0f}s]: "
              f"sel={'OK' if sel_ok else 'FAIL'} "
              f"passthrough={'OK' if pass_ok else 'FAIL'}", flush=True)
        results.append(("tiled-region/u8-inplace", ok))
    except Exception as e:
        print(f"tiled-region/u8-inplace: EXCEPTION {type(e).__name__}: {e}",
              flush=True)
        results.append(("tiled-region/u8-inplace", False))

    # --- AOT artifact (export -> load -> render, incl. the batched
    # program): must be BIT-identical to the live renderer on hardware
    # (generators/artifact.py's headline claim) ---
    try:
        import tempfile

        from mathmap_tpu.generators.artifact import (export_artifact,
                                                     load_artifact)

        src = ("filter tw (image in, float angle: -10-10 (3)) "
               "in(toXY(ra:[r, a + angle * (1 - r / R) ^ 2])) end")
        f = mm.compile(src)
        p = tempfile.mktemp(suffix=".mmxa")
        export_artifact(f, p, SIZE, SIZE, params={"angle": 3.0},
                        batch_sizes=(2,))
        art = load_artifact(p)
        got = art.render(img, params={"angle": 2.5}, t=0.1)
        want = np.asarray(f.render(img, width=SIZE, height=SIZE, t=0.1,
                                   params={"angle": 2.5}))
        check("artifact/single", got, want, "exact")
        stack = np.stack([img, img[::-1]])
        plist = [{"angle": 1.0}, {"angle": 4.0}]
        gb = art.render_batch(stack, params=plist, ts=[0.0, 0.3])
        wb = np.asarray(f.render_batch(stack, ts=np.asarray([0.0, 0.3]),
                                       width=SIZE, height=SIZE,
                                       params=plist))
        check("artifact/batch-2", gb, wb, "exact")
    except Exception as e:
        print(f"artifact: EXCEPTION {type(e).__name__}: {e}", flush=True)
        results.append(("artifact", False))

    n_fail = sum(1 for _, ok in results if not ok)
    print(f"== {len(results)} configs, {n_fail} failures ==", flush=True)
    return 1 if n_fail else 0


sys.exit(main())
