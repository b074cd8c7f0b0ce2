"""Probe: two-pass shear/separable rotation formulation (VERDICT r4 item 1).

The last unexplored formulation-level idea for the rotation class. The
r4 M-row cost model (docs/PERFORMANCE.md: kernel cost tracks M = win_h*4
matmul/VPU rows, NOT window area, K nearly free) suggests a column-group
SHEARED window: split the window's `win_w` source columns into G groups,
DMA each group at its own 8-aligned row base d_g (the 4-copy row-shifted
prepad already gives 8-row origin granularity), and run the x-contraction
per group against a SHORT (win_h_sh << win_h) window, applying the
per-group y-weights at offset d_g before the channel reduce. This is
EXACT (unlike classic Catmull-Smith two-shear resampling, which computes
different pixel values than direct bilinear and would fail the
oracle-is-spec invariant): every tap contributes once, with its true
bilinear weight — a pixel whose two x-taps straddle a group boundary
gets each tap from its own group at that group's offset.

The math says it CANNOT win. The footprint of an (8,64) block under a
linear warp is a band: win_h ~= slope*x_span + t0 (t0 = the 8-output-row
thickness + taps). Per-group sheared height = slope*Wg + t0 + 8 (quant),
so

    sum_g win_h_sh(g) = slope*win_w + G*(t0 + 8) >= win_h + (G-1)*t0 + 8G

i.e. ANY G > 1 processes MORE total M-rows than the direct bounding box
(G = 1 IS the direct kernel). Since measured cost ∝ total M-rows, shear
loses unless G smaller matmuls are somehow cheaper per row. THIS PROBE
MEASURES THAT RESIDUAL QUESTION: an equal-total-rows control
(G=2, win_h_sh=64: 2*64*4 = 512 rows = direct 128x128's M) isolates the
per-group overhead (G DMAs, G matmuls at K=Wg, G weight builds + reduces)
at zero row advantage, and a G=4, win_h_sh=64 variant measures the
rows-doubled regime. If the control is >= direct (expected), the shear
family is dead: it can never reach fewer rows than direct (the identity
above), and at equal rows it already pays more.

Geometry: synthetic linear rotation-class blocks (dpy/dc ~ 1.0-1.1,
dpx/dc ~ 1.6) whose direct window is the real (128,128) rung (y-span
~70-80 > 64) and whose per-group taps provably fit win_h_sh=64 after
8-alignment — host-verified per tile per group. Exactness asserted vs
the direct kernel (same taps, same weights — diffs are f32 reassociation
only) and both vs a NumPy bilinear reference on the same prepad.

Run from repo cwd:  timeout 3600 python - < benchmarks/probe_rot_shear.py
Lowering-only (local, no TPU):  ... --lower-only
Reference: origVal inner loop, opmacros.h [unverified - mount empty],
SURVEY §3.6 hot-loop #2.
"""

import argparse
import sys
import time

import numpy as np

H_IMG = W_IMG = 512
N_TILES = 8192
N_CHECK = 1024          # separate small program for the exactness check
CALLS = 8               # pipelined dispatches per fence (CLAUDE.md)
ROUNDS = 4
WIN_W = 128
WIN_H_DIRECT = 128

SHEAR_VARIANTS = [
    # name          G   win_h_sh   (total rows = G*win_h_sh*4)
    ("shear2x64",   2,  64),       # 512 rows — EQUAL-ROWS control
    ("shear4x64",   4,  64),       # 1024 rows — rows-doubled regime
]


def make_shear_kernel(win_w, win_h_sh, G, hp):
    """Column-group sheared-window kernel (bilinear, bf16, gw=1 tiles).

    Mirrors the product kernel's structure (sample_kernel._make_kernel:
    double-buffered manual DMA, triangle weight build, matmul + y-weight
    + channel reduce) with the window split into G column groups, each
    DMA'd at its own scalar-prefetched absolute row base syg[g, tile]
    (multiple of 8 — the N_COPIES row-shifted prepad trick, same lane
    arithmetic as the product's window_dma)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mathmap_tpu.pallas_kernels.sample_kernel import BASE_PIX, N_COPIES

    Wg = win_w // G
    dn = (((0,), (0,)), ((), ()))
    dn_sel = (((1,), (0,)), ((), ()))

    def chan_reduce(prod, rows):
        # tree-halve to <=128 rows, then the tiny one-hot sel matmul
        # (the product's rot-shape reduce; see sample_kernel.chan_reduce)
        h = rows
        acc = prod
        while h > 128 and h % 2 == 0 and (h // 2) % 8 == 0:
            half = h // 2
            acc = acc[0:half, :] + acc[half:h, :]
            h = half
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (4, h), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (4, h), 0)
        sel = ((rows_i - (rows_i // 4) * 4) == cidx).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            sel, acc.astype(jnp.bfloat16), dimension_numbers=dn_sel,
            preferred_element_type=jnp.float32)

    def kernel(syg_ref, ox_ref, px_ref, py_ref, img_ref, o_ref, win2, sems):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        slot = j % 2

        def dma(tj, g, s):
            oyr = syg_ref[g, tj]
            oxr = ox_ref[0, tj]
            oyv = pl.multiple_of(oyr, 8)
            oxv = pl.multiple_of(oxr, 16)
            m = oyv // 8
            cc = m % N_COPIES
            lane = pl.multiple_of(
                cc * (hp * 4) + (m // N_COPIES) * 128, 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(oxv + g * Wg, Wg),
                           pl.ds(lane, win_h_sh * 4)],
                win2.at[s, g * Wg:(g + 1) * Wg, :],
                sems.at[s, g])

        @pl.when(j == 0)
        def _():
            for g in range(G):
                dma(0, g, 0).start()

        @pl.when(j + 1 < nj)
        def _():
            for g in range(G):
                dma(j + 1, g, (j + 1) % 2).start()

        for g in range(G):
            dma(j, g, slot).wait()

        px = px_ref[0, 0:1, :]
        py = py_ref[0, 0:1, :]
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (win_w, BASE_PIX), 0)
        lx = jnp.clip(x0.astype(jnp.int32) - ox_ref[0, j], 0, win_w - 2)
        px_loc = lx.astype(jnp.float32) + fx
        ox_mat = jnp.maximum(
            0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc))
        iota_h4 = jax.lax.broadcasted_iota(
            jnp.int32, (win_h_sh * 4, BASE_PIX), 0)
        r_of_row = iota_h4 // 4

        acc4 = jnp.zeros((4, BASE_PIX), jnp.float32)
        for g in range(G):
            win_g = win2[slot, g * Wg:(g + 1) * Wg, :]
            oxm_g = ox_mat[g * Wg:(g + 1) * Wg, :]
            tmp = jax.lax.dot_general(
                win_g, oxm_g.astype(jnp.bfloat16), dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            ly = jnp.clip(y0.astype(jnp.int32) - syg_ref[g, j],
                          0, win_h_sh - 2)
            py_loc = ly.astype(jnp.float32) + fy
            oy_mat4 = jnp.maximum(
                0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc))
            acc4 = acc4 + chan_reduce(tmp * oy_mat4, win_h_sh * 4)
        o_ref[0, :, :] = acc4

    return kernel


def call_shear(img_xm, px_b, py_b, syg, ox, *, win_w, win_h_sh, G, hp,
               interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mathmap_tpu.pallas_kernels.sample_kernel import BASE_PIX

    n_tiles = px_b.shape[0]
    kernel = make_shear_kernel(win_w, win_h_sh, G, hp)

    def blk(i, j, *_):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, BASE_PIX), blk),
            pl.BlockSpec((1, 1, BASE_PIX), blk),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 4, BASE_PIX), blk),
        scratch_shapes=[
            pltpu.VMEM((2, win_w, win_h_sh * 4), img_xm.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, BASE_PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * win_w * (win_h_sh * 4) * BASE_PIX * n_tiles,
            bytes_accessed=(win_w * win_h_sh * 4 * img_xm.dtype.itemsize
                            ) * n_tiles + 16 * n_tiles * BASE_PIX,
            transcendentals=0,
        ),
    )(syg, ox, px_b, py_b, img_xm)


def build_tiles(n, hp, wp, rng):
    """Linear rotation-class blocks: direct window = the (128,128) rung
    (y-span 70-80 > the 64-rung), per-group taps provably fit
    win_h_sh=64 after 8-alignment. Returns coords + per-variant group
    row bases, all host-verified."""
    from mathmap_tpu.pallas_kernels.sample_kernel import BASE_PIX

    cols = np.arange(64, dtype=np.float64)
    rows = np.arange(8, dtype=np.float64)
    a = 1.55 + 0.15 * rng.rand(n, 1, 1)      # dpx/dc
    s = 0.95 + 0.15 * rng.rand(n, 1, 1)      # dpy/dc
    myy = 0.9 + 0.2 * rng.rand(n, 1, 1)      # dpy/dr
    mxy = -0.2 * rng.rand(n, 1, 1)           # dpx/dr
    cx = 12 + rng.rand(n, 1, 1) * (wp - WIN_W - 24)
    cy = 12 + rng.rand(n, 1, 1) * (hp - WIN_H_DIRECT - 24)
    px = cx + a * cols[None, None, :] + mxy * rows[None, :, None]
    py = cy + s * cols[None, None, :] + myy * rows[None, :, None]

    x0 = np.floor(px).astype(np.int64)
    y0 = np.floor(py).astype(np.int64)
    ox = ((x0.min(axis=(1, 2)) - 2) // 16) * 16
    oy = ((y0.min(axis=(1, 2)) - 2) // 8) * 8
    ox = np.clip(ox, 0, wp - WIN_W)
    oy = np.clip(oy, 0, hp - WIN_H_DIRECT)
    assert (x0.max(axis=(1, 2)) + 1 - ox <= WIN_W - 1).all(), "x fit"
    assert (y0.max(axis=(1, 2)) + 1 - oy <= WIN_H_DIRECT - 1).all(), "y fit"
    assert (x0.min(axis=(1, 2)) - ox >= 0).all()
    assert (y0.min(axis=(1, 2)) - oy >= 0).all()

    sygs = {}
    for name, G, wh_sh in SHEAR_VARIANTS:
        Wg = WIN_W // G
        syg = np.zeros((G, n), np.int64)
        for g in range(G):
            glo = ox + g * Wg
            ghi = ox + (g + 1) * Wg
            # pixels with ANY x-tap (x0 or x0+1) in group g's columns
            used = (((x0 >= glo[:, None, None]) & (x0 < ghi[:, None, None]))
                    | ((x0 + 1 >= glo[:, None, None])
                       & (x0 + 1 < ghi[:, None, None])))
            ymin = np.where(used, y0, np.int64(1 << 40)).min(axis=(1, 2))
            ymax = np.where(used, y0 + 1, np.int64(-1)).max(axis=(1, 2))
            none_used = ymax < 0
            ymin = np.where(none_used, oy, ymin)
            ymax = np.where(none_used, oy, ymax)
            d = ((ymin - oy) // 8) * 8
            d = np.minimum(d, WIN_H_DIRECT - wh_sh)  # stay inside prepad rows
            assert (ymax - (oy + d) <= wh_sh - 1).all(), \
                f"{name} group {g} taps exceed win_h_sh"
            syg[g] = oy + d
        sygs[name] = syg[:, :].astype(np.int32)

    # flatten to kernel layout
    pxb = px.reshape(n, 1, BASE_PIX).astype(np.float32)
    pyb = py.reshape(n, 1, BASE_PIX).astype(np.float32)
    return (pxb, pyb, oy[None, :].astype(np.int32),
            ox[None, :].astype(np.int32), sygs)


def reference_bilinear(padded, pxb, pyb):
    """NumPy f64 bilinear on the padded image at padded-space coords."""
    x0 = np.floor(pxb[:, 0, :]).astype(np.int64)
    y0 = np.floor(pyb[:, 0, :]).astype(np.int64)
    fx = (pxb[:, 0, :] - x0)[..., None]
    fy = (pyb[:, 0, :] - y0)[..., None]
    p00 = padded[y0, x0]
    p01 = padded[y0, x0 + 1]
    p10 = padded[y0 + 1, x0]
    p11 = padded[y0 + 1, x0 + 1]
    out = ((1 - fy) * ((1 - fx) * p00 + fx * p01)
           + fy * ((1 - fx) * p10 + fx * p11))
    return out.transpose(0, 2, 1)  # (n, 4, 512)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lower-only", action="store_true")
    ap.add_argument("--interpret-check", action="store_true",
                    help="run the exactness check in interpret mode (CPU)")
    ap.add_argument("--tiles", type=int, default=N_TILES)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.interpret_check:
        # interpret mode runs on CPU; --lower-only must KEEP the TPU
        # platform (.lower() is local there — no remote compile)
        jax.config.update("jax_platforms", "cpu")

    from mathmap_tpu.pallas_kernels.sample_kernel import (
        BASE_PIX, N_COPIES, _call_kernel_tiles, _pad_xmajor, padded_dims)

    hp, wp = padded_dims(H_IMG, W_IMG)
    rng = np.random.RandomState(11)
    base_img = rng.rand(H_IMG, W_IMG, 4).astype(np.float32)
    # build the prepad HOST-SIDE (numpy + ml_dtypes bf16): _pad_xmajor's
    # module arg ducks — running it through jnp would push the pad build
    # over the relay before the probe even starts
    import ml_dtypes
    img_xm_np = np.asarray(_pad_xmajor(
        np, base_img, "clamp", "clamp", (0, 0, 0, 1), hp, wp,
        dtype=ml_dtypes.bfloat16))
    # copy 0 holds padded rows [0, hp): reconstruct (hp, wp, 4) reference
    padded = (img_xm_np[:, : hp * 4].astype(np.float64)
              .reshape(wp, hp, 4).transpose(1, 0, 2))

    if args.lower_only:
        pxb, pyb, oy, ox, sygs = build_tiles(8, hp, wp, rng)
        for name, G, wh_sh in SHEAR_VARIANTS:
            def f(img, px_, py_, syg_, ox_, G=G, wh_sh=wh_sh):
                return call_shear(img, px_, py_, syg_, ox_, win_w=WIN_W,
                                  win_h_sh=wh_sh, G=G, hp=hp)
            try:
                jax.jit(f).lower(
                    jax.ShapeDtypeStruct(img_xm_np.shape, jnp.bfloat16),
                    jax.ShapeDtypeStruct(pxb.shape, jnp.float32),
                    jax.ShapeDtypeStruct(pyb.shape, jnp.float32),
                    jax.ShapeDtypeStruct(sygs[name].shape, jnp.int32),
                    jax.ShapeDtypeStruct(ox.shape, jnp.int32))
                print(f"# LOWER OK   {name}", flush=True)
            except Exception as e:
                print(f"# LOWER FAIL {name}: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
        return

    # ---- exactness check (small program) --------------------------------
    pxb, pyb, oy, ox, sygs = build_tiles(N_CHECK, hp, wp, rng)
    img_xm = jax.device_put(jnp.asarray(img_xm_np))
    interp = args.interpret_check
    ref = reference_bilinear(padded, pxb, pyb)

    t0 = time.perf_counter()
    direct = np.asarray(_call_kernel_tiles(
        img_xm, jnp.asarray(pxb), jnp.asarray(pyb), jnp.asarray(oy),
        jnp.asarray(ox), interpolation="bilinear", win_h=WIN_H_DIRECT,
        win_w=WIN_W, gw=1, hp=hp, precision="bf16", interpret=interp,
        grid=(1, N_CHECK)))
    err_d = np.abs(direct - ref).max()
    print(f"# direct128 vs numpy ref: max {err_d:.2e} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    assert err_d < 2e-2, "direct kernel out of bf16 envelope?"

    for name, G, wh_sh in SHEAR_VARIANTS:
        t0 = time.perf_counter()
        sh = np.asarray(call_shear(
            img_xm, jnp.asarray(pxb), jnp.asarray(pyb),
            jnp.asarray(sygs[name]), jnp.asarray(ox), win_w=WIN_W,
            win_h_sh=wh_sh, G=G, hp=hp, interpret=interp))
        err_r = np.abs(sh - ref).max()
        err_x = np.abs(sh - direct).max()
        print(f"# {name} vs ref: max {err_r:.2e}; vs direct: max "
              f"{err_x:.2e} ({time.perf_counter() - t0:.0f}s)", flush=True)
        assert err_r < 2e-2, f"{name} out of envelope"
        # same taps, same weights; a group-straddling pixel rounds each
        # tap's product to bf16 before the cross-group add where direct
        # x-mixes both taps in the MXU's f32 accumulator first — so the
        # cross-diff is bf16-envelope reassociation (measured 4.15e-3,
        # same magnitude as either kernel vs the f64 ref), not a bug
        assert err_x < 1.5e-2, f"{name} is not the same computation"
    if interp:
        print("# interpret-mode exactness OK (no timing on CPU)")
        return

    # ---- timing (interleaved rounds, device-fenced) ----------------------
    n_tiles = args.tiles
    pxb, pyb, oy, ox, sygs = build_tiles(n_tiles, hp, wp, rng)
    dev = {k: jax.device_put(jnp.asarray(v)) for k, v in
           dict(px=pxb, py=pyb, oy=oy, ox=ox).items()}
    dev_syg = {name: jax.device_put(jnp.asarray(syg))
               for name, syg in sygs.items()}

    fns = {}

    def f_direct(img, px_, py_, oy_, ox_, salt):
        out = _call_kernel_tiles(
            img, px_ + salt, py_, oy_, ox_, interpolation="bilinear",
            win_h=WIN_H_DIRECT, win_w=WIN_W, gw=1, hp=hp, precision="bf16",
            interpret=False, grid=(1, n_tiles))
        return jnp.sum(out)

    fns["direct128"] = (jax.jit(f_direct),
                        lambda salt, f: f(img_xm, dev["px"], dev["py"],
                                          dev["oy"], dev["ox"], salt))
    for name, G, wh_sh in SHEAR_VARIANTS:
        def f_sh(img, px_, py_, syg_, ox_, salt, G=G, wh_sh=wh_sh):
            out = call_shear(img, px_ + salt, py_, syg_, ox_, win_w=WIN_W,
                             win_h_sh=wh_sh, G=G, hp=hp)
            return jnp.sum(out)
        fns[name] = (jax.jit(f_sh),
                     lambda salt, f, name=name: f(
                         img_xm, dev["px"], dev["py"], dev_syg[name],
                         dev["ox"], salt))

    for name in list(fns):
        f, call = fns[name]
        t0 = time.perf_counter()
        try:
            float(call(0.0, f))
        except Exception as e:
            print(f"# COMPILE FAIL {name}: {str(e).splitlines()[0][:140]}",
                  file=sys.stderr, flush=True)
            del fns[name]
            continue
        print(f"# compiled+warm {name}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    best = {name: float("inf") for name in fns}
    mpix_per_call = n_tiles * BASE_PIX / 1e6
    for rd in range(ROUNDS):
        for name, (f, call) in fns.items():
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for c in range(CALLS):
                acc = acc + call(1e-3 * (rd * CALLS + c + 1), f)
            float(acc)
            dt = (time.perf_counter() - t0) / CALLS
            best[name] = min(best[name], dt)
            print(f"round {rd} {name:10s} {dt * 1e3:7.2f} ms/call  "
                  f"{mpix_per_call / dt:7.1f} Mpix/s", flush=True)

    import json
    print("\n# BEST (min over interleaved rounds):", flush=True)
    out = {}
    for name in fns:
        out[name] = {"ms": round(best[name] * 1e3, 2),
                     "mpix_s": round(mpix_per_call / best[name], 1)}
        print(f"#   {name:10s} {best[name] * 1e3:7.2f} ms  "
              f"{out[name]['mpix_s']:7.1f} Mpix/s")
    print(json.dumps(out))


main()
