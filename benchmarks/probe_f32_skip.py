"""Probe: dynamic third-contraction skip for strict-f32 on FLOAT inputs
(VERDICT r4 item 9 — the last open strict-f32 idea, measured shut).

The f32 split-float mode computes win @ w ~= hi(win)@hi(w) +
hi(win)@lo(w) + lo(win)@hi(w). The exact-u8 path skips the THIRD pass
STATICALLY (integer-valued bf16 windows have lo == 0). The residual
idea (VERDICT r3 #7 -> r4 #9): a DYNAMIC per-tile skip for float
inputs whose window happens to have lo == 0.

Two measurements close it:

1. The ALWAYS-FIRES upper bound: this probe times the rotation-class
   f32 kernel (M=512, K=128, f32 window DMA, split-float y-stage) with
   the third pass unconditionally ON vs OFF (timing-only — OFF is
   numerically wrong for float data). Whatever a dynamic skip could
   ever deliver is bounded by this delta times the fraction of tiles
   whose predicate fires.

2. The predicate census (host-side, exact): fraction of 128x128
   windows with lo(win) IDENTICALLY zero, over three input classes:
   - random float32 in [0,1): lo density ~1 per element -> 0% of
     windows pass;
   - PNG-origin floats k/255: 1/255 is NOT dyadic, so k/255 has a
     full f32 mantissa for every k not a multiple of 255 -> 0% pass
     (the census verifies); the u8->float product path instead keeps
     0..255 integers and folds /255 AFTER the contraction — that IS
     the static exact-u8 path, already shipped;
   - integer-valued floats 0..255: 100% pass — the static case.

   One nonzero lo element anywhere in a (128, 512) window kills the
   tile, so the per-tile probability is (per-element pass rate)^65536:
   zero for any non-contrived float source.

Conclusion template: gain_bound = (ON - OFF) * fire_rate = (ON-OFF)*0
for every real float workload -> the dynamic variant is dead; strict
f32-on-float-inputs stands at its measured 350-370, and the strict
reading for the reference's actual I/O format (u8 drawables) is
covered by the static exact-u8 path (suite_f32_u8 395-410).

Run from repo cwd:  timeout 1800 python - < benchmarks/probe_f32_skip.py
Census only (local, no TPU):   ... --census-only
Reference: opmacros.h f32 sampling [unverified - mount empty].
"""

import argparse
import sys
import time

import numpy as np

WIN_H = 128
WIN_W = 128
M = WIN_H * 4
CHUNK = 512
N_TILES = 8192
CALLS = 8
ROUNDS = 4


def make_kernel(variant):
    """variant: 'f32_3pass' (product f32 mode), 'f32_2pass' (third pass
    forced off — the always-fires skip bound), 'bf16' (scale)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dn = (((0,), (0,)), ((), ()))
    dn_sel = (((1,), (0,)), ((), ()))
    f32_mode = variant != "bf16"
    win_dtype = jnp.float32 if f32_mode else jnp.bfloat16

    def kernel(px_ref, py_ref, img_ref, o_ref, win2, sems):
        j = pl.program_id(0)
        nj = pl.num_programs(0)
        slot = j % 2

        def dma(s):
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(0, WIN_W), pl.ds(0, M)], win2.at[s],
                sems.at[s])

        @pl.when(j == 0)
        def _():
            dma(0).start()

        @pl.when(j + 1 < nj)
        def _():
            dma((j + 1) % 2).start()

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, CHUNK), 0)
        px = px_ref[0, 0:1, :]
        py = py_ref[0, 0:1, :]
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        lx = jnp.clip(x0.astype(jnp.int32), 0, WIN_W - 2)
        ly = jnp.clip(y0.astype(jnp.int32), 0, WIN_H - 2)
        px_loc = lx.astype(jnp.float32) + (px - x0)
        py_loc = ly.astype(jnp.float32) + (py - y0)
        ox_mat = jnp.maximum(
            0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc))
        dma(slot).wait()
        win = win2[slot]

        # x-contraction: the product's mm(dn, win, ox_mat, split_a=...)
        whi = win.astype(jnp.bfloat16)
        bhi = ox_mat.astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(whi, bhi, dn,
                                  preferred_element_type=jnp.float32)
        if f32_mode:
            blo = (ox_mat - bhi.astype(jnp.float32)).astype(jnp.bfloat16)
            tmp = tmp + jax.lax.dot_general(
                whi, blo, dn, preferred_element_type=jnp.float32)
            if variant == "f32_3pass":
                wlo = (win - whi.astype(jnp.float32)).astype(jnp.bfloat16)
                tmp = tmp + jax.lax.dot_general(
                    wlo, bhi, dn, preferred_element_type=jnp.float32)

        # y-stage + chan_reduce (shared by all variants; sel matmul is
        # split_a=False — 2 passes in f32 mode, 1 in bf16)
        iota_h4 = jax.lax.broadcasted_iota(jnp.int32, (M, CHUNK), 0)
        r_of_row = iota_h4 // 4
        oy_mat4 = jnp.maximum(
            0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc))
        prod = tmp * oy_mat4
        h = M
        acc = prod
        while h > 128 and h % 2 == 0 and (h // 2) % 8 == 0:
            half = h // 2
            acc = acc[0:half, :] + acc[half:h, :]
            h = half
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (4, h), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (4, h), 0)
        sel = ((rows_i - (rows_i // 4) * 4) == cidx).astype(jnp.bfloat16)
        ahi = acc.astype(jnp.bfloat16)
        out4 = jax.lax.dot_general(sel, ahi, dn_sel,
                                   preferred_element_type=jnp.float32)
        if f32_mode:
            alo = (acc - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            out4 = out4 + jax.lax.dot_general(
                sel, alo, dn_sel, preferred_element_type=jnp.float32)
        o_ref[0, :, :] = out4

    return kernel, win_dtype


def build(variant, n_tiles):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel, win_dtype = make_kernel(variant)

    def blk(j):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), blk),
            pl.BlockSpec((1, 1, CHUNK), blk),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 4, CHUNK), blk),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_W, M), win_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, CHUNK), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    ), win_dtype


def census():
    """Per-element and per-(128,512)-window lo==0 rates by input class."""
    rng = np.random.RandomState(3)

    def lo_zero_rate(a):
        hi = a.astype(np.float32).astype(">f4")  # force a copy
        bf = a.astype(np.float32)
        # bf16 truncation: zero the low 16 bits of the f32 pattern
        bits = bf.view(np.uint32) & np.uint32(0xFFFF0000)
        hi = bits.view(np.float32)
        lo = bf - hi
        elt = float((lo == 0).mean())
        # windows: (128, 512) tiles of a 4K-ish plane
        h, w = a.shape
        wins_ok = 0
        wins = 0
        for i in range(0, h - WIN_H + 1, WIN_H):
            for j in range(0, w - M + 1, M):
                wins += 1
                wins_ok += bool((lo[i:i + WIN_H, j:j + M] == 0).all())
        return elt, (wins_ok / max(wins, 1))

    classes = {
        "random_f32": rng.rand(2048, 2048).astype(np.float32),
        "png_k_over_255": (rng.randint(0, 256, (2048, 2048))
                           .astype(np.float32) / 255.0),
        "u8_integer_valued": rng.randint(0, 256, (2048, 2048))
                             .astype(np.float32),
    }
    print("# predicate census: P(lo(x)==0) per element / per (128,512) "
          "window")
    out = {}
    for name, a in classes.items():
        elt, win = lo_zero_rate(a)
        out[name] = {"per_element": round(elt, 6), "per_window": win}
        print(f"#   {name:20s} elt {elt:8.6f}  window {win:8.6f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--census-only", action="store_true")
    ap.add_argument("--tiles", type=int, default=N_TILES)
    args = ap.parse_args()

    cens = census()
    if args.census_only:
        import json
        print(json.dumps({"census": cens}))
        return

    import jax
    import jax.numpy as jnp

    n_tiles = args.tiles
    rng = np.random.RandomState(7)
    px = jax.device_put(
        rng.rand(n_tiles, 1, CHUNK).astype(np.float32) * (WIN_W - 4) + 1)
    py = jax.device_put(
        rng.rand(n_tiles, 1, CHUNK).astype(np.float32) * (WIN_H - 4) + 1)
    img_f32 = rng.rand(WIN_W, M).astype(np.float32)

    fns = {}
    for v in ("f32_3pass", "f32_2pass", "bf16"):
        call, wdt = build(v, n_tiles)
        img = jax.device_put(jnp.asarray(img_f32, wdt))
        fns[v] = jax.jit(lambda px_, py_, s, call=call, img=img:
                         jnp.sum(call(px_ + s, py_, img)))
    for v, f in list(fns.items()):
        t0 = time.perf_counter()
        try:
            float(f(px, py, 0.0))
        except Exception as e:
            print(f"# COMPILE FAIL {v}: {str(e).splitlines()[0][:140]}",
                  file=sys.stderr, flush=True)
            del fns[v]
            continue
        print(f"# compiled+warm {v}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    best = {v: float("inf") for v in fns}
    mpix = n_tiles * CHUNK / 1e6
    for rd in range(ROUNDS):
        for v, f in fns.items():
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for c in range(CALLS):
                acc = acc + f(px, py, 1e-3 * (rd * CALLS + c + 1))
            float(acc)
            dt = (time.perf_counter() - t0) / CALLS
            best[v] = min(best[v], dt)
            print(f"round {rd} {v:10s} {dt * 1e3:7.2f} ms  "
                  f"{mpix / dt:7.1f} Mpix/s", flush=True)

    import json
    print("\n# BEST:", flush=True)
    out = {"census": cens}
    for v in fns:
        out[v] = {"ms": round(best[v] * 1e3, 2),
                  "mpix_s": round(mpix / best[v], 1)}
        print(f"#   {v:10s} {best[v] * 1e3:7.2f} ms  {out[v]['mpix_s']}")
    if "f32_3pass" in out and "f32_2pass" in out:
        gain = out["f32_3pass"]["ms"] / out["f32_2pass"]["ms"] - 1
        print(f"# always-fires skip bound: {gain * 100:.1f}% kernel-only; "
              f"x fire-rate 0.0 (census) = 0 realized")
    print(json.dumps(out))


main()
