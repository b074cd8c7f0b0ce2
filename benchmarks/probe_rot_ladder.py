"""Probe: rotation-class window shapes, kernel-only (VERDICT r4 item 3).

The rotation tier is the 4K suite's binding constraint (twirl ~14-15 ms
of window-area FLOPs — docs/PERFORMANCE.md roofline). Cost model per
(8,64) block of 512 px: x-stage FLOPs = 8*win_h*win_w per pixel, DMA =
win_w*win_h*4ch*2B per tile. Today's ladder serves steep blocks
(theta in ~52-90 deg) with a (128,128) window = 131k FLOP/px even
though their x-span fits win_w=64:

    theta band   | fits (wh,ww)      | today      | FLOP/px
    ~50-83 deg   | (96, 64)          | (128,128)  | 49k vs 131k (2.7x)
    ~83-90 deg   | (128, 64)         | (128,128)  | 65k vs 131k (2.0x)
    ~30-50 deg   | (64, 128) (same)  | (64,128)   | 65k (unchanged)

This probe measures the REAL kernel (`_call_kernel_tiles` — real weight
build, DMA, chan_reduce) at each candidate shape over the same pixel
count, INTERLEAVED inside the same fenced rounds (relay drift lies
across sequential A/Bs — CLAUDE.md). It also models a 16-row output
tile (w48x64: a (16,32)-px tile's 45-deg bbox) to size candidate B
before committing to the layout change it would need.

Run from repo cwd:  timeout 1800 python - < benchmarks/probe_rot_ladder.py
Lowering-only (local, no TPU):  ... --lower-only
"""

import argparse
import sys
import time

import numpy as np

VARIANTS = [
    # name        win_h win_w   (gw=1 rot-class tiles)
    ("w64x128",   64,   128),   # current ~30-50 deg rung
    ("w128x128",  128,  128),   # current steep rung
    ("w96x64",    96,   64),    # candidate: 50-83 deg
    ("w128x64",   128,  64),    # candidate: 83-90 deg
    ("w64x64",    64,   64),    # scaling floor; also the 16x32-tile model
    # (48, 64) REJECTED by the real TPU Mosaic compiler: "Slice shape
    # along dimension 1 must be aligned to tiling (128), but is 192" —
    # win_h*4 must be a multiple of 128, i.e. win_h mult of 32. Local
    # .lower() ACCEPTED it (lowering is laxer than the chip compiler —
    # trust only remote compiles for window-shape validity).
]

H_IMG = W_IMG = 512
N_TILES = 8192          # ~4.2 Mpix of rotation-class blocks
CALLS = 8               # pipelined dispatches per fence (CLAUDE.md)
ROUNDS = 4


def build_inputs(win_h, win_w, hp, wp, n_tiles, rng):
    from mathmap_tpu.pallas_kernels.sample_kernel import BASE_PIX

    oy = (rng.randint(0, (hp - win_h) // 8 + 1, size=n_tiles) * 8)
    ox = (rng.randint(0, (wp - win_w) // 16 + 1, size=n_tiles) * 16)
    # per-pixel coords inside each tile's window interior (padded space)
    px = ox[:, None, None] + 1.0 + rng.rand(n_tiles, 1, BASE_PIX) * (win_w - 4)
    py = oy[:, None, None] + 1.0 + rng.rand(n_tiles, 1, BASE_PIX) * (win_h - 4)
    return (oy[None, :].astype(np.int32), ox[None, :].astype(np.int32),
            px.astype(np.float32), py.astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lower-only", action="store_true")
    ap.add_argument("--tiles", type=int, default=N_TILES)
    ap.add_argument("--variants", default=",".join(v[0] for v in VARIANTS))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mathmap_tpu.pallas_kernels.sample_kernel import (
        BASE_PIX, N_COPIES, _call_kernel_tiles, padded_dims)

    hp, wp = padded_dims(H_IMG, W_IMG)
    rng = np.random.RandomState(7)
    img_xm_np = rng.rand(wp, N_COPIES * hp * 4).astype(np.float32)

    want = set(args.variants.split(","))
    chosen = [v for v in VARIANTS if v[0] in want]

    if args.lower_only:
        # Mosaic lowering is LOCAL (CLAUDE.md): validate every candidate
        # shape compiles without a remote TPU round-trip.
        for name, wh, ww in chosen:
            oy, ox, px, py = build_inputs(wh, ww, hp, wp, 8, rng)

            def f(img, px_, py_, oy_, ox_, wh=wh, ww=ww):
                return _call_kernel_tiles(
                    img, px_, py_, oy_, ox_, interpolation="bilinear",
                    win_h=wh, win_w=ww, gw=1, hp=hp, precision="bf16",
                    interpret=False, grid=(1, 8))

            try:
                jax.jit(f).lower(
                    jax.ShapeDtypeStruct(img_xm_np.shape, jnp.bfloat16),
                    jax.ShapeDtypeStruct(px.shape, jnp.float32),
                    jax.ShapeDtypeStruct(py.shape, jnp.float32),
                    jax.ShapeDtypeStruct(oy.shape, jnp.int32),
                    jax.ShapeDtypeStruct(ox.shape, jnp.int32))
                print(f"# LOWER OK   {name}", flush=True)
            except Exception as e:
                print(f"# LOWER FAIL {name}: {str(e).splitlines()[0][:160]}",
                      flush=True)
        return

    n_tiles = args.tiles
    img_xm = jax.device_put(jnp.asarray(img_xm_np, dtype=jnp.bfloat16))
    jax.block_until_ready(img_xm)

    fns = {}
    for name, wh, ww in chosen:
        oy, ox, px, py = build_inputs(wh, ww, hp, wp, n_tiles, rng)
        d = {k: jax.device_put(v) for k, v in
             dict(oy=oy, ox=ox, px=px, py=py).items()}

        def f(img, px_, py_, oy_, ox_, salt, wh=wh, ww=ww):
            out = _call_kernel_tiles(
                img, px_ + salt, py_, oy_, ox_, interpolation="bilinear",
                win_h=wh, win_w=ww, gw=1, hp=hp, precision="bf16",
                interpret=False, grid=(1, n_tiles))
            return jnp.sum(out)

        fns[name] = (jax.jit(f), d)

    # warm/compile serially (remote compiles are 1-3 min each); a variant
    # that fails TPU compile is dropped, not fatal (the chip compiler is
    # stricter than local lowering — see the (48, 64) note above)
    for name in list(fns):
        f, d = fns[name]
        t0 = time.perf_counter()
        try:
            float(f(img_xm, d["px"], d["py"], d["oy"], d["ox"], 0.0))
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
        for name, (f, d) in fns.items():
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for c in range(CALLS):
                acc = acc + f(img_xm, d["px"], d["py"], d["oy"], d["ox"],
                              1e-3 * (rd * CALLS + c + 1))
            float(acc)
            dt = (time.perf_counter() - t0) / CALLS
            best[name] = min(best[name], dt)
            print(f"round {rd} {name:9s} {dt * 1e3:7.2f} ms/call  "
                  f"{mpix_per_call / dt:7.1f} Mpix/s", flush=True)

    import json
    print("\n# BEST (min over interleaved rounds):", flush=True)
    out = {}
    for name in fns:
        out[name] = {"ms": round(best[name] * 1e3, 2),
                     "mpix_s": round(mpix_per_call / best[name], 1)}
        print(f"#   {name:9s} {best[name] * 1e3:7.2f} ms  "
              f"{out[name]['mpix_s']:7.1f} Mpix/s")
    print(json.dumps(out))


main()
