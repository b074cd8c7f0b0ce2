"""Int8 MXU sampling probe: would an s8/u8 stage-A contraction beat bf16?

v5e's MXU runs int8 x int8 -> i32 at ~2x the bf16 rate, an int8 weight
matrix materializes in half the bytes, and a u8-stored image halves the
window DMA. The weight build becomes an INTEGER triangle:

    fxq   = round(px_loc * 127)                       (i32, per pixel)
    ox_i8 = max(0, 127 - |iota_w * 127 - fxq|)        (s8, two taps summing
                                                       to exactly 127)

so bilinear interpolation runs as u8win @ s8w -> i32, exact in the image
operand (u8-sourced images) and within 0.5/127 px of the true tap position
(~4e-3 value error vs the current bf16 envelope's 5.3e-3).

Variants (interleaved round-robin per ROUND3_NOTES methodology):
  bf16  the production build + bf16 matmuls (baseline)
  i8u   u8 window x s8 integer-triangle weights -> i32, f32 epilogue
  i8splat  constant s8 weights + u8 window (no build work; i8 matmul+DMA
        floor — tells us whether any residual gap is build or matmul)

Shapes: --shape fast (win 128x32, GW=4 chunks/tile — the fast tier's
per-chunk slice) or rot (win 128x128, GW=1 — the rotation class where
stage-A FLOPs dominate).

Run from the repo cwd on TPU:
    python - < benchmarks/probe_int8_mm.py
(argv untunable through stdin — edit SHAPE/TILES below if needed)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SHAPES = {
    # name: (SUB contraction width, WIN_H rows, GW chunks per tile)
    "fast": (128, 32, 4),
    "rot": (128, 128, 1),
}
CHUNK = 512
TILES = {"fast": 4050, "rot": 16200}  # ~one 4K frame of base blocks
ITERS = 8
ROUNDS = 4


def make_kernel(variant, sub, win_h, gw):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wh4 = win_h * 4
    win_w = sub * gw
    dn = (((0,), (0,)), ((), ()))
    dn_sel = (((1,), (0,)), ((), ()))

    def kernel(px_ref, py_ref, img_ref, o_ref, win2, sems):
        j = pl.program_id(0)
        nj = pl.num_programs(0)
        slot = j % 2

        def dma(tj, s):
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(0, win_w), pl.ds(0, wh4)], win2.at[s],
                sems.at[s])

        @pl.when(j == 0)
        def _():
            dma(j, 0).start()

        @pl.when(j + 1 < nj)
        def _():
            dma(j + 1, (j + 1) % 2).start()

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (sub, CHUNK), 0)
        iota_h4 = jax.lax.broadcasted_iota(jnp.int32, (wh4, CHUNK), 0)
        r_of_row = iota_h4 // 4
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (4, wh4), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (4, wh4), 0)
        sel = ((rows_i - (rows_i // 4) * 4) == cidx).astype(jnp.bfloat16)
        dma(j, slot).wait()
        for cn in range(gw):
            win = win2[slot, pl.ds(cn * sub, sub), :]
            px = px_ref[cn, 0:1, :]
            py = py_ref[cn, 0:1, :]
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            lx = jnp.clip(x0.astype(jnp.int32), 0, sub - 2)
            ly = jnp.clip(y0.astype(jnp.int32), 0, win_h - 2)
            px_loc = lx.astype(jnp.float32) + (px - x0)
            py_loc = ly.astype(jnp.float32) + (py - y0)
            oy_mat4 = jnp.maximum(
                0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc))
            if variant == "bf16":
                ox_mat = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc))
                tmp = jax.lax.dot_general(
                    win.astype(jnp.bfloat16), ox_mat.astype(jnp.bfloat16),
                    dn, preferred_element_type=jnp.float32)
            else:
                if variant == "i8splat":
                    ox_i8 = jnp.full((sub, CHUNK), 63, jnp.int8)
                else:
                    fxq = jnp.round(px_loc * 127.0).astype(jnp.int32)
                    d = jnp.abs(iota_w * 127 - fxq)
                    ox_i8 = jnp.maximum(0, 127 - d).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    win, ox_i8, dn, preferred_element_type=jnp.int32)
                tmp = acc.astype(jnp.float32) * (1.0 / (255.0 * 127.0))
            prod = tmp * oy_mat4
            out4 = jax.lax.dot_general(
                sel, prod.astype(jnp.bfloat16), dn_sel,
                preferred_element_type=jnp.float32)
            o_ref[cn, :, :] = out4

    return kernel


def build_inputs(shape_name):
    sub, win_h, gw = SHAPES[shape_name]
    n_tiles = TILES[shape_name]
    wh4 = win_h * 4
    win_w = sub * gw
    n_base = n_tiles * gw
    rng = np.random.RandomState(0)
    px = (rng.rand(n_base, 1, CHUNK).astype(np.float32) * (sub - 2))
    py = (rng.rand(n_base, 1, CHUNK).astype(np.float32) * (win_h - 2))
    img_u8 = rng.randint(0, 256, (win_w, wh4)).astype(np.uint8)
    return px, py, img_u8


def run_variant(variant, shape_name, px_np, py_np, img_u8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sub, win_h, gw = SHAPES[shape_name]
    n_tiles = TILES[shape_name]
    wh4 = win_h * 4
    win_w = sub * gw
    n_base = n_tiles * gw
    kernel = make_kernel(variant, sub, win_h, gw)
    px = jax.device_put(px_np)
    py = jax.device_put(py_np)
    if variant == "bf16":
        img = jax.device_put((img_u8.astype(np.float32) / 255.0)).astype(
            jnp.bfloat16)
    else:
        img = jax.device_put(img_u8)

    def blk(j):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((gw, 1, CHUNK), blk),
            pl.BlockSpec((gw, 1, CHUNK), blk),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((gw, 4, CHUNK), blk),
        scratch_shapes=[
            pltpu.VMEM((2, win_w, wh4), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_base, 4, CHUNK), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )
    return jax.jit(lambda a, b, c: call(a, b, c)), (px, py, img)


def reference_bilinear(shape_name, px, py, img_u8, n_check):
    """NumPy f64 bilinear over the first n_check base chunks."""
    sub, win_h, gw = SHAPES[shape_name]
    wh4 = win_h * 4
    imgf = img_u8.astype(np.float64) / 255.0
    out = np.zeros((n_check, 4, CHUNK))
    for b in range(n_check):
        cn = b % gw
        xoff = cn * sub
        x = np.clip(px[b, 0], 0, sub - 2)
        y = np.clip(py[b, 0], 0, win_h - 2)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx = x - x0
        fy = y - y0
        for c in range(4):
            v00 = imgf[xoff + x0, y0 * 4 + c]
            v10 = imgf[xoff + x0 + 1, y0 * 4 + c]
            v01 = imgf[xoff + x0, (y0 + 1) * 4 + c]
            v11 = imgf[xoff + x0 + 1, (y0 + 1) * 4 + c]
            out[b, c] = (v00 * (1 - fx) + v10 * fx) * (1 - fy) + (
                v01 * (1 - fx) + v11 * fx) * fy
    return out


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":  # logic-validation run
        TILES.update(fast=32, rot=32)

    shape_results = {}
    for shape_name in ("fast", "rot"):
        px, py, img_u8 = build_inputs(shape_name)
        variants = ["bf16", "i8u", "i8splat"]
        jitted = []
        for v in variants:
            f, args = run_variant(v, shape_name, px, py, img_u8)
            out = f(*args)
            jax.block_until_ready(out)
            jitted.append((v, f, args, np.asarray(out[:8])))

        # numeric parity vs f64 reference on the first 8 chunks
        ref = reference_bilinear(shape_name, px, py, img_u8, 8)
        errs = {}
        for v, _, _, o in jitted:
            if v == "i8splat":
                continue
            errs[v] = float(np.max(np.abs(o - ref)))

        times = {v: [] for v, *_ in jitted}
        for _ in range(ROUNDS):
            for v, f, args, _o in jitted:
                t0 = time.perf_counter()
                acc = jnp.float32(0)
                for _ in range(ITERS):
                    acc = acc + jnp.sum(f(*args)[:2, :2])
                _ = float(acc)
                times[v].append((time.perf_counter() - t0) / ITERS * 1e3)

        sub, win_h, gw = SHAPES[shape_name]
        npx = TILES[shape_name] * gw * CHUNK
        res = {}
        for v, ts in times.items():
            best = min(ts)
            res[v] = {"ms": round(best, 2),
                      "mpix_s": round(npx / best / 1e3, 0),
                      "per_round": [round(t, 2) for t in ts],
                      "max_err": round(errs.get(v, -1.0), 6)}
            print(f"# {shape_name}/{v}: best {best:.2f} ms "
                  f"({npx / best / 1e3:.0f} Mpix/s) err {errs.get(v)}"
                  f" rounds {[round(t, 1) for t in ts]}", file=sys.stderr)
        shape_results[shape_name] = res

    print(json.dumps(shape_results))


main()
