"""Channel-select reduction variants on the ROTATION-class kernel shape.

ROUND3_NOTES' "channel-select stage — NEGATIVE" was measured on the FAST
shape (wh4=128): dropping sel saved 1.2 of 8.4 ms. But the sel matmul
(4, wh4) @ (wh4, chunk) costs MXU tile-ops ~ (wh4/128)·(chunk/128) — M=4
still occupies a full 128-row pass — so on the ROT shape (wh4=512) its
tile-op count EQUALS the main contraction's (K=128: 1·4·4 = 16 vs sel
4·1·4 = 16). If that model is right, sel is ~5 ms of the rot tier's
16 ms and a cheaper channel reduce is the largest kernel lever left.

Variants (interleaved round-robin):
  sel     (4, wh4) one-hot matmul (production)
  nosel   drop the reduce entirely (garbage out; the floor)
  tree    halving static sublane slices: (512,.)->(256,.)->...->(8,.)
          then an (2,4,C) reshape-sum — row r*4+c keeps its channel
          class under halving because every half is a multiple of 4 rows
  vpusel  (wh4//4, 4, C) reshape + axis-0 sum (fast-shape loser; the
          reshape may relayout)
  selbf   sel matmul with PROD cast to bf16 first (production does this
          via mm's operand cast — control for the cast cost)

Run from the repo cwd on TPU:  python - < benchmarks/probe_selred.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SUB = 128      # contraction width (rot tier K)
WIN_H = 128
WH4 = WIN_H * 4
CHUNK = 512
GW = 1
WIN_W = SUB * GW
TILES = 16200  # one 4K frame of (8, 64) base blocks
ITERS = 8
ROUNDS = 4


def make_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dn = (((0,), (0,)), ((), ()))
    dn_sel = (((1,), (0,)), ((), ()))

    def kernel(px_ref, py_ref, img_ref, o_ref, win2, sems):
        j = pl.program_id(0)
        nj = pl.num_programs(0)
        slot = j % 2

        def dma(tj, s):
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(0, WIN_W), pl.ds(0, WH4)], win2.at[s],
                sems.at[s])

        @pl.when(j == 0)
        def _():
            dma(j, 0).start()

        @pl.when(j + 1 < nj)
        def _():
            dma(j + 1, (j + 1) % 2).start()

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (SUB, CHUNK), 0)
        iota_h4 = jax.lax.broadcasted_iota(jnp.int32, (WH4, CHUNK), 0)
        r_of_row = iota_h4 // 4
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (4, WH4), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (4, WH4), 0)
        sel = ((rows_i - (rows_i // 4) * 4) == cidx).astype(jnp.bfloat16)
        dma(j, slot).wait()
        win = win2[slot]
        px = px_ref[0, 0:1, :]
        py = py_ref[0, 0:1, :]
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        lx = jnp.clip(x0.astype(jnp.int32), 0, SUB - 2)
        ly = jnp.clip(y0.astype(jnp.int32), 0, WIN_H - 2)
        px_loc = lx.astype(jnp.float32) + (px - x0)
        py_loc = ly.astype(jnp.float32) + (py - y0)
        ox_mat = jnp.maximum(
            0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc))
        oy_mat4 = jnp.maximum(
            0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc))
        tmp = jax.lax.dot_general(
            win.astype(jnp.bfloat16), ox_mat.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32)
        prod = tmp * oy_mat4
        if variant == "nosel":
            o_ref[0, :, :] = prod[0:4, :]
        elif variant == "tree":
            acc = prod
            h = WH4
            while h > 8:
                half = h // 2
                acc = acc[0:half, :] + acc[half:h, :]
                h = half
            o_ref[0, :, :] = jnp.sum(acc.reshape(2, 4, CHUNK), axis=0)
        elif variant == "vpusel":
            o_ref[0, :, :] = jnp.sum(prod.reshape(WH4 // 4, 4, CHUNK), axis=0)
        else:  # sel / selbf
            out4 = jax.lax.dot_general(
                sel, prod.astype(jnp.bfloat16), dn_sel,
                preferred_element_type=jnp.float32)
            o_ref[0, :, :] = out4

    return kernel


def run_variant(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = make_kernel(variant)
    rng = np.random.RandomState(0)
    px = jax.device_put(
        rng.rand(TILES, 1, CHUNK).astype(np.float32) * (SUB - 2))
    py = jax.device_put(
        rng.rand(TILES, 1, CHUNK).astype(np.float32) * (WIN_H - 2))
    img = jax.device_put(
        rng.rand(WIN_W, WH4).astype(np.float32)).astype(jnp.bfloat16)

    def blk(j):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((GW, 1, CHUNK), blk),
            pl.BlockSpec((GW, 1, CHUNK), blk),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((GW, 4, CHUNK), blk),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_W, WH4), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TILES, 4, CHUNK), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )
    return jax.jit(lambda a, b, c: call(a, b, c)), (px, py, img)


def main():
    import jax
    import jax.numpy as jnp

    global TILES
    if jax.default_backend() == "cpu":
        TILES = 16

    variants = ["sel", "tree", "vpusel", "nosel"]
    jitted = []
    ref = None
    for v in variants:
        f, args = run_variant(v)
        out = np.asarray(f(*args)[:64])
        if v == "sel":
            ref = out
        jitted.append((v, f, args, out))

    errs = {v: (float(np.max(np.abs(o - ref))) if v != "nosel" else -1.0)
            for v, _f, _a, o in jitted}

    times = {v: [] for v, *_ in jitted}
    for _ in range(ROUNDS):
        for v, f, args, _o in jitted:
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(ITERS):
                acc = acc + jnp.sum(f(*args)[:2, :2])
            _ = float(acc)
            times[v].append((time.perf_counter() - t0) / ITERS * 1e3)

    npx = TILES * GW * CHUNK
    res = {}
    for v, ts in times.items():
        best = min(ts)
        res[v] = {"ms": round(best, 2), "mpix_s": round(npx / best / 1e3, 0),
                  "per_round": [round(t, 2) for t in ts],
                  "max_err_vs_sel": round(errs[v], 7)}
        print(f"# {v}: best {best:.2f} ms ({npx / best / 1e3:.0f} Mpix/s) "
              f"err-vs-sel {errs[v]:.2e} rounds {[round(t, 1) for t in ts]}",
              file=sys.stderr)
    print(json.dumps(res))


main()
