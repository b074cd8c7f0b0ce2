"""Is the fast-tier sampling kernel weight-BUILD-bound, and would an
MXU-side weight build pay? (VERDICT r2 item 6 / PERFORMANCE.md headroom 2.)

Standalone mini-kernel replicating the fast tier's per-chunk shape
(window slice (128, 128 rows*4), N=512 px, two matmuls + mul) with
swappable x/y weight builds:

  full   : the production bilinear triangle build (sub/abs/rsub/max from
           px/py refs) — 4 VPU ops per weight element
  onehot : nearest-style compare build — 2 ops
  cheap  : iota * 1e-3 — 1 op, no px read (any MXU-built weight scheme
           can at best approach this)
  splat  : constant weights (vector splat) — no build work at all;
           the matmul+DMA floor. Output is garbage; timing only.
  nosel  : drop the channel-select matmul (garbage output; timing only)
  vpusel : channel select as a (WH4//4, 4, C) reshape + axis-0 sum
           (semantically identical to sel; measured slower)

If full ~= cheap ~= splat, the kernel is matmul/DMA-bound and an MXU-side
weight build cannot win (documented negative). If full >> cheap, the
build ALU is the bound and an MXU formulation is worth pursuing.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SUB = 128     # contraction width (fast tier subw)
WH4 = 128     # win_h(32) * 4 channels
CHUNK = 512
GW = 4        # chunks per (8, 256) tile
WIN_W = 512


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
        for cn in range(GW):
            win = win2[slot, pl.ds(cn * SUB, SUB), :]
            px = px_ref[cn, 0:1, :]
            py = py_ref[cn, 0:1, :]
            if variant in ("full", "nosel", "vpusel"):
                x0 = jnp.floor(px)
                y0 = jnp.floor(py)
                lx = jnp.clip(x0.astype(jnp.int32), 0, SUB - 2)
                ly = jnp.clip(y0.astype(jnp.int32), 0, 30)
                px_loc = lx.astype(jnp.float32) + (px - x0)
                py_loc = ly.astype(jnp.float32) + (py - y0)
                ox_mat = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc))
                oy_mat4 = jnp.maximum(
                    0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc))
            elif variant == "onehot":
                lx = jnp.clip(px.astype(jnp.int32), 0, SUB - 1)
                ly = jnp.clip(py.astype(jnp.int32), 0, 31)
                ox_mat = (iota_w == lx).astype(jnp.float32)
                oy_mat4 = (r_of_row == ly).astype(jnp.float32)
            elif variant == "cheap":
                ox_mat = iota_w.astype(jnp.float32) * 1e-3
                oy_mat4 = r_of_row.astype(jnp.float32) * 1e-3
            else:  # splat: constant weights — no build work at all
                ox_mat = jnp.full((SUB, CHUNK), 0.5, jnp.float32)
                oy_mat4 = jnp.full((WH4, CHUNK), 0.5, jnp.float32)
            tmp = jax.lax.dot_general(
                win.astype(jnp.bfloat16), ox_mat.astype(jnp.bfloat16), dn,
                preferred_element_type=jnp.float32)
            prod = tmp * oy_mat4
            if variant == "nosel":
                # timing-only: drop the (4, wh4)@(wh4, 512) channel-select
                # matmul — is an M=4 matmul as expensive as the main one?
                o_ref[cn, :, :] = prod[0:4, :]
            elif variant == "vpusel":
                # channel select as a VPU reduction: reshape (WH4, C) ->
                # (WH4//4, 4, C) groups row4 = g*4 + ch by channel; the
                # axis-0 sum leaves (4, C) — semantically identical to the
                # sel one-hot matmul (measured SLOWER; see ROUND3_NOTES)
                p3 = prod.reshape(WH4 // 4, 4, CHUNK)
                o_ref[cn, :, :] = jnp.sum(p3, axis=0)
            else:
                out4 = jax.lax.dot_general(
                    sel, prod.astype(jnp.bfloat16), dn_sel,
                    preferred_element_type=jnp.float32)
                o_ref[cn, :, :] = out4

    return kernel


def run_variant(variant, n_tiles, iters):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = make_kernel(variant)
    n_base = n_tiles * GW
    px = jax.device_put(
        np.random.RandomState(0).rand(n_base, 1, CHUNK).astype(np.float32) * 100)
    py = jax.device_put(
        np.random.RandomState(1).rand(n_base, 1, CHUNK).astype(np.float32) * 28)
    img = jax.device_put(
        np.random.RandomState(2).rand(WIN_W, WH4).astype(np.float32)
        .astype(np.dtype("bfloat16") if hasattr(np, "bfloat16") else np.float32))
    img = img.astype(jnp.bfloat16)

    def blk(j):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
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
        out_shape=jax.ShapeDtypeStruct((n_base, 4, CHUNK), jnp.float32),
        grid_spec=grid_spec,
    )
    f = jax.jit(lambda a, b, c: jnp.sum(call(a, b, c)))
    _ = float(f(px, py, img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = acc + f(px, py, img)
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    mpix = n_base * CHUNK / best / 1e6
    return best * 1e3, mpix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=4050)  # ~4K frame worth
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variants", default="full,onehot,cheap,splat")
    args = ap.parse_args()

    results = {}
    for variant in args.variants.split(","):
        ms, mpix = run_variant(variant, args.tiles, args.iters)
        results[variant] = {"ms": round(ms, 2), "mpix_s": round(mpix, 1)}
        print(f"# {variant}: {ms:.2f} ms  {mpix:.0f} Mpix/s", file=sys.stderr)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
