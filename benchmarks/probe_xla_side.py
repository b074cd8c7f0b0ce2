"""Break down the XLA-side per-frame cost of a Pallas-sampled render.

Round-2's kernel-stub probe showed the XLA-side pipeline (filter math,
planning, claims, assembly) is 7.4-9.7 ms of the 12.2-18.7 ms 4K frames
(docs/PERFORMANCE.md "Known headroom" item 1). This probe splits that
number into stages by monkeypatching the sampler at successive depths:

  stage 0  dispatch : empty-ish jit per call in a pipelined batch
  stage 1  math     : filter coordinate math only (sampler returns coords)
  stage 2  planning : + per-block stats, tier fits, claims, compaction
                      (kernel launches replaced by a zeros buffer)
  stage 3  full     : the production render
  assembly          : stack + unflatten + clip alone, plus variants
                      (planar emit, on-device uint8 pack)

Run on the real TPU: `python benchmarks/probe_xla_side.py [--size WxH]`.
All timings fenced with host readbacks (CLAUDE.md: block_until_ready acks
early through the axon relay).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fence_time(fn, n=12, reps=3):
    import jax.numpy as jnp

    fn()  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(n):
            acc = acc + fn()
        _ = float(acc)
        best = min(best, (time.perf_counter() - start) / n)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--filters", default="filters/Distorts/twirl.mm,filters/Distorts/pond.mm")
    args = ap.parse_args(argv)
    w, h = (int(v) for v in args.size.lower().split("x"))

    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm
    from mathmap_tpu.pallas_kernels import sample_kernel as SK
    from mathmap_tpu.runtime import render as R
    from mathmap_tpu.runtime import sampling as S

    rng = np.random.RandomState(42)
    img = jax.device_put(rng.rand(h, w, 4).astype(np.float32))
    jax.block_until_ready(img)
    opts = mm.RenderOptions(interpolation="bilinear")

    # stage 0: dispatch floor
    tiny = jax.device_put(np.ones((8, 128), np.float32))
    f0 = jax.jit(lambda x: jnp.sum(x * 1.0001))
    dt0 = fence_time(lambda: f0(tiny))
    print(f"# dispatch floor: {dt0 * 1e3:.2f} ms/call", file=sys.stderr)

    orig_sample = S.sample_image
    orig_call = SK._call_kernel_tiles

    def sample_stub_math(ev, im, x, y):
        # filter math runs; sampling reduced to a couple of elementwise ops
        px, py = S.world_to_pixel(ev.be, x, y, im.global_shape[1], im.global_shape[0])
        return [px * 0.001, py * 0.001, px * 0.0005 + py * 0.0005,
                ev.be.ones_like(px)]

    def call_stub_zeros(img_xm, px_b, py_b, oy, ox, **kw):
        n_base = px_b.shape[0]
        carry = kw.get("carry")
        if carry is not None:
            return carry
        return jnp.zeros((n_base, 4, SK.BASE_PIX), jnp.float32)

    results = {}
    for path in args.filters.split(","):
        row = {}
        for name, patch in (
            ("math", ("sample", sample_stub_math)),
            ("planning", ("kernel", call_stub_zeros)),
            ("full", None),
        ):
            if patch is None:
                S.sample_image = orig_sample
                SK._call_kernel_tiles = orig_call
            elif patch[0] == "sample":
                S.sample_image = patch[1]
                SK._call_kernel_tiles = orig_call
            else:
                S.sample_image = orig_sample
                SK._call_kernel_tiles = patch[1]
            # fresh Filter per stage: the renderer cache keys on (w, h,
            # opts) and would otherwise reuse the previous stage's trace
            filt = mm.compile_file(path)
            renderer = filt._renderer(w, h, opts, 1)
            dt = fence_time(lambda r=renderer: jnp.sum(r([img], {}, t=0.37)))
            row[name] = dt * 1e3
            print(f"# {path} {name}: {dt * 1e3:.2f} ms", file=sys.stderr)
        S.sample_image = orig_sample
        SK._call_kernel_tiles = orig_call
        results[path] = row

    # assembly variants on base-layout channel data
    nby, nbx = R.base_layout_for(w, h)
    n_blk = nby * nbx
    comps = [jax.device_put(rng.rand(n_blk, 512).astype(np.float32)) for _ in range(4)]
    jax.block_until_ready(comps)

    def asm_current(cs):
        rgba = jnp.stack(cs, axis=-1)
        rgba = R.unflatten_output(jnp, rgba, nby, nbx, h, w)
        return jnp.clip(rgba, 0.0, 1.0)

    def asm_planar(cs):
        # planar (4, H, W): block-major reshape only (no channel interleave)
        arr = jnp.stack([c.reshape(nby, nbx, 8, 64) for c in cs], 0)
        arr = jnp.transpose(arr, (0, 1, 3, 2, 4)).reshape(4, nby * 8, nbx * 64)
        return jnp.clip(arr[:, :h, :w], 0.0, 1.0)

    def asm_u8(cs):
        # reference-faithful: pack to uint8 FIRST (33 MB), then interleave
        u8 = [jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint8) for c in cs]
        rgba = jnp.stack(u8, axis=-1)
        return R.unflatten_output(jnp, rgba, nby, nbx, h, w)

    def asm_one_transpose(cs):
        # channels stacked on the MAJOR axis (cheap concat — no lane
        # interleave), then ONE fused 5-D transpose to (H, W, 4): probes
        # whether stack(axis=-1)+unflatten costs two relayout passes
        arr = jnp.stack(cs, axis=0).reshape(4, nby, nbx, 8, 64)
        arr = jnp.transpose(arr, (1, 3, 2, 4, 0)).reshape(nby * 8, nbx * 64, 4)
        return jnp.clip(arr[:h, :w], 0.0, 1.0)

    for name, fn in (("asm_current", asm_current), ("asm_planar", asm_planar),
                     ("asm_u8", asm_u8), ("asm_one_transpose", asm_one_transpose)):
        jf = jax.jit(fn)
        dt = fence_time(lambda: jnp.sum(jf(comps).astype(jnp.float32)))
        print(f"# {name}: {dt * 1e3:.2f} ms", file=sys.stderr)
        results[name] = dt * 1e3

    import json

    print(json.dumps({k: (v if isinstance(v, dict) else round(v, 2))
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
