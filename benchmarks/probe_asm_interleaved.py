"""Interleaved A/B of output-assembly variants (round-3 follow-up).

probe_xla_side.py measured the assembly variants SEQUENTIALLY — one fenced
window per variant — which ROUND3_NOTES showed is unreliable under the
relay's minute-scale drift (same config re-measured minutes apart moved
±10%). This probe alternates the variants in ROUND-ROBIN fenced
mini-batches over many rounds so drift hits every variant equally; only
per-round deltas are compared.

Variants (all from base-layout (n_blk, 512) channel planes at 4K):
  current       stack(axis=-1) + unflatten 5-D transpose + clip (132 MB f32)
  u8_pack       clip+round+u8 FIRST, then stack+unflatten (33 MB u8 out —
                the reference's actual output format)
  u8_transpose  channels on the MAJOR axis, one fused 5-D transpose,
                u8 cast LAST
  one_transpose f32, channels major, one fused 5-D transpose

Run from the repo cwd on TPU:  python - < benchmarks/probe_asm_interleaved.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mathmap_tpu.runtime import render as R

    w, h = 3840, 2160
    nby, nbx = R.base_layout_for(w, h)
    n_blk = nby * nbx
    rng = np.random.RandomState(42)
    comps = [jax.device_put(rng.rand(n_blk, 512).astype(np.float32))
             for _ in range(4)]
    jax.block_until_ready(comps)

    def asm_current(cs):
        rgba = jnp.stack(cs, axis=-1)
        rgba = R.unflatten_output(jnp, rgba, nby, nbx, h, w)
        return jnp.clip(rgba, 0.0, 1.0)

    def asm_u8_pack(cs):
        u8 = [jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint8)
              for c in cs]
        rgba = jnp.stack(u8, axis=-1)
        return R.unflatten_output(jnp, rgba, nby, nbx, h, w)

    def asm_u8_transpose(cs):
        arr = jnp.stack(cs, axis=0).reshape(4, nby, nbx, 8, 64)
        arr = jnp.transpose(arr, (1, 3, 2, 4, 0)).reshape(nby * 8, nbx * 64, 4)
        arr = arr[:h, :w]
        return jnp.round(jnp.clip(arr, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    def asm_one_transpose(cs):
        arr = jnp.stack(cs, axis=0).reshape(4, nby, nbx, 8, 64)
        arr = jnp.transpose(arr, (1, 3, 2, 4, 0)).reshape(nby * 8, nbx * 64, 4)
        return jnp.clip(arr[:h, :w], 0.0, 1.0)

    variants = [("current", asm_current), ("u8_pack", asm_u8_pack),
                ("u8_transpose", asm_u8_transpose),
                ("one_transpose", asm_one_transpose)]
    jitted = []
    for name, fn in variants:
        jf = jax.jit(fn)
        # fence the warmup so compile doesn't leak into round 0. The
        # readback op (sum of a scalar slice) is identical across variants
        # so the fence cost doesn't favor u8.
        _ = float(jnp.sum(jf(comps)[:2, :2].astype(jnp.float32)))
        jitted.append((name, jf))

    ROUNDS, N = 6, 10
    times = {name: [] for name, _ in jitted}
    for r in range(ROUNDS):
        for name, jf in jitted:
            start = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(N):
                acc = acc + jnp.sum(jf(comps)[:2, :2].astype(jnp.float32))
            _ = float(acc)
            times[name].append((time.perf_counter() - start) / N * 1e3)

    import json

    out = {}
    for name, ts in times.items():
        out[name] = {"mean_ms": round(float(np.mean(ts)), 3),
                     "min_ms": round(float(np.min(ts)), 3),
                     "per_round": [round(t, 2) for t in ts]}
        print(f"# {name}: mean {out[name]['mean_ms']} ms  "
              f"min {out[name]['min_ms']}  rounds {out[name]['per_round']}",
              file=sys.stderr)
    print(json.dumps(out))


main()
