"""Sweep Pallas sampling-kernel configurations on the real TPU.

    python benchmarks/kernel_sweep.py [--size WxH] [--iters N]

Prints a table of ms/frame for tier-ladder x precision combinations on a
bounded-displacement warp (ripple) and a rotational warp (twirl) — use to
re-tune RenderOptions.pallas_tiers when hardware or Mosaic changes.
Run when `bench.py`'s relay_health_ms is sane (<5ms); the shared relay's
throughput drifts (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mathmap_tpu as mm  # noqa: E402


def fenced_best(renderer, ins, iters):
    import jax.numpy as jnp

    _ = float(jnp.sum(renderer(ins, {}, t=0.37)))
    best = float("inf")
    for b in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(max(1, iters // 3)):
            acc = acc + jnp.sum(renderer(ins, {}, t=0.37 + 0.001 * (b * 7 + i)))
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / max(1, iters // 3))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.lower().split("x"))

    import jax

    img = np.random.RandomState(0).rand(h, w, 4).astype(np.float32)
    ins = [jax.device_put(img)]

    default = mm.RenderOptions().pallas_tiers
    ladders = {
        "default": default,
        "fast-nosub": tuple((th, tw, wh, ww, 0) for th, tw, wh, ww, _ in default),
        "wide-rot": tuple(
            (th, tw, wh, 256, sw) if (wh, ww) == (128, 128) else (th, tw, wh, ww, sw)
            for th, tw, wh, ww, sw in default),
        # round-3 candidates: tighter square windows for gentle rotation —
        # FLOPs scale with window area, and twirl's inner radii rotate
        # mildly (a 64/96-px window catches them at 1/4 / 1/2 the rotn
        # tier's cost); claims escalate the rest to rotn as before
        "tight-rot": (default[0], default[1],
                      (8, 64, 64, 64, 0), default[2], default[3],
                      (8, 64, 96, 96, 0), default[4]) + default[5:],
    }
    precisions = ["bf16", "f32"]

    for name, path in (("ripple", "filters/Distorts/ripple.mm"),
                       ("twirl", "filters/Distorts/twirl.mm")):
        filt = mm.compile_file(path)
        print(f"== {name} {w}x{h}")
        for prec in precisions:
            for lname, tiers in ladders.items():
                opts = mm.RenderOptions(pallas_tiers=tiers,
                                        pallas_precision=prec)
                try:
                    r = filt._renderer(w, h, opts, 1)
                    dt = fenced_best(r, ins, args.iters)
                    print(f"  {prec} {lname}: {dt * 1e3:8.1f} ms", flush=True)
                except Exception as exc:
                    print(f"  {prec} {lname}: FAIL {str(exc)[:80]}", flush=True)
        # gather baseline
        r = filt._renderer(w, h, mm.RenderOptions(sampler="gather"), 1)
        dt = fenced_best(r, ins, args.iters)
        print(f"  gather baseline: {dt * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
