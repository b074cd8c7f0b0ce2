"""Does XLA CSE already dedupe duplicate sampler PLANNING for multi-input
filters sampling at identical coords?

ROUND2_NOTES headroom item 3 suspected multi-input filters re-plan per
image. The planning subgraphs (stats, tier fits, claims, compactions) are
identical HLO for identical (x, y) coords, so XLA's CSE may already merge
them — in which case a sharing refactor buys only trace/compile time.

Measures at 4K on the real TPU:
  one   : single-image warp sampled once
  two   : the SAME warp sampling TWO images at the SAME coords (blend)
If planning were duplicated at runtime, `two` ~= 2*`one`; if only the
kernel launches duplicate, `two` - `one` ~= kernel cost (~5 ms @4K).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fence_time(fn, n=12, reps=3):
    import jax.numpy as jnp

    fn()
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(n):
            acc = acc + fn()
        _ = float(acc)
        best = min(best, (time.perf_counter() - start) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm

    w, h = 3840, 2160
    rng = np.random.RandomState(42)
    img1 = jax.device_put(rng.rand(h, w, 4).astype(np.float32))
    img2 = jax.device_put(rng.rand(h, w, 4).astype(np.float32))
    jax.block_until_ready((img1, img2))
    opts = mm.RenderOptions(interpolation="bilinear")

    src_one = ("filter one (image im1)\n"
               "  im1(toXY(ra:[r * (0.7 + 0.1 * sin(t)), a]))\nend")
    src_two = ("filter two (image im1, image im2)\n"
               "  p = toXY(ra:[r * (0.7 + 0.1 * sin(t)), a]);\n"
               "  0.5 * im1(p) + 0.5 * im2(p)\nend")

    f1 = mm.compile(src_one)
    r1 = f1._renderer(w, h, opts, 1)
    dt1 = fence_time(lambda: jnp.sum(r1([img1], {}, t=0.37)))
    print(f"# one-image: {dt1 * 1e3:.2f} ms", file=sys.stderr)

    f2 = mm.compile(src_two)
    r2 = f2._renderer(w, h, opts, 1)
    dt2 = fence_time(lambda: jnp.sum(r2([img1, img2], {}, t=0.37)))
    print(f"# two-image same coords: {dt2 * 1e3:.2f} ms "
          f"(delta {1e3 * (dt2 - dt1):.2f} ms)", file=sys.stderr)

    import json

    print(json.dumps({"one_ms": round(dt1 * 1e3, 2),
                      "two_ms": round(dt2 * 1e3, 2)}))


if __name__ == "__main__":
    main()
