"""Interleaved same-window A/B: render_batch with a broadcast-stacked
input vs mm.shared (pad-once) at 4K x8 param-varying jobs.

The stacked form re-pads the image inside every map iteration (~3 ms per
4K job per input); shared hoists the pad build before the loop. Run from
the repo cwd on the real chip:  python - < benchmarks/probe_shared.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm

    w, h, n = 3840, 2160, 8
    rng = np.random.RandomState(42)
    img = (rng.rand(h, w, 4) * 255).astype(np.uint8)
    dev = jax.device_put(jnp.asarray(img))
    jax.block_until_ready(dev)
    stack = jnp.broadcast_to(dev, (n,) + dev.shape)
    ts = (np.arange(n, dtype=np.float32) + 0.37) / n
    opts = mm.RenderOptions(interpolation="bilinear")

    cases = [
        ("filters/Distorts/fisheye.mm", "strength", 2.0, 0.03),
        ("filters/Distorts/twirl.mm", "angle", 3.0, 0.05),
        ("filters/Distorts/pond.mm", "phase", 0.0, 0.07),
    ]
    for path, pname, base, step in cases:
        f = mm.compile_file(path)
        params = [{pname: base + step * i} for i in range(n)]
        # renderer-level calls return DEVICE arrays: the api wrapper's
        # np.asarray would put a ~265 MB host pull through the relay
        # inside the timing, swamping the pad-hoist delta being measured
        rend = f._renderer(w, h, opts, 1)

        def run_stacked(toff):
            return rend.render_batch([stack], params, ts + toff)

        def run_shared(toff):
            return rend.render_batch([dev], params, ts + toff,
                                     shared_mask=(True,))

        # warm both programs (compiles), fenced
        _ = float(jnp.sum(run_stacked(0.0)))
        _ = float(jnp.sum(run_shared(0.0)))

        best = {"stacked": float("inf"), "shared": float("inf")}
        for rep in range(5):
            for name, fn in (("stacked", run_stacked), ("shared", run_shared)):
                t0 = time.perf_counter()
                _ = float(jnp.sum(fn(0.001 * (rep + 1))))
                best[name] = min(best[name],
                                 (time.perf_counter() - t0) / n)
        mp_st = w * h / best["stacked"] / 1e6
        mp_sh = w * h / best["shared"] / 1e6
        print(f"{path}: stacked {best['stacked']*1e3:.2f} ms/frame "
              f"({mp_st:.1f} Mpix/s)  shared {best['shared']*1e3:.2f} "
              f"({mp_sh:.1f})  delta {100*(mp_sh/mp_st-1):+.1f}%",
              flush=True)


main()
