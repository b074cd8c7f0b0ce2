"""Interleaved same-window A/B: the SHARED-input jobs path (render_batch
with mm.shared semantics) under sweep_unroll 1 (flat lax.map) vs 8
(chunk-unrolled).

Why re-probe: the product A/B that made flat the default
(PERFORMANCE.md "chunk-unrolled frame sweeps") ran render_all_frames —
prepads built in-jit before the map but the (F,H,W,4) stack fully
materialized per chunk. The shared jobs path is closer to probe_sweep2's
formulation (prepads hoisted as loop-invariants), where unrolled-8 won
+18%. Run from the repo cwd: python - < benchmarks/probe_shared2.py
"""

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
    ts = (np.arange(n, dtype=np.float32) + 0.37) / n

    cases = [
        ("filters/Distorts/fisheye.mm", "strength", 2.0, 0.03),
        ("filters/Distorts/twirl.mm", "angle", 3.0, 0.05),
    ]
    for path, pname, base, step in cases:
        f = mm.compile_file(path)
        params = [{pname: base + step * i} for i in range(n)]
        rends = {
            u: f._renderer(w, h, mm.RenderOptions(
                interpolation="bilinear", sweep_unroll=u), 1)
            for u in (1, 8)
        }

        def run(u, toff):
            return rends[u].render_batch([dev], params, ts + toff,
                                         shared_mask=(True,))

        for u in (1, 8):  # warm both programs, fenced
            _ = float(jnp.sum(run(u, 0.0)))

        best = {1: float("inf"), 8: float("inf")}
        for rep in range(5):
            for u in (1, 8):
                t0 = time.perf_counter()
                _ = float(jnp.sum(run(u, 0.001 * (rep + 1))))
                best[u] = min(best[u], (time.perf_counter() - t0) / n)
        m1, m8 = (w * h / best[u] / 1e6 for u in (1, 8))
        print(f"{path}: flat {best[1]*1e3:.2f} ms/frame ({m1:.1f} Mpix/s)"
              f"  unroll8 {best[8]*1e3:.2f} ({m8:.1f})"
              f"  delta {100*(m8/m1-1):+.1f}%", flush=True)


main()
