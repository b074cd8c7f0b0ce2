"""Interleaved same-window A/B: the sustained phase's ripple 1080p x24
render_all_frames sweep, f32-in/f32-out (the bench basis) vs u8-in/u8-out
(the product's end-to-end format; output stack 4x smaller).

Run from the repo cwd: python - < benchmarks/probe_sustained_u8.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm

    w, h, n = 1920, 1080, 24
    rng = np.random.RandomState(42)
    img = rng.rand(h, w, 4).astype(np.float32)
    img[..., 3] = 1.0
    img_u8 = mm.to_uint8(img)
    ts = np.arange(n, dtype=np.float32) / n

    f = mm.compile_file("filters/Distorts/ripple.mm")
    r_f32 = f._renderer(w, h, mm.RenderOptions(interpolation="bilinear"), 1)
    r_u8 = f._renderer(w, h, mm.RenderOptions(interpolation="bilinear",
                                              output_dtype="uint8"), 1)
    dev_f = jax.device_put(jnp.asarray(img))
    dev_u = jax.device_put(jnp.asarray(img_u8))
    jax.block_until_ready((dev_f, dev_u))

    def run_f32(toff):
        return r_f32.render_all_frames([dev_f], {}, ts + toff)

    def run_u8(toff):
        return r_u8.render_all_frames([dev_u], {}, ts + toff)

    _ = float(jnp.sum(run_f32(0.0)))
    _ = float(jnp.sum(run_u8(0.0), dtype=jnp.float32))
    best = {"f32io": float("inf"), "u8io": float("inf")}
    for rep in range(5):
        t0 = time.perf_counter()
        _ = float(jnp.sum(run_f32(0.001 * (rep + 1))))
        best["f32io"] = min(best["f32io"], (time.perf_counter() - t0) / n)
        t0 = time.perf_counter()
        _ = float(jnp.sum(run_u8(0.001 * (rep + 1)), dtype=jnp.float32))
        best["u8io"] = min(best["u8io"], (time.perf_counter() - t0) / n)
    mf, mu = (w * h / best[k] / 1e6 for k in ("f32io", "u8io"))
    print(f"ripple 1080p x{n}: f32io {best['f32io']*1e3:.2f} ms/frame "
          f"({mf:.1f} Mpix/s)  u8io {best['u8io']*1e3:.2f} ({mu:.1f})  "
          f"delta {100*(mu/mf-1):+.1f}%", flush=True)


main()
