"""Corner-grid AA vs s×s grid AA on the BASELINE config-4 shape.

Ripple 1080p, 24-frame batched t-sweep (render_all_frames), supersample on:
  grid     2x2 subpixel grid — 4 evaluations/frame (the default)
  corners  (H+1)x(W+1) corner grid + centers — ~2.07 evaluations/frame
  noaa     supersample=1 control (the floor)

Interleaved rounds (drift hits all variants). Run from the repo cwd:
    python - < benchmarks/probe_corners.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

W, H, FRAMES = 1920, 1080, 24
ROUNDS = 4


def main():
    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm

    rng = np.random.RandomState(5)
    img = rng.rand(H, W, 4).astype(np.float32)
    img[..., 3] = 1.0
    # pre-stage the input on device (bench.py does the same): a numpy
    # input would re-ride the relay host->device on EVERY dispatch
    img = jax.device_put(jnp.asarray(img))
    jax.block_until_ready(img)
    f = mm.compile_file("filters/Distorts/ripple.mm")

    variants = [
        ("noaa", mm.RenderOptions(supersample=1)),
        ("grid", mm.RenderOptions(supersample=2)),
        ("corners", mm.RenderOptions(supersample=2,
                                     supersample_scheme="corners")),
    ]
    ts = np.arange(FRAMES, dtype=np.float32) / FRAMES
    runners = []
    for name, opts in variants:
        r = f._renderer(W, H, opts, FRAMES)
        out = r.render_all_frames([img], {}, ts)
        _ = float(jnp.sum(out[:, :2, :2]))  # fence warmup/compile
        runners.append((name, r, out.shape))

    times = {name: [] for name, *_ in runners}
    for _ in range(ROUNDS):
        for name, r, _s in runners:
            t0 = time.perf_counter()
            out = r.render_all_frames([img], {}, ts)
            _ = float(jnp.sum(out[:, :2, :2]))
            times[name].append((time.perf_counter() - t0) / FRAMES * 1e3)

    res = {}
    npx = W * H
    for name, ts_l in times.items():
        best = min(ts_l)
        res[name] = {"ms_per_frame": round(best, 2),
                     "mpix_s": round(npx / best / 1e3, 1),
                     "per_round": [round(t, 2) for t in ts_l]}
        print(f"# {name}: best {best:.2f} ms/frame "
              f"({npx / best / 1e3:.0f} Mpix/s) rounds "
              f"{[round(t, 1) for t in ts_l]}", file=sys.stderr)
    print(json.dumps(res))


main()
