"""Probe 2: t-sweep formulations on a filter that actually USES t.

probe_sweep.py's unroll8 read 1566 Mpix/s on twirl — BOGUS: twirl ignores
t, so the 8 Python-unrolled frame programs were identical functions of
identical live inputs and XLA CSE'd 7 away. (The honest rows there:
perframe 19.43 / sweep 19.74 / sweep_args 20.48 / sweep_u8 18.09 ms —
the r3 batched-vs-perframe inversion does NOT reproduce in same-window
interleaved rounds; it was cross-phase relay drift.)

This probe re-asks the real question — can an UNROLLED multi-frame
program overlap anything a lax.map sweep serializes? — with a
t-DEPENDENT twirl (angle varies per frame, so no two frames share a
subcomputation).

Run from repo cwd:  timeout 1800 python - < benchmarks/probe_sweep2.py
"""

import time

import numpy as np

SRC = ("filter twt (image in, float angle: -10-10 (3))\n"
       "  in(toXY(ra:[r, a + (angle + t) * (1 - r / R) ^ 2]))\n"
       "end")
W, H = 3840, 2160
N = 8
ROUNDS = 3


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm

    opts = mm.RenderOptions(interpolation="bilinear")
    rng = np.random.RandomState(42)
    img = rng.rand(H, W, 4).astype(np.float32)
    img[..., 3] = 1.0

    filt = mm.compile_source(SRC)
    r = filt._renderer(W, H, opts, 1)

    dev_img = jax.device_put(img)
    jax.block_until_ready(dev_img)
    ts = (np.arange(N, dtype=np.float32) + 0.37) / N
    ins = [dev_img]
    arrays, kinds = {}, ()

    def run_perframe(toff):
        acc = jnp.float32(0)
        for i in range(N):
            out = r(ins, {}, t=float(ts[i]) + toff)
            acc = acc + jnp.sum(out)
        return float(acc) / N

    def run_sweep(toff):
        out = r.render_all_frames(ins, {}, ts + toff)
        return float(jnp.sum(out))

    prepads = r._prepads(ins, ins)
    if r._base_layout is not None and r._grids is None:
        r._grids = r._grids_jit()
    grids = r._grids
    ts_j = jnp.asarray(ts)

    @functools.partial(jax.jit, static_argnums=(2,))
    def unroll8(ins_, arrays_, kinds_, ts_, prepads_, grids_):
        outs = [r._jitted(ins_, arrays_, kinds_, ts_[i],
                          jnp.float32(i), prepads_, grids_)
                for i in range(N)]
        # sum per frame instead of stacking 1 GB: the fence needs one
        # scalar; stack+sum would bill ~2.5 ms of pure fence traffic
        return sum(jnp.sum(o) for o in outs)

    def run_unroll8(toff):
        return float(unroll8(ins, arrays, kinds, ts_j + toff, prepads,
                             grids))

    variants = [
        ("perframe", run_perframe),
        ("sweep", run_sweep),
        ("unroll8", run_unroll8),
    ]

    for name, fn in variants:
        t0 = time.perf_counter()
        fn(0.0)
        print(f"# compiled+warm {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    best = {name: float("inf") for name, _ in variants}
    for rd in range(ROUNDS):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn(0.001 * (rd + 1))
            dt = time.perf_counter() - t0
            per_frame = dt / N  # every variant renders N frames per fence
            best[name] = min(best[name], per_frame)
            print(f"round {rd} {name:9s} {per_frame * 1e3:7.2f} ms/frame  "
                  f"{W * H / per_frame / 1e6:7.1f} Mpix/s", flush=True)

    print("\n# BEST (min over interleaved rounds):")
    for name, _ in variants:
        print(f"#   {name:9s} {best[name] * 1e3:7.2f} ms/frame  "
              f"{W * H / best[name] / 1e6:7.1f} Mpix/s")


main()
