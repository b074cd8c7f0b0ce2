"""Probe: why is the 4K suite SLOWER through render_all_frames than
per-frame? (VERDICT r3 weak #2: 435-458 batched vs 485-508 per-frame —
backwards; batching wins everywhere else.)

Variants, interleaved in the same fenced rounds (relay drift lies across
sequential A/Bs — CLAUDE.md):
  perframe   8 pipelined single-frame dispatches, one fence (the suite's
             own measurement shape)
  sweep      render_all_frames as shipped (prepads+grids computed INSIDE
             the jitted sweep program)
  sweep_args same lax.map sweep but prepads+grids PRECOMPUTED and passed
             as plain args (the per-frame path's arrangement)
  unroll8    Python-unrolled 8-frame jit (no lax.map; XLA sees 8
             independent frame programs and may overlap them)
  sweep_u8   render_all_frames with uint8 output (quarters output HBM
             writes + readback; diagnostic for output pressure)

Run from repo cwd: timeout 1800 python - < benchmarks/probe_sweep.py
"""

import time

import numpy as np

FILTER = "filters/Distorts/twirl.mm"
W, H = 3840, 2160
N = 8
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    import mathmap_tpu as mm

    opts = mm.RenderOptions(interpolation="bilinear")
    rng = np.random.RandomState(42)
    img = rng.rand(H, W, 4).astype(np.float32)
    img[..., 3] = 1.0

    filt = mm.compile_file(FILTER)
    r = filt._renderer(W, H, opts, 1)
    opts_u8 = mm.RenderOptions(interpolation="bilinear", output_dtype="uint8")
    r_u8 = filt._renderer(W, H, opts_u8, 1)

    dev_img = jax.device_put(img)
    jax.block_until_ready(dev_img)
    ts = (np.arange(N, dtype=np.float32) + 0.37) / N
    ins = [dev_img]

    # --- variant closures ------------------------------------------------
    def run_perframe(toff):
        acc = jnp.float32(0)
        for i in range(N):
            out = r(ins, {}, t=float(ts[i]) + toff)
            acc = acc + jnp.sum(out)
        return float(acc) / N  # per-frame fence amortized

    def run_sweep(toff):
        out = r.render_all_frames(ins, {}, ts + toff)
        return float(jnp.sum(out))

    def run_sweep_u8(toff):
        out = r_u8.render_all_frames(ins, {}, ts + toff)
        return float(jnp.sum(out.astype(jnp.float32)))

    # sweep with prepads+grids as ARGS: reuse the renderer's own jitted
    # per-frame program inside a lax.map (jit-of-jit inlines)
    import functools

    ctx = None
    arrays, kinds = {}, ()

    @functools.partial(jax.jit, static_argnums=(2,))
    def sweep_args(ins_, arrays_, kinds_, ts_, prepads, grids):
        frames = jnp.arange(ts_.shape[0], dtype=jnp.float32)

        def one(args):
            frame, t = args
            return r._jitted(ins_, arrays_, kinds_, t, frame, prepads, grids)

        return jax.lax.map(one, (frames, ts_))

    @functools.partial(jax.jit, static_argnums=(2,))
    def unroll8(ins_, arrays_, kinds_, ts_, prepads, grids):
        outs = [r._jitted(ins_, arrays_, kinds_, ts_[i],
                          jnp.float32(i), prepads, grids)
                for i in range(N)]
        return jnp.stack(outs)

    prepads = r._prepads(ins, ins)
    if r._base_layout is not None and r._grids is None:
        r._grids = r._grids_jit()
    grids = r._grids
    ts_j = jnp.asarray(ts)

    def run_sweep_args(toff):
        out = sweep_args(ins, arrays, kinds, ts_j + toff, prepads, grids)
        return float(jnp.sum(out))

    def run_unroll8(toff):
        out = unroll8(ins, arrays, kinds, ts_j + toff, prepads, grids)
        return float(jnp.sum(out))

    variants = [
        ("perframe", run_perframe, 1.0 / N),   # fence already amortized
        ("sweep", run_sweep, 1.0),
        ("sweep_args", run_sweep_args, 1.0),
        ("unroll8", run_unroll8, 1.0),
        ("sweep_u8", run_sweep_u8, 1.0),
    ]

    # warmup / compile (serial; remote compiles 1-3 min each)
    for name, fn, _ in variants:
        t0 = time.perf_counter()
        fn(0.0)
        print(f"# compiled+warm {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    best = {name: float("inf") for name, _, _ in variants}
    for rd in range(ROUNDS):
        for name, fn, scale in variants:
            t0 = time.perf_counter()
            fn(0.001 * (rd + 1))
            dt = (time.perf_counter() - t0) * (scale if scale != 1.0 else 1.0)
            per_frame = dt if name == "perframe" else dt / N
            best[name] = min(best[name], per_frame)
            print(f"round {rd} {name:10s} {per_frame * 1e3:7.2f} ms/frame  "
                  f"{W * H / per_frame / 1e6:7.1f} Mpix/s", flush=True)

    print("\n# BEST (min over rounds, same-window interleaved):")
    for name, _, _ in variants:
        print(f"#   {name:10s} {best[name] * 1e3:7.2f} ms/frame  "
              f"{W * H / best[name] / 1e6:7.1f} Mpix/s")


main()
