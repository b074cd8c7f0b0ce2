"""A/B the static-trip-count while unroll on real TPU.

Variants run as ALTERNATING fenced batches within the same measurement
window (relay drift hits all variants equally — CLAUDE.md measurement
rule) with >=8 pipelined calls per fence to amortize dispatch; per-
variant best-of-reps is reported. Voronoi: masked-lax vs unroll (WK
ineligible: noise in body). Lissajous: WK engine vs unroll vs lax.

Usage: python - --size=3840x2160 < benchmarks/probe_unroll.py
(PYTHONPATH breaks the axon plugin — run via stdin from the repo cwd.)
"""
import sys
import time

import jax
import jax.numpy as jnp

import mathmap_tpu as mm

W, H = 3840, 2160
for a in sys.argv[1:]:
    if a.startswith("--size"):
        W, H = map(int, a.split("=", 1)[1].split("x"))

MPIX = W * H / 1e6


def make(path, unroll_max, pallas_while="auto", params=None):
    """Fresh filter + renderer traced under the given unroll budget.
    NOTE: the tracer reads RenderOptions.while_static_unroll (the module
    global TR.WHILE_UNROLL_MAX is only its default) — the budget MUST go
    through the options or the A/B silently measures identical programs."""
    f = mm.compile_file(path)
    opts = mm.RenderOptions(pallas_while=pallas_while,
                            while_static_unroll=unroll_max)
    r = f._renderer(W, H, opts, 1)
    p = params or {}
    out = r([], p, t=0.37)            # trace+compile under this budget
    print(f"  compiled {path} unroll={unroll_max} pw={pallas_while} "
          f"params={p} sum={float(jnp.sum(out)):.3f}",
          file=sys.stderr, flush=True)
    return r, p


def timed(variants, reps=6, calls=8):
    """Alternating per-variant fenced batches (A,B,...,A,B,... within one
    window so drift hits all variants); each fence pipelines `calls`
    launches; best-of-reps per variant."""
    best = {k: 1e9 for k in variants}
    for rep in range(reps):
        for name, (r, p) in variants.items():
            acc = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(calls):
                out = r([], p, t=0.37 + 0.001 * i)
                acc = acc + jnp.sum(out)
            _ = float(acc)
            dt = (time.perf_counter() - t0) / calls
            best[name] = min(best[name], dt)
    return best


def report(tag, best):
    for name, dt in best.items():
        print(f"{tag:12s} {name:10s} {dt*1e3:7.2f} ms/frame  "
              f"{MPIX/dt:7.1f} Mpix/s", flush=True)


print(f"grid {W}x{H}, platform={jax.devices()[0].platform}", flush=True)

vor = {
    "lax": make("filters/Render/voronoi.mm", 0),
    "unroll": make("filters/Render/voronoi.mm", 64),
}
report("voronoi", timed(vor))

lis = {
    "wk": make("filters/Render/lissajous.mm", 0, pallas_while="auto"),
    "lax": make("filters/Render/lissajous.mm", 0, pallas_while="off"),
    "unroll": make("filters/Render/lissajous.mm", 64, pallas_while="off"),
}
report("lissajous", timed(lis))

# userval baking: default octaves (4) bakes + unrolls; the SAME value
# passed explicitly stays traced -> masked lax (the product-path delta
# a user sees from baking)
rid = {
    "baked": make("filters/Noise/ridged_noise.mm", 64),
    "traced": make("filters/Noise/ridged_noise.mm", 64,
                   params={"octaves": 4}),
}
report("ridged", timed(rid))
