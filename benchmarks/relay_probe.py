"""10-second relay health probe (run from repo cwd: python - < this file).

Prints one line: the best fenced 16MB-elementwise round-trip over 3
samples, in ms. Healthy < 5 ms; round 2-3 ran at 13-24 ms (3-5x degraded).
Use before bench.py: a < 5 ms window is worth an immediate full bench run
(the health gate records the best window but retries cost budget)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    img = jax.device_put(np.ones((1024, 1024, 4), np.float32))
    pf = jax.jit(lambda x: jnp.sum(x * 2.0 + 1.0))
    _ = float(pf(img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(pf(img) + pf(img))
        best = min(best, (time.perf_counter() - t0) / 2 * 1e3)
    gate = "HEALTHY" if best < 5.0 else "DEGRADED"
    print(f"relay_health_ms={best:.1f} {gate}")


main()
