"""Worker for tests/test_distributed_multiproc.py — one of TWO processes
forming a multi-process JAX fleet over CPU devices (gloo collectives).

Exercises the REAL multi-host path of SURVEY §2.2's comm-backend row:
`parallel.distributed.initialize` (our wiring), a GLOBAL mesh spanning
both processes (4 local devices each -> 8 global), cross-process psum +
ppermute (the halo-exchange primitive), and an actual row-sharded
mathmap render through parallel.shard.render_frame_sharded whose output
rows land on devices of BOTH processes. Each process asserts its
addressable output rows equal the oracle's.

Usage: python tests/_mp_worker.py <process_id> <coordinator_addr>
(env: XLA_FLAGS=--xla_force_host_platform_device_count=4)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid, coord = int(sys.argv[1]), sys.argv[2]

from mathmap_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mathmap_tpu as mm  # noqa: E402
from mathmap_tpu.parallel import shard as S  # noqa: E402
from mathmap_tpu.parallel.mesh import ROW_AXIS, make_mesh  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 8
assert distributed.is_multihost()

mesh = make_mesh(rows=8)  # global mesh spanning both processes

# 1) cross-process collectives: psum + ppermute ring (the halo primitive)
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

vals = np.arange(8, dtype=np.float32) + 1.0  # device i holds i+1


def collective(x):
    total = jax.lax.psum(jnp.sum(x), ROW_AXIS)
    nbr = jax.lax.ppermute(jnp.sum(x), ROW_AXIS,
                           [(i, (i + 1) % 8) for i in range(8)])
    return x * 0 + total * 0.001 + nbr


spec = NamedSharding(mesh, P(None, ROW_AXIS, None))
arr = jax.make_array_from_callback(
    (1, 8, 1), spec, lambda idx: vals.reshape(1, 8, 1)[idx])
out = jax.jit(jax.shard_map(collective, mesh=mesh,
                            in_specs=P(None, ROW_AXIS, None),
                            out_specs=P(None, ROW_AXIS, None)))(arr)
for s in out.addressable_shards:
    i = s.index[1].start or 0
    got = float(np.asarray(s.data).ravel()[0])
    want = 36.0 * 0.001 + ((i - 1) % 8 + 1)  # ring neighbor's value
    assert abs(got - want) < 1e-5, (pid, i, got, want)
print(f"pid{pid}: collectives OK", flush=True)

# 2) an actual cross-process row-sharded render vs the oracle
H, W = 16, 32
img = (np.arange(H * W * 4, dtype=np.float32) % 97 / 97.0).reshape(H, W, 4)
f = mm.compile_source("in(xy * [0.8, 1.1]) + grayColor(x / W * 0.25)")
opts = mm.RenderOptions(interpolation="bilinear")
mesh2 = make_mesh(rows=8, cols=1)


def run(ins, t):
    return S.render_frame_sharded(mesh2, f.filters, f.fdef, W, H, opts,
                                  ins, {}, t=t)


out = jax.jit(run)([img], 0.37)
oracle = f.render(img, width=W, height=H, t=0.37, options=opts,
                  interpret=True)
checked = 0
for s in out.addressable_shards:
    r0 = s.index[0].start or 0
    tile = np.asarray(s.data)
    np.testing.assert_allclose(
        tile, oracle[r0:r0 + tile.shape[0]], atol=2e-4,
        err_msg=f"pid{pid} rows {r0}..{r0 + tile.shape[0]}")
    checked += tile.shape[0]
assert checked == H // 2, checked  # this process owns half the rows
print(f"pid{pid}: sharded render OK ({checked} rows checked)", flush=True)
