"""Halo-exchange tiled rendering: the sequence/context-parallel analog.

Reference has no distributed comm at all (SURVEY.md §2.2) — the structural
analog of sequence parallelism is large-canvas tiling: when a 4K+ render or
multi-image composite exceeds HBM with replicated inputs, shard the INPUT
image rows across devices and exchange `halo` boundary rows with ring
neighbors over ICI via `lax.ppermute` (SURVEY §2.2 SP row, §5 long-context
row). Each device then renders its output row block sampling only within its
extended local block.

Correctness contract: the filter's source displacement must be bounded by
`halo` rows vertically (the bounded-displacement condition). Horizontal
access is unrestricted (rows are whole). Displacements beyond the halo clamp
into the block — callers choose `halo` from the filter's parameters (e.g.
ripple amplitude).
"""

from __future__ import annotations

import numpy as np

from ..runtime.render import render_frame
from ..runtime.tracer import RenderContext
from ..runtime.value import TiledInput
from ..utils.errors import MMRuntimeError
from .mesh import ROW_AXIS, axis_size


def exchange_halo(inp_local, halo: int, axis_name: str = ROW_AXIS):
    """Extend a local row block with `halo` rows from ring neighbors.

    inp_local: (tile_h, W, 4) this device's rows. Returns
    (tile_h + 2*halo, W, 4); at the global top/bottom the halo wraps around
    the ring (devices clamp those rows away during sampling)."""
    import jax
    import jax.numpy as jnp

    n = jax.lax.axis_size(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]  # send to next (rows below)
    up = [(i, (i - 1) % n) for i in range(n)]  # send to prev (rows above)
    # my bottom rows become the NEXT device's top halo
    from_above = jax.lax.ppermute(inp_local[-halo:], axis_name, down)
    # my top rows become the PREVIOUS device's bottom halo
    from_below = jax.lax.ppermute(inp_local[:halo], axis_name, up)
    return jnp.concatenate([from_above, inp_local, from_below], axis=0)


def render_frame_tiled(mesh, program_filters, fdef, width, height, opts,
                       input_array, halo: int, uservals=None, t=0.0, frame=0.0):
    """One frame with the input row-sharded P(y) and halo exchange.

    input_array: (H, W, 4) with H == output height (the common identity-
    geometry case). Returns (H, W, 4) sharded P(y, None, None)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    ny = axis_size(mesh, ROW_AXIS)
    if height % ny:
        raise MMRuntimeError(f"height ({height}) must be divisible by mesh rows ({ny})")
    tile_h = height // ny
    if halo > tile_h:
        raise MMRuntimeError(f"halo ({halo}) larger than tile height ({tile_h})")
    uservals = uservals or {}

    def tile_render(inp_local):
        row_idx = jax.lax.axis_index(ROW_AXIS)
        row_off = row_idx * tile_h
        ext = exchange_halo(inp_local, halo)
        img = TiledInput(
            pixels=ext, name="in0",
            global_height=height, row_base=row_off - halo,
        )
        ctx = RenderContext(
            be=jnp, width=width, height=height, opts=opts,
            inputs=[img], filters=program_filters, t=t, frame=frame,
            is_jax=True, grid_shape=(tile_h, width), row_offset=row_off,
        )
        return render_frame(ctx, fdef, uservals)

    shard = jax.shard_map(
        tile_render, mesh=mesh,
        in_specs=P(ROW_AXIS, None, None),
        out_specs=P(ROW_AXIS, None, None),
        check_vma=False,
    )
    return shard(input_array)


class TiledRenderer:
    """jit wrapper for the halo-exchange path."""

    def __init__(self, mesh, program_filters, fdef, width, height, opts, halo: int):
        import jax
        import jax.numpy as jnp

        self.jnp = jnp

        def run(inp, t):
            return render_frame_tiled(
                mesh, program_filters, fdef, width, height, opts, inp, halo, t=t
            )

        self._jitted = jax.jit(run)

    def __call__(self, input_array, t=0.0):
        jnp = self.jnp
        return self._jitted(jnp.asarray(np.asarray(input_array, np.float32)), jnp.float32(t))
