"""In-VMEM per-pixel while loops — the fractal fast path.

The tracer's jit while loop (`runtime/tracer._eval_While`) carries every
loop variable through HBM on each `lax.while_loop` iteration; for fractal
loops (mandelbrot: 3 carries + mask over an 8M-pixel grid) that is ~2x the
4K frame's bandwidth PER ITERATION, and measures ~3x off the in-VMEM bound.
The TPU-native fix: run the iteration ON-CHIP. A Pallas kernel evaluates
K_IN=32 masked steps per (8, 256) tile entirely in VMEM (step bodies are
unrolled Python — Mosaic's scf lowering rejects vector loop carries), and
an outer `lax.while_loop` keeps the exact convergence/early-exit and
`max_loop_iters` semantics: carries round-trip HBM once per 32 iterations
instead of once per 4. Measured: hand-rolled 4K mandelbrot 15.5ms (XLA)
-> 6.1ms (in-VMEM).

Eligibility is decided statically (`eligible`): the loop body/cond may only
call elementwise builtins (no image/curve/gradient application, no
table-based noise or GSL-class specials — Mosaic has no vector gather;
rand() IS allowed: its index grid is built from 2-D iotas; no nested
while — scf again),
the render must be tile-aligned, big enough to amortize the launch, and
not already inside a Pallas kernel. Mesh-sharded renders run the engine
PER DEVICE TILE (round 3): the tile's traced global offsets enter the
kernel as (1, 1) scalar inputs. Everything else falls back
to the XLA unrolled loop. The step semantics (mask gating, cond-assignment
persistence, max_iters cap) are the SAME closure the XLA path uses — this
module only owns the tiling/launch mechanics.
"""

from __future__ import annotations

from dataclasses import replace

from ..lang import astnodes as A

#: masked steps executed per pallas call (per outer lax iteration)
K_IN = 32
TILE_H = 8
TILE_W = 256

#: builtins whose jax implementations lower through Mosaic (elementwise /
#: VPU only — anything gather-based, jax.scipy-backed, or 1-D-iota-based
#: is out). Probed on real TPU (round 3): Mosaic's TC lowering REJECTS
#: asin/acos/atan/atan2/sinh/cosh/asinh/acosh/atanh (and erf) — so those
#: names, and every builtin whose implementation reaches them in ANY
#: overload (toRA and arg() use atan2; gamma's complex overload does;
#: jacobi sn/cn/dn use asin), must stay OFF this list or eligible loops
#: would crash at lowering on TPU while passing in interpret mode.
#: Supported per the same probe: sin/cos/tan/tanh, exp/exp2,
#: log/log2/log10, sqrt/rsqrt, pow, round/floor/sign. The fixed-depth
#: AGM/Lanczos specials (ellK/ellE/lgamma/beta) also LOWER fine —
#: measured exact (9e-8) — but a specials-dense body is compute-bound,
#: not HBM-carry-bound, and ran 3x SLOWER in-engine than the XLA loop
#: (52.8 vs 16.7 ms, 4K, 8-iter ellK+lgamma+beta body), so they stay
#: off the list on purpose: auto mode must not slow such filters down.
SAFE_CALLS = frozenset({
    "__add", "__sub", "__mul", "__div", "__mod", "__pow", "__eq", "__ne",
    "__lt", "__gt", "__le", "__ge", "__and", "__or", "__xor", "__neg",
    "__not",
    "abs", "sign", "min", "max", "clamp", "lerp", "smoothstep", "inintv",
    "floor", "ceil", "round", "fmod", "hypot",
    "sqrt", "exp", "exp2", "log", "log2", "log10", "pow",
    "sin", "cos", "tan", "tanh",
    "deg2rad", "rad2deg", "rand",
    "rgbColor", "rgbaColor", "grayColor", "grayaColor",
    "red", "green", "blue", "alpha", "gray",
    "toXY", "toHSVA", "toRGBA",
    "conj", "length", "dotp", "crossp", "normalize", "scale",
})


#: internals whose EVALUATION reaches a Mosaic-rejected transcendental
#: (tracer._internal: `a` and `ra` compute arctan2) — a body reading one
#: of these UNSHADOWED would lower the atan2 inside the kernel and crash
#: at Mosaic compile on real TPU (invisible to interpret-mode tests).
#: Shadowed reads are fine: a pre-loop env binding, or an in-loop
#: assignment (the name becomes a carried variable whose internal-seeded
#: init evaluates OUTSIDE the kernel).
_UNSAFE_INTERNALS = frozenset({"a", "ra"})


def _calls_safe(node, env=None, filters=None) -> bool:
    for sub in A.walk(node):
        if isinstance(sub, A.Call):
            f = sub.func
            if not isinstance(f, A.Var) or f.name not in SAFE_CALLS:
                return False
            # a SAFE_CALLS name shadowed by an env value (curve param
            # named `sin`) or a user filter resolves to THAT in the
            # evaluator — but launch() drops opaque deps, so the
            # in-kernel call would silently fall through to the builtin
            # and diverge from the XLA/oracle path (review r3 finding)
            if env is not None and f.name in env:
                return False
            if filters and f.name in filters:
                return False
        if isinstance(sub, A.While) and sub is not node:
            return False  # nested while: scf lowering limits
    return True


def _reads_unsafe_internal(node, env) -> bool:
    assigned = A.assigned_names(node.body) | A.assigned_names(node.cond)
    for sub in A.walk(node):
        if (isinstance(sub, A.Var) and sub.name in _UNSAFE_INTERNALS
                and (env is None or sub.name not in env)
                and sub.name not in assigned):
            return True
    return False


def eligible(ctx, node: A.While, env=None) -> bool:
    from ..runtime.sampling import pallas_policy

    if not ctx.is_jax or getattr(ctx, "in_pallas", False):
        return False
    # Mesh-sharded tiles (grid_shape pixel tiles or base-layout
    # local_height tiles — parallel/shard.py, parallel/halo.py) run the
    # engine PER DEVICE TILE: ctx.shape is the concrete local shape and
    # the tile's traced global offsets (lax.axis_index-derived) ride
    # (1, 1) scalar inputs into the kernel (launch below), so multi-chip
    # fractal renders keep the in-VMEM carry path instead of paying the
    # HBM round-trips the engine exists to avoid.
    mode = getattr(ctx.opts, "pallas_while", "auto")
    if mode == "off":
        return False
    h, w = ctx.shape
    if mode != "on" and h * w < (1 << 20):
        return False  # tiny grids don't amortize a pallas launch
    if mode != "on" and not pallas_policy(ctx.opts):
        # 'on' is documented as FORCING the engine — it must not be
        # silently vetoed by the sampler knob (review r3 finding); 'auto'
        # still follows the device policy
        return False
    filters = getattr(ctx, "filters", None)
    body_ok = (_calls_safe(node.body, env, filters)
               and _calls_safe(node.cond, env, filters))
    if body_ok and _reads_unsafe_internal(node, env):
        return False
    return body_ok and not any(
        isinstance(s, A.While) and s is not node for s in A.walk(node))


def launch(ev, node: A.While, flat0, mask0, *, init_env, carried, step,
           max_iters: int):
    """Run the loop with in-VMEM step blocks; returns the final flat carry
    tuple, or None when a dependency's shape/dtype disqualifies the path
    (caller falls back to the XLA loop)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ..runtime.value import TupleValue

    ctx = ev.ctx
    H, W = ctx.shape
    n_flat = len(flat0)
    f32 = jnp.float32

    for a in flat0:
        if getattr(a, "dtype", None) != f32 or getattr(a, "shape", None) != (H, W):
            return None

    # non-tile-aligned grids: pad every grid array with edge values and a
    # FALSE mask (padding pixels never update), slice the carry back after
    Ht = -(-H // TILE_H) * TILE_H
    Wt = -(-W // TILE_W) * TILE_W
    pad = (Ht, Wt) != (H, W)

    def _pad(a):
        return jnp.pad(a, ((0, Ht - H), (0, Wt - W)), mode="edge") if pad else a

    # ---- dependencies: non-carried env values the loop reads ----
    reads = {s.name for s in A.walk(node) if isinstance(s, A.Var)}

    # ri:-tagged values make several SAFE_CALLS names dispatch to their
    # COMPLEX overloads, which reach Mosaic-rejected transcendentals
    # (c_sin/c_cos/c_tan -> sinh/cosh; c_sqrt/c_log/c_pow -> atan2) —
    # an eligible body would pass interpret-mode tests and crash at
    # Mosaic lowering on real TPU (review r3). Tags are only known here
    # (post-trace-entry), so the check lives in launch: bail to the XLA
    # loop when an ri value (carried, read, or created via a ri: cast in
    # the body) can meet one of those call names.
    _RI_UNSAFE = {"sin", "cos", "tan", "sqrt", "log", "pow", "__pow"}
    mentions_unsafe = any(
        (isinstance(s, A.Call) and isinstance(s.func, A.Var)
         and s.func.name in _RI_UNSAFE)
        or (isinstance(s, A.BinOp) and s.op == "^")
        for s in A.walk(node))
    if mentions_unsafe:
        has_ri = any(
            n in init_env and init_env[n].tag == "ri"
            for n in reads | set(carried)) or any(
            isinstance(s, A.Cast) and s.tag == "ri" for s in A.walk(node))
        if has_ri:
            return None
    dep_names = sorted(
        n for n in reads
        if n in init_env and n not in carried and not init_env[n].is_opaque)
    dep_specs = []  # (name, tag, [is_grid per component])
    dep_arrays = []
    dep_is_grid = []
    for n in dep_names:
        tv = init_env[n]
        comps = []
        for a in tv.arrays:
            a = jnp.asarray(a)
            if a.shape == (H, W):
                comps.append(True)
                dep_arrays.append(_pad(a))
                dep_is_grid.append(True)
            elif a.ndim == 0:
                comps.append(False)
                dep_arrays.append(a.astype(f32).reshape(1, 1))
                dep_is_grid.append(False)
            else:
                return None  # odd-shaped dependency: fall back
        dep_specs.append((n, tv.tag, comps))
    n_dep = len(dep_arrays)

    t_arr = jnp.asarray(ctx.t, f32).reshape(1, 1)
    fr_arr = jnp.asarray(ctx.frame, f32).reshape(1, 1)
    # The tile's global offsets may be TRACED under shard_map
    # (lax.axis_index-derived) — a pallas kernel cannot close over traced
    # values, so they enter as (1, 1) scalar inputs. row/col offsets are
    # offsets into THIS context's array layout (pixels, or base-layout
    # block rows) that the kernel advances per grid step; tile_row0/col0
    # are the base-layout tile's global pixel origin (rand decode).
    i32 = jnp.int32
    ro_arr = jnp.asarray(ctx.row_offset, i32).reshape(1, 1)
    co_arr = jnp.asarray(ctx.col_offset, i32).reshape(1, 1)
    tr_arr = jnp.asarray(ctx.tile_row0, i32).reshape(1, 1)
    tc_arr = jnp.asarray(ctx.tile_col0, i32).reshape(1, 1)
    x_arr = jnp.asarray(ev.x, f32)
    y_arr = jnp.asarray(ev.y, f32)
    if x_arr.shape != (H, W) or y_arr.shape != (H, W):
        return None
    x_arr = _pad(x_arr)
    y_arr = _pad(y_arr)

    small = pl.BlockSpec((1, 1), lambda i, j: (0, 0))
    grid_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j))

    def kernel(i_ref, t_ref, fr_ref, ro_ref, co_ref, tr_ref, tc_ref,
               x_ref, y_ref, m_ref, *rest):
        flat_refs = rest[:n_flat]
        dep_refs = rest[n_flat:n_flat + n_dep]
        out_refs = rest[n_flat + n_dep:]
        pi = pl.program_id(0)
        pj = pl.program_id(1)
        ctx2 = replace(
            ctx, grid_shape=(TILE_H, TILE_W),
            row_offset=ro_ref[0, 0] + pi * TILE_H,
            col_offset=co_ref[0, 0] + pj * TILE_W,
            tile_row0=tr_ref[0, 0], tile_col0=tc_ref[0, 0],
            t=t_ref[0, 0], frame=fr_ref[0, 0], in_pallas=True, inputs=[],
        )
        base_env = {}
        idx = 0
        for name, tag, comps in dep_specs:
            arrs = []
            for is_grid in comps:
                r = dep_refs[idx]
                idx += 1
                arrs.append(r[...] if is_grid else r[0, 0])
            base_env[name] = TupleValue(tag, tuple(arrs))
        tile = (ctx2, x_ref[...], y_ref[...], base_env)
        maskv = m_ref[...] > 0.5
        flat = tuple(r[...] for r in flat_refs)
        i0 = i_ref[0, 0]
        for k in range(K_IN):
            gate = (i0 + k) < max_iters
            flat, maskv = step(flat, maskv & gate, loop_i=i0 + (k + 1),
                               tile=tile)
        out_refs[0][...] = maskv.astype(f32)
        for r, a in zip(out_refs[1:], flat):
            r[...] = a.astype(f32)

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        grid=(Ht // TILE_H, Wt // TILE_W),
        in_specs=[small] * 7 + [grid_spec, grid_spec, grid_spec]
        + [grid_spec] * n_flat
        + [grid_spec if g else small for g in dep_is_grid],
        out_specs=[grid_spec] * (1 + n_flat),
        out_shape=[jax.ShapeDtypeStruct((Ht, Wt), f32)] * (1 + n_flat),
        interpret=interpret,
    )

    def cond_fn(state):
        i, mf, _flat = state
        return jnp.any(mf > 0) & (i < max_iters)

    def body_fn(state):
        i, mf, flat = state
        outs = call(jnp.full((1, 1), i, jnp.int32), t_arr, fr_arr,
                    ro_arr, co_arr, tr_arr, tc_arr,
                    x_arr, y_arr, mf, *flat, *dep_arrays)
        return (i + K_IN, outs[0], tuple(outs[1:]))

    mask_init = mask0.astype(f32)
    if pad:
        # padding pixels start inactive and their carries are edge copies;
        # they are sliced away below
        mask_init = jnp.pad(mask_init, ((0, Ht - H), (0, Wt - W)))
        flat0 = tuple(_pad(a) for a in flat0)
    _, _, flat_out = jax.lax.while_loop(
        cond_fn, body_fn,
        (jnp.int32(0), mask_init, tuple(flat0)),
    )
    if pad:
        flat_out = tuple(a[:H, :W] for a in flat_out)
    return flat_out
