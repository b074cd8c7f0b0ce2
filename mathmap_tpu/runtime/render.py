"""Render engine: jit/pjit entry points.

Reference: `mathmap_common.c` render loop — slice threads over rows, per-pixel
filter calls, supersampling, 8-bit packing (SURVEY.md §2.1 render-engine row,
§3.1 call stack [unverified — mount empty, SURVEY.md §0]).

TPU design (SURVEY §7): one traced program evaluates the whole grid; the
row-slice thread pool is replaced by XLA's on-chip parallelism (and by mesh
sharding for multi-chip — parallel/shard.py). Supersampling evaluates the
filter at an s×s subpixel offset grid and averages — the loop is unrolled at
trace time so XLA fuses all s² evaluations.
"""

from __future__ import annotations

import numpy as np

from ..lang import astnodes as A
from ..utils.errors import MMRuntimeError
from .tracer import Evaluator, RenderContext, coerce_rgba
from .uservals import convert_userval, default_userval
from .value import InputImage, image_value


def coordinate_grids(ctx: RenderContext, dx: float = 0.0, dy: float = 0.0):
    """Centered world-coordinate grids: GLOBAL pixel (row j, col i) center at
    (i + 0.5 - W/2, H/2 - 0.5 - j), y pointing up. (dx, dy) are subpixel
    offsets in pixel units for supersampling. When the grid is sharded
    (ctx.grid_shape set), each device builds only its local tile using its
    row/col offsets — coordinates are identical to the unsharded render.

    In base-block layout (ctx.base_layout) the grids are built directly in
    the Pallas sampler's (nby*nbx, 512) tile layout from block/pixel iotas;
    positions past the real frame clamp to the edge pixel (the same values
    jnp.pad(mode='edge') used to produce), so planning stats and claims
    for the last partial blocks are identical to the (H, W) path."""
    be = ctx.be
    h, w = ctx.shape
    dt = ctx.dtype or be.float32
    if ctx.grid_xy is not None:
        x0, y0 = ctx.grid_xy
        return (x0 + be.asarray(dx, dtype=dt),
                y0 - be.asarray(dy, dtype=dt))
    if ctx.ss_stack > 1 and ctx.base_layout is not None:
        # stacked supersampling: segment k of the block rows holds
        # subsample k's grid with its subpixel offset baked in
        from dataclasses import replace

        assert dx == 0.0 and dy == 0.0
        s = ctx.ss_stack
        nby_t, nbx = ctx.base_layout
        seg_ctx = replace(ctx, base_layout=(nby_t // (s * s), nbx),
                          ss_stack=1, grid_xy=None)
        xs, ys = [], []
        for ddx, ddy in subpixel_offsets(s):
            x0, y0 = coordinate_grids(seg_ctx, ddx, ddy)
            xs.append(x0)
            ys.append(y0)
        return be.concatenate(xs, axis=0), be.concatenate(ys, axis=0)
    if ctx.base_layout is not None:
        import jax

        nby, nbx = ctx.base_layout
        lh = ctx.local_height or ctx.height
        lw = ctx.local_width or ctx.width
        b = jax.lax.broadcasted_iota(be.int32, (h, w), 0)
        p = jax.lax.broadcasted_iota(be.int32, (h, w), 1)
        # clamp inside the LOCAL tile (pad positions duplicate its edge
        # pixel and are cropped at assembly), then shift to the tile's
        # global origin — world coords are always global
        row = (be.minimum((b // nbx) * 8 + p // 64, lh - 1)
               + be.asarray(ctx.tile_row0, dtype=be.int32))
        col = (be.minimum((b % nbx) * 64 + p % 64, lw - 1)
               + be.asarray(ctx.tile_col0, dtype=be.int32))
        x = (col.astype(dt) + be.asarray(0.5 + dx, dtype=dt)
             - be.asarray(ctx.width * 0.5, dtype=dt))
        y = (be.asarray(ctx.height * 0.5, dtype=dt)
             - (row.astype(dt) + be.asarray(0.5 + dy, dtype=dt)))
        return x, y
    xs = (be.arange(w, dtype=dt)
          + be.asarray(ctx.col_offset, dtype=dt)
          + be.asarray(0.5 + dx, dtype=dt)
          - be.asarray(ctx.width * 0.5, dtype=dt))
    ys = (be.asarray(ctx.height * 0.5, dtype=dt)
          - (be.arange(h, dtype=dt)
             + be.asarray(ctx.row_offset, dtype=dt)
             + be.asarray(0.5 + dy, dtype=dt)))
    x = be.broadcast_to(xs[None, :], (h, w))
    y = be.broadcast_to(ys[:, None], (h, w))
    return x, y


def resolve_region(opts, width: int, height: int):
    """Validate opts.region against the canvas -> (x, y, w, h) or None.

    The GIMP-selection semantics (reference `mathmap.c` renders the
    drawable's selection bounds with full-drawable coordinates
    [unverified — mount empty]): only the sub-rectangle is evaluated, but
    x/y/W/H/R and input sampling use the FULL canvas."""
    reg = getattr(opts, "region", None)
    if reg is None:
        return None
    x, y, w, h = reg
    if x + w > width or y + h > height:
        raise ValueError(
            f"region {reg} exceeds the {width}x{height} canvas")
    return reg


def region_ctx_fields(region, base_layout):
    """RenderContext overrides that evaluate only the region's grid.

    Two mechanisms on purpose (mirroring the sharded renderers): the
    base-block-layout path describes the region as a local tile at global
    origin (tile_row0, tile_col0) — the same fields shard_map tiles use —
    while the (H, W) path uses grid_shape + row/col offsets. Either way
    world coordinates stay GLOBAL, so the region render is the full
    render's crop."""
    if region is None:
        return {}
    x, y, w, h = region
    if base_layout is not None:
        return dict(local_height=h, local_width=w, tile_row0=y, tile_col0=x)
    return dict(grid_shape=(h, w), row_offset=y, col_offset=x)


def base_layout_for(width: int, height: int):
    """(nby, nbx) covering the frame with (8, 64) base blocks, padded so
    block columns fill the 256-px planning LCM (matches the sampler's
    internal padding of (H, W) grids)."""
    ht0 = -(-height // 8) * 8
    wt0 = -(-width // 256) * 256
    return ht0 // 8, wt0 // 64


def base_layout_enabled(program_filters: dict, fdef, opts) -> bool:
    """THE single gate for base-block-layout evaluation — shared by the
    unsharded JitRenderer and the mesh-sharded tile renderer so the two
    can never diverge on which layout a filter evaluates in."""
    import os

    from .sampling import pallas_policy

    return (pallas_policy(opts)
            and uses_sampling(program_filters, fdef)
            and os.environ.get("MMTPU_BASE_LAYOUT", "1") != "0")


def uses_sampling(filters: dict, fdef: A.FilterDef) -> bool:
    """Whether `fdef` (or any filter it calls) samples an image or applies
    a gradient/curve LUT — the ops whose kernel I/O the base-block layout
    makes transpose-free."""
    seen = set()

    def walk_def(fd):
        if fd.name in seen:
            return False
        seen.add(fd.name)
        lut_names = {p.name for p in fd.params
                     if p.kind in ("image", "gradient", "curve")}
        # locals aliased (transitively) to an image/LUT param also sample
        # when called: `q = in; q(xy)` (review r5 — the alias silently
        # disabled base layout). Fixpoint over plain name-to-name assigns.
        changed = True
        while changed:
            changed = False
            for sub in A.walk(fd.body):
                if (isinstance(sub, A.Assign)
                        and isinstance(sub.expr, A.Var)
                        and sub.expr.name in lut_names
                        and sub.name not in lut_names):
                    lut_names.add(sub.name)
                    changed = True
        for sub in A.walk(fd.body):
            if isinstance(sub, A.Call):
                if not isinstance(sub.func, A.Var):
                    # applied-closure form (`myfilt(in)(xy)`): the callee
                    # is an expression — conservatively assume it samples
                    return True
                nm = sub.func.name
                if nm in ("origVal", "origValXY", "origValImage"):
                    return True
                if nm in lut_names:
                    return True
                called = filters.get(nm)
                if called is not None and walk_def(called):
                    return True
        return False

    return walk_def(fdef)


def uses_rand(filters: dict, fdef: A.FilterDef) -> bool:
    """Whether `fdef` (or any filter it calls) draws rand(): such filters
    must keep the sequential subsample loop (one counter draw per
    subsample evaluation) instead of the stacked supersampling path."""
    seen = set()

    def walk_def(fd):
        if fd.name in seen:
            return False
        seen.add(fd.name)
        for sub in A.walk(fd.body):
            if isinstance(sub, A.Call) and isinstance(sub.func, A.Var):
                if sub.func.name == "rand":
                    return True
                called = filters.get(sub.func.name)
                if called is not None and walk_def(called):
                    return True
        return False

    return walk_def(fdef)


def unflatten_output(be, rgba_base, nby: int, nbx: int, height: int, width: int):
    """(nby*nbx, 512, 4) base-layout frame -> (H, W, 4): the single layout
    conversion of a base-layout render."""
    arr = rgba_base.reshape(nby, nbx, 8, 64, 4)
    arr = be.transpose(arr, (0, 2, 1, 3, 4)).reshape(nby * 8, nbx * 64, 4)
    return arr[:height, :width]


def subpixel_offsets(s: int):
    """s×s subpixel offset grid within one pixel (s=1 -> center only)."""
    return [((i + 0.5) / s - 0.5, (j + 0.5) / s - 0.5) for j in range(s) for i in range(s)]


def build_env(ctx: RenderContext, fdef: A.FilterDef, uservals: dict):
    """Bind filter params: image params consume ctx.inputs positionally,
    others come from the `uservals` dict (already TupleValues) or defaults."""
    env = {}
    img_idx = 0
    for p in fdef.params:
        if p.kind == "image":
            if img_idx < len(ctx.inputs):
                env[p.name] = image_value(ctx.inputs[img_idx])
                img_idx += 1
            elif p.name in uservals:
                env[p.name] = uservals[p.name]
            else:
                raise MMRuntimeError(
                    f"filter {fdef.name!r}: no input bound for image parameter {p.name!r}",
                    p.span,
                )
        elif p.name in uservals:
            env[p.name] = uservals[p.name]
        else:
            env[p.name] = default_userval(ctx, p)
    return env


def _eval_rgba_once(ctx: RenderContext, fdef: A.FilterDef, uservals: dict,
                    dx: float, dy: float, extra: int = 0):
    """One unclipped (lh+extra, lw+extra, 4) evaluation at subpixel offset
    (dx, dy) on a grid extended by `extra` rows/cols past the frame — the
    building block of the corner-grid AA scheme (pixel (i, j)'s corners
    live on the (H+1, W+1) grid at offset (-0.5, -0.5)). World coordinates
    and the X/Y/W/H/R internals keep the REAL frame geometry; only the
    evaluation grid grows. Returns (rgba_array, sub_ctx) — the caller
    threads sub_ctx.rand_counter so sequential evaluations keep drawing
    distinct rand() streams (mirroring the s×s loop, which mutates one
    shared ctx)."""
    from dataclasses import replace

    be = ctx.be
    if ctx.base_layout is not None:
        lh = (ctx.local_height or ctx.height) + extra
        lw = (ctx.local_width or ctx.width) + extra
        sub = replace(ctx, base_layout=base_layout_for(lw, lh),
                      local_height=lh, local_width=lw,
                      ss_stack=1, grid_xy=None)
    elif ctx.grid_shape is not None:
        gh, gw = ctx.grid_shape
        lh, lw = gh + extra, gw + extra
        sub = replace(ctx, grid_shape=(lh, lw), ss_stack=1, grid_xy=None)
    else:
        lh, lw = ctx.height + extra, ctx.width + extra
        sub = replace(ctx, grid_shape=(lh, lw) if extra else None,
                      ss_stack=1, grid_xy=None)
    x, y = coordinate_grids(sub, dx, dy)
    env = build_env(sub, fdef, uservals)
    ev = Evaluator(sub, x, y, env)
    comps = coerce_rgba(ev, ev.eval(fdef.body), fdef)
    rgba = be.stack(comps, axis=-1)
    if sub.base_layout is not None:
        nby, nbx = sub.base_layout
        rgba = unflatten_output(be, rgba, nby, nbx, lh, lw)
    return rgba, sub


def pack_uint8(be, rgba):
    """Device-side 8-bit packing, bit-identical to imgio.to_uint8 /
    native.f32_to_u8 on the same float values: clip to [0,1], ·255 + 0.5,
    floor. The explicit floor makes the float→int convert exact (an
    integer-valued float converts identically under every rounding mode,
    so TPU/CPU/NumPy all agree)."""
    x = be.clip(rgba, 0.0, 1.0) * be.asarray(255.0, dtype=rgba.dtype)
    return be.floor(x + be.asarray(0.5, dtype=rgba.dtype)).astype(be.uint8)


def float_inputs(be, arrays):
    """Normalize render inputs: uint8 (…,H,W,4) arrays become float32/255
    IN-TRACE (bit-identical to imgio.to_float_rgba's u8 path) so callers
    can ship 4× fewer bytes host→device; float arrays pass through."""
    return [a.astype(be.float32) / be.asarray(255.0, dtype=be.float32)
            if a.dtype == np.uint8 else a for a in arrays]


def sweep_unroll_for(opts, width: int, height: int) -> int:
    """Resolve RenderOptions.sweep_unroll for a (width, height) sweep.

    'auto' = 1 (flat lax.map): the definitive same-window in-process A/B
    of the PRODUCT path (stack-materialized output, prepads computed
    in-jit) has the flat map winning at BOTH measured shapes — ripple
    1080p ×24: 3.32 vs 3.77 ms/frame; t-dependent twirl 4K ×8: 19.76 vs
    21.05 (unroll=1 vs 8, r4). probe_sweep2's +18%-for-unrolling result
    was specific to ITS formulation (per-frame sum fencing with NO
    (F,H,W,4) stack materialization, prepads/grids passed as args) and
    does not transfer to the product path, which must return the actual
    frames. The option + MMTPU_SWEEP_UNROLL stay for experimentation;
    an int forces that chunk factor."""
    u = getattr(opts, "sweep_unroll", "auto")
    if u == "auto":
        return 1
    return max(1, int(u))


def render_frame(ctx: RenderContext, fdef: A.FilterDef, uservals: dict):
    """Render one frame -> (H, W, 4) float32 array in [0,1] (uint8 when
    opts.output_dtype='uint8' — packed here so every renderer (jit,
    oracle, sharded, tiled) shares the same rule)."""
    out = _render_frame_f32(ctx, fdef, uservals)
    if getattr(ctx.opts, "output_dtype", "float32") == "uint8":
        return pack_uint8(ctx.be, out)
    return out


def _render_frame_f32(ctx: RenderContext, fdef: A.FilterDef, uservals: dict):
    be = ctx.be
    s = ctx.opts.supersample
    if s > 1 and getattr(ctx.opts, "supersample_scheme", "grid") == "corners":
        # corner-grid + center AA (SURVEY §2.1's suspected reference
        # scheme [unverified — mount empty]): ONE (H+1, W+1) evaluation at
        # the pixel corners — each interior corner is shared by 4 pixels —
        # plus the centers; average the 5 samples per pixel. ~2.07x a
        # plain render vs the s×s grid's s²x. Equal 1/5 weights
        # [weighting unverified; re-adjudicate at SURVEY §8].
        corner, sub = _eval_rgba_once(ctx, fdef, uservals, -0.5, -0.5, 1)
        ctx.rand_counter = sub.rand_counter
        ctx.rand_loop_nonce = sub.rand_loop_nonce
        center, sub2 = _eval_rgba_once(ctx, fdef, uservals, 0.0, 0.0, 0)
        ctx.rand_counter = sub2.rand_counter
        ctx.rand_loop_nonce = sub2.rand_loop_nonce
        out = (corner[:-1, :-1] + corner[:-1, 1:] + corner[1:, :-1]
               + corner[1:, 1:] + center) * be.asarray(
                   0.2, dtype=center.dtype)
        return be.clip(out, 0.0, 1.0)
    if ctx.ss_stack > 1:
        # stacked supersampling: ONE evaluation (one sampler planning +
        # launch set) covers every subsample — the grids hold all s*s
        # subsample segments; average the segments, then unflatten once.
        # Per-block sampler planning is identical to the sequential loop's
        # (each block keeps its own stats), so outputs match it.
        x, y = coordinate_grids(ctx)
        env = build_env(ctx, fdef, uservals)
        ev = Evaluator(ctx, x, y, env)
        comps = coerce_rgba(ev, ev.eval(fdef.body), fdef)
        s2 = ctx.ss_stack * ctx.ss_stack
        nby_t, nbx = ctx.base_layout
        nby = nby_t // s2
        n_seg = nby * nbx
        comps = [c.reshape(s2, n_seg, c.shape[-1]).mean(axis=0)
                 for c in comps]
        rgba = be.stack(comps, axis=-1)
        rgba = unflatten_output(be, rgba, nby, nbx,
                                ctx.local_height or ctx.height,
                                ctx.local_width or ctx.width)
        return be.clip(rgba, 0.0, 1.0)
    acc = None
    for dx, dy in subpixel_offsets(s):
        x, y = coordinate_grids(ctx, dx, dy)
        env = build_env(ctx, fdef, uservals)
        ev = Evaluator(ctx, x, y, env)
        out = ev.eval(fdef.body)
        comps = coerce_rgba(ev, out, fdef)
        if acc is None:
            acc = list(comps)
        else:
            acc = [a + c for a, c in zip(acc, comps)]
    inv = 1.0 / (s * s)
    comps = [a * inv for a in acc]
    rgba = be.stack(comps, axis=-1)
    if ctx.base_layout is not None:
        nby, nbx = ctx.base_layout
        rgba = unflatten_output(be, rgba, nby, nbx,
                                ctx.local_height or ctx.height,
                                ctx.local_width or ctx.width)
    # clamp to displayable range (the reference clamps when packing 8-bit)
    return be.clip(rgba, 0.0, 1.0)


# ---------------------------------------------------------------------------
# JAX product path: jitted, cached per static configuration
# ---------------------------------------------------------------------------

def _validate_param_names(fdef: A.FilterDef, params: dict) -> None:
    """Reject param NAMES the filter doesn't declare: a typo'd
    `--param raduis=5` would otherwise render with the default and exit 0
    — silently wrong output. Shared by the jit path and the oracle.
    (The reference's userval binding is by declared name too —
    userval.c [unverified, mount empty].)"""
    declared = {p.name for p in fdef.params}
    unknown = [n for n in params if n not in declared]
    if unknown:
        raise ValueError(
            f"unknown param(s) for filter {fdef.name!r}: {unknown} "
            f"(declares: {sorted(declared)})")


def _validate_static_params(fdef: A.FilterDef, static_names) -> None:
    """Reject static_params names the filter doesn't declare, and opaque
    (curve/gradient/image) params that cannot be baked. Shared by the jit
    path and the oracle so both raise identically."""
    if not static_names:
        return
    declared = {p.name: p for p in fdef.params}
    unknown = [n for n in static_names if n not in declared]
    if unknown:
        raise ValueError(
            f"static_params names not declared by filter "
            f"{fdef.name!r}: {unknown} (has: {sorted(declared)})")
    bad = [n for n in static_names
           if declared[n].kind in ("curve", "gradient", "image")]
    if bad:
        raise ValueError(
            f"static_params cannot bake opaque params {bad} "
            f"(curve/gradient/image values stay traced)")


def _userval_pytree(ctx, fdef: A.FilterDef, params: dict):
    """Split user params into (traced pytree of arrays, static remainder).

    Numeric/color/curve/gradient/image values become traced arrays so
    changing them does NOT retrigger compilation — mirroring the reference,
    where uservals are runtime inputs to the compiled .so. Names listed in
    opts.static_params instead BAKE the value into the static spec (the
    reference's cgen.c behavior — recompile per value), which lets a baked
    loop bound statically unroll (tracer.py)."""
    arrays = {}
    kinds = {}
    static_names = getattr(ctx.opts, "static_params", ())
    _validate_static_params(fdef, static_names)
    _validate_param_names(fdef, params)
    for p in fdef.params:
        if p.name not in params:
            continue
        tv = convert_userval(ctx, p, params[p.name])
        if p.name in static_names and not tv.is_opaque:
            vals = ",".join(repr(float(a)) for a in tv.arrays)
            kinds[p.name] = f"static:{tv.tag}:{vals}"
            continue
        if tv.is_opaque:
            payload = tv.payload
            if hasattr(payload, "lut"):
                kinds[p.name] = "lut:" + p.kind
                arrays[p.name] = payload.lut
            else:
                # ':u8' marks a u8-SOURCED image param (pixels here are
                # its /255 floats): the static kind must carry it so the
                # jit-side rebuild re-enables the sampler's exact-u8 path
                # (the pixels array alone can't — it is float either way)
                u8 = getattr(payload, "u8_src", False)
                kinds[p.name] = "image:u8" if u8 else "image"
                arrays[p.name] = payload.pixels
        else:
            kinds[p.name] = "tuple:" + tv.tag
            arrays[p.name] = list(tv.arrays)
    # kinds is returned as a hashable static spec (jit static argument)
    return arrays, tuple(sorted(kinds.items()))


def _rebuild_uservals(be, arrays: dict, kinds: tuple):
    from .value import Curve, Gradient, TupleValue, curve_value, gradient_value

    out = {}
    for name, kind in kinds:
        if kind.startswith("static:"):
            _, tag, vals = kind.split(":", 2)
            comps = tuple(float(v) for v in vals.split(","))
            out[name] = TupleValue(
                tag, tuple(be.asarray(v, dtype=be.float32) for v in comps),
                const=comps)
            continue
        payload = arrays[name]
        if kind.startswith("tuple:"):
            out[name] = TupleValue(kind.split(":", 1)[1], tuple(payload))
        elif kind == "lut:curve":
            out[name] = curve_value(Curve(lut=payload))
        elif kind == "lut:gradient":
            out[name] = gradient_value(Gradient(lut=payload))
        elif kind in ("image", "image:u8"):
            out[name] = image_value(InputImage(
                pixels=payload, name=name, u8_src=kind == "image:u8"))
    return out


def stage_inputs(jnp, arrays):
    """Host arrays -> device, preserving uint8 (the in-trace /255
    conversion means a u8 upload ships 4× fewer bytes AND keeps the
    sampler's exact-u8 path engaged); device arrays pass through untouched
    (np.asarray on them would round-trip host<->device every call). The
    ONE staging rule — shared by JitRenderer._stage and ShardedRenderer
    (a diverged copy in the sharded path once shipped raw 0-255 floats
    into the tiles; review r4 finding)."""
    out = []
    for a in arrays:
        if isinstance(a, jnp.ndarray):
            out.append(a)
            continue
        a = np.asarray(a)
        if a.dtype != np.uint8:
            a = np.asarray(a, dtype=np.float32)
        out.append(jnp.asarray(a))
    return out


def _merge_shared(mask, shared, per_job, shared_pads):
    """Re-interleave SHARED inputs (one array for every job) with this
    job's sliced inputs, in original position order, pairing each shared
    input with its loop-hoisted prepad (per-job inputs pad in-trace)."""
    ins, pads = [], []
    si = bi = 0
    for m in mask:
        if m:
            ins.append(shared[si])
            pads.append(shared_pads[si] if shared_pads else None)
            si += 1
        else:
            ins.append(per_job[bi])
            pads.append(None)
            bi += 1
    return ins, (pads if any(p is not None for p in pads) else None)


class JitRenderer:
    """Compile-once renderer for a (filter, W, H, options) configuration —
    the analog of the reference's compiled-filter cache (cgen.c)."""

    def __init__(self, program_filters: dict, fdef: A.FilterDef, width: int,
                 height: int, opts, num_frames: int = 1):
        import jax
        import jax.numpy as jnp

        self.jnp = jnp
        self.fdef = fdef
        self.filters = program_filters
        self.width, self.height, self.opts = width, height, opts
        self.num_frames = num_frames
        #: id(device input) -> (ref, padded multicopy image): the Pallas
        #: sampler's padded image costs ~3ms per 4K frame to rebuild; the
        #: renderer builds it once per device-resident input (the analog of
        #: the reference's prepared drawable/tile cache)
        self._prepad_cache = {}

        def compute_prepads(input_arrays):
            from ..pallas_kernels import sample_kernel as SK

            pads = []
            for orig, a in zip(input_arrays, float_inputs(jnp, input_arrays)):
                h, w = int(a.shape[-3]), int(a.shape[-2])
                # the kernel's OWN formula (a private copy here would,
                # if either side changed, make the kernel silently reject
                # every cached prepad and repay the pad build per frame)
                hp, wp = SK.padded_dims(h, w)
                # same decision point as sample_image_pallas: u8 inputs
                # get exact integer-bf16 pads when the edges allow it
                dt, exact = SK.image_pad_plan(
                    opts, orig.dtype == np.uint8, opts.edge_x, opts.edge_y)

                def pad_one(fr, dt=dt, exact=exact):
                    return SK._pad_xmajor(
                        jnp, fr, opts.edge_x, opts.edge_y, opts.edge_color,
                        hp, wp, dtype=dt, exact_u8=exact)

                if a.ndim == 4:  # animated input: one prepad per frame
                    # budget guard: a prepad is ~4.3x the frame bytes (4
                    # row-shifted copies + aprons); a long 4K animation
                    # would pin GBs of HBM — past ~512 MB, pad in-trace
                    # per frame instead (costs ~3 ms per sampled frame)
                    t_frames = int(a.shape[0])
                    pad_bytes = (wp * (hp * SK.N_COPIES * 4)
                                 * jnp.dtype(dt).itemsize)
                    if t_frames * pad_bytes > 512 * (1 << 20):
                        pads.append(None)
                    else:
                        pads.append(jnp.stack(
                            [pad_one(a[i]) for i in range(t_frames)]))
                else:
                    pads.append(pad_one(a))
            return pads

        self._pad_jit = jax.jit(compute_prepads)

        # Base-block layout (see RenderContext.base_layout): static per
        # configuration — sampling/LUT filters evaluate in the Pallas
        # sampler's native tile layout so its I/O needs no transposes.
        import os

        # region renders (GIMP-selection semantics): the evaluated grid —
        # and therefore the base-block layout — covers only the region;
        # width/height (and input prepads) stay full-canvas
        region = resolve_region(opts, width, height)
        rw, rh = (region[2], region[3]) if region else (width, height)
        base_layout = (base_layout_for(rw, rh)
                       if base_layout_enabled(program_filters, fdef, opts)
                       else None)
        ss = 1
        if (base_layout is not None and opts.supersample > 1
                and opts.supersample_scheme == "grid"
                and not uses_rand(program_filters, fdef)
                and os.environ.get("MMTPU_SS_STACK", "0") == "1"):
            # stacked supersampling (see RenderContext.ss_stack) — OFF by
            # default: measured SLOWER than the sequential subsample loop
            # (ripple 1080p 4xAA batched: 11.8 vs 8.3 ms/frame — XLA
            # overlaps the loop's independent subsample pipelines better
            # than one serialized big-launch chain). Kept behind the env
            # knob for re-evaluation when the dispatch picture changes.
            ss = opts.supersample
            nby0, nbx0 = base_layout
            base_layout = (ss * ss * nby0, nbx0)

        def run(input_arrays, userval_arrays, kinds, t, frame, prepads=None,
                grids=None):
            inputs = []
            for i, a in enumerate(float_inputs(jnp, input_arrays)):
                pre = prepads[i] if prepads else None
                inputs.append(InputImage(
                    pixels=a, name=f"in{i}", prepad=pre,
                    u8_src=input_arrays[i].dtype == np.uint8))
            ctx = RenderContext(
                be=jnp, width=width, height=height, opts=opts,
                inputs=inputs,
                filters=program_filters, t=t, frame=frame,
                num_frames=num_frames, is_jax=True,
                base_layout=base_layout, grid_xy=grids, ss_stack=ss,
                **region_ctx_fields(region, base_layout),
            )
            uservals = _rebuild_uservals(jnp, userval_arrays, kinds)
            return render_frame(ctx, fdef, uservals)

        self._jitted = jax.jit(run, static_argnums=(2,))
        self._base_layout = base_layout
        self._grids = None

        def compute_grids():
            # undisplaced base-layout coordinate grids: constant per
            # configuration, ~1 ms/4K-frame to rebuild — computed once on
            # device and passed to every frame as plain args
            ctx0 = RenderContext(
                be=jnp, width=width, height=height, opts=opts,
                inputs=[], filters=program_filters, is_jax=True,
                base_layout=base_layout, ss_stack=ss,
                **region_ctx_fields(region, base_layout),
            )
            return coordinate_grids(ctx0)

        self._grids_jit = jax.jit(compute_grids)

        def _unrolled_map(one, xs):
            """lax.map with the body UNROLLED in chunks of the sweep
            unroll factor (RenderOptions.sweep_unroll).

            lax.map serializes its iterations; Python-unrolling lets XLA's
            scheduler overlap across frames (measured on the real chip,
            interleaved same-window, t-DEPENDENT twirl 4K ×8 so no two
            frames share a subcomputation: unrolled-8 18.54 ms/frame vs
            flat lax.map 22.61 vs pipelined per-frame dispatches 21.09 —
            benchmarks/probe_sweep2.py; the earlier probe_sweep.py
            unroll8 number was CSE-inflated, its honest rows agree).
            Sweeps not divisible by the chunk pad by REPEATING the last
            element (≤7 wasted frame renders, dropped from the result);
            short sweeps unroll whole with no scan. MMTPU_SWEEP_UNROLL
            overrides at trace time; sweep_unroll=1 is the flat map."""
            import os

            import jax.tree_util as jtu

            env = os.environ.get("MMTPU_SWEEP_UNROLL")
            if env is not None:
                u = max(1, int(env))
            else:
                u = sweep_unroll_for(opts, width, height)
            n = int(jtu.tree_leaves(xs)[0].shape[0])
            if u <= 1:
                return jax.lax.map(one, xs)

            def at(tree, i):
                return jtu.tree_map(lambda a: a[i], tree)

            if n <= u:
                return jnp.stack([one(at(xs, i)) for i in range(n)])
            pad = (-n) % u
            if pad:
                xs = jtu.tree_map(
                    lambda a: jnp.concatenate(
                        [a, jnp.repeat(a[-1:], pad, axis=0)]), xs)
            xs_c = jtu.tree_map(
                lambda a: a.reshape((n + pad) // u, u, *a.shape[1:]), xs)

            def chunk(args_c):
                return jnp.stack([one(at(args_c, i)) for i in range(u)])

            res = jax.lax.map(chunk, xs_c)
            res = res.reshape(n + pad, *res.shape[2:])
            return res[:n] if pad else res

        def run_frames(input_arrays, userval_arrays, kinds, ts, frame0):
            # whole t-sweep in ONE device program: a chunk-unrolled map
            # over frames keeps each frame's fused program and amortizes
            # dispatch + transfer (the reference renders frames in a host
            # loop; SURVEY §7 chose an in-program frame loop for the TPU
            # path). frame0 offsets the `frame` internal when the sweep is
            # chunked (api.render_animation). The padded sampler images
            # are built BEFORE the frame loop so no frame repays the build.
            frames = jnp.arange(ts.shape[0], dtype=jnp.float32) + frame0
            prepads = compute_prepads(input_arrays) if self._prepads_on() else None
            grids = compute_grids() if base_layout is not None else None

            def one(args):
                frame, t = args
                return run(input_arrays, userval_arrays, kinds, t, frame,
                           prepads, grids)

            return _unrolled_map(one, (frames, ts))

        self._jitted_frames = jax.jit(run_frames, static_argnums=(2,))

        def run_jobs(shared_ins, batched_ins, userval_arrays, kinds, mask,
                     ts, frames):
            # N independent jobs (each its own input image(s) + t) in ONE
            # device program: the relay's ~10-50 ms dispatch floor swallows
            # small frames dispatched one-by-one (BASELINE config 1: a 512²
            # frame is 0.26 Mpix — VERDICT r2 weak #2), so the batch path
            # amortizes it over N frames exactly like render_all_frames
            # does for t-sweeps. Batched inputs carry a leading job axis;
            # the chunk-unrolled map slices per job (no per-job retrace).
            # `mask` (static) marks SHARED inputs — one image every job
            # samples (the param-animation workload): those pad ONCE here,
            # before the job loop, instead of repaying the ~3 ms/4K pad
            # build inside every map iteration.
            prepads_sh = (compute_prepads(shared_ins)
                          if shared_ins and self._prepads_on() else None)
            grids = compute_grids() if base_layout is not None else None

            def one(args):
                frame, t, ins_i = args
                ins, pads = _merge_shared(mask, shared_ins, ins_i,
                                          prepads_sh)
                return run(ins, userval_arrays, kinds, t, frame,
                           pads, grids)

            return _unrolled_map(
                one, (frames, ts, [a for a in batched_ins]))

        self._jitted_jobs = jax.jit(run_jobs, static_argnums=(3, 4))

        def run_jobs_pp(shared_ins, batched_ins, batched_uv, kinds, mask,
                        ts, frames):
            # per-job PARAMS variant: every userval leaf carries a leading
            # N axis and rides the same unrolled map (the serving layer
            # batches same-filter requests whose param VALUES differ — the
            # kinds spec must still match, so one trace covers the batch)
            prepads_sh = (compute_prepads(shared_ins)
                          if shared_ins and self._prepads_on() else None)
            grids = compute_grids() if base_layout is not None else None

            def one(args):
                frame, t, uv_i, ins_i = args
                ins, pads = _merge_shared(mask, shared_ins, ins_i,
                                          prepads_sh)
                return run(ins, uv_i, kinds, t, frame, pads, grids)

            return _unrolled_map(
                one, (frames, ts, batched_uv, [a for a in batched_ins]))

        self._jitted_jobs_pp = jax.jit(run_jobs_pp, static_argnums=(3, 4))

    def _stage(self, arrays):
        return stage_inputs(self.jnp, arrays)

    def _prepads_on(self) -> bool:
        from .sampling import pallas_policy

        return pallas_policy(self.opts)

    def _prepads(self, originals, ins):
        """Padded images for device-resident inputs, cached by identity.
        Only inputs the CALLER passed as device arrays are cached — a host
        array converts to a fresh device array every call, so caching the
        conversion's id would miss every time while pinning ~400MB per 4K
        entry in HBM; those pad inside the trace as before (None entry)."""
        jnp = self.jnp
        if not self._prepads_on():
            return None
        out = []
        any_pad = False
        for orig, a in zip(originals, ins):
            if orig is not a or not isinstance(a, jnp.ndarray):
                out.append(None)
                continue
            ent = self._prepad_cache.get(id(a))
            if ent is None or ent[0] is not a:
                if len(self._prepad_cache) >= 4:
                    # evict the oldest single entry (insertion-ordered
                    # dict), not the whole cache — wholesale clearing
                    # thrashed working sets of 5+ alternating inputs
                    # (review r5)
                    self._prepad_cache.pop(next(iter(self._prepad_cache)))
                ent = (a, self._pad_jit([a])[0])
                self._prepad_cache[id(a)] = ent
            out.append(ent[1])
            # an over-budget animated prepad is a None ENTRY (pad-in-trace
            # fallback): it must not force a [None] return, whose pytree
            # treedef differs from plain None and retraces the program
            # (review r5 — ~1-3 min spurious remote compile)
            any_pad = any_pad or ent[1] is not None
        return out if any_pad else None

    def __call__(self, input_arrays, params: dict, t: float = 0.0, frame: float = 0.0):
        jnp = self.jnp
        ctx = RenderContext(
            be=jnp, width=self.width, height=self.height, opts=self.opts,
            inputs=[], filters=self.filters, is_jax=True,
        )
        arrays, kinds = _userval_pytree(ctx, self.fdef, params)
        ins = self._stage(input_arrays)
        if self._base_layout is not None and self._grids is None:
            self._grids = self._grids_jit()
        return self._jitted(ins, arrays, kinds, jnp.float32(t),
                            jnp.float32(frame),
                            self._prepads(input_arrays, ins),
                            self._grids)

    def render_batch(self, batched_inputs, params: dict, ts, frames=None,
                     shared_mask=None):
        """Render N independent jobs in one device call -> (N, H, W, 4).

        Each element of `batched_inputs` is an (N, H, W, 4) stack; job i
        renders inputs [a[i] for a in batched_inputs] at t=ts[i]. `params`
        is either ONE dict shared across the batch, or a LIST of N dicts —
        per-job values for the same param names (each value set rides the
        lax.map as a stacked traced pytree; the static kinds spec must
        match across jobs, so static_params values may not vary). This is
        the product path's answer to the dispatch floor on small frames (a
        fenced 512² render pays ~10-50 ms of relay round-trip for ~0.5 ms
        of device work).

        `shared_mask[i]` marks input i as SHARED: ONE (H, W, 4) image (or
        (T, H, W, 4) animated stack) with no job axis that every job
        samples — the param-animation workload. Shared inputs build their
        padded sampler image once, before the job loop, instead of
        repaying the ~3 ms/4K pad build per job (api.shared wraps this)."""
        jnp = self.jnp
        ctx = RenderContext(
            be=jnp, width=self.width, height=self.height, opts=self.opts,
            inputs=[], filters=self.filters, is_jax=True,
        )
        ins = self._stage(batched_inputs)
        # `is None` (not truthiness): an empty sequence must still hit the
        # length check, and a numpy bool array would raise on bool()
        mask = ((False,) * len(ins) if shared_mask is None
                else tuple(bool(m) for m in shared_mask))
        if len(mask) != len(ins):
            raise ValueError(
                f"render_batch: shared_mask length {len(mask)} != "
                f"{len(ins)} inputs")
        shared = [a for a, m in zip(ins, mask) if m]
        per_job = [a for a, m in zip(ins, mask) if not m]
        ts = jnp.asarray(ts, dtype=jnp.float32)
        n_jobs = int(ts.shape[0])
        if frames is None:
            frames = jnp.arange(ts.shape[0], dtype=jnp.float32)
        else:
            frames = jnp.asarray(frames, dtype=jnp.float32)
            if int(frames.shape[0]) != n_jobs:
                raise ValueError(
                    f"render_batch: {int(frames.shape[0])} frames for a "
                    f"batch of {n_jobs} jobs (ts)")
        # per-job batched inputs must carry one leading entry per job —
        # caught here as a readable error instead of an opaque lax.map
        # leading-axis trace failure (review r5)
        for i, a in enumerate(per_job):
            lead = getattr(a, "shape", (n_jobs,))[0]
            if int(lead) != n_jobs:
                raise ValueError(
                    f"render_batch: per-job input {i} has leading dim "
                    f"{int(lead)} for a batch of {n_jobs} jobs (mark it "
                    f"mm.shared(...) if it is one image for every job)")
        if isinstance(params, (list, tuple)):
            import jax

            if len(params) != int(ts.shape[0]):
                raise ValueError(
                    f"render_batch: {len(params)} param dicts for a batch "
                    f"of {int(ts.shape[0])} jobs")
            per = [_userval_pytree(ctx, self.fdef, p) for p in params]
            kinds = per[0][1]
            if any(k != kinds for _, k in per[1:]):
                raise ValueError(
                    "render_batch: per-job params must declare the same "
                    "names and kinds in every job (and identical values "
                    "for any static_params — baked values key the "
                    "compiled program)")
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[a for a, _ in per]) if per[0][0] else {}
            return self._jitted_jobs_pp(shared, per_job, stacked, kinds,
                                        mask, ts, frames)
        arrays, kinds = _userval_pytree(ctx, self.fdef, params)
        return self._jitted_jobs(shared, per_job, arrays, kinds, mask,
                                 ts, frames)

    def render_all_frames(self, input_arrays, params: dict, ts, frame0: float = 0.0):
        """Render every frame of a t-sweep in one device call -> (F,H,W,4)."""
        jnp = self.jnp
        ctx = RenderContext(
            be=jnp, width=self.width, height=self.height, opts=self.opts,
            inputs=[], filters=self.filters, is_jax=True,
        )
        arrays, kinds = _userval_pytree(ctx, self.fdef, params)
        ins = self._stage(input_arrays)
        return self._jitted_frames(
            ins, arrays, kinds, jnp.asarray(ts, dtype=jnp.float32), jnp.float32(frame0)
        )


def render_oracle(program_filters: dict, fdef: A.FilterDef, input_arrays, params: dict,
                  width: int, height: int, opts, t: float = 0.0, frame: float = 0.0,
                  num_frames: int = 1, precision: str = "f32"):
    """NumPy oracle render — the semantic spec (reference IR interpreter
    analog, SURVEY §2.3 item 2). Eager, slow, used by tests and
    `--interpret`. precision='f64' runs the whole evaluation in float64
    (the reference computes in C doubles — SURVEY §7 hard part 2)."""
    dt = np.float64 if precision == "f64" else np.float32

    def conv(a):
        # u8 inputs normalize exactly like the jit path's in-trace /255
        # (float_inputs) and imgio.to_float_rgba's u8 branch
        a = np.asarray(a)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / np.float32(255.0)
        return np.asarray(a, dtype=dt)

    ctx = RenderContext(
        be=np, width=width, height=height, opts=opts,
        inputs=[InputImage(pixels=conv(a), name=f"in{i}")
                for i, a in enumerate(input_arrays)],
        filters=program_filters, t=dt(t), frame=dt(frame),
        num_frames=num_frames, is_jax=False, dtype=dt,
        **region_ctx_fields(resolve_region(opts, width, height), None),
    )
    _validate_static_params(fdef, getattr(opts, "static_params", ()))
    _validate_param_names(fdef, params)
    uservals = {}
    for p in fdef.params:
        if p.name in params:
            uservals[p.name] = convert_userval(ctx, p, params[p.name])
    return render_frame(ctx, fdef, uservals)
