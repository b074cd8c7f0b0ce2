"""Fused Pallas sampling kernel — origVal gathers as MXU contractions.

Why: XLA's TPU gather runs at ~6ns/element (scalar-unit bound), making
bilinear warps ~250x slower than roofline (measured: 1.4s per 4K frame).
Mosaic has no vectorized in-VMEM gather either (probed: "Only 2D gather is
supported" / compiler crashes). The TPU-idiomatic replacement (SURVEY.md
§2.3 item 3) expresses interpolation itself as dense contractions that ride
the MXU:

    tmp[(r,c), p] = sum_s win[s, (r,c)] * OX[s, p]      (MXU matmul)
    out[c, p]     = sum_r OY[r, p] * tmp[(r,c), p]      (VPU mul-reduce)

OX (win_w, TW) carries each output pixel's x-tap weights (one-hot rows
scaled by the interpolation weights — nearest: 1 tap, bilinear: 2, bicubic:
4 Catmull-Rom); OY the y-tap weights. The padded image is stored x-major as
(Wp, Hp*4) so the window slice (win_w, win_h*4) feeds the matmul directly:
M = win_h*4 = 128, N = TW, K = win_w — a full-utilization MXU shape, all 4
channels in one matmul, and the result lands in the orientation the y-stage
needs (pixels in lanes). Cost is O(window area) FLOPs per pixel instead of
O(taps) scalar gathers — a large win on this hardware.

Pipeline (all inside one jit):
  1. XLA: map world -> source coords, apply the edge behavior as a float
     coordinate map (wrap: mod; reflect: mirror; color: clamp into the pad
     apron), and build a PADDED x-major image whose apron encodes the edge
     behavior — the kernel then needs no edge logic.
  2. XLA: per output tile (8 rows x TW cols), compute the source bounding
     box -> aligned window origins (ox mult-of-8 sublanes, oy mult-of-32 so
     oy*4 is lane-aligned) + a scalar overflow flag.
  3. Pallas (PrefetchScalarGridSpec): per tile, async-DMA the window
     HBM->VMEM once, then 8 sub-row passes of weight-matmul + mul-reduce.
  4. lax.cond on the overflow flag falls back to the XLA gather path for
     the whole frame (window too small for this warp) — results stay
     correct for arbitrary displacement.
"""

from __future__ import annotations

#: default window (rows, cols): rows mult of 32, cols mult of 8
DEFAULT_WIN = (64, 640)
TILE_H = 8
TILE_W = 256
PAD_L = 8  # left/top apron


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# XLA-side: edge mapping + padded x-major image
# ---------------------------------------------------------------------------

def _edge_map_coord(jnp, p, n: int, behavior: str):
    """Map a float source coordinate onto [-3, n+2] so that all interp taps
    fall inside the padded apron. The apron CONTENT (built by _pad_xmajor)
    encodes the behavior, so taps need no further logic."""
    if behavior == "wrap":
        return jnp.mod(p, float(n))
    if behavior == "reflect":
        m = jnp.mod(p, float(2 * n))
        return jnp.where(m < n, m, 2.0 * n - 1.0 - m)
    return jnp.clip(p, -3.0, float(n) + 2.0)


def _apron(jnp, img, axis: int, n: int, behavior: str, edge_color, pad_l: int, pad_r: int):
    """Extend `img` along `axis` by pad_l before and pad_r after with
    behavior-encoded content ((H,W,4) channel-last layout)."""
    def take(sl):
        idx = [slice(None)] * img.ndim
        idx[axis] = sl
        return img[tuple(idx)]

    if behavior == "wrap":
        left = take(slice(n - pad_l, None))
        right = jnp.concatenate([img, img], axis=axis)
        right = jnp.take(right, jnp.arange(pad_r), axis=axis)
    elif behavior == "reflect":
        left = jnp.flip(take(slice(0, pad_l)), axis=axis)
        right = jnp.concatenate([jnp.flip(img, axis=axis), img], axis=axis)
        right = jnp.take(right, jnp.arange(pad_r), axis=axis)
    else:
        col = jnp.asarray(edge_color, dtype=img.dtype).reshape((1,) * (img.ndim - 1) + (4,))
        shape_l = list(img.shape)
        shape_l[axis] = pad_l
        shape_r = list(img.shape)
        shape_r[axis] = pad_r
        left = jnp.broadcast_to(col, shape_l)
        right = jnp.broadcast_to(col, shape_r)
    return jnp.concatenate([left, img, right], axis=axis)


def _pad_xmajor(jnp, pixels, edge_x: str, edge_y: str, edge_color, hp: int, wp: int):
    """(H, W, 4) -> x-major (Wp, Hp*4) with behavior-encoded aprons.
    Layout: out[s, r*4 + c] = padded[r, s, c]."""
    h, w, _ = pixels.shape
    img = _apron(jnp, pixels, 1, w, edge_x, edge_color, PAD_L, wp - w - PAD_L)
    img = _apron(jnp, img, 0, h, edge_y, edge_color, PAD_L, hp - h - PAD_L)
    return jnp.transpose(img, (1, 0, 2)).reshape(wp, hp * 4)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _tap_range(interpolation: str):
    """(lo, n_taps) relative to floor(p)."""
    if interpolation == "nearest":
        return 0, 1
    if interpolation == "bilinear":
        return 0, 2
    return -1, 4  # bicubic


def _weights(jnp, frac, interpolation: str):
    if interpolation == "nearest":
        return [jnp.ones_like(frac)]
    if interpolation == "bilinear":
        return [1.0 - frac, frac]
    f = frac
    f2 = f * f
    f3 = f2 * f
    return [
        -0.5 * f3 + f2 - 0.5 * f,
        1.5 * f3 - 2.5 * f2 + 1.0,
        -1.5 * f3 + 2.0 * f2 + 0.5 * f,
        0.5 * f3 - 0.5 * f2,
    ]


def _make_kernel(interpolation: str, win_h: int, win_w: int, tile_w: int,
                 precision: str = "bf16", tile_h: int = TILE_H):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tap_lo, n_taps = _tap_range(interpolation)
    dn = (((0,), (0,)), ((), ()))  # contract sublane dim of both operands
    # bf16 matmul is native on the MXU (~17x the emulated-f32 rate on v5e,
    # measured) and loses only ~1 LSB of 8-bit color precision. In f32 mode
    # the MXU still runs bf16 passes unless HIGHEST precision is requested.
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    mm_prec = None if precision == "bf16" else jax.lax.Precision.HIGHEST

    def kernel(oy_ref, ox_ref, px_ref, py_ref, img_ref, o_ref, win2, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        ni = pl.num_programs(0)
        k = i * nj + j
        slot = k % 2

        def window_dma(ti, tj, s):
            """The (reconstructible) HBM->VMEM copy of tile (ti,tj)'s window
            into slot s. Mosaic must PROVE lane-start divisibility by 128:
            assert it on the product (oy mult-of-32 => oy*4 mult-of-128)."""
            oyv = pl.multiple_of(oy_ref[ti, tj], 32)
            oxv = pl.multiple_of(ox_ref[ti, tj], 8)
            oy4 = pl.multiple_of(oyv * 4, 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(oxv, win_w), pl.ds(oy4, win_h * 4)],
                win2.at[s], sems.at[s],
            )

        # double-buffer: tile k's window was started at tile k-1; here we
        # kick off tile k+1's DMA, then wait on our own (grid is sequential
        # on the single TensorCore, so the prefetch overlaps this tile's
        # weight-build + matmul work)
        @pl.when(k == 0)
        def _():
            window_dma(i, j, 0).start()

        @pl.when(k + 1 < ni * nj)
        def _():
            nk = k + 1
            window_dma(nk // nj, nk - (nk // nj) * nj, (k + 1) % 2).start()

        oy = oy_ref[i, j]
        ox = ox_ref[i, j]

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (win_w, tile_w), 0)
        # interleaved-row index helper for the (win_h*4, TW) stage-B weights:
        # row (r*4 + c) holds window row r, channel c
        iota_h4 = jax.lax.broadcasted_iota(jnp.int32, (win_h * 4, tile_w), 0)
        r_of_row = iota_h4 // 4
        # constant channel selector (4, win_h*4): sel[c, row] = (row % 4 == c)
        # — turns the per-channel masked reductions into one tiny MXU matmul
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (4, win_h * 4), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (4, win_h * 4), 0)
        sel = ((rows_i - (rows_i // 4) * 4) == cidx).astype(mm_dtype)
        dn_sel = (((1,), (0,)), ((), ()))
        window_dma(i, j, slot).wait()
        win = win2[slot]

        for rr in range(tile_h):
            px = px_ref[rr : rr + 1, :]  # (1, TW)
            py = py_ref[rr : rr + 1, :]
            if interpolation == "nearest":
                x0 = jnp.floor(px + 0.5)
                y0 = jnp.floor(py + 0.5)
                fx = jnp.zeros_like(px)
                fy = jnp.zeros_like(py)
            else:
                x0 = jnp.floor(px)
                y0 = jnp.floor(py)
                fx = px - x0
                fy = py - y0
            lx = x0.astype(jnp.int32) - ox
            ly = y0.astype(jnp.int32) - oy
            # clamp so an overflowing tile still reads in-window memory
            # (result discarded via the overflow fallback)
            lx = jnp.clip(lx, -tap_lo, win_w - n_taps - tap_lo)
            ly = jnp.clip(ly, -tap_lo, win_h - n_taps - tap_lo)

            if interpolation == "bilinear":
                # triangle kernel: weight(d) = relu(1 - |d|) hits both taps
                # in one expression — ~2x fewer VPU ops than per-tap selects
                px_loc = lx.astype(jnp.float32) + fx
                py_loc = ly.astype(jnp.float32) + fy
                ox_mat = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc)
                )
                oy_mat4 = jnp.maximum(
                    0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc)
                )
            else:
                wx = _weights(jnp, fx, interpolation)
                wy = _weights(jnp, fy, interpolation)
                ox_mat = jnp.zeros((win_w, tile_w), jnp.float32)
                for tap in range(n_taps):
                    ox_mat = ox_mat + jnp.where(iota_w == lx + (tap_lo + tap), wx[tap], 0.0)
                # y weights expanded over interleaved rows (win_h*4, TW)
                oy_mat4 = jnp.zeros((win_h * 4, tile_w), jnp.float32)
                for tap in range(n_taps):
                    oy_mat4 = oy_mat4 + jnp.where(r_of_row == ly + (tap_lo + tap), wy[tap], 0.0)

            # MXU: (win_w, win_h*4) x (win_w, TW) -> (win_h*4, TW)
            tmp = jax.lax.dot_general(
                win.astype(mm_dtype), ox_mat.astype(mm_dtype),
                dimension_numbers=dn, precision=mm_prec,
                preferred_element_type=jnp.float32,
            )
            prod = tmp * oy_mat4
            # stage B: (4, win_h*4) @ (win_h*4, TW) channel-select-and-reduce
            out4 = jax.lax.dot_general(
                sel, prod.astype(mm_dtype), dimension_numbers=dn_sel,
                precision=mm_prec, preferred_element_type=jnp.float32,
            )
            o_ref[:, rr : rr + 1, :] = out4.reshape(4, 1, tile_w)

    return kernel


def warp_sample_pallas(img_xm, pxp, pyp, oy, ox, *, interpolation: str,
                       win_h: int, win_w: int, tile_w: int,
                       precision: str = "bf16", interpret: bool = False,
                       tile_h: int = TILE_H):
    """img_xm (Wp, Hp*4) padded x-major; pxp/pyp (Ht, Wt) padded-space coords
    (Ht mult of tile_h, Wt mult of tile_w); oy/ox (Ht//tile_h, Wt//tile_w)
    aligned window origins. Returns (4, Ht, Wt) planar samples."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ht, wt = pxp.shape
    nty, ntx = ht // tile_h, wt // tile_w
    kernel = _make_kernel(interpolation, win_h, win_w, tile_w, precision, tile_h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM, manual DMA
        ],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j, *_: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, win_w, win_h * 4), img_xm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops_tile = 2 * win_w * (win_h * 4) * tile_w * tile_h
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, ht, wt), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * nty * ntx,
            bytes_accessed=(win_w * win_h * 16) * nty * ntx + 16 * ht * wt,
            transcendentals=0,
        ),
    )(oy, ox, pxp, pyp, img_xm)


# ---------------------------------------------------------------------------
# Public entry: planning + fallback
# ---------------------------------------------------------------------------

def sample_image_pallas(ev, img, x, y, xla_fallback):
    """Sample InputImage `img` at world coords (x, y) via the Pallas kernel.

    Returns [r, g, b, a] channel arrays. `xla_fallback()` is traced into a
    lax.cond branch used when any tile's source bbox exceeds the window."""
    import jax
    import jax.numpy as jnp

    from ..runtime import sampling as S

    opts = ev.ctx.opts
    interpolation = opts.interpolation
    win_h, win_w = getattr(opts, "pallas_window", DEFAULT_WIN)
    tile_w = TILE_W

    h_img, w_img = img.global_shape
    h_out, w_out = x.shape

    # padded image dims: hp mult of 32 (so oy*4 lane-aligns), wp mult of 8
    hp = _round_up(h_img + PAD_L + 8, 32)
    wp = _round_up(w_img + PAD_L + 8, 8)
    win_h = min(win_h, hp)
    win_w = min(win_w, wp)

    # ---- coords + edge mapping (XLA, fused) ----
    px, py = S.world_to_pixel(jnp, x, y, w_img, h_img)
    px = _edge_map_coord(jnp, px, w_img, opts.edge_x)
    py = _edge_map_coord(jnp, py, h_img, opts.edge_y)
    pxp = px + float(PAD_L)
    pyp = py + float(PAD_L)

    # ---- padded x-major image (cached per invocation) ----
    cache = getattr(ev.ctx, "_pallas_pad_cache", None)
    if cache is None:
        cache = {}
        ev.ctx._pallas_pad_cache = cache
    # The entry holds a reference to the source array so its id() cannot be
    # reused by a different array while the entry lives (ADVICE r1 low).
    key = (id(img.pixels), opts.edge_x, opts.edge_y, hp, wp)
    entry = cache.get(key)
    if entry is None or entry[0] is not img.pixels:
        entry = (
            img.pixels,
            _pad_xmajor(jnp, img.pixels, opts.edge_x, opts.edge_y,
                        opts.edge_color, hp, wp),
        )
        cache[key] = entry
    img_xm = entry[1]

    interpret = jax.default_backend() != "tpu"
    precision = getattr(opts, "pallas_precision", "bf16")
    tap_lo, n_taps = _tap_range(interpolation)

    def plan(tile_h, tile_w_c, win_h_c, win_w_c):
        """Tile-pad the coord grids and compute aligned window origins plus
        the overflow flag for one (tile, window) configuration."""
        win_h_c = min(win_h_c, hp)
        win_w_c = min(win_w_c, wp)
        ht = _round_up(h_out, tile_h)
        wt = _round_up(w_out, tile_w_c)
        if (ht, wt) != (h_out, w_out):
            pxp_t = jnp.pad(pxp, ((0, ht - h_out), (0, wt - w_out)), mode="edge")
            pyp_t = jnp.pad(pyp, ((0, ht - h_out), (0, wt - w_out)), mode="edge")
        else:
            pxp_t, pyp_t = pxp, pyp
        if interpolation == "nearest":
            x0 = jnp.floor(pxp_t + 0.5).astype(jnp.int32)
            y0 = jnp.floor(pyp_t + 0.5).astype(jnp.int32)
        else:
            x0 = jnp.floor(pxp_t).astype(jnp.int32)
            y0 = jnp.floor(pyp_t).astype(jnp.int32)
        xt = x0.reshape(ht // tile_h, tile_h, wt // tile_w_c, tile_w_c)
        yt = y0.reshape(ht // tile_h, tile_h, wt // tile_w_c, tile_w_c)
        min_x = xt.min(axis=(1, 3)) + tap_lo
        max_x = xt.max(axis=(1, 3)) + tap_lo + n_taps - 1
        min_y = yt.min(axis=(1, 3)) + tap_lo
        max_y = yt.max(axis=(1, 3)) + tap_lo + n_taps - 1
        ox = jnp.clip((min_x // 8) * 8, 0, wp - win_w_c)
        oy = jnp.clip((min_y // 32) * 32, 0, hp - win_h_c)
        overflow = jnp.any(max_x - ox > win_w_c - 1) | jnp.any(max_y - oy > win_h_c - 1)

        def run(_):
            planar = warp_sample_pallas(
                img_xm, pxp_t, pyp_t, oy, ox,
                interpolation=interpolation, win_h=win_h_c, win_w=win_w_c,
                tile_w=tile_w_c, tile_h=tile_h, precision=precision,
                interpret=interpret,
            )
            return tuple(planar[c, :h_out, :w_out] for c in range(4))

        return overflow, run

    # config chain: translational-fast -> rotational (squarer tiles, bigger
    # windows) -> whole-frame XLA gather; lax.cond picks per frame. The f32
    # (HIGHEST-precision) mode skips the rotational config: its 3-pass
    # matmul scratch exceeds the 16MB VMEM with the big window, and the
    # gather fallback is exact anyway.
    ov1, run1 = plan(TILE_H, tile_w, win_h, win_w)

    def slow_path(_):
        return tuple(xla_fallback())

    if precision == "f32":
        return list(jax.lax.cond(ov1, slow_path, run1, operand=None))

    rot_h, rot_w = getattr(opts, "pallas_window_rot", (320, 328))
    ov2, run2 = plan(8, 128, rot_h, rot_w)

    def second(_):
        return jax.lax.cond(ov2, slow_path, run2, operand=None)

    return list(jax.lax.cond(ov1, second, run1, operand=None))
