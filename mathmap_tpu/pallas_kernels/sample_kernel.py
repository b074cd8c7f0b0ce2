"""Fused Pallas sampling kernel — origVal gathers as MXU contractions.

Why: XLA's TPU gather runs at ~6ns/element (scalar-unit bound), making
bilinear warps ~250x slower than roofline (measured: 1.4s per 4K frame).
Mosaic has no vectorized in-VMEM gather either (probed: "Only 2D gather is
supported" / compiler crashes). The TPU-idiomatic replacement (SURVEY.md
§2.3 item 3) expresses interpolation itself as dense contractions that ride
the MXU:

    tmp[(r,c), p] = sum_s win[s, (r,c)] * OX[s, p]      (MXU matmul)
    out[c, p]     = sum_r OY[r, p] * tmp[(r,c), p]      (VPU mul + MXU reduce)

OX (win_w, N) carries each output pixel's x-tap weights (one-hot rows
scaled by the interpolation weights — nearest: 1 tap, bilinear: 2, bicubic:
4 Catmull-Rom); OY the y-tap weights. The padded image is stored x-major as
(Wp, Hp*4) so the window slice (win_w, win_h*4) feeds the matmul directly:
M = win_h*4, K = win_w, N = ALL pixels of an (8, tile_w) output tile in one
contraction (N = 2048) — full-utilization MXU shapes, all 4 channels in one
matmul, and the result lands in the orientation the y-stage needs (pixels
in lanes). Cost is O(window area) FLOPs per pixel instead of O(taps) scalar
gathers — a large win on this hardware.

Window-origin alignment: a DMA'd lane slice must start at a multiple of 128
lanes => window row origin oy multiple of 32, which would waste up to 31
rows of every window. The image is therefore stored as FOUR row-shifted
copies concatenated along lanes — copy c starts at row 8c — so origins only
need 8-row alignment: the kernel picks copy (oy/8 % 4) and a 128-aligned
lane offset within it. This is what lets the fast tier run a 32-row window.

Pipeline (all inside one jit):
  1. XLA: map world -> source coords, apply the edge behavior as a float
     coordinate map (wrap: mod; reflect: mirror; color: clamp into the pad
     apron), and build the padded multi-copy x-major image whose apron
     encodes the edge behavior — the kernel then needs no edge logic. In
     bf16 precision mode the copy is stored bf16 (half the DMA bytes; the
     MXU contracts in bf16 anyway).
  2. XLA: per output tile, compute the source bounding box -> aligned
     window origins (ox mult-of-16, oy mult-of-8) + a scalar overflow flag.
  3. Pallas (PrefetchScalarGridSpec): per tile, async-DMA the window
     HBM->VMEM once (double-buffered across grid steps), then one batched
     weight-matmul + mul-reduce over the whole tile.
  4. lax.cond chain on the overflow flags: fast small window -> main
     window -> rotational window (squarer tiles) -> XLA gather for the
     whole frame — results stay correct for arbitrary displacement.
"""

from __future__ import annotations

TILE_H = 8
TILE_W = 256
BW = 64  # base-block width: every tier's tile is gw consecutive (8, 64)
#        # base blocks, so all tiers share ONE flattened coord layout
BASE_PIX = TILE_H * BW  # pixels per base block (the kernel's chunk size)
PAD_L = 8  # left/top apron
N_COPIES = 4  # row-shifted image copies (8-row origin granularity)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def padded_dims(h_img: int, w_img: int) -> tuple:
    """(hp, wp) of the padded multi-copy image: hp mult of 32 (the
    multi-copy lane base c*hp*4 stays 128-aligned), wp mult of 16 (bf16
    sublane tiling). ONE formula shared by the kernel and the renderer's
    prepad builder (runtime/render.py) — a mismatch would make the kernel
    silently reject every cached prepad and repay the ~3 ms/4K pad build
    per frame."""
    return (_round_up(h_img + PAD_L + 8, 32), _round_up(w_img + PAD_L + 8, 16))


#: SMEM budget for one launch's scalar-prefetch operands. The hardware
#: bank is 1 MiB per core; keep 1/8 headroom for the kernel's own
#: scalars. Every prefetched array pads its MINOR dim to 128 lanes, so
#: footprints are computed on padded shapes.
_SMEM_PREFETCH_BUDGET = 896 * 1024


def _smem_table_bytes(n_tiles: int, n_rows: int) -> int:
    """SMEM bytes for `n_rows` scalar-prefetch rows of `n_tiles` i32
    entries each (SMEM pads every array's MINOR dim to 128 elements)."""
    return n_rows * _round_up(max(n_tiles, 1), 128) * 4


def _tier_smem_rows(gw: int, win_h: int, win_w: int, subw: int,
                    hp: int, wp: int):
    """(extra_rows, whole): scalar-prefetch rows BEYOND oy/ox for one tier
    launch (the coff rows: gw per-chunk offsets, or 8 packed sub-chunk
    offsets), mirroring plan()'s subw-drop rules, plus whether the tier's
    window covers the whole padded image (unconditional launch)."""
    win_h = min(win_h, hp)
    win_w = min(win_w, wp)
    whole = win_h >= hp and win_w >= wp
    subchunk = gw == 1 and subw
    if subw and (win_w <= subw or (subchunk and win_h <= subw) or whole):
        subw = 0
    rows = (8 if subchunk else gw) if subw else 0
    return rows, whole


def _filter_tiers(tiers, nby: int, nbx: int, hp: int, wp: int, itm: int,
                  per_tile: bool = False):
    """Static per-frame tier eligibility. Drops tiers whose double-buffered
    source window would not fit VMEM (~12 MB of the 16 MB arena), and —
    on the chain path — tiers whose scalar-prefetch set would not fit the
    1 MiB SMEM bank at this block-grid size (every launch scalar is sized
    by the FRAME's tile count, so big frames can overflow SMEM at COMPILE
    time no matter which tiles claim the tier: at 8K output the sub-chunk
    tier's (8, n_tiles) coff alone is ~2 MB — "Allocation would exceed
    memory, space=smem, tag='prefetched SMEM operand'", observed live).

    With `per_tile` (the indirect claimed-tile path), over-budget tiers
    are KEPT: run_idx splits them into SMEM-capped positional launches,
    so 8K keeps its spiral-class rung and 16K+ keeps the whole ladder.
    Whole-window tiers still launch non-indirect and keep the drop."""
    kept = []
    for th, tw, wh, ww, sw in tiers:
        if 2 * min(ww, wp) * min(wh, hp) * 4 * itm > 12 * (1 << 20):
            continue  # double-buffered window would not fit VMEM
        gw = tw // BW
        rows, whole = _tier_smem_rows(gw, wh, ww, sw or 0, hp, wp)
        n_tiles = nby * (nbx // gw)
        if whole or not per_tile:
            # chain launches dereference full (1, n_tiles) tables: oy+ox
            # (+coff rows); whole-window launches are always non-indirect
            need = _smem_table_bytes(n_tiles, 2 if whole else 2 + rows)
            if need > _SMEM_PREFETCH_BUDGET:
                continue
        kept.append((th, tw, wh, ww, sw or None))
    return kept


def _dtype_for(precision: str):
    import jax.numpy as jnp

    return jnp.bfloat16 if precision == "bf16" else jnp.float32


def image_dtype(opts):
    """In-kernel image storage dtype for `opts` (shared for the same
    reason as padded_dims). ONE precision read: the kernel derives its
    matmul mode and this dtype from the same string via _dtype_for."""
    return _dtype_for(getattr(opts, "pallas_precision", "bf16"))


def exact_u8_eligible(opts, u8_src: bool, edge_x: str, edge_y: str) -> bool:
    """Can this image use the EXACT-u8 kernel path? u8 values 0-255 are
    exactly representable in bf16 (8-bit mantissa), so a u8-sourced padded
    image stored as INTEGER-valued bf16 (instead of lossy bf16(v/255))
    makes the window operand exact: the f32 split-float's third
    contraction (lo(win)@hi(w)) is identically zero and is skipped
    statically, and the pad stores bf16 instead of f32 (half the window
    DMA). The kernel scales its output by 1/255 — one f32 VPU multiply,
    fewer roundings than today's u8->f32/255->bf16 chain, so the bf16-mode
    envelope TIGHTENS too. Only the 'color' edge behavior can inject
    non-u8 apron content: eligible only when its (static) edge_color sits
    exactly on the u8 grid (c*255 integral), else the pad falls back to
    the plain float path. (Reference workload note: the upstream GIMP
    plugin samples 8-bit drawables — u8-sourced inputs ARE its input
    semantics [unverified — mount empty].)"""
    if not u8_src:
        return False
    for behavior in (edge_x, edge_y):
        if behavior not in ("wrap", "reflect", "clamp"):
            color = getattr(opts, "edge_color", (0.0, 0.0, 0.0, 0.0))
            # on the u8 grid AND inside it: integers >255 stop being
            # exact in bf16 (8-bit mantissa — e.g. 511 rounds to 512, a
            # 1-LSB apron error for an out-of-gamut edge color)
            if any(abs(float(c) * 255.0 - round(float(c) * 255.0)) > 1e-9
                   or not 0.0 <= float(c) <= 1.0
                   for c in color):
                return False
    return True


def image_pad_plan(opts, u8_src: bool, edge_x: str, edge_y: str):
    """(storage dtype, exact_u8 flag) for one image's padded copy — the
    single decision point shared by the renderer's prepad builder and
    sample_image_pallas (a mismatch would silently reject every cached
    prepad and repay the ~3 ms/4K pad build per frame)."""
    import jax.numpy as jnp

    exact = exact_u8_eligible(opts, u8_src, edge_x, edge_y)
    if exact:
        return jnp.bfloat16, True
    return image_dtype(opts), False


class _Plan:
    """Per-tier planning result (window origins, per-tile fit, launchers)."""

    __slots__ = ("tile_w", "win_h", "win_w", "gw", "ntx",
                 "overflow", "fit", "run", "run_tiles", "run_idx",
                 "run_smem_ok")


# ---------------------------------------------------------------------------
# XLA-side: edge mapping + padded multi-copy x-major image
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


def _edge_pad_indices(n: int, behavior: str, lo: int, hi: int):
    """Source-row indices (host ints) for positions [lo, hi) outside
    [0, n) under wrap/reflect/clamp — valid for ANY n >= 1 (slice-based
    pads crashed when n < pad width; review r3 finding). "clamp"
    replicates the boundary row — the apron content for SHARDED axes of
    a tiled/halo render, where out-of-block taps must clamp into the
    block (TiledInput.make_gather's clip semantics), not wrap/mirror."""
    import numpy as _np

    pos = _np.arange(lo, hi)
    if behavior == "wrap":
        return _np.mod(pos, n)
    if behavior == "clamp":
        return _np.clip(pos, 0, n - 1)
    m = _np.mod(pos, 2 * n)
    return _np.where(m < n, m, 2 * n - 1 - m)


def _apron(jnp, img, axis: int, n: int, behavior: str, edge_color, pad_l: int, pad_r: int):
    """Extend `img` along `axis` by pad_l before and pad_r after with
    behavior-encoded content ((H,W,4) channel-last layout)."""
    if behavior in ("wrap", "reflect", "clamp"):
        left = jnp.take(img, _edge_pad_indices(n, behavior, -pad_l, 0), axis=axis)
        right = jnp.take(img, _edge_pad_indices(n, behavior, n, n + pad_r), axis=axis)
    else:
        col = jnp.asarray(edge_color, dtype=img.dtype).reshape((1,) * (img.ndim - 1) + (4,))
        shape_l = list(img.shape)
        shape_l[axis] = pad_l
        shape_r = list(img.shape)
        shape_r[axis] = pad_r
        left = jnp.broadcast_to(col, shape_l)
        right = jnp.broadcast_to(col, shape_r)
    return jnp.concatenate([left, img, right], axis=axis)


def _pad_xmajor(jnp, pixels, edge_x: str, edge_y: str, edge_color,
                hp: int, wp: int, dtype=None, exact_u8: bool = False):
    """(H, W, 4) -> x-major multi-copy (Wp, N_COPIES*Hp*4) with behavior-
    encoded aprons. Copy c holds padded rows [8c, 8c+Hp); within copy c:
    out[s, c*Hp*4 + r*4 + ch] = padded[8c + r, s, ch].

    exact_u8: store INTEGER pixel values 0-255 (exact in bf16 — see
    exact_u8_eligible); `pixels` are still the /255 floats every caller
    holds — round(v*255) recovers the u8 value exactly (|v*255 - u| <
    3e-5 for all 256 values after the two f32 roundings). The kernel
    divides its output by 255 (exact_src=True)."""
    h, w, _ = pixels.shape
    if exact_u8:
        pixels = jnp.round(pixels * jnp.asarray(255.0, dtype=pixels.dtype))
        edge_color = tuple(round(float(c) * 255.0) for c in edge_color)
    img = _apron(jnp, pixels, 1, w, edge_x, edge_color, PAD_L, wp - w - PAD_L)
    # 8*(N_COPIES-1) junk tail rows: copy c's tail is never addressed (the
    # planner clips oy to hp - win_h, all within copy c's real rows)
    img = _apron(jnp, img, 0, h, edge_y, edge_color, PAD_L,
                 hp + 8 * (N_COPIES - 1) - h - PAD_L)
    if dtype is not None:
        img = img.astype(dtype)
    xm = jnp.transpose(img, (1, 0, 2)).reshape(wp, (hp + 8 * (N_COPIES - 1)) * 4)
    return jnp.concatenate(
        [xm[:, 32 * c : 32 * c + hp * 4] for c in range(N_COPIES)], axis=1
    )


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
    # the oracle's coefficients are THE spec — one implementation only
    from ..runtime.sampling import _catmull_rom_weights

    return list(_catmull_rom_weights(jnp, frac))


#: pixels per sub-chunk piece in sub-chunk tiers: (8, 16) strips of a base
#: block (4 strips per block; see body_subchunk for the strip layout)
SUBCHUNK_PIX = 128


def _make_kernel(interpolation: str, win_h: int, win_w: int, gw: int,
                 hp: int, precision: str = "bf16",
                 indirect: bool = False,
                 subw: int | None = None, has_carry: bool = False,
                 subchunk: bool = False, positional: bool = False,
                 exact_src: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tap_lo, n_taps = _tap_range(interpolation)
    dn = (((0,), (0,)), ((), ()))  # contract sublane dim of both operands
    # bf16 matmul is native on the MXU (~17x the emulated-f32 rate on v5e,
    # measured) and loses only ~1 LSB of 8-bit color precision. 'f32' mode
    # uses split-float (bf16x3) contractions: a = hi(a) + lo(a) in bf16,
    # a@b ~= hi@hi + hi@lo + lo@hi — ~16-bit mantissa accuracy (measured
    # <=7e-5 vs the exact gather path on the TPU, <=2e-5 in interpret
    # mode; <=1e-4 target) at 3x the bf16 cost instead of the
    # 17x of MXU-emulated f32 (VERDICT r1 item 5).
    # A tile = `gw` base (8, 64) blocks; the weight build + contraction run
    # once per 512-pixel base chunk against the tile's shared window.
    # With `subw`, each chunk contracts only a (subw, win_h*4) sublane slice
    # of the window at a per-chunk 8-aligned offset (scalar-prefetched):
    # FLOPs and weight-build ops scale with subw instead of win_w, so wide
    # multi-chunk tiles (fast tier: win_w=512) pay only for the ~chunk-wide
    # span they actually touch. Mosaic supports the dynamic sublane slice
    # (probed: rel err 4e-3 bf16).
    # Sub-chunk mode (gw==1 tiles, extreme differential warps — the spiral
    # class whose per-(8,64)-block source span exceeds any window): the
    # tile's TALL window is DMA'd once, and each (8, 16)-px STRIP of the
    # block contracts only a square (subw, subw) 2-D slice of it at
    # per-strip (x mult-8 sublane, y mult-32 row) offsets — compute scales
    # with the sub-window area while the window covers the whole arc. The
    # (8, 16) strip minimizes the projected source span of a 128-px piece
    # under isotropic differential warps (vs 557 px for a (2, 64) row pair
    # at spiral_warp's 8.7 px/px 4K edge slope). A strip's lanes are NOT
    # contiguous in the row-major block (lane%64//16 == s), so each strip
    # runs as a masked contraction over all 512 lanes — 4x the matmul N of
    # a contiguous slice, but no relayout anywhere (ADVICE r2 high: the
    # earlier contiguous-slice kernel processed (2, 64) row pairs against
    # (8, 16)-strip planning stats and silently clamped taps). Mosaic 2-D
    # dynamic slicing probed OK (rel err 3.8e-3 bf16).
    assert not (subchunk and (gw != 1 or not subw))
    chunk = BASE_PIX
    n_chunks = gw
    kw = subw or win_w  # contraction width per chunk
    mm_dtype = jnp.bfloat16

    def _dot(dnum, a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dnum, preferred_element_type=jnp.float32
        )

    def mm(dnum, a, b, split_a=True):
        """a @ b with `dnum`; f32 operands. In bf16 mode: one bf16 pass.
        In f32 mode: split-float passes (a may be exact-in-bf16 already,
        e.g. the 0/1 channel selector — pass split_a=False)."""
        ahi = a.astype(jnp.bfloat16)
        bhi = b.astype(jnp.bfloat16)
        out = _dot(dnum, ahi, bhi)
        if precision == "bf16":
            return out
        blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + _dot(dnum, ahi, blo)
        if split_a:
            alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            out = out + _dot(dnum, alo, bhi)
        return out

    dn_sel = (((1,), (0,)), ((), ()))

    def chan_reduce(prod, rows):
        """out[c, p] = sum_{r: r%4==c} prod[r, p] — the channel-class
        reduce of the y-weighted stage-A result. For short row counts the
        (4, rows) one-hot sel matmul is optimal, but its MXU tile-ops
        scale with K=rows while M=4 occupies a full 128-row pass — on the
        rotation-class shape (rows=512) it cost 3.1 ms of the 15.8 ms
        tier (benchmarks/probe_selred.py, measured on TPU; the fast shape
        rows=128 measured the OPPOSITE — VPU variants lose there). So for
        rows > 128: halve with static sublane-aligned slices (channel
        classes survive any multiple-of-4 split; offsets stay multiples
        of 8 for clean f32 tiling) down to <=128 rows, then run the tiny
        sel matmul on the residue. Rot-shape kernel 15.8 -> 14.2 ms; the
        halving adds are exact f32, so this also TIGHTENS the bf16-mode
        envelope (sel cast its operand to bf16 over the full row count)."""
        h = rows
        acc = prod
        while h > 128 and h % 2 == 0 and (h // 2) % 8 == 0:
            half = h // 2
            acc = acc[0:half, :] + acc[half:h, :]
            h = half
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (4, h), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (4, h), 0)
        sel = ((rows_i - (rows_i // 4) * 4) == cidx).astype(mm_dtype)
        return mm(dn_sel, sel, acc, split_a=False)

    def kernel(*refs):
        rest = list(refs)
        idx_ref = rest.pop(0) if indirect else None
        oy_ref = rest.pop(0)
        ox_ref = rest.pop(0)
        coff_ref = rest.pop(0) if subw else None
        if has_carry:
            # aliased to o_ref's buffer — never read; present only so the
            # launch can accumulate into an existing frame in place
            px_ref, py_ref, img_ref, _carry_ref, o_ref, win2, sems = rest
        else:
            px_ref, py_ref, img_ref, o_ref, win2, sems = rest
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        ni = pl.num_programs(0)
        k = i * nj + j
        slot = k % 2

        def scalars_at(ti, tj):
            """Window origin of grid step (ti, tj). Indirect (compacted)
            launches dereference the scalar-prefetched tile index so step j
            reads logical tile idx[j]'s origins — except POSITIONAL
            launches (SMEM-capped slices: run_idx pre-gathered the scalar
            tables by idx on the XLA side so only a cap-sized slice is
            prefetched), which read position j directly. All scalar arrays
            are (1, n_tiles) — tiles in the SMEM minor (lane) dim, because
            SMEM pads the minor dim to 128 elements (a (nty, ntx) layout
            costs nty*512 bytes per array and overflows the 1 MB SMEM
            budget at 8K output sizes)."""
            if indirect:
                lt = tj if positional else idx_ref[tj]
                return oy_ref[0, lt], ox_ref[0, lt]
            return oy_ref[0, ti * nj + tj], ox_ref[0, ti * nj + tj]

        def window_dma(ti, tj, s):
            """The (reconstructible) HBM->VMEM copy of tile (ti,tj)'s window
            into slot s. Mosaic must PROVE lane-start divisibility by 128:
            copy c = (oy/8) % 4 starts at lane c*hp*4 (hp mult of 32) and
            the in-copy offset (oy - 8c)*4 is 128*floor(oy/32)."""
            oyr, oxr = scalars_at(ti, tj)
            oyv = pl.multiple_of(oyr, 8)
            oxv = pl.multiple_of(oxr, 16)
            m = oyv // 8
            cc = m % N_COPIES
            lane = pl.multiple_of(cc * (hp * 4) + (m // N_COPIES) * 128, 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(oxv, win_w), pl.ds(lane, win_h * 4)],
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

        def compute():
            oy, ox = scalars_at(i, j)
            if subchunk:
                window_dma(i, j, slot).wait()
                body_subchunk(oy, ox)
                return

            iota_w = jax.lax.broadcasted_iota(jnp.int32, (kw, chunk), 0)
            # interleaved-row index helper for the (win_h*4, chunk) y
            # weights: row (r*4 + c) holds window row r, channel c
            iota_h4 = jax.lax.broadcasted_iota(jnp.int32, (win_h * 4, chunk), 0)
            r_of_row = iota_h4 // 4
            window_dma(i, j, slot).wait()
            win = None if subw else win2[slot]
            body(oy, ox, iota_w, r_of_row, win)

        def body(oy, ox, iota_w, r_of_row, win):
            for cn in range(n_chunks):
                if subw:
                    # per-chunk 8-aligned x-sub-window: contract only the
                    # (subw, win_h*4) sublane slice this chunk touches.
                    # coff is (gw, n_tiles) — tiles minor — because SMEM
                    # pads the minor dim to 128 lanes (a (n_tiles, gw)
                    # layout would cost n_tiles*512 bytes and blow the
                    # 1 MB SMEM budget on 4K grids).
                    lt = ((j if positional else idx_ref[j])
                          if indirect else i * nj + j)
                    off = pl.multiple_of(coff_ref[cn, lt], 8)
                    win = win2[slot, pl.ds(off, kw), :]
                    ox_eff = ox + off
                else:
                    ox_eff = ox
                px = px_ref[cn, 0:1, :]  # (1, chunk) base block cn
                py = py_ref[cn, 0:1, :]
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
                lx = x0.astype(jnp.int32) - ox_eff
                ly = y0.astype(jnp.int32) - oy
                # clamp so an overflowing tile still reads in-window memory
                # (result discarded via the overflow fallback)
                lx = jnp.clip(lx, -tap_lo, kw - n_taps - tap_lo)
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
                    ox_mat = jnp.zeros((kw, chunk), jnp.float32)
                    for tap in range(n_taps):
                        ox_mat = ox_mat + jnp.where(iota_w == lx + (tap_lo + tap), wx[tap], 0.0)
                    # y weights expanded over interleaved rows (win_h*4, chunk)
                    oy_mat4 = jnp.zeros((win_h * 4, chunk), jnp.float32)
                    for tap in range(n_taps):
                        oy_mat4 = oy_mat4 + jnp.where(r_of_row == ly + (tap_lo + tap), wy[tap], 0.0)

                # MXU: (win_w, win_h*4) x (win_w, chunk) -> (win_h*4, chunk)
                # exact_src: win holds exact-in-bf16 integers (0-255) —
                # lo(win) is identically zero, so the split-float's third
                # pass is skipped and the /255 lands on the output below
                tmp = mm(dn, win, ox_mat, split_a=not exact_src)
                prod = tmp * oy_mat4
                # stage B: channel-class reduce (tree + tiny sel matmul on
                # tall shapes; plain sel matmul on the fast class)
                out4 = chan_reduce(prod, win_h * 4)
                if exact_src:
                    out4 = out4 * jnp.float32(1.0 / 255.0)
                o_ref[cn, :, :] = out4

        def body_subchunk(oy, ox):
            sub = subw
            n = chunk  # all 512 lanes of the (8, 64) base block at once
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (sub, n), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            # (8, 16)-strip id of each lane in the row-major block layout
            # (flat = r*64 + s*16 + c): strips' lanes interleave, so each
            # strip is a MASKED contraction over the whole block rather
            # than a contiguous slice (see the mode comment above)
            strip_of = (lane - (lane // 64) * 64) // 16
            iota_h4 = jax.lax.broadcasted_iota(jnp.int32, (sub * 4, n), 0)
            r_of_row = iota_h4 // 4
            lt = (j if positional else idx_ref[j]) if indirect \
                else i * nj + j
            px = px_ref[0, 0:1, :]
            py = py_ref[0, 0:1, :]
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
            out4 = jnp.zeros((4, n), jnp.float32)
            for s in range(4):
                # packed per-strip offsets: rows 0..3 = x sublane offsets
                # (mult 8), rows 4..7 = y ROW offsets (mult 32 — their *4
                # lane offsets are 128-aligned)
                sx = pl.multiple_of(coff_ref[s, lt], 8)
                syr = pl.multiple_of(coff_ref[4 + s, lt], 32)
                sy4 = pl.multiple_of(syr * 4, 128)
                wsub = win2[slot, pl.ds(sx, sub), pl.ds(sy4, sub * 4)]
                lx = jnp.clip(x0.astype(jnp.int32) - (ox + sx),
                              -tap_lo, sub - n_taps - tap_lo)
                ly = jnp.clip(y0.astype(jnp.int32) - (oy + syr),
                              -tap_lo, sub - n_taps - tap_lo)
                # zero this strip's x-weights on every other strip's lanes:
                # their tmp columns vanish, so the accumulated out4 gets
                # exactly one contribution per lane. Claimed blocks have
                # finite coords everywhere (NaN/huge stats fail the fit),
                # so masked lanes cannot inject NaNs.
                mask = (strip_of == s).astype(jnp.float32)
                if interpolation == "bilinear":
                    px_loc = lx.astype(jnp.float32) + fx
                    py_loc = ly.astype(jnp.float32) + fy
                    ox_mat = mask * jnp.maximum(
                        0.0, 1.0 - jnp.abs(iota_w.astype(jnp.float32) - px_loc))
                    oy_mat4 = jnp.maximum(
                        0.0, 1.0 - jnp.abs(r_of_row.astype(jnp.float32) - py_loc))
                else:
                    wx = _weights(jnp, fx, interpolation)
                    wy = _weights(jnp, fy, interpolation)
                    ox_mat = jnp.zeros((sub, n), jnp.float32)
                    oy_mat4 = jnp.zeros((sub * 4, n), jnp.float32)
                    for tap in range(n_taps):
                        ox_mat = ox_mat + jnp.where(
                            iota_w == lx + (tap_lo + tap), wx[tap], 0.0)
                        oy_mat4 = oy_mat4 + jnp.where(
                            r_of_row == ly + (tap_lo + tap), wy[tap], 0.0)
                    ox_mat = ox_mat * mask
                tmp = mm(dn, wsub, ox_mat, split_a=not exact_src)
                prod = tmp * oy_mat4
                out4 = out4 + chan_reduce(prod, sub * 4)
            if exact_src:
                out4 = out4 * jnp.float32(1.0 / 255.0)
            o_ref[0, :, :] = out4

        compute()

    return kernel


def _call_kernel_tiles(img_xm, px_b, py_b, oy, ox, *, interpolation,
                       win_h, win_w, gw, hp, precision, interpret,
                       grid, grid_bound=None, tile_idx=None,
                       subw=None, coff=None, carry=None, subchunk=False,
                       positional=False, exact_src=False):
    """Low-level launch over base-layout coordinates px_b/py_b
    (n_base, 1, BASE_PIX): every tier's tile is `gw` CONSECUTIVE base
    blocks, so one shared flatten serves all tiers and a tile's block is
    (gw, 1, BASE_PIX) at block index = tile index. oy/ox are (1, n_tiles)
    per-tile window-origin scalars.

    Compacted launches pass BOTH grid_bound and tile_idx (require
    grid[0]==1): the second grid dim becomes DYNAMIC (only `grid_bound`
    steps execute — no skipped-step tax) and step j operates on logical
    tile tile_idx[j] via scalar-prefetched index maps, so the px/py blocks
    are block-DMA'd directly from their home positions and outputs land in
    place — no XLA gather/scatter of pixel data (which would run at the
    ~6ns/element scalar-gather rate this kernel exists to avoid).
    Returns (n_base, 4, BASE_PIX) in base layout; unvisited/skipped blocks
    are garbage."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nty, ntx = grid
    n_base = px_b.shape[0]
    indirect = tile_idx is not None
    assert grid_bound is None or nty == 1  # index maps below ignore ntx then
    assert (subw is None) == (coff is None)
    assert not positional or indirect  # positional = pre-gathered slices
    # scalar arrays are (1, n_tiles) / (gw, n_tiles) — tiles in the SMEM
    # minor dim (SMEM pads the minor dim to 128 elements, so shaping these
    # (nty, ntx) would cost nty*512 B per array and overflow the 1 MB SMEM
    # budget at 8K output sizes)
    assert oy.shape == ox.shape == (1, nty * ntx)
    kernel = _make_kernel(interpolation, win_h, win_w, gw, hp, precision,
                          indirect=indirect, subw=subw,
                          has_carry=carry is not None, subchunk=subchunk,
                          positional=positional, exact_src=exact_src)
    sub = (coff,) if subw else ()
    if indirect:
        scalars = (tile_idx, oy, ox) + sub

        def blk(i, j, idx_ref, *_):
            return (idx_ref[j], 0, 0)
    else:
        scalars = (oy, ox) + sub

        def blk(i, j, *_):
            return (i * ntx + j, 0, 0)
    in_specs = [
        pl.BlockSpec((gw, 1, BASE_PIX), blk),
        pl.BlockSpec((gw, 1, BASE_PIX), blk),
        pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
    ]
    inputs = [px_b, py_b, img_xm]
    aliases = {}
    if carry is not None:
        # accumulate in place: the carry buffer IS the output buffer
        # (donated via input_output_aliases), so a compacted launch writes
        # only its claimed blocks and every other block keeps the carry's
        # contents — no per-tier full-frame buffers, no priority select.
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(carry)
        aliases = {len(scalars) + 3: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(nty, ntx if grid_bound is None else grid_bound),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gw, 4, BASE_PIX), blk),
        scratch_shapes=[
            pltpu.VMEM((2, win_w, win_h * 4), img_xm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if subchunk:
        # 4 masked strip contractions, each over the block's full 512 lanes
        flops_tile = 4 * 2 * subw * (subw * 4) * BASE_PIX
    else:
        flops_tile = 2 * (subw or win_w) * (win_h * 4) * gw * BASE_PIX
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_base, 4, BASE_PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * nty * ntx,
            bytes_accessed=(win_w * win_h * 4 * img_xm.dtype.itemsize) * nty * ntx
            + 16 * n_base * BASE_PIX,
            transcendentals=0,
        ),
    )(*scalars, *inputs)


def _flatten_base(a, nby, nbx):
    # (ht0, wt0) -> (nby*nbx, 1, BASE_PIX): one base (8, 64) block per row
    return (a.reshape(nby, TILE_H, nbx, BW)
             .transpose(0, 2, 1, 3)
             .reshape(nby * nbx, 1, BASE_PIX))


def _unflatten_base(out, nby, nbx):
    # (nby*nbx, 4, BASE_PIX) -> (4, ht0, wt0)
    return (out.reshape(nby, nbx, 4, TILE_H, BW)
               .transpose(2, 0, 3, 1, 4)
               .reshape(4, nby * TILE_H, nbx * BW))


# ---------------------------------------------------------------------------
# Public entry: planning + fallback
# ---------------------------------------------------------------------------

def sample_image_pallas(ev, img, x, y, xla_fallback, *, interpolation=None,
                        edge_x=None, edge_y=None, xla_subset=None,
                        pixel_coords=None):
    """Sample InputImage `img` at world coords (x, y) via the Pallas kernel.

    Returns [r, g, b, a] channel arrays. `xla_fallback()` is traced into a
    lax.cond branch used when the frame can't be tiled onto the kernel;
    `xla_subset(xs, ys)` (optional) samples arbitrary world-coord arrays
    exactly — the per-tile path uses it to PATCH the few blocks that fit
    no tier window (singular warps: polar inversion class) instead of
    sending the whole frame to the gather path.
    interpolation/edge_x/edge_y default to the invocation options; callers
    with fixed semantics (gradient/curve LUTs) override them.

    `pixel_coords=(px, py)`: PRE-MAPPED float pixel coordinates into
    img.pixels' index space — world_to_pixel and the edge coordinate map
    are skipped (the caller applied its own global-edge + local transform;
    the tiled/halo path does, runtime/sampling._sample_pallas_tiled).
    edge_x/edge_y then only select the PREPAD APRON content."""
    import jax
    import jax.numpy as jnp

    from ..runtime import sampling as S

    opts = ev.ctx.opts
    interpolation = interpolation or opts.interpolation
    edge_x = edge_x or opts.edge_x
    edge_y = edge_y or opts.edge_y
    from ..runtime.options import RenderOptions

    # single source of truth for the default ladder: RenderOptions
    tiers = getattr(opts, "pallas_tiers", None)
    if tiers is None:
        tiers = RenderOptions.pallas_tiers

    h_img, w_img = img.global_shape
    # base-layout renders (RenderContext.base_layout) hand us coords
    # ALREADY in the kernel's (n_base, BASE_PIX) tile layout — no flatten
    # on the way in, no unflatten/crop on the way out
    bl = getattr(ev.ctx, "base_layout", None)
    base_mode = bl is not None and getattr(x, "shape", None) == ev.ctx.shape
    if base_mode:
        # local tile dims under a mesh-sharded base-layout render
        # (parallel/shard.py); the full frame otherwise
        h_out = ev.ctx.local_height or ev.ctx.height
        w_out = ev.ctx.local_width or ev.ctx.width
    else:
        h_out, w_out = x.shape

    hp, wp = padded_dims(h_img, w_img)

    # ---- coords + edge mapping (XLA, fused) ----
    if pixel_coords is not None:
        px, py = pixel_coords
    else:
        px, py = S.world_to_pixel(jnp, x, y, w_img, h_img)
        px = _edge_map_coord(jnp, px, w_img, edge_x)
        py = _edge_map_coord(jnp, py, h_img, edge_y)
    pxp = px + float(PAD_L)
    pyp = py + float(PAD_L)

    interpret = jax.default_backend() != "tpu"
    precision = getattr(opts, "pallas_precision", "bf16")
    # exact-u8 path: u8-sourced images store INTEGER bf16 pads (exact) —
    # the kernel scales by 1/255 and, in f32 mode, skips the third
    # split-float pass AND halves the window DMA (see exact_u8_eligible)
    img_dtype, exact_src = image_pad_plan(
        opts, getattr(img, "u8_src", False), edge_x, edge_y)

    # ---- padded multi-copy x-major image ----
    # Renderer-precomputed pad (runtime/render.py caches it across frames
    # for device-resident inputs — the pad build costs ~3ms per 4K frame):
    # Accept a renderer prepad only when THIS call uses the invocation's
    # edge behaviors — the apron content bakes them in, and this function
    # supports per-call overrides (apply_lut_pallas), whose callers must
    # not silently sample another behavior's apron (review r3 finding).
    prepad = getattr(img, "prepad", None)
    if prepad is not None and tuple(prepad.shape) == (wp, N_COPIES * hp * 4) \
            and prepad.dtype == img_dtype \
            and (edge_x, edge_y) == (opts.edge_x, opts.edge_y):
        img_xm = prepad
    else:
        prepad = None
    cache = getattr(ev.ctx, "_pallas_pad_cache", None)
    if cache is None:
        cache = {}
        ev.ctx._pallas_pad_cache = cache
    # The entry holds a reference to the source array so its id() cannot be
    # reused by a different array while the entry lives (ADVICE r1 low).
    if prepad is None:
        key = (id(img.pixels), edge_x, edge_y, hp, wp, str(img_dtype),
               exact_src)
        entry = cache.get(key)
        if entry is None or entry[0] is not img.pixels:
            entry = (
                img.pixels,
                _pad_xmajor(jnp, img.pixels, edge_x, edge_y,
                            opts.edge_color, hp, wp, dtype=img_dtype,
                            exact_u8=exact_src),
            )
            cache[key] = entry
        img_xm = entry[1]

    tap_lo, n_taps = _tap_range(interpolation)

    # ---- shared per-block source-bbox stats AND shared base-layout coords:
    # every tier's tile is gw consecutive (8, 64) base blocks, so ONE
    # full-grid stats pass + ONE coordinate flatten serve every tier.
    # In base mode the coords already ARE the kernel layout: the stats are
    # plain axis reductions and the flatten/unflatten disappear entirely.
    LCM_W = 256
    half = 0.5 if interpolation == "nearest" else 0.0
    # NaN/inf coords must FAIL every tier fit (the int cast of NaN is a
    # backend-defined sentinel — 0 on CPU — which silently PASSED the
    # max-only fit tests; review r3 finding). Poison non-finite values to
    # a huge finite coordinate in the STATS source only: max_x blows past
    # every window, the block stays unclaimed, and the exact subset patch
    # or gather fallback (which see the original coords) handles it.
    statx = jnp.where(jnp.isfinite(pxp), pxp, 1e9)
    staty = jnp.where(jnp.isfinite(pyp), pyp, 1e9)
    if base_mode:
        nby, nbx = bl
        x0g = jnp.floor(statx + half).astype(jnp.int32)
        y0g = jnp.floor(staty + half).astype(jnp.int32)
        # each base-layout row IS one (8, 64) block: per-block stats are
        # plain full-row reductions (NO 4-D reshape — that would relayout
        # the whole 33MB/4K array lane->sublane just to reduce it)
        base = (x0g.min(axis=1).reshape(nby, nbx),
                x0g.max(axis=1).reshape(nby, nbx),
                y0g.min(axis=1).reshape(nby, nbx),
                y0g.max(axis=1).reshape(nby, nbx))
        px_b = pxp.reshape(nby * nbx, 1, BASE_PIX)
        py_b = pyp.reshape(nby * nbx, 1, BASE_PIX)
    else:
        ht0 = _round_up(h_out, TILE_H)
        wt0 = _round_up(w_out, LCM_W)
        if (ht0, wt0) != (h_out, w_out):
            pxp0 = jnp.pad(pxp, ((0, ht0 - h_out), (0, wt0 - w_out)), mode="edge")
            pyp0 = jnp.pad(pyp, ((0, ht0 - h_out), (0, wt0 - w_out)), mode="edge")
            statx0 = jnp.pad(statx, ((0, ht0 - h_out), (0, wt0 - w_out)), mode="edge")
            staty0 = jnp.pad(staty, ((0, ht0 - h_out), (0, wt0 - w_out)), mode="edge")
        else:
            pxp0, pyp0 = pxp, pyp
            statx0, staty0 = statx, staty
        x0g = jnp.floor(statx0 + half).astype(jnp.int32)
        y0g = jnp.floor(staty0 + half).astype(jnp.int32)
        nby, nbx = ht0 // TILE_H, wt0 // BW
        bx = x0g.reshape(nby, TILE_H, nbx, BW)
        by = y0g.reshape(nby, TILE_H, nbx, BW)
        base = (bx.min(axis=(1, 3)), bx.max(axis=(1, 3)),
                by.min(axis=(1, 3)), by.max(axis=(1, 3)))
        px_b = _flatten_base(pxp0, nby, nbx)
        py_b = _flatten_base(pyp0, nby, nbx)

    def finish(out_base):
        """Base-layout kernel output -> caller-layout channel arrays."""
        if base_mode:
            return tuple(out_base[:, c, :] for c in range(4))
        planar = _unflatten_base(out_base, nby, nbx)
        return tuple(planar[c, :h_out, :w_out] for c in range(4))

    def subchunk_stats():
        """Per-(8, 16)-sub-chunk source bounds: (n_blk, 4) min/max x/y."""
        n_blk = nby * nbx
        if base_mode:
            bx4 = x0g.reshape(n_blk, TILE_H, 4, 16)
            by4 = y0g.reshape(n_blk, TILE_H, 4, 16)
            ax = (1, 3)
        else:
            bx4 = x0g.reshape(nby, TILE_H, nbx, 4, 16).transpose(0, 2, 3, 1, 4)
            by4 = y0g.reshape(nby, TILE_H, nbx, 4, 16).transpose(0, 2, 3, 1, 4)
            bx4 = bx4.reshape(n_blk, 4, TILE_H, 16)
            by4 = by4.reshape(n_blk, 4, TILE_H, 16)
            ax = (2, 3)
        return (bx4.min(axis=ax).reshape(n_blk, 4),
                bx4.max(axis=ax).reshape(n_blk, 4),
                by4.min(axis=ax).reshape(n_blk, 4),
                by4.max(axis=ax).reshape(n_blk, 4))

    def plan(tile_h, tile_w_c, win_h_c, win_w_c, subw=None):
        """Group the base stats into this tier's tiling and compute aligned
        window origins plus per-tile fit flags. With `subw` on a gw>1 tier,
        also derive per-chunk 8-aligned x-sub-origins (`coff`) inside the
        tile window; the tile fits only if every chunk's x-span fits its
        sub-window. `subw` on a gw==1 tier selects SUB-CHUNK mode: per-
        (8, 16)-piece square (subw, subw) 2-D sub-windows (x mult-8,
        y mult-32 offsets packed as an (8, n_tiles) scalar array) inside a
        tall window — the extreme-differential-warp (spiral-class) tier."""
        assert tile_h == TILE_H and tile_w_c % BW == 0 and LCM_W % tile_w_c == 0
        win_h_c = min(win_h_c, hp)
        win_w_c = min(win_w_c, wp)
        subchunk = tile_w_c == BW and subw is not None
        if subw is not None and (win_w_c <= subw
                                 or (subchunk and win_h_c <= subw)
                                 or (win_h_c >= hp and win_w_c >= wp)):
            # no-op at this window size — or the truncated whole-image
            # window, whose skipped fit check must stay trivially true
            # (a sub-window CAN overflow even when the full window can't)
            subw = None
            subchunk = False
        gw = tile_w_c // BW
        ntx = nbx // gw
        group = [b.reshape(nby, ntx, gw) for b in base]
        min_x = group[0].min(axis=-1) + tap_lo
        max_x = group[1].max(axis=-1) + tap_lo + n_taps - 1
        min_y = group[2].min(axis=-1) + tap_lo
        max_y = group[3].max(axis=-1) + tap_lo + n_taps - 1
        ox = jnp.clip((min_x // 16) * 16, 0, wp - win_w_c)
        oy = jnp.clip((min_y // 8) * 8, 0, hp - win_h_c)
        coff = None
        if subchunk:
            sminx, smaxx, sminy, smaxy = subchunk_stats()
            oxf = ox.reshape(-1, 1)  # (n_tiles, 1); gw==1 so tiles==blocks
            oyf = oy.reshape(-1, 1)
            sminx = sminx + tap_lo
            smaxx = smaxx + tap_lo + n_taps - 1
            sminy = sminy + tap_lo
            smaxy = smaxy + tap_lo + n_taps - 1
            cx = jnp.clip(((sminx - oxf) // 8) * 8, 0, win_w_c - subw)
            cy = jnp.clip(((sminy - oyf) // 32) * 32, 0, win_h_c - subw)
            fit_s = ((smaxx - oxf - cx <= subw - 1)
                     & (smaxy - oyf - cy <= subw - 1))
            fit_x = jnp.all(fit_s, axis=-1).reshape(nby, ntx)
            # packed (8, n_tiles): rows 0..3 x-offsets, rows 4..7 y-rows
            coff = jnp.concatenate([cx.T, cy.T], axis=0).astype(jnp.int32)
        elif subw is not None:
            bmin_x = group[0] + tap_lo  # (nby, ntx, gw) per-chunk bounds
            bmax_x = group[1] + tap_lo + n_taps - 1
            coff = jnp.clip(((bmin_x - ox[..., None]) // 8) * 8,
                            0, win_w_c - subw)
            fit_x = jnp.all(bmax_x - ox[..., None] - coff <= subw - 1,
                            axis=-1)
            # (gw, n_tiles): tiles in the SMEM minor (lane) dim — see kernel
            coff = coff.reshape(nby * ntx, gw).T.astype(jnp.int32)
        else:
            fit_x = max_x - ox <= win_w_c - 1
        p = _Plan()
        p.tile_w, p.win_h, p.win_w = tile_w_c, win_h_c, win_w_c
        p.gw, p.ntx = gw, ntx
        # scalar-prefetch rows beyond oy/ox (the coff rows) — the single
        # local run_idx and run_smem_ok both size their footprints from,
        # so the fast-path-vs-capped threshold cannot drift from the
        # actual prefetch set (matches _tier_smem_rows' post-drop rule)
        smem_rows = (8 if subchunk else gw) if subw else 0
        # whether the NON-indirect whole-grid launch (run / the chain
        # path) fits the SMEM prefetch budget at this frame size; the
        # indirect path self-caps in run_idx
        p.run_smem_ok = (_smem_table_bytes(nby * ntx, 2 + smem_rows)
                         <= _SMEM_PREFETCH_BUDGET)
        if win_h_c >= hp and win_w_c >= wp:
            # window covers the entire padded image (small inputs, LUTs):
            # overflow is impossible — signal an unconditional tier
            p.overflow = None
            p.fit = None
        else:
            p.fit = fit_x & (max_y - oy <= win_h_c - 1)  # (nby, ntx)
            p.overflow = ~jnp.all(p.fit)

        def run(_=None):
            out = _call_kernel_tiles(
                img_xm, px_b, py_b,
                oy.reshape(1, nby * ntx), ox.reshape(1, nby * ntx),
                interpolation=interpolation, win_h=win_h_c, win_w=win_w_c,
                gw=gw, hp=hp, precision=precision, interpret=interpret,
                grid=(nby, ntx), subw=subw, coff=coff, subchunk=subchunk,
                exact_src=exact_src,
            )
            return finish(out)

        def run_idx(idx, count, carry):
            """Run the first `count` tiles of logical-index list `idx` into
            `carry` IN PLACE: a DYNAMIC grid of exactly `count` steps (a
            skipped grid step still costs ~430ns on this TPU, so sparse
            passes must not iterate the full tiling) dereferences the
            scalar-prefetched indices (no XLA gather/scatter of pixel
            data). The carry buffer is donated (input_output_aliases), so
            untouched blocks keep their carry contents — tiers chain into
            one frame buffer with no per-tier allocation or select.

            When the full scalar tables would overflow the 1 MiB SMEM bank
            (8K frames: the sub-chunk tier's (8, n_tiles) coff alone is
            ~2 MB; 16K+: every tier), the launch splits into SMEM-capped
            POSITIONAL launches: each prefetches only a cap-sized slice of
            idx plus the oy/ox/coff values pre-gathered by that slice on
            the XLA side (i32 gathers of the claimed tiles only — pixel
            data still moves exclusively by block DMA). Empty slices are
            skipped via lax.cond, so cost scales with actual claims."""
            n_tiles = nby * ntx
            idx = idx.astype(jnp.int32)
            if (_smem_table_bytes(n_tiles, 3 + smem_rows)
                    <= _SMEM_PREFETCH_BUDGET):
                return _call_kernel_tiles(
                    img_xm, px_b, py_b,
                    oy.reshape(1, n_tiles), ox.reshape(1, n_tiles),
                    interpolation=interpolation, win_h=win_h_c,
                    win_w=win_w_c, gw=gw, hp=hp, precision=precision,
                    interpret=interpret, grid=(1, n_tiles),
                    grid_bound=count, tile_idx=idx, subw=subw, coff=coff,
                    carry=carry, subchunk=subchunk, exact_src=exact_src,
                )
            cap = _SMEM_PREFETCH_BUDGET // ((3 + smem_rows) * 4)
            cap = max(128, (cap // 128) * 128)
            n_launch = -(-n_tiles // cap)
            pad_n = n_launch * cap - idx.shape[0]
            idx_pad = (jnp.concatenate([idx, jnp.zeros((pad_n,), jnp.int32)])
                       if pad_n else idx)
            oyf = oy.reshape(-1)
            oxf = ox.reshape(-1)
            for k in range(n_launch):
                idx_k = jax.lax.dynamic_slice_in_dim(idx_pad, k * cap, cap)
                cnt_k = jnp.clip(count - k * cap, 0, cap)

                def launch(c, idx_k=idx_k, cnt_k=cnt_k):
                    oy_k = jnp.take(oyf, idx_k)[None, :]
                    ox_k = jnp.take(oxf, idx_k)[None, :]
                    coff_k = (jnp.take(coff, idx_k, axis=1)
                              if coff is not None else None)
                    return _call_kernel_tiles(
                        img_xm, px_b, py_b, oy_k, ox_k,
                        interpolation=interpolation, win_h=win_h_c,
                        win_w=win_w_c, gw=gw, hp=hp, precision=precision,
                        interpret=interpret, grid=(1, cap),
                        grid_bound=cnt_k, tile_idx=idx_k, subw=subw,
                        coff=coff_k, carry=c, subchunk=subchunk,
                        positional=True, exact_src=exact_src,
                    )

                carry = jax.lax.cond(cnt_k > 0, launch, lambda c: c, carry)
            return carry

        def run_tiles(claim, carry):
            """Compact `claim`ed tile indices to the front, then run_idx."""
            n_tiles = nby * ntx
            flat = claim.reshape(-1)
            idx = jnp.nonzero(flat, size=n_tiles, fill_value=0)[0]
            count = jnp.sum(flat.astype(jnp.int32))
            return run_idx(idx, count, carry)

        p.run, p.run_tiles, p.run_idx = run, run_tiles, run_idx
        return p

    # Config chain, cheapest first — FLOPs/pixel scale with window area and
    # narrow (8x64) tiles keep rotational source bands small (measured 4K
    # bilinear: fast 587, mid 417, rot 320, xrot 150 Mpix/s; gather ~20).
    # A tier whose window covers the whole padded image truncates the chain
    # (single unconditional pallas program — the LUT/small-image case).
    itm = jnp.dtype(img_dtype).itemsize  # 2 for bf16/exact-u8, 4 for f32
    per_tile_mode = getattr(opts, "pallas_per_tile", "auto")
    per_tile_req = (per_tile_mode == "on"
                    or (per_tile_mode != "off" and nby * nbx >= 1024))
    tier_cfgs = _filter_tiers(tiers, nby, nbx, hp, wp, itm,
                              per_tile=per_tile_req)

    def slow_path(_=None):
        return tuple(xla_fallback())

    plans = []
    terminal = slow_path
    truncated = False
    for th, tw, wh, ww, tsw in tier_cfgs:
        p = plan(th, tw, wh, ww, subw=tsw)
        if p.overflow is None:
            terminal = p.run
            truncated = True
            break
        plans.append(p)
    if truncated:
        # truncation routes everything through the chain (per-tile is
        # skipped), whose launches are non-indirect: tiers kept only for
        # the per-tile capped path must not be traced there (16K output
        # of a small image: the whole-window tier truncates but earlier
        # rungs' full scalar tables would overflow SMEM at compile)
        plans = [p for p in plans if p.run_smem_ok]

    # Whole-frame lax.cond chain on per-tier overflow flags (the per-tile
    # path's escalation target, and the only path when per-tile is off).
    def chain_from(i):
        branch = terminal
        for p in reversed(plans[i:]):
            branch = (lambda ov, run, nxt: lambda _=None: jax.lax.cond(
                ov, nxt, run, operand=None))(p.overflow, p.run, branch)
        return branch

    use_per_tile = per_tile_req and not truncated and len(plans) > 0
    if not use_per_tile:
        return list(chain_from(0)())

    # ---- per-tile tier selection (mixed-warp frames: twirl/fisheye class).
    # Claims at base (8,64) granularity, cheapest tier first; every tier
    # runs ONLY its claimed tiles, compacted to a dynamic-size grid (exact
    # step count — no skipped-step tax, no capacity limits). Whole-frame
    # gather only when some tile fits no tier at all.
    nbx_real = -(-w_out // BW)
    cheaper = jnp.zeros((nby, nbx), bool)
    actives = []
    for p in plans:
        # nbx is a multiple of every tier's gw (tile widths divide the
        # 256-px planning LCM), so the repeat covers the block grid exactly
        fit_b = jnp.repeat(p.fit, p.gw, axis=1)
        cb = fit_b & ~cheaper
        cheaper = cheaper | fit_b
        # claims are FIRST-fit per base block, launches run per tile: a
        # tile is active when ANY of its blocks claims this tier. Tiles of
        # DIFFERENT tiers can overlap (a wide tile whose blocks split
        # between tiers runs here in full, overwriting a cheaper tier's
        # blocks) — correct because an active tile always satisfies ITS
        # tier's whole-tile fit, so any overwrite writes correct values.
        actives.append(cb.reshape(nby, p.ntx, p.gw).any(axis=-1))
    unclaimed_any = jnp.any(~cheaper[:, :nbx_real])

    def multipass_buf():
        # tiers chain through ONE donated frame buffer; launch order is
        # the ladder order (correctness does not depend on it — see the
        # overlap note above)
        n_blk = nby * nbx
        res = jnp.zeros((n_blk, 4, BASE_PIX), jnp.float32)
        # single-chunk (gw=1) tiers share the per-block tile space: ONE
        # stable argsort by first-fit rank compacts ALL their claim lists
        # at once (each jnp.nonzero is itself a sort-class op on TPU, so
        # four separate compactions cost ~4x this), giving contiguous
        # per-tier index segments read out by cheap dynamic slices.
        singles = [t for t, p in enumerate(plans) if p.gw == 1]
        seg = {}
        if len(singles) > 1:
            tid = jnp.full((n_blk,), len(singles), jnp.int32)
            for r, t in enumerate(singles):
                tid = jnp.where(actives[t].reshape(-1), jnp.int32(r), tid)
            order = jnp.argsort(tid, stable=True).astype(jnp.int32)
            order_pad = jnp.concatenate(
                [order, jnp.zeros((n_blk,), jnp.int32)])
            off = jnp.int32(0)
            for r, t in enumerate(singles):
                cnt = jnp.sum(actives[t].astype(jnp.int32))
                idx_t = jax.lax.dynamic_slice(order_pad, (off,), (n_blk,))
                seg[t] = (idx_t, cnt)
                off = off + cnt
        for t, p in enumerate(plans):
            if t in seg:
                idx_t, cnt = seg[t]
                res = jax.lax.cond(
                    cnt > 0,
                    lambda r, p=p, idx_t=idx_t, cnt=cnt: p.run_idx(
                        idx_t, cnt, r),
                    lambda r: r, res)
            else:
                act = actives[t]
                res = jax.lax.cond(
                    jnp.any(act),
                    lambda r, p=p, act=act: p.run_tiles(act, r),
                    lambda r: r, res)
        return res

    def multipass(_=None):
        return finish(multipass_buf())

    n_blk = nby * nbx
    if xla_subset is None:
        # no subset sampler available: any unclaimed block sends the whole
        # frame to the exact fallback
        mixed = (lambda _=None: jax.lax.cond(
            unclaimed_any, slow_path, multipass, operand=None))
    else:
        # Singular warps (polar inversion class) leave blocks near the
        # singularity fitting no tier window (their source span is ~the
        # whole image; NaN coords also land here). Sending the whole
        # frame to the ~20 Mpix/s gather for them costs ~25x the kernel
        # path (measured: polar_invert 4K 467 ms), so instead PATCH the
        # unclaimed blocks with an exact subset gather after the tier
        # launches. Patch capacity is a 3-rung ladder (each rung is a
        # static-shape gather, so a rung costs its FULL capacity whenever
        # taken — small singularities must not pay the big rung): n/32,
        # n/8, n/2 of the frame's blocks. The n/2 rung bounds the cliff
        # (VERDICT r2 weak #5): a frame that is 13-50% singular pays
        # ~half the gather cost instead of silently dropping to the
        # whole-frame fallback; only a majority-singular frame (which is
        # gather-shaped work no matter what) discards the kernel pass.
        caps = [min(n_blk, max(128, n_blk // 32))]
        for frac in (8, 2):
            if n_blk // frac > caps[-1]:
                caps.append(n_blk // frac)
        unc = (~cheaper).at[:, nbx_real:].set(False)  # pad cols: cropped
        unc_flat = unc.reshape(-1)
        count_unc = jnp.sum(unc_flat.astype(jnp.int32))

        def world_base():
            """World coords in base-block layout (n_blk, BASE_PIX)."""
            if base_mode:
                return x, y

            def fb(a):
                a0 = jnp.pad(a, ((0, nby * TILE_H - h_out),
                                 (0, nbx * BW - w_out)), mode="edge")
                return _flatten_base(a0, nby, nbx).reshape(n_blk, BASE_PIX)

            return fb(x), fb(y)

        def patch_with(cap):
            def patch(r):
                idxu = jnp.nonzero(unc_flat, size=cap, fill_value=0)[0]
                xb, yb = world_base()
                xu = jnp.take(xb, idxu, axis=0)
                yu = jnp.take(yb, idxu, axis=0)
                chans = xla_subset(xu, yu)  # 4 x (cap, BASE_PIX), exact
                # fill slots (idxu fill repeats block 0 whose values are
                # also exact — benign duplicate writes)
                return r.at[idxu, :, :].set(jnp.stack(chans, axis=1))

            return patch

        def full_overwrite(r):
            # beyond the top rung: exact fallback for the whole frame
            # (the already-spent kernel work is discarded — pathological
            # frames are gather-dominated anyway)
            xb, yb = world_base()
            chans = xla_subset(xb, yb)
            return jnp.stack(chans, axis=1)

        def patched(_=None):
            res = multipass_buf()
            lo = 0
            for cap in caps:
                res = jax.lax.cond(
                    (count_unc > lo) & (count_unc <= cap),
                    patch_with(cap), lambda r: r, res)
                lo = cap
            res = jax.lax.cond(count_unc > caps[-1], full_overwrite,
                               lambda r: r, res)
            return finish(res)

        mixed = patched
    if not plans[0].run_smem_ok:
        # the all-fit fast path's whole-grid launch would overflow SMEM
        # at this frame size (16K+): always run the capped per-tile path
        return list(mixed())
    top = jax.lax.cond(plans[0].overflow, mixed, plans[0].run, operand=None)
    return list(top)


def apply_lut_pallas(ev, lut, pos, xla_fallback):
    """Gather-free LUT application: treat the (K,) or (K, 4) LUT as a 1-row
    image and sample it with the MXU kernel at bilinear interpolation
    (= linear interpolation between adjacent entries, exactly the take-lerp
    semantics). XLA take runs at ~6ns/element on this TPU — one 4K gradient
    application measured 56 ms; this path runs it in ~6 ms. Returns 4
    channel arrays ((K,) LUTs are broadcast — read any one channel).

    Replaces the reference's per-pixel curve/gradient table lookups
    (userval.c curve/gradient application [unverified — mount empty])."""
    import jax.numpy as jnp

    from ..runtime.value import InputImage

    k = int(lut.shape[0])
    px4 = lut if lut.ndim == 2 else jnp.broadcast_to(lut[:, None], (k, 4))
    img = InputImage(pixels=px4.reshape(1, k, 4), name="lut")
    # invert world_to_pixel (w=k, h=1) so the source coord is pos*(k-1)
    xf = jnp.clip(pos, 0.0, 1.0) * (k - 1)
    x = xf - (k * 0.5 - 0.5)
    y = jnp.zeros_like(xf)
    return sample_image_pallas(ev, img, x, y, xla_fallback,
                               interpolation="bilinear",
                               edge_x="color", edge_y="color")
