"""Render options — the rebuild's `mathmap_invocation_t` settings.

Reference: invocation fields (image dims, uservals, edge behavior,
interpolation, supersampling flag, # frames) in `mathmap_common.c`
[unverified — mount empty, SURVEY.md §0]; dataclass form per SURVEY.md §5
config-system row.
"""

from __future__ import annotations

from dataclasses import dataclass

INTERPOLATIONS = ("nearest", "bilinear", "bicubic")
EDGE_BEHAVIORS = ("color", "wrap", "reflect")


@dataclass(frozen=True)
class RenderOptions:
    interpolation: str = "bilinear"
    edge_x: str = "color"
    edge_y: str = "color"
    #: RGBA used by the 'color' edge behavior (default transparent, per
    #: SURVEY §2.1 origVal row).
    edge_color: tuple = (0.0, 0.0, 0.0, 0.0)
    #: supersampling antialiasing: 1 = off, 2 = 2x2 subpixel grid ("4x AA",
    #: BASELINE config 4). The exact reference scheme (corner grid + center)
    #: is marked LOW-confidence in SURVEY §2.1; see supersample_scheme.
    supersample: int = 1
    #: AA sample placement when supersample > 1. 'grid': s×s subpixel grid
    #: (s² evaluations — the round-1 default, kept as THE default so
    #: goldens/records stay comparable). 'corners': the scheme SURVEY §2.1
    #: suspects the reference uses [unverified — mount empty]: evaluate
    #: the (H+1)×(W+1) pixel-CORNER grid once (corners are shared between
    #: neighbors) plus the pixel centers, and average the 5 samples per
    #: pixel — ~2.07× the work of a plain render instead of grid-2's 4×,
    #: with a 5-point quincunx footprint. Equal 1/5 weights [weighting
    #: unverified; re-adjudicate at SURVEY §8]. supersample's numeric
    #: value is ignored beyond >1 in this mode. Not supported by the
    #: input-sharded tiled renderer (render_tiled raises).
    supersample_scheme: str = "grid"
    #: output element type. 'float32' (default): (…, H, W, 4) in [0,1].
    #: 'uint8': the renderer packs ON DEVICE with the reference's
    #: round-to-nearest 8-bit rule (clip·255 + 0.5, floor — bit-identical
    #: to imgio.to_uint8 / native.f32_to_u8 on the same floats) and
    #: returns (…, H, W, 4) uint8. The pack is fused into the render
    #: program, so device→host readback shrinks 4× — the serving layer's
    #: default (mathmap_tpu.serve), and the right call on any
    #: transfer-bound link (PCIe, or this environment's relay tunnel at
    #: ~15-40 MB/s). Applies to every renderer (jit, oracle, sharded,
    #: tiled) — they all pack in runtime.render.render_frame.
    output_dtype: str = "float32"
    #: render only the (x, y, w, h) sub-rectangle of the canvas — the
    #: GIMP-selection semantics of the reference plugin (`mathmap.c` applies
    #: the filter to the drawable's selection bounds while x/y/W/H/R keep
    #: the FULL drawable's coordinate system [unverified — mount empty]).
    #: x is the left column, y the TOP row (image row order), both 0-based;
    #: the output array is (h, w, 4). Inputs stay full-canvas (a warp may
    #: sample source pixels far outside the region). None = full canvas.
    region: tuple | None = None
    #: safety cap on per-pixel `while` trip counts (the reference's compile/
    #: render resource limits, SURVEY §2.1 compiler row).
    max_loop_iters: int = 10000
    #: in-VMEM while-loop engine (pallas_kernels/while_kernel): 'auto'
    #: uses it for eligible loops on big grids, 'off' disables, 'on'
    #: forces it for any tile-aligned grid (tests)
    pallas_while: str = "auto"
    #: unrolled masked steps per lax.while_loop iteration on the jit path:
    #: amortizes the any() convergence check and the HBM carry round-trip
    #: (semantics are exact — steps past the cap or past convergence are
    #: masked). Higher helps long fractal loops; short loops pay up to
    #: while_unroll-1 wasted masked steps.
    while_unroll: int = 4
    #: static-trip-count unroll budget (iterations): loops whose condition
    #: folds to a trace-time constant unroll into straight-line code up to
    #: this many steps (0 disables). A bailed attempt (count > budget)
    #: traces up to this many dead body copies before falling back, so
    #: raise with care on noise-heavy bodies.
    while_static_unroll: int = 64
    #: periodic animation: t = frame/N (wraps); non-periodic: t = frame/(N-1)
    #: so the last frame reaches t=1 (SURVEY §2.1 render-engine row).
    periodic: bool = True
    #: PRNG seed for rand()
    seed: int = 0
    #: param names whose values are BAKED into the compiled program as
    #: trace-time constants (the reference's cgen.c bakes ALL uservals and
    #: recompiles on change; here it is opt-in since traced params avoid
    #: the 1-3 min remote recompile). A baked int param driving a loop
    #: bound statically unrolls the loop (tracer.py). Each distinct value
    #: compiles its own program (cached). Unpassed params always bake
    #: their declared default.
    static_params: tuple = ()
    #: origVal sampler backend: 'auto' uses the Pallas MXU kernel on TPU
    #: with whole-frame XLA-gather fallback on window overflow; 'pallas'
    #: forces the kernel (interpret-mode off-TPU — slow, for tests);
    #: 'gather' forces the XLA path.
    sampler: str = "auto"
    #: Pallas sampler tier ladder, cheapest first: 5-tuples
    #: (tile_h, tile_w, win_h, win_w, subw). A lax.cond chain tries them
    #: per frame (or per tile with pallas_per_tile), falling back to the
    #: XLA gather path. Windows are (rows mult-of-32, cols mult-of-16);
    #: subw (mult-of-8, 0=off) gives multi-chunk tiles per-chunk x-sub-
    #: windows so contraction cost scales with subw, not win_w. Measured
    #: 4K bilinear kernel-only Mpix/s in docs/PERFORMANCE.md:
    #:   fast  8x256 win 32x512 sub128 — 1257: near-identity/translation
    #:   uwarp 8x64  win 32x256        —  722: magnification to ~3.8x
    #:   midn  8x64  win 64x128        —  688: mild rotation
    #:   mid   8x64  win 64x256        —  582: magnification + y-warp
    #:   rotn  8x64  win 128x128       —  541: any rotation, mag <=1.6
    #:   xrot  8x128 win 320x384 sub256—  250: extreme warps (slope ~3.8)
    #:   schk  8x64  win 512x512 sub160—  spiral class: subw on a 64-wide
    #:         tile selects SUB-CHUNK mode — per-(8,16)-piece square 2-D
    #:         sub-windows inside a tall window (differential slope ~9;
    #:         beyond it the subset patch takes over). 512/160 measured
    #:         best of {576/192, 512/192, 512/160} on 4K spiral
    pallas_tiers: tuple = (
        (8, 256, 32, 512, 128),
        (8, 64, 32, 256, 0),
        (8, 64, 64, 128, 0),
        (8, 64, 64, 256, 0),
        (8, 64, 128, 128, 0),
        (8, 128, 320, 384, 256),
        (8, 64, 512, 512, 160),
    )
    #: per-tile tier selection in the Pallas sampler: on mixed-warp frames
    #: (twirl/fisheye class) each tile runs the cheapest tier whose window
    #: fits ITS source bbox — every tier's claimed tiles are compacted to
    #: a dynamic-size indirect grid, all accumulating into one donated
    #: frame buffer — instead of the whole frame paying for the worst
    #: tile. 'auto': on for frames of >=1024 base (8, 64) blocks
    #: (~0.5 Mpix); 'on': whenever the tier chain exists (tests); 'off':
    #: whole-frame chain.
    pallas_per_tile: str = "auto"
    #: frame-sweep unroll factor for render_all_frames / render_batch:
    #: the in-program frame loop scans over chunks of this many
    #: Python-unrolled frames. 'auto' = 1 (flat lax.map) — the product
    #: path's same-window A/B had the flat map winning at both 1080p and
    #: 4K (see runtime/render.sweep_unroll_for for the numbers and why a
    #: probe formulation measured the opposite); kept as an option for
    #: experimentation. MMTPU_SWEEP_UNROLL overrides at trace time.
    sweep_unroll: object = "auto"
    #: MXU precision for the Pallas sampler's weight contractions. 'bf16'
    #: is MXU-native on v5e and accurate to ~1.5 8-bit LSBs (measured 6e-3
    #: max) — matching the reference's uint8 output packing; 'f32' uses
    #: split-float bf16x3 passes (measured <=7e-5 vs the exact gather path
    #: on the TPU; <=1e-4 target) at ~3x the bf16 cost — still ~6x faster than MXU-emulated f32.
    pallas_precision: str = "bf16"

    def __post_init__(self):
        if self.interpolation not in INTERPOLATIONS:
            raise ValueError(f"interpolation must be one of {INTERPOLATIONS}")
        if self.edge_x not in EDGE_BEHAVIORS or self.edge_y not in EDGE_BEHAVIORS:
            raise ValueError(f"edge behaviors must be one of {EDGE_BEHAVIORS}")
        if self.supersample < 1:
            raise ValueError("supersample must be >= 1")
        if self.supersample_scheme not in ("grid", "corners"):
            raise ValueError("supersample_scheme must be 'grid' or 'corners'")
        if self.output_dtype not in ("float32", "uint8"):
            raise ValueError("output_dtype must be 'float32' or 'uint8'")
        if self.while_unroll < 1:
            # 0 steps/iteration would make the jit lax.while_loop a no-op
            # body that never converges — the render would hang, not error
            raise ValueError("while_unroll must be >= 1")
        ec = tuple(float(c) for c in self.edge_color)
        if len(ec) == 3:
            ec = ec + (1.0,)  # RGB convenience: opaque alpha
        if len(ec) != 4:
            raise ValueError(
                f"edge_color needs 3 or 4 components, got {len(ec)}")
        object.__setattr__(self, "edge_color", ec)
        if self.region is not None:
            reg = tuple(int(v) for v in self.region)
            if len(reg) != 4:
                raise ValueError("region must be (x, y, w, h)")
            if reg[2] < 1 or reg[3] < 1:
                raise ValueError("region w/h must be >= 1")
            if reg[0] < 0 or reg[1] < 0:
                raise ValueError("region x/y must be >= 0")
            # x+w <= width is checked where the canvas size is known
            # (JitRenderer / render_oracle)
            object.__setattr__(self, "region", reg)
        if self.sampler not in ("auto", "pallas", "gather"):
            raise ValueError("sampler must be 'auto', 'pallas' or 'gather'")
        if self.sweep_unroll != "auto" and (
                not isinstance(self.sweep_unroll, int)
                or self.sweep_unroll < 1):
            raise ValueError("sweep_unroll must be 'auto' or an int >= 1")
        for tier in self.pallas_tiers:
            if len(tier) != 5:
                raise ValueError(
                    "each pallas tier is (tile_h, tile_w, win_h, win_w, subw)")
            th, tw, wh, ww, sw = tier
            if th != 8 or tw % 64 or 256 % tw:
                # tiles are rows of 8 and a divisor of the 256-px planning
                # LCM so every tier shares the (8, 64) base-block layout
                raise ValueError(
                    "pallas tier tiles must be (8, divisor-of-256 mult-of-64)")
            if wh % 32 or ww % 16:
                # rows mult-of-32: the kernel's window DMA copies a lane
                # extent of win_h*4, which Mosaic wants in 128-lane units
                # (origins only need 8-row alignment via the 4-copy layout)
                raise ValueError(
                    "pallas tier windows must be (mult of 32, mult of 16)")
            if sw < 0 or sw % 8:
                raise ValueError(
                    "tier subw must be a non-negative multiple of 8 (0 = off)")
            if tw == 64 and sw and sw % 32:
                # gw==1 + subw selects sub-chunk mode: the y sub-offsets
                # are 32-row-aligned lane slices, so the square sub-window
                # side must be a multiple of 32
                raise ValueError(
                    "sub-chunk tier (tile_w 64) subw must be a multiple of 32")
        if self.pallas_while not in ("auto", "on", "off"):
            raise ValueError("pallas_while must be 'auto', 'on' or 'off'")
        if not isinstance(self.static_params, tuple) or not all(
                isinstance(n, str) for n in self.static_params):
            raise ValueError("static_params must be a tuple of param names")
        if self.pallas_per_tile not in ("auto", "on", "off"):
            raise ValueError("pallas_per_tile must be 'auto', 'on' or 'off'")
        if self.pallas_precision not in ("bf16", "f32"):
            raise ValueError("pallas_precision must be 'bf16' or 'f32'")
