"""Render options — the rebuild's `mathmap_invocation_t` settings.

Reference: invocation fields (image dims, uservals, edge behavior,
interpolation, supersampling flag, # frames) in `mathmap_common.c`
[unverified — mount empty, SURVEY.md §0]; dataclass form per SURVEY.md §5
config-system row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

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
    #: is marked LOW-confidence in SURVEY §2.1; we use an s×s subpixel grid.
    supersample: int = 1
    #: safety cap on per-pixel `while` trip counts (the reference's compile/
    #: render resource limits, SURVEY §2.1 compiler row).
    max_loop_iters: int = 10000
    #: periodic animation: t = frame/N (wraps); non-periodic: t = frame/(N-1)
    #: so the last frame reaches t=1 (SURVEY §2.1 render-engine row).
    periodic: bool = True
    #: PRNG seed for rand()
    seed: int = 0
    #: origVal sampler backend: 'auto' uses the Pallas MXU kernel on TPU
    #: with whole-frame XLA-gather fallback on window overflow; 'pallas'
    #: forces the kernel (interpret-mode off-TPU — slow, for tests);
    #: 'gather' forces the XLA path.
    sampler: str = "auto"
    #: Pallas sampling window (rows mult-of-32, cols mult-of-8). Bigger
    #: windows tolerate stronger warps but cost O(area) MXU FLOPs/pixel.
    pallas_window: tuple = (64, 640)
    #: second-chance window for rotational warps (fisheye/twirl): squarer
    #: 8x128 tiles with a window sized for source gradients up to ~2.
    pallas_window_rot: tuple = (320, 328)
    #: MXU precision for the Pallas sampler's weight contractions. 'bf16'
    #: is ~17x faster on v5e (f32 matmul is MXU-emulated) and accurate to
    #: ~1.5 8-bit LSBs (measured 6e-3 max) — matching the reference's uint8
    #: output packing; 'f32' uses HIGHEST-precision passes (<=1e-4 of the
    #: gather path, measured 7e-5) and skips the rotational window config
    #: (VMEM budget).
    pallas_precision: str = "bf16"

    def __post_init__(self):
        if self.interpolation not in INTERPOLATIONS:
            raise ValueError(f"interpolation must be one of {INTERPOLATIONS}")
        if self.edge_x not in EDGE_BEHAVIORS or self.edge_y not in EDGE_BEHAVIORS:
            raise ValueError(f"edge behaviors must be one of {EDGE_BEHAVIORS}")
        if self.supersample < 1:
            raise ValueError("supersample must be >= 1")
        if self.sampler not in ("auto", "pallas", "gather"):
            raise ValueError("sampler must be 'auto', 'pallas' or 'gather'")
        wh, ww = self.pallas_window
        if wh % 32 or ww % 8:
            raise ValueError("pallas_window must be (mult of 32, mult of 8)")
        if self.pallas_precision not in ("bf16", "f32"):
            raise ValueError("pallas_precision must be 'bf16' or 'f32'")
