"""Regenerate tests/goldens.json — run after INTENTIONAL semantic changes.

Golden = sha256 of the uint8-packed oracle render (deterministic NumPy
path) for each fixture filter at 20x16, t=0.3, seeded params.
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURES = [
    "invert", "grayscale", "sepia", "solarize", "fisheye", "twirl", "pond",
    "ripple", "wave", "blend", "mask", "mandelbrot", "moire", "checkerboard",
    "kaleidoscope", "clouds", "julia", "sharpen",
    # round-2 additions
    "whirl_pinch", "water", "voronoi", "superformula", "tricorn",
    "porter_duff_xor", "soft_light", "chroma_key", "selective_desat",
    "warp_noise", "offset", "polar_wrap",
    # round-3: composer compositions (pin the graph->source codegen AND
    # the composed semantics, not just oracle-vs-jit consistency)
    "neon_glow", "checker_pick", "deep_lens", "marble_relief",
    "old_photo", "plasma_overlay",
]
W, H = 20, 16


def render_fixture(name):
    import mathmap_tpu as mm
    from mathmap_tpu.expression_db import default_db
    from mathmap_tpu.imgio.images import to_uint8

    db = default_db()
    f = db.compile(name)
    inputs = [
        _image(seed=11 + i) for i in range(len(f.image_params))
    ]
    params = {}
    for i, p in enumerate(f.params):
        if p.kind == "color":
            params[p.name] = (0.8, 0.3, 0.1, 1.0) if i % 2 else (0.1, 0.4, 0.9, 1.0)
    out = f.render(*inputs, width=W, height=H, t=0.3, interpret=True, params=params)
    return to_uint8(out)


def _image(seed):
    img = np.random.RandomState(seed).rand(H, W, 4).astype(np.float32)
    img[..., 3] = 1.0
    return img


def main():
    goldens = {}
    for name in FIXTURES:
        data = render_fixture(name)
        goldens[name] = hashlib.sha256(data.tobytes()).hexdigest()
        print(f"{name}: {goldens[name][:16]}")
    path = os.path.join(os.path.dirname(__file__), "goldens.json")
    with open(path, "w") as f:
        json.dump(goldens, f, indent=2, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
