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

_DB = None


def _db():
    global _DB
    if _DB is None:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from mathmap_tpu.expression_db import default_db

        _DB = default_db()
    return _DB


def _library_names():
    """EVERY filter in the library database (155 .mm + the .mmc composer
    gallery) — the whole language/library surface is golden-pinned, not a
    curated subset (round 3; oracle renders of all of them take <1 s).
    Composer entries additionally pin the graph->source codegen."""
    return sorted(_db().names())


FIXTURES = _library_names()
W, H = 20, 16


def render_fixture(name):
    from mathmap_tpu.imgio.images import to_uint8

    f = _db().compile(name)
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
