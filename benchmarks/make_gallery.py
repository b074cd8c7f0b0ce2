"""Render the whole filter library into a PNG gallery (visual acceptance
check — the reference's examples/ gallery workflow, SURVEY.md §4).

    python benchmarks/make_gallery.py out_dir [--size 256] [--cpu]

Renders every library filter (including .mmc compositions) at the given
size with a structured test-card input, plus a contact-sheet index.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_card(size: int) -> np.ndarray:
    h = w = size
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx / w, yy / h, ((xx // (size // 8) + yy // (size // 8)) % 2).astype(float),
         np.ones((h, w))],
        axis=-1,
    ).astype(np.float32)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--t", type=float, default=0.3)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import mathmap_tpu as mm
    from mathmap_tpu.expression_db import default_db

    os.makedirs(args.out_dir, exist_ok=True)
    db = default_db()
    card = test_card(args.size)
    card2 = test_card(args.size)[::-1].copy()  # flipped second input
    ok, failed = [], []
    palette = [(0.9, 0.3, 0.1, 1.0), (0.1, 0.4, 0.9, 1.0), (0.9, 0.8, 0.2, 1.0)]
    for name in db.names():
        try:
            f = db.compile(name)
            n_imgs = len(f.image_params)
            inputs = [card, card2, card][:max(n_imgs, 0)]
            # distinct colors for color uservals (defaults are black)
            params = {}
            ci = 0
            for p in f.params:
                if p.kind == "color":
                    params[p.name] = palette[ci % len(palette)]
                    ci += 1
            out = f.render(*inputs, width=args.size, height=args.size, t=args.t,
                           params=params)
            path = os.path.join(args.out_dir, f"{db.entries[name].category}_{name}.png")
            mm.write_image(path, out)
            ok.append(name)
            print(f"ok   {name}", flush=True)
        except Exception as exc:
            failed.append((name, str(exc)[:120]))
            print(f"FAIL {name}: {str(exc)[:120]}", flush=True)

    # contact sheet
    try:
        from PIL import Image

        files = sorted(p for p in os.listdir(args.out_dir) if p.endswith(".png")
                       and p != "index.png")
        cols = 8
        rows = -(-len(files) // cols)
        thumb = args.size // 2
        sheet = Image.new("RGB", (cols * thumb, rows * thumb), (20, 20, 24))
        for i, fn in enumerate(files):
            im = Image.open(os.path.join(args.out_dir, fn)).convert("RGB")
            im = im.resize((thumb, thumb))
            sheet.paste(im, ((i % cols) * thumb, (i // cols) * thumb))
        sheet.save(os.path.join(args.out_dir, "index.png"))
    except Exception as exc:
        print(f"contact sheet failed: {exc}", file=sys.stderr)

    print(f"\n{len(ok)} rendered, {len(failed)} failed")
    for name, err in failed:
        print(f"  FAIL {name}: {err}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
