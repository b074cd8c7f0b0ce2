"""Expression database, composer/designer, and native fast-path filters
(SURVEY.md §2.1 rows: expression_db, designer, native_filters)."""

import os

import numpy as np
import pytest

import mathmap_tpu as mm
from mathmap_tpu.designer import sexpr
from mathmap_tpu.designer.graph import DesignerGraph, InputRef, from_mmc
from mathmap_tpu.expression_db import default_db
from mathmap_tpu.utils.errors import MMNameError, MMRuntimeError

H, W = 12, 16


def _image(seed=3):
    img = np.random.RandomState(seed).rand(H, W, 4).astype(np.float32)
    img[..., 3] = 1.0
    return img


# ---------------------------------------------------------------------------
# expression database
# ---------------------------------------------------------------------------

def test_db_scans_categories():
    db = default_db()
    assert not db.errors
    assert {"Colors", "Distorts", "Combine", "Render", "Map", "Noise"} <= set(db.categories)
    assert "fisheye" in db.entries
    assert db.entries["fisheye"].category == "Distorts"
    assert "polar" in db.entries["fisheye"].doc.lower() or db.entries["fisheye"].doc


def test_db_compile_renders():
    db = default_db()
    f = db.compile("invert")
    img = _image()
    out = f.render(img, interpret=True)
    np.testing.assert_allclose(out[..., 0], 1 - img[..., 0], atol=1e-6)


def test_db_cross_file_filter_call():
    """A filter can call another filter that lives in a different file."""
    db = default_db()
    f = db.compile("grayscale")
    # inject a synthetic caller that uses two library filters by name
    src = "filter chain (image in) invert(grayscale(in))(xy) end"
    import mathmap_tpu.api as api

    chain = api.compile_source(src)
    chain.filters.update(db.library_defs())
    img = _image()
    out = chain.render(img, interpret=True,
                       options=mm.RenderOptions(interpolation="nearest"))
    g = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    np.testing.assert_allclose(out[..., 0], 1 - g, atol=1e-5)


def test_db_unknown_name():
    db = default_db()
    with pytest.raises(MMNameError):
        db.compile("nope")


def test_db_tree_listing():
    db = default_db()
    tree = db.tree()
    assert "Distorts/" in tree and "fisheye" in tree


# ---------------------------------------------------------------------------
# s-expressions (lispreader analog)
# ---------------------------------------------------------------------------

def test_sexpr_roundtrip():
    text = '(composer (node "a" "fisheye" (param "strength" 2)) (output "a"))'
    forms = sexpr.loads(text)
    assert sexpr.loads(sexpr.dumps(forms[0]))[0] == forms[0]


def test_sexpr_comments_and_strings():
    forms = sexpr.loads('; comment\n(a "he\\"llo" 1.5)')
    assert forms[0][1] == 'he"llo'
    assert forms[0][2] == 1.5


# ---------------------------------------------------------------------------
# composer / designer
# ---------------------------------------------------------------------------

def test_composer_chain_matches_manual():
    db = default_db()
    g = DesignerGraph(db=db)
    a = g.add("grayscale", **{"in": InputRef(0)})
    b = g.add("invert")
    g.connect(a, b, "in")
    src = g.to_source()
    assert "filter composed" in src
    f = g.compile()
    img = _image()
    out = f.render(img, interpret=True,
                   options=mm.RenderOptions(interpolation="nearest"))
    gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    np.testing.assert_allclose(out[..., 0], 1 - gray, atol=1e-5)


def test_composer_params_and_mmc_roundtrip(tmp_path):
    db = default_db()
    g = DesignerGraph(db=db)
    n1 = g.add("twirl", **{"in": InputRef(0), "angle": 4.0})
    path = os.path.join(tmp_path, "t.mmc")
    g.save(path)
    g2 = from_mmc(open(path).read(), db=db)
    assert g2.output == n1
    assert g2.nodes[n1].params["angle"] == 4.0
    img = _image()
    out1 = g.compile().render(img, interpret=True)
    out2 = g2.compile().render(img, interpret=True)
    np.testing.assert_array_equal(out1, out2)
    # equals calling twirl directly with the same angle
    direct = db.compile("twirl").render(img, interpret=True, params={"angle": 4.0})
    np.testing.assert_allclose(out1, direct, atol=1e-6)


def test_composer_cycle_detection():
    db = default_db()
    g = DesignerGraph(db=db)
    a = g.add("invert")
    b = g.add("invert")
    g.connect(a, b, "in")
    g.connect(b, a, "in")
    with pytest.raises(MMRuntimeError):
        g.to_source()


def test_composer_middle_default_spelled_out():
    db = default_db()
    g = DesignerGraph(db=db)
    # lens has (in, size, zoom, cx, cy); set only cx -> size/zoom must be
    # emitted as their defaults
    g.add("lens", **{"in": InputRef(0), "cx": 1.0})
    src = g.to_source()
    assert "200.0" in src and "2.0" in src


# ---------------------------------------------------------------------------
# native fast-path: gaussian blur
# ---------------------------------------------------------------------------

def test_gaussian_blur_constant_image_invariant():
    img = np.full((H, W, 4), 0.6, np.float32)
    f = mm.compile("filter f (image in) gaussian_blur(in, 2)(xy) end")
    out = f.render(img, interpret=True, options=mm.RenderOptions(interpolation="nearest"))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_gaussian_blur_smooths():
    img = np.zeros((H, W, 4), np.float32)
    img[H // 2, W // 2] = 1.0
    f = mm.compile("filter f (image in) gaussian_blur(in, 1.5)(xy) end")
    out = f.render(img, interpret=True, options=mm.RenderOptions(interpolation="nearest"))
    c = out[H // 2, W // 2, 0]
    n = out[H // 2, W // 2 + 1, 0]
    assert 0 < c < 1 and 0 < n < c  # spread out, monotone falloff


def test_gaussian_blur_parity():
    img = _image()
    f = mm.compile("filter f (image in) gaussian_blur(in, 2)(xy) end")
    opts = mm.RenderOptions(interpolation="nearest")
    oracle = f.render(img, interpret=True, options=opts)
    jax_out = f.render(img, options=opts)
    np.testing.assert_allclose(jax_out, oracle, rtol=1e-4, atol=1e-5)


def test_db_scans_mmc_compositions():
    db = default_db()
    assert not db.errors, db.errors
    assert "old_photo" in db.entries
    assert db.entries["old_photo"].category == "Compositions"
    f = db.compile("old_photo")
    img = _image()
    out = f.render(img, interpret=True)
    assert out.shape == (H, W, 4)
    assert np.isfinite(out).all()
    # grain means output differs from plain sepia+vignette chain run without it
    assert (out[..., 3] == 1).all()


def _composition_names():
    import glob

    return sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "filters", "Compositions", "*.mmc"))
    )


@pytest.mark.parametrize("name", _composition_names())
def test_composition_gallery_renders(name):
    """Every bundled .mmc composition compiles through the composer
    (graph -> composite source, SURVEY §3.4) and renders finite RGBA on
    the oracle, matching the jit path (VERDICT r2 item 10 — the corpus
    exercises multi-node chains, fan-in masks, and generative sources)."""
    db = default_db()
    f = db.compile(name)
    n_img = sum(1 for q in f.fdef.params if q.kind == "image")
    imgs = [_image()] * max(n_img, 1)
    opts = mm.RenderOptions(interpolation="nearest")
    out = f.render(*imgs, interpret=True, options=opts)
    assert out.shape == (H, W, 4)
    assert np.isfinite(out).all()
    jit_out = f.render(*imgs, options=opts)
    # a few pixels may land EXACTLY on a sector/texel boundary, where
    # floor() legitimately differs between differently-fused programs
    # (runtime/sampling.py docstring hazard — mandala's kaleidoscope angle
    # fold hits it); the gallery check bounds the mismatch fraction
    mismatch = np.abs(np.asarray(jit_out) - np.asarray(out)) > 2e-4
    frac = mismatch.any(axis=-1).mean()
    assert frac < 0.02, f"{frac:.3%} of pixels differ beyond 2e-4"


def test_user_filter_dir_merges(tmp_path, monkeypatch):
    userdir = tmp_path / "exprs"
    userdir.mkdir()
    (userdir / "custom_probe.mm").write_text(
        "# user filter\nfilter custom_probe (image in) in(xy) end\n"
    )
    monkeypatch.setenv("MMTPU_FILTER_PATH", str(userdir))
    db = default_db()
    assert "custom_probe" in db.entries
    assert "custom_probe" in db.tree()


def test_write_animation_gif(tmp_path):
    from PIL import Image

    from mathmap_tpu.imgio.images import write_animation

    frames = np.stack([np.full((8, 10, 4), v, np.float32) for v in (0.2, 0.5, 0.8)])
    path = str(tmp_path / "a.gif")
    write_animation(path, frames, fps=10)
    im = Image.open(path)
    assert im.n_frames == 3


def test_pipeline_chain_builder():
    from mathmap_tpu.designer.graph import from_pipeline

    db = default_db()
    g = from_pipeline("grayscale | twirl angle=4.5", db)
    f = g.compile()
    img = _image()
    out = f.render(img, interpret=True)
    direct = db.compile("twirl").render(
        mm.compile_file("filters/Colors/grayscale.mm").render(img, interpret=True,
            options=mm.RenderOptions(interpolation="nearest")),
        interpret=True, params={"angle": 4.5})
    np.testing.assert_allclose(out, direct, atol=2e-2)  # resample chain vs composed
    with pytest.raises(MMNameError):
        from_pipeline("does_not_exist | twirl", db)


def test_user_mmc_references_bundled_filters(tmp_path, monkeypatch):
    """A user-directory .mmc composition may reference BUNDLED filters
    (review r3: user .mmc resolved against the user dir alone and was
    silently dropped into db.errors)."""
    userdir = tmp_path / "exprs"
    userdir.mkdir()
    (userdir / "usercomp.mmc").write_text(
        '(composer (node "n1" "glass_tiles" (param "in" (input 0)) '
        '(param "size" 16)) (output "n1"))\n')
    monkeypatch.setenv("MMTPU_FILTER_PATH", str(userdir))
    db = default_db()
    assert not db.errors, db.errors
    assert "usercomp" in db.entries
    f = db.compile("usercomp")
    out = f.render(_image(), interpret=True)
    assert np.isfinite(out).all()


def test_mmc_to_mmc_reference_order_independent(tmp_path, monkeypatch):
    """a.mmc may reference z.mmc (review r3: resolution was scan-order
    dependent; earlier-alphabet names referencing later ones failed)."""
    userdir = tmp_path / "exprs"
    userdir.mkdir()
    # a composed (.mmc) filter's image param is its generated name "in0"
    # (an unknown param name is an ERROR since review r5 — it used to be
    # silently dropped, working here only because the missing-image
    # fallback happens to also be input 0)
    (userdir / "a_outer.mmc").write_text(
        '(composer (node "n1" "z_inner" (param "in0" (input 0))) '
        '(output "n1"))\n')
    (userdir / "z_inner.mmc").write_text(
        '(composer (node "n1" "grayscale" (param "in" (input 0))) '
        '(output "n1"))\n')
    monkeypatch.setenv("MMTPU_FILTER_PATH", str(userdir))
    db = default_db()
    assert not db.errors, db.errors
    assert "a_outer" in db.entries and "z_inner" in db.entries


def test_user_shadowing_keeps_tree_consistent(tmp_path, monkeypatch):
    """Shadowing a bundled filter moves its tree row to User/ (review r3:
    it was listed twice with an inconsistent category)."""
    userdir = tmp_path / "exprs"
    userdir.mkdir()
    (userdir / "grayscale.mm").write_text(
        "# user grayscale\nfilter grayscale (image in) in(xy) end\n")
    monkeypatch.setenv("MMTPU_FILTER_PATH", str(userdir))
    db = default_db()
    entry = db.entries["grayscale"]
    assert entry.category.startswith("User")
    rows = [c for c, names in db.categories.items() if "grayscale" in names]
    assert rows == [entry.category], rows
