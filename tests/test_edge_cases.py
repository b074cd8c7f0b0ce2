"""Numeric and error-path edge cases."""

import numpy as np
import pytest

import mathmap_tpu as mm
from mathmap_tpu.utils.errors import MMSyntaxError, MMTypeError

H, W = 6, 8
BLANK = np.zeros((H, W, 4), np.float32)


def gray(src, **kw):
    return mm.compile(src).render(BLANK, interpret=True, **kw)[..., 0]


def test_division_by_zero_is_finite_after_clamp():
    # x/0 -> inf; clamp packs it to 1 (C renderer behaves the same on pack)
    out = gray("grayColor(clamp(1 / (x - x), 0, 1))")
    assert np.isfinite(out).all()


def test_sqrt_negative_is_nan_but_render_survives():
    out = gray("grayColor(sqrt(0 - 1))")
    # NaN clamps to 0 via clip (jnp.clip(NaN)=NaN -> uint8 pack handles);
    # oracle float path: just assert no crash and shape
    assert out.shape == (H, W)


def test_zero_length_tuple_rejected():
    with pytest.raises(MMSyntaxError):
        mm.compile("grayColor([])")


def test_deeply_nested_expression():
    expr = "x"
    for _ in range(60):
        expr = f"sin({expr})"
    out = gray(f"grayColor({expr} + 0.5)")
    assert np.isfinite(out).all()


def test_tuple_length_mismatch_message_names_op():
    with pytest.raises(MMTypeError) as ei:
        gray("grayColor(([1,2] + [1,2,3])[0])")
    assert "'+'" in str(ei.value)  # user-facing spelling, not '__add' 


def test_assignment_inside_condition():
    # conditions are statement SEQUENCES (no parens needed; assignments
    # in the condition persist into the branches)
    out = gray("if v = x; v >= 0 then grayColor(v / 8 + 0.1) else grayColor(0) end")
    assert out.shape == (H, W)


def test_curve_out_of_range_clamps():
    f = mm.compile("filter f (curve c) grayColor(c(x)) end")  # x far outside [0,1]
    out = f.render(width=W, height=H, interpret=True, params={"c": lambda v: v})
    assert out[..., 0].min() >= 0 and out[..., 0].max() <= 1


def test_huge_exponent_saturates():
    out = gray("grayColor(clamp(2 ^ 100, 0, 1))")
    np.testing.assert_allclose(out, np.ones((H, W)))


def test_empty_filter_args():
    f = mm.compile("filter f () grayColor(0.5) end")
    out = f.render(width=W, height=H, interpret=True)
    np.testing.assert_allclose(out[..., 0], 0.5)


def test_whitespace_and_comment_heavy_source():
    src = """
    # leading comment
    filter f (image in)  # trailing
      /* block
         comment */
      p = in( xy ) ;
      p
    end
    """
    f = mm.compile(src)
    img = np.random.RandomState(0).rand(H, W, 4).astype(np.float32)
    out = f.render(img, interpret=True, options=mm.RenderOptions(interpolation="nearest"))
    np.testing.assert_allclose(out, np.clip(img, 0, 1), atol=1e-6)
