"""Documentation stays executable: every `mathmap` snippet in
docs/TUTORIAL.md must compile and render against both backends (the
tutorial cannot drift from the language), and docs/BUILTINS.md stays
registry-exact (tests/test_ops.py)."""

import pathlib
import re

import numpy as np
import pytest

import mathmap_tpu as mm

_DOC = pathlib.Path(__file__).parent.parent / "docs" / "TUTORIAL.md"


def _snippets():
    text = _DOC.read_text()
    return re.findall(r"```mathmap\n(.*?)```", text, re.DOTALL)


SNIPPETS = _snippets()


def test_tutorial_has_snippets():
    assert len(SNIPPETS) >= 10


@pytest.mark.parametrize("idx", range(len(SNIPPETS)))
def test_tutorial_snippets_render(idx):
    src = SNIPPETS[idx]
    f = mm.compile(src)
    n_img = len(f.image_params)
    rng = np.random.RandomState(idx)
    inputs = [rng.rand(16, 24, 4).astype(np.float32) for _ in range(n_img)]
    out = f.render(*inputs, width=24, height=16, t=0.3)
    ref = f.render(*inputs, width=24, height=16, t=0.3, interpret=True)
    assert out.shape == (16, 24, 4)
    assert np.isfinite(ref).all(), src
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4, err_msg=src)
