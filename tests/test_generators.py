"""Code-generator exports (generators/ row of SURVEY §2.1)."""

import subprocess
import sys

import numpy as np

import mathmap_tpu as mm
from mathmap_tpu.generators.standalone import export_python, export_stablehlo


def test_export_python_runs(tmp_path):
    f = mm.compile_file("filters/Colors/invert.mm")
    script = tmp_path / "invert_standalone.py"
    export_python(f, str(script))
    img = np.random.RandomState(0).rand(8, 8, 4).astype(np.float32)
    inp = tmp_path / "in.png"
    outp = tmp_path / "out.png"
    mm.write_image(str(inp), img)
    env = {"PYTHONPATH": ".", "PATH": "/usr/bin:/bin", "MMTPU_PLATFORM": "cpu",
           "HOME": "/root", "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, str(script), str(inp), str(outp), "--size", "8x8"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = mm.read_image(str(outp))
    expect = mm.read_image(str(inp))
    np.testing.assert_allclose(out[..., :3], 1 - expect[..., :3], atol=2 / 255)


def test_export_stablehlo_contains_program():
    f = mm.compile_file("filters/Colors/grayscale.mm")
    text = export_stablehlo(f, 16, 16)
    assert "stablehlo" in text or "func.func" in text
    assert "16x16" in text.replace(" ", "") or "16, 16" in text or "tensor<16x16" in text


def test_from_pipeline_rejects_generative_mid_chain():
    """A generative stage mid-pipeline would silently drop everything
    upstream (review r3) — it must raise instead."""
    import pytest as _pytest

    from mathmap_tpu.designer.graph import from_pipeline
    from mathmap_tpu.expression_db import default_db
    from mathmap_tpu.utils.errors import MMRuntimeError

    db = default_db()
    with _pytest.raises(MMRuntimeError, match="generative"):
        from_pipeline("grayscale | moire | grayscale", db)
    g = from_pipeline("moire | grayscale", db)  # gen START is fine
    assert len(g.nodes) == 2


def test_load_mmc_counter_and_output_validation():
    from mathmap_tpu.designer.graph import from_mmc
    from mathmap_tpu.expression_db import default_db
    from mathmap_tpu.utils.errors import MMNameError, MMRuntimeError

    db = default_db()
    g = from_mmc('(composer (node "n1" "grayscale" (param "in" (input 0)))'
                 ' (output "n1"))', db=db)
    assert g.add("twirl") == "n2"  # counter restored past loaded ids
    g.output = "zzz"
    import pytest as _pytest

    with _pytest.raises(MMNameError, match="unknown node"):
        g.to_source()
    with _pytest.raises(MMRuntimeError, match="expected a number"):
        from_mmc('(composer (node "n1" "twirl" (param "angle" fast))'
                 ' (output "n1"))', db=db)
