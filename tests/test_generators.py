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
