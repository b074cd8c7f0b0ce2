"""Compile-on-demand loader + timing for the C baseline renderer.

Measures the reference-architecture stand-in (gcc -O3 per-pixel renderer,
row-slice pthreads — see baseline.c) on this machine, giving bench.py an
honest `vs_baseline` denominator (VERDICT r1 item 3).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "baseline.c")

FILTER_IDS = {"fisheye": 0, "twirl": 1, "pond": 2}
#: default params matching the .mm filter declarations
FILTER_PARAMS = {
    "fisheye": (2.0, 0.0, 0.0),
    "twirl": (3.0, 0.0, 0.0),
    "pond": (5.0, 20.0, 0.0),
}


def build() -> str | None:
    so_path = os.path.join(_HERE, "build", "libmmbaseline.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    os.makedirs(os.path.dirname(so_path), exist_ok=True)
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-ffast-math", "-fPIC", "-shared",
                 "-o", so_path, _SRC, "-lm", "-lpthread"],
                check=True, capture_output=True, timeout=180,
            )
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def load():
    so_path = build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    lib.mm_c_baseline_render.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int,
    ]
    lib.mm_c_baseline_render.restype = ctypes.c_int
    return lib


def measure(img: np.ndarray, filters=("fisheye", "twirl", "pond"),
            iters: int = 2, threads: int | None = None):
    """Render each filter `iters` times; returns (mean Mpix/s, per-filter
    dict, threads) or None when no C compiler is available."""
    lib = load()
    if lib is None:
        return None
    h, w = img.shape[:2]
    inp = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty_like(inp)
    threads = threads or os.cpu_count() or 1
    per = {}
    for name in filters:
        fid = FILTER_IDS[name]
        p0, p1, p2 = FILTER_PARAMS[name]
        best = float("inf")
        for _ in range(max(1, iters)):
            t0 = time.perf_counter()
            lib.mm_c_baseline_render(
                inp.ctypes.data, out.ctypes.data, w, h, fid,
                p0, p1, p2, threads,
            )
            best = min(best, time.perf_counter() - t0)
        per[name] = w * h / best / 1e6
    return float(np.mean(list(per.values()))), per, threads
