"""Bench record protocol tests (VERDICT r3 item 2).

Regression: round 3's `save_record` overwrote the whole stored record, so a
run with a marginally higher headline and ALL-ZERO secondaries (budget
exhausted at a degraded relay) erased every previously-measured secondary
(observed live in benchmarks/records.json: 507.73/zeros clobbered 503.45
with pond-8K 814.6 etc.). These tests pin the merge semantics and the
secondaries-before-retries measurement order.
"""

import io
import json
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


R3_RECORD = {
    "metric": "distortion_suite_4k_bilinear",
    "value": 503.45, "unit": "Mpix/s/chip", "vs_baseline": 84.7,
    "c_baseline_mpix": 5.94, "c_threads": 1,
    "sustained_ripple_mpix": 513.0, "suite_batched_mpix": 0.0,
    "loop_unroll_mpix": 1483.0, "pond_8k_mpix": 814.6,
    "suite_f32_mpix": 0.0, "budget_exhausted": True,
    "skipped_phases": ["suite_f32", "suite_batched"],
    "relay_health_ms": 12.1, "health_gate": "DEGRADED", "date": "2026-08-18",
}

ZEROS_RUN = {
    "metric": "distortion_suite_4k_bilinear",
    "value": 507.73, "unit": "Mpix/s/chip", "vs_baseline": 39.3,
    "c_baseline_mpix": 12.92, "c_threads": 1,
    "sustained_ripple_mpix": 0.0, "suite_batched_mpix": 0.0,
    "loop_unroll_mpix": 0.0, "pond_8k_mpix": 0.0, "suite_f32_mpix": 0.0,
    "budget_exhausted": True,
    "skipped_phases": ["loop_unroll", "pond_8k", "sustained_ripple",
                       "suite_f32", "suite_batched", "moire"],
    "relay_health_ms": 11.4, "health_gate": "DEGRADED",
}


def test_merge_keeps_measured_secondaries_over_zeros():
    """The r3 clobbering bug, replayed: zeros must never erase numbers."""
    merged = bench.merge_record(dict(R3_RECORD), dict(ZEROS_RUN))
    assert merged["value"] == 507.73  # higher headline wins
    assert merged["vs_baseline"] == 39.3  # ...and brings its own ratio
    assert merged["pond_8k_mpix"] == 814.6  # measured values survive
    assert merged["loop_unroll_mpix"] == 1483.0
    assert merged["sustained_ripple_mpix"] == 513.0
    # skipped_phases must not claim phases whose merged value is non-zero
    assert "pond_8k" not in merged["skipped_phases"]
    assert "loop_unroll" not in merged["skipped_phases"]


def test_merge_takes_per_field_nonzero_best():
    a = dict(R3_RECORD)
    b = dict(ZEROS_RUN, value=480.0, suite_f32_mpix=349.4,
             suite_batched_mpix=458.4, pond_8k_mpix=770.4)
    merged = bench.merge_record(a, b)
    assert merged["value"] == 503.45  # lower headline does NOT replace
    assert merged["vs_baseline"] == 84.7
    assert merged["suite_f32_mpix"] == 349.4  # new fields merge in
    assert merged["suite_batched_mpix"] == 458.4
    assert merged["pond_8k_mpix"] == 814.6  # per-field max, not latest
    assert merged["skipped_phases"] == []
    assert merged["budget_exhausted"] is False


def test_merge_into_empty_store():
    merged = bench.merge_record({}, dict(ZEROS_RUN))
    assert merged["value"] == 507.73
    assert "date" in merged


def test_save_record_roundtrip(tmp_path, monkeypatch):
    p = tmp_path / "records.json"
    monkeypatch.setattr(bench, "_records_path", lambda: str(p))
    bench.save_record(dict(R3_RECORD))
    bench.save_record(dict(ZEROS_RUN))
    best = json.loads(p.read_text())["best"]
    assert best["value"] == 507.73
    assert best["pond_8k_mpix"] == 814.6


@pytest.mark.slow
def test_degraded_plateau_run_measures_every_secondary(tmp_path, monkeypatch,
                                                       capsys):
    """A full (non-quick) run within budget must produce a non-zero value
    for EVERY secondary phase — the protocol measures each secondary once
    before spending any budget on suite retries, so only a genuine hang
    (watchdog territory) can zero one. Runs the real phase set at a tiny
    size on CPU."""
    monkeypatch.setattr(bench, "_records_path",
                        lambda: str(tmp_path / "records.json"))
    bench.main(["--size", "256x144", "--iters", "2", "--budget-s", "540"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["value"] > 0
    for k in ("sustained_ripple_mpix", "suite_batched_mpix",
              "loop_unroll_mpix", "pond_8k_mpix", "suite_f32_mpix",
              "suite_f32_u8_mpix", "suite_u8io_mpix"):
        assert d[k] > 0, f"secondary {k} was skipped/zero: {d}"
    assert d["skipped_phases"] == []
    assert d["budget_exhausted"] is False
