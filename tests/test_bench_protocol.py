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


def test_merge_demotes_old_basis_to_legacy():
    """VERDICT r4 item 3: a basis (measurement-protocol) change must never
    max() the old reading against the new one — the r3-era suite_batched
    458.4 (api-wrapper timing with a ~265MB host pull inside it) would
    otherwise forever beat the honest r4 device-fenced 422.2."""
    stored = dict(R3_RECORD, suite_batched_mpix=458.4,
                  bases={"suite_batched_mpix": "r3.api-fenced.host-pull"})
    run = dict(ZEROS_RUN, suite_batched_mpix=422.2)
    merged = bench.merge_record(stored, run)
    assert merged["suite_batched_mpix"] == 422.2  # honest basis wins
    assert merged["legacy"][
        "suite_batched_mpix@r3.api-fenced.host-pull"] == 458.4
    assert (merged["bases"]["suite_batched_mpix"]
            == bench.FIELD_BASIS["suite_batched_mpix"])


def test_merge_same_basis_still_takes_max():
    stored = dict(R3_RECORD, suite_batched_mpix=430.0,
                  bases={"suite_batched_mpix":
                         bench.FIELD_BASIS["suite_batched_mpix"]})
    run = dict(ZEROS_RUN, suite_batched_mpix=422.2)
    merged = bench.merge_record(stored, run)
    assert merged["suite_batched_mpix"] == 430.0
    assert "legacy" not in merged


def test_merge_preserves_legacy_across_runs():
    stored = dict(R3_RECORD,
                  legacy={"suite_batched_mpix@r3.api-fenced": 458.4},
                  bases={k: bench.FIELD_BASIS[k]
                         for k in bench._MERGE_MAX_FIELDS
                         if (R3_RECORD.get(k, 0.0) or 0.0) > 0})
    merged = bench.merge_record(stored, dict(ZEROS_RUN))
    assert merged["legacy"]["suite_batched_mpix@r3.api-fenced"] == 458.4


def test_merge_stamps_bases_on_first_record():
    merged = bench.merge_record({}, dict(R3_RECORD))
    assert (merged["bases"]["pond_8k_mpix"]
            == bench.FIELD_BASIS["pond_8k_mpix"])
    assert "suite_batched_mpix" not in merged["bases"]  # zero: unmeasured


def test_records_json_carries_no_tainted_best():
    """The shipped records.json was hand-audited at the r4->r5 transition:
    every best field must carry a current-basis tag and the known-tainted
    r3 suite_batched reading must live only in `legacy`."""
    with open(bench._records_path()) as f:
        best = json.load(f)["best"]
    for k in bench._MERGE_MAX_FIELDS:
        if (best.get(k, 0.0) or 0.0) > 0:
            assert best["bases"][k] == bench.FIELD_BASIS[k], k
    assert best["suite_batched_mpix"] != 458.4
    assert any(k.startswith("suite_batched_mpix@") for k in best["legacy"])


@pytest.mark.slow
def test_loaded_host_withholds_vs_baseline(tmp_path, monkeypatch, capsys):
    """VERDICT r4 item 4: a loaded 1-core host slows the C renderer and
    inflates the ratio (observed r4: 6.91/5.94 Mpix/s under pytest → bogus
    70.5x/84.7x). With no recorded quiet-window denominator, the run must
    flag pollution and withhold vs_baseline."""
    monkeypatch.setattr(bench, "_records_path",
                        lambda: str(tmp_path / "records.json"))
    monkeypatch.setenv("MMTPU_BENCH_FAKE_LOAD", "2.5")
    bench.main(["--size", "128x72", "--iters", "2", "--budget-s", "540"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] > 0
    assert d["c_baseline_polluted"] is True
    assert d["vs_baseline"] == 0.0
    assert d["c_load_1min"] == 2.5


@pytest.mark.slow
def test_loaded_host_falls_back_to_recorded_denominator(tmp_path,
                                                        monkeypatch, capsys):
    p = tmp_path / "records.json"
    monkeypatch.setattr(bench, "_records_path", lambda: str(p))
    p.write_text(json.dumps({"best": dict(R3_RECORD,
                                          c_baseline_mpix=11.57)}))
    monkeypatch.setenv("MMTPU_BENCH_FAKE_LOAD", "2.5")
    bench.main(["--size", "128x72", "--iters", "2", "--budget-s", "540"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] > 0
    assert d["c_baseline_source"] == "recorded-quiet-window"
    assert d["c_baseline_mpix"] == 11.57
    assert d["vs_baseline"] == round(d["value"] / 11.57, 1)


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


def test_merge_polluted_winner_adopts_clean_denominator():
    """Review r5: a load-polluted run that wins the headline must not
    enshrine its slowed C denominator — the merged record adopts the
    loser's clean one and recomputes the ratio."""
    clean = dict(R3_RECORD, c_baseline_mpix=11.57, vs_baseline=43.5)
    polluted = dict(ZEROS_RUN, value=510.0, c_baseline_mpix=5.94,
                    vs_baseline=0.0, c_baseline_polluted=True)
    rec = bench.merge_record(clean, polluted)
    assert rec["value"] == 510.0
    assert rec["c_baseline_mpix"] == 11.57
    assert rec["c_baseline_source"] == "recorded-quiet-window"
    assert "c_baseline_polluted" not in rec
    assert rec["vs_baseline"] == round(510.0 / 11.57, 1)


def test_recorded_polluted_denominator_not_trusted(tmp_path, monkeypatch,
                                                   capsys):
    """Review r5: a stored best whose C number was itself load-polluted
    must NOT serve as the recorded-quiet-window fallback — a loaded run
    on top of it withholds vs_baseline instead of publishing the
    polluted ratio as 'quiet'."""
    p = tmp_path / "records.json"
    monkeypatch.setattr(bench, "_records_path", lambda: str(p))
    p.write_text(json.dumps({"best": dict(
        R3_RECORD, c_baseline_mpix=5.94, c_baseline_polluted=True)}))
    monkeypatch.setenv("MMTPU_BENCH_FAKE_LOAD", "2.5")
    bench.main(["--size", "128x72", "--iters", "2", "--budget-s", "540"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] > 0
    assert d.get("c_baseline_source") != "recorded-quiet-window"
    assert d["c_baseline_polluted"] is True
    assert d["vs_baseline"] == 0.0
