"""Healthy-window hunter (VERDICT r3 item 4).

Probes the axon relay every ~20 min (CLAUDE.md outage guidance) and runs a
FULL bench.py the first time the probe reads healthy (<6 ms), recording the
round's first healthy-relay suite record. Appends every probe to
benchmarks/window_log.txt so a no-healthy-window round is *proven*, not
asserted. One bench trigger per run by default (the merge-safe records.json
keeps whatever it finds).

Run from the repo cwd (PYTHONPATH breaks axon plugin registration):
    nohup python - --hours 7 < benchmarks/window_hunter.py >> /tmp/hunter.out 2>&1 &
"""

import argparse
import json
import subprocess
import sys
import time


HEALTHY_MS = 6.0
LOG = "benchmarks/window_log.txt"


def probe_once(timeout_s=300):
    """One relay probe in a SUBPROCESS (the relay has been observed hanging
    >300 s inside a C readback — a hang must cost this probe, not the
    hunter)."""
    try:
        out = subprocess.run(
            [sys.executable, "-"], stdin=open("benchmarks/relay_probe.py"),
            capture_output=True, text=True, timeout=timeout_s)
        for line in out.stdout.splitlines():
            if line.startswith("relay_health_ms="):
                return float(line.split("=")[1].split()[0])
    except subprocess.TimeoutExpired:
        return None
    except Exception:
        return None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=7.0)
    ap.add_argument("--interval-s", type=float, default=1200.0)
    ap.add_argument("--max-triggers", type=int, default=1)
    args = ap.parse_args()

    t_end = time.time() + args.hours * 3600
    triggers = 0
    while time.time() < t_end:
        ms = probe_once()
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = {"ts": stamp, "relay_ms": ms,
                "gate": ("DARK" if ms is None else
                         "HEALTHY" if ms < HEALTHY_MS else "DEGRADED")}
        with open(LOG, "a") as f:
            f.write(json.dumps(line) + "\n")
        print(json.dumps(line), flush=True)
        if ms is not None and ms < HEALTHY_MS and triggers < args.max_triggers:
            triggers += 1
            with open(LOG, "a") as f:
                f.write(json.dumps({"ts": stamp, "event": "bench_trigger"})
                        + "\n")
            try:
                r = subprocess.run(
                    [sys.executable, "bench.py", "--budget-s", "420"],
                    capture_output=True, text=True, timeout=900)
                with open(LOG, "a") as f:
                    f.write(json.dumps({"ts": time.strftime(
                        "%Y-%m-%d %H:%M:%S"), "event": "bench_done",
                        "json": r.stdout.strip().splitlines()[-1]
                        if r.stdout.strip() else ""}) + "\n")
            except Exception as e:
                with open(LOG, "a") as f:
                    f.write(json.dumps({"event": "bench_failed",
                                        "err": str(e)[:200]}) + "\n")
        time.sleep(max(0.0, min(args.interval_s,
                                t_end - time.time())))
        if time.time() >= t_end:
            break


main()
