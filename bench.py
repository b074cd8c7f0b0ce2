"""Benchmark driver: renders BASELINE.json's headline workload on the real
TPU chip and prints ONE JSON line.

Metric: Mpix/s/chip on the distortion suite (fisheye, twirl, pond — BASELINE
config 2 filters) at 4K with bilinear origVal sampling, per the north-star
("distortion suite @ 4K"). vs_baseline: speedup over a measured C per-pixel
CPU renderer (benchmarks/c_baseline/ — the reference's cgen+gcc architecture
reproduced for these filters: -O3 -march=native, row-slice pthreads) run on
this machine; the reference binary itself is unavailable (mount empty —
SURVEY.md §0). NOTE: this box exposes a single CPU core — `c_threads` in
the JSON records the parallelism the C number actually got.

Usage: python bench.py [--size WxH] [--iters N] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _build(filter_path, w, h, opts):
    import mathmap_tpu as mm

    filt = mm.compile_file(filter_path)
    renderer = filt._renderer(w, h, opts, 1)
    return filt, renderer


def time_tpu(renderer, inputs, iters, t0=0.37):
    """Steady-state per-frame time with inputs resident on device (the
    reference's drawable lives in RAM next to the render loop; the analog
    here is HBM residency — host transfer is measured separately)."""
    import jax

    import jax.numpy as jnp

    inputs = [jax.device_put(a) for a in inputs]
    jax.block_until_ready(inputs)
    # warmup / compile
    out = renderer(inputs, {}, t=t0)
    _ = float(jnp.sum(out))
    # Fence via host readbacks: under the axon relay, block_until_ready acks
    # before execution finishes (fabricating impossible >HBM-bandwidth
    # numbers). Dispatches pipeline through the relay, so one readback per
    # BATCH amortizes the per-call round-trip (measured: fisheye 4K 47.8
    # ms/frame fenced per call vs 19.8 at batch 16 — the chip time); the
    # minimum over batches is robust to the shared queue's drift.
    batch = max(8, iters // 3)
    best = float("inf")
    for b in range(3):
        start = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(batch):
            out = renderer(inputs, {}, t=t0 + 0.001 * (b * batch + i))
            acc = acc + jnp.sum(out)
        _ = float(acc)
        best = min(best, (time.perf_counter() - start) / batch)
    return best


def _records_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "records.json")


def attach_best_recorded(d):
    """Embed the best previously-recorded full run (benchmarks/records.json,
    written by every successful non-quick run) whenever this run's number
    undersells it — a dark relay or a degraded window at driver time must
    not erase the round's real record from the recorded JSON. Clearly
    labeled as a PRIOR measurement (`best_recorded.date`)."""
    try:
        with open(_records_path()) as f:
            best = json.load(f).get("best")
    except Exception:
        return
    if best and best.get("value", 0.0) > d.get("value", 0.0):
        d["best_recorded"] = best


# numeric fields merged per-field (non-zero best wins); vs_baseline and
# c_baseline_* travel WITH value (they are that run's ratio, not a
# standalone best)
_MERGE_MAX_FIELDS = ("sustained_ripple_mpix", "suite_batched_mpix",
                     "loop_unroll_mpix", "pond_8k_mpix", "suite_f32_mpix",
                     "suite_f32_u8_mpix", "suite_u8io_mpix")

# Measurement BASIS per merged field (VERDICT r4 item 3): bump a field's tag
# whenever its measurement protocol changes. merge_record refuses to max()
# across differing bases — the old value is demoted to the record's `legacy`
# dict (annotated with its basis) instead of competing with the new one.
# History this rule exists for: the r3-era suite_batched 458.4 was measured
# through the api wrapper whose np.asarray pulled ~265 MB of output through
# the relay INSIDE the timing, and with batch-constant params that let XLA
# collapse the batch — the r4 protocol (device-fenced, shared-image,
# param-varying) is a different (honest) measurement and must not lose a
# per-field max() against the inflated number.
FIELD_BASIS = {
    "sustained_ripple_mpix": "r2.device-fenced",
    "suite_batched_mpix": "r4.device-fenced.shared-img.param-varying",
    "loop_unroll_mpix": "r2.device-fenced",
    "pond_8k_mpix": "r2.device-fenced",
    "suite_f32_mpix": "r3.device-fenced",
    "suite_f32_u8_mpix": "r4.exact-u8",
    "suite_u8io_mpix": "r4.device-fenced.shared-img.param-varying",
}


def merge_record(best: dict, d: dict) -> dict:
    """Merge a new full-suite run into the stored best, per field.

    Round-3 regression this replaces: a whole-record overwrite let a run
    with a marginally higher headline but ZERO secondaries (budget
    exhausted) erase every previously-recorded secondary (observed live:
    507.73/all-zeros clobbered 503.45 with pond-8K 814.6 etc.). Policy:
    - headline `value` takes the max; vs_baseline/c_baseline_mpix/
      c_threads/relay_health_ms/health_gate follow whichever run won it
      (they describe that measurement's conditions);
    - every secondary in _MERGE_MAX_FIELDS takes the per-field non-zero
      max WITHIN the same measurement basis (FIELD_BASIS) — a skipped
      (0.0) phase can never erase a measured one, and a basis change
      demotes the old-basis value to `legacy` instead of competing
      (VERDICT r4 item 3: never max() across bases).
    """
    if not best:
        rec = dict(d)
        rec["date"] = time.strftime("%Y-%m-%d")
        rec["bases"] = {k: FIELD_BASIS[k] for k in _MERGE_MAX_FIELDS
                        if (d.get(k, 0.0) or 0.0) > 0.0}
        return rec
    if d.get("value", 0.0) > best.get("value", 0.0):
        rec = dict(d)
        rec["date"] = time.strftime("%Y-%m-%d")
        rec["prev_value"] = best.get("value", 0.0)
        loser = best
    else:
        rec = dict(best)
        loser = d
    # a load-polluted winner must not enshrine its slowed C denominator
    # as the record's (review r5): adopt the loser's clean one when
    # available — the same recorded-quiet-window rule the live run uses
    if rec.get("c_baseline_polluted") and not loser.get(
            "c_baseline_polluted") and (loser.get("c_baseline_mpix") or 0.0):
        rec["c_baseline_mpix"] = loser["c_baseline_mpix"]
        rec["c_threads"] = loser.get("c_threads", rec.get("c_threads"))
        rec["c_baseline_source"] = "recorded-quiet-window"
        rec.pop("c_baseline_polluted", None)
        if rec.get("value") and rec["c_baseline_mpix"]:
            rec["vs_baseline"] = round(rec["value"] / rec["c_baseline_mpix"],
                                       1)
    # a stored record predating the bases field is assumed current-basis
    # ONLY because records.json was hand-audited at the r4->r5 transition
    # (the one known-tainted field, suite_batched 458.4, was demoted then)
    stored_bases = dict(best.get("bases") or {})
    legacy = dict(best.get("legacy") or {})
    rec_bases = {}
    for k in _MERGE_MAX_FIELDS:
        prev, new = best.get(k, 0.0) or 0.0, d.get(k, 0.0) or 0.0
        prev_basis = stored_bases.get(k, FIELD_BASIS[k] if prev else None)
        if prev and prev_basis != FIELD_BASIS[k]:
            # basis changed: old value can no longer compete — demote it
            legacy[f"{k}@{prev_basis}"] = prev
            prev = 0.0
        rec[k] = max(prev, new)
        if rec[k] > 0.0:
            rec_bases[k] = FIELD_BASIS[k]
    rec["bases"] = rec_bases
    if legacy:
        rec["legacy"] = legacy
    # bookkeeping fields describing skips apply to the merged record only
    # if nothing was merged in from history
    if any((best.get(k, 0.0) or 0.0) > 0.0 for k in _MERGE_MAX_FIELDS):
        rec["skipped_phases"] = [
            s for s in rec.get("skipped_phases", []) if rec.get(
                {"loop_unroll": "loop_unroll_mpix",
                 "pond_8k": "pond_8k_mpix",
                 "sustained_ripple": "sustained_ripple_mpix",
                 "suite_f32": "suite_f32_mpix",
                 "suite_f32_u8": "suite_f32_u8_mpix",
                 "suite_batched": "suite_batched_mpix",
                 "suite_u8io": "suite_u8io_mpix"}.get(
                     s.replace("(quick)", ""), ""), 0.0) == 0.0]
        rec["budget_exhausted"] = bool(rec["skipped_phases"])
    return rec


def save_record(d):
    """Persist a full-suite run, merging per-field bests (never letting a
    0.0/skipped field overwrite a previously measured one)."""
    try:
        try:
            with open(_records_path()) as f:
                store = json.load(f)
        except Exception:
            store = {}
        store["best"] = merge_record(store.get("best") or {}, d)
        with open(_records_path(), "w") as f:
            json.dump(store, f, indent=2)
            f.write("\n")
    except Exception as e:  # never let bookkeeping break the JSON contract
        sys.stderr.write(f"# records.json update failed: {e}\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--quick", action="store_true", help="small size, 2 iters")
    ap.add_argument("--budget-s", type=float, default=540.0,
                    help="soft wall-clock budget: optional phases are "
                    "skipped once exceeded so the JSON line always lands")
    args = ap.parse_args(argv)

    # The shared relay has been observed hanging for minutes at a time —
    # guarantee the driver ALWAYS gets the one JSON line. A WATCHDOG
    # THREAD dumps whatever was measured if the normal path stalls past
    # budget + 240s. (A thread, NOT signal.alarm: CPython only runs
    # Python signal handlers at bytecode boundaries on the main thread,
    # and a relay hang blocks inside a C readback that never returns to
    # the interpreter — the alarm would be deferred forever, which was
    # exactly the failure mode this guard exists for.)
    import threading

    t_start = time.perf_counter()
    partial = {"metric": ("distortion_suite_quick" if args.quick
                          else "distortion_suite_4k_bilinear"),
               "value": 0.0, "unit": "Mpix/s/chip", "vs_baseline": 0.0,
               "health_gate": "TIMEOUT"}
    emitted = [False]
    emit_lock = threading.Lock()


    def over():
        return time.perf_counter() - t_start > args.budget_s

    def emit_partial(note=None):
        with emit_lock:
            if emitted[0]:
                return
            emitted[0] = True
        if note:
            partial["note"] = note
        elif partial["value"] == 0.0:
            # nothing measured: the relay/device hung before the first
            # fenced suite attempt completed (observed: probe hangs
            # >300 s, backend init "Unavailable"). Say so — a bare 0.0
            # would read as a code regression.
            partial["note"] = ("device unreachable before any suite "
                               "measurement — environment failure, not "
                               "a code rate; see BASELINE.md for "
                               "in-session records")
        # persist whatever WAS measured: the merge protocol never lets a
        # 0.0/missing field erase a recorded one, and a watchdog-emitted
        # partial can carry real measurements (observed r4: a hard-timeout
        # partial held sustained 524.7 + suite_f32_u8 399.9 that would
        # otherwise have been lost to the round record)
        if not args.quick and partial.get("value", 0.0) > 0.0:
            save_record(partial)
        attach_best_recorded(partial)
        print(json.dumps(partial), flush=True)

    def _watchdog():
        emit_partial()
        sys.stderr.write("# bench hard-timeout: emitted partial JSON\n")
        os._exit(0)

    wd = threading.Timer(args.budget_s + 240, _watchdog)
    wd.daemon = True
    wd.start()

    try:
        _measure(args, partial, emitted, emit_lock, over, t_start, wd)
    except SystemExit:
        raise
    except BaseException as e:  # the JSON line must land even on crashes
        emit_partial(f"bench crashed: {type(e).__name__}: {str(e)[:300]} "
                     f"— environment failure or harness bug, not a code "
                     f"rate; see BASELINE.md for in-session records")
        sys.stderr.write(f"# bench crashed: {type(e).__name__}: {e}\n")


def _measure(args, partial, emitted, emit_lock, over, t_start, wd):
    import mathmap_tpu as mm

    if args.quick:
        w, h, iters = 960, 540, 2
    else:
        w, h = (int(v) for v in args.size.lower().split("x"))
        iters = args.iters

    opts = mm.RenderOptions(interpolation="bilinear")
    rng = np.random.RandomState(42)
    img = rng.rand(h, w, 4).astype(np.float32)
    img[..., 3] = 1.0
    # ONE u8 quantization (imgio.to_uint8's round-to-nearest rule) shared
    # by the suite_f32_u8 and suite_u8io phases — two inline copies could
    # silently diverge from each other and from the product packing
    img_u8 = mm.to_uint8(img)

    suite = [
        "filters/Distorts/fisheye.mm",
        "filters/Distorts/twirl.mm",
        "filters/Distorts/pond.mm",
    ]

    def relay_health():
        """Fenced 16MB elementwise op round-trip (healthy <5 ms; the shared
        tunnel has been observed degrading 10-100x within a day)."""
        import jax
        import jax.numpy as jnp

        # fixed 16MB probe regardless of --size/--quick (img[:1024,:1024]
        # silently shrank on small images, miscalibrating the 6ms gate)
        probe = jax.device_put(np.ones((1024, 1024, 4), np.float32))
        pf = jax.jit(lambda x: jnp.sum(x * 2.0 + 1.0))
        _ = float(pf(probe))
        t0 = time.perf_counter()
        _ = float(pf(probe) + pf(probe))
        return (time.perf_counter() - t0) / 2 * 1e3

    # Health-gated measurement (VERDICT r2 item 7): when the relay probe
    # reads degraded (>~3x healthy), the suite numbers reflect the shared
    # tunnel, not the code. Protocol (VERDICT r3 item 2): ONE suite attempt
    # for the headline, then EVERY secondary exactly once, and only THEN
    # spend leftover budget on suite retries — a degraded window may cost
    # the headline 10-15% but can no longer zero the secondaries (observed
    # r3: retries at a 13-14 ms plateau starved all six secondary phases).
    HEALTHY_MS = 6.0

    # per-phase wall timing (VERDICT r4 item 5): the r4 driver run skipped
    # three phases on budget — record where the 540 s actually goes so the
    # phase balance is tuned on data, not guesses. Ships in the JSON as
    # phase_times_s (diagnostic, never merged).
    phase_times = {}
    _phase_t = [time.perf_counter()]

    def mark(name):
        now = time.perf_counter()
        phase_times[name] = round(now - _phase_t[0], 1)
        _phase_t[0] = now
        partial["phase_times_s"] = phase_times
        print(f"# phase {name}: {phase_times[name]:.1f}s "
              f"(elapsed {now - t_start:.0f}/{args.budget_s:.0f}s)",
              file=sys.stderr)

    built = [_build(path, w, h, opts) for path in suite]
    filters = [b[0] for b in built]
    renderers = [b[1] for b in built]
    best_dt = [float("inf")] * len(suite)
    health_ms = float("inf")

    def suite_attempt():
        nonlocal health_ms
        h0 = relay_health()
        health_ms = min(health_ms, h0)
        partial["relay_health_ms"] = round(health_ms, 1)
        for k, renderer in enumerate(renderers):
            best_dt[k] = min(best_dt[k], time_tpu(renderer, [img], iters))
            # update the alarm fallback per FILTER: a hang mid-attempt
            # must not discard filters already measured (a 0.0 value
            # would mislabel a partial hang as "nothing measured")
            done = [dt for dt in best_dt if np.isfinite(dt)]
            partial["value"] = round(
                float(np.mean([w * h / dt / 1e6 for dt in done])), 2)
            partial["suite_measured"] = f"{len(done)}/{len(suite)}"
        return h0

    h_prev = suite_attempt()

    def suite_value():
        return float(np.mean([w * h / dt / 1e6 for dt in best_dt]))

    value = suite_value()
    mark("suite")

    # Measured C per-pixel baseline (the honest vs_baseline denominator),
    # EARLY and CPU-only: a crash in any TPU secondary must not cost the
    # partial JSON its ratio (observed live: an 8K SMEM compile crash
    # emitted vs_baseline 0.0 alongside a valid 497.9 suite value).
    # LOAD GUARD (VERDICT r4 item 4): this is a 1-core box — any concurrent
    # host work (pytest, compile workers) slows the C renderer and INFLATES
    # our ratio (observed twice in r4: 6.91 and 5.94 Mpix/s under load →
    # bogus 70.5x/84.7x, vs 9.09-12.92 in quiet windows). If the host is
    # loaded, wait briefly for quiet; if it stays loaded, fall back to the
    # recorded quiet-window denominator (flagged), or flag the fresh
    # measurement as polluted and withhold vs_baseline.
    import importlib.util

    def host_load():
        fake = os.environ.get("MMTPU_BENCH_FAKE_LOAD")
        if fake is not None:  # test hook (tests/test_bench_protocol.py)
            return float(fake)
        try:
            with open("/proc/loadavg") as f:
                return float(f.read().split()[0])
        except Exception:
            return 0.0

    load = host_load()
    for _ in range(3):
        if load <= 0.5 or over():
            break
        print(f"# host loaded ({load:.2f}) — waiting for a quiet window "
              "before the C baseline", file=sys.stderr)
        time.sleep(8 if "MMTPU_BENCH_FAKE_LOAD" not in os.environ else 0.01)
        load = host_load()
    partial["c_load_1min"] = round(load, 2)

    spec = importlib.util.spec_from_file_location(
        "c_baseline_runner",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchmarks", "c_baseline", "runner.py"),
    )
    c_runner = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(c_runner)

    recorded_c = 0.0
    try:
        with open(_records_path()) as f:
            _best = json.load(f).get("best") or {}
        # a recorded denominator is only trustworthy if the run that
        # stored it was NOT itself load-polluted (a polluted first run
        # on a loaded host must not become the "quiet-window" fallback
        # of every later loaded run — review r5)
        if not _best.get("c_baseline_polluted"):
            recorded_c = _best.get("c_baseline_mpix", 0.0) or 0.0
    except Exception:
        pass

    c_polluted = load > 0.5
    if c_polluted and recorded_c:
        # prior quiet-window measurement beats a fresh polluted one
        cpu_mpix, c_threads = recorded_c, 1
        partial["c_baseline_source"] = "recorded-quiet-window"
        print(f"# host still loaded ({load:.2f}) — using recorded "
              f"quiet-window C baseline {recorded_c:.2f} Mpix/s",
              file=sys.stderr)
    else:
        bimg = img[:1080, :1920] if not args.quick else img
        c_result = c_runner.measure(bimg, iters=2)
        if c_result is not None:
            cpu_mpix, c_per, c_threads = c_result
            print(f"# C baseline: {cpu_mpix:.2f} Mpix/s mean on {c_threads} thread(s) "
                  f"({', '.join(f'{k} {v:.1f}' for k, v in c_per.items())})",
                  file=sys.stderr)
        else:  # no C compiler: NumPy oracle stand-in (overstates our ratio)
            bw, bh = 480, 270
            filt = __import__("mathmap_tpu").compile_file(suite[0])
            start = time.perf_counter()
            filt.render(img[:bh, :bw], width=bw, height=bh, t=0.37, options=opts,
                        interpret=True)
            cpu_mpix = bw * bh / (time.perf_counter() - start) / 1e6
            c_threads = 0
            print(f"# oracle stand-in baseline: {cpu_mpix:.2f} Mpix/s", file=sys.stderr)
        if c_polluted:
            # fresh measurement under load, nothing recorded to fall back
            # on: publish the number but refuse the ratio (a slowed C
            # denominator would overstate us)
            partial["c_baseline_polluted"] = True
            print(f"# host loaded ({load:.2f}) and no recorded baseline — "
                  "C number flagged polluted, vs_baseline withheld",
                  file=sys.stderr)
    # ONE ratio-trust predicate, used everywhere vs_baseline is written
    # (first write, suite-retry refresh, final JSON) — review r5: the
    # retry loop's bare `if cpu_mpix:` used to resurrect a withheld ratio
    vs_ok = not (c_polluted and not recorded_c)
    if cpu_mpix and value and vs_ok:
        partial["vs_baseline"] = round(value / cpu_mpix, 1)
        partial["c_baseline_mpix"] = round(cpu_mpix, 2)
    mark("c_baseline")

    import jax
    import jax.numpy as jnp

    skipped = []

    # loop-class secondary: a 64-iteration literal-counter loop that the
    # tracer statically unrolls (docs/PERFORMANCE.md static-unroll table)
    loop_mpix = 0.0
    if over():
        skipped.append("loop_unroll")
    else:
        filt, renderer = _build("filters/Render/lissajous.mm", w, h, opts)
        dt = time_tpu(renderer, [], iters)
        loop_mpix = w * h / dt / 1e6
        partial["loop_unroll_mpix"] = round(loop_mpix, 1)
        print(f"# lissajous (64-iter static unroll): {dt * 1e3:.2f} ms/frame"
              f"  {loop_mpix:.1f} Mpix/s", file=sys.stderr)
    mark("loop_unroll")

    # Sustained throughput: a 24-frame t-sweep through render_all_frames
    # (ONE device program via lax.map) amortizes the relay's ~10ms/call
    # dispatch tax — this is the production animation path (BASELINE
    # config 4 shape) and the closer measure of chip capability.
    sustained = 0.0
    if over():
        skipped.append("sustained_ripple")
    else:
        # 1080p in production runs; scales down with --size so protocol
        # tests can run the full phase set on CPU at tiny sizes
        sw, sh = min(1920, w), min(1080, h)
        filt, renderer = _build("filters/Distorts/ripple.mm", sw, sh, opts)
        n_sweep = 24 if not args.quick else 6
        ts = np.arange(n_sweep, dtype=np.float32) / n_sweep
        sweep_in = [jax.device_put(jnp.asarray(img[:sh, :sw]))]
        jax.block_until_ready(sweep_in)
        out = renderer.render_all_frames(sweep_in, {}, ts)
        _ = float(jnp.sum(out))  # warmup+compile, fenced
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            out = renderer.render_all_frames(sweep_in, {}, ts)
            _ = float(jnp.sum(out))
            best = min(best, time.perf_counter() - start)
        fh, fw = out.shape[1], out.shape[2]  # renderer output dims (1080p)
        sustained = fw * fh * n_sweep / best / 1e6
        partial["sustained_ripple_mpix"] = round(sustained, 1)
        print(f"# sustained (ripple 1080p x{n_sweep} batched): "
              f"{best / n_sweep * 1e3:.2f} ms/frame  {sustained:.1f} Mpix/s",
              file=sys.stderr)
    mark("sustained_ripple")

    # Secondary metric: the same suite as 8-frame batches in ONE device
    # program each — the chip rate with the relay's per-dispatch cost
    # amortized to ~nothing. The per-frame PARAM VALUE varies across the
    # batch (render_batch per-job params — the product's animated-
    # parameter workload): the suite filters ignore t, so a plain t-sweep
    # of them lets XLA compute ONE frame and replicate it across the
    # unrolled chunk (observed: 1356-1440 "Mpix/s" — a legitimate program
    # optimization, but NOT 8 frames of rendering work; that reading was
    # scrubbed from records.json). The headline stays the per-frame
    # number (comparable across rounds).
    # Basis (r4): the ONE image is passed SHARED (pad built once before
    # the job loop — the product param-animation path), renderer-level
    # with an on-device fence. The r3-era 458.4 used the api wrapper,
    # whose np.asarray put a ~265 MB output host-pull through the relay
    # inside the timing — that measured the tunnel, not the chip (the
    # per-frame suite and sustained phases were always device-fenced).
    dev_img = jax.device_put(img)
    jax.block_until_ready(dev_img)
    n_sw = 8 if not args.quick else 3
    ts_sw = (np.arange(n_sw, dtype=np.float32) + 0.37) / n_sw
    batch_param = {  # first slider of each suite filter, varied per job
        "filters/Distorts/fisheye.mm": ("strength", 2.0, 0.03),
        "filters/Distorts/twirl.mm": ("angle", 3.0, 0.05),
        "filters/Distorts/pond.mm": ("phase", 0.0, 0.07),
    }
    suite_sust = []
    for path, filt in zip(suite, filters):
        if over():
            skipped.append("suite_batched")
            break
        pname, base, step = batch_param[path]
        params = [{pname: base + step * i} for i in range(n_sw)]
        rend = filt._renderer(w, h, opts, 1)

        def batch(toff, params=params, rend=rend):
            return rend.render_batch([dev_img], params, ts_sw + toff,
                                     shared_mask=(True,))

        _ = float(jnp.sum(batch(0.0)))
        best = float("inf")
        for k in range(3):
            start = time.perf_counter()
            _ = float(jnp.sum(batch(0.001 * (k + 1))))
            best = min(best, (time.perf_counter() - start) / n_sw)
        suite_sust.append(w * h / best / 1e6)
        print(f"# {path} batched x{n_sw} (param-varying, shared img): "
              f"{best * 1e3:.2f} ms/frame  {suite_sust[-1]:.1f} Mpix/s",
              file=sys.stderr)
    # record COMPLETE suite means only (r4 driver JSON recorded fisheye's
    # lone 434.7 as "the suite" while also listing the phase skipped —
    # a partial mean mislabeled as the mean; same rule the f32 phases use)
    suite_batched = (float(np.mean(suite_sust))
                     if len(suite_sust) == len(suite) else 0.0)
    if suite_batched:
        partial["suite_batched_mpix"] = round(suite_batched, 1)
    mark("suite_batched")

    # The product's END-TO-END workload: u8 inputs AND u8 outputs (the
    # reference is a GIMP plugin — 8-bit drawables both ways [unverified —
    # mount empty]), same batched-x8 param-varying protocol as above (the
    # per-job param keeps XLA from collapsing the batch), default bf16
    # sampler. u8-in rides the exact-u8 kernel path; u8-out packs inside
    # the device program (runtime/render.pack_uint8) and QUARTERS the
    # output stack's HBM footprint (probe_sweep measured u8-out sweeps
    # ~+9% at 4K — (F,H,W,4) f32 stack materialization pressure).
    suite_u8io_per = []
    opts_u8 = mm.RenderOptions(interpolation="bilinear",
                               output_dtype="uint8")
    dev_u8 = jax.device_put(img_u8)
    jax.block_until_ready(dev_u8)
    for path, filt in zip(suite, filters):
        if over():
            skipped.append("suite_u8io")
            break
        pname, base, step = batch_param[path]
        params = [{pname: base + step * i} for i in range(n_sw)]
        rend_u8 = filt._renderer(w, h, opts_u8, 1)

        def batch_u8(toff, params=params, rend_u8=rend_u8):
            return rend_u8.render_batch([dev_u8], params, ts_sw + toff,
                                        shared_mask=(True,))

        # fence: f32-accumulated sum of the u8 stack (a plain u8 sum
        # would overflow; a dropped output could be elided by the relay)
        _ = float(jnp.sum(batch_u8(0.0), dtype=jnp.float32))
        best = float("inf")
        for k in range(3):
            start = time.perf_counter()
            _ = float(jnp.sum(batch_u8(0.001 * (k + 1)),
                              dtype=jnp.float32))
            best = min(best, (time.perf_counter() - start) / n_sw)
        suite_u8io_per.append(w * h / best / 1e6)
        print(f"# {path} u8-in/u8-out batched x{n_sw} (shared img): "
              f"{best * 1e3:.2f} ms/frame  {suite_u8io_per[-1]:.1f} Mpix/s",
              file=sys.stderr)
    suite_u8io = float(np.mean(suite_u8io_per)) if suite_u8io_per else 0.0
    if suite_u8io_per:
        partial["suite_u8io_mpix"] = round(suite_u8io, 1)
    mark("suite_u8io")

    # diagnostics (not part of the headline metric): generative filter
    # (no sampling, no input) isolates raw compute from gather cost
    if over():
        skipped.append("moire")
    else:
        filt, renderer = _build("filters/Render/moire.mm", w, h, opts)
        dt = time_tpu(renderer, [], iters)
        print(f"# moire (generative): {dt * 1e3:.2f} ms/frame  "
              f"{w * h / dt / 1e6:.1f} Mpix/s", file=sys.stderr)
    mark("moire")

    # 8K secondary: 4x the pixels per dispatch amortizes the per-call relay
    # tax — the closest single-dispatch measure of the chip's kernel rate
    # (docs/PERFORMANCE.md roofline: pond 8K ~781 Mpix/s at a 3x-degraded
    # relay vs 590 at 4K). Runs AFTER the north-star-critical batched/u8io
    # phases (r4 phase order starved them; this one is a depth diagnostic).
    pond8k_mpix = 0.0
    if args.quick or over():
        skipped.append("pond_8k(quick)" if args.quick else "pond_8k")
    else:
        w8, h8 = 2 * w, 2 * h  # 2x2-tile whatever --size gave (default: 8K)
        img8 = np.tile(img, (2, 2, 1))
        _, r8 = _build("filters/Distorts/pond.mm", w8, h8, opts)
        dt8 = time_tpu(r8, [img8], 8)
        pond8k_mpix = w8 * h8 / dt8 / 1e6
        partial["pond_8k_mpix"] = round(pond8k_mpix, 1)
        print(f"# pond 8K: {dt8 * 1e3:.2f} ms/frame  {pond8k_mpix:.1f} Mpix/s",
              file=sys.stderr)
    mark("pond_8k")

    # strict-precision secondary: the same suite in the split-float 'f32'
    # sampler mode (<=7e-5 vs the exact gather path — the STRICT reading of
    # BASELINE's 1-ulp tolerance clause; the bf16 default is ~1.5 LSB of
    # the reference's uint8 output packing).
    suite_f32 = 0.0
    if args.quick or over():
        skipped.append("suite_f32(quick)" if args.quick else "suite_f32")
    else:
        opts_f32 = mm.RenderOptions(interpolation="bilinear",
                                    pallas_precision="f32")
        f32_mpix = []
        for path in suite:
            if over():
                skipped.append("suite_f32")
                break
            _, rf = _build(path, w, h, opts_f32)
            dt = time_tpu(rf, [img], max(8, iters // 2))
            f32_mpix.append(w * h / dt / 1e6)
            print(f"# {path} f32: {dt * 1e3:.2f} ms/frame  "
                  f"{f32_mpix[-1]:.1f} Mpix/s", file=sys.stderr)
        if len(f32_mpix) == len(suite):
            suite_f32 = float(np.mean(f32_mpix))
            partial["suite_f32_mpix"] = round(suite_f32, 1)
    mark("suite_f32")

    # strict-precision suite on UINT8 inputs — the reference's actual
    # input format (8-bit drawables): u8-sourced images ride the EXACT-u8
    # kernel path (integer bf16 pads — third split-float pass skipped,
    # window DMA halved; sample_kernel.exact_u8_eligible).
    suite_f32_u8 = 0.0
    if args.quick or over():
        skipped.append("suite_f32_u8(quick)" if args.quick
                       else "suite_f32_u8")
    else:
        opts_f32 = mm.RenderOptions(interpolation="bilinear",
                                    pallas_precision="f32")
        u8_mpix = []
        for path in suite:
            if over():
                skipped.append("suite_f32_u8")
                break
            _, rf = _build(path, w, h, opts_f32)
            dt = time_tpu(rf, [img_u8], max(8, iters // 2))
            u8_mpix.append(w * h / dt / 1e6)
            print(f"# {path} f32/u8-in: {dt * 1e3:.2f} ms/frame  "
                  f"{u8_mpix[-1]:.1f} Mpix/s", file=sys.stderr)
        if len(u8_mpix) == len(suite):
            suite_f32_u8 = float(np.mean(u8_mpix))
            partial["suite_f32_u8_mpix"] = round(suite_f32_u8, 1)
    mark("suite_f32_u8")

    # Leftover budget -> suite retries (headline hunting), now that every
    # secondary holds a measured value. Same gating as before: stop on a
    # healthy window, a stable-degraded plateau, or budget.
    for attempt in range(1, 3):
        if h_prev <= HEALTHY_MS:
            break
        if time.perf_counter() - t_start > args.budget_s * 0.75:
            print("# retry budget exhausted — keeping best suite window",
                  file=sys.stderr)
            break
        h0 = relay_health()
        # STABLE degradation (two probes within 25%) means the relay is
        # sitting at a plateau, not spiking — another attempt re-measures
        # the same window (observed: a 13-14 ms plateau ate the budget)
        if abs(h0 - h_prev) < 0.25 * h_prev:
            print(f"# relay stable-degraded ({h_prev:.1f} -> {h0:.1f} ms) — "
                  "retry would re-measure the same window; stopping",
                  file=sys.stderr)
            break
        print(f"# relay moved ({h_prev:.1f} -> {h0:.1f} ms) — suite retry "
              f"{attempt + 1}", file=sys.stderr)
        h_prev = suite_attempt()
        value = suite_value()
        if cpu_mpix and vs_ok:
            partial["vs_baseline"] = round(value / cpu_mpix, 1)

    for path, dt in zip(suite, best_dt):
        print(f"# {path}: {dt * 1e3:.2f} ms/frame  {w * h / dt / 1e6:.1f} "
              f"Mpix/s", file=sys.stderr)

    # gate derives from the FINAL best window (incl. this post-suite probe)
    # so the recorded health_ms and health_gate can never contradict
    health_ms = min(health_ms, relay_health())
    health_gate = "PASS" if health_ms <= HEALTHY_MS else "DEGRADED"
    print(f"# relay health: {health_ms:.1f} ms best window for a 16MB fenced "
          f"elementwise op (healthy <5ms) — gate {health_gate}", file=sys.stderr)

    # claim the emission slot under the lock BEFORE printing: if the
    # watchdog wins the race it prints the partial and exits; if we win,
    # its emit_partial becomes a no-op
    wd.cancel()
    with emit_lock:
        if emitted[0]:
            return  # watchdog already spoke
        emitted[0] = True
    final = {
        "metric": ("distortion_suite_quick" if args.quick
                   else "distortion_suite_4k_bilinear"),
        "value": round(value, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(value / cpu_mpix, 1) if vs_ok else 0.0,
        "c_baseline_mpix": round(cpu_mpix, 2),
        "c_threads": c_threads,
        "sustained_ripple_mpix": round(sustained, 1),
        "suite_batched_mpix": round(suite_batched, 1),
        "loop_unroll_mpix": round(loop_mpix, 1),
        "pond_8k_mpix": round(pond8k_mpix, 1),
        "suite_f32_mpix": round(suite_f32, 1),
        "suite_f32_u8_mpix": round(suite_f32_u8, 1),
        "suite_u8io_mpix": round(suite_u8io, 1),
        # skipped_phases: 0-valued secondaries were SKIPPED (budget or
        # --quick), not measured-as-zero; budget_exhausted reflects the
        # wall budget only
        "budget_exhausted": any("(quick)" not in s for s in skipped),
        "skipped_phases": skipped,
        "relay_health_ms": round(health_ms, 1),
        "health_gate": health_gate,
        "phase_times_s": phase_times,
    }
    for k in ("c_baseline_source", "c_baseline_polluted", "c_load_1min"):
        if k in partial:
            final[k] = partial[k]
    if not args.quick:
        save_record(final)
    attach_best_recorded(final)
    print(json.dumps(final))


if __name__ == "__main__":
    main()
