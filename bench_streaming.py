"""Streaming serving latency benchmark: per-chunk latency percentiles and
real-time factor for the w8a16 engine's chunked forward (process_chunk —
the continuous-batching hot path, serve/streaming.py routes through it).

Reference has no streaming at all (SURVEY.md §5); the serving north star
(BASELINE.json) asks for continuous batching of streaming audio. Each
iteration is chained through the CARRIES (chunk i+1 consumes chunk i's
state), so the device cannot overlap iterations — the natural data
dependency of streaming is also the honest-measurement chain.

Timing rules are bench.py's: device-profiler durations first (isolated
worker subprocess on TPU — a failed start_trace poisons its process),
per-iteration synced wall-clock otherwise, and every number is gated
against the HBM speed-of-light from XLA's own bytes-accessed analysis.

Output: one JSON line with per-chunk-size records:
    {"metric": "streaming_chunk_latency", "records": [
        {"chunk_frames": 64, "chunk_ms": 512, "p50_ms": ..., "p99_ms": ...,
         "rtf_per_stream": ..., "rtf_batch": ..., "source": ..., "valid": ...}
    ]}

A frame is one STFT hop = 128 samples @ 16 kHz = 8 ms of audio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (repo-root bench machinery)

FRAME_MS = 8.0          # STFT hop: 128 samples @ 16 kHz
CHUNK_FRAMES = (16, 64, 256)
# Broken-sync canary: small-chunk speed-of-light floors sit BELOW the
# per-dispatch overhead, so a non-syncing backend's dispatch timings
# would pass the per-record gate while measuring nothing. A large-chunk
# canary has a floor well above dispatch overhead; if its synced
# wall-clock lands below that floor, the backend's sync provably lies
# and every non-profiler wall-clock in the run is inadmissible
# (same proof rule as bench.summarize).
CANARY_FRAMES = 2048
BATCH = 8
#: saturated continuous-batching point (VERDICT r4 #6): >= 64 concurrent
#: streams, one engine time block per dispatch — the chip-rate record
#: that should approach the offline saturated engine (~63M frames/s)
SAT_STREAMS = 64
SAT_FRAMES = 512
SOL_MARGIN = bench.SOL_MARGIN
_REC_TAG = "STREAM_RECS "


def _percentile(durs, q):
    """Nearest-rank percentile: the ceil(q/100 * N)-th smallest value."""
    import math
    s = sorted(durs)
    i = max(0, min(len(s) - 1, math.ceil(q / 100 * len(s)) - 1))
    return s[i]


def measure_chunk(chunk_frames: int, batch: int = BATCH, d_io: int = 257,
                  iters: int = 20, use_profiler=None,
                  mxu16: bool = False, route: str = "auto") -> dict:
    """Latency record for one chunk size. Carries chain the iterations.
    ``mxu16``: the exact int8-MXU serving mode (two-plane dots) — the
    compute-bound variant whose dots run ~4x the f32 rate. ``route``:
    "xla" streams through the Pallas-free engine (kept as an A/B route;
    the round-3 belief that it was the only executable program class
    was a poisoning artifact — PERF.md round-4 root cause — and the
    measured r04 table has the Pallas route fastest)."""
    from sparsernns_tpu.utils.profiling import chip_peaks

    if use_profiler is None:
        use_profiler = os.environ.get("BENCH_WORKER") == "1"
    peaks = chip_peaks()
    engine, variables, _ = bench._build_engine(batch, chunk_frames, d_io,
                                               mxu16=mxu16, route=route)
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, chunk_frames, d_io)
        .astype(np.float32) * 0.02)
    carries0 = engine.init_stream_state(batch)

    def bench_target(w, xi, carries):
        return engine._apply_chunk(w, xi, carries, block_t=engine.block_t)

    fwd = bench._jit_for_bench(bench_target, engine.weights, x, carries0)
    _, xla_bytes = bench._xla_cost(fwd, engine.weights, x, carries0)
    # validity floor from the TRUE minimum traffic (args read + outputs
    # written once): XLA's bytes-accessed overcounts fused programs >10x
    # and would reject genuine drained timings (bench.py round-4 fix).
    # The floor is max(HBM, padded-MXU): at large chunk x batch the
    # compute bound dominates, and an HBM-only floor let a dispatch-only
    # wall-clock (0.26 ms for a 0.5 ms-compute b64 x 512f forward, an
    # impossible 124M frames/s) pass as "valid" (round-5 fix)
    from sparsernns_tpu.utils.profiling import model_padded_flops
    min_bytes = bench._min_traffic_bytes(bench_target, engine.weights, x,
                                         carries0)
    n_layers, h, p, _ = bench._model_dims(variables["params"])
    pflops = model_padded_flops(batch, chunk_frames, d_io, h, p, n_layers)
    sol_t = max(min_bytes / peaks[1], pflops / peaks[0])

    def dispatch(prev):
        carries = carries0 if prev is None else prev
        _, new_carries = fwd(engine.weights, x, carries)
        return new_carries

    durs, source = [], "wall-clock"
    if use_profiler:
        durs = bench._trace_module_times(dispatch, iters)
        if len(durs) >= 3:
            source = "device-profiler"
    if (len(durs) < 3 and not bench._REGIME["wallclock"]
            and bench._REGIME.get("readback")):
        # readback-drain channel (canary-verified): the MEAN per-chunk
        # time over a long carried chain is measurable even though
        # per-chunk percentiles are not (each sample would pay the
        # ~34 ms transport readback). p50 is reported as the mean and
        # labelled; p99 stays None.
        try:
            elapsed, n_eff = bench._run_drained(dispatch, iters, sol_t)
        except Exception as e:  # noqa: BLE001 - executor refused the
            # program (UNIMPLEMENTED on the conformance-limited tunnel):
            # compile + cost analysis succeeded, keep the cost-only
            # record instead of losing the config (bench._measure rule)
            rec = {
                "chunk_frames": chunk_frames, "mxu16": mxu16,
                "route": route,
                "chunk_ms": chunk_frames * FRAME_MS, "batch": batch,
                "p50_ms": None, "p99_ms": None, "n_timings": 0,
                "sol_ms": sol_t * 1e3, "hbm_util": 0.0,
                "rtf_per_stream": 0.0, "rtf_batch": 0.0,
                "source": "exec-refused", "valid": False,
                "exec_refused": repr(e)[:160],
            }
            print(f"[stream] chunk={chunk_frames}f: drained execution "
                  f"refused ({e}) — cost-only record "
                  f"(sol={rec['sol_ms']:.3f}ms)", file=sys.stderr)
            return rec
        t_mean = elapsed / n_eff if n_eff else 0.0
        # END-TO-END request-latency percentiles: N individually-drained
        # single chunks. Each sample = chunk compute + the transport's
        # ~34 ms readback RTT, so the ABSOLUTE numbers characterize this
        # tunnel deployment, not the chip — but the p99-p50 spread is
        # the genuine scheduling-tail signal the mean-drain channel
        # cannot see. Labeled separately from the drained p50.
        e2e = []
        try:
            from sparsernns_tpu.utils.profiling import drain_readback
            prev = None
            for _ in range(50):
                t0 = time.perf_counter()
                prev = dispatch(prev)
                drain_readback(prev)
                e2e.append(time.perf_counter() - t0)
        except Exception:  # noqa: BLE001 - percentiles are best-effort
            e2e = []
        e2e.sort()
        chunk_s = chunk_frames * FRAME_MS / 1e3
        e2e_p50 = e2e[len(e2e) // 2] * 1e3 if e2e else None
        e2e_p99 = (e2e[min(len(e2e) - 1, int(len(e2e) * 0.99))] * 1e3
                   if e2e else None)
        rec = {
            "chunk_frames": chunk_frames, "mxu16": mxu16,
            "route": route,
            "chunk_ms": chunk_frames * FRAME_MS, "batch": batch,
            "p50_ms": t_mean * 1e3, "p99_ms": None,
            "percentiles": "unavailable(readback-drain mean)",
            "e2e_p50_ms": e2e_p50,
            "e2e_p99_ms": e2e_p99,
            # the honest tail-latency number this channel CAN measure
            # (VERDICT r4 #6): p99 - p50 over per-request drained
            # samples — the fixed transport RTT cancels in the
            # difference, leaving the genuine scheduling-tail spread
            "tail_spread_ms": (round(e2e_p99 - e2e_p50, 3)
                               if e2e else None),
            "tail_provenance": ("e2e_p99 - e2e_p50 over 50 per-request "
                                "drained dispatches; transport RTT "
                                "cancels in the difference"
                                if e2e else None),
            "e2e_note": ("per-request drained samples incl. transport "
                         "readback RTT; tail spread is the scheduler "
                         "signal" if e2e else None),
            "n_timings": n_eff,
            "sol_ms": sol_t * 1e3,
            "hbm_util": xla_bytes / t_mean / peaks[1] if t_mean > 0 else 0.0,
            "rtf_per_stream": chunk_s / t_mean if t_mean > 0 else 0.0,
            "rtf_batch": batch * chunk_s / t_mean if t_mean > 0 else 0.0,
            "frames_per_sec": (batch * chunk_frames / t_mean
                               if t_mean > 0 else 0.0),
            "source": "readback-drain",
            "valid": t_mean >= SOL_MARGIN * sol_t,
        }
        print(f"[stream] chunk={chunk_frames}f{' mxu16' if mxu16 else ''} "
              f"({rec['chunk_ms']:.0f}ms) mean={rec['p50_ms']:.3f}ms "
              f"sol={rec['sol_ms']:.3f}ms "
              f"rtf/stream={rec['rtf_per_stream']:.1f} "
              f"(readback-drain, valid={rec['valid']})", file=sys.stderr)
        return rec
    if len(durs) < 3 and not bench._REGIME["wallclock"]:
        # canary-proven untimeable backend (unbounded queue, no-op sync):
        # a wall-clock here is a backlog artifact that may land ABOVE the
        # floor, so don't produce one at all — cost-only record.
        rec = {
            "chunk_frames": chunk_frames, "mxu16": mxu16,
            "route": route,
            "chunk_ms": chunk_frames * FRAME_MS, "batch": batch,
            "p50_ms": None, "p99_ms": None, "n_timings": 0,
            "sol_ms": sol_t * 1e3, "hbm_util": 0.0,
            "rtf_per_stream": 0.0, "rtf_batch": 0.0,
            "source": "untimeable-backend", "valid": False,
        }
        print(f"[stream] chunk={chunk_frames}f: untimeable backend — "
              f"cost-only record (sol={rec['sol_ms']:.3f}ms)",
              file=sys.stderr)
        return rec
    if len(durs) < 3:
        out = dispatch(None)   # compile + warm
        bench._sync(out)
        prev, durs, synced = None, [], True
        for _ in range(iters):
            t0 = time.perf_counter()
            prev = dispatch(prev)
            synced = bench._sync(prev) and synced
            durs.append(time.perf_counter() - t0)
        if not synced:
            source = "wall-clock-unsynced"

    p50 = _percentile(durs, 50)
    chunk_s = chunk_frames * FRAME_MS / 1e3
    rec = {
        "chunk_frames": chunk_frames,
        "mxu16": mxu16,
        "route": route,
        "chunk_ms": chunk_frames * FRAME_MS,
        "batch": batch,
        "p50_ms": p50 * 1e3,
        "p99_ms": _percentile(durs, 99) * 1e3,
        "n_timings": len(durs),
        "sol_ms": sol_t * 1e3,
        "hbm_util": xla_bytes / p50 / peaks[1] if p50 > 0 else 0.0,
        # real-time factor: seconds of audio per second of compute
        "rtf_per_stream": chunk_s / p50 if p50 > 0 else 0.0,
        "rtf_batch": batch * chunk_s / p50 if p50 > 0 else 0.0,
        "frames_per_sec": batch * chunk_frames / p50 if p50 > 0 else 0.0,
        "source": source,
        "valid": (source != "wall-clock-unsynced"
                  and p50 >= SOL_MARGIN * sol_t),
    }
    print(f"[stream] chunk={chunk_frames}f{' mxu16' if mxu16 else ''} "
          f"({rec['chunk_ms']:.0f}ms) "
          f"p50={rec['p50_ms']:.3f}ms p99={rec['p99_ms']:.3f}ms "
          f"sol={rec['sol_ms']:.3f}ms rtf/stream={rec['rtf_per_stream']:.1f} "
          f"({source}, valid={rec['valid']})", file=sys.stderr)
    return rec


def _todo(chunks=CHUNK_FRAMES, canary=True) -> list:
    todo = [(cf, False, "auto", BATCH) for cf in chunks]
    # one mxu16 latency point at the middle chunk size (the int-dot
    # serving mode; full sweep would double the run for little signal),
    # and one xla-route point (the conformance-fallback streaming path)
    if len(chunks) >= 2:
        todo.append((chunks[1], True, "auto", BATCH))
        todo.append((chunks[1], False, "xla", BATCH))
    # saturated continuous batching: SAT_STREAMS concurrent streams at
    # one engine time block per dispatch (VERDICT r4 #6 'Done' point)
    todo.append((SAT_FRAMES, False, "auto", SAT_STREAMS))
    if canary:
        # canary at SAT_STREAMS so its padded-MXU floor (~1 ms) clearly
        # exceeds the ~0.25 ms dispatch overhead — a dispatch-only
        # wall-clock then PROVES broken sync instead of slipping under a
        # small-chunk floor (round-5 fix)
        todo.append((CANARY_FRAMES, False, "auto", SAT_STREAMS))
    return todo


def run_all(chunks=CHUNK_FRAMES, canary=True) -> list:
    recs = []
    for cf, mxu16, route, batch in _todo(chunks, canary):
        try:
            with bench._alarm(bench.BENCH_MODE_TIMEOUT_S):
                rec = measure_chunk(cf, batch=batch, mxu16=mxu16,
                                    route=route)
                rec["canary"] = cf == CANARY_FRAMES and cf not in chunks
                recs.append(rec)
        except Exception as e:  # noqa: BLE001 - keep per-chunk robustness
            print(f"[stream] chunk={cf} failed: {e}", file=sys.stderr)
    return recs


#: config -> backend-conformance probe stage exercising the same program
#: class (bench._MODE_PROBE_STAGE's rule, specialized to streaming)
def _probe_stage(mxu16: bool, route: str) -> str:
    if mxu16:
        return "s8_dot"           # op-level exec wedge; relay-independent
    if bench._relay_enabled():
        return "engine_relay_tiny"
    if route == "xla":
        return "engine_xla_tiny"
    return "pallas_diag_scan"


def _recs_from_drain_workers(emit=None, probe_table=None,
                             budget_fn=None) -> list:
    """Drain-regime streaming loop: ONE config per kill-on-timeout
    subprocess (bench's rule — a wedge inside the C transport cannot be
    interrupted in-process), ordered probe-ok first, sized to the wall
    budget, with ``emit(recs)`` after every record so the last stdout
    line is always complete (VERDICT r3 #4/#1)."""
    if probe_table is None:
        probe_table = bench._load_json(bench._PROBE_TABLE_PATH)
    if budget_fn is None:
        budget_fn = bench._budget_left
    rank = {"ok": 0, None: 1, "error": 2, "hang": 3}

    def status(cfg):
        rec = probe_table.get(_probe_stage(cfg[1], cfg[2]))
        return rec.get("status") if isinstance(rec, dict) else None

    todo = sorted(_todo(), key=lambda c: rank.get(status(c), 1))
    env = dict(os.environ)
    env["BENCH_REGIME"] = json.dumps(bench._REGIME)
    recs: list = []
    for cf, mxu16, route, batch in todo:
        if status((cf, mxu16, route, batch)) == "hang" \
                and not os.environ.get("BENCH_RUN_WEDGERS"):
            print(f"[stream] chunk={cf} mxu16={mxu16} route={route}: "
                  "SKIPPED — probe recorded a device wedge for its "
                  "program class", file=sys.stderr)
            continue
        left = budget_fn()
        if left < bench.BENCH_MIN_MODE_S:
            print(f"[stream] wall budget nearly spent ({left:.0f}s) — "
                  "stopping", file=sys.stderr)
            break
        timeout = min(bench.BENCH_MODE_TIMEOUT_S,
                      max(bench.BENCH_MIN_MODE_S, left - 20))
        env["STREAM_DRAIN_ONLY"] = json.dumps([cf, mxu16, route, batch])
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"[stream] worker chunk={cf} timed out ({timeout:.0f}s)",
                  file=sys.stderr)
            if budget_fn() < bench.BENCH_MIN_MODE_S:
                break
            if not bench._probe_device_exec():
                print("[stream] device wedged — stopping", file=sys.stderr)
                break
            continue
        sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            if line.startswith(_REC_TAG):
                try:
                    got = json.loads(line[len(_REC_TAG):])
                    recs.extend(got if isinstance(got, list) else [got])
                    if emit is not None:
                        emit(recs)
                except json.JSONDecodeError:
                    pass
    return recs


def _recs_from_worker() -> list:
    env = dict(os.environ)
    env["BENCH_WORKER"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        print("[stream] profiler worker timed out", file=sys.stderr)
        return []
    sys.stderr.write(proc.stderr[-4000:])
    for line in proc.stdout.splitlines():
        if line.startswith(_REC_TAG):
            try:
                return json.loads(line[len(_REC_TAG):])
            except json.JSONDecodeError:
                break
    print(f"[stream] worker produced no records (rc={proc.returncode})",
          file=sys.stderr)
    return []


def summarize_stream(recs: list, backend: str) -> dict:
    # Broken-sync proof (bench.summarize's rule): any synced wall-clock
    # below its speed-of-light floor means the backend's sync lies, so
    # every plain wall-clock in the run measured dispatch, not
    # execution — only device-profiler records stay admissible.
    broken_sync = any(r["source"] == "wall-clock" and not r["valid"]
                      for r in recs)
    if broken_sync:
        print("[stream] backend sync proven broken (canary below its HBM "
              "floor) — wall-clock latencies are dispatch-only, rejected",
              file=sys.stderr)
    # A drained record below the floor proves the readback channel lies
    # (bench.summarize's broken_drain rule).
    broken_drain = any(r["source"] == "readback-drain" and not r["valid"]
                       for r in recs)
    if broken_drain:
        print("[stream] readback-drain channel proven broken — drained "
              "records inadmissible", file=sys.stderr)
    latency = [r for r in recs if not r.get("canary")]
    valid = [r for r in latency if r["valid"]
             and not (r["source"] == "readback-drain" and broken_drain)
             and (not broken_sync
                  or r["source"] in ("device-profiler", "readback-drain"))]
    summary = {
        "metric": "streaming_chunk_latency",
        "backend": backend,
        "broken_sync": broken_sync,
        "records": sorted(latency, key=lambda r: r["chunk_frames"]),
        "timing_valid": bool(valid),
    }
    if valid:
        best = min(valid, key=lambda r: r["p50_ms"])
        summary["best_p50_ms"] = round(best["p50_ms"], 3)
        summary["best_chunk_frames"] = best["chunk_frames"]
        # saturated continuous-batching chip rate (VERDICT r4 #6): best
        # streaming frames/s across valid records, with its config
        rates = [(r.get("frames_per_sec") or
                  (r["batch"] * r["chunk_frames"] / (r["p50_ms"] / 1e3)
                   if r.get("p50_ms") else 0.0), r) for r in valid]
        fr, rbest = max(rates, key=lambda t: t[0])
        if fr > 0:
            summary["max_stream_frames_per_sec"] = round(fr, 0)
            summary["max_stream_config"] = {
                "streams": rbest["batch"],
                "chunk_frames": rbest["chunk_frames"],
                "mxu16": rbest.get("mxu16", False),
                "route": rbest.get("route", "auto")}
        tails = [r["tail_spread_ms"] for r in valid
                 if r.get("tail_spread_ms") is not None]
        if tails:
            summary["tail_spread_ms"] = max(tails)
            summary["tail_provenance"] = next(
                r["tail_provenance"] for r in valid
                if r.get("tail_spread_ms") is not None)
    elif latency:
        # cost-model floor for the smallest chunk, clearly labelled
        r0 = min(latency, key=lambda r: r["chunk_frames"])
        summary["hbm_bound_p50_ms"] = round(r0["sol_ms"], 3)
        summary["measurement"] = "hbm-bound-cost-model"
    return summary


def _emit(summary: dict, partial: bool = True):
    """bench._emit's rule for the streaming line: print the current-best
    summary NOW (and mirror to runs/stream_last.json) so a driver kill
    at any point leaves the last stdout line parseable."""
    out = dict(summary)
    out["partial"] = bool(partial)
    print(json.dumps(out), flush=True)
    try:
        os.makedirs(os.path.join(bench._REPO_DIR, "runs"), exist_ok=True)
        with open(os.path.join(bench._REPO_DIR, "runs",
                               "stream_last.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass


def main() -> int:
    backend = jax.default_backend()
    is_worker = (os.environ.get("BENCH_WORKER") == "1"
                 or bool(os.environ.get("STREAM_DRAIN_ONLY")))
    env_regime = os.environ.get("BENCH_REGIME")
    if env_regime:
        try:
            bench._REGIME.update(json.loads(env_regime))
        except json.JSONDecodeError:
            env_regime = None
    if backend == "tpu" and not env_regime:
        from sparsernns_tpu.utils.profiling import chip_peaks
        canary_budget = bench.BENCH_MODE_TIMEOUT_S
        if not is_worker:
            canary_budget = int(min(bench.BENCH_MODE_TIMEOUT_S,
                                    max(90.0, bench._budget_left() * 0.5)))
        try:
            with bench._alarm(canary_budget):
                bench._REGIME.update(bench._canary_check(chip_peaks()))
        except Exception as e:  # noqa: BLE001 - canary must not kill bench
            print(f"[stream] canary failed ({e}); keeping wall-clock",
                  file=sys.stderr)
    drain_only = os.environ.get("STREAM_DRAIN_ONLY")
    if drain_only:
        parsed = json.loads(drain_only)
        cf, mxu16, route = parsed[:3]
        batch = parsed[3] if len(parsed) > 3 else BATCH
        rec = measure_chunk(cf, batch=batch, mxu16=mxu16, route=route)
        rec["canary"] = cf == CANARY_FRAMES and cf not in CHUNK_FRAMES
        print(_REC_TAG + json.dumps([rec]))
        return 0
    if os.environ.get("BENCH_WORKER") == "1":
        print(_REC_TAG + json.dumps(run_all()))
        return 0

    # first parseable line lands before any measurement
    _emit(summarize_stream([], backend))

    recs = []
    drain_regime = (bench._REGIME.get("readback")
                    and not bench._REGIME["wallclock"])
    if backend == "tpu" and not drain_regime:
        # keep only the worker's PROFILED records: its wall-clocks are
        # re-measured here so the canary proof always runs alongside them
        recs = [r for r in _recs_from_worker()
                if r.get("valid") and r["source"] == "device-profiler"]
    elif drain_regime:
        # drain channel verified; per-config kill-on-timeout workers
        # (the profiler worker's start_trace crash wedges the tunnel)
        print("[stream] drain regime: per-config drain workers",
              file=sys.stderr)
        recs = _recs_from_drain_workers(
            emit=lambda rs: _emit(summarize_stream(rs, backend)))
        _emit(summarize_stream(recs, backend), partial=False)
        return 0
    have = {r["chunk_frames"] for r in recs}
    missing = [c for c in CHUNK_FRAMES if c not in have]
    if missing:
        if recs:
            _emit(summarize_stream(recs, backend))
        recs.extend(run_all(missing))

    _emit(summarize_stream(recs, backend), partial=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
