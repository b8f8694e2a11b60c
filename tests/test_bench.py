"""Benchmark self-validation: the speed-of-light gate and the cost model.

VERDICT.md round-1 item 1: BENCH_r01 reported 488.8M frames/s — 13x over
the HBM-bandwidth bound — because the tunnel backend's block_until_ready
does not synchronize and nothing in the bench noticed. These tests pin the
property that bench.py now REJECTS physically-impossible wall-clocks and
falls back to a clearly-labelled cost-model bound.
"""

import sys

import pytest

sys.path.insert(0, ".")  # repo root for bench.py

import bench  # noqa: E402
from sparsernns_tpu.utils.profiling import (S5Cost, chip_peaks,  # noqa: E402
                                            model_forward_flops)

PEAKS = (197e12, 819e9)  # v5e


def _rec(name, t_iter_s, xla_bytes, frames=8 * 3751, synced=True,
         flops=1e10):
    elapsed = t_iter_s
    return bench._finalize(name, elapsed, synced, 1, frames, flops,
                           xla_bytes, PEAKS)


def test_impossible_timing_rejected():
    # 61us for 0.65 GB of traffic => ~13x over the 820 GB/s bound
    rec = _rec("engine", 61e-6, 6.5e8)
    assert not rec["valid"]


def test_plausible_timing_accepted():
    # 1.0 ms for 0.65 GB => ~0.79 HBM utilization: physically fine
    rec = _rec("engine", 1.0e-3, 6.5e8)
    assert rec["valid"]
    assert 0.5 < rec["hbm_util"] < 1.0


def test_unsynced_timing_rejected_even_if_plausible():
    rec = _rec("engine", 1.0e-3, 6.5e8, synced=False)
    assert not rec["valid"]


def test_summary_prefers_valid_wallclock():
    recs = {
        "associative": _rec("associative", 5.0e-3, 3.5e9),
        "fused": _rec("fused", 1.2e-3, 8.6e8),
    }
    s = bench.summarize(recs, PEAKS)
    assert s["timing_valid"] and s["measurement"] == "wall-clock"
    assert s["best_config"] == "fused"
    assert s["vs_baseline"] == pytest.approx(5.0 / 1.2, rel=0.01)
    assert s["value"] <= recs["fused"]["sol_frames_per_sec"]


def test_summary_cached_never_outranks_fresh():
    """Budget-cut reheat: a cached measured record may provide the
    baseline and the train-step number (labeled), but the headline
    best_config must come from a FRESH measurement when one exists."""
    recs = {
        # fresh, slower
        "fused": _rec("fused", 2.0e-3, 8.6e8),
        # cached, faster — must NOT become best_config
        "w8a16-engine": dict(_rec("w8a16-engine", 1.0e-3, 8.6e8),
                             cached=True),
        "associative": dict(_rec("associative", 5.0e-3, 3.5e9),
                            cached=True),
        "train-step": dict(_rec("train-step", 6.0e-3, 4.2e9),
                           cached=True),
    }
    s = bench.summarize(recs, PEAKS)
    assert s["best_config"] == "fused"
    assert "(cached)" not in s["measurement"]
    # cached associative still anchors the ratio, labeled
    assert s["vs_baseline"] == pytest.approx(5.0 / 2.0, rel=0.01)
    assert s["baseline_cached"] is True
    # cached train-step still reported, labeled
    assert s["train_step_frames_per_sec"] is not None
    assert s["train_step_cached"] is True
    # with NO fresh valid record, the cached one may lead — labeled
    s2 = bench.summarize({k: v for k, v in recs.items() if k != "fused"},
                         PEAKS)
    assert s2["best_config"] == "w8a16-engine"
    assert "(cached)" in s2["measurement"]


def test_summary_falls_back_to_cost_model():
    # dispatch-only timings: everything invalid
    recs = {
        "associative": _rec("associative", 80e-6, 3.5e9),
        "w8a16-engine": _rec("w8a16-engine", 61e-6, 6.5e8),
    }
    s = bench.summarize(recs, PEAKS)
    assert not s["timing_valid"]
    assert s["measurement"] == "roofline-cost-model"
    # the reported value is the HBM bound for the best (fewest-bytes)
    # config — ~38M frames/s for the engine at 0.65 GB/forward — and the
    # ratio is the bytes ratio vs the associative baseline
    assert s["value"] == pytest.approx(8 * 3751 / (6.5e8 / 819e9), rel=0.01)
    assert s["value"] < 40e6
    assert s["vs_baseline"] == pytest.approx(3.5e9 / 6.5e8, rel=0.01)


def test_summary_never_reports_above_sol():
    """Whatever the inputs, the reported value must not exceed the bound
    computed from the same record's bytes."""
    for t in (10e-6, 100e-6, 1e-3, 10e-3):
        recs = {"associative": _rec("associative", t, 3.5e9),
                "fused": _rec("fused", t / 2, 8.6e8)}
        s = bench.summarize(recs, PEAKS)
        best = recs[s["best_config"]]
        assert s["value"] <= best["sol_frames_per_sec"] * 1.01


def test_mxu_floor_rejects_when_compute_bound():
    """The whole-network kernel pushed HBM traffic (~80 MB/forward) below
    the padded-MXU compute time — a timing that beats the compute floor
    must now be rejected even though it clears the HBM floor."""
    from sparsernns_tpu.utils.profiling import model_padded_flops
    pf = model_padded_flops(8, 3751, 257, 192, 128, 3)
    sol_mxu = pf / PEAKS[0]
    sol_hbm = 8e7 / PEAKS[1]
    assert sol_mxu > sol_hbm          # the premise: compute-bound config
    rec = bench._finalize("net", 0.5 * sol_mxu, True, 1, 8 * 3751,
                          1e10, 8e7, PEAKS, padded_flops=pf)
    assert not rec["valid"] and rec["floor"] == "mxu"
    ok = bench._finalize("net", 2.0 * sol_mxu, True, 1, 8 * 3751,
                         1e10, 8e7, PEAKS, padded_flops=pf)
    assert ok["valid"]
    # the cost-model fallback value is capped by the SAME combined floor
    assert ok["sol_frames_per_sec"] == pytest.approx(
        8 * 3751 / sol_mxu, rel=0.01)


def test_model_forward_flops_flagship_scale():
    # flagship: B=8 L=3751 d_io=257 H=192 P=128 n=3 — ~30.5 GFLOP forward,
    # matching XLA's own count for the associative path (3.09e10, PERF.md)
    f = model_forward_flops(8, 3751, 257, 192, 128, 3)
    assert 2.5e10 < f < 3.5e10


def test_chip_peaks_has_defaults():
    flops, bw = chip_peaks()
    assert flops > 1e13 and bw > 1e11


def test_s5cost_speed_of_light_positive():
    c = S5Cost.forward(8, 3751, 192, 128)
    assert c.speed_of_light_us() > 0


def test_broken_sync_backend_distrusts_plain_wallclocks():
    """Once any mode times below the speed of light (proof the backend's
    sync lies), a slow-dispatch mode that happens to pass the gate must
    NOT be reported as a wall-clock measurement."""
    recs = {
        # plain associative: slow per-dispatch overhead, passes the gate
        "associative": _rec("associative", 45e-3, 3.5e9),
        # engine: dispatch-only, impossible => proves sync is broken
        "w8a16-engine": _rec("w8a16-engine", 61e-6, 6.5e8),
    }
    s = bench.summarize(recs, PEAKS)
    assert s["measurement"] == "roofline-cost-model"
    assert not s["timing_valid"]
    # bytes-ratio baseline, engine bound value
    assert s["vs_baseline"] == pytest.approx(3.5e9 / 6.5e8, rel=0.01)


def test_broken_sync_backend_accepts_profiler_timing():
    """Device-profiler timings come from the runtime's own device track,
    not host sync — they stay admissible (and preferred) on a
    proven-broken backend."""
    prof = bench._finalize("fused (profiler)", 1.2e-3, True, 1, 8 * 3751,
                           1e10, 8.6e8, PEAKS, profiled=True)
    assert prof["valid"] and prof["profiled"]
    recs = {
        "associative": _rec("associative", 80e-6, 3.5e9),  # broken proof
        "fused": prof,
    }
    s = bench.summarize(recs, PEAKS)
    assert s["measurement"] == "device-profiler"
    assert s["best_config"] == "fused"
    assert s["timing_valid"]
    assert s["value"] == pytest.approx(8 * 3751 / 1.2e-3, rel=0.01)
    # baseline = associative HBM bound (its own wall-clock is inadmissible)
    assert s["vs_baseline"] == pytest.approx(
        s["value"] / recs["associative"]["sol_frames_per_sec"], rel=0.01)


def test_broken_sync_suppresses_unprofiled_train_step():
    """A train-step wall-clock that passed the gate only because dispatch
    overhead exceeds its SoL floor must not be reported once the
    backend's sync is proven broken; a profiled one must be."""
    base = {
        "associative": _rec("associative", 80e-6, 3.5e9),  # broken proof
        "fused": bench._finalize("fused (profiler)", 1.2e-3, True, 1,
                                 8 * 3751, 1e10, 8.6e8, PEAKS,
                                 profiled=True),
    }
    wall = dict(base, **{"train-step": _rec("train-step", 45e-3, 9e9)})
    assert bench.summarize(wall, PEAKS)["train_step_frames_per_sec"] is None
    prof = dict(base, **{"train-step": bench._finalize(
        "train-step (profiler)", 12e-3, True, 1, 8 * 3751, 9e10, 9e9,
        PEAKS, profiled=True)})
    s = bench.summarize(prof, PEAKS)
    assert s["train_step_frames_per_sec"] == pytest.approx(
        8 * 3751 / 12e-3, rel=0.01)


def test_module_durs_from_trace_parsing():
    """The Chrome-trace parser keys on the 'XLA Modules' device track and
    the target-module name match, ignoring host threads and other ops."""
    trace = {"traceEvents": [
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 2,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 3,
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 9,
         "args": {"name": "python"}},
        # two real executions of the target module (dur in microseconds)
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_bench_target(123)",
         "dur": 102.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_bench_target(123)",
         "dur": 98.0},
        # other module on the device track: ignored
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_add(456)", "dur": 50.0},
        # target name on a NON-module track (op-level event): ignored
        {"ph": "X", "pid": 3, "tid": 3, "name": "bench_target_fusion",
         "dur": 40.0},
        # host-thread event with a matching name: ignored
        {"ph": "X", "pid": 1, "tid": 9, "name": "bench_target", "dur": 9.9},
    ]}
    durs = bench._module_durs_from_trace(trace, "bench_target")
    assert durs == pytest.approx([102.0e-6, 98.0e-6])
    assert bench._module_durs_from_trace({}, "bench_target") == []


def test_broken_sync_backend_accepts_saturated_wallclock():
    """Saturated-queue timings are paced by the allocator, not by sync —
    they stay admissible on a proven-broken backend."""
    sat = bench._finalize("fused (saturated)", 20e-3, True, 1, 8 * 3751,
                          1e10, 8.6e8, PEAKS, saturated=True)
    assert sat["valid"] and sat["saturated"]
    recs = {
        "associative": _rec("associative", 80e-6, 3.5e9),  # broken proof
        "fused": sat,
    }
    s = bench.summarize(recs, PEAKS)
    assert s["measurement"] == "wall-clock"
    assert s["best_config"] == "fused"
    # baseline falls back to the associative HBM bound (conservative)
    assert s["value"] == pytest.approx(8 * 3751 / 20e-3, rel=0.01)


def test_custom_call_bytes_from_hlo():
    """XLA cost_analysis counts Pallas custom-calls as ZERO bytes; the
    HLO-text accounting must add operand (from operand_layout_constraints)
    + result bytes so the speed-of-light floor covers kernel I/O.
    Measured on-TPU: an isolated pallas_diag_scan moving ~8.95 MB reported
    0.29 MB before this fix."""
    from sparsernns_tpu.utils.profiling import custom_call_bytes_from_hlo

    line = (
        '  ROOT %pallas_diag_scan.1 = (f32[8,512,128]{2,1,0:T(8,128)}, '
        'f32[8,512,128]{2,1,0:T(8,128)}) custom-call(%c.1, %d.1, '
        '%concatenate.0, /*index=3*/%get-tuple-element.5), '
        'custom_call_target="tpu_custom_call", '
        'operand_layout_constraints={f32[8,512,128]{2,1,0}, '
        'f32[8,512,128]{2,1,0}, bf16[8,128]{1,0}, s8[256,128]{1,0}}, '
        'frontend_attributes={kernel_metadata={}}, '
        'metadata={op_name="pallas_call" source_line=278}, '
        'backend_config={"custom_call_config":{"body":"f32[9,9]bogus"}}'
    )
    got = custom_call_bytes_from_hlo("before\n" + line + "\nafter")
    f32 = 8 * 512 * 128 * 4
    expect = 2 * f32 + 2 * f32 + 8 * 128 * 2 + 256 * 128 * 1
    assert got == expect

    # non-Pallas custom-calls and plain ops contribute nothing
    other = ('%x = f32[64]{0} custom-call(%y), '
             'custom_call_target="Sharding"')
    assert custom_call_bytes_from_hlo(other) == 0.0
    assert custom_call_bytes_from_hlo("%a = f32[4096]{0} add(%b, %c)") == 0.0


def test_no_backend_summary_is_labelled_and_physical():
    """If the transport never initializes, bench emits the analytic
    roofline labelled backend-unavailable — never a hang, never an
    impossible number."""
    import bench
    from sparsernns_tpu.utils.profiling import DEFAULT_PEAKS

    s = bench._no_backend_summary("RuntimeError: tunnel hung")
    assert s["measurement"] == "roofline-cost-model(backend-unavailable)"
    assert not s["timing_valid"]
    assert 0 < s["value"]
    # at most the HBM bound of the network kernel's own bytes
    peak_flops, hbm_bw = DEFAULT_PEAKS
    b, l, d_io = 8, 3751, 257
    hbm_bound = b * l / (2.0 * b * l * d_io * 4 / hbm_bw)
    assert s["value"] <= hbm_bound
    assert 0 < s["vs_baseline"] < 100


def test_untimeable_regime_emits_cost_only_records(monkeypatch):
    """Round-2 tunnel regime: unbounded queue, no-op sync, lying
    is_ready, no allocator backpressure — wall-clocks are backlog
    artifacts that can land ABOVE the floor, so the per-record gate
    alone cannot reject them. When the canary proves the regime,
    _measure must not report a wall-clock at all."""
    monkeypatch.setitem(bench._REGIME, "wallclock", False)
    monkeypatch.setitem(bench._REGIME, "saturation", False)
    calls = []

    def dispatch(prev):
        calls.append(1)
        return prev

    rec = bench._measure("engine", dispatch, 10, 8 * 3751, 1e10, 6.5e8,
                         PEAKS, use_profiler=False)
    assert rec.get("untimeable") and not rec["valid"]
    assert rec["frames_per_sec"] == 0.0
    assert not calls  # no dispatches burned on an untimeable backend
    # saturated retries equally inadmissible
    rec2 = bench._measure("engine", dispatch, 10, 8 * 3751, 1e10, 6.5e8,
                          PEAKS, reserve_gb=1.0, use_profiler=False)
    assert rec2.get("untimeable") and not rec2["valid"]


def test_untimeable_records_fall_back_to_roofline(monkeypatch):
    monkeypatch.setitem(bench._REGIME, "wallclock", False)
    monkeypatch.setitem(bench._REGIME, "saturation", False)

    def dispatch(prev):
        return prev

    recs = {
        "associative": bench._measure("associative", dispatch, 10, 8 * 3751,
                                      1e10, 3.5e9, PEAKS,
                                      use_profiler=False),
        "w8a16-engine": bench._measure("w8a16-engine", dispatch, 10,
                                       8 * 3751, 1e10, 8.0e7, PEAKS,
                                       use_profiler=False,
                                       padded_flops=4.33e10),
    }
    s = bench.summarize(recs, PEAKS)
    assert not s["timing_valid"]
    assert s["measurement"] == "roofline-cost-model"
    assert s["best_config"] == "w8a16-engine"
    # the reported value is the roofline bound, never an artifact
    assert s["value"] == pytest.approx(
        recs["w8a16-engine"]["sol_frames_per_sec"], rel=1e-6)


def _drained_rec(name, t_iter_s, xla_bytes, frames=8 * 3751, flops=1e10):
    return bench._finalize(name + " (readback-drain)", t_iter_s, True, 1,
                           frames, flops, xla_bytes, PEAKS, drained=True)


def test_drain_mode_times_on_untimeable_wallclock(monkeypatch):
    """Round-3 tunnel regime: dispatch timing is fake but a 1-element
    readback blocks on real completion (canary-verified slope ~98% of
    the matmul MXU floor). With the readback regime proven, _measure
    must time via _run_drained and mark the record drained."""
    monkeypatch.setitem(bench._REGIME, "wallclock", False)
    monkeypatch.setitem(bench._REGIME, "saturation", False)
    monkeypatch.setitem(bench._REGIME, "readback", True)
    # fake drain: pretend each iteration took 1.0 ms of device time
    monkeypatch.setattr(bench, "_run_drained",
                        lambda dispatch, iters, sol_t=0.0: (1.0e-3 * 9, 9))
    rec = bench._measure("engine", lambda prev: prev, 10, 8 * 3751, 1e10,
                         6.5e8, PEAKS, use_profiler=False)
    assert rec["drained"] and rec["valid"]
    assert rec["t_iter_ms"] == pytest.approx(1.0, rel=1e-6)


def test_drain_exec_refusal_keeps_cost_only_record(monkeypatch):
    """Round-3 tunnel: the executor REFUSES compiled model programs
    (UNIMPLEMENTED) while the drain channel itself is verified. The mode
    must survive as a cost-only record (valid=False, floors populated,
    exec_refused tagged) so summarize() reports the labelled roofline
    table instead of dropping the config entirely."""
    monkeypatch.setitem(bench._REGIME, "wallclock", False)
    monkeypatch.setitem(bench._REGIME, "saturation", False)
    monkeypatch.setitem(bench._REGIME, "readback", True)

    def refuse(dispatch, iters, sol_t=0.0):
        raise RuntimeError("UNIMPLEMENTED: TPU backend error")

    monkeypatch.setattr(bench, "_run_drained", refuse)
    rec = bench._measure("engine", lambda prev: prev, 10, 8 * 3751, 1e10,
                         6.5e8, PEAKS, use_profiler=False)
    assert not rec["valid"] and not rec["drained"]
    assert "UNIMPLEMENTED" in rec["exec_refused"]
    assert rec["sol_frames_per_sec"] > 0
    summary = bench.summarize({"engine": rec}, PEAKS)
    assert summary["timing_valid"] is False
    assert summary["measurement"] == "roofline-cost-model"
    assert summary["value"] == pytest.approx(rec["sol_frames_per_sec"],
                                             rel=1e-3)


def test_broken_sync_backend_accepts_drained_timing():
    """A valid drained record survives the broken-sync proof (the drain
    channel does not depend on the lying sync primitives)."""
    recs = {
        # synced-but-impossible wall-clock proves sync is broken
        "associative": _rec("associative", 80e-6, 3.5e9),
        "w8a16-engine": _drained_rec("w8a16-engine", 1.0e-3, 6.5e8),
    }
    s = bench.summarize(recs, PEAKS)
    assert s["timing_valid"]
    assert s["measurement"] == "readback-drain"
    assert s["best_config"] == "w8a16-engine"


def test_broken_drain_channel_drops_all_drained_records():
    """One drained record below the speed of light proves the readback
    returned before execution finished — every drained record becomes
    inadmissible, and the summary falls back to the roofline."""
    recs = {
        "associative": _drained_rec("associative", 10e-6, 3.5e9),  # impossible
        "w8a16-engine": _drained_rec("w8a16-engine", 1.0e-3, 6.5e8),
    }
    s = bench.summarize(recs, PEAKS)
    assert not s["timing_valid"]
    assert s["measurement"] == "roofline-cost-model"


def test_run_all_modes_only_filter(monkeypatch):
    """Drain workers measure ONE mode per subprocess: the only= filter
    must skip every other mode's build (a skipped build is a skipped
    dispatch — exactly the isolation the wedge-prone tunnel needs)."""
    calls = []
    monkeypatch.setattr(bench, "bench_mode",
                        lambda mode, peaks, **kw: calls.append(mode) or
                        {"name": mode, "valid": True})
    monkeypatch.setattr(bench, "bench_w8a16_engine",
                        lambda peaks, name="w8a16-engine", **kw:
                        calls.append(name) or {"name": name, "valid": True})
    monkeypatch.setattr(bench, "bench_train_step",
                        lambda peaks, name="train-step", **kw:
                        calls.append(name) or {"name": name, "valid": True})
    recs = bench.run_all_modes(PEAKS, only=["w8a16-engine-mxu16"])
    assert calls == ["w8a16-engine-mxu16"]
    assert list(recs) == ["w8a16-engine-mxu16"]
    calls.clear()
    recs = bench.run_all_modes(PEAKS, only=["associative", "train-step"])
    assert calls == ["associative", "train-step"]


def test_drain_workers_merge_and_stop_on_wedge(monkeypatch, tmp_path):
    """Per-mode drain-worker orchestration: records merge across worker
    subprocesses (valid AND invalid — summarize needs both), a timed-out
    worker is skipped, and once the health probe says the device is
    wedged the loop stops — keeping everything measured before the
    wedge. Mode order puts the engines first and associative last."""
    import subprocess

    seen = []
    monkeypatch.setattr(bench, "_RECS_CACHE_PATH",
                        str(tmp_path / "cache.json"))

    class _Proc:
        def __init__(self, name):
            self.stdout = ("BENCH_RECS " + __import__("json").dumps(
                {name: {"name": name, "valid": name != "fused"}}) + "\n")
            self.stderr = ""
            self.returncode = 0

    def fake_run(argv, env=None, timeout=None, **kw):
        name = env["BENCH_DRAIN_ONLY"]
        seen.append(name)
        if name == "pallas":  # this worker hangs: device survives
            raise subprocess.TimeoutExpired(argv, timeout)
        if name == "train-step":  # this one wedges the device
            raise subprocess.TimeoutExpired(argv, timeout)
        return _Proc(name)

    health = iter([True, False])  # pallas: survived; train-step: wedged
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_probe_device_exec",
                        lambda timeout_s=240: next(health))
    recs = bench._recs_from_drain_workers(probe_table={},
                                          budget_fn=lambda: 1e9)
    # ordered: the headline engine family first (r04 measured ranking),
    # then floats; train-step's timeout leaves the device healthy (the
    # loop continues), pallas's timeout confirms a wedge (the loop
    # stops) — nothing after the wedge ran at all
    assert seen == ["w8a16-engine-b32", "w8a16-engine",
                    "w8a16-engine-bf16io", "w8a16-engine-mxu16",
                    "w8a16-engine-xla", "blocked", "train-step",
                    "train-step-bf16s", "fused", "pallas"]
    assert "associative" not in recs and "train-step" not in recs
    assert "pallas" not in recs
    assert set(recs) == {"w8a16-engine-b32", "w8a16-engine",
                         "w8a16-engine-bf16io", "w8a16-engine-mxu16",
                         "w8a16-engine-xla", "blocked",
                         "train-step-bf16s", "fused"}
    assert not recs["fused"]["valid"]  # invalid records still merged


def test_drain_workers_probe_conviction_and_budget(monkeypatch, tmp_path):
    """Round-4 budget honesty: (a) a probe-"hang" mode NEVER launches,
    (b) a probe-"error" mode with a cached cost-only record is reheated
    for free, (c) probe-"ok" modes run FIRST, (d) the loop stops
    launching when the budget is nearly spent and back-fills the rest
    from cache, (e) emit fires after every completed mode."""
    import json as _json

    cache_path = tmp_path / "cache.json"
    cache_path.write_text(_json.dumps({
        "w8a16-engine-mxu16": {"name": "w8a16-engine-mxu16",
                               "valid": False, "sol_frames_per_sec": 1.0},
        "associative": {"name": "associative", "valid": False,
                        "sol_frames_per_sec": 2.0},
        "pallas": {"name": "pallas", "valid": True,   # stale measurement:
                   "sol_frames_per_sec": 3.0},        # must NOT reheat
    }))
    monkeypatch.setattr(bench, "_RECS_CACHE_PATH", str(cache_path))

    probe = {
        "engine_xla_tiny": {"status": "ok"},          # w8a16-engine-xla
        "model_fwd_tiny_blocked": {"status": "ok"},   # blocked, t-s-xla
        "s8_dot": {"status": "error"},                # w8a16-engine-mxu16
        "model_fwd_tiny_assoc": {"status": "hang"},   # associative
        "pallas_diag_scan": {"status": "error"},      # pallas/fused/...
    }
    seen, emitted = [], []

    class _Proc:
        def __init__(self, name):
            self.stdout = ("BENCH_RECS " + _json.dumps(
                {name: {"name": name, "valid": True}}) + "\n")
            self.stderr = ""
            self.returncode = 0

    def fake_run(argv, env=None, timeout=None, **kw):
        seen.append(env["BENCH_DRAIN_ONLY"])
        return _Proc(env["BENCH_DRAIN_ONLY"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    # budget: enough for exactly the three probe-ok workers
    budget = iter([1e9, 1e9, 1e9, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0,
                   10.0, 10.0, 10.0])
    recs = bench._recs_from_drain_workers(
        emit=lambda m: emitted.append(set(m)),
        probe_table=probe, budget_fn=lambda: next(budget))
    # probe-ok modes ran, in front
    assert seen == ["w8a16-engine-xla", "blocked", "train-step-xla"]
    # the convicted + budget-stopped modes: reheated where cache allows
    assert recs["w8a16-engine-mxu16"]["cached"]
    assert recs["associative"]["cached"]   # hang-marked: never launched
    # budget-cut path DOES reuse a measured record, labeled cached=True
    # (summarize never promotes it over a fresh measurement; it keeps
    # the baseline/train-step numbers a short budget would drop)
    assert recs["pallas"]["cached"] and recs["pallas"]["valid"]
    assert emitted and emitted[-1] == set(recs)


def test_run_drained_cancels_fixed_overhead():
    """_run_drained's two-point scheme: with a fake dispatch/readback
    where each dispatch queues 2 ms of work and readback costs a fixed
    35 ms, the recovered per-iter time must be ~2 ms, not 2ms+35ms/k."""
    queued = {"t": 0.0}

    class _FakeLeaf:
        dtype = "f"

    def dispatch(prev):
        queued["t"] += 2.0e-3
        return _FakeLeaf()

    import time as _time
    real_sleep = _time.sleep

    def fake_read(out, warm=False):
        real_sleep(0.035 + queued["t"])
        queued["t"] = 0.0

    import sparsernns_tpu.utils.profiling as prof
    orig = prof.drain_readback
    prof.drain_readback = fake_read
    try:
        elapsed, n_eff = bench._run_drained(dispatch, 16)
        t_iter = elapsed / n_eff
    finally:
        prof.drain_readback = orig
    assert t_iter == pytest.approx(2.0e-3, rel=0.25)


def test_train_step_xla_fallback_reported():
    """When the fused train step can't measure but the pure-XLA one does
    (drained), the summary reports the measured xla number and names the
    config it came from."""
    recs = {
        "w8a16-engine-xla": _drained_rec("w8a16-engine-xla", 1.0e-3, 6.5e8),
        "train-step": bench._finalize("train-step (untimeable)",
                                      float("inf"), False, 1, 8 * 3751,
                                      9e10, 9e9, PEAKS),
        "train-step-xla": bench._finalize(
            "train-step-xla (readback-drain)", 30e-3, True, 1, 8 * 3751,
            9e10, 9e9, PEAKS, drained=True),
    }
    s = bench.summarize(recs, PEAKS)
    assert s["train_step_config"] == "train-step-xla"
    assert s["train_step_frames_per_sec"] == pytest.approx(
        8 * 3751 / 30e-3, rel=0.01)


def test_summary_crosschecks_headline_against_sweep(tmp_path, monkeypatch):
    """One headline, one method (VERDICT r4 #7): when the best config is
    the saturating-batch engine, the summary annotates the delta vs the
    hw_sweeps record for the same config inside the JSON record."""
    import json as _json
    import bench as b

    sweeps = {"engine_blockt": {"b32-bt512": {"frames_per_sec": 6.0e7}}}
    monkeypatch.setattr(b, "_REPO_DIR", str(tmp_path))
    (tmp_path / "runs").mkdir()
    (tmp_path / "runs" / "hw_sweeps.json").write_text(_json.dumps(sweeps))

    rec = {"valid": True, "synced": True, "frames_per_sec": 6.1e7,
           "mfu": 0.3, "hbm_util": 0.2, "sol_frames_per_sec": 1.4e8,
           "drained": True}
    out = b.summarize({"w8a16-engine-b32": rec}, (197e12, 819e9), "tpu")
    cc = out.get("sweep_crosscheck")
    assert cc is not None
    assert cc["sweep_frames_per_sec"] == 6.0e7
    assert abs(cc["delta_pct"] - 100 * (6.1e7 - 6.0e7) / 6.0e7) < 0.01
    assert cc["agree_3pct"] is True

    rec2 = dict(rec, frames_per_sec=7.0e7)
    out2 = b.summarize({"w8a16-engine-b32": rec2}, (197e12, 819e9), "tpu")
    assert out2["sweep_crosscheck"]["agree_3pct"] is False


def test_drain_worker_timeout_with_spent_budget_reheats_cache(
        monkeypatch, tmp_path):
    """Round-5 regression: when a WORKER TIMEOUT eats the remaining wall
    budget, the loop must reheat the cached records (labeled
    cached=True) before stopping — observed live: the first worker's
    warm-up consumed the budget in a slow-transport phase and the
    summary fell to the bare roofline with a full measurement cache
    sitting on disk."""
    import json as _json
    import subprocess

    cache_path = tmp_path / "cache.json"
    cached = {
        "w8a16-engine-b32": {"name": "w8a16-engine-b32", "valid": True,
                             "frames_per_sec": 6.27e7},
        "associative": {"name": "associative", "valid": True,
                        "frames_per_sec": 4.7e6},
    }
    cache_path.write_text(_json.dumps(cached))
    monkeypatch.setattr(bench, "_RECS_CACHE_PATH", str(cache_path))

    budget = iter([1e9, 10.0])  # pre-launch check passes; post-timeout: spent

    def fake_run(argv, env=None, timeout=None, **kw):
        raise subprocess.TimeoutExpired(argv, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    recs = bench._recs_from_drain_workers(
        probe_table={}, budget_fn=lambda: next(budget))
    assert recs["w8a16-engine-b32"]["cached"] is True
    assert recs["w8a16-engine-b32"]["valid"] is True
    assert recs["associative"]["cached"] is True
