"""Backend conformance probe harness (tools/backend_probe.py).

The probe dispatches op-class stages into kill-on-timeout subprocesses on
a tunnel backend that can WEDGE on a bad program (PERF.md round-3
conformance notes). These tests pin the harness logic on CPU: stage
sources are valid programs, known wedgers run last, and the ok/error/hang
classification is faithful.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import backend_probe as bp  # noqa: E402


def test_all_stage_sources_compile():
    for name, (src, _) in bp.STAGES.items():
        compile(src, name, "exec")  # must be valid python


def test_wedgers_are_marked_and_ordered():
    wedgers = [n for n, (_, w) in bp.STAGES.items() if w]
    assert "s8_dot" in wedgers              # wedged the device 2026-08-19
    assert "associative_scan_add" in wedgers
    names = list(bp.STAGES)
    names.sort(key=lambda n: bp.STAGES[n][1])
    # after the sort used by main(), every wedger follows every non-wedger
    first_wedger = next(i for i, n in enumerate(names) if bp.STAGES[n][1])
    assert all(bp.STAGES[n][1] for n in names[first_wedger:])


def test_run_stage_classifies_ok_error_hang(monkeypatch, tmp_path):
    monkeypatch.setitem(bp.STAGES, "fake_ok", ("OUT = jnp.ones((4,))", False))
    monkeypatch.setitem(bp.STAGES, "fake_err",
                        ("raise RuntimeError('UNIMPLEMENTED: nope')", False))
    monkeypatch.setenv("PROBE_PLATFORM", "cpu")
    ok = bp._run_stage("fake_ok", timeout_s=120)
    assert ok["status"] == "ok"
    err = bp._run_stage("fake_err", timeout_s=120)
    assert err["status"] == "error"
    assert "UNIMPLEMENTED" in err["detail"]

    def fake_hang(argv, timeout=None, **kw):
        raise subprocess.TimeoutExpired(argv, timeout)

    monkeypatch.setitem(bp.STAGES, "fake_hang", ("OUT = 1", True))
    monkeypatch.setattr(bp.subprocess, "run", fake_hang)
    hang = bp._run_stage("fake_hang", timeout_s=1)
    assert hang["status"] == "hang"


def test_main_writes_table_and_skips_wedgers(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setattr(bp, "_device_healthy", lambda timeout_s=240: True)
    monkeypatch.setattr(
        bp, "_run_stage",
        lambda name, t: calls.append(name) or
        {"status": "ok", "detail": "", "s": 0.1})
    out = os.path.join(tmp_path, "probe.json")
    rc = bp.main(["--skip-wedgers", "--out", out])
    assert rc == 0
    assert calls and not any(bp.STAGES[n][1] for n in calls)
    table = json.load(open(out))
    assert all(table[n]["status"] == "ok" for n in calls)


def test_main_waits_for_recovery_after_wedge(monkeypatch, tmp_path):
    """A hang followed by an unhealthy device must trigger the recovery
    wait; if the device never recovers the loop stops (no further stages
    burned into a dead transport)."""
    health = iter([True,    # at start
                   False,   # after the hang: wedged
                   False])  # after the wait: still dead -> stop

    monkeypatch.setattr(bp, "_device_healthy",
                        lambda timeout_s=240: next(health))
    waited = []
    monkeypatch.setattr(bp, "_wait_for_recovery",
                        lambda max_wait, log: waited.append(1) or 0.0)
    seq = iter([{"status": "hang", "detail": "killed", "s": 9.9}])
    ran = []
    monkeypatch.setattr(bp, "_run_stage",
                        lambda name, t: ran.append(name) or next(seq))
    out = os.path.join(tmp_path, "probe.json")
    rc = bp.main(["--stages", "s8_dot,f32_matmul", "--out", out])
    assert rc == 0
    # f32_matmul sorts first (non-wedger)… but the fake run_stage returns
    # hang for it, the device reads wedged, recovery fails -> stop before
    # s8_dot ever dispatches.
    assert ran == ["f32_matmul"]
    assert waited
    table = json.load(open(out))
    assert table["f32_matmul"]["wedged_device"] is True
