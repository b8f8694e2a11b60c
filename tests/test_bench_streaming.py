"""Streaming latency benchmark: percentile math and summary gating.

Same hardware-honesty contract as test_bench.py — unsynced or
below-speed-of-light chunk timings must never surface as valid latency
numbers; the fallback is the clearly-labelled HBM-bound floor.
"""

import sys

import pytest

sys.path.insert(0, ".")  # repo root

import bench_streaming as bs  # noqa: E402


def _rec(chunk, p50_ms, valid=True, sol_ms=0.1, source="wall-clock"):
    return {"chunk_frames": chunk, "chunk_ms": chunk * bs.FRAME_MS,
            "batch": 8, "p50_ms": p50_ms, "p99_ms": p50_ms * 2,
            "n_timings": 10, "sol_ms": sol_ms, "hbm_util": 0.5,
            "rtf_per_stream": chunk * bs.FRAME_MS / p50_ms,
            "rtf_batch": 8 * chunk * bs.FRAME_MS / p50_ms,
            "source": source, "valid": valid}


def test_percentiles():
    durs = list(range(1, 101))
    assert bs._percentile(durs, 50) == 50
    assert bs._percentile(durs, 99) == 99
    assert bs._percentile([7.0], 99) == 7.0


def test_summary_picks_fastest_valid_chunk():
    # the invalid record here failed to SYNC (not a below-floor synced
    # timing, which would instead prove the whole backend broken)
    s = bs.summarize_stream(
        [_rec(16, 2.0), _rec(64, 1.5),
         _rec(256, 1.0, valid=False, source="wall-clock-unsynced")], "cpu")
    assert s["timing_valid"] and not s["broken_sync"]
    assert s["best_chunk_frames"] == 64
    assert s["best_p50_ms"] == 1.5


def test_summary_falls_back_to_cost_model():
    s = bs.summarize_stream([_rec(16, 0.01, valid=False, sol_ms=0.5),
                             _rec(64, 0.02, valid=False, sol_ms=1.9)], "tpu")
    assert not s["timing_valid"]
    assert s["measurement"] == "hbm-bound-cost-model"
    assert s["hbm_bound_p50_ms"] == 0.5   # smallest chunk's floor
    assert "best_p50_ms" not in s


def test_broken_sync_canary_rejects_dispatch_latencies():
    """On a non-syncing backend every chunk times at the dispatch
    overhead (~constant) and passes its tiny per-chunk floor; the
    large-chunk canary's floor sits above dispatch overhead, proving the
    backend lies — all wall-clock latencies must then be rejected."""
    recs = [
        _rec(16, 0.129, valid=True, sol_ms=0.008),
        _rec(256, 0.129, valid=True, sol_ms=0.057),
        dict(_rec(2048, 0.129, valid=False, sol_ms=0.46), canary=True),
    ]
    s = bs.summarize_stream(recs, "tpu")
    assert s["broken_sync"]
    assert not s["timing_valid"]
    assert s["measurement"] == "hbm-bound-cost-model"
    assert s["hbm_bound_p50_ms"] == 0.008
    # the canary is a proof device, not a latency record
    assert all(r["chunk_frames"] != 2048 for r in s["records"])


def test_profiler_records_survive_broken_sync():
    recs = [
        _rec(16, 0.129, valid=True, sol_ms=0.008),
        _rec(64, 0.05, valid=True, sol_ms=0.019, source="device-profiler"),
        dict(_rec(2048, 0.129, valid=False, sol_ms=0.46), canary=True),
    ]
    s = bs.summarize_stream(recs, "tpu")
    assert s["broken_sync"] and s["timing_valid"]
    assert s["best_chunk_frames"] == 64
    assert s["best_p50_ms"] == 0.05


def test_measure_chunk_cpu_smoke():
    rec = bs.measure_chunk(16, batch=1, iters=3, use_profiler=False)
    assert rec["chunk_frames"] == 16
    assert rec["p50_ms"] > 0 and rec["p99_ms"] >= rec["p50_ms"]
    assert rec["source"] == "wall-clock"
    assert rec["valid"]  # CPU interpret-mode is far above the TPU floor


def test_drained_records_survive_broken_sync():
    recs = [
        _rec(16, 0.129, valid=True, sol_ms=0.008),
        _rec(64, 0.05, valid=True, sol_ms=0.019, source="readback-drain"),
        dict(_rec(2048, 0.129, valid=False, sol_ms=0.46), canary=True),
    ]
    s = bs.summarize_stream(recs, "tpu")
    assert s["broken_sync"] and s["timing_valid"]
    assert s["best_chunk_frames"] == 64


def test_broken_drain_drops_streaming_drained_records():
    recs = [
        # impossible drained timing proves the readback channel lies
        _rec(16, 0.001, valid=False, sol_ms=0.008, source="readback-drain"),
        _rec(64, 0.05, valid=True, sol_ms=0.019, source="readback-drain"),
    ]
    s = bs.summarize_stream(recs, "tpu")
    assert not s["timing_valid"]
    assert s["measurement"] == "hbm-bound-cost-model"


def test_measure_chunk_drain_path(monkeypatch):
    """Untimeable wall-clock + verified readback channel: measure_chunk
    must produce a drained MEAN record (p99 None, labelled)."""
    import bench
    monkeypatch.setitem(bench._REGIME, "wallclock", False)
    monkeypatch.setitem(bench._REGIME, "readback", True)
    monkeypatch.setattr(bench, "_run_drained",
                        lambda dispatch, iters, sol_t=0.0: (0.01 * 9, 9))
    rec = bs.measure_chunk(16, batch=1, iters=3, use_profiler=False)
    assert rec["source"] == "readback-drain"
    assert rec["p99_ms"] is None
    assert rec["p50_ms"] == pytest.approx(10.0, rel=1e-6)
    assert rec["valid"]
    assert rec["rtf_per_stream"] > 0
