"""Profiling helpers: jax.profiler integration + kernel cost accounting.

Reference parity: the optional per-batch trace hooks
(train_helpers.py:619/:642-650/:749-753). Extended with a roofline-style
cost model for the S5 forward so kernel timings can be judged against
speed-of-light (SURVEY.md §7 M3).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Perfetto-compatible profiler trace window."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling endpoint for tensorboard/xprof attach."""
    return jax.profiler.start_server(port)


def save_memory_profile(path: str):
    jax.profiler.save_device_memory_profile(path)


@dataclasses.dataclass
class S5Cost:
    """FLOPs / bytes for one S5 layer forward at (B, L, H, P)."""

    flops: int
    hbm_bytes_fused: int
    hbm_bytes_unfused: int

    @staticmethod
    def forward(b: int, l: int, h: int, p: int,
                dtype_bytes: int = 4) -> "S5Cost":
        bl = b * l
        proj = 2 * bl * h * (2 * p) * 2          # B and C projections (MACs*2)
        scan = bl * p * 8                        # complex mul-add per step
        d_term = bl * h * 2
        flops = proj + scan + d_term
        # fused kernel: read u, write y (+ weights once)
        io = 2 * bl * h * dtype_bytes
        weights = (h * 2 * p + 2 * p * h + h) * dtype_bytes
        fused = io + weights
        # unfused XLA: u, bu (2P), scan intermediates (~2 passes min), xs, y
        unfused = io + weights + (3 * 2 * bl * p) * dtype_bytes * 2
        return S5Cost(flops, fused, unfused)

    def speed_of_light_us(self, hbm_gbps: float = 820.0,
                          tflops: float = 98.0) -> float:
        """Lower bound runtime (us) on one chip (defaults ~ v5e fp32)."""
        t_mem = self.hbm_bytes_fused / (hbm_gbps * 1e3)
        t_flops = self.flops / (tflops * 1e6)
        return max(t_mem, t_flops)


#: Rough per-chip peaks for speed-of-light accounting, keyed by substrings
#: of `jax.devices()[0].device_kind`. (bf16 matmul TFLOP/s, HBM GB/s.)
CHIP_PEAKS = {
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),
}
DEFAULT_PEAKS = (197e12, 819e9)  # v5e


def chip_peaks(device=None):
    """(bf16 flops/s, HBM bytes/s) for the current accelerator; v5e
    defaults when unknown (CPU runs report vs the TPU target)."""
    try:
        kind = (device or jax.devices()[0]).device_kind.lower()
    except Exception:
        return DEFAULT_PEAKS
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return DEFAULT_PEAKS


def hbm_limit(default_bytes: int = int(15.5 * 2**30)) -> int:
    """Device HBM capacity from memory_stats, v5e default otherwise."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 - backend without memory_stats
        pass
    return default_bytes


def timing_trust_canary(peak_flops: float, iters: int = 16,
                        drain: int = 8, k_mm: int = 8, n: int = 4096,
                        saturate: bool = False,
                        reserve_bytes: int = 128 << 20):
    """Can this backend's wall-clock time execution AT ALL?

    Runs ``iters`` chained iterations of a K-matmul chain whose pure-MXU
    floor (k_mm * 2 * n^3 / peak) sits far above per-dispatch overhead,
    after ``drain`` untimed iterations to absorb compile backlog. On a
    backend with an unbounded dispatch queue and a no-op sync (observed
    on the round-2 tunnel), the steady-state per-iter time lands far
    BELOW the floor — proof that no wall-clock in this process measures
    execution. Returns (trusted, t_iter_s, floor_s). Model-independent;
    shared by bench.py, bench_scaling.py, and the block_t autotuner.

    ``saturate``: re-check under allocator backpressure — a ballast pins
    all HBM except ``reserve_bytes`` and every timed output is RETAINED
    (iters x 32 MB = 512 MB at the defaults, well past the 128 MiB
    reserve, so a working allocator must block dispatch by ~iter 4). If
    even this stays below the floor, allocator accounting is broken too
    and saturated-queue timings are inadmissible.
    """
    import time as _time

    floor = k_mm * 2.0 * float(n) ** 3 / peak_flops
    ballast = None
    if saturate:
        size = (hbm_limit() - int(reserve_bytes)) // 4
        if size > 0:
            try:
                ballast = jnp.zeros((size,), jnp.float32)
            except Exception:  # noqa: BLE001 - allocation refused
                ballast = None
    x = jnp.full((n, n), 1e-2, jnp.bfloat16)
    w = jnp.full((n, n), 1e-4, jnp.bfloat16)

    @jax.jit
    def f(a, b):
        for _ in range(k_mm):
            a = (a @ b) * jnp.bfloat16(1e-4)
        return a

    out = f(x, w)
    try:
        jax.block_until_ready(out)
    except Exception:  # noqa: BLE001 - sync itself may be broken
        pass
    retained = []
    prev = x
    for _ in range(drain):
        prev = f(prev, w)
    t0 = _time.perf_counter()
    for _ in range(iters):
        prev = f(prev, w)
        if saturate:
            retained.append(prev)  # hold buffers -> allocator pressure
    try:
        jax.block_until_ready(prev)
    except Exception:  # noqa: BLE001
        pass
    t_iter = (_time.perf_counter() - t0) / iters
    del ballast, retained
    # same margin as the bench speed-of-light gate
    return t_iter >= 0.6 * floor, t_iter, floor


def min_traffic_bytes(fn, *args) -> int:
    """TRUE lower bound on one call's HBM traffic: every argument read
    once + every output written once (via eval_shape — no device work).
    XLA's bytes-accessed cost analysis counts each op's operands AND
    results and overcounts fused programs >10x (measured 2026-08-20:
    5.0 GB reported for a ~70 MB-boundary engine forward); gating
    timing validity on it rejects genuine measurements. Gate on this."""
    import numpy as np
    outs = jax.eval_shape(fn, *args)
    total = 0
    for leaf in jax.tree_util.tree_leaves((args, outs)):
        if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            total += (int(np.prod(leaf.shape, dtype=np.int64))
                      * jnp.dtype(leaf.dtype).itemsize)
    return int(total)


def drain_readback(out, warm: bool = False):
    """Block the host on REAL device completion by reading back ONE
    element of ``out``'s first array leaf. On transports whose
    block_until_ready/is_ready are no-ops (the round-2/3 tunnel), a
    device-to-host transfer is the only primitive that genuinely waits
    for the producing computation — the readback-drain timing channel.
    ``warm=True`` marks the once-per-process transport-initialisation
    read (observed ~2-4 min on the tunnel; subsequent reads ~34 ms)."""
    import numpy as np
    leaf = next(x for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "dtype"))
    return np.asarray(jnp.reshape(leaf, (-1,))[0])


def readback_drain_time(dispatch, iters: int, sol_t: float = 0.0):
    """Generic READBACK-DRAIN timing: chain ``k`` dispatches then block on
    a 1-element readback of the final output; the elapsed difference
    between two K values cancels the fixed transport latency (~34 ms on
    the round-3 tunnel). ``sol_t`` (the workload's roofline floor per
    iteration) scales ``iters`` so the measured signal spans >= ~0.75 s,
    far above readback jitter. dispatch(prev_or_None) -> out.
    Returns (elapsed_s, effective_iters). Shared by bench.py,
    bench_streaming.py, and the block_t autotuner."""
    import time as _time

    out = dispatch(None)
    out = dispatch(out)             # compile the chained variant too
    drain_readback(out, warm=True)  # absorb per-process transport init
    if sol_t > 0:
        iters = max(iters, min(int(0.75 / sol_t) + 1, 4000))
    iters = max(iters, 2)
    k1 = max(1, min(iters // 8, iters - 1))

    def run(k):
        prev = None
        t0 = _time.perf_counter()
        for _ in range(k):
            prev = dispatch(prev)
        drain_readback(prev)
        return _time.perf_counter() - t0

    t_a = min(run(k1), run(k1))
    t_b = min(run(iters), run(iters))
    return max(t_b - t_a, 0.0), iters - k1


#: env var carrying the once-per-run readback-channel verdict ("1"/"0"),
#: set by the parent probe and inherited by worker subprocesses so they
#: never re-pay the multi-minute canary.
READBACK_ENV = "SPARSERNNS_READBACK_OK"


def probe_readback_channel(peak_flops: float, timeout_s: float = 600,
                           log=None) -> bool:
    """Run readback_drain_canary in a THROWAWAY SUBPROCESS and cache the
    verdict in READBACK_ENV (inherited by any later worker subprocess).
    A dead transport HANGS the 1-element readback inside the C client
    where SIGALRM cannot interrupt it — a subprocess can be killed on
    timeout. The warm-up read alone costs minutes on the tunnel."""
    import json as _json
    import os as _os
    import subprocess as _sp
    import sys as _sys

    cached = _os.environ.get(READBACK_ENV)
    if cached is not None:
        return cached == "1"
    log = log or (lambda m: print(m, file=_sys.stderr, flush=True))
    code = (
        "from sparsernns_tpu.utils.profiling import readback_drain_canary\n"
        f"ok, slope, floor = readback_drain_canary({peak_flops!r})\n"
        "import json; print('READBACK_CANARY ' + json.dumps("
        "{'ok': bool(ok), 'slope_ms': slope*1e3, 'floor_ms': floor*1e3}))\n")
    verdict = False
    try:
        r = _sp.run([_sys.executable, "-c", code], timeout=timeout_s,
                    capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("READBACK_CANARY "):
                rec = _json.loads(line[len("READBACK_CANARY "):])
                log(f"canary: readback-drain slope {rec['slope_ms']:.2f} "
                    f"ms/iter vs floor {rec['floor_ms']:.2f} ms -> "
                    f"{'OK' if rec['ok'] else 'NOT a timing channel'}")
                verdict = bool(rec["ok"])
                break
        else:
            log(f"readback canary: probe failed (rc={r.returncode}) — "
                f"{(r.stderr or '')[-200:]}")
    except _sp.TimeoutExpired:
        log("readback canary: probe hung (dead transport) — drain "
            "channel unavailable")
    _os.environ[READBACK_ENV] = "1" if verdict else "0"
    return verdict


def readback_drain_canary(peak_flops: float, k1: int = 4, k2: int = 20,
                          k_mm: int = 8, n: int = 4096):
    """Classify the READBACK-DRAIN timing channel: when dispatch timing is
    untrustworthy (unbounded queue + no-op sync), does time-to-readback
    still scale with queued device work?  Chains k matmul-chain calls and
    times dispatch→1-element-readback at two K values; the SLOPE cancels
    the fixed transport latency and must land at/above the pure-MXU floor
    per chain call (k_mm*2*n^3/peak).  Measured on the round-3 tunnel
    (2026-08-19): slope 0.713 ms per 4096^3 bf16 matmul vs 0.70 ms floor
    (~98% of peak) with ~34 ms fixed overhead — a real timing channel.

    Returns (trusted, slope_s_per_iter, floor_s_per_iter)."""
    import time as _time

    floor = k_mm * 2.0 * float(n) ** 3 / peak_flops
    x = jnp.full((n, n), 1e-2, jnp.bfloat16)
    w = jnp.full((n, n), 1e-4, jnp.bfloat16)

    @jax.jit
    def f(a, b):
        for _ in range(k_mm):
            a = (a @ b) * jnp.bfloat16(1e-4)
        return a

    drain_readback(f(x, w), warm=True)  # compile + transport init

    def run(k):
        prev = x
        t0 = _time.perf_counter()
        for _ in range(k):
            prev = f(prev, w)
        drain_readback(prev)
        return _time.perf_counter() - t0

    t_a = min(run(k1), run(k1))
    t_b = min(run(k2), run(k2))
    slope = (t_b - t_a) / (k2 - k1)
    # same margin as the bench speed-of-light gate
    return slope >= 0.6 * floor, slope, floor


def model_forward_flops(b: int, l: int, d_io: int, h: int, p: int,
                        n_layers: int, glu_variant: str = "half1") -> float:
    """Analytic forward FLOPs for the NDNS S5 stack (encoder + n_layers
    mixers + decoder). Needed because XLA's cost model cannot see inside
    Pallas custom calls; used for MFU and speed-of-light checks
    (VERDICT.md round-1 item 1).

    ``p`` is the number of complex states actually scanned (the B
    projection is (H, 2P): re|im stacked)."""
    bl = b * l
    flops = 2.0 * bl * d_io * h            # encoder
    per_layer = (
        2.0 * bl * h * (2 * p)             # B projection
        + 8.0 * bl * p                     # scan: complex mul-add per step
        + 2.0 * bl * (2 * p) * h           # C projection
        + 8.0 * bl * h                     # D, residual, norm, relu
    )
    if glu_variant in ("half1", "half2", "full"):
        per_layer += 2.0 * bl * h * h + 3.0 * bl * h   # gate dense + sigmoid
    if glu_variant == "full":
        per_layer += 2.0 * bl * h * h
    flops += n_layers * per_layer
    flops += 2.0 * bl * h * d_io           # decoder
    return flops


def model_padded_flops(b: int, l: int, d_io: int, h: int, p: int,
                       n_layers: int, glu_variant: str = "half1") -> float:
    """MXU matmul FLOPs at the KERNEL-padded geometry (H and 2P rounded
    up to the 128-lane tile) — the compute half of the serving roofline.
    The Pallas kernels physically execute their dots at these padded
    shapes, so the compute floor of any correct execution is
    ``model_padded_flops / matmul_peak`` even when the nominal
    (unpadded) FLOP count is far lower. Row counts are NOT padded (the
    whole-network kernel's main+tail decomposition covers exactly L
    rows) and VPU work (scan combines, norms, activations) is excluded:
    both choices keep the floor a true lower bound. Used with the HBM
    floor as ``max(bytes / bw, padded_flops / peak)`` in bench.py's
    validity gate and cost-model fallback."""
    hp = -(-h // 128) * 128
    pp2 = 2 * (-(-p // 128) * 128)
    bl = b * l
    flops = 2.0 * bl * d_io * hp           # encoder
    per_layer = (2.0 * bl * hp * pp2       # B projection
                 + 2.0 * bl * pp2 * hp)    # C projection
    if glu_variant in ("half1", "half2", "full"):
        per_layer += 2.0 * bl * hp * hp
    if glu_variant == "full":
        per_layer += 2.0 * bl * hp * hp
    flops += n_layers * per_layer
    flops += 2.0 * bl * hp * d_io          # decoder
    return flops


def module_durations_from_trace(trace: dict, match: str) -> list:
    """Per-execution durations (seconds) of the XLA module whose name
    contains ``match``, pulled from a Chrome-trace dict: 'X' (complete)
    events on threads whose metadata names them 'XLA Modules' — the
    device-side executable track, populated by the runtime independently
    of host synchronization (which is what makes these timings valid on
    backends whose block_until_ready lies)."""
    events = trace.get("traceEvents", [])
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    return [float(e.get("dur", 0.0)) / 1e6
            for e in events
            if (e.get("ph") == "X"
                and tids.get((e.get("pid"), e.get("tid"))) == "XLA Modules"
                and match in e.get("name", ""))]


def device_module_times(dispatch, iters: int, match: str) -> list:
    """DEVICE-side per-iteration timings via jax.profiler: run ``iters``
    chained ``dispatch(prev)`` calls under a trace and read the target
    module's durations off the 'XLA Modules' track. Returns a (possibly
    empty) list of seconds.

    CAUTION: on some transports (the round-2 tunnel backend) a FAILED
    ``start_trace`` poisons every subsequent device call in the process —
    call this from an isolated subprocess when the backend is suspect
    (bench.py's BENCH_WORKER protocol)."""
    import glob
    import gzip
    import json
    import tempfile

    out = dispatch(None)  # compile + warm outside the trace window
    jax.block_until_ready(out)
    durs = []
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        try:
            prev = None
            for _ in range(iters):
                prev = dispatch(prev)
            jax.block_until_ready(prev)
        finally:
            jax.profiler.stop_trace()
        for fp in glob.glob(td + "/plugins/profile/*/*trace.json.gz"):
            durs.extend(module_durations_from_trace(
                json.load(gzip.open(fp)), match))
    return durs


#: bytes per element for HLO shape dtypes (s4/u4 round up to 1).
_HLO_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1,
    "f8e5m2": 1, "f8e4m3": 1, "f8e3m4": 1, "s16": 2, "u16": 2, "f16": 2,
    "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16,
}

_SHAPE_RE = None  # compiled lazily (module import stays cheap)


def _shape_tokens_bytes(text: str) -> float:
    """Sum of buffer sizes for every ``dtype[d0,d1,...]`` token in text."""
    global _SHAPE_RE
    if _SHAPE_RE is None:
        import re
        _SHAPE_RE = re.compile(r"\b([a-z][a-z0-9]*)\[([0-9,]*)\]")
    total = 0.0
    for dtype, dims in _SHAPE_RE.findall(text):
        nbytes = _HLO_DTYPE_BYTES.get(dtype)
        if nbytes is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nbytes
    return total


def custom_call_bytes_from_hlo(hlo_text: str) -> float:
    """Total operand+result bytes of every Pallas/Mosaic custom-call in an
    optimized HLO module dump.

    XLA's ``cost_analysis()`` treats ``custom-call`` as a black box and
    counts ZERO bytes for it (measured: an isolated Pallas scan whose
    kernel moves ~8.6 MB reports 0.29 MB "bytes accessed"). For every
    other op XLA counts operand reads + result writes, so adding exactly
    that for each custom-call restores the convention — without it the
    speed-of-light gate under-estimates the HBM floor for kernel-heavy
    modes, and an isolated-kernel autotune target computes an absurdly
    low bound. Operand shapes come from ``operand_layout_constraints``
    (always emitted for Mosaic TPU calls); result shapes from the
    instruction's LHS."""
    total = 0.0
    for line in hlo_text.splitlines():
        if "custom-call" not in line:
            continue
        if ('custom_call_target="tpu_custom_call"' not in line
                and "mosaic" not in line):
            continue
        head = line.partition("backend_config=")[0]
        lhs, _, rest = head.partition("custom-call(")
        operands, _, tail = rest.partition(")")
        if "operand_layout_constraints={" in tail:
            op_src = tail.split("operand_layout_constraints={", 1)[1]
        else:
            op_src = operands
        total += _shape_tokens_bytes(lhs) + _shape_tokens_bytes(op_src)
    return total


def compiled_cost(lowerable, *args, **kw):
    """(flops, bytes_accessed) from XLA's cost model for a jitted callable,
    with Pallas custom-call operand/result I/O added back in (XLA counts
    custom-calls as zero bytes — see custom_call_bytes_from_hlo). Host-side
    only (no execution / readback). Pallas custom-call FLOPs remain
    invisible; use model_forward_flops for the FLOP side."""
    compiled = jax.jit(lowerable).lower(*args, **kw).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    try:
        bytes_accessed += custom_call_bytes_from_hlo(compiled.as_text())
    except Exception:  # noqa: BLE001 - backend without as_text
        pass
    return float(ca.get("flops", 0.0)), bytes_accessed


class StepTimer:
    """Wall-clock step timer with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))
