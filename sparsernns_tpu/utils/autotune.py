"""block_t autotuner for the Pallas kernels.

The fused S5 / diag-scan kernels tile time into ``block_t``-sized blocks
(scan_kernel.py, fused_s5.py). The best block size trades VMEM residency
against grid parallelism and λ-power-table size, and depends on the
shape (B, L, H, P) and the chip — so it is measured, not guessed.

Timing protocol (same hardware-honesty rules as bench.py):

- PRIMARY: device-side module durations from the jax.profiler trace
  ('XLA Modules' track, utils/profiling.device_module_times) — valid
  even on transports whose host sync lies.
- FALLBACK: chained wall-clock (iteration i+1 consumes iteration i's
  output) for sync-capable backends.
- Every timing passes a speed-of-light gate against XLA's own
  bytes-accessed cost analysis; candidates timing below the HBM floor
  are marked invalid and never win.

On TPU each candidate runs in an ISOLATED subprocess (``--worker``):
a failed ``start_trace`` poisons every later device call in its process
on the tunnel backend, and per-candidate processes also keep one
candidate's compile cache pressure from skewing the next.

Usage:
    python -m sparsernns_tpu.utils.autotune --mode fused \
        --batch 8 --seq-len 3751 --d-model 192 --p 128 \
        --candidates 128,256,512,1024 --out autotune_block_t.json

Reference analog: none — the reference hand-tunes torch/CUDA launch
shapes; the TPU-native tunable is the kernels' time-block size.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from typing import Optional, Sequence

import numpy as np

DEFAULT_CANDIDATES = (128, 256, 512, 1024)
SOL_MARGIN = 0.6          # same physical-possibility margin as bench.py
_REC_TAG = "AUTOTUNE_REC "


def _build_dispatch(mode: str, block_t: int, b: int, l: int, h: int,
                    p: int, seed: int = 0):
    """(dispatch, xla_bytes): a chained dispatcher for one candidate and
    the compiled executable's bytes-accessed. The jitted wrapper is
    named ``autotune_target`` so the profiler can match its module."""
    import jax
    import jax.numpy as jnp

    from sparsernns_tpu.utils.profiling import (compiled_cost,
                                                min_traffic_bytes)

    rng = np.random.RandomState(seed)
    decay = rng.uniform(0.7, 0.999, p).astype(np.float32)
    theta = rng.uniform(0.0, 0.3, p).astype(np.float32)
    lam_re = jnp.asarray(decay * np.cos(theta))
    lam_im = jnp.asarray(decay * np.sin(theta))
    u = jnp.asarray(rng.randn(b, l, h).astype(np.float32))

    if mode == "fused":
        from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply
        w_b = jnp.asarray(rng.randn(h, 2 * p).astype(np.float32) * 0.1)
        w_c = jnp.asarray(rng.randn(2 * p, h).astype(np.float32) * 0.1)
        d = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)

        def autotune_target(u, lam_re, lam_im, w_b, w_c, d):
            return fused_s5_apply(u, (lam_re, lam_im), w_b, w_c, d,
                                  block_t=block_t)

        fwd = jax.jit(autotune_target)
        _, xla_bytes = compiled_cost(autotune_target, u, lam_re, lam_im,
                                     w_b, w_c, d)
        min_bytes = min_traffic_bytes(autotune_target, u, lam_re, lam_im,
                                     w_b, w_c, d)

        def dispatch(prev):
            ui = u if prev is None else u + 1e-20 * prev
            return fwd(ui, lam_re, lam_im, w_b, w_c, d)

    elif mode == "scan":
        from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
        bu_re = jnp.asarray(rng.randn(b, l, p).astype(np.float32))
        bu_im = jnp.asarray(rng.randn(b, l, p).astype(np.float32))

        def autotune_target(bu_re, bu_im, lam_re, lam_im):
            return pallas_diag_scan((lam_re, lam_im), (bu_re, bu_im),
                                    block_t=block_t)

        fwd = jax.jit(autotune_target)
        _, xla_bytes = compiled_cost(autotune_target, bu_re, bu_im,
                                     lam_re, lam_im)
        min_bytes = min_traffic_bytes(autotune_target, bu_re, bu_im,
                                     lam_re, lam_im)

        def dispatch(prev):
            bri = bu_re if prev is None else bu_re + 1e-20 * prev[0]
            return fwd(bri, bu_im, lam_re, lam_im)

    elif mode == "layer":
        # the serving engine's whole-layer kernel (fused_layer.py):
        # padded bf16 residual stream in, bf16 out — the per-layer unit
        # of the engine's fused stack (half1 GLU, the flagship config)
        from sparsernns_tpu.ops.pallas.fused_layer import fused_layer_apply
        h_pad = -(-h // 128) * 128
        t = min(block_t, -(-l // 8) * 8)
        l_pad = -(-l // t) * t
        w_b = jnp.asarray(rng.randn(h, 2 * p).astype(np.float32) * 0.1)
        w_c = jnp.asarray(rng.randn(2 * p, h).astype(np.float32) * 0.1)
        d = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
        nw = jnp.asarray(1.0 + 0.05 * rng.randn(h).astype(np.float32))
        nb = jnp.asarray(0.05 * rng.randn(h).astype(np.float32))
        o2k = jnp.asarray(rng.randn(h, h).astype(np.float32) * 0.1)
        o2b = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
        r = jnp.zeros((b, l_pad, h_pad), jnp.bfloat16)

        def autotune_target(r, lam_re, lam_im, w_b, w_c, d, nw, nb,
                            o2k, o2b):
            return fused_layer_apply(
                r, (lam_re, lam_im), w_b, w_c, d, nw, nb, o2k, o2b,
                block_t=block_t, glu="half1", act_dtype=jnp.bfloat16)

        fwd = jax.jit(autotune_target)
        _, xla_bytes = compiled_cost(autotune_target, r, lam_re, lam_im,
                                     w_b, w_c, d, nw, nb, o2k, o2b)
        min_bytes = min_traffic_bytes(autotune_target, r, lam_re, lam_im,
                                     w_b, w_c, d, nw, nb, o2k, o2b)

        def dispatch(prev):
            ri = (r if prev is None else
                  (r + 1e-20 * prev).astype(jnp.bfloat16))
            return fwd(ri, lam_re, lam_im, w_b, w_c, d, nw, nb, o2k, o2b)

    else:
        raise ValueError(f"unknown autotune mode {mode!r}")
    return dispatch, xla_bytes, min_bytes


_WALLCLOCK_TRUSTED = None


def _wallclock_trusted() -> bool:
    """Once-per-process timing-trust canary (profiling.timing_trust_canary
    — bench.py's regime detector). Non-TPU backends are trusted (tests,
    CPU interpret runs)."""
    global _WALLCLOCK_TRUSTED
    if _WALLCLOCK_TRUSTED is None:
        import jax

        from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                    timing_trust_canary)
        if jax.default_backend() != "tpu":
            _WALLCLOCK_TRUSTED = True
        else:
            try:
                ok, t_iter, floor = timing_trust_canary(chip_peaks()[0])
                if not ok:
                    print(f"[autotune] canary: steady {t_iter*1e3:.2f} ms "
                          f"vs floor {floor*1e3:.2f} ms — wall-clock "
                          "untrusted on this backend", file=sys.stderr)
                _WALLCLOCK_TRUSTED = ok
            except Exception as e:  # noqa: BLE001
                print(f"[autotune] canary failed ({e}); trusting wall-clock",
                      file=sys.stderr)
                _WALLCLOCK_TRUSTED = True
    return _WALLCLOCK_TRUSTED


def measure_candidate(mode: str, block_t: int, b: int, l: int, h: int,
                      p: int, iters: int = 8,
                      use_profiler: Optional[bool] = None) -> dict:
    """Time one (mode, block_t) candidate in THIS process. Returns a
    record with the median per-iteration seconds, its source, and the
    speed-of-light validity verdict."""
    import jax

    from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                device_module_times)

    if use_profiler is None:
        use_profiler = jax.default_backend() == "tpu"
    if use_profiler and jax.default_backend() == "tpu" \
            and not _wallclock_trusted():
        from sparsernns_tpu.utils.profiling import probe_readback_channel
        if probe_readback_channel(chip_peaks()[0]):
            # drain regime: skip the profiler — start_trace is
            # UNIMPLEMENTED on this backend and its crash can wedge the
            # shared tunnel device (observed 2026-08-19)
            use_profiler = False
    _, hbm_bw = chip_peaks()
    dispatch, xla_bytes, min_bytes = _build_dispatch(mode, block_t, b, l,
                                                     h, p)
    # validity floor from the TRUE minimum traffic — XLA bytes-accessed
    # overcounts fused programs and would reject real fast candidates
    # (bench.py round-4 fix; the sol in records keeps the honest bound)
    sol_t = min_bytes / hbm_bw

    failure = {"mode": mode, "block_t": block_t, "t_iter_s": 0.0,
               "n_timings": 0, "source": "profiler-poisoned",
               "xla_bytes": xla_bytes, "sol_t_s": sol_t,
               "hbm_util": 0.0, "valid": False}
    durs, source = [], "none"
    if use_profiler:
        try:
            durs = device_module_times(dispatch, iters, "autotune_target")
            source = "device-profiler"
        except Exception as e:  # noqa: BLE001 - poisoned/unsupported
            print(f"[autotune] profiler failed for block_t={block_t}: {e}",
                  file=sys.stderr)
            # A failed start_trace poisons this process's device calls on
            # the tunnel backend — a wall-clock attempt would hang until
            # the subprocess timeout. Report the failure immediately.
            return failure
    if len(durs) < 3:
        if not _wallclock_trusted():
            from sparsernns_tpu.utils.profiling import (
                chip_peaks as _peaks, probe_readback_channel,
                readback_drain_time)
            # readback-drain channel (bench.py's regime): the verdict is
            # probed once and cached in READBACK_ENV, so isolated
            # per-candidate workers inherit it without re-paying the
            # multi-minute canary
            if probe_readback_channel(_peaks()[0]):
                try:
                    elapsed, n_eff = readback_drain_time(dispatch, iters,
                                                         sol_t)
                except Exception as e:  # noqa: BLE001 - hung readback etc.
                    print(f"[autotune] drain timing failed for "
                          f"block_t={block_t}: {e}", file=sys.stderr)
                    return failure
                if n_eff > 0 and elapsed > 0:
                    t_mean = elapsed / n_eff
                    return {
                        "mode": mode, "block_t": block_t,
                        "t_iter_s": t_mean, "n_timings": n_eff,
                        "source": "readback-drain",
                        "xla_bytes": xla_bytes, "sol_t_s": sol_t,
                        "hbm_util": xla_bytes / t_mean / hbm_bw,
                        "valid": t_mean >= SOL_MARGIN * sol_t,
                    }
                return failure
            # canary-proven untimeable backend (bench.py's regime): a
            # wall-clock here would be a backlog artifact; candidates
            # must not win on noise
            failure["source"] = "untimeable-backend"
            return failure
        try:
            out = dispatch(None)  # warm/compile
            jax.block_until_ready(out)
            prev = None
            t0 = time.perf_counter()
            for _ in range(iters):
                prev = dispatch(prev)
            jax.block_until_ready(prev)
            elapsed = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - profiler poisoned quietly
            # (an empty trace can poison the process without raising)
            print(f"[autotune] wall-clock fallback failed for "
                  f"block_t={block_t}: {e}", file=sys.stderr)
            return failure
        durs, source = [elapsed / iters], "wall-clock"

    t_med = statistics.median(durs)
    return {
        "mode": mode, "block_t": block_t,
        "t_iter_s": t_med, "n_timings": len(durs),
        "source": source,
        "xla_bytes": xla_bytes, "sol_t_s": sol_t,
        "hbm_util": (xla_bytes / t_med / hbm_bw) if t_med > 0 else 0.0,
        "valid": t_med >= SOL_MARGIN * sol_t,
    }


def pick_best(records: Sequence[dict]) -> Optional[dict]:
    """The fastest candidate among physically-possible timings (ties go
    to the smaller block — less VMEM, finer streaming granularity)."""
    valid = [r for r in records if r.get("valid")]
    if not valid:
        return None
    return min(valid, key=lambda r: (r["t_iter_s"], r["block_t"]))


def _worker_cmd(mode, block_t, b, l, h, p, iters):
    return [sys.executable, "-m", "sparsernns_tpu.utils.autotune",
            "--worker", "--mode", mode, "--candidates", str(block_t),
            "--batch", str(b), "--seq-len", str(l), "--d-model", str(h),
            "--p", str(p), "--iters", str(iters)]


def autotune_block_t(mode: str = "fused", candidates=DEFAULT_CANDIDATES,
                     b: int = 8, l: int = 3751, h: int = 192, p: int = 128,
                     iters: int = 8, isolate: Optional[bool] = None,
                     timeout_s: float = 600.0) -> dict:
    """Sweep ``candidates`` and return {records, best}. ``isolate`` runs
    each candidate in a subprocess (default on TPU — see module doc)."""
    import jax

    if isolate is None:
        isolate = jax.default_backend() == "tpu"
    if isolate and jax.default_backend() == "tpu" \
            and not _wallclock_trusted():
        # probe the drain channel ONCE in the parent: the verdict caches
        # into READBACK_ENV and every per-candidate worker inherits it
        from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                    probe_readback_channel)
        probe_readback_channel(chip_peaks()[0])
    records = []
    for bt in candidates:
        if isolate:
            rec = None
            # the tunnel profiler is flaky per-process: one retry in a
            # fresh subprocess recovers most transient failures
            for attempt in range(2):
                try:
                    proc = subprocess.run(
                        _worker_cmd(mode, bt, b, l, h, p, iters),
                        capture_output=True, text=True, timeout=timeout_s,
                        env=dict(os.environ))
                except subprocess.TimeoutExpired:
                    print(f"[autotune] block_t={bt} worker timed out",
                          file=sys.stderr)
                    continue
                sys.stderr.write(proc.stderr[-2000:])
                for line in proc.stdout.splitlines():
                    if line.startswith(_REC_TAG):
                        rec = json.loads(line[len(_REC_TAG):])
                if rec is not None and rec["valid"]:
                    break
                print(f"[autotune] block_t={bt} attempt {attempt + 1} "
                      f"produced {'no' if rec is None else 'an invalid'} "
                      f"record (rc={proc.returncode})", file=sys.stderr)
            if rec is None:
                continue
            records.append(rec)
        else:
            records.append(measure_candidate(mode, bt, b, l, h, p, iters))
        r = records[-1]
        print(f"[autotune] {mode} block_t={r['block_t']}: "
              f"{r['t_iter_s'] * 1e3:.3f} ms/iter ({r['source']}, "
              f"hbm={r['hbm_util']:.2f}, valid={r['valid']})",
              file=sys.stderr)
    return {"mode": mode,
            "shape": {"b": b, "l": l, "h": h, "p": p},
            "records": records,
            "best": pick_best(records)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("sparsernns_tpu.autotune")
    ap.add_argument("--mode", default="fused",
                    choices=["fused", "scan", "layer"])
    ap.add_argument("--candidates", default=None,
                    help="comma-separated block_t values")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=3751)
    ap.add_argument("--d-model", type=int, default=192)
    ap.add_argument("--p", type=int, default=128,
                    help="scanned complex state count")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--persist", action="store_true",
                    help="record the best block_t into the autotune cache "
                         "(runs/autotune.json) consulted at kernel-build "
                         "time — VERDICT r4 #5")
    ap.add_argument("--worker", action="store_true",
                    help="internal: measure in-process and emit one record")
    ap.add_argument("--no-isolate", action="store_true",
                    help="measure all candidates in this process")
    args = ap.parse_args(argv)
    cands = (tuple(int(x) for x in args.candidates.split(","))
             if args.candidates else DEFAULT_CANDIDATES)

    if args.worker:
        rec = measure_candidate(args.mode, cands[0], args.batch,
                                args.seq_len, args.d_model, args.p,
                                args.iters)
        print(_REC_TAG + json.dumps(rec))
        return 0

    res = autotune_block_t(args.mode, cands, args.batch, args.seq_len,
                           args.d_model, args.p, args.iters,
                           isolate=None if not args.no_isolate else False)
    print(json.dumps(res, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
    if args.persist and res["best"] is not None:
        from sparsernns_tpu.utils.autotune_cache import record_best
        b = res["best"]
        key = record_best(
            args.mode, b["block_t"], b=args.batch, l=args.seq_len,
            h=args.d_model, p=args.p,
            meta={"t_iter_s": b["t_iter_s"], "source": b["source"]},
            batch_free=True)
        print(f"[autotune] persisted {key} -> block_t={b['block_t']}",
              file=sys.stderr)
    return 0 if res["best"] is not None else 1


if __name__ == "__main__":
    sys.exit(main())
