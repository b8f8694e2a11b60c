"""Hardware sweeps the round-4 timing channel unlocked: block_t
autotune (in one warm process) and an engine batch-size sweep.

Both answer "where is the 7.4x between the measured engine forward
(1.64 ms @ B=8) and its padded-MXU floor (0.22 ms)?" — the two cheap
levers are the kernels' time-block size and batch amortization of the
sequential time-chain overhead.

In-process is safe now: the per-candidate subprocess isolation in
utils/autotune.py predates the round-4 root-cause fix (async complex64
transfer poisoning, PERF.md) — the phantom refusals/wedges it guarded
against don't occur with complex kept host-side, and one transport
warm-up (~6-9 min) amortizes over the whole sweep.

Usage:
  python tools/hw_sweeps.py --autotune            # block_t sweep
  python tools/hw_sweeps.py --batch-sweep         # engine batch sweep
  python tools/hw_sweeps.py --autotune --batch-sweep

Appends records to runs/hw_sweeps.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)


def run_autotune(out, candidates=(128, 256, 512, 1024)):
    from sparsernns_tpu.utils.autotune import autotune_block_t
    results = _load(out)
    for mode in ("layer", "fused", "scan"):
        t0 = time.time()
        res = autotune_block_t(mode=mode, candidates=candidates,
                               isolate=False)
        res["elapsed_s"] = round(time.time() - t0, 1)
        res["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        results.setdefault("autotune", {})[mode] = res
        _save(out, results)
        best = res.get("best") or {}
        print(f"[hw] autotune {mode}: best block_t="
              f"{best.get('block_t')} t={best.get('t_iter_s', 0) * 1e3:.3f}ms"
              f" ({res['elapsed_s']}s)", file=sys.stderr, flush=True)
    return results


def run_engine_blockt(out, block_ts=(256, 512, 1024), batches=(8, 32),
                      mxu16=False):
    """Full-engine block_t A/B at serving batches — the per-kernel
    autotune (layer best 512 vs the engine default 256) predicts ~25%;
    measure it end-to-end before changing the default.

    ``mxu16=True`` sweeps the int-dot engine instead (VERDICT r4 #2):
    the kernel-unit probe (runs/kernel_probe.json) measured the full
    int16 two-plane dot FASTER than one f32 dot in a clean kernel, so
    the engine-level 2.5x regression at B=32/bt=512 is suspected to be
    a VMEM cliff from the extra mxu16 operands — a bt sweep decides."""
    import bench
    from sparsernns_tpu.utils.profiling import chip_peaks
    peaks = chip_peaks()
    bench.ensure_regime(peaks)
    results = _load(out)
    tag = "mxu16-" if mxu16 else ""
    for b in batches:
        for bt in block_ts:
            if 3751 // bt < 1:
                continue
            t0 = time.time()
            try:
                rec = bench.bench_w8a16_engine(
                    peaks, batch=b, block_t=bt, mxu16=mxu16,
                    name=f"w8a16-engine-{tag}b{b}-bt{bt}")
            except Exception as e:  # noqa: BLE001
                rec = {"name": f"w8a16-engine-{tag}b{b}-bt{bt}",
                       "error": repr(e)[:200], "valid": False}
            rec["elapsed_s"] = round(time.time() - t0, 1)
            rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
            results.setdefault("engine_blockt", {})[
                f"{tag}b{b}-bt{bt}"] = rec
            _save(out, results)
            print(f"[hw] engine {tag}b={b} bt={bt}: "
                  f"{rec.get('frames_per_sec', 0):,.0f} frames/s "
                  f"t={rec.get('t_iter_ms', 0):.3f}ms "
                  f"valid={rec.get('valid')}", file=sys.stderr, flush=True)
    return results


def run_batch_sweep(out, batches=(8, 16, 32, 64)):
    import bench
    from sparsernns_tpu.utils.profiling import chip_peaks
    peaks = chip_peaks()
    bench.ensure_regime(peaks)
    results = _load(out)
    for b in batches:
        t0 = time.time()
        try:
            rec = bench.bench_w8a16_engine(peaks, batch=b,
                                           name=f"w8a16-engine-b{b}")
        except Exception as e:  # noqa: BLE001 — record refusals/OOM too
            rec = {"name": f"w8a16-engine-b{b}", "error": repr(e)[:200],
                   "valid": False}
        rec["elapsed_s"] = round(time.time() - t0, 1)
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        results.setdefault("batch_sweep", {})[str(b)] = rec
        _save(out, results)
        print(f"[hw] batch {b}: {rec.get('frames_per_sec', 0):,.0f} "
              f"frames/s t={rec.get('t_iter_ms', 0):.3f}ms "
              f"valid={rec.get('valid')}", file=sys.stderr, flush=True)
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--autotune", action="store_true")
    ap.add_argument("--batch-sweep", action="store_true")
    ap.add_argument("--engine-blockt", action="store_true")
    ap.add_argument("--mxu16-blockt", action="store_true",
                    help="int-dot engine block_t sweep (VERDICT r4 #2 "
                         "VMEM-cliff hypothesis)")
    ap.add_argument("--candidates", default="128,256,512,1024")
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "hw_sweeps.json"))
    args = ap.parse_args(argv)

    # enable the drain channel verdict for in-process timing
    import bench
    from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                probe_readback_channel)
    if probe_readback_channel(chip_peaks()[0]):
        bench._REGIME.update({"wallclock": False, "saturation": False,
                              "readback": True})
    results = {}
    if args.autotune:
        results = run_autotune(
            args.out, tuple(int(c) for c in args.candidates.split(",")))
    if args.batch_sweep:
        results = run_batch_sweep(
            args.out, tuple(int(b) for b in args.batches.split(",")))
    if args.engine_blockt:
        results = run_engine_blockt(args.out)
    if args.mxu16_blockt:
        results = run_engine_blockt(
            args.out, block_ts=(128, 256, 512),
            batches=tuple(int(b) for b in args.batches.split(",")),
            mxu16=True)
    summary = {"table": args.out,
               "autotune_best": {m: (r.get("best") or {}).get("block_t")
                                 for m, r in
                                 results.get("autotune", {}).items()},
               "batch_best": max(
                   (r for r in results.get("batch_sweep", {}).values()
                    if r.get("valid")),
                   key=lambda r: r.get("frames_per_sec", 0),
                   default={}).get("name")}
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
