"""Attribute the saturated engine's gap to its padded-MXU floor.

The round-4 batch sweep pinned the serving engine at ~63.9M frames/s
(B=32, block_t=512) — 2.2x above its padded-MXU floor. This tool times
the whole-network kernel with pieces ablated (scan_kernel.ABLATION,
timing-only wrong-numerics variants) to say WHERE the 2.2x lives:

  baseline        the real engine forward
  noscan          doubling passes removed  -> scan-pass VPU share
  nodots          float dots replaced      -> MXU share
  bf16dots        f32 dots run in bf16     -> f32-multi-pass penalty
  noscan+nodots   both removed             -> grid/io/elementwise floor

Also times the bit-exact mxu16 (int8-MXU two-plane) engine at the same
saturated batch — the production candidate if the f32-dot penalty is the
gap. Appends to runs/ablate_net.json and prints one summary JSON line.

Usage: python tools/ablate_net.py [--batch 32] [--block-t 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "runs", "ablate_net.json")


def _load(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--block-t", type=int, default=512)
    ap.add_argument("--skip-mxu16", action="store_true")
    ap.add_argument("--variants", type=str, default=None,
                    help="comma-separated subset (e.g. 'baseline,noscan')")
    ap.add_argument("--tag", type=str, default=None,
                    help="suffix for the record key (A/B across code "
                         "changes without overwriting)")
    args = ap.parse_args()

    import bench
    from sparsernns_tpu.ops.pallas.scan_kernel import ABLATION
    from sparsernns_tpu.utils.profiling import chip_peaks
    peaks = chip_peaks()
    regime = bench.ensure_regime(peaks)
    print(f"[ablate] regime: {regime}", file=sys.stderr, flush=True)

    results = _load(OUT)
    key = f"b{args.batch}-bt{args.block_t}"
    if args.tag:
        key += f"-{args.tag}"
    recs = results.setdefault(key, {})

    from sparsernns_tpu.ops.pallas.fused_layer import INTERLEAVE

    # "interleave" is a real CANDIDATE (valid numerics — half-block
    # MXU/VPU stagger, fused_layer.INTERLEAVE), not a wrong-numerics
    # ablation; it rides the same A/B machinery.
    variants = [None, "noscan", "nodots", "bf16dots", "noscan+nodots",
                "interleave"]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants if (v or "baseline") in keep]
    for flag in variants:
        name = flag or "baseline"
        # ABLATION/INTERLEAVE are read at TRACE time (scan_kernel.py):
        # a stale jit cache would silently reuse the previous variant's
        # executable. bench_w8a16_engine builds a fresh engine (fresh
        # outer jit) per call, and clearing the global jit caches also
        # invalidates module-level jitted helpers (ADVICE r4).
        import jax
        jax.clear_caches()
        if flag == "interleave":
            INTERLEAVE[0] = True
        else:
            ABLATION[0] = flag
        t0 = time.time()
        try:
            rec = bench.bench_w8a16_engine(
                peaks, batch=args.batch, block_t=args.block_t,
                name=f"ablate-{name}")
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"name": f"ablate-{name}", "error": repr(e)[:200],
                   "valid": False}
        finally:
            ABLATION[0] = None
            INTERLEAVE[0] = False
        rec["elapsed_s"] = round(time.time() - t0, 1)
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        if flag is not None and flag != "interleave":
            rec["timing_only"] = True  # numerics intentionally wrong
        recs[name] = rec
        _save(OUT, results)
        print(f"[ablate] {name}: t={rec.get('t_iter_ms', 0):.3f}ms "
              f"valid={rec.get('valid')}", file=sys.stderr, flush=True)

    if not args.skip_mxu16:
        t0 = time.time()
        try:
            rec = bench.bench_w8a16_engine(
                peaks, batch=args.batch, block_t=args.block_t,
                mxu16=True, name="ablate-mxu16")
        except Exception as e:  # noqa: BLE001
            rec = {"name": "ablate-mxu16", "error": repr(e)[:200],
                   "valid": False}
        rec["elapsed_s"] = round(time.time() - t0, 1)
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        recs["mxu16"] = rec
        _save(OUT, results)
        print(f"[ablate] mxu16: t={rec.get('t_iter_ms', 0):.3f}ms "
              f"valid={rec.get('valid')}", file=sys.stderr, flush=True)

    # share_* = fraction of the baseline removed by ablating a piece —
    # only meaningful for the wrong-numerics timing ablations. The
    # valid-numerics CANDIDATES (interleave, mxu16) are A/B speedups,
    # reported under speedup_* (= base/t, >1 means faster) so later
    # roadmap reads can't mistake a slowdown for an attribution share
    # (ADVICE r4).
    base = recs.get("baseline", {}).get("t_iter_ms")
    summary = {"tool": "ablate_net", "key": key, "base_t_ms": base}
    candidates = {"interleave", "mxu16"}
    for name, rec in recs.items():
        t = rec.get("t_iter_ms")
        if base and t and name != "baseline":
            if name in candidates:
                summary[f"speedup_{name}"] = round(base / t, 4)
            else:
                summary[f"share_{name}"] = round(1.0 - t / base, 4)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
