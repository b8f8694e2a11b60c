"""mxu16 engine site ablation (VERDICT r4 #2 localization).

The kernel-unit probe (runs/kernel_probe.json) measured the full int16
two-plane dot FASTER than one f32 dot at the engine's shapes, yet the
mxu16 ENGINE runs 2.4x slower than the float engine at every batch and
block_t (runs/hw_sweeps.json mxu16-blockt sweep). This tool disables one
int-dot site class at a time (timing-only — numerics intentionally
differ per variant) and times the engine forward, so the penalty is
attributed to a specific site instead of "the mode":

  full         the shipped mxu16 engine (reference point)
  no_mixer16   B-projection back to float dots
  no_state16   C-projection back to float dots
  no_glu       GLU gate dense back to float dots
  no_bound     encoder/decoder boundary dots back to float
  no_requants  but/yt/out2_out elementwise requants skipped
  none         all of the above (should track the float engine)
  float        the float engine itself (baseline)

Site fields are nulled on the engine's layer params AFTER construction
but BEFORE the first forward — statics are read at trace time, so the
first call bakes the ablated configuration.

Usage: python tools/mxu16_ablate.py [--batch 32] [--block-t 512]
Appends to runs/mxu16_ablate.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(variant: str, batch: int, block_t: int):
    import bench
    mxu16 = variant != "float"
    engine, variables, x = bench._build_engine(
        batch, 3751, 257, mxu16=mxu16, block_t=block_t)
    if mxu16 and variant != "full":
        for lp in engine.weights["layers"]:
            if variant in ("no_mixer16", "none"):
                lp.mixer_in16 = None
            if variant in ("no_state16", "none"):
                lp.state16 = False
            if variant in ("no_glu", "none"):
                lp.out2_in_scale = None
                lp.out1_in_scale = None
            if variant in ("no_requants", "none"):
                lp.but_requant = lp.yt_requant = None
                lp.out2_out_requant = lp.out1_out_requant = None
        if variant in ("no_bound", "none"):
            engine.encoder_in_scale = engine.decoder_in_scale = None
            engine.encoder_out_requant = None
            engine.decoder_out_requant = None
    return engine, x


VARIANTS = ["full", "no_mixer16", "no_state16", "no_glu", "no_bound",
            "no_requants", "none", "float"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--block-t", type=int, default=512)
    ap.add_argument("--variants", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "mxu16_ablate.json"))
    args = ap.parse_args()
    variants = args.variants.split(",") if args.variants else VARIANTS

    import jax
    import jax.numpy as jnp

    import bench
    from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                readback_drain_time)
    peaks = chip_peaks()
    bench.ensure_regime(peaks)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    key0 = f"b{args.batch}-bt{args.block_t}"
    recs = results.setdefault(key0, {})

    for v in variants:
        t0 = time.time()
        try:
            engine, x = build(v, args.batch, args.block_t)

            # bench_w8a16_engine's own dispatch structure: layout pins +
            # weight-leaf chaining (a raw `x + eps*prev` add lands in the
            # default tiled layout and the pinned jit rejects it)
            def bench_target(w, xi, _e=engine):
                return _e._apply(w, xi, block_t=_e.block_t)
            pins = engine._io_format_pins()
            fwd = bench._jit_for_bench(bench_target, engine.weights, x,
                                       pins=pins)
            if pins:
                x = jax.device_put(x, pins["out_shardings"])
            dispatch = bench._chained_dispatch(fwd, engine.weights, x,
                                               ("encoder_bias",))
            frames = args.batch * 3751
            # rough floor for drain sizing
            sol = 0.22e-3 * args.batch / 8.0
            if jax.default_backend() == "tpu":
                elapsed, n_eff = readback_drain_time(dispatch, 16, sol)
            else:
                out = dispatch(None)
                jax.block_until_ready(out)
                t1 = time.perf_counter()
                prev = None
                for _ in range(3):
                    prev = dispatch(prev)
                jax.block_until_ready(prev)
                elapsed, n_eff = time.perf_counter() - t1, 3
            t = elapsed / max(n_eff, 1)
            rec = {"variant": v, "t_ms": round(t * 1e3, 4),
                   "frames_per_sec": round(frames / t, 0),
                   "timing_only": v not in ("full", "float"),
                   "n_eff": n_eff,
                   "elapsed_s": round(time.time() - t0, 1),
                   "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        except Exception as e:  # noqa: BLE001
            rec = {"variant": v, "error": repr(e)[:300]}
        recs[v] = rec
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"[mxu16] {v}: {rec.get('t_ms')} ms {rec.get('error', '')}",
              file=sys.stderr, flush=True)

    base = recs.get("full", {}).get("t_ms")
    summary = {"tool": "mxu16_ablate", "key": key0, "full_t_ms": base}
    for v, rec in recs.items():
        t = rec.get("t_ms")
        if base and t and v != "full":
            summary[f"saved_{v}_ms"] = round(base - t, 4)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
