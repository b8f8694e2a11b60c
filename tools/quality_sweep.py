"""Multi-seed flagship quality sweep (VERDICT r2 #4).

The round-2 flagship SI-SNR table quoted single-seed deltas (±0.04 dB)
on a task whose measured stream-to-stream spread is ~1.4 dB. This script
reruns the full protocol over N seeds and reports mean ± std per stage:

  per seed: train the flagship NDNS config (3 layers, d_model 192,
  ssm_size 256, L=3751 true 30 s clips, relufied, prenorm+BN, fused
  kernels, 25 epochs on 32 synthetic clips — the real corpus swaps in
  unchanged when NDNS_{TRAIN,VALIDATION,TEST}_SET are populated, this
  image has none) -> conversion pipeline (baseline / static-quant /
  w8a16 engine float-dot / engine mxu16 / fxp integer engine).

Run:  JAX_PLATFORMS=cpu python tools/quality_sweep.py [--seeds 0 1 2]
      [--epochs 25] [--out runs/quality_r3]
Writes per-seed JSON + a summary table to <out>/summary.json and stdout.
Reference protocol: convert.py:1014-1020, fxprun.py:497-513.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# quality runs need device->host readback; force CPU before ANY backend
# init (the tunnel TPU backend cannot read back — PERF.md canary
# evidence; probing jax.default_backend() first would itself initialize
# the axon backend and make this switch too late)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def flagship_cfg(seed: int, epochs: int, ckpt_dir: str, mxu16: bool,
                 quant: str = "w8a16", pruning: str = "no_prune",
                 block_t: int = 512, data_seed=None):
    from sparsernns_tpu.utils.config import RunConfig
    # block_t defaults to 512 — the round-4 measured engine/kernel
    # default (PERF.md engine_blockt A/B) — so quality evidence tracks
    # the shipped configuration (VERDICT r4 weak #7).
    return RunConfig(
        checkpoint_dir=ckpt_dir,
        dataset="ndns", synthetic_data=True, synthetic_size=32,
        synthetic_seconds=30.0, bsz=8,
        n_layers=3, d_model=192, ssm_size_base=256, blocks=16,
        glu_variant="half1", clip_eigs=True, prenorm=True, batchnorm=True,
        relufication=True, scan_mode="fused", block_t=block_t,
        p_dropout=0.05, jax_seed=seed, data_seed=data_seed, epochs=epochs,
        warmup_end=1, opt_config="noBCdecay", logger="none",
        validate_baseline=True, calibrate_quant=True,
        validate_static_quant=True, validate_engine=True,
        engine_mxu16=mxu16, convert_quantization=quant, pruning=pruning,
    )


def run_seed(seed: int, epochs: int, out_dir: str,
             quant: str = "w8a16", pruning: str = "no_prune",
             block_t: int = 512, data_seed=None):
    from sparsernns_tpu.fxp import runner as fxp_runner
    from sparsernns_tpu.quantize.convert import convert
    from sparsernns_tpu.train.loop import train

    # pruned training is a different run; quant-only changes reuse the
    # dense checkpoint (conversion recalibrates per recipe)
    sub = f"seed{seed}" + ("" if pruning == "no_prune" else f"_{pruning}") \
        + ("" if data_seed is None else f"_data{data_seed}")
    ckpt = os.path.join(out_dir, sub)
    os.makedirs(ckpt, exist_ok=True)
    cfg = flagship_cfg(seed, epochs, ckpt, mxu16=False, quant=quant,
                       pruning=pruning, block_t=block_t,
                       data_seed=data_seed)

    print(f"[quality] seed {seed}: training {epochs} epochs...",
          flush=True)
    summary = train(cfg)
    row = {"seed": seed, "quant": quant, "pruning": pruning,
           "best_val_si_snr": (summary.get("metadata") or {}).get(
               "best_si_snr")}

    print(f"[quality] seed {seed}: conversion pipeline...", flush=True)
    results = convert(cfg)
    row["fp32"] = results.get("baseline", {}).get("si_snr")
    row["static_quant"] = results.get("static_quant", {}).get("si_snr")
    row["engine_float"] = results.get("engine", {}).get("si_snr")

    # mxu16 engine on the SAME frozen artifacts (rerun only the engine
    # stage: calibration artifacts are already stored)
    cfg16 = dataclasses.replace(cfg, engine_mxu16=True,
                                validate_baseline=False,
                                validate_static_quant=False)
    results16 = convert(cfg16)
    row["engine_mxu16"] = results16.get("engine", {}).get("si_snr")

    print(f"[quality] seed {seed}: fxp integer engine...", flush=True)
    fxp_metrics = fxp_runner.run_inference(cfg)
    row["fxp"] = fxp_metrics.get("Val Acc - fxp")

    with open(os.path.join(out_dir, sub, _row_name(quant, pruning)),
              "w") as f:
        json.dump(row, f, indent=2)
    print(f"[quality] seed {seed}: {row}", flush=True)
    return row


def _row_name(quant: str, pruning: str) -> str:
    suffix = "" if (quant == "w8a16" and pruning == "no_prune") else (
        f"_{quant}" + ("" if pruning == "no_prune" else f"_{pruning}"))
    return f"quality_row{suffix}.json"


STAGES = ["fp32", "static_quant", "engine_float", "engine_mxu16", "fxp"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--out", default="runs/quality_r5")
    ap.add_argument("--block_t", type=int, default=512)
    ap.add_argument("--data-seed", type=int, default=None,
                    help="dataset seed override (decouples data draw "
                         "from init/dropout — seed-2 investigation)")
    ap.add_argument("--quant", default="w8a16",
                    help="conversion recipe (reuses trained checkpoints)")
    ap.add_argument("--pruning", default="no_prune")
    ap.add_argument("--summarize-only", action="store_true",
                    help="aggregate existing per-seed rows")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rows = []
    for seed in args.seeds:
        sub = (f"seed{seed}"
               + ("" if args.pruning == "no_prune" else f"_{args.pruning}")
               + ("" if args.data_seed is None
                  else f"_data{args.data_seed}"))
        row_path = os.path.join(args.out, sub,
                                _row_name(args.quant, args.pruning))
        if os.path.exists(row_path):
            with open(row_path) as f:
                rows.append(json.load(f))
            print(f"[quality] seed {seed}: cached {rows[-1]}", flush=True)
            continue
        if args.summarize_only:
            continue
        rows.append(run_seed(seed, args.epochs, args.out,
                             quant=args.quant, pruning=args.pruning,
                             block_t=args.block_t,
                             data_seed=args.data_seed))

    if not rows:
        print("[quality] no rows", flush=True)
        return 1
    summary = {"n_seeds": len(rows), "rows": rows, "stages": {}}
    print(f"\n[quality] === {len(rows)}-seed flagship table ===")
    for st in STAGES:
        # a partial/stale row (a stage skipped or a cached older format)
        # must not lose the whole summary — aggregate the complete pairs
        pairs = [(r[st], r["fp32"]) for r in rows
                 if r.get(st) is not None and r.get("fp32") is not None]
        if not pairs:
            print(f"[quality] {st:14s} (no complete rows)", flush=True)
            continue
        vals = np.asarray([p[0] for p in pairs], np.float64)
        delta = vals - np.asarray([p[1] for p in pairs], np.float64)
        summary["stages"][st] = {
            "n": len(pairs),
            "mean": float(vals.mean()), "std": float(vals.std(ddof=0)),
            "delta_mean": float(delta.mean()),
            "delta_std": float(delta.std(ddof=0)),
        }
        print(f"[quality] {st:14s} {vals.mean():7.3f} ± {vals.std():5.3f} dB"
              f"   Δvs fp32 {delta.mean():+6.3f} ± {delta.std():5.3f}"
              f"   (n={len(pairs)})", flush=True)
    summary_name = _row_name(args.quant, args.pruning).replace(
        "quality_row", "summary")
    with open(os.path.join(args.out, summary_name), "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
