"""Seed-2 quality-collapse root cause (VERDICT r4 #4).

Seeds 0/1 of the flagship quality sweep train to ~7.7 dB val SI-SNR;
seed 2 plateaus at ~2.4-3.4 — reproduced at the round-5 defaults
(runs/quality_r5). Its TRAIN loss falls normally (107.6 -> 89.4, same
as seed 0), so it is not an optimization failure; and in this harness
the jax_seed also seeds the SYNTHETIC DATASET, so "seed" bundles
model-init, dropout, AND data.

This tool decouples them with a cross evaluation: every trained model
(by seed) is evaluated on every seed's VALIDATION SET.

  - If seed-0's strong model ALSO scores ~2-3 dB on seed-2's val data,
    the collapse is a property of seed-2's synthetic clips (harder val
    draw: SNR mix / clip statistics), not of seed-2's training.
  - If seed-2's model scores badly everywhere while seed-0's model
    scores well on seed-2 data, the trajectory itself is at fault.

Run after tools/quality_sweep.py: needs the per-seed checkpoints in
<sweep_out>/seed{N}. Writes runs/quality_r5/seed2_diag.json.

Usage: JAX_PLATFORMS=cpu python tools/seed2_diag.py \
          [--seeds 0 2] [--out runs/quality_r5]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def _load_state(cfg, model, steps_per_epoch, d_input):
    """create_run_state + best-checkpoint restore (convert.py's rule)."""
    from sparsernns_tpu.train.checkpoint import CheckpointManager
    from sparsernns_tpu.train.loop import create_run_state
    example = jnp.zeros((cfg.bsz, 16, d_input), jnp.float32)
    state, _ = create_run_state(cfg, model, example, steps_per_epoch)
    mngr = CheckpointManager(cfg.checkpoint_dir)
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {cfg.checkpoint_dir}")
    state, metadata = mngr.restore(state, step)
    best = (metadata or {}).get("best_epoch")
    if best is not None and best != step:
        best_dir = os.path.join(cfg.checkpoint_dir, "best")
        if best in set(mngr.all_steps()):
            state, _ = mngr.restore(state, best)
        elif os.path.isdir(best_dir):
            bm = CheckpointManager(best_dir)
            if bm.latest_step() is not None:
                state, _ = bm.restore(state)
            bm.close()
    mngr.close()
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 2])
    ap.add_argument("--out", default="runs/quality_r5")
    ap.add_argument("--epochs", type=int, default=25)
    args = ap.parse_args()

    from tools.quality_sweep import flagship_cfg

    from sparsernns_tpu.train.loop import (build_dataset, build_model,
                                           validate_ndns)
    from sparsernns_tpu.train.steps import make_ndns_eval_step

    # one eval-model per model-seed (restored best checkpoint)
    states, models, cfgs = {}, {}, {}
    for ms in args.seeds:
        cfg = flagship_cfg(ms, args.epochs,
                           os.path.join(args.out, f"seed{ms}"),
                           mxu16=False)
        (trainloader, *_rest) = build_dataset(cfg)
        steps_per_epoch = max(1, len(trainloader))
        model = build_model(cfg, d_input=257, d_output=257,
                            training=False)
        states[ms] = _load_state(cfg, model, steps_per_epoch, 257)
        models[ms] = model
        cfgs[ms] = cfg
        print(f"[diag] restored model seed {ms}", file=sys.stderr,
              flush=True)

    table = {}
    for ms, ds in itertools.product(args.seeds, args.seeds):
        cfg_d = cfgs[ds]
        _, valloader, *_ = build_dataset(cfg_d)
        eval_fn = make_ndns_eval_step(models[ms],
                                      batchnorm=cfg_d.batchnorm)
        m = validate_ndns(states[ms], eval_fn, valloader)
        table[f"model{ms}-data{ds}"] = {
            "si_snr": round(m["si_snr"], 3), "loss": round(m["loss"], 3)}
        print(f"[diag] model seed {ms} on data seed {ds}: "
              f"si_snr {m['si_snr']:.3f}", file=sys.stderr, flush=True)

    # verdict: data-driven iff the strong model drops on the weak seed's
    # data by most of the gap
    out = {"tool": "seed2_diag", "table": table}
    try:
        strong, weak = args.seeds[0], args.seeds[-1]
        own_gap = (table[f"model{strong}-data{strong}"]["si_snr"]
                   - table[f"model{weak}-data{weak}"]["si_snr"])
        cross_drop = (table[f"model{strong}-data{strong}"]["si_snr"]
                      - table[f"model{strong}-data{weak}"]["si_snr"])
        out["own_gap_db"] = round(own_gap, 3)
        out["strong_model_cross_drop_db"] = round(cross_drop, 3)
        out["verdict"] = ("data-difficulty" if cross_drop > 0.6 * own_gap
                          else "trajectory")
    except KeyError:
        pass
    path = os.path.join(args.out, "seed2_diag.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
