"""Post-training quantization / conversion pipeline.

Reference parity: `sparseRNNs/convert.py` (staged pipeline gated by flags):

  restore checkpoint -> re-apply sparsity masks -> [validate_baseline]
  -> [store_activations] -> [validate_naive_scan] -> [validate_aqt /
  train_aqt QAFT] -> calibrate (observers over the val set) -> freeze
  scales -> [validate_static_quant] -> [train_static_quant QAFT with
  frozen scales]

Artifacts are versioned orbax items (ArtifactStore) instead of the
reference's pickles (convert.py:882-971): ``calibrated_params``,
``frozen_params``, ``frozen_stats``, ``activations``, plus
``val_metrics.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.quantize.calibrate import calibrate as run_calibrate
from sparsernns_tpu.quantize.config import quantization_recipes
from sparsernns_tpu.train.checkpoint import ArtifactStore, CheckpointManager
from sparsernns_tpu.train.loop import (build_dataset, build_model,
                                       create_run_state, prep_ndns_batch,
                                       validate_ndns)
from sparsernns_tpu.train.losses import STFT_MAG_MEAN
from sparsernns_tpu.train.steps import (capture_intermediates,
                                        make_ndns_eval_step,
                                        make_ndns_train_step)
from sparsernns_tpu.utils.config import RunConfig
from sparsernns_tpu.utils.logging import logger


def _numeric_only(tree) -> Dict[str, Any]:
    """Keep only numeric array leaves (checkpoint-serializable), keyed by
    their flattened path."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf) if hasattr(leaf, "dtype") else None
        if arr is not None and arr.dtype != object:
            key = jax.tree_util.keystr(path).replace("'", "").replace(
                "[", "").replace("]", ".").strip(".")
            out[key] = arr
    return out


def convert(cfg: RunConfig) -> Dict[str, Any]:
    """Run the staged conversion pipeline. Returns per-stage metrics."""
    cfg = cfg.apply_dim_scale()
    results: Dict[str, Any] = {}

    trainloader, valloader, testloader, n_out, seq_len, d_input, train_size \
        = build_dataset(cfg)
    steps_per_epoch = max(1, len(trainloader))
    example = jnp.zeros((cfg.bsz, seq_len, d_input), jnp.float32)

    # -- restore the trained float model (naive-scan eval variant) --------
    fp_model = build_model(cfg, d_input, n_out, training=False)
    state, pruner = create_run_state(cfg, fp_model, example, steps_per_epoch)
    if cfg.checkpoint_dir:
        mngr = CheckpointManager(cfg.checkpoint_dir)
        step = mngr.latest_step()
        metadata = None
        if step is not None:
            state, metadata = mngr.restore(state, step)
        # Prefer the best epoch (by val quality) — reference
        # convert.py:278-283. The train loop keeps it in a dedicated
        # single-slot manager (<dir>/best) so latest-retention can never
        # GC it; fall back to the main stack when still retained there.
        best = (metadata or {}).get("best_epoch")
        if best is not None and best != step:
            best_dir = os.path.join(cfg.checkpoint_dir, "best")
            if best in set(mngr.all_steps()):
                state, _ = mngr.restore(state, best)
                step = best
            elif os.path.isdir(best_dir):
                best_mngr = CheckpointManager(best_dir)
                if best_mngr.latest_step() is not None:
                    state, _ = best_mngr.restore(state)
                    step = best_mngr.latest_step()
                best_mngr.close()
        if step is not None:
            logger.info("restored checkpoint step %s", step)
        mngr.close()

    # Re-apply sparsity masks so conversion sees pruned weights
    # (reference convert.py:314-329).
    if pruner is not None and state.masks is not None:
        masked = jax.tree_util.tree_map(
            lambda p, m: p * m, state.params, state.masks)
        state = state.replace(params=masked)

    store = ArtifactStore(os.path.join(cfg.checkpoint_dir or ".",
                                       "conversion"))

    def validate(model, params=None, batch_stats=None, mutable=False):
        st = state.replace(params=params if params is not None
                           else state.params)
        if batch_stats is not None:
            st = st.replace(batch_stats=batch_stats)
        eval_fn = make_ndns_eval_step(model, batchnorm=cfg.batchnorm)
        return validate_ndns(st, eval_fn, valloader)

    # -- stage: baseline validation (convert.py:335-356) ------------------
    if cfg.validate_baseline:
        results["baseline"] = validate(fp_model)
        logger.info("baseline: %s", results["baseline"])

    # -- stage: golden activation dump (convert.py:358-374) ---------------
    if cfg.store_activations:
        noisy, clean = next(iter(valloader))
        noisy_mag, _, _ = prep_ndns_batch(jnp.asarray(noisy),
                                          jnp.asarray(clean))
        x = jnp.transpose(noisy_mag - STFT_MAG_MEAN, (0, 2, 1))
        _, intermediates = capture_intermediates(fp_model, state, x)
        store.save("activations", _numeric_only(intermediates))
        store.save("activation_inputs", {"x": np.asarray(x),
                                         "noisy": np.asarray(noisy),
                                         "clean": np.asarray(clean)})
        results["store_activations"] = {"n": len(
            jax.tree_util.tree_leaves(intermediates))}

    # -- stage: associative vs sequential scan parity (convert.py:380-410) -
    if cfg.validate_naive_scan:
        naive_model = build_model(cfg, d_input, n_out, training=False,
                                  scan_mode="sequential")
        results["naive_scan"] = validate(naive_model)
        logger.info("naive scan: %s", results["naive_scan"])

    # -- stage: QAT fake-quant validation / finetuning (convert.py:416-861)
    # QAT stages run the associative scan: the fused-kernel path skips the
    # in-scan activation fake-quant, which would overstate QAT accuracy
    # relative to what calibration/serving actually quantize.
    q_recipe = quantization_recipes[cfg.convert_quantization]
    if cfg.validate_aqt:
        aqt_model = build_model(cfg, d_input, n_out, training=False,
                                q_config=q_recipe(),
                                scan_mode="associative")
        results["qat"] = validate(aqt_model)
        logger.info("QAT fake-quant: %s", results["qat"])
    if cfg.train_aqt:
        results["qaft"] = _finetune(
            cfg, state, build_model(cfg, d_input, n_out, training=True,
                                    q_config=q_recipe(),
                                    scan_mode="associative"),
            trainloader, valloader, pruner, epochs=cfg.qaft_epochs,
            static_quant=False)
        state = results["qaft"].pop("state")

    # -- stage: calibration (convert.py:867-971) ---------------------------
    frozen_params = frozen_stats = None
    if cfg.calibrate_quant:
        cal_cfg = q_recipe(static_quant=True, calibrating=True)
        cal_model = build_model(cfg, d_input, n_out, training=False,
                                q_config=cal_cfg, scan_mode="sequential")

        def batches():
            for noisy, clean in valloader:
                noisy_mag, _, _ = prep_ndns_batch(jnp.asarray(noisy),
                                                  jnp.asarray(clean))
                yield jnp.transpose(noisy_mag - STFT_MAG_MEAN, (0, 2, 1))

        frozen_params, frozen_stats = run_calibrate(
            cal_model, jax.random.PRNGKey(cfg.jax_seed), example,
            state.params, state.batch_stats, batches())
        store.save("frozen_params", jax.tree_util.tree_map(
            np.asarray, frozen_params))
        store.save("frozen_stats", jax.tree_util.tree_map(
            np.asarray, frozen_stats))
        results["calibrated"] = True

    # -- stage: static-quant validation (convert.py:977-1033) --------------
    if cfg.validate_static_quant and frozen_params is not None:
        sq_cfg = q_recipe(static_quant=True, calibrating=False)
        sq_model = build_model(cfg, d_input, n_out, training=False,
                               q_config=sq_cfg, scan_mode="sequential")
        results["static_quant"] = validate(
            sq_model, params=frozen_params, batch_stats=frozen_stats)
        logger.info("static quant: %s", results["static_quant"])
        metrics_path = os.path.join(cfg.checkpoint_dir or ".",
                                    "val_metrics.json")
        with open(metrics_path, "w") as f:
            json.dump({k: v for k, v in results.items()
                       if isinstance(v, dict)}, f, indent=2, default=float)

    # -- stage: serving-engine validation (greenfield: the kernel path the
    # reference only emulates) --------------------------------------------
    if cfg.validate_engine and frozen_params is not None:
        from sparsernns_tpu.fxp.derive import FxpModelConfig
        from sparsernns_tpu.quantize.engine import W8A16Engine
        host_params = jax.tree_util.tree_map(np.asarray, frozen_params)
        host_stats = jax.tree_util.tree_map(np.asarray, frozen_stats)
        engine = W8A16Engine(
            host_params, host_stats,
            q_recipe(static_quant=True, calibrating=False),
            FxpModelConfig.infer(
                host_params, glu_variant=cfg.glu_variant,
                relufication=cfg.relufication, prenorm=cfg.prenorm,
                clip_eigs=cfg.clip_eigs, conj_sym=cfg.conj_sym,
                discretization=cfg.discretization,
                topk=cfg.topk, approx_topk=cfg.approx_topk),
            block_t=cfg.block_t, mxu16=cfg.engine_mxu16)
        losses, snrs = [], []
        from sparsernns_tpu.train.losses import ndns_loss_from_mask
        for noisy, clean in valloader:
            noisy = jnp.asarray(noisy)
            clean = jnp.asarray(clean)
            noisy_mag, noisy_phase, clean_mag = prep_ndns_batch(noisy, clean)
            x = jnp.transpose(noisy_mag - STFT_MAG_MEAN, (0, 2, 1))
            mask = jnp.transpose(engine(x), (0, 2, 1))
            loss, snr, _ = ndns_loss_from_mask(
                mask, noisy_mag, noisy_phase, clean_mag, clean)
            losses.append(float(loss))
            snrs.append(float(snr))
        results["engine"] = {"loss": float(np.mean(losses)),
                             "si_snr": float(np.mean(snrs))}
        logger.info("w8a16 engine: %s", results["engine"])

    # -- stage: QAFT with frozen scales (convert.py:1058-1468) -------------
    if cfg.train_static_quant and frozen_params is not None:
        from sparsernns_tpu.quantize.static import \
            merge_trained_params_into_calibrated
        from sparsernns_tpu.train.state import TrainState
        sq_cfg = q_recipe(static_quant=True, calibrating=False)
        sq_train = build_model(cfg, d_input, n_out, training=True,
                               q_config=sq_cfg, scan_mode="sequential")
        # Fresh optimizer/mask state over the FROZEN tree — it contains
        # new 'scale' leaves the float-tree opt state doesn't know about.
        masks = None
        if state.masks is not None:
            ones = jax.tree_util.tree_map(jnp.ones_like, frozen_params)
            masks = merge_trained_params_into_calibrated(state.masks, ones)
        qaft_state = TrainState.create(
            apply_fn=sq_train.apply, params=frozen_params, tx=state.tx,
            batch_stats=frozen_stats, masks=masks)
        # keep the global step: restarting at 0 would rewind the LR warmup
        # and (worse) make an early pruning-schedule update recompute the
        # masks at ~zero sparsity, silently un-pruning the model
        qaft_state = qaft_state.replace(step=state.step)
        results["qaft_static"] = _finetune(
            cfg, qaft_state, sq_train, trainloader, valloader, pruner,
            epochs=cfg.qaft_epochs, static_quant=True)
        new_state = results["qaft_static"].pop("state")
        store.save("qaft_params", jax.tree_util.tree_map(
            np.asarray, new_state.params))

    return results


def _finetune(cfg, state, model, trainloader, valloader, pruner,
              epochs: int, static_quant: bool) -> Dict[str, Any]:
    """Short QAFT loop reusing the standard step functions (the reference
    duplicates its whole train loop for this; convert.py:519-861)."""
    from sparsernns_tpu.train.loop import run_ndns_epoch
    step_fn = make_ndns_train_step(model, batchnorm=cfg.batchnorm,
                                   pruner=pruner,
                                   static_quant=static_quant)
    eval_fn = make_ndns_eval_step(model.clone(training=False),
                                  batchnorm=cfg.batchnorm, pruner=pruner)
    # masks are FROZEN during finetuning (the reference likewise only
    # re-applies existing masks during conversion, convert.py:314-329)
    mask_update = lambda s: s
    rng = jax.random.PRNGKey(cfg.jax_seed + 1)
    history = []
    for epoch in range(epochs):
        rng, erng = jax.random.split(rng)
        state, train_metrics = run_ndns_epoch(
            state, step_fn, mask_update, trainloader, erng)
        val = validate_ndns(state, eval_fn, valloader)
        history.append({**train_metrics, **{f"val_{k}": v
                                            for k, v in val.items()}})
        logger.info("qaft epoch %d: %s", epoch, history[-1])
    return {"state": state, "history": history}
