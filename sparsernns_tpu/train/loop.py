"""Training orchestrator: dataset -> model -> epoch loop -> checkpoints.

Reference parity: `sparseRNNs/train.py` (train(): RNG setup, dataset
creation, HiPPO init, model assembly, train state, orbax restore/save,
epoch loop with val+test, early stopping, LR/eigenvalue/sparsity logging)
and the epoch drivers in train_helpers.py (train_epoch_ndns :812,
validate_ndns :1215).

TPU-first: one natively-batched jitted step; data-parallel/TP execution is
a sharding annotation (parallel/), not a code path; host->device transfer
overlaps via the loader's prefetch thread.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sparsernns_tpu.data.ndns import create_ndns_dataset
from sparsernns_tpu.models.seq_model import (ClassificationModel,
                                             RegressionModel)
from sparsernns_tpu.models.ssm import make_ssm_init_fn
from sparsernns_tpu.models.ssm_init import blocked_dplr_init
from sparsernns_tpu.ops.stft import stft_splitter
from sparsernns_tpu.quantize.config import quantization_recipes
from sparsernns_tpu.train.checkpoint import CheckpointManager
from sparsernns_tpu.train.optim import create_optimizer, extract_learning_rates
from sparsernns_tpu.train.pruning import (MagnitudePruner, pruning_recipes,
                                          summarize_sparsity)
from sparsernns_tpu.train.state import TrainState, count_params
from sparsernns_tpu.train.steps import (make_mask_update_fn,
                                        make_ndns_eval_step,
                                        make_ndns_train_step)
from sparsernns_tpu.utils.config import RunConfig
from sparsernns_tpu.utils.logging import (compute_eigenvalue_logs, logger,
                                          make_sink)


def build_model(cfg: RunConfig, d_input: int, d_output: int,
                training: bool, q_config=None, scan_mode: Optional[str] = None,
                calibrating: Optional[bool] = None, sp_mesh=None):
    """Assemble the model from config (reference train.py:97-169).

    ``sp_mesh``: sequence-parallel training — the mixer's scan shards the
    time axis over the mesh's SEQ axis (scan_mode is forced to "sp")."""
    if q_config is None:
        q_config = quantization_recipes[cfg.quantization]()
    if calibrating is not None:
        q_config = q_config.replace(calibrating=calibrating)
    init = blocked_dplr_init(cfg.ssm_size_base, cfg.blocks, cfg.conj_sym)
    mixer = make_ssm_init_fn(
        h=cfg.d_model, p=init["P"], lambda_init=init["Lambda"],
        v=init["V"], vinv=init["Vinv"], c_init=cfg.C_init,
        discretization=cfg.discretization, dt_min=cfg.dt_min,
        dt_max=cfg.dt_max, conj_sym=cfg.conj_sym, clip_eigs=cfg.clip_eigs,
        bidirectional=cfg.bidirectional, relufication=cfg.relufication,
        q_config=q_config,
        scan_mode="sp" if sp_mesh is not None
        else (scan_mode or cfg.scan_mode),
        sp_mesh=sp_mesh, block_t=cfg.block_t,
        qat_global_scales=cfg.qat_global_scales)
    common = dict(
        mixer_cls=mixer, n_layers=cfg.n_layers, d_model=cfg.d_model,
        dropout=cfg.p_dropout, batchnorm=cfg.batchnorm, prenorm=cfg.prenorm,
        bn_momentum=cfg.bn_momentum, glu_variant=cfg.glu_variant,
        training=training, relufication=cfg.relufication,
        fuse_batchnorm_linear=cfg.fuse_batchnorm_linear, q_config=q_config,
        use_batchnorm_scale=cfg.batchnorm_use_scale,
        use_batchnorm_bias=cfg.batchnorm_use_bias, topk=cfg.topk,
        approx_topk=cfg.approx_topk, quant_input=cfg.quant_input,
        stream_dtype=cfg.train_stream_dtype if training else "float32",
        d_output=d_output)
    if cfg.dataset == "ndns":
        return RegressionModel(**common)
    return ClassificationModel(**common, mode=cfg.mode)


def build_dataset(cfg: RunConfig, num_shards: int = 1, shard_index: int = 0):
    """Dataset registry (reference `Datasets` map, dataloading.py:149-151,
    which likewise only wires ndns; classification tasks here use the
    synthetic registry entry)."""
    data_seed = cfg.jax_seed if cfg.data_seed is None else cfg.data_seed
    if cfg.dataset == "ndns":
        return create_ndns_dataset(
            cfg.bsz, seed=data_seed,
            synthetic=True if cfg.synthetic_data else None,
            synthetic_size=cfg.synthetic_size,
            synthetic_length=int(cfg.synthetic_seconds * 16000),
            num_shards=num_shards, shard_index=shard_index)
    if cfg.dataset == "synthetic-classification":
        from sparsernns_tpu.data.classification import \
            create_classification_dataset
        return create_classification_dataset(
            cfg.bsz, seed=data_seed, size=cfg.synthetic_size,
            num_shards=num_shards, shard_index=shard_index)
    if cfg.dataset in ("smnist", "psmnist"):
        # torch-free sequential MNIST (reference basic.py:14-60); needs
        # the IDX files on disk (SMNIST_DATA_DIR) — FileNotFoundError
        # otherwise, matching the NDNS env-var gating style
        from sparsernns_tpu.data.classification import \
            create_smnist_dataset
        return create_smnist_dataset(
            cfg.bsz, permute=(cfg.dataset == "psmnist"),
            seed=data_seed, num_shards=num_shards,
            shard_index=shard_index)
    raise NotImplementedError(f"dataset {cfg.dataset!r} not registered")


@jax.jit
def prep_ndns_batch(noisy, clean):
    """Host audio -> STFT features on device (reference prep in
    train_helpers.py:853-861 + stft_splitter)."""
    noisy_mag, noisy_phase = stft_splitter(noisy)
    clean_mag, _ = stft_splitter(clean)
    return noisy_mag, noisy_phase, clean_mag


def create_run_state(cfg: RunConfig, model, example_input,
                     steps_per_epoch: int
                     ) -> Tuple[TrainState, Optional[MagnitudePruner]]:
    variables = model.init(jax.random.PRNGKey(cfg.jax_seed), example_input)
    total_steps = steps_per_epoch * cfg.epochs
    warmup_steps = steps_per_epoch * cfg.warmup_end
    tx = create_optimizer(
        cfg.opt_config, lr=cfg.lr, ssm_lr=cfg.ssm_lr_base,
        weight_decay=cfg.weight_decay, total_steps=total_steps,
        warmup_steps=warmup_steps,
        grad_clip_threshold=cfg.grad_clip_threshold,
        dt_global=cfg.dt_global, lr_min=cfg.lr_min,
        schedule="constant" if cfg.lr_schedule == "plateau" else "cosine")

    prune_cfg = pruning_recipes(cfg.epochs, steps_per_epoch)[cfg.pruning]
    pruner = MagnitudePruner(prune_cfg) if prune_cfg.enabled else None
    masks = pruner.init_masks(variables["params"]) if pruner else None

    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"), masks=masks)
    logger.info("trainable parameters: %d", count_params(state.params))
    return state, pruner


def _default_place_batch(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _epoch_means(acc: Dict[str, list]) -> Dict[str, float]:
    return {f"train_{k}": float(jnp.mean(jnp.stack(v)))
            for k, v in acc.items()}


def _accumulate(acc: Dict[str, list], metrics: Dict[str, Any]):
    for k, v in metrics.items():
        acc.setdefault(k, []).append(v)


def run_ndns_epoch(state, step_fn, mask_update, loader, rng,
                   place_batch=None) -> Tuple[TrainState, Dict[str, float]]:
    place_batch = place_batch or _default_place_batch
    acc: Dict[str, list] = {}
    for noisy, clean in loader:
        noisy, clean = place_batch((noisy, clean))
        noisy_mag, noisy_phase, clean_mag = prep_ndns_batch(noisy, clean)
        state = mask_update(state)
        state, metrics = step_fn(state, rng, noisy_mag, noisy_phase,
                                 clean_mag, clean)
        _accumulate(acc, metrics)
    return state, _epoch_means(acc)


def act_sparsity_metrics(eval_model, state, x, prefix: str) -> Dict[str, float]:
    """Per-epoch activation-sparsity telemetry: a captured-intermediates
    forward on one batch, reduced to zero-fractions per module (reference
    train_helpers.py:783-801, gated by log_act_sparsity train.py:38)."""
    from sparsernns_tpu.train.steps import capture_intermediates
    from sparsernns_tpu.utils.logging import activation_sparsity
    _, inter = capture_intermediates(eval_model, state, x)
    sp = activation_sparsity(inter)
    out = {}
    total, n = 0.0, 0
    for key, frac in sp.items():
        clean = key.replace("['", "/").replace("']", "").strip("/")
        out[f"{prefix}/{clean}"] = frac
        total, n = total + frac, n + 1
    if n:
        out[f"{prefix}/mean"] = total / n
    return out


def validate_ndns(state, eval_fn, loader,
                  place_batch=None) -> Dict[str, float]:
    place_batch = place_batch or _default_place_batch
    losses, snrs = [], []
    for noisy, clean in loader:
        noisy, clean = place_batch((noisy, clean))
        noisy_mag, noisy_phase, clean_mag = prep_ndns_batch(noisy, clean)
        metrics = eval_fn(state, noisy_mag, noisy_phase, clean_mag, clean)
        losses.append(metrics["loss"])
        snrs.append(metrics["si_snr"])
    return {"loss": float(jnp.mean(jnp.stack(losses))),
            "si_snr": float(jnp.mean(jnp.stack(snrs)))}


def run_classification_epoch(state, step_fn, mask_update, loader, rng,
                             place_batch=None):
    place_batch = place_batch or _default_place_batch
    acc: Dict[str, list] = {}
    for xs, ys in loader:
        state = mask_update(state)
        xs, ys = place_batch((xs, jnp.asarray(ys)))
        state, metrics = step_fn(state, rng, xs, ys)
        _accumulate(acc, metrics)
    out = _epoch_means(acc)
    if "train_accuracy" in out:  # keep the historical key
        out["train_acc"] = out.pop("train_accuracy")
    return state, out


def validate_classification(state, eval_fn, loader,
                            place_batch=None) -> Dict[str, float]:
    place_batch = place_batch or _default_place_batch
    losses, accs = [], []
    for xs, ys in loader:
        xs, ys = place_batch((xs, jnp.asarray(ys)))
        metrics = eval_fn(state, xs, ys)
        losses.append(metrics["loss"])
        accs.append(metrics["accuracy"])
    return {"loss": float(jnp.mean(jnp.stack(losses))),
            "accuracy": float(jnp.mean(jnp.stack(accs)))}


def train(cfg: RunConfig) -> Dict[str, Any]:
    """Full training run. Returns summary metrics.
    Reference: train() train.py:26-631."""
    cfg = cfg.apply_dim_scale()
    rng = jax.random.PRNGKey(cfg.jax_seed)

    # Per-host data sharding: each process loads only its slice of every
    # global batch (multi-host DP over DCN; greenfield vs the reference).
    trainloader, valloader, testloader, n_out, seq_len, d_input, train_size \
        = build_dataset(cfg, num_shards=jax.process_count(),
                        shard_index=jax.process_index())
    # Optimizer steps per epoch = LOCAL batches (each host sees its shard);
    # using the global size would stretch warmup/cosine/pruning schedules
    # by process_count.
    steps_per_epoch = max(1, len(trainloader))

    # --- SPMD mesh (explicit opt-in via the mesh flags). Built BEFORE the
    # model so mesh_seq>1 can route the mixer through the
    # sequence-parallel scan (scan_mode="sp").
    n_devices = len(jax.devices())
    mesh_requested = (cfg.mesh_data > 1 or cfg.mesh_model > 1
                      or cfg.mesh_seq > 1)
    if mesh_requested and n_devices == 1:
        raise ValueError(
            f"mesh ({cfg.mesh_data},{cfg.mesh_model},{cfg.mesh_seq}) "
            "requested but only 1 device is visible — silent fallback "
            "would fake an SPMD run")
    mesh = None
    if mesh_requested:
        from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
        mesh = make_mesh(MeshConfig(data=cfg.mesh_data,
                                    model=cfg.mesh_model, seq=cfg.mesh_seq))

    sp_mesh = mesh if (mesh is not None and cfg.mesh_seq > 1) else None
    model = build_model(cfg, d_input, n_out, training=True, sp_mesh=sp_mesh)
    eval_model = model.clone(training=False)

    example = jnp.zeros((cfg.bsz, seq_len, d_input), jnp.float32)
    state, pruner = create_run_state(cfg, model, example, steps_per_epoch)

    sink = make_sink(cfg.logger,
                     directory=cfg.checkpoint_dir or ".",
                     **({"project": cfg.wandb_project,
                         "config": cfg.to_dict(), "name": cfg.run_name}
                        if cfg.logger == "wandb" else {}))

    mngr = best_mngr = None
    metadata = {"best_val_loss": float("inf"), "best_si_snr": -float("inf"),
                "next_epoch": 0}
    if cfg.checkpoint_dir:
        # Retention keeps the LATEST checkpoints (crash-resume safety);
        # a best_fn retention policy here would GC recent checkpoints and
        # silently roll resume back to the best epoch. The BEST epoch
        # lives in its own single-slot manager (<dir>/best) so convert()
        # always finds it even after retention drops it from the main
        # stack (reference convert protocol: convert.py:278-283 restores
        # the best-val checkpoint).
        mngr = CheckpointManager(cfg.checkpoint_dir)
        best_mngr = CheckpointManager(
            os.path.join(cfg.checkpoint_dir, "best"), max_to_keep=1)
        if cfg.restore_checkpoint:
            if cfg.reset_optimizer:
                state = mngr.restore_params_only(state)
            else:
                state, restored_meta = mngr.restore(state)
                if restored_meta:
                    metadata.update(restored_meta)

    # --- SPMD placement: params get the TP sharding rules (P dim on
    # "model"), batches shard over "data" (+ time over "seq" with sp);
    # the SAME jitted step then runs SPMD — XLA inserts the collectives
    # (see parallel/).
    is_ndns = cfg.dataset == "ndns"
    place_batch = _default_place_batch
    if mesh is not None:
        from sparsernns_tpu.parallel.sharding import (shard_batch,
                                                      shard_train_state)
        state = shard_train_state(state, mesh)
        # NDNS mags are (B, F, L): time LAST; classification inputs are
        # (B, L, D): time middle.
        time_axis = (-1 if is_ndns else 1) if cfg.mesh_seq > 1 else None
        place_batch = lambda tree: shard_batch(tree, mesh,
                                               time_axis_3d=time_axis)
        logger.info("SPMD mesh: %s", dict(mesh.shape))
    static_q = quantization_recipes[cfg.quantization]().static_quant
    if is_ndns:
        step_fn = make_ndns_train_step(model, batchnorm=cfg.batchnorm,
                                       pruner=pruner, static_quant=static_q,
                                       microbatch=cfg.microbatch)
        eval_fn = make_ndns_eval_step(eval_model, batchnorm=cfg.batchnorm,
                                      pruner=pruner)
        epoch_fn, val_fn = run_ndns_epoch, validate_ndns
    else:
        from sparsernns_tpu.train.steps import (
            make_classification_eval_step, make_classification_train_step)
        step_fn = make_classification_train_step(
            model, batchnorm=cfg.batchnorm, pruner=pruner,
            static_quant=static_q)
        eval_fn = make_classification_eval_step(
            eval_model, batchnorm=cfg.batchnorm, pruner=pruner)
        epoch_fn, val_fn = run_classification_epoch, validate_classification
    mask_update = make_mask_update_fn(pruner)

    # Example model inputs for the per-epoch activation-sparsity capture
    # (one batch each; reference capture_intermediates path,
    # train_helpers.py:783-801).
    cap_val = cap_train = None
    if cfg.log_act_sparsity != "none":
        from sparsernns_tpu.train.losses import STFT_MAG_MEAN

        def _model_input(loader):
            batch = next(iter(loader))
            if is_ndns:
                noisy, clean = place_batch(batch)
                nm, _, _ = prep_ndns_batch(noisy, clean)
                return jnp.transpose(nm - STFT_MAG_MEAN, (0, 2, 1))
            return place_batch((jnp.asarray(batch[0]),))[0]

        if cfg.log_act_sparsity in ("val", "both"):
            cap_val = _model_input(valloader)
        if cfg.log_act_sparsity in ("train", "both"):
            cap_train = _model_input(trainloader)

    patience = 0
    start_epoch = int(metadata.get("next_epoch", 0))
    for epoch in range(start_epoch, cfg.epochs):
        if cfg.profile and epoch == start_epoch + 1:
            jax.profiler.start_trace(cfg.profile_dir)
        rng, epoch_rng = jax.random.split(rng)
        state, train_metrics = epoch_fn(
            state, step_fn, mask_update, trainloader, epoch_rng,
            place_batch=place_batch)
        val_metrics = val_fn(state, eval_fn, valloader,
                             place_batch=place_batch)
        test_metrics = val_fn(state, eval_fn, testloader,
                              place_batch=place_batch)
        if cfg.profile and epoch == start_epoch + 1:
            jax.profiler.stop_trace()

        quality_key = "si_snr" if is_ndns else "accuracy"

        # Reduce-on-plateau LR control (reference train_helpers.py:100-148):
        # host-side decay state persists in checkpoint metadata; the live
        # LRs live in the optimizer state's injected hyperparams.
        if cfg.lr_schedule == "plateau":
            from sparsernns_tpu.train.optim import (reduce_lr_on_plateau,
                                                    set_learning_rates)
            lr_now = float(metadata.get("plateau_lr", cfg.lr))
            ssm_now = float(metadata.get("plateau_ssm_lr", cfg.ssm_lr_base))
            new_lr, new_ssm, count, best = reduce_lr_on_plateau(
                lr_now, ssm_now, int(metadata.get("plateau_count", 0)),
                float(val_metrics[quality_key]),
                float(metadata.get("plateau_best", -float("inf"))),
                factor=cfg.plateau_factor, patience=cfg.plateau_patience,
                lr_min=cfg.lr_min)
            metadata.update(plateau_lr=new_lr, plateau_ssm_lr=new_ssm,
                            plateau_count=count, plateau_best=best)
            if (new_lr, new_ssm) != (lr_now, ssm_now):
                state = state.replace(opt_state=set_learning_rates(
                    state.opt_state, new_lr, new_ssm))
                logger.info("plateau: lr -> %.3e, ssm_lr -> %.3e",
                            new_lr, new_ssm)

        log = dict(train_metrics)
        log.update({f"val_{k}": v for k, v in val_metrics.items()})
        log.update({f"test_{k}": v for k, v in test_metrics.items()})
        log.update(extract_learning_rates(state.opt_state))
        log.update(compute_eigenvalue_logs(state.params))
        if pruner is not None:
            log["weight_sparsity"] = summarize_sparsity(
                state.params, state.masks)["_total_sparsity"]
        if cap_val is not None:
            log.update(act_sparsity_metrics(eval_model, state, cap_val,
                                            "act_sparsity_val"))
        if cap_train is not None:
            log.update(act_sparsity_metrics(eval_model, state, cap_train,
                                            "act_sparsity_train"))

        gn = log.get("train_grad_norm")
        if gn is not None and gn > cfg.grad_norm_warn_threshold:
            detail = {k.split("/", 1)[1]: round(float(v), 3)
                      for k, v in log.items()
                      if k.startswith("train_grad_norm/")}
            logger.warning(
                "epoch %d: gradient norm %.3f exceeds threshold %.1f "
                "(per-branch: %s)", epoch, gn,
                cfg.grad_norm_warn_threshold, detail)

        sink.log(log, step=epoch)
        logger.info("epoch %d: train %.4f val %.4f (%s %.3f)",
                    epoch, log["train_loss"], log["val_loss"],
                    quality_key, val_metrics[quality_key])

        improved = val_metrics["loss"] < metadata["best_val_loss"]
        if improved:
            metadata["best_val_loss"] = val_metrics["loss"]
            metadata["best_si_snr"] = val_metrics[quality_key]
            metadata["best_epoch"] = epoch
            sink.log_best({"best_val_loss": val_metrics["loss"],
                           "best_quality": val_metrics[quality_key]})
            patience = 0
        else:
            patience += 1
        metadata["next_epoch"] = epoch + 1

        if mngr is not None:
            mngr.save(epoch, state, metadata=metadata,
                      metrics={"val_quality": val_metrics[quality_key]})
            mngr.wait()
        if best_mngr is not None and improved:
            best_mngr.save(epoch, state, metadata=metadata,
                           metrics={"val_quality": val_metrics[quality_key]})
            best_mngr.wait()

        if patience >= cfg.early_stop_patience:
            logger.info("early stopping at epoch %d", epoch)
            break

    sink.finish()
    if mngr is not None:
        mngr.close()
    if best_mngr is not None:
        best_mngr.close()
    return {"state": state, "metadata": metadata}
