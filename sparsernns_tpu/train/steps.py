"""Jitted train/eval steps for classification and NDNS regression.

Reference parity: train_step (train_helpers.py:1311), train_step_ndns
(:1415), eval_step (:1494), eval_step_ndns (:1552), plus the pruning
pre/post hooks (:844-845) and scale-gradient zeroing (:1353-1362).

Step functions are built by factories that close over the model and static
configuration, and are `jax.jit`-compiled once. Under a device mesh the same
functions run SPMD via NamedSharding'd inputs (see parallel/).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sparsernns_tpu.train.losses import (STFT_MAG_MEAN, accuracy,
                                         cross_entropy_loss,
                                         ndns_loss_from_mask_tm)
from sparsernns_tpu.train.optim import zero_scale_gradients
from sparsernns_tpu.train.pruning import MagnitudePruner
from sparsernns_tpu.train.state import TrainState


def _grad_norm_metrics(grads) -> dict:
    """Global + per-top-level-branch gradient norms, computed in-graph so
    every step carries them at negligible cost (reference logs them per
    epoch with threshold-triggered dumps, train_helpers.py:692-741; the
    epoch aggregation and the threshold warning live in train/loop.py)."""
    import optax
    out = {"grad_norm": optax.global_norm(grads)}
    for key, sub in grads.items():
        if jax.tree_util.tree_leaves(sub):
            out[f"grad_norm/{key}"] = optax.global_norm(sub)
    return out


def _forward_params(state: TrainState, params,
                    pruner: Optional[MagnitudePruner]):
    if pruner is not None and pruner.cfg.enabled and state.masks is not None:
        return pruner.apply_masks(params, state.masks)
    return params


def make_mask_update_fn(pruner: Optional[MagnitudePruner]):
    """Per-step mask refresh, gated on the HOST against the (static)
    schedule so the jitted sort-every-leaf update is only dispatched on
    due steps (VERDICT round-1 weak #7: the in-graph lax.cond version
    dispatched the update computation every step). The host step counter
    initializes from state.step once (resume-safe) and then tracks calls
    — the epoch drivers call this exactly once per optimizer step."""
    if pruner is None or not pruner.cfg.enabled:
        return lambda state: state
    cfg = pruner.cfg

    @jax.jit
    def update(state: TrainState) -> TrainState:
        masks = pruner.update_masks(state.params, state.masks, state.step)
        return state.replace(masks=masks)

    counter = {"step": None}

    def maybe_update(state: TrainState) -> TrainState:
        if counter["step"] is None:
            counter["step"] = int(state.step)
        step = counter["step"]
        counter["step"] = step + 1
        due = (cfg.update_start <= step <= cfg.update_end
               and (step - cfg.update_start) % cfg.update_freq == 0)
        return update(state) if due else state

    return maybe_update


def make_ndns_train_step(
    model,
    batchnorm: bool = True,
    pruner: Optional[MagnitudePruner] = None,
    static_quant: bool = False,
    microbatch: Optional[int] = None,
) -> Callable:
    """NDNS denoising train step. Inputs are the STFT-split batch:
    noisy_mag/noisy_phase/clean_mag (B, F, L) + clean audio (B, T).

    ``microbatch``: gradient-accumulation microbatch SIZE. The step
    splits the batch into B/microbatch sequential chunks via lax.scan,
    accumulates gradients, and applies ONE optimizer update — the same
    effective batch with the memory/bandwidth profile of the chunk.
    Measured motivation (PERF.md round-4): the fused fwd+bwd achieves
    679 GB/s at B=8 but only 402 GB/s at the recipe's B=32 — running
    32 as 4x8 rides the efficient regime. Semantics: gradients are the
    exact full-batch mean (equal-size chunks of a mean loss); BN
    batch_stats EMA-update per microbatch sequentially (standard
    accumulation semantics — per-chunk normalization statistics);
    dropout draws fresh noise per microbatch."""

    if microbatch is not None:
        return _make_ndns_microbatch_step(model, batchnorm, pruner,
                                          static_quant, microbatch)

    @jax.jit
    def step(state: TrainState, rng, noisy_mag, noisy_phase, clean_mag, clean):
        drop_rng = jax.random.fold_in(rng, state.step)
        # the whole loss path runs TIME-MAJOR (B, L, F) — the model's own
        # layout — so no transpose/relayout sits inside the differentiated
        # graph; the spectral inputs transpose once here (they carry no
        # gradients: only the mask does)
        noisy_mag_tm = jnp.transpose(noisy_mag, (0, 2, 1))
        noisy_phase_tm = jnp.transpose(noisy_phase, (0, 2, 1))
        clean_mag_tm = jnp.transpose(clean_mag, (0, 2, 1))

        def loss_fn(params):
            fwd = _forward_params(state, params, pruner)
            x = noisy_mag_tm - STFT_MAG_MEAN
            variables = {"params": fwd}
            mutable = []
            if batchnorm or state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, mod_vars = model.apply(
                variables, x,
                rngs={"dropout": drop_rng},
                mutable=mutable,
            )
            loss, snr, _ = ndns_loss_from_mask_tm(
                out, noisy_mag_tm, noisy_phase_tm, clean_mag_tm, clean)
            return loss, (mod_vars, snr)

        (loss, (mod_vars, snr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = {"loss": loss, "si_snr": snr}
        metrics.update(_grad_norm_metrics(grads))
        if static_quant:
            from sparsernns_tpu.train.optim import scale_gradient_leak_norm
            metrics["scale_grad_leak"] = scale_gradient_leak_norm(grads)
            grads = zero_scale_gradients(grads)
        state = state.apply_gradients_with_stats(
            grads=grads, batch_stats=mod_vars.get("batch_stats"))
        return state, metrics

    return step


def _make_ndns_microbatch_step(model, batchnorm, pruner, static_quant,
                               microbatch):
    """Gradient-accumulation variant of make_ndns_train_step (see its
    docstring). One lax.scan over B/microbatch chunks -> one compiled
    fwd+bwd body at the chunk size -> one optimizer update."""

    @jax.jit
    def step(state: TrainState, rng, noisy_mag, noisy_phase, clean_mag,
             clean):
        b = noisy_mag.shape[0]
        if b % microbatch:
            raise ValueError(
                f"batch {b} not divisible by microbatch {microbatch}")
        k = b // microbatch

        def split(a):
            return a.reshape((k, microbatch) + a.shape[1:])

        xs = (split(noisy_mag), split(noisy_phase), split(clean_mag),
              split(clean), jnp.arange(k))
        stats0 = state.batch_stats if (batchnorm or state.batch_stats) \
            else None

        def loss_fn(params, stats, drop_rng, nm, nph, cm, cl):
            nm_tm = jnp.transpose(nm, (0, 2, 1))
            nph_tm = jnp.transpose(nph, (0, 2, 1))
            cm_tm = jnp.transpose(cm, (0, 2, 1))
            fwd = _forward_params(state, params, pruner)
            variables = {"params": fwd}
            mutable = []
            if stats is not None:
                variables["batch_stats"] = stats
                mutable = ["batch_stats"]
            out, mod_vars = model.apply(variables, nm_tm - STFT_MAG_MEAN,
                                        rngs={"dropout": drop_rng},
                                        mutable=mutable)
            loss, snr, _ = ndns_loss_from_mask_tm(out, nm_tm, nph_tm,
                                                  cm_tm, cl)
            return loss, (mod_vars, snr)

        def body(carry, chunk):
            gsum, stats = carry
            nm, nph, cm, cl, idx = chunk
            drop_rng = jax.random.fold_in(
                jax.random.fold_in(rng, state.step), idx)
            (loss, (mod_vars, snr)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, stats, drop_rng,
                                       nm, nph, cm, cl)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            new_stats = mod_vars.get("batch_stats", stats) \
                if stats is not None else None
            return (gsum, new_stats), (loss, snr)

        gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (gsum, stats), (losses, snrs) = jax.lax.scan(
            body, (gzero, stats0), xs)
        # equal-size chunks of a batch-mean loss: sum/k IS the exact
        # full-batch mean gradient
        grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
        metrics = {"loss": jnp.mean(losses), "si_snr": jnp.mean(snrs)}
        metrics.update(_grad_norm_metrics(grads))
        if static_quant:
            from sparsernns_tpu.train.optim import scale_gradient_leak_norm
            metrics["scale_grad_leak"] = scale_gradient_leak_norm(grads)
            grads = zero_scale_gradients(grads)
        state = state.apply_gradients_with_stats(grads=grads,
                                                 batch_stats=stats)
        return state, metrics

    return step


def make_ndns_eval_step(model, batchnorm: bool = True,
                        pruner: Optional[MagnitudePruner] = None,
                        mutable_stats: bool = False) -> Callable:
    """Eval step; with ``mutable_stats=True`` the forward also updates
    batch_stats (used for static-quant calibration passes, where observers
    write min/max during eval — reference convert.py:881-967)."""

    @jax.jit
    def step(state: TrainState, noisy_mag, noisy_phase, clean_mag, clean):
        fwd = _forward_params(state, state.params, pruner)
        # time-major loss path, mirroring the train step
        noisy_mag_tm = jnp.transpose(noisy_mag, (0, 2, 1))
        x = noisy_mag_tm - STFT_MAG_MEAN
        variables = {"params": fwd}
        if batchnorm or state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if mutable_stats:
            out, mod_vars = model.apply(variables, x, mutable=["batch_stats"])
        else:
            out = model.apply(variables, x)
            mod_vars = {}
        loss, snr, cleaned_mag = ndns_loss_from_mask_tm(
            out, noisy_mag_tm,
            jnp.transpose(noisy_phase, (0, 2, 1)),
            jnp.transpose(clean_mag, (0, 2, 1)), clean)
        metrics = {"loss": loss, "si_snr": snr}
        if mutable_stats:
            return metrics, mod_vars.get("batch_stats")
        return metrics

    return step


def make_classification_train_step(
    model,
    batchnorm: bool = True,
    pruner: Optional[MagnitudePruner] = None,
    static_quant: bool = False,
) -> Callable:

    @jax.jit
    def step(state: TrainState, rng, inputs, labels):
        drop_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            fwd = _forward_params(state, params, pruner)
            variables = {"params": fwd}
            mutable = []
            if batchnorm or state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            logits, mod_vars = model.apply(
                variables, inputs, rngs={"dropout": drop_rng},
                mutable=mutable)
            return cross_entropy_loss(logits, labels), (mod_vars, logits)

        (loss, (mod_vars, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = {"loss": loss, "accuracy": accuracy(logits, labels)}
        metrics.update(_grad_norm_metrics(grads))
        if static_quant:
            grads = zero_scale_gradients(grads)
        state = state.apply_gradients_with_stats(
            grads=grads, batch_stats=mod_vars.get("batch_stats"))
        return state, metrics

    return step


def make_classification_eval_step(model, batchnorm: bool = True,
                                  pruner: Optional[MagnitudePruner] = None
                                  ) -> Callable:

    @jax.jit
    def step(state: TrainState, inputs, labels):
        fwd = _forward_params(state, state.params, pruner)
        variables = {"params": fwd}
        if batchnorm or state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, inputs)
        return {"loss": cross_entropy_loss(logits, labels),
                "accuracy": accuracy(logits, labels)}

    return step


def capture_intermediates(model, state: TrainState, x,
                          filter_fn=lambda mdl, method: method == "__call__"):
    """Run a forward pass capturing sown/intermediate activations — the
    golden-activation dump used by the fxp verification harness
    (reference train_helpers.py:1079-1212, convert.py:358-374)."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    out, mod_vars = model.apply(
        variables, x, mutable=["intermediates"],
        capture_intermediates=filter_fn)
    return out, mod_vars.get("intermediates", {})
