"""Optimizer configurations.

Reference parity: `create_train_state`'s six opt configs
(train_helpers.py:286-509) — standard / qaft / BandCdecay / BfastandCdecay /
noBCdecay / constant — each an `optax.multi_transform` over three groups:

  "none":    frozen or wd-only parameters (lr=0)
  "ssm":     SSM parameters (adam, ssm_lr, no weight decay)
  "regular": everything else (adamw, lr, weight decay)

with warmup-cosine schedules, optional global-norm clipping, and
`inject_hyperparams` so the live learning rate is visible in the optimizer
state (for logging and reduce-on-plateau).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def warmup_cosine(base_lr: float, total_steps: int, warmup_steps: int,
                  end_value: float = 1e-6):
    if total_steps <= 0:
        return optax.constant_schedule(base_lr)
    warmup = max(min(warmup_steps, total_steps - 1), 0)
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr / warmup if warmup > 0 else base_lr,
        peak_value=base_lr,
        warmup_steps=max(warmup, 1) if total_steps > 1 else 0,
        decay_steps=max(total_steps, 2),
        end_value=end_value,
    )


# Parameter-name -> group rules per opt config. A param whose *leaf name*
# (or any path component, for "norm") matches goes to the given group.
# Reference: the map_nested_fn label fns, train_helpers.py:286-509.
_SSM_KEYS_BASE = ("B", "Lambda_re", "Lambda_im", "norm")
_OPT_CONFIG_RULES = {
    # opt_config: (ssm_keys, none_keys, regular_uses_adamw)
    "standard": (_SSM_KEYS_BASE, (), True),
    "qaft": (_SSM_KEYS_BASE, (), False),
    "constant": (_SSM_KEYS_BASE, (), True),
    "BandCdecay": (("Lambda_re", "Lambda_im", "norm"), ("B",), True),
    "BfastandCdecay": (("Lambda_re", "Lambda_im", "norm"), (), True),
    "noBCdecay": (("B", "C", "C1", "C2", "D", "Lambda_re", "Lambda_im",
                   "norm"), (), True),
}

OPT_CONFIGS = tuple(_OPT_CONFIG_RULES)


def _label_fn(opt_config: str, dt_global: bool):
    ssm_keys, none_keys, _ = _OPT_CONFIG_RULES[opt_config]
    ssm_keys = set(ssm_keys)
    if not dt_global:
        ssm_keys = ssm_keys | {"log_step"}

    def label(path, _leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        # Quantization scale parameters are never optimized directly.
        if names and names[-1] == "scale" and "norm" not in names:
            return "none"
        for n in names:
            if n in none_keys:
                return "none"
            if n in ssm_keys:
                return "ssm"
        return "regular"

    return label


def create_optimizer(
    opt_config: str = "standard",
    lr: float = 1e-3,
    ssm_lr: float = 1e-3,
    weight_decay: float = 0.0,
    total_steps: int = 0,
    warmup_steps: int = 0,
    grad_clip_threshold: Optional[float] = None,
    dt_global: bool = False,
    lr_min: float = 1e-6,
    schedule: str = "cosine",
) -> optax.GradientTransformation:
    """``schedule="constant"`` keeps the LRs flat regardless of opt_config
    — the base for reduce-on-plateau control, where the loop overrides
    the injected hyperparams per epoch via set_learning_rates()."""
    if opt_config not in _OPT_CONFIG_RULES:
        raise ValueError(
            f"opt_config {opt_config!r} not in {sorted(_OPT_CONFIG_RULES)}")
    _, _, regular_adamw = _OPT_CONFIG_RULES[opt_config]

    if opt_config == "constant" or schedule == "constant":
        # plain floats, NOT constant_schedule: inject_hyperparams
        # re-evaluates callables every step, which would undo the
        # plateau override written by set_learning_rates
        ssm_sched = ssm_lr
        lr_sched = lr
    else:
        ssm_sched = warmup_cosine(ssm_lr, total_steps, warmup_steps, lr_min)
        lr_sched = warmup_cosine(lr, total_steps, warmup_steps, lr_min)

    def clipped(opt_cls, **kw):
        tx = optax.inject_hyperparams(opt_cls)(**kw)
        if grad_clip_threshold is not None:
            # Clip the RAW gradients before they enter the optimizer (the
            # reference chains clipping after the update, where Adam's
            # normalized step makes a threshold like 1.0 a silent no-op —
            # train_helpers.py:213-218; fixed here). Still per
            # multi_transform group, which is the granularity available
            # inside a partitioned transform.
            tx = optax.chain(
                optax.clip_by_global_norm(grad_clip_threshold), tx)
        return tx

    if opt_config == "qaft":
        # QAFT tunes with plain SGD everywhere (train_helpers.py:286-318).
        transforms = {
            "none": clipped(optax.sgd, learning_rate=0.0),
            "ssm": clipped(optax.sgd, learning_rate=ssm_sched),
            "regular": clipped(optax.sgd, learning_rate=lr_sched),
        }
    else:
        none_tx = (clipped(optax.adamw, learning_rate=0.0)
                   if opt_config in ("BandCdecay", "BfastandCdecay")
                   else clipped(optax.sgd, learning_rate=0.0))
        regular_tx = (clipped(optax.adamw, learning_rate=lr_sched,
                              weight_decay=weight_decay)
                      if regular_adamw
                      else clipped(optax.sgd, learning_rate=lr_sched))
        transforms = {
            "none": none_tx,
            "ssm": clipped(optax.adam, learning_rate=ssm_sched),
            "regular": regular_tx,
        }

    import jax
    label_fn = lambda params: jax.tree_util.tree_map_with_path(
        _label_fn(opt_config, dt_global), params)
    return optax.multi_transform(transforms, label_fn)


def reduce_lr_on_plateau(lr: float, ssm_lr: float, count: int,
                         new_metric: float, best_metric: float,
                         factor: float = 0.2, patience: int = 20,
                         lr_min: float = 1e-6):
    """Host-side plateau LR decay (reference train_helpers.py:100-119).
    Returns (lr, ssm_lr, count, best_metric)."""
    if new_metric > best_metric:
        count = 0
        best_metric = new_metric
    else:
        count += 1
    if count > patience:
        lr = max(factor * lr, lr_min)
        ssm_lr = max(factor * ssm_lr, lr_min)
        count = 0
    return lr, ssm_lr, count, best_metric


def set_learning_rates(opt_state, lr: float, ssm_lr: float):
    """Override the injected hyperparam learning rates in a multi_transform
    state (the plateau-schedule hook; reference
    update_learning_rate_per_step train_helpers.py:126-148)."""
    import jax

    def visit(obj, group):
        if hasattr(obj, "inner_states"):
            return type(obj)(inner_states={
                k: visit(v, k) for k, v in obj.inner_states.items()})
        if hasattr(obj, "hyperparams") and "learning_rate" in obj.hyperparams:
            new_lr = {"ssm": ssm_lr, "regular": lr}.get(group)
            if new_lr is None:
                return obj
            hp = dict(obj.hyperparams)
            hp["learning_rate"] = jnp.asarray(new_lr, jnp.float32)
            return obj._replace(hyperparams=hp)
        if hasattr(obj, "inner_state"):
            return obj._replace(inner_state=visit(obj.inner_state, group))
        if isinstance(obj, tuple) and not hasattr(obj, "_fields"):
            return tuple(visit(o, group) for o in obj)
        return obj

    return visit(opt_state, None)


def zero_scale_gradients(grads):
    """Zero gradients of frozen quantization scale params — the QAFT
    safeguard of reference train_helpers.py:1353-1362."""
    import jax

    def zero(path, g):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if names and names[-1] == "scale" and "norm" not in names:
            return jnp.zeros_like(g)
        return g

    return jax.tree_util.tree_map_with_path(zero, grads)


def scale_gradient_leak_norm(grads) -> jnp.ndarray:
    """Total |grad| mass on frozen quantization scale parameters — should
    be exactly zero after zero_scale_gradients; nonzero indicates a leak
    (the reference's 'DETECTED NON-ZERO GRADIENTS FOR SCALE PARAMETERS'
    check, train_helpers.py:674-691)."""
    import jax

    total = jnp.zeros(())
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if names and names[-1] == "scale" and "norm" not in names:
            total = total + jnp.sum(jnp.abs(g))
    return total


def extract_learning_rates(opt_state) -> dict:
    """Walk the optimizer state for live injected learning rates
    (reference logs these per epoch, train.py:414-456)."""
    out = {}

    def visit(obj, prefix):
        if hasattr(obj, "inner_states"):
            for k, v in obj.inner_states.items():
                visit(v, f"{prefix}{k}/")
        elif hasattr(obj, "hyperparams"):
            lr = obj.hyperparams.get("learning_rate")
            if lr is not None:
                out[f"{prefix}lr"] = float(lr)
        elif hasattr(obj, "inner_state"):
            visit(obj.inner_state, prefix)
        elif isinstance(obj, (tuple, list)):
            for item in obj:
                visit(item, prefix)

    visit(opt_state, "")
    return out
