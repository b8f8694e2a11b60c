"""Plateau LR schedule, live LR override, and the tune() random search."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.train.optim import (create_optimizer,
                                        extract_learning_rates,
                                        reduce_lr_on_plateau,
                                        set_learning_rates)
from sparsernns_tpu.train.tune import sample_config, tune
from sparsernns_tpu.utils.config import RunConfig


def test_reduce_lr_on_plateau():
    lr, ssm_lr, count, best = 1e-3, 1e-3, 0, -np.inf
    # improving metric keeps lr
    lr, ssm_lr, count, best = reduce_lr_on_plateau(
        lr, ssm_lr, count, 1.0, best, patience=2)
    assert lr == 1e-3 and count == 0 and best == 1.0
    # stagnation beyond patience decays
    for _ in range(3):
        lr, ssm_lr, count, best = reduce_lr_on_plateau(
            lr, ssm_lr, count, 0.5, best, patience=2, factor=0.1)
    assert lr == 1e-4 and ssm_lr == 1e-4
    # floor
    for _ in range(30):
        lr, ssm_lr, count, best = reduce_lr_on_plateau(
            lr, ssm_lr, count, 0.5, best, patience=0, factor=0.1,
            lr_min=1e-6)
    assert lr == 1e-6


def test_set_learning_rates_overrides_state():
    params = {"mixer": {"Lambda_re": jnp.ones(4)},
              "dense": {"kernel": jnp.ones((4, 4))}}
    tx = create_optimizer("standard", lr=1e-3, ssm_lr=5e-4,
                          total_steps=10, warmup_steps=1)
    state = tx.init(params)
    new_state = set_learning_rates(state, lr=7e-3, ssm_lr=3e-3)
    lrs = extract_learning_rates(new_state)
    assert abs(lrs["regular/lr"] - 7e-3) < 1e-9
    assert abs(lrs["ssm/lr"] - 3e-3) < 1e-9
    # the optimizer still steps with the overridden state
    grads = {"mixer": {"Lambda_re": jnp.ones(4)},
             "dense": {"kernel": jnp.ones((4, 4))}}
    updates, _ = tx.update(grads, new_state, params)
    assert np.isfinite(np.asarray(updates["dense"]["kernel"])).all()


def test_tune_random_search(tmp_path):
    base = RunConfig(checkpoint_dir=str(tmp_path))
    calls = []

    def fake_train(cfg):
        calls.append(cfg)
        return {"metadata": {"best_val_loss": cfg.ssm_lr_base * 1000,
                             "best_si_snr": 1.0}}

    space = {"ssm_lr_base": [1e-4, 1e-3]}
    result = tune(base, n_trials=4, space=space, train_fn=fake_train)
    assert len(result["trials"]) == 4
    assert result["best"]["config"]["ssm_lr_base"] == 1e-4
    assert (tmp_path / "tune_results.json").exists()


def test_sample_config():
    rng = np.random.RandomState(0)
    cfg = sample_config(RunConfig(), {"p_dropout": [0.5]}, rng)
    assert cfg.p_dropout == 0.5
