"""End-to-end training-engine tests: one NDNS step reduces loss over a few
iterations; classification step runs; optimizer groups; LR extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.data.ndns import SyntheticNDNS, NDNSLoader
from sparsernns_tpu.models.seq_model import ClassificationModel, RegressionModel
from sparsernns_tpu.models.ssm import make_ssm_init_fn
from sparsernns_tpu.models.ssm_init import blocked_dplr_init
from sparsernns_tpu.ops.stft import stft_splitter
from sparsernns_tpu.train.optim import (create_optimizer,
                                        extract_learning_rates,
                                        zero_scale_gradients)
from sparsernns_tpu.train.pruning import MagnitudePruner, PruningConfig
from sparsernns_tpu.train.state import TrainState, count_params
from sparsernns_tpu.train.steps import (make_classification_eval_step,
                                        make_classification_train_step,
                                        make_mask_update_fn,
                                        make_ndns_eval_step,
                                        make_ndns_train_step)


def tiny_ndns_model(d_model=8, ssm_size=8, n_layers=1, d_io=257):
    init = blocked_dplr_init(ssm_size, 1, conj_sym=True)
    mixer = make_ssm_init_fn(
        h=d_model, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
        vinv=init["Vinv"], clip_eigs=True)
    return RegressionModel(
        mixer_cls=mixer, n_layers=n_layers, d_model=d_model, d_output=d_io,
        dropout=0.0, prenorm=True, batchnorm=True, glu_variant="half1",
        training=True)


def make_state(model, x, seed=0, opt_config="standard", masks=None):
    variables = model.init(jax.random.PRNGKey(seed), x)
    tx = create_optimizer(opt_config, lr=1e-3, ssm_lr=1e-3,
                          total_steps=100, warmup_steps=10)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"), masks=masks)


def test_ndns_train_step_reduces_loss():
    ds = SyntheticNDNS(size=4, length=4096, seed=0)
    loader = NDNSLoader(ds, batch_size=2)
    noisy, clean = next(iter(loader))
    noisy_mag, noisy_phase = stft_splitter(jnp.asarray(noisy))
    clean_mag, _ = stft_splitter(jnp.asarray(clean))

    model = tiny_ndns_model()
    x = jnp.transpose(noisy_mag, (0, 2, 1))
    state = make_state(model, x)
    step = make_ndns_train_step(model, batchnorm=True)

    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        state, metrics = step(state, rng, noisy_mag, noisy_phase,
                              clean_mag, jnp.asarray(clean))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()

    eval_step = make_ndns_eval_step(
        tiny_ndns_model().clone(training=False), batchnorm=True)
    m = eval_step(state, noisy_mag, noisy_phase, clean_mag, jnp.asarray(clean))
    assert np.isfinite(float(m["loss"]))


def test_classification_train_and_eval():
    init = blocked_dplr_init(8, 1)
    mixer = make_ssm_init_fn(h=8, p=init["P"], lambda_init=init["Lambda"],
                             v=init["V"], vinv=init["Vinv"])
    model = ClassificationModel(
        mixer_cls=mixer, n_layers=1, d_model=8, d_output=4, dropout=0.0,
        batchnorm=True, training=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16, 6), jnp.float32)
    y = jnp.asarray(rng.randint(0, 4, size=4))
    state = make_state(model, x)
    step = make_classification_train_step(model, batchnorm=True)
    state, metrics = step(state, jax.random.PRNGKey(0), x, y)
    assert np.isfinite(float(metrics["loss"]))
    ev = make_classification_eval_step(model.clone(training=False), True)
    m = ev(state, x, y)
    assert 0.0 <= float(m["accuracy"]) <= 1.0


def test_pruned_training_with_mask_updates():
    model = tiny_ndns_model(d_io=33)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 33), jnp.float32)
    cfg = PruningConfig(final_sparsity=0.5, update_start=0, update_end=4,
                        update_freq=1, distribution="erk")
    pruner = MagnitudePruner(cfg)
    variables = model.init(jax.random.PRNGKey(0), x)
    masks = pruner.init_masks(variables["params"])
    state = make_state(model, x, masks=masks)
    # ensure pruner's relative sparsity built for this tree
    pruner.relative_sparsity = None
    update_masks = make_mask_update_fn(pruner)

    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    noisy_phase = jnp.zeros_like(noisy_mag)
    clean = jnp.asarray(rng.randn(2, (16 - 1) * 128), jnp.float32)
    clean_mag = noisy_mag * 0.9
    step = make_ndns_train_step(model, batchnorm=True, pruner=pruner)
    for i in range(3):
        state = update_masks(state)
        state, metrics = step(state, jax.random.PRNGKey(1), noisy_mag,
                              noisy_phase, clean_mag, clean)
    # masks should now be sparse somewhere
    total = sum(float(m.sum()) for m in jax.tree_util.tree_leaves(state.masks))
    size = sum(m.size for m in jax.tree_util.tree_leaves(state.masks))
    assert total < size


def test_optimizer_groups_and_lr_extraction():
    model = tiny_ndns_model(d_io=17)
    x = jnp.ones((2, 16, 17))
    for opt_config in ("standard", "noBCdecay", "BandCdecay",
                       "BfastandCdecay", "qaft", "constant"):
        state = make_state(model, x, opt_config=opt_config)
        lrs = extract_learning_rates(state.opt_state)
        assert any("lr" in k for k in lrs), (opt_config, lrs)


def test_zero_scale_gradients():
    grads = {"dense": {"kernel": jnp.ones((2, 2)),
                       "quant_input": {"scale": jnp.ones(())}},
             "norm": {"scale": jnp.ones((3,))}}
    out = zero_scale_gradients(grads)
    assert float(out["dense"]["quant_input"]["scale"]) == 0.0
    np.testing.assert_allclose(out["norm"]["scale"], 1.0)  # BN scale kept
    np.testing.assert_allclose(out["dense"]["kernel"], 1.0)


def test_count_params():
    assert count_params({"a": jnp.ones((2, 3)), "b": jnp.ones(5)}) == 11


@pytest.mark.slow
def test_microbatch_step_matches_full_batch():
    """Gradient accumulation (microbatch=) must reproduce the full-batch
    update exactly when the only cross-sample coupling (BN stats,
    dropout noise) is disabled: equal-size chunks of a batch-mean loss
    give sum/k == the full-batch mean gradient."""
    ds = SyntheticNDNS(size=4, length=4096, seed=0)
    loader = NDNSLoader(ds, batch_size=4)
    noisy, clean = next(iter(loader))
    noisy_mag, noisy_phase = stft_splitter(jnp.asarray(noisy))
    clean_mag, _ = stft_splitter(jnp.asarray(clean))
    clean = jnp.asarray(clean)

    init = blocked_dplr_init(8, 1, conj_sym=True)
    mixer = make_ssm_init_fn(
        h=8, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
        vinv=init["Vinv"], clip_eigs=True)
    model = RegressionModel(
        mixer_cls=mixer, n_layers=1, d_model=8, d_output=257,
        dropout=0.0, prenorm=True, batchnorm=False, glu_variant="half1",
        training=True)
    x = jnp.transpose(noisy_mag, (0, 2, 1))
    state = make_state(model, x)

    full = make_ndns_train_step(model, batchnorm=False)
    micro = make_ndns_train_step(model, batchnorm=False, microbatch=2)
    rng = jax.random.PRNGKey(1)
    s_full, m_full = full(state, rng, noisy_mag, noisy_phase, clean_mag,
                          clean)
    s_micro, m_micro = micro(state, rng, noisy_mag, noisy_phase,
                             clean_mag, clean)
    assert float(m_full["loss"]) == pytest.approx(
        float(m_micro["loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_micro.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_microbatch_step_with_batchnorm_runs_and_learns():
    ds = SyntheticNDNS(size=4, length=4096, seed=0)
    loader = NDNSLoader(ds, batch_size=4)
    noisy, clean = next(iter(loader))
    noisy_mag, noisy_phase = stft_splitter(jnp.asarray(noisy))
    clean_mag, _ = stft_splitter(jnp.asarray(clean))
    clean = jnp.asarray(clean)

    model = tiny_ndns_model()
    x = jnp.transpose(noisy_mag, (0, 2, 1))
    state = make_state(model, x)
    step = make_ndns_train_step(model, batchnorm=True, microbatch=2)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        state, metrics = step(state, rng, noisy_mag, noisy_phase,
                              clean_mag, clean)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # BN stats advanced (EMA moved off the init values)
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)
