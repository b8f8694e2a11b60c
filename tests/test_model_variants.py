"""Coverage for the less-common model configurations: LayerNorm, postnorm,
padded classification, mode='last', complex_normal C init, bidirectional
training, dt_global, step_rescale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.models.seq_model import ClassificationModel, RegressionModel
from sparsernns_tpu.models.ssm import make_ssm_init_fn
from sparsernns_tpu.models.ssm_init import blocked_dplr_init
from tests.test_models import make_mixer, small_init


def test_layernorm_path(rng):
    model = RegressionModel(
        mixer_cls=make_mixer(8), n_layers=1, d_model=8, d_output=5,
        dropout=0.0, batchnorm=False, prenorm=True, training=False)
    x = jnp.asarray(rng.randn(2, 12, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in variables
    y = model.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all()


def test_postnorm_path(rng):
    model = RegressionModel(
        mixer_cls=make_mixer(8), n_layers=2, d_model=8, d_output=5,
        dropout=0.0, batchnorm=True, prenorm=False, training=False)
    x = jnp.asarray(rng.randn(2, 12, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all()


def test_padded_classification_pool(rng):
    model = ClassificationModel(
        mixer_cls=make_mixer(8), n_layers=1, d_model=8, d_output=3,
        dropout=0.0, training=False, padded=True, mode="pool")
    x = jnp.asarray(rng.randn(3, 12, 5), jnp.float32)
    lengths = jnp.asarray([4.0, 12.0, 8.0])
    variables = model.init(jax.random.PRNGKey(0), (x, lengths))
    y = model.apply(variables, (x, lengths))
    assert y.shape == (3, 3)
    # padded region must not affect the result
    x2 = x.at[0, 4:].set(99.0)
    y2 = model.apply(variables, (x2, lengths))
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y2[0]),
                               atol=1e-4)


def test_classification_mode_last(rng):
    model = ClassificationModel(
        mixer_cls=make_mixer(8), n_layers=1, d_model=8, d_output=3,
        dropout=0.0, training=False, mode="last")
    x = jnp.asarray(rng.randn(2, 12, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (2, 3)


def test_complex_normal_c_init():
    init = small_init()
    mixer = make_mixer(8, init, c_init="complex_normal")()
    x = jnp.ones((1, 8, 8))
    variables = mixer.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["C"].shape == (8, init["P"], 2)
    ys, _ = mixer.apply(variables, x)
    assert np.isfinite(np.asarray(ys)).all()


def test_trunc_standard_normal_c_init():
    init = small_init()
    mixer = make_mixer(8, init, c_init="trunc_standard_normal")()
    x = jnp.ones((1, 8, 8))
    variables = mixer.init(jax.random.PRNGKey(0), x)
    ys, _ = mixer.apply(variables, x)
    assert np.isfinite(np.asarray(ys)).all()


def test_bidirectional_training_step(rng):
    from tests.test_train import make_state
    from sparsernns_tpu.train.steps import make_ndns_train_step
    model = RegressionModel(
        mixer_cls=make_mixer(8, bidirectional=True), n_layers=1,
        d_model=8, d_output=17, dropout=0.0, prenorm=True, batchnorm=True,
        training=True)
    x = jnp.asarray(rng.randn(2, 16, 17), jnp.float32)
    state = make_state(model, x)
    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    clean = jnp.asarray(rng.randn(2, 15 * 128), jnp.float32)
    step = make_ndns_train_step(model, batchnorm=True)
    state, m = step(state, jax.random.PRNGKey(0), noisy_mag,
                    jnp.zeros_like(noisy_mag), noisy_mag * 0.9, clean)
    assert np.isfinite(float(m["loss"]))


def test_step_rescale_changes_dynamics(rng):
    init = small_init()
    x = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
    m1 = make_mixer(8, init)(step_rescale=1.0)
    variables = m1.init(jax.random.PRNGKey(0), x)
    y1, _ = m1.apply(variables, x)
    m2 = make_mixer(8, init)(step_rescale=0.5)
    y2, _ = m2.apply(variables, x)
    assert float(jnp.abs(y1 - y2).max()) > 1e-4


def test_dt_global_optimizer_grouping():
    from sparsernns_tpu.train.optim import create_optimizer
    params = {"mixer": {"log_step": jnp.ones((4, 1)),
                        "Lambda_re": jnp.ones(4)},
              "dense": {"kernel": jnp.ones((4, 4))}}
    for dt_global in (False, True):
        tx = create_optimizer("standard", total_steps=10, warmup_steps=1,
                              dt_global=dt_global)
        state = tx.init(params)  # builds without error; grouping differs
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # with dt_global, log_step belongs to "regular" (nonzero adamw lr);
        # without, to "ssm" — both must produce finite updates
        assert np.isfinite(
            np.asarray(updates["mixer"]["log_step"])).all()


@pytest.mark.slow
def test_bidirectional_fused_grads_match_associative(rng):
    """Bidirectional at kernel speed (VERDICT round-1 item 6): with
    scan_mode='fused' the mixer routes both scan directions through the
    Pallas kernels (fwd + reverse custom VJPs) — outputs and grads must
    match the associative path."""
    x = jnp.asarray(rng.randn(2, 16, 8) * 0.5, jnp.float32)

    def build(scan_mode):
        return RegressionModel(
            mixer_cls=make_mixer(8, bidirectional=True,
                                 scan_mode=scan_mode),
            n_layers=1, d_model=8, d_output=17, dropout=0.0, prenorm=True,
            batchnorm=True, training=False)

    m_a = build("associative")
    m_f = build("fused")
    variables = m_a.init(jax.random.PRNGKey(0), x)

    def loss(model, params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]}, x)
        return jnp.mean(out ** 2)

    y_a = m_a.apply(variables, x)
    y_f = m_f.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_f), atol=2e-3)

    g_a = jax.grad(lambda p: loss(m_a, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(m_f, p))(variables["params"])
    for ga, gf in zip(jax.tree_util.tree_leaves(g_a),
                      jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gf),
                                   rtol=5e-2, atol=2e-3)
