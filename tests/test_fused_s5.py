"""Fused S5 kernel (B-proj + scan + C-proj in one Pallas call) vs the
unfused model path."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply
from sparsernns_tpu.ops.scan import associative_diag_scan
import pytest


def test_fused_matches_composed(rng):
    b, l, h, p = 2, 50, 12, 16
    lam_c = 0.9 * np.exp(1j * rng.uniform(0, np.pi, p)) * rng.uniform(0.3, 1, p)
    lam = (jnp.asarray(lam_c.real, jnp.float32),
           jnp.asarray(lam_c.imag, jnp.float32))
    u = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    w_b = jnp.asarray(rng.randn(h, 2 * p), jnp.float32)
    w_c = jnp.asarray(rng.randn(2 * p, h), jnp.float32)
    d = jnp.asarray(rng.randn(h), jnp.float32)

    # composed reference
    bu = u @ w_b
    xs = associative_diag_scan(lam, (bu[..., :p], bu[..., p:]))
    y_ref = jnp.concatenate(xs, axis=-1) @ w_c + d * u

    y = fused_s5_apply(u, lam, w_b, w_c, d, block_t=32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-3)


def test_fused_relu_state(rng):
    b, l, h, p = 1, 40, 8, 8
    lam = (jnp.full((p,), 0.8, jnp.float32), jnp.full((p,), 0.05, jnp.float32))
    u = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    w_b = jnp.asarray(rng.randn(h, 2 * p), jnp.float32)
    w_c = jnp.asarray(rng.randn(2 * p, h), jnp.float32)
    d = jnp.zeros((h,), jnp.float32)

    bu = u @ w_b
    xs = associative_diag_scan(lam, (bu[..., :p], bu[..., p:]))
    xs_r = (jax.nn.relu(xs[0]), jax.nn.relu(xs[1]))
    y_ref = jnp.concatenate(xs_r, axis=-1) @ w_c

    y = fused_s5_apply(u, lam, w_b, w_c, d, block_t=32, relu_state=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-3)


def test_model_fused_mode_matches_associative(rng):
    from tests.test_models import make_mixer, small_init
    init = small_init()
    h = 8
    x = jnp.asarray(rng.randn(2, 24, h), jnp.float32)
    m_assoc = make_mixer(h, init, scan_mode="associative")()
    variables = m_assoc.init(jax.random.PRNGKey(0), x)
    ys_a, _ = m_assoc.apply(variables, x)
    m_fused = make_mixer(h, init, scan_mode="fused")()
    ys_f, xs_f = m_fused.apply(variables, x)
    assert xs_f is None
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_a), atol=5e-3)


def test_fused_vjp_matches_composed_grads(rng):
    from sparsernns_tpu.ops.pallas.fused_vjp import fused_s5_apply_diff
    b, l, h, p = 2, 40, 8, 8
    lam_c = 0.85 * np.exp(1j * rng.uniform(0, np.pi, p))
    lam = (jnp.asarray(lam_c.real, jnp.float32),
           jnp.asarray(lam_c.imag, jnp.float32))
    u = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    w_b = jnp.asarray(rng.randn(h, 2 * p) * 0.3, jnp.float32)
    w_c = jnp.asarray(rng.randn(2 * p, h) * 0.3, jnp.float32)
    d = jnp.asarray(rng.randn(h) * 0.3, jnp.float32)

    def loss_fused(u, lam, w_b, w_c, d):
        y = fused_s5_apply_diff(u, lam, w_b, w_c, d, block_t=32, relu_state=False)
        return jnp.sum(y ** 2)

    def loss_ref(u, lam, w_b, w_c, d):
        bu = u @ w_b
        xs = associative_diag_scan(lam, (bu[..., :p], bu[..., p:]))
        y = jnp.concatenate(xs, axis=-1) @ w_c + d * u
        return jnp.sum(y ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(u, lam, w_b, w_c, d)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(u, lam, w_b, w_c, d)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_fused_vjp_relu_state_grads(rng):
    from sparsernns_tpu.ops.pallas.fused_vjp import fused_s5_apply_diff
    b, l, h, p = 1, 32, 8, 8
    lam = (jnp.full((p,), 0.8, jnp.float32), jnp.full((p,), 0.1, jnp.float32))
    u = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    w_b = jnp.asarray(rng.randn(h, 2 * p) * 0.3, jnp.float32)
    w_c = jnp.asarray(rng.randn(2 * p, h) * 0.3, jnp.float32)
    d = jnp.zeros((h,), jnp.float32)

    def loss_fused(w_b):
        y = fused_s5_apply_diff(u, lam, w_b, w_c, d, block_t=32, relu_state=True)
        return jnp.sum(y ** 2)

    def loss_ref(w_b):
        bu = u @ w_b
        xs = associative_diag_scan(lam, (bu[..., :p], bu[..., p:]))
        xs = (jax.nn.relu(xs[0]), jax.nn.relu(xs[1]))
        y = jnp.concatenate(xs, axis=-1) @ w_c
        return jnp.sum(y ** 2)

    gf = jax.grad(loss_fused)(w_b)
    gr = jax.grad(loss_ref)(w_b)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-2, atol=2e-2)


def test_training_with_fused_scan_mode(rng):
    """A full train step through scan_mode='fused' (custom VJP path)."""
    from tests.test_train import make_state
    from tests.test_models import make_mixer, small_init
    from sparsernns_tpu.models.seq_model import RegressionModel
    from sparsernns_tpu.train.steps import make_ndns_train_step

    init = small_init()
    model = RegressionModel(
        mixer_cls=make_mixer(8, init, scan_mode="fused"), n_layers=1,
        d_model=8, d_output=17, dropout=0.0, prenorm=True, batchnorm=True,
        glu_variant="half1", training=True)
    x = jnp.asarray(rng.randn(2, 16, 17), jnp.float32)
    state = make_state(model, x)
    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    clean = jnp.asarray(rng.randn(2, 15 * 128), jnp.float32)
    step = make_ndns_train_step(model, batchnorm=True)
    losses = []
    for _ in range(3):
        state, m = step(state, jax.random.PRNGKey(0), noisy_mag,
                        jnp.zeros_like(noisy_mag), noisy_mag * 0.9, clean)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
