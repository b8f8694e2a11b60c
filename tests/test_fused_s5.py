"""Fused S5 kernel (B-proj + scan + C-proj in one Pallas call) vs the
unfused model path."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply
from sparsernns_tpu.ops.scan import associative_diag_scan


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
