"""Pallas scan kernel: numerics vs numpy/associative, VJP, model
integration. Runs in interpreter mode on CPU (compiled via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
from sparsernns_tpu.ops.pallas.scan_vjp import pallas_diag_scan_diff
from sparsernns_tpu.ops.scan import associative_diag_scan, diag_ssm_scan


def _inputs(rng, b=3, l=100, p=24):
    lam = 0.95 * np.exp(1j * rng.uniform(0, np.pi, p)) * rng.uniform(0.3, 1, p)
    bu = rng.randn(b, l, p) + 1j * rng.randn(b, l, p)
    lam_p = (jnp.asarray(lam.real, jnp.float32),
             jnp.asarray(lam.imag, jnp.float32))
    bu_p = (jnp.asarray(bu.real, jnp.float32),
            jnp.asarray(bu.imag, jnp.float32))
    return lam, bu, lam_p, bu_p


def _numpy_scan(lam, bu, reverse=False):
    out = np.zeros_like(bu)
    x = np.zeros((bu.shape[0], bu.shape[-1]), np.complex128)
    order = reversed(range(bu.shape[1])) if reverse else range(bu.shape[1])
    for t in order:
        x = lam * x + bu[:, t]
        out[:, t] = x
    return out


@pytest.mark.parametrize("block_t", [32, 128])
def test_pallas_matches_numpy(rng, block_t):
    lam, bu, lam_p, bu_p = _inputs(rng)
    out = pallas_diag_scan(lam_p, bu_p, block_t=block_t)
    ref = _numpy_scan(lam, bu)
    np.testing.assert_allclose(out[0], ref.real, atol=2e-4)
    np.testing.assert_allclose(out[1], ref.imag, atol=2e-4)


def test_pallas_reverse(rng):
    lam, bu, lam_p, bu_p = _inputs(rng, l=64)
    out = pallas_diag_scan(lam_p, bu_p, reverse=True, block_t=32)
    ref = _numpy_scan(lam, bu, reverse=True)
    np.testing.assert_allclose(out[0], ref.real, atol=2e-4)


def test_pallas_carry(rng):
    lam, bu, lam_p, bu_p = _inputs(rng, l=40)
    c = rng.randn(3, 24) + 1j * rng.randn(3, 24)
    carry = (jnp.asarray(c.real, jnp.float32), jnp.asarray(c.imag, jnp.float32))
    out = pallas_diag_scan(lam_p, bu_p, carry_init=carry, block_t=32)
    ref = np.zeros_like(bu)
    x = c.copy()
    for t in range(bu.shape[1]):
        x = lam * x + bu[:, t]
        ref[:, t] = x
    np.testing.assert_allclose(out[0], ref.real, atol=2e-4)


def test_pallas_vjp_matches_associative_grads(rng):
    lam, bu, lam_p, bu_p = _inputs(rng, b=2, l=48, p=8)

    def loss_pallas(lam_p, bu_p):
        xs = pallas_diag_scan_diff(lam_p, bu_p)
        return jnp.sum(xs[0] ** 2 + 0.5 * xs[1] * xs[0])

    def loss_assoc(lam_p, bu_p):
        xs = associative_diag_scan(lam_p, bu_p)
        return jnp.sum(xs[0] ** 2 + 0.5 * xs[1] * xs[0])

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(lam_p, bu_p)
    g_a = jax.grad(loss_assoc, argnums=(0, 1))(lam_p, bu_p)
    np.testing.assert_allclose(g_p[0][0], g_a[0][0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g_p[0][1], g_a[0][1], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g_p[1][0], g_a[1][0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g_p[1][1], g_a[1][1], rtol=1e-3, atol=1e-3)


def test_model_with_pallas_scan_matches_associative(rng):
    from tests.test_models import make_mixer, small_init
    init = small_init()
    h = 8
    x = jnp.asarray(rng.randn(2, 20, h), jnp.float32)
    m_assoc = make_mixer(h, init, scan_mode="associative")()
    variables = m_assoc.init(jax.random.PRNGKey(0), x)
    ys_a, _ = m_assoc.apply(variables, x)
    m_pal = make_mixer(h, init, scan_mode="pallas")()
    ys_p, _ = m_pal.apply(variables, x)
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_p),
                               atol=2e-3)


def test_diag_ssm_scan_pallas_dispatch(rng):
    lam, bu, lam_p, bu_p = _inputs(rng, l=32)
    out = diag_ssm_scan(lam_p, bu_p, mode="pallas")
    ref = _numpy_scan(lam, bu)
    np.testing.assert_allclose(out[0], ref.real, atol=2e-4)


def test_block_requant_scan(rng):
    """Blockwise requant tracks the per-step sequential requant within a
    small budget and actually lands states on the quantization grid."""
    from sparsernns_tpu.ops.scan import sequential_diag_scan
    lam, bu, lam_p, bu_p = _inputs(rng, b=2, l=96, p=16)
    s_re = s_im = 2.0 ** -8
    bits = 16

    def per_step_requant(x):
        qmax, qmin = 2 ** 15 - 1, -(2 ** 15)
        return (jnp.clip(jnp.round(x[0] / s_re), qmin, qmax) * s_re,
                jnp.clip(jnp.round(x[1] / s_im), qmin, qmax) * s_im)

    xs_seq, _ = sequential_diag_scan(lam_p, bu_p,
                                     state_requant=per_step_requant)
    xs_blk = pallas_diag_scan(lam_p, bu_p, block_t=32,
                              block_requant=(s_re, s_im, bits))
    # states land exactly on the pow2 grid
    q = np.asarray(xs_blk[0]) / s_re
    np.testing.assert_allclose(q, np.round(q), atol=1e-3)
    # and track the bit-faithful per-step path within a small budget
    err = np.abs(np.asarray(xs_blk[0]) - np.asarray(xs_seq[0])).max()
    ref = np.abs(np.asarray(xs_seq[0])).max()
    assert err < 0.02 * ref + 50 * s_re, (err, ref)


def test_pallas_reverse_vjp_matches_associative_grads(rng):
    """Reverse-scan custom VJP (bidirectional at kernel speed, VERDICT
    round-1 item 6): grads vs the associative reverse scan."""
    from sparsernns_tpu.ops.pallas.scan_vjp import pallas_diag_scan_diff_rev
    lam, bu, lam_p, bu_p = _inputs(rng, b=2, l=48, p=8)

    def loss_pallas(lam_p, bu_p):
        xs = pallas_diag_scan_diff_rev(lam_p, bu_p)
        return jnp.sum(xs[0] ** 2 + 0.5 * xs[1] * xs[0])

    def loss_assoc(lam_p, bu_p):
        xs = associative_diag_scan(lam_p, bu_p, reverse=True)
        return jnp.sum(xs[0] ** 2 + 0.5 * xs[1] * xs[0])

    v_p = loss_pallas(lam_p, bu_p)
    v_a = loss_assoc(lam_p, bu_p)
    np.testing.assert_allclose(v_p, v_a, rtol=1e-4)
    g_p = jax.grad(loss_pallas, argnums=(0, 1))(lam_p, bu_p)
    g_a = jax.grad(loss_assoc, argnums=(0, 1))(lam_p, bu_p)
    for gp, ga in zip(jax.tree_util.tree_leaves(g_p),
                      jax.tree_util.tree_leaves(g_a)):
        np.testing.assert_allclose(gp, ga, rtol=1e-3, atol=1e-3)


def test_qat_bits_scan_quantizes(rng):
    """pallas qat_bits applies in-kernel fake-quant: coarse bits change
    the output; generous bits track the float scan."""
    lam, bu, lam_p, bu_p = _inputs(rng, l=32)
    base = pallas_diag_scan(lam_p, bu_p)
    q16 = pallas_diag_scan(lam_p, bu_p, qat_bits=(16, 16))
    q4 = pallas_diag_scan(lam_p, bu_p, qat_bits=(4, 4))
    np.testing.assert_allclose(q16[0], base[0], atol=2e-3)
    assert np.abs(np.asarray(q4[0]) - np.asarray(base[0])).max() > 1e-3


@pytest.mark.parametrize("t", [8, 24, 40, 64, 311, 512])
def test_work_efficient_tree_matches_plain_doubling(rng, t):
    """_block_scan / _block_scan_rev (the ~half-pass work-efficient
    trees, round 4) reassociate the same λ-power products as plain
    Hillis-Steele doubling — outputs must agree to fp32 rounding at
    every branch of the recursion (t=512 exercises two levels, 311 the
    non-8-multiple plain fallback, 24/40 short recursions)."""
    from sparsernns_tpu.ops.pallas.scan_kernel import (
        _block_scan, _block_scan_rev, lambda_power_tables)
    p = 16
    lam = 0.95 * np.exp(1j * rng.uniform(0, np.pi, p)) * rng.uniform(
        0.3, 1, p)
    lam_re = jnp.asarray(lam.real, jnp.float32)
    lam_im = jnp.asarray(lam.imag, jnp.float32)
    num_passes = max(1, (t - 1).bit_length())
    pow_re, pow_im, _ = lambda_power_tables(lam_re, lam_im, t, num_passes)
    x = rng.randn(t, p) + 1j * rng.randn(t, p)
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)

    def plain(fr, fi, reverse):
        for k in range(num_passes):
            d = 1 << k
            if d >= t:
                break
            lr = pow_re[k:k + 1, :]
            li = pow_im[k:k + 1, :]
            pad = jnp.zeros((d, p), jnp.float32)
            if reverse:
                sr = jnp.concatenate([fr[d:], pad], axis=0)
                si = jnp.concatenate([fi[d:], pad], axis=0)
            else:
                sr = jnp.concatenate([pad, fr[:t - d]], axis=0)
                si = jnp.concatenate([pad, fi[:t - d]], axis=0)
            fr = fr + (lr * sr - li * si)
            fi = fi + (lr * si + li * sr)
        return fr, fi

    got = _block_scan(xr, xi, pow_re, pow_im, t)
    ref = plain(xr, xi, reverse=False)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-4, atol=2e-4)

    got_r = _block_scan_rev(xr, xi, pow_re, pow_im, t)
    ref_r = plain(xr, xi, reverse=True)
    np.testing.assert_allclose(got_r[0], ref_r[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_r[1], ref_r[1], rtol=2e-4, atol=2e-4)
