"""Scan backends: associative vs sequential vs numpy reference equality —
the property-test version of the reference's --validate_naive_scan gate
(convert.py:380-410)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.scan import (apply_carry, associative_diag_scan,
                                     diag_ssm_scan, lambda_powers,
                                     sequential_diag_scan)


def _random_inputs(rng, b=2, l=33, p=8):
    lam = 0.9 * np.exp(1j * rng.uniform(0, np.pi, size=p))
    lam = lam * rng.uniform(0.5, 1.0, size=p)
    bu = rng.randn(b, l, p) + 1j * rng.randn(b, l, p)
    return lam, bu


def _numpy_scan(lam, bu, reverse=False):
    out = np.zeros_like(bu)
    t_range = range(bu.shape[1])
    if reverse:
        t_range = reversed(list(t_range))
    x = np.zeros_like(bu[:, 0])
    for t in t_range:
        x = lam * x + bu[:, t]
        out[:, t] = x
    return out


def _to_pairs(lam, bu):
    return ((jnp.asarray(lam.real, jnp.float32), jnp.asarray(lam.imag, jnp.float32)),
            (jnp.asarray(bu.real, jnp.float32), jnp.asarray(bu.imag, jnp.float32)))


@pytest.mark.parametrize("reverse", [False, True])
def test_associative_matches_numpy(rng, reverse):
    lam, bu = _random_inputs(rng)
    lam_p, bu_p = _to_pairs(lam, bu)
    xs = associative_diag_scan(lam_p, bu_p, reverse=reverse)
    expected = _numpy_scan(lam, bu, reverse=reverse)
    np.testing.assert_allclose(xs[0], expected.real, atol=1e-4)
    np.testing.assert_allclose(xs[1], expected.imag, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_sequential_matches_associative(rng, reverse):
    lam, bu = _random_inputs(rng)
    lam_p, bu_p = _to_pairs(lam, bu)
    xs_a = diag_ssm_scan(lam_p, bu_p, mode="associative", reverse=reverse)
    xs_s = diag_ssm_scan(lam_p, bu_p, mode="sequential", reverse=reverse)
    np.testing.assert_allclose(xs_a[0], xs_s[0], atol=1e-4)
    np.testing.assert_allclose(xs_a[1], xs_s[1], atol=1e-4)


def test_sequential_returns_final_state(rng):
    lam, bu = _random_inputs(rng)
    lam_p, bu_p = _to_pairs(lam, bu)
    xs, x_final = sequential_diag_scan(lam_p, bu_p)
    np.testing.assert_allclose(x_final[0], xs[0][:, -1], atol=1e-6)
    np.testing.assert_allclose(x_final[1], xs[1][:, -1], atol=1e-6)


def test_carry_chaining_matches_full_scan(rng):
    """Scanning two chunks with carry passing == scanning the whole sequence.
    This is the invariant behind streaming inference and cross-chip
    sequence parallelism."""
    lam, bu = _random_inputs(rng, l=40)
    lam_p, bu_p = _to_pairs(lam, bu)
    full = diag_ssm_scan(lam_p, bu_p, mode="sequential")

    first = (bu_p[0][:, :20], bu_p[1][:, :20])
    second = (bu_p[0][:, 20:], bu_p[1][:, 20:])
    xs1, carry = sequential_diag_scan(lam_p, first)
    xs2, _ = sequential_diag_scan(lam_p, second, carry_init=carry)
    np.testing.assert_allclose(xs1[0], full[0][:, :20], atol=1e-4)
    np.testing.assert_allclose(xs2[0], full[0][:, 20:], atol=1e-4)
    np.testing.assert_allclose(xs2[1], full[1][:, 20:], atol=1e-4)


def test_apply_carry_matches_sequential_carry(rng):
    """Associative chunk scan + carry correction == sequential with carry."""
    lam, bu = _random_inputs(rng, l=16)
    lam_p, bu_p = _to_pairs(lam, bu)
    carry = (jnp.asarray(rng.randn(2, 8), jnp.float32),
             jnp.asarray(rng.randn(2, 8), jnp.float32))
    xs_seq, _ = sequential_diag_scan(lam_p, bu_p, carry_init=carry)
    xs_assoc = associative_diag_scan(lam_p, bu_p)
    xs_corr = apply_carry(xs_assoc, lam_p, carry)
    np.testing.assert_allclose(xs_corr[0], xs_seq[0], atol=1e-3)
    np.testing.assert_allclose(xs_corr[1], xs_seq[1], atol=1e-3)


def test_lambda_powers(rng):
    lam, _ = _random_inputs(rng, p=4)
    lam_p = (jnp.asarray(lam.real, jnp.float32), jnp.asarray(lam.imag, jnp.float32))
    pw = lambda_powers(lam_p, 5)
    expected = np.stack([lam ** k for k in range(1, 6)])
    np.testing.assert_allclose(pw[0], expected.real, atol=1e-4)
    np.testing.assert_allclose(pw[1], expected.imag, atol=1e-4)


def test_state_requant_sequential(rng):
    """Per-step requant runs and stays close to the float scan for fine scales."""
    lam, bu = _random_inputs(rng, l=12)
    lam_p, bu_p = _to_pairs(lam, bu)

    def requant(x):
        s = 2.0 ** -10
        return (jnp.round(x[0] / s) * s, jnp.round(x[1] / s) * s)

    xs_q = diag_ssm_scan(lam_p, bu_p, mode="sequential", state_requant=requant)
    xs = diag_ssm_scan(lam_p, bu_p, mode="sequential")
    np.testing.assert_allclose(xs_q[0], xs[0], atol=1e-2)

    with pytest.raises(NotImplementedError):
        diag_ssm_scan(lam_p, bu_p, mode="associative", state_requant=requant)


# ---------------- blocked (pure-XLA matmul) scan ----------------

@pytest.mark.parametrize("l,block_t", [(33, 8), (64, 16), (7, 16), (128, 128)])
def test_blocked_matches_numpy(rng, l, block_t):
    """Block-parallel matmul scan == linear recurrence at every length
    relation (L < T, L % T != 0, L == T, many blocks)."""
    from sparsernns_tpu.ops.scan import blocked_diag_scan
    lam, bu = _random_inputs(rng, l=l)
    lam_p, bu_p = _to_pairs(lam, bu)
    xs = blocked_diag_scan(lam_p, bu_p, block_t=block_t)
    expected = _numpy_scan(lam, bu)
    np.testing.assert_allclose(xs[0], expected.real, atol=1e-3)
    np.testing.assert_allclose(xs[1], expected.imag, atol=1e-3)


def test_blocked_reverse_and_carry(rng):
    from sparsernns_tpu.ops.scan import blocked_diag_scan
    lam, bu = _random_inputs(rng, l=29)
    lam_p, bu_p = _to_pairs(lam, bu)
    # reverse == numpy reverse recurrence
    xs_r = blocked_diag_scan(lam_p, bu_p, block_t=8, reverse=True)
    exp_r = _numpy_scan(lam, bu, reverse=True)
    np.testing.assert_allclose(xs_r[0], exp_r.real, atol=1e-3)
    # carry == sequential with the same carry
    carry = (jnp.asarray(np.ones((2, 8)), jnp.float32),
             jnp.asarray(0.5 * np.ones((2, 8)), jnp.float32))
    xs_c = blocked_diag_scan(lam_p, bu_p, block_t=8, carry_init=carry)
    xs_s, _ = sequential_diag_scan(lam_p, bu_p, carry_init=carry)
    np.testing.assert_allclose(xs_c[0], xs_s[0], atol=1e-3)
    np.testing.assert_allclose(xs_c[1], xs_s[1], atol=1e-3)


def test_blocked_mode_dispatch_and_grads(rng):
    """mode='blocked' dispatches, differentiates (it must train), and the
    gradient matches the associative backend's."""
    import jax
    lam, bu = _random_inputs(rng, l=19)
    lam_p, bu_p = _to_pairs(lam, bu)

    def loss(mode, lam_p, bu_p):
        xs = diag_ssm_scan(lam_p, bu_p, mode=mode, block_t=8)
        return jnp.sum(xs[0] ** 2 + 0.5 * xs[1] ** 2)

    for argnum, name in ((0, "lam"), (1, "bu")):
        g_b = jax.grad(lambda l_, b_: loss("blocked", l_, b_),
                       argnums=argnum)(lam_p, bu_p)
        g_a = jax.grad(lambda l_, b_: loss("associative", l_, b_),
                       argnums=argnum)(lam_p, bu_p)
        np.testing.assert_allclose(g_b[0], g_a[0], rtol=2e-3, atol=2e-3,
                                   err_msg=name)
        np.testing.assert_allclose(g_b[1], g_a[1], rtol=2e-3, atol=2e-3,
                                   err_msg=name)

    with pytest.raises(NotImplementedError):
        diag_ssm_scan(lam_p, bu_p, mode="blocked",
                      had_aa=lambda a, b: a * b)


def test_blocked_lowers_without_scan_ops(rng):
    """The whole point: the lowered HLO must contain NO while/scan/sort —
    only ops the conformance-limited transport executes (PERF.md round-3
    backend conformance)."""
    import jax
    lam, bu = _random_inputs(rng, l=33)
    lam_p, bu_p = _to_pairs(lam, bu)
    from sparsernns_tpu.ops.scan import blocked_diag_scan
    txt = jax.jit(lambda l_, b_: blocked_diag_scan(l_, b_, block_t=8)
                  ).lower(lam_p, bu_p).as_text()
    assert "stablehlo.while" not in txt
    assert "stablehlo.sort" not in txt
    assert "stablehlo.dot_general" in txt  # the scan IS matmuls


def test_blocked_block_requant_matches_pallas_placement(rng):
    """blocked + block_requant mirrors the Pallas kernel's static-quant
    placement (scan_kernel.py:162-176): states snap to the frozen pow2
    grid once per block, the carry is the requantized block-final. Same
    block_t => the two backends land on the same grid points."""
    from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
    from sparsernns_tpu.ops.scan import blocked_diag_scan
    lam, bu = _random_inputs(rng, l=32)
    lam_p, bu_p = _to_pairs(lam, bu)
    s = 2.0 ** -6
    rqspec = (s, s, 16)
    xs_b = blocked_diag_scan(lam_p, bu_p, block_t=8, block_requant=rqspec)
    xs_k = pallas_diag_scan(lam_p, bu_p, block_t=8, block_requant=rqspec,
                            interpret=True)
    np.testing.assert_allclose(xs_b[0], xs_k[0], atol=1e-5)
    np.testing.assert_allclose(xs_b[1], xs_k[1], atol=1e-5)
