"""Fixed-point tensor library tests: bit-exact semantics of shift-round,
conversions, arithmetic; float-parity within quantization error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.fxp.array import (ComplexFxpArray, FxpArray, RoundingMode,
                                      fxp_add, fxp_change_cfg, fxp_change_exp,
                                      fxp_complex_mul, fxp_from_fp,
                                      fxp_matmul, fxp_mean, fxp_mul, fxp_relu,
                                      fxp_rshift_round, fxp_sub)


def test_rshift_round_modes():
    x = jnp.asarray([7, 8, 9, -7, -8, -9], jnp.int32)
    np.testing.assert_array_equal(
        fxp_rshift_round(x, 3, RoundingMode.FLOOR), [0, 1, 1, -1, -1, -2])
    np.testing.assert_array_equal(
        fxp_rshift_round(x, 3, RoundingMode.CEIL), [1, 1, 2, 0, -1, -1])
    # ROUND is floor(x/8 + 0.5): half rounds toward +inf
    np.testing.assert_array_equal(
        fxp_rshift_round(x, 3, RoundingMode.ROUND), [1, 1, 1, -1, -1, -1])
    assert fxp_rshift_round(x, 0) is x


def test_from_fp_roundtrip():
    x = jnp.asarray([0.5, -0.25, 0.125, 0.7], jnp.float32)
    fx = fxp_from_fp(x, bits=16, exp=8)
    out = np.asarray(fx.to_float())
    np.testing.assert_allclose(out, np.asarray(x), atol=2 ** -8)
    # exact grid values are preserved exactly
    np.testing.assert_allclose(out[:3], [0.5, -0.25, 0.125])


def test_from_fp_clips_to_range():
    fx = fxp_from_fp(jnp.asarray([100.0, -100.0]), bits=8, exp=4)
    assert int(fx.data.max()) == 127
    assert int(fx.data.min()) == -128


def test_minmax_vals():
    a = FxpArray(jnp.zeros(1, jnp.int32), bits=8, exp=0, signed=True)
    assert a.minval() == -128 and a.maxval() == 127
    u = FxpArray(jnp.zeros(1, jnp.int32), bits=8, exp=0, signed=False)
    assert u.minval() == 0 and u.maxval() == 255


def test_change_exp():
    fx = fxp_from_fp(jnp.asarray([1.5]), bits=16, exp=4)
    up = fxp_change_exp(fx, 8)
    assert up.exp == 8 and int(up.data[0]) == 1.5 * 256
    down = fxp_change_exp(up, 2, RoundingMode.FLOOR)
    np.testing.assert_allclose(down.to_float(), [1.5])


def test_change_cfg_overflow_clips():
    fx = fxp_from_fp(jnp.asarray([100.0]), bits=16, exp=8)
    narrow = fxp_change_cfg(fx, new_bits=8, new_exp=4, new_signed=True)
    assert narrow.bits == 8
    # 100.0 does not fit in s8.4 -> saturates at 127/16
    assert float(narrow.to_float()[0]) == pytest.approx(127 / 16, abs=1e-6)


def test_add_sub_aligned_exponents():
    a = fxp_from_fp(jnp.asarray([1.0, 2.0]), bits=16, exp=8)
    b = fxp_from_fp(jnp.asarray([0.5, -1.0]), bits=16, exp=6)
    s = fxp_add(a, b)
    assert s.exp == 8
    np.testing.assert_allclose(s.to_float(), [1.5, 1.0], atol=2 ** -6)
    d = fxp_sub(a, b)
    np.testing.assert_allclose(d.to_float(), [0.5, 3.0], atol=2 ** -6)


def test_mul_matches_float():
    rng = np.random.RandomState(0)
    xa = rng.uniform(-2, 2, 16).astype(np.float32)
    xb = rng.uniform(-2, 2, 16).astype(np.float32)
    a = fxp_from_fp(jnp.asarray(xa), bits=16, exp=10)
    b = fxp_from_fp(jnp.asarray(xb), bits=16, exp=10)
    out = fxp_mul(a, b, result_exp=10, result_bits=16)
    np.testing.assert_allclose(out.to_float(), xa * xb, atol=2 ** -7)


def test_matmul_matches_float():
    rng = np.random.RandomState(1)
    xa = rng.uniform(-1, 1, (4, 8)).astype(np.float32)
    xb = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    a = fxp_from_fp(jnp.asarray(xa), bits=12, exp=9)
    b = fxp_from_fp(jnp.asarray(xb), bits=12, exp=9)
    out = fxp_matmul(a, b, result_exp=9, result_bits=24)
    np.testing.assert_allclose(out.to_float(), xa @ xb, atol=2 ** -5)


def test_complex_mul_matches_complex():
    rng = np.random.RandomState(2)
    za = (rng.uniform(-1, 1, 8) + 1j * rng.uniform(-1, 1, 8)).astype(np.complex64)
    zb = (rng.uniform(-1, 1, 8) + 1j * rng.uniform(-1, 1, 8)).astype(np.complex64)
    a = ComplexFxpArray(
        real=fxp_from_fp(jnp.asarray(za.real), bits=16, exp=12),
        imag=fxp_from_fp(jnp.asarray(za.imag), bits=16, exp=12))
    b = ComplexFxpArray(
        real=fxp_from_fp(jnp.asarray(zb.real), bits=16, exp=12),
        imag=fxp_from_fp(jnp.asarray(zb.imag), bits=16, exp=12))
    out = fxp_complex_mul(a, b, result_exp=(12, 12), result_bits=(18, 18))
    expected = za * zb
    np.testing.assert_allclose(out.real.to_float(), expected.real, atol=2 ** -9)
    np.testing.assert_allclose(out.imag.to_float(), expected.imag, atol=2 ** -9)


def test_relu_and_complex_relu():
    fx = fxp_from_fp(jnp.asarray([-1.0, 2.0]), bits=8, exp=4)
    np.testing.assert_allclose(fxp_relu(fx).to_float(), [0.0, 2.0])
    z = ComplexFxpArray(real=fx, imag=fx)
    zr = fxp_relu(z)
    np.testing.assert_allclose(zr.imag.to_float(), [0.0, 2.0])


def test_mean():
    fx = fxp_from_fp(jnp.asarray([[1.0, 2.0], [3.0, 5.0]]), bits=16, exp=8)
    m = fxp_mean(fx, axis=0)
    np.testing.assert_allclose(m.to_float(), [2.0, 3.5], atol=2 ** -7)


def test_fxp_is_jittable():
    @jax.jit
    def f(a: FxpArray, b: FxpArray):
        return fxp_mul(a, b, result_exp=8, result_bits=16)

    a = fxp_from_fp(jnp.asarray([0.5]), bits=16, exp=8)
    out = f(a, a)
    np.testing.assert_allclose(out.to_float(), [0.25])


def test_overflow_count():
    a = FxpArray(jnp.asarray([1000, -1000, 3], jnp.int32), bits=8, exp=0)
    assert int(a.overflow_count()) == 2
    assert int(a.clip().overflow_count()) == 0
