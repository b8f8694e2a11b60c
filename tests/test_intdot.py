"""Exactness of the int16-activation -> two-int8-plane MXU decomposition
(ops/intdot.py): the decomposed dot must equal the direct integer matmul
bit-for-bit, including at the clip edges and the int32 overflow budget."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.intdot import (MAX_REDUCTION_DIM, fits_int32,
                                       fits_planewise, i16_planes, int16_dot,
                                       quantize_codes, weight_colsum)


@pytest.mark.parametrize("bits", [16, 12, 9, 8])
def test_int16_dot_exact(bits):
    rng = np.random.RandomState(0)
    k, n, t = 192, 256, 17
    w = rng.randint(-128, 128, size=(k, n)).astype(np.int8)
    x = rng.randn(t, k).astype(np.float32) * 3.0
    s = 2.0 ** -7

    acc = np.asarray(int16_dot(jnp.asarray(x), jnp.asarray(w),
                               weight_colsum(w), s, bits))
    q = np.asarray(quantize_codes(jnp.asarray(x), s, bits))
    ref = q.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))


def test_planes_cover_full_range():
    q = jnp.arange(-32768.0, 32768.0, 17.0, dtype=jnp.float32)
    hi, lo = i16_planes(q)
    hi = np.asarray(hi, np.int64)
    lo = np.asarray(lo, np.int64)
    assert hi.min() >= -128 and hi.max() <= 127
    assert lo.min() >= -128 and lo.max() <= 127
    np.testing.assert_array_equal(256 * hi + lo + 128,
                                  np.asarray(q, np.int64))


def test_precomputed_codes_path():
    rng = np.random.RandomState(1)
    k, n = 64, 32
    w = rng.randint(-128, 128, size=(k, n)).astype(np.int8)
    codes = rng.randint(-30000, 30000, size=(5, k)).astype(np.float32)
    acc = np.asarray(int16_dot(jnp.zeros((5, k)), jnp.asarray(w),
                               weight_colsum(w), 1.0, 16,
                               codes=jnp.asarray(codes)))
    ref = codes.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))


def test_overflow_budget_at_max_dim():
    """Worst-case magnitudes at the single-accumulator budget (K = 511)
    stay inside int32."""
    k = 511
    assert fits_int32(k) and not fits_int32(k + 1)
    w = np.full((k, 8), 127, np.int8)
    codes = np.full((2, k), -32768.0, np.float32)
    acc = np.asarray(int16_dot(jnp.zeros((2, k)), jnp.asarray(w),
                               weight_colsum(w), 1.0, 16,
                               codes=jnp.asarray(codes)))
    ref = codes.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))
    # and the mirrored edge
    codes = np.full((2, k), 32767.0, np.float32)
    w = np.full((k, 8), -128, np.int8)
    acc = np.asarray(int16_dot(jnp.zeros((2, k)), jnp.asarray(w),
                               weight_colsum(w), 1.0, 16,
                               codes=jnp.asarray(codes)))
    ref = codes.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))


def test_planewise_path_at_k512():
    """K = 512 (dim_scale=2's 2P) exceeds the single int32 budget and
    takes the plane-wise path — which at this K is still bit-identical
    to the correctly-rounded int64 reference: hi.W <= 2^23 and
    lo.W + 128*colsum <= 2^24 are both exactly f32-representable, so the
    one combining add is the only rounding, same as the int64->f32 cast."""
    assert not fits_int32(512) and fits_planewise(512)
    assert fits_planewise(MAX_REDUCTION_DIM)
    assert not fits_planewise(MAX_REDUCTION_DIM + 1)
    rng = np.random.RandomState(3)
    k, n, t = 512, 64, 9
    w = rng.randint(-128, 128, size=(k, n)).astype(np.int8)
    codes = rng.randint(-32768, 32768, size=(t, k)).astype(np.float32)
    acc = np.asarray(int16_dot(jnp.zeros((t, k)), jnp.asarray(w),
                               weight_colsum(w), 1.0, 16,
                               codes=jnp.asarray(codes)))
    ref = codes.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))
    # the aligned worst-case corner: true acc = 512 * 2^22 = 2^31 exactly
    w = np.full((k, 8), -128, np.int8)
    corner = np.full((2, k), -32768.0, np.float32)
    acc = np.asarray(int16_dot(jnp.zeros((2, k)), jnp.asarray(w),
                               weight_colsum(w), 1.0, 16,
                               codes=jnp.asarray(corner)))
    ref = corner.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))
    # zero-padding K (what the Pallas kernels see) changes nothing
    wp = np.zeros((640, 8), np.int8)
    wp[:k] = w
    cp = np.zeros((2, 640), np.float32)
    cp[:, :k] = corner
    accp = np.asarray(int16_dot(jnp.zeros((2, 640)), jnp.asarray(wp),
                                weight_colsum(wp), 1.0, 16,
                                codes=jnp.asarray(cp)))
    np.testing.assert_array_equal(accp, acc)


def test_overflow_budget_aligned_extreme_corner():
    """Review regression: codes = -32768 AND weight codes = -128 multiply
    to +2^22 per term, so K = 512 reaches exactly 2^31 and wraps — the
    old budget (K <= 512, derived with |w| <= 127) missed it. The exact
    gate is K * 2^15 * 2^7 <= 2^31 - 1, i.e. K <= 511; padded dims make
    384 the largest eligible K, where the aligned corner stays exact."""
    assert not fits_int32(512)
    assert fits_int32(511) and fits_int32(384)
    # w8a8 codes are 2^8 narrower: huge K budget
    assert fits_int32(2**16, a_bits=8)
    k = 384  # largest 128-multiple inside the exact budget
    w = np.full((k, 8), -128, np.int8)
    codes = np.full((2, k), -32768.0, np.float32)
    acc = np.asarray(int16_dot(jnp.zeros((2, k)), jnp.asarray(w),
                               weight_colsum(w), 1.0, 16,
                               codes=jnp.asarray(codes)))
    ref = codes.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(acc, ref.astype(np.float32))
