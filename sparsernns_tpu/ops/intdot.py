"""Exact int8-MXU execution of quantized matmuls with up-to-16-bit
activations.

The w8a16 recipe (the reference's flagship quant target,
/root/reference/sparseRNNs/utils/quantization.py:127-136) stores 8-bit
weights but 16-bit activations — too wide for the MXU's int8 path, so
the serving kernels used to run those dots in f32 on dequantized
weights, several times below the MXU's bf16 rate. This module runs them
as integer arithmetic anyway:

  the int16 activation code q splits exactly into two int8 planes

      q = 256 * hi + (lo - 128) + 128,
      hi = floor(q / 256)      in [-128, 127]
      lo = q - 256 * hi        in [0, 255]  ->  lo - 128 in [-128, 127]

  so  q . W = 256 * (hi . W) + ((lo - 128) . W) + 128 * colsum(W)

with every term an int8 x int8 -> int32 MXU dot (or a precomputable
int32 column sum). Integer arithmetic has no summation-order ambiguity,
so the decomposition is EXACT and bit-reproducible across XLA
``dot_general`` and Mosaic — per-op and fused engine paths agree
bit-for-bit on the accumulator.

Quantizing the activation onto its frozen grid first is not an
approximation we introduce: it is what the static-quant emulation
itself does around every dot (quant_ut / quant_xt / quant_input,
models/ssm.py + quantize/static.py — reference semantics
quantization.py:403-474, :673-816). The engine's float path SKIPS that
input quantization; this path executes it, so it sits closer to the
bit-faithful sequential reference than the f32 dots did.

Overflow budget: the true product is bounded by |q|·|w| <= 2^15 · 2^7
per term (the static grid clips to qmin = -2^(b-1), so codes reach
-32768 and weight codes reach -128 — both extremes, same sign, multiply
to +2^22), so the single-accumulator int32 condition is
K · 2^22 <= 2^31 - 1, i.e. K <= 511. Padded reduction dims are
128-multiples, so the largest single-accumulator K is 384 (exactly the
flagship shapes at dim_scale=1).

Beyond that (e.g. dim_scale=2 -> 2P=512) the dots still run on the int8
MXU via PLANE-WISE accumulation: the hi-plane dot is bounded per term by
2^14 (int32-safe to K = 131071), and the combined lo-plane + colsum pair
equals sum((lo_code) · w) with lo_code = lo + 128 in [0, 255], so its
per-term bound is 255 · 128 = 32640 (int32-safe to K = 65793; the
anticorrelation between (lo-128)·w and 128·colsum is what keeps it
under the naive K · 2^15). The planes are accumulated separately in
int32 and combined in f32:

    acc = 256.0 * f32(hi . W) + f32((lo - 128) . W + 128 * colsum)

Every integer term is exact; the one f32 add rounds only when the
accumulator magnitude exceeds 2^24 — the same bound the <=511 path's
final int32 -> f32 cast already had on its OUTPUT, so the returned
value is never less precise than the single-accumulator formula's.
MAX_REDUCTION_DIM is therefore the plane-wise budget 65536; fits_int32
still answers the stricter single-accumulator question (used to pick
the formula, keeping <=511-dim results bit-identical to round 2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

#: largest (padded) reduction dim the int path serves: the plane-wise
#: lo-plane + colsum accumulator is bounded by K * 255 * 128, so the
#: exact budget is K <= (2^31 - 1) / 32640 = 65793; 65536 is the
#: largest power-of-two inside it
MAX_REDUCTION_DIM = 65536


def fits_int32(k_padded: int, a_bits: int = 16) -> bool:
    """Single-int32-accumulator condition for the fused decomposition:
    K * 2^(a_bits-1) * 128 <= 2^31 - 1 (both grids clip to -2^(b-1)).
    Beyond this, int16_dot switches to plane-wise accumulation —
    use fits_planewise for the serve-at-all eligibility question."""
    return k_padded * (1 << (a_bits - 1)) * 128 <= 2**31 - 1


def fits_planewise(k_padded: int) -> bool:
    """Plane-wise accumulation budget (module docstring): hi-plane dot
    bounded by K * 2^14, lo-plane + 128*colsum pair by K * 255 * 128."""
    return k_padded <= MAX_REDUCTION_DIM


def quantize_codes(x: jax.Array, scale: float, bits: int) -> jax.Array:
    """f32 tensor -> its integer codes on the frozen symmetric grid
    (float-valued integers; same rounding/clip as static.quant_dequant)."""
    qmax = float(2 ** (bits - 1) - 1)
    return jnp.clip(jnp.round(x / scale), -(qmax + 1.0), qmax)


def i16_planes(q: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Split integer-valued f32 codes in [-2^15, 2^15-1] into the two
    exact int8 planes (hi, lo - 128)."""
    hi = jnp.floor(q * (1.0 / 256.0))
    lo = q - hi * 256.0 - 128.0
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def weight_colsum(w_i8) -> jax.Array:
    """Precomputable int32 column sums of an int8 weight (the +128
    correction row). Accepts numpy or jax arrays."""
    return jnp.sum(jnp.asarray(w_i8, jnp.int32), axis=0)


def _dot_i8(a_i8: jax.Array, w_i8: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 contraction over a's last / w's first dim.
    Works identically under XLA jit and inside Pallas kernels."""
    return jax.lax.dot_general(
        a_i8, w_i8, (((a_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def int16_dot(x: jax.Array, w_i8: jax.Array, colsum_i32: jax.Array,
              in_scale: float, bits: int,
              codes: Optional[jax.Array] = None) -> jax.Array:
    """``fq(x) @ (w_i8 * w_scale)`` with the activation fake-quantized at
    (in_scale, bits), executed exactly on the int8 MXU. Returns the f32
    ACCUMULATOR (codes dot); the caller multiplies by in_scale * w_scale.

    ``codes``: pass precomputed integer codes (float-valued) to skip the
    quantization — e.g. states already requantized onto this grid.
    """
    q = quantize_codes(x, in_scale, bits) if codes is None else codes
    k = q.shape[-1]
    if bits <= 8:
        acc = _dot_i8(q.astype(jnp.int8), w_i8).astype(jnp.float32)
    elif fits_int32(k, bits):
        hi, lo = i16_planes(q)
        acc = (_dot_i8(hi, w_i8) * 256 + _dot_i8(lo, w_i8)
               + colsum_i32 * 128).astype(jnp.float32)
    else:
        # plane-wise accumulation (K > 511): each int32 term is exact
        # (bounds in the module docstring); ONE f32 add combines them
        if k > MAX_REDUCTION_DIM:
            raise ValueError(
                f"int16_dot: reduction dim {k} exceeds the plane-wise "
                f"int32 budget ({MAX_REDUCTION_DIM}); run this dot in "
                "f32 (engine call sites gate on fits_planewise)")
        hi, lo = i16_planes(q)
        acc = (_dot_i8(hi, w_i8).astype(jnp.float32) * 256.0
               + (_dot_i8(lo, w_i8)
                  + colsum_i32 * 128).astype(jnp.float32))
    return acc
