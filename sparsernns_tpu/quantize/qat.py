"""Quantization-aware-training ops (dynamic fake-quant).

Replaces the reference's AQT dependency (`aqtp`; used via
`sparseRNNs/utils/quantization.py:221-283` `q_dot_maybe`/`q_had_maybe` and
`QuantizedOperations`) with a self-contained implementation.

Semantics: per-tensor symmetric dynamic quantization over ALL axes (the
reference configures AQT with ``CalibrationMode.ALL_AXES`` and no stochastic
rounding), with a straight-through estimator for gradients. Because scales
are per-tensor scalars, ``dot(fq(a), fq(w)) == s_a*s_w*dot(a_q, w_q)``
exactly, so fake-quant matmuls in fp32 are mathematically identical to the
integer matmuls executed by the Pallas/XLA int8 inference path.

TPU notes: all dots contract through a single large `dot_general` (MXU);
the fake-quant itself is two cheap VPU ops that XLA fuses into the matmul's
producer.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sparsernns_tpu.quantize.config import QuantizationConfig

_EPS = 1e-20


def _symmetric_scale(x: jax.Array, bits: int) -> jax.Array:
    qmax = 2.0 ** (bits - 1) - 1.0
    amax = jnp.max(jnp.abs(x))
    return jnp.maximum(amax, _EPS) / qmax


def fake_quant(x: jax.Array, bits: Optional[int]) -> jax.Array:
    """Per-tensor symmetric fake-quantization with STE.

    bits=None or >=32 is the identity (float path), matching the reference's
    `q_dot_maybe` None-handling (quantization.py:228-238).
    """
    if bits is None or bits >= 32:
        return x
    if x.size == 0:
        # associative_scan's recursion applies the combine to zero-length
        # slices at its deepest level — absmax has no identity there
        return x
    qmax = 2.0 ** (bits - 1) - 1.0
    scale = _symmetric_scale(lax.stop_gradient(x), bits)
    xq = jnp.clip(jnp.round(x / scale), -qmax - 1.0, qmax)
    xdq = xq * scale
    return x + lax.stop_gradient(xdq - x)


def q_dot(act_bits: Optional[int], weight_bits: Optional[int]) -> Callable:
    """Quantized dot: contracts the last axis of ``x`` with the first of ``w``.

    Argument order is (activation, weight) — the natively-batched layout
    used throughout this framework (``(B, L, H) @ (H, N)``), unlike the
    reference which contracts (weight, activation) per-sample under vmap
    (ssm.py:116-124). The quantization semantics are identical.
    """
    if act_bits is None and weight_bits is None:
        return lambda x, w: jnp.matmul(x, w, precision=lax.Precision.HIGHEST)

    def _dot(x, w):
        xq = fake_quant(x, act_bits)
        wq = fake_quant(w, weight_bits)
        return jnp.matmul(xq, wq, precision=lax.Precision.HIGHEST)

    return _dot


def q_had(left_bits: Optional[int], right_bits: Optional[int]) -> Callable:
    """Quantized elementwise (hadamard) multiply, all axes per-tensor."""
    if left_bits is None and right_bits is None:
        return jnp.multiply

    def _had(a, b):
        return fake_quant(a, left_bits) * fake_quant(b, right_bits)

    return _had


@dataclasses.dataclass
class QuantizedOps:
    """Bundle of (possibly quantized) ops for the S5 stack.

    Mirrors the reference's `QuantizedOperations` (quantization.py:185-218):
      a_had: pair (aa_had, ax_had) for Λ·Λ and Λ·x hadamards in the scan
      b_dot: input projection  u @ W_B
      c_dot: output projection x @ W_C
      d_had: feedthrough       D ⊙ u
      dense_dot: non-SSM Dense layers (encoder/decoder/GLU)

    In static-quant mode ops are plain float ops — quantization is handled
    by FakeQuant observers / frozen scales around them, exactly as the
    reference does (quantization.py:204-209).
    """

    a_had: Tuple[Callable, Callable]
    b_dot: Callable
    c_dot: Callable
    d_had: Callable
    dense_dot: Callable

    @staticmethod
    def create(cfg: QuantizationConfig) -> "QuantizedOps":
        if cfg.static_quant or not cfg.any_quantized:
            mm = lambda x, w: jnp.matmul(x, w, precision=lax.Precision.HIGHEST)
            return QuantizedOps(
                a_had=(jnp.multiply, jnp.multiply),
                b_dot=mm,
                c_dot=mm,
                d_had=jnp.multiply,
                dense_dot=mm,
            )
        return QuantizedOps(
            a_had=(
                q_had(cfg.a_precision, cfg.a_precision),
                q_had(cfg.a_precision, cfg.ssm_act_precision),
            ),
            b_dot=q_dot(cfg.ssm_act_precision, cfg.b_precision),
            c_dot=q_dot(cfg.ssm_act_precision, cfg.c_precision),
            d_had=q_had(cfg.d_precision, cfg.ssm_act_precision),
            dense_dot=q_dot(cfg.non_ssm_act_precision, cfg.non_ssm_precision),
        )
