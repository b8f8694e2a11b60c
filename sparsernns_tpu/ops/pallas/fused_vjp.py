"""Custom VJP for the fused S5 kernel.

The forward keeps the state in VMEM (nothing saved); the backward
REMATERIALIZES the state with one extra Pallas scan (jax.checkpoint-style
trade: flops for HBM), then runs the adjoint:

    xs   = scan(λ, u @ W_b)                     (recompute, pallas)
    g_xs = g @ W_c^T  (gated by relu mask if relu_state)
    v    = reverse-scan(conj λ, g_xs)            (pallas)
    du   = [v_re v_im] @ W_b^T + g ⊙ d
    dW_b = u^T @ [v_re v_im]
    dW_c = [xs_re xs_im](relu'd)^T @ g
    dλ   = Σ v ⊙ conj(x_{t-1})
    dd   = Σ g ⊙ u

Training with scan_mode="fused" therefore pays zero forward HBM for the
state and one rematerialized scan in the backward.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply
from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
from sparsernns_tpu.ops.scan import Pair


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_s5_apply_diff(u, lam: Pair, w_b, w_c, d, qat_state_scale=None,
                        block_t: int = 256, relu_state: bool = False,
                        qat_bits=None):
    """``qat_bits`` (a_bits, act_bits): forward runs with in-kernel
    activation QAT; the backward is the straight-through estimator — the
    adjoint of the unquantized linear scan (quantization treated as
    identity), rematerialized without fake-quant. ``qat_state_scale``:
    traced global state absmax for the two-pass global-scale QAT mode
    (zero cotangent — the scale is an STE constant like the quantization
    itself)."""
    return fused_s5_apply(u, lam, w_b, w_c, d, block_t=block_t,
                          relu_state=relu_state, qat_bits=qat_bits,
                          qat_state_scale=qat_state_scale)


def _fwd(u, lam, w_b, w_c, d, qat_state_scale, block_t, relu_state,
         qat_bits):
    y = fused_s5_apply(u, lam, w_b, w_c, d, block_t=block_t,
                       relu_state=relu_state, qat_bits=qat_bits,
                       qat_state_scale=qat_state_scale)
    return y, (u, lam, w_b, w_c, d, qat_state_scale)


def _bwd(block_t, relu_state, qat_bits, res, g):
    u, lam, w_b, w_c, d, qat_state_scale = res
    p = w_b.shape[-1] // 2

    # rematerialize the state
    bu = u @ w_b
    xs = pallas_diag_scan(lam, (bu[..., :p], bu[..., p:]), block_t=block_t)
    if relu_state:
        mask = (jnp.concatenate(xs, axis=-1) > 0).astype(g.dtype)
        xs_act = jnp.concatenate(xs, axis=-1) * mask
    else:
        xs_act = jnp.concatenate(xs, axis=-1)

    # adjoint through the output projection
    g_xs = g @ w_c.T                      # (B, L, 2P)
    if relu_state:
        g_xs = g_xs * mask
    g_pair = (g_xs[..., :p], g_xs[..., p:])

    # adjoint through the scan: reverse scan with conj(λ)
    lam_conj = (lam[0], -lam[1])
    v = pallas_diag_scan(lam_conj, g_pair, reverse=True, block_t=block_t)
    v_cat = jnp.concatenate(v, axis=-1)

    # parameter/input grads
    axes = tuple(range(u.ndim - 1))
    du = v_cat @ w_b.T + g * d
    dw_b = jnp.einsum("...h,...q->hq", u, v_cat)
    dw_c = jnp.einsum("...q,...h->qh", xs_act, g)
    dd = jnp.sum(g * u, axis=axes)

    def shift(a):
        pad = [(0, 0)] * a.ndim
        pad[-2] = (1, 0)
        return jnp.pad(a, pad)[..., :-1, :]

    xp_re, xp_im = shift(xs[0]), shift(xs[1])
    dlam_re = jnp.sum(v[0] * xp_re + v[1] * xp_im, axis=axes)
    dlam_im = jnp.sum(v[1] * xp_re - v[0] * xp_im, axis=axes)

    # qat_state_scale: STE — the scale is a quantization constant
    dqs = None if qat_state_scale is None else jnp.zeros_like(
        qat_state_scale)
    return du, (dlam_re, dlam_im), dw_b, dw_c, dd, dqs


fused_s5_apply_diff.defvjp(_fwd, _bwd)
