"""Differentiable wrappers for the Pallas diagonal scan (both directions).

The recurrence x_t = λ ⊙ x_{t-1} + bu_t is linear, so its VJP is another
diagonal scan: with cotangents g_t,

    v_t   = g_t + conj(λ) ⊙ v_{t+1}          (reverse scan with conj(λ))
    dbu_t = v_t
    dλ    = Σ_t v_t ⊙ conj(x_{t-1})          (x_{-1} = 0)

The REVERSE scan x_t = λ ⊙ x_{t+1} + bu_t is the mirror image: its VJP is
a FORWARD scan of the cotangents with conj(λ), and dλ sums against
conj(x_{t+1}) — this is what makes bidirectional models train entirely on
the Pallas kernels (reference capability: ssm.py:161-177; VERDICT round-1
item 6). Both passes run the same kernel, so training gets the same
HBM-minimal scan as inference (pattern: custom VJP, pallas_guide.md).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from sparsernns_tpu.ops.pallas.scan_kernel import (DEFAULT_BLOCK_T,
                                                   pallas_diag_scan)
from sparsernns_tpu.ops.scan import Pair


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_diag_scan_diff(lam: Pair, bu: Pair, qat_bits=None,
                          block_t: int = DEFAULT_BLOCK_T) -> Pair:
    """``qat_bits``: in-kernel activation QAT on the forward; backward is
    the straight-through adjoint of the unquantized scan. ``block_t``:
    kernel time-block (utils/autotune.py)."""
    return pallas_diag_scan(lam, bu, qat_bits=qat_bits, block_t=block_t)


def _fwd(lam: Pair, bu: Pair, qat_bits=None, block_t: int = DEFAULT_BLOCK_T):
    xs = pallas_diag_scan(lam, bu, qat_bits=qat_bits, block_t=block_t)
    return xs, (lam, xs)


def _bwd(qat_bits, block_t, residuals, g: Pair):
    lam, xs = residuals
    lam_conj = (lam[0], -lam[1])
    v = pallas_diag_scan(lam_conj, g, reverse=True, block_t=block_t)

    # x_{t-1}: shift states right by one along time, zero at t=0.
    def shift(a):
        pad = [(0, 0)] * a.ndim
        pad[-2] = (1, 0)
        return jnp.pad(a, pad)[..., :-1, :]

    xp_re, xp_im = shift(xs[0]), shift(xs[1])
    # dλ = Σ v ⊙ conj(x_prev) over all batch/time
    axes = tuple(range(v[0].ndim - 1))
    dlam_re = jnp.sum(v[0] * xp_re + v[1] * xp_im, axis=axes)
    dlam_im = jnp.sum(v[1] * xp_re - v[0] * xp_im, axis=axes)
    return (dlam_re, dlam_im), v


pallas_diag_scan_diff.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_diag_scan_diff_rev(lam: Pair, bu: Pair, qat_bits=None,
                              block_t: int = DEFAULT_BLOCK_T) -> Pair:
    """Differentiable reverse scan: x_t = λ ⊙ x_{t+1} + bu_t."""
    return pallas_diag_scan(lam, bu, reverse=True, qat_bits=qat_bits,
                            block_t=block_t)


def _fwd_rev(lam: Pair, bu: Pair, qat_bits=None,
             block_t: int = DEFAULT_BLOCK_T):
    xs = pallas_diag_scan(lam, bu, reverse=True, qat_bits=qat_bits,
                          block_t=block_t)
    return xs, (lam, xs)


def _bwd_rev(qat_bits, block_t, residuals, g: Pair):
    lam, xs = residuals
    lam_conj = (lam[0], -lam[1])
    # cotangents flow FORWARD in time
    v = pallas_diag_scan(lam_conj, g, block_t=block_t)

    # x_{t+1}: shift states left by one along time, zero at t = L-1.
    def shift(a):
        pad = [(0, 0)] * a.ndim
        pad[-2] = (0, 1)
        return jnp.pad(a, pad)[..., 1:, :]

    xn_re, xn_im = shift(xs[0]), shift(xs[1])
    axes = tuple(range(v[0].ndim - 1))
    dlam_re = jnp.sum(v[0] * xn_re + v[1] * xn_im, axis=axes)
    dlam_im = jnp.sum(v[1] * xn_re - v[0] * xn_im, axis=axes)
    return (dlam_re, dlam_im), v


pallas_diag_scan_diff_rev.defvjp(_fwd_rev, _bwd_rev)
