"""Differentiable wrapper for the Pallas diagonal scan.

The recurrence x_t = λ ⊙ x_{t-1} + bu_t is linear, so its VJP is another
diagonal scan: with cotangents g_t,

    v_t   = g_t + conj(λ) ⊙ v_{t+1}          (reverse scan with conj(λ))
    dbu_t = v_t
    dλ    = Σ_t v_t ⊙ conj(x_{t-1})          (x_{-1} = 0)

Both passes run the same Pallas kernel, so training gets the same
HBM-minimal scan as inference (pattern: custom VJP, pallas_guide.md).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
from sparsernns_tpu.ops.scan import Pair


@jax.custom_vjp
def pallas_diag_scan_diff(lam: Pair, bu: Pair) -> Pair:
    return pallas_diag_scan(lam, bu)


def _fwd(lam: Pair, bu: Pair):
    xs = pallas_diag_scan(lam, bu)
    return xs, (lam, xs)


def _bwd(residuals, g: Pair):
    lam, xs = residuals
    lam_conj = (lam[0], -lam[1])
    v = pallas_diag_scan(lam_conj, g, reverse=True)

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
