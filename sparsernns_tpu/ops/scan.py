"""Diagonal linear-recurrence scans — the hot loop of every S5 model.

Computes ``x_t = λ ⊙ x_{t-1} + bu_t`` for a *constant* complex diagonal
``λ`` (shape (P,)) over a time axis, for natively-batched inputs
``bu`` of shape (..., L, P). Complex numbers are carried as (re, im)
pairs of real arrays — TPU has no complex ALU, and the pair layout feeds
the VPU/Pallas kernels directly and allows bf16 storage.

Backends:
- "associative": `jax.lax.associative_scan` (O(log L) depth). Reference
  semantics: ssm.py:127 with the complex binary operator of ssm.py:54-77.
- "sequential": `jax.lax.scan` (reference ssm.py:150/:313), supports
  per-step state requantization for static-quant inference
  (reference ssm.py:287-310) and an initial carry for streaming.
- "pallas": single-pass VMEM-resident kernel (ops/pallas/scan_kernel.py)
  with minimal HBM traffic; selected via `diag_ssm_scan(..., mode="pallas")`.

The same binary operator composes across sequence chunks, which is what
`parallel/seqscan.py` exploits for cross-chip sequence parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
Pair = Tuple[Array, Array]


def complex_mul(a: Pair, b: Pair, had: Callable = jnp.multiply) -> Pair:
    """(a_re + i a_im) * (b_re + i b_im) as 4 real hadamards."""
    ar, ai = a
    br, bi = b
    return (had(ar, br) - had(ai, bi), had(ar, bi) + had(ai, br))


def _scan_binop(qi, qj, had_aa=jnp.multiply, had_ax=jnp.multiply):
    """Associative combine for first-order recurrences.

    Elements are ((A_re, A_im), (b_re, b_im)); combine is
    (A_j∘A_i, A_j∘b_i + b_j). Reference: quant_binary_operator ssm.py:54-77,
    including the option to fake-quantize the two hadamard families
    (Λ·Λ via ``had_aa``, Λ·state via ``had_ax``).
    """
    a_i, b_i = qi
    a_j, b_j = qj
    a_out = complex_mul(a_j, a_i, had_aa)
    bx = complex_mul(a_j, b_i, had_ax)
    b_out = (bx[0] + b_j[0], bx[1] + b_j[1])
    return a_out, b_out


def _broadcast_lambda(lam: Pair, bu: Pair) -> Pair:
    lr, li = lam
    shape = bu[0].shape
    return (jnp.broadcast_to(lr, shape), jnp.broadcast_to(li, shape))


def associative_diag_scan(
    lam: Pair,
    bu: Pair,
    reverse: bool = False,
    had_aa: Callable = jnp.multiply,
    had_ax: Callable = jnp.multiply,
) -> Pair:
    """All-prefix states via `lax.associative_scan` along axis -2."""
    lam_el = _broadcast_lambda(lam, bu)
    binop = partial(_scan_binop, had_aa=had_aa, had_ax=had_ax)
    _, xs = lax.associative_scan(
        binop, (lam_el, bu), axis=bu[0].ndim - 2, reverse=reverse)
    return xs


def sequential_diag_scan(
    lam: Pair,
    bu: Pair,
    reverse: bool = False,
    carry_init: Optional[Pair] = None,
    had_ax: Callable = jnp.multiply,
    state_requant: Optional[Callable[[Pair], Pair]] = None,
    unroll: int = 1,
) -> Tuple[Pair, Pair]:
    """Step-by-step scan. Returns (all states, final state).

    ``state_requant`` applies per-step quant-dequant to the carried state —
    the static-quant inference semantics of reference ssm.py:287-310 (which
    an associative combine cannot express, since requantization is not
    associative).
    """
    bu_r, bu_i = bu
    time_axis = bu_r.ndim - 2
    # lax.scan iterates over the leading axis: move time to front.
    bu_r = jnp.moveaxis(bu_r, time_axis, 0)
    bu_i = jnp.moveaxis(bu_i, time_axis, 0)
    if carry_init is None:
        x0 = (jnp.zeros_like(bu_r[0]), jnp.zeros_like(bu_i[0]))
    else:
        x0 = carry_init

    def step(x_prev, bu_t):
        ax = complex_mul(lam, x_prev, had_ax)
        x_t = (ax[0] + bu_t[0], ax[1] + bu_t[1])
        if state_requant is not None:
            x_t = state_requant(x_t)
        return x_t, x_t

    x_final, (xs_r, xs_i) = lax.scan(
        step, x0, (bu_r, bu_i), reverse=reverse, unroll=unroll)
    xs = (jnp.moveaxis(xs_r, 0, time_axis), jnp.moveaxis(xs_i, 0, time_axis))
    return xs, x_final


def lambda_powers(lam: Pair, length: int) -> Pair:
    """λ^{t+1} for t in [0, length): shape (length, P) pair.

    Computed in polar form for numerical stability (|λ| < 1 after
    clip_eigs); used to fold an incoming carry into a chunk-local scan
    result and by the sequence-parallel combine.
    """
    lr, li = lam
    r = jnp.sqrt(lr * lr + li * li)
    theta = jnp.arctan2(li, lr)
    t = jnp.arange(1, length + 1, dtype=lr.dtype)[:, None]
    rk = jnp.exp(t * jnp.log(jnp.maximum(r, 1e-30)))
    ang = t * theta
    return rk * jnp.cos(ang), rk * jnp.sin(ang)


def apply_carry(xs: Pair, lam: Pair, carry: Pair) -> Pair:
    """Fold an incoming carry into chunk-local states:
    x_t <- x_t + λ^{t+1} ⊙ carry  (t local, 0-based)."""
    L = xs[0].shape[-2]
    pw = lambda_powers(lam, L)  # (L, P)
    c = (carry[0][..., None, :], carry[1][..., None, :])  # (..., 1, P)
    corr = complex_mul(pw, c)  # -> (..., L, P)
    return xs[0] + corr[0], xs[1] + corr[1]


def diag_ssm_scan(
    lam: Pair,
    bu: Pair,
    mode: str = "associative",
    reverse: bool = False,
    carry_init: Optional[Pair] = None,
    had_aa: Callable = jnp.multiply,
    had_ax: Callable = jnp.multiply,
    state_requant: Optional[Callable[[Pair], Pair]] = None,
    unroll: int = 8,
    qat_bits: Optional[Tuple[Optional[int], Optional[int]]] = None,
    block_t: Optional[int] = None,
) -> Pair:
    """Dispatch to a scan backend. Returns all-prefix states (..., L, P) pair.

    ``qat_bits`` (a_bits, act_bits): the pallas mode's activation-QAT —
    the doubling-kernel analog of the associative mode's had_aa/had_ax
    fake-quant hadamards (reference ssm.py:54-77). Associative/sequential
    modes express QAT through the hadamard callables instead.
    ``block_t``: pallas kernel time-block (utils/autotune.py measures the
    best value per shape; None = kernel default).
    """
    if state_requant is not None and mode != "sequential":
        raise NotImplementedError(
            "per-step state requantization requires mode='sequential' "
            "(requant is not associative); reference raises likewise "
            "(ssm.py:248-251)")
    if mode == "associative":
        xs = associative_diag_scan(lam, bu, reverse, had_aa, had_ax)
        if carry_init is not None:
            if reverse:
                raise NotImplementedError("carry with reverse scan")
            xs = apply_carry(xs, lam, carry_init)
        return xs
    if mode == "sequential":
        xs, _ = sequential_diag_scan(
            lam, bu, reverse=reverse, carry_init=carry_init,
            had_ax=had_ax, state_requant=state_requant, unroll=unroll)
        return xs
    if mode == "pallas":
        from sparsernns_tpu.ops.pallas.scan_kernel import DEFAULT_BLOCK_T
        bt = DEFAULT_BLOCK_T if block_t is None else block_t
        if carry_init is None:
            from sparsernns_tpu.ops.pallas.scan_vjp import (
                pallas_diag_scan_diff, pallas_diag_scan_diff_rev)
            fn = pallas_diag_scan_diff_rev if reverse \
                else pallas_diag_scan_diff
            return fn(lam, bu, qat_bits, bt)
        from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
        return pallas_diag_scan(lam, bu, reverse=reverse,
                                carry_init=carry_init, qat_bits=qat_bits,
                                block_t=bt)
    raise ValueError(f"unknown scan mode: {mode}")
