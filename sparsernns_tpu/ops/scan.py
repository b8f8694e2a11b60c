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


def _block_triangular(lam: Pair, block_t: int, dtype) -> Pair:
    """Per-channel lower-triangular propagator M[j, i, p] = λ_p^{j-i}
    (i ≤ j, else 0), shape (T, T, P) pair. Built from the stable polar
    powers table (λ^0..λ^{T-1}) via a static gather — |λ| < 1 keeps every
    entry in [0, 1], no inverse powers anywhere."""
    lr, li = lam
    one = jnp.ones((1,) + lr.shape, dtype)
    if block_t > 1:
        pw = lambda_powers((lr.astype(dtype), li.astype(dtype)),
                           block_t - 1)  # λ^1..λ^{T-1}: (T-1, P)
        p_re = jnp.concatenate([one, pw[0]], axis=0)
        p_im = jnp.concatenate([jnp.zeros_like(one), pw[1]], axis=0)
    else:
        p_re, p_im = one, jnp.zeros_like(one)
    idx = jnp.arange(block_t)
    k = idx[:, None] - idx[None, :]                 # j - i
    mask = (k >= 0)[..., None].astype(dtype)        # (T, T, 1)
    kc = jnp.clip(k, 0)
    return p_re[kc] * mask, p_im[kc] * mask         # (T, T, P) each


def blocked_diag_scan(
    lam: Pair,
    bu: Pair,
    block_t: int = 128,
    reverse: bool = False,
    carry_init: Optional[Pair] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
) -> Pair:
    """All-prefix states via BLOCK-PARALLEL matmuls — pure XLA, no
    associative_scan / lax.scan / Pallas anywhere in the lowered program.

    Split L into T-sized blocks. Within a block the prefix states are one
    per-channel triangular matmul y[j] = Σ_{i≤j} λ^{j-i} u[i] (a (P)-batched
    (T×T)·(T×N) `dot_general` — pure MXU work); the cross-block carry
    c_{k+1} = λ^T c_k + y_k[T-1] is a STATIC Python loop over L/T ≈ 30
    tiny (..., P) fmas, unrolled into straight-line HLO; the carry folds
    back in with the λ^{j+1} powers table (`apply_carry`'s math,
    vectorized over blocks).

    Rationale: the reference executes scans through torch.cumsum/custom
    CUDA (ssm.py:127); our primary TPU answer is the Pallas kernels, but a
    conformance-limited transport (PERF.md round-3: the tunnel refuses
    `associative_scan` programs and wedges on others) still runs plain
    dot_generals at full MXU rate — this backend keeps the model servable
    and measurable there, and doubles as the portability/debug path. FLOP
    inflation vs a linear scan is ×T on the scan term (4·2·L·T·P·B per
    layer ≈ 8 GFLOP at flagship T=128 — comparable to the projections),
    all of it MXU-shaped.

    Differentiable end-to-end (gather + matmuls), so it also trains.

    ``block_requant`` (scale_re, scale_im, bits): static-quant serving at
    BLOCK granularity with exactly the Pallas kernel's placement
    (scan_kernel.py:162-176): every state requantizes onto the frozen
    pow2 grid once, after the carry fold, and the outgoing carry is the
    requantized block-final state. Per-combine QAT hadamards remain
    inexpressible here (no per-combine site in the matmul form).
    """
    if reverse:
        if carry_init is not None:
            raise NotImplementedError("carry with reverse scan")
        flip = lambda p: (jnp.flip(p[0], -2), jnp.flip(p[1], -2))  # noqa: E731
        return flip(blocked_diag_scan(lam, flip(bu), block_t=block_t))

    bu_re, bu_im = bu
    orig_shape = bu_re.shape
    l, p = orig_shape[-2], orig_shape[-1]
    t = min(block_t, l)
    nb = -(-l // t)
    pad = nb * t - l
    dtype = bu_re.dtype

    def prep(a):
        a = a.reshape((-1,) + orig_shape[-2:])          # (N, L, P)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        return a.reshape(-1, nb, t, p)                  # (N, nb, T, P)

    u_re, u_im = prep(bu_re), prep(bu_im)
    m_re, m_im = _block_triangular(lam, t, dtype)

    if block_requant is not None:
        s_re, s_im, bits = block_requant
        qmax = float(2 ** (bits - 1) - 1)
        qmin = float(-(2 ** (bits - 1)))

        def rq(xr, xi):
            return (jnp.clip(jnp.round(xr / s_re), qmin, qmax) * s_re,
                    jnp.clip(jnp.round(xi / s_im), qmin, qmax) * s_im)
    else:
        rq = None

    def tri(m, u):  # (T,T,P) x (N,nb,T,P) -> (N,nb,T,P), contract i
        return jnp.einsum("jip,nkip->nkjp", m, u)

    y_re = tri(m_re, u_re) - tri(m_im, u_im)
    y_im = tri(m_re, u_im) + tri(m_im, u_re)

    # λ^T for the block-to-block recurrence (stable polar form)
    lam_t = lambda_powers(lam, t)
    lam_t = (lam_t[0][-1].astype(dtype), lam_t[1][-1].astype(dtype))
    c_re = jnp.zeros_like(u_re[:, 0, 0, :])
    c_im = jnp.zeros_like(c_re)
    if carry_init is not None:
        c_re = jnp.broadcast_to(carry_init[0].reshape(c_re.shape), c_re.shape)
        c_im = jnp.broadcast_to(carry_init[1].reshape(c_im.shape), c_im.shape)
    carries_re, carries_im = [c_re], [c_im]
    for k in range(nb - 1):
        ac = complex_mul(lam_t, (carries_re[-1], carries_im[-1]))
        # carry entering block k+1 = λ^T c_k + within-block final of k
        # where block k's true final already includes c_k: equivalently
        # c_{k+1} = λ^T c_k + y_k[T-1]  with y the ZERO-carry local scan.
        nc_re, nc_im = ac[0] + y_re[:, k, -1, :], ac[1] + y_im[:, k, -1, :]
        if rq is not None:  # carry = requantized block-final state
            nc_re, nc_im = rq(nc_re, nc_im)
        carries_re.append(nc_re)
        carries_im.append(nc_im)
    cs = (jnp.stack(carries_re, axis=1), jnp.stack(carries_im, axis=1))

    # fold carries in: x[k, j] = y[k, j] + λ^{j+1} c_k
    pw = lambda_powers(lam, t)
    pw = (pw[0].astype(dtype), pw[1].astype(dtype))     # (T, P)
    corr = complex_mul((pw[0][None, None], pw[1][None, None]),
                       (cs[0][:, :, None, :], cs[1][:, :, None, :]))
    x_re, x_im = y_re + corr[0], y_im + corr[1]
    if rq is not None:  # every served state lands on the frozen grid
        x_re, x_im = rq(x_re, x_im)

    def unprep(a):
        a = a.reshape(-1, nb * t, p)[:, :l, :]
        return a.reshape(orig_shape)

    return unprep(x_re), unprep(x_im)


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
    if mode == "blocked":
        if had_aa is not jnp.multiply or had_ax is not jnp.multiply:
            raise NotImplementedError(
                "QAT hadamards are per-combine; the blocked matmul form "
                "has no per-combine site — train QAT with "
                "mode='associative'/'pallas'")
        return blocked_diag_scan(lam, bu, reverse=reverse,
                                 carry_init=carry_init,
                                 block_t=128 if block_t is None else block_t)
    if mode == "sequential":
        xs, _ = sequential_diag_scan(
            lam, bu, reverse=reverse, carry_init=carry_init,
            had_ax=had_ax, state_requant=state_requant, unroll=unroll)
        return xs
    if mode == "pallas":
        from sparsernns_tpu.ops.pallas.scan_kernel import DEFAULT_BLOCK_T
        if block_t is None:
            # persisted autotune cache (runs/autotune.json) before the
            # hand-set default — VERDICT r4 #5
            from sparsernns_tpu.ops.pallas.scan_kernel import (
                resolve_scan_block_t)
            bt = resolve_scan_block_t(bu[0].shape)
        else:
            bt = block_t
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
