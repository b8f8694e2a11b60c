"""Pallas TPU kernel for the diagonal (S5) linear recurrence.

Computes x_t = λ ⊙ x_{t-1} + bu_t for constant complex diagonal λ over
(B, L, P) inputs, as a single-pass VMEM-resident kernel:

- grid = (B, L/T): TPU grids execute sequentially, so the cross-block
  carry lives in VMEM scratch and flows block to block (reset at each new
  batch row).
- Within a (T, P) block: Hillis-Steele doubling with the CLOSED-FORM
  offset operators λ^d (d = 1, 2, ..., T/2), precomputed outside the
  kernel. Because λ is constant there is no (A, b) pair tracking — each
  pass is one complex multiply-add of a shifted copy — so intra-block work
  is O(T·P·log T) VPU flops on data that never leaves VMEM.
- The incoming carry is folded in with a precomputed λ^{t+1} power table.

HBM traffic = read bu once + write xs once — the speed-of-light for this
op. XLA's `lax.associative_scan` (reference ssm.py:127) materializes
O(log L) full-length intermediates in HBM; this kernel replaces ~11 round
trips with 1 at L=3751.

Accuracy note: the closed-form power form evaluates the same associative
combine tree with λ^d computed once (exactly what repeated squaring of the
scan's A-products would produce, minus re-rounding), so results match the
associative scan to fp32 rounding.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsernns_tpu.ops.scan import Pair, lambda_powers

DEFAULT_BLOCK_T = 256

#: Timing-attribution instrument (tools/ablate_net.py): a one-element
#: list read at TRACE time by the kernel bodies. ``"noscan"`` skips the
#: doubling passes; ``"bf16dots"`` / ``"nodots"`` alter the float dots
#: (fused_layer._glu_dense). Production paths never set it — it exists
#: so hardware runs can attribute the gap between the measured engine
#: forward and its padded-MXU floor to scan/MXU/grid machinery. Results
#: under any non-None setting are timing-only (wrong numerics).
#:
#: RETRACE REQUIREMENT (ADVICE r4): because the flag is read at trace
#: time, any persistently-jitted wrapper (the module-level
#: ``pallas_diag_scan`` jit cache, a long-lived ``engine._forward``)
#: bakes in the value seen at FIRST trace; flipping it later reuses the
#: stale executable. Same for ``fused_layer.INTERLEAVE``. Every
#: consumer must build a fresh engine/jit per flag setting —
#: tools/ablate_net.py does (and asserts it); nothing else may touch
#: these flags.
ABLATION = [None]


def dyn_fake_quant(x, bits, absmax=None):
    """Per-tensor dynamic symmetric quant-dequant (no STE — used inside
    forward-only kernels whose gradients flow through custom VJPs, where
    STE means the backward simply ignores the quantization).

    ``absmax``: use this (traced) global absmax for the scale instead of
    the operand's own max — the two-pass global-scale QAT mode, matching
    the associative path's per-TENSOR dynamic scales instead of the
    kernel's per-block ones."""
    if bits is None or bits >= 32:
        return x
    qmax = 2.0 ** (bits - 1) - 1.0
    amax = jnp.max(jnp.abs(x)) if absmax is None else absmax
    scale = jnp.maximum(amax, 1e-20) / qmax
    return jnp.clip(jnp.round(x / scale), -qmax - 1.0, qmax) * scale


def lambda_power_tables(lam_re, lam_im, t: int, num_passes: int,
                        qat_bits=None):
    """Precompute the kernel's λ tables: per-pass offset operators λ^(2^k)
    (by repeated squaring) and the carry-fold table λ^(t+1).

    With ``qat_bits`` the λ operands are fake-quantized to a_bits at every
    squaring level — each power is a product of QUANTIZED operands,
    exactly as the associative combine's had_aa quantizes the Λ-product
    operands level by level (reference ssm.py:54-77)."""
    a_bits = qat_bits[0] if qat_bits is not None else None

    def sq(c):
        return (c[0] * c[0] - c[1] * c[1], 2.0 * c[0] * c[1])

    pows_re, pows_im = [], []
    cur = (lam_re, lam_im)
    for _ in range(num_passes):
        if a_bits is not None:
            cur = (dyn_fake_quant(cur[0], a_bits),
                   dyn_fake_quant(cur[1], a_bits))
        pows_re.append(cur[0])
        pows_im.append(cur[1])
        cur = sq(cur)
    ctab = lambda_powers((lam_re, lam_im), t)  # (T, P) λ^{t+1}
    if a_bits is not None:
        ctab = (dyn_fake_quant(ctab[0], a_bits),
                dyn_fake_quant(ctab[1], a_bits))
    return jnp.stack(pows_re), jnp.stack(pows_im), ctab


def _fold_tables(lr, li, m: int):
    """Cumulative powers of a (1, P) diagonal operator: forward table
    rows [λ, λ², …, λ^m] and the reversed order — built by m-1 tiny
    row multiplies at trace time (no runtime flip)."""
    rows_r, rows_i = [lr], [li]
    for _ in range(m - 1):
        pr, pi = rows_r[-1], rows_i[-1]
        rows_r.append(pr * lr - pi * li)
        rows_i.append(pr * li + pi * lr)
    fwd = (jnp.concatenate(rows_r, axis=0), jnp.concatenate(rows_i, axis=0))
    rev = (jnp.concatenate(rows_r[::-1], axis=0),
           jnp.concatenate(rows_i[::-1], axis=0))
    return fwd, rev


def _block_scan(x_re, x_im, pow_re_ref, pow_im_ref, t: int, base: int = 0):
    """Work-efficient inclusive scan of (t, P) rows under the diagonal
    operator with per-pass powers λ^(2^(base+k)) from the pow tables.

    Plain Hillis-Steele doubling costs log2(t) full-array multiply-add
    passes — measured as 33% of the whole saturated engine forward at
    t=512 (tools/ablate_net.py, runs/ablate_net.json). This
    decomposition reshapes to (n, 8, P), runs 3 intra-sub doubling
    passes, recurses on the (n, P) sub-block carries (8x less data per
    level), and folds the exclusive carries back with one broadcast
    multiply-add — ~4.6 full-pass equivalents at t=512 instead of 9.
    The combine tree is a reassociation of the same λ-power products,
    so results match plain doubling to fp32 rounding (parity pinned in
    tests/test_pallas_scan.py::
    test_work_efficient_tree_matches_plain_doubling).

    Measured (v5e, flagship engine, runs/ablate_net.json *-wescan):
    B=8 forward 0.819 -> 0.711 ms (+15%); B=32 neutral (1.88 -> 1.92 ms)
    — at saturation the cost is concentrated in the d in {1, 2, 4}
    sub-tile sublane shifts, which both trees perform identically; the
    d >= 8 tile-aligned passes this tree eliminates are nearly free."""
    m = 8
    if t <= m or t % m:
        # plain doubling — small blocks and non-8-multiple tails
        for k in range(max(1, (t - 1).bit_length())):
            d = 1 << k
            if d >= t:
                break
            lr = pow_re_ref[base + k:base + k + 1, :]
            li = pow_im_ref[base + k:base + k + 1, :]
            pad = jnp.zeros((d, x_re.shape[-1]), dtype=x_re.dtype)
            sh_re = jnp.concatenate([pad, x_re[: t - d]], axis=0)
            sh_im = jnp.concatenate([pad, x_im[: t - d]], axis=0)
            x_re = x_re + (lr * sh_re - li * sh_im)
            x_im = x_im + (lr * sh_im + li * sh_re)
        return x_re, x_im
    n, p = t // m, x_re.shape[-1]
    x3r = x_re.reshape(n, m, p)
    x3i = x_im.reshape(n, m, p)
    for k in range(3):  # log2(m) intra-sub doubling passes
        d = 1 << k
        lr = pow_re_ref[base + k:base + k + 1, :]   # (1, P) -> broadcast
        li = pow_im_ref[base + k:base + k + 1, :]
        pad = jnp.zeros((n, d, p), dtype=x_re.dtype)
        sh_r = jnp.concatenate([pad, x3r[:, : m - d]], axis=1)
        sh_i = jnp.concatenate([pad, x3i[:, : m - d]], axis=1)
        x3r = x3r + (lr * sh_r - li * sh_i)
        x3i = x3i + (lr * sh_i + li * sh_r)
    # cross-sub carries: inclusive scan of sub totals under λ^(8·2^base)
    cr, ci = _block_scan(x3r[:, m - 1, :], x3i[:, m - 1, :],
                         pow_re_ref, pow_im_ref, n, base + 3)
    zp = jnp.zeros((1, p), dtype=x_re.dtype)
    cer = jnp.concatenate([zp, cr[: n - 1]], axis=0)[:, None, :]
    cei = jnp.concatenate([zp, ci[: n - 1]], axis=0)[:, None, :]
    # fold: x[sub, j] += λ^((j+1)·2^base) ⊙ carry_excl[sub]
    (f_r, f_i), _ = _fold_tables(pow_re_ref[base:base + 1, :],
                                 pow_im_ref[base:base + 1, :], m)
    f_r, f_i = f_r[None], f_i[None]                 # (1, m, P)
    x3r = x3r + (f_r * cer - f_i * cei)
    x3i = x3i + (f_r * cei + f_i * cer)
    return x3r.reshape(t, p), x3i.reshape(t, p)


def scan_block_body(
    x_re, x_im,                    # (T, P) block values (bu)
    pow_re_ref, pow_im_ref,        # (K, P) per-pass offset operators λ^(2^k)
    ctab_re_ref, ctab_im_ref,      # (T, P) carry fold table λ^(t+1)
    carry_re, carry_im,            # (1, P) VMEM scratch — persists over grid
    j,                             # time-block index within the grid
    *, num_passes: int, block_t: int, block_requant=None,
    carry_init=None,               # optional (re, im) (1, P) VALUES
    qat_bits=None,                 # (a_bits, act_bits): in-scan QAT
    qat_scale=None,                # traced global state absmax (scalar)
    prescanned: bool = False,      # x is already the intra-block scan
):
    """Shared in-kernel scan block: doubling passes + carry reset/fold +
    optional block requant + carry store. Used by both the standalone scan
    kernel and the fused S5 kernel. Returns the block's states.

    ``carry_init``: when given, the first time-block of each batch row
    starts from these values instead of zero — streaming/chunked serving.

    ``qat_bits``: activation-QAT inside the kernel (VERDICT round-1
    item 5): the state operand of every doubling combine, the folded
    carry, and the block's output states are dynamically fake-quantized
    to ``act_bits`` with per-BLOCK scales — the doubling-form analog of
    the reference's quant_binary_operator hadamards (ssm.py:54-77), whose
    per-combine-level scales the associative path applies globally. The
    λ-power tables are quantized to ``a_bits`` by the wrapper.

    ``qat_scale``: traced global state absmax — when given, every state
    fake-quant in this body uses it instead of the per-block maxima
    (two-pass global-scale QAT, ssm.qat_global_scales).
    """
    act_bits = qat_bits[1] if qat_bits is not None else None
    # Intra-block inclusive scan. Non-QAT: work-efficient decomposition
    # (~half the full-array passes of plain doubling — see _block_scan).
    # QAT keeps the plain doubling form: its per-pass operand fake-quant
    # mirrors the associative combine's level-by-level quantization
    # (reference ssm.py:54-77), which the reassociated tree would alter.
    if prescanned or "noscan" in (ABLATION[0] or ""):
        pass  # caller ran the intra-block scan (fused_layer interleave)
        # / timing-attribution instrument
    elif act_bits is None:
        x_re, x_im = _block_scan(x_re, x_im, pow_re_ref, pow_im_ref,
                                 block_t)
    else:
        # x += λ^d ⊙ shift(x, d), d = 1, 2, 4, ...
        for k in range(num_passes):
            d = 1 << k
            lr = pow_re_ref[k:k + 1, :]  # (1, P) — keep 2D for the VPU
            li = pow_im_ref[k:k + 1, :]
            pad = jnp.zeros((d, x_re.shape[-1]), dtype=x_re.dtype)
            sh_re = jnp.concatenate([pad, x_re[: block_t - d]], axis=0)
            sh_im = jnp.concatenate([pad, x_im[: block_t - d]], axis=0)
            sh_re = dyn_fake_quant(sh_re, act_bits, qat_scale)
            sh_im = dyn_fake_quant(sh_im, act_bits, qat_scale)
            x_re = x_re + (lr * sh_re - li * sh_im)
            x_im = x_im + (lr * sh_im + li * sh_re)

    # Reset (or load) the carry at the first block of each batch row.
    @pl.when(j == 0)
    def _():
        if carry_init is None:
            carry_re[...] = jnp.zeros_like(carry_re)
            carry_im[...] = jnp.zeros_like(carry_im)
        else:
            carry_re[...] = carry_init[0]
            carry_im[...] = carry_init[1]

    # Fold incoming carry: x_t += λ^{t+1} ⊙ carry.
    cr = carry_re[...]  # (1, P)
    ci = carry_im[...]
    if act_bits is not None:
        cr = dyn_fake_quant(cr, act_bits, qat_scale)
        ci = dyn_fake_quant(ci, act_bits, qat_scale)
    tr = ctab_re_ref[...]
    ti = ctab_im_ref[...]
    x_re = x_re + (tr * cr - ti * ci)
    x_im = x_im + (tr * ci + ti * cr)

    if act_bits is not None:
        # block-output state quantization: what the downstream C
        # projection (and the next block's carry) sees — mirrors the
        # fake_quant(xs) operand quantization of the faithful path
        x_re = dyn_fake_quant(x_re, act_bits, qat_scale)
        x_im = dyn_fake_quant(x_im, act_bits, qat_scale)

    if block_requant is not None:
        # Static-quant serving semantics at block granularity: requantize
        # every state (and therefore the outgoing carry) onto the frozen
        # pow2 grid. Per-STEP requant is not associative (reference
        # ssm.py:248-251 simply raises); per-BLOCK requant keeps the
        # doubling form with a bounded extra error budget (SURVEY.md §7
        # hard part #1), validated against the sequential path.
        s_re, s_im, bits = block_requant
        qmax = float(2 ** (bits - 1) - 1)
        qmin = float(-(2 ** (bits - 1)))
        x_re = jnp.clip(jnp.round(x_re / s_re), qmin, qmax) * s_re
        x_im = jnp.clip(jnp.round(x_im / s_im), qmin, qmax) * s_im

    carry_re[...] = x_re[block_t - 1:block_t, :]
    carry_im[...] = x_im[block_t - 1:block_t, :]
    return x_re, x_im


def _block_scan_rev(g_re, g_im, pow_re_ref, pow_im_ref, t: int,
                    base: int = 0):
    """Reverse-direction work-efficient scan: v_j = Σ_{s≥j} λ^{s-j} g_s
    over (t, P) rows — the mirror of _block_scan (shift from below,
    carries at row 0, reversed fold table λ^{m-j})."""
    m = 8
    if t <= m or t % m:
        for k in range(max(1, (t - 1).bit_length())):
            d = 1 << k
            if d >= t:
                break
            lr = pow_re_ref[base + k:base + k + 1, :]
            li = pow_im_ref[base + k:base + k + 1, :]
            pad = jnp.zeros((d, g_re.shape[-1]), dtype=g_re.dtype)
            sh_re = jnp.concatenate([g_re[d:], pad], axis=0)
            sh_im = jnp.concatenate([g_im[d:], pad], axis=0)
            g_re = g_re + (lr * sh_re - li * sh_im)
            g_im = g_im + (lr * sh_im + li * sh_re)
        return g_re, g_im
    n, p = t // m, g_re.shape[-1]
    g3r = g_re.reshape(n, m, p)
    g3i = g_im.reshape(n, m, p)
    for k in range(3):
        d = 1 << k
        lr = pow_re_ref[base + k:base + k + 1, :]
        li = pow_im_ref[base + k:base + k + 1, :]
        pad = jnp.zeros((n, d, p), dtype=g_re.dtype)
        sh_r = jnp.concatenate([g3r[:, d:], pad], axis=1)
        sh_i = jnp.concatenate([g3i[:, d:], pad], axis=1)
        g3r = g3r + (lr * sh_r - li * sh_i)
        g3i = g3i + (lr * sh_i + li * sh_r)
    # cross-sub: reverse scan of the sub totals (row 0) under λ^(8·2^base)
    cr, ci = _block_scan_rev(g3r[:, 0, :], g3i[:, 0, :],
                             pow_re_ref, pow_im_ref, n, base + 3)
    zp = jnp.zeros((1, p), dtype=g_re.dtype)
    cer = jnp.concatenate([cr[1:], zp], axis=0)[:, None, :]
    cei = jnp.concatenate([ci[1:], zp], axis=0)[:, None, :]
    # fold: v[sub, j] += λ^((m-j)·2^base) ⊙ carry_excl[sub]
    _, (f_r, f_i) = _fold_tables(pow_re_ref[base:base + 1, :],
                                 pow_im_ref[base:base + 1, :], m)
    f_r, f_i = f_r[None], f_i[None]
    g3r = g3r + (f_r * cer - f_i * cei)
    g3i = g3i + (f_r * cei + f_i * cer)
    return g3r.reshape(t, p), g3i.reshape(t, p)


def scan_block_body_rev(
    g_re, g_im,                    # (T, P) block cotangents
    pow_re_ref, pow_im_ref,        # (K, P) λ^(2^k) offset operators
    rtab_re_ref, rtab_im_ref,      # (T, P) REVERSE fold table λ^(T-t)
    carry_re, carry_im,            # (1, P) VMEM scratch — adjoint carry
    j,                             # grid step (0 = LAST time block)
    *, num_passes: int, block_t: int,
):
    """Reverse (right-to-left) in-kernel scan block — the adjoint of the
    diagonal recurrence: v_t = g_t + λ ⊙ v_{t+1}. The caller passes the
    CONJUGATE λ's tables for the S5 adjoint. Doubling runs with
    shift-from-BELOW; ``rtab`` row t = λ^(T-t) folds the adjoint carry
    coming from the (later-in-time) previous grid step, and the carry
    out is v at row 0 (feeding the next-earlier block). The backward
    grid must iterate time blocks reversed (j == 0 <-> last block)."""
    del num_passes  # pass structure derives from block_t (work-efficient)
    g_re, g_im = _block_scan_rev(g_re, g_im, pow_re_ref, pow_im_ref,
                                 block_t)

    @pl.when(j == 0)
    def _():
        carry_re[...] = jnp.zeros_like(carry_re)
        carry_im[...] = jnp.zeros_like(carry_im)

    cr = carry_re[...]
    ci = carry_im[...]
    tr = rtab_re_ref[...]
    ti = rtab_im_ref[...]
    g_re = g_re + (tr * cr - ti * ci)
    g_im = g_im + (tr * ci + ti * cr)
    carry_re[...] = g_re[0:1, :]
    carry_im[...] = g_im[0:1, :]
    return g_re, g_im


def _scan_block_kernel(
    bu_re_ref, bu_im_ref,          # (1, T, P) inputs
    pow_re_ref, pow_im_ref,
    ctab_re_ref, ctab_im_ref,
    out_re_ref, out_im_ref,        # (1, T, P) outputs
    carry_re, carry_im,
    *, num_passes: int, block_t: int,
    block_requant=None,            # (scale_re, scale_im, bits) or None
    qat_bits=None,
):
    x_re, x_im = scan_block_body(
        bu_re_ref[0], bu_im_ref[0], pow_re_ref, pow_im_ref,
        ctab_re_ref, ctab_im_ref, carry_re, carry_im, pl.program_id(1),
        num_passes=num_passes, block_t=block_t,
        block_requant=block_requant, qat_bits=qat_bits)
    out_re_ref[0] = x_re
    out_im_ref[0] = x_im


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_scan_block_t(bu_shape) -> int:
    """Measured-best block_t for this scan shape from the persisted
    autotune cache (runs/autotune.json — utils/autotune_cache), falling
    back to DEFAULT_BLOCK_T. Runs at trace time (shape is static)."""
    from sparsernns_tpu.utils.autotune_cache import resolve_block_t
    lead = 1
    for d in bu_shape[:-2]:
        lead *= int(d)
    return resolve_block_t(
        "scan", b=lead if len(bu_shape) > 2 else None,
        l=int(bu_shape[-2]), p=int(bu_shape[-1]),
        default=DEFAULT_BLOCK_T)


def pallas_diag_scan(
    lam: Pair,
    bu: Pair,
    reverse: bool = False,
    carry_init: Optional[Pair] = None,
    block_t: Optional[int] = None,
    interpret: Optional[bool] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
    qat_bits: Optional[Tuple[Optional[int], Optional[int]]] = None,
) -> Pair:
    """All-prefix states of x_t = λ x_{t-1} + bu_t. bu: (..., L, P) pair.

    ``block_t=None`` consults the persisted autotune cache for this
    shape (VERDICT r4 #5) before falling back to DEFAULT_BLOCK_T."""
    if block_t is None:
        block_t = resolve_scan_block_t(bu[0].shape)
    return _pallas_diag_scan(lam, bu, reverse=reverse,
                             carry_init=carry_init, block_t=block_t,
                             interpret=interpret,
                             block_requant=block_requant,
                             qat_bits=qat_bits)


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "reverse", "interpret", "block_requant",
                     "qat_bits"))
def _pallas_diag_scan(
    lam: Pair,
    bu: Pair,
    reverse: bool = False,
    carry_init: Optional[Pair] = None,
    block_t: int = DEFAULT_BLOCK_T,
    interpret: Optional[bool] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
    qat_bits: Optional[Tuple[Optional[int], Optional[int]]] = None,
) -> Pair:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if reverse and carry_init is not None:
        raise NotImplementedError("carry with reverse scan")
    bu_re, bu_im = bu
    orig_shape = bu_re.shape
    if bu_re.ndim == 2:
        bu_re, bu_im = bu_re[None], bu_im[None]
    elif bu_re.ndim > 3:
        lead = int(jnp.prod(jnp.asarray(orig_shape[:-2])))
        bu_re = bu_re.reshape(lead, *orig_shape[-2:])
        bu_im = bu_im.reshape(lead, *orig_shape[-2:])

    if carry_init is not None:
        # Fold an initial carry by augmenting the first step:
        # x_0 = λ c + bu_0.
        from sparsernns_tpu.ops.scan import complex_mul
        lc = complex_mul(lam, (carry_init[0], carry_init[1]))
        bu_re = bu_re.at[..., 0, :].add(lc[0].reshape(bu_re.shape[0], -1))
        bu_im = bu_im.at[..., 0, :].add(lc[1].reshape(bu_im.shape[0], -1))

    if reverse:
        bu_re = jnp.flip(bu_re, axis=-2)
        bu_im = jnp.flip(bu_im, axis=-2)

    def body(bu_re, bu_im, lam_re, lam_im):
        b, l, p = bu_re.shape
        t = min(block_t, _round_up(l, 8))
        l_pad = _round_up(l, t)
        p_pad = _round_up(p, 128)
        if l_pad != l or p_pad != p:
            pad = ((0, 0), (0, l_pad - l), (0, p_pad - p))
            bu_re = jnp.pad(bu_re, pad)
            bu_im = jnp.pad(bu_im, pad)
        lam_re = jnp.pad(lam_re, (0, p_pad - p))
        lam_im = jnp.pad(lam_im, (0, p_pad - p))

        num_passes = max(1, (t - 1).bit_length())
        pow_re, pow_im, ctab = lambda_power_tables(
            lam_re, lam_im, t, num_passes, qat_bits)

        grid = (b, l_pad // t)
        block = pl.BlockSpec((1, t, p_pad), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)

        kernel = functools.partial(
            _scan_block_kernel, num_passes=num_passes, block_t=t,
            block_requant=block_requant, qat_bits=qat_bits)
        out_re, out_im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[block, block,
                      full((num_passes, p_pad)), full((num_passes, p_pad)),
                      full((t, p_pad)), full((t, p_pad))],
            out_specs=[block, block],
            out_shape=[jax.ShapeDtypeStruct((b, l_pad, p_pad), bu_re.dtype),
                       jax.ShapeDtypeStruct((b, l_pad, p_pad), bu_im.dtype)],
            scratch_shapes=[pltpu.VMEM((1, p_pad), bu_re.dtype),
                            pltpu.VMEM((1, p_pad), bu_im.dtype)],
            interpret=interpret,
        )(bu_re, bu_im, pow_re, pow_im, ctab[0], ctab[1])
        return out_re[:, :l, :p], out_im[:, :l, :p]

    # batch-dim SPMD rule: DP-sharded inputs run the kernel per shard
    # instead of being all-gathered around the custom call (partition.py)
    from sparsernns_tpu.ops.pallas.partition import (SCAN_REPLICATED,
                                                     SCAN_RULE,
                                                     batch_partitioned)
    out_re, out_im = batch_partitioned(body, SCAN_RULE, SCAN_REPLICATED,
                                       batch_args=(0, 1))(
        bu_re, bu_im, lam[0], lam[1])

    if reverse:
        out_re = jnp.flip(out_re, axis=-2)
        out_im = jnp.flip(out_im, axis=-2)
    return out_re.reshape(orig_shape), out_im.reshape(orig_shape)
