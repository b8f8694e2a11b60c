"""Fused S5 mixer kernel: input projection + diagonal scan + output
projection in ONE Pallas call.

For each (batch, time-block) grid step:

    u_blk (T, H)  --MXU-->  bu = u @ W_b (T, 2P)
                  --VPU-->  xs = scan(λ, bu)         (doubling, in VMEM)
                  --MXU-->  y  = [xs_re xs_im] @ W_c + D ⊙ u_blk

The state dimension P NEVER touches HBM: traffic is read u + write y,
(T·H) each — compared to the reference float path which materializes
Bu (L, P) complex, the scan's O(log L) intermediates, and xs (L, P)
complex in HBM (ssm.py:116-185). Weights live in VMEM across the whole
grid. Optionally consumes int8 weights with power-of-2 scales and
dequantizes on the VPU right before the MXU dot — the "fused dequant
matmul" obligation from SURVEY.md §2.3.

Limitations: forward (non-bidirectional) only; per-step state requant is
not expressible in the doubling form (use the sequential path for
bit-faithful static-quant verification; this kernel is the serving path,
validated against it by the golden harness).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsernns_tpu.ops.scan import Pair


def _fused_kernel(
    u_ref,                        # (1, T, H) input block
    wb_ref,                       # (H, 2P) input projection (re | im)
    wc_ref,                       # (2P, H) output projection
    d_ref,                        # (1, H) feedthrough
    pow_re_ref, pow_im_ref,       # (K, P) offset operators λ^(2^k)
    ctab_re_ref, ctab_im_ref,     # (T, P) carry-fold table λ^(t+1)
    *rest,                        # [qs_ref] + out_ref + scratch
    num_passes: int, block_t: int, p: int, relu_state: bool,
    block_requant=None, wb_scales=None, wc_scales=None, qat_bits=None,
    with_qat_scale: bool = False,
):
    from sparsernns_tpu.ops.pallas.scan_kernel import scan_block_body

    if with_qat_scale:
        qs_ref, out_ref, carry_re, carry_im = rest
        qat_scale = qs_ref[0, 0]
    else:
        out_ref, carry_re, carry_im = rest
        qat_scale = None
    j = pl.program_id(1)
    # input block may be stored bf16 (halved HBM traffic); compute in f32
    u = u_ref[0].astype(jnp.float32)  # (T, H)

    # int8 weights dequantize ON THE VPU in VMEM: the per-half pow2
    # scales are static, applied to the dot RESULT halves (per-tensor
    # scale commutes with the contraction) — the fused dequant+matmul of
    # SURVEY.md §2.3, replacing the reference's AQT emulation
    # (/root/reference/sparseRNNs/utils/quantization.py:221-283).
    wb = wb_ref[...]
    if wb_scales is not None:
        wb = wb.astype(jnp.float32)
    bu = jnp.dot(u, wb, preferred_element_type=jnp.float32)
    bu_re, bu_im = bu[:, :p], bu[:, p:]
    if wb_scales is not None:
        bu_re = bu_re * wb_scales[0]
        bu_im = bu_im * wb_scales[1]
    x_re, x_im = scan_block_body(
        bu_re, bu_im, pow_re_ref, pow_im_ref,
        ctab_re_ref, ctab_im_ref, carry_re, carry_im, j,
        num_passes=num_passes, block_t=block_t,
        block_requant=block_requant, qat_bits=qat_bits,
        qat_scale=qat_scale)

    if relu_state:
        x_re = jnp.maximum(x_re, 0.0)
        x_im = jnp.maximum(x_im, 0.0)

    # C-side dequant rides on the state operand (positive per-half scale,
    # applied after relu/requant so the carried state stays in true units)
    if wc_scales is not None:
        xs_cat = jnp.concatenate([x_re * wc_scales[0],
                                  x_im * wc_scales[1]], axis=-1)
        wc = wc_ref[...].astype(jnp.float32)
    else:
        xs_cat = jnp.concatenate([x_re, x_im], axis=-1)  # (T, 2P)
        wc = wc_ref[...]
    y = jnp.dot(xs_cat, wc, preferred_element_type=jnp.float32)
    y = y + d_ref[...] * u
    out_ref[0] = y


def _fused_carry_kernel(
    u_ref, ci_re_ref, ci_im_ref,  # input block + (1, 1, P) incoming carries
    wb_ref, wc_ref, d_ref,
    pow_re_ref, pow_im_ref, ctab_re_ref, ctab_im_ref,
    out_ref, co_re_ref, co_im_ref,  # output block + (1,1,P) outgoing carries
    carry_re, carry_im,
    *, num_passes: int, block_t: int, p: int, relu_state: bool,
    block_requant=None, wb_scales=None, wc_scales=None,
):
    """Fused S5 kernel with explicit carry I/O — the streaming-serving
    variant: chunked inference at fused-kernel speed with the recurrent
    state flowing between chunks."""
    from sparsernns_tpu.ops.pallas.scan_kernel import scan_block_body

    j = pl.program_id(1)
    u = u_ref[0].astype(jnp.float32)
    wb = wb_ref[...]
    if wb_scales is not None:
        wb = wb.astype(jnp.float32)
    bu = jnp.dot(u, wb, preferred_element_type=jnp.float32)
    bu_re, bu_im = bu[:, :p], bu[:, p:]
    if wb_scales is not None:
        bu_re = bu_re * wb_scales[0]
        bu_im = bu_im * wb_scales[1]
    x_re, x_im = scan_block_body(
        bu_re, bu_im, pow_re_ref, pow_im_ref,
        ctab_re_ref, ctab_im_ref, carry_re, carry_im, j,
        num_passes=num_passes, block_t=block_t,
        block_requant=block_requant,
        carry_init=(ci_re_ref[0], ci_im_ref[0]))

    co_re_ref[0] = carry_re[...]
    co_im_ref[0] = carry_im[...]

    if relu_state:
        x_re = jnp.maximum(x_re, 0.0)
        x_im = jnp.maximum(x_im, 0.0)
    if wc_scales is not None:
        xs_cat = jnp.concatenate([x_re * wc_scales[0],
                                  x_im * wc_scales[1]], axis=-1)
        wc = wc_ref[...].astype(jnp.float32)
    else:
        xs_cat = jnp.concatenate([x_re, x_im], axis=-1)
        wc = wc_ref[...]
    y = jnp.dot(xs_cat, wc, preferred_element_type=jnp.float32)
    out_ref[0] = y + d_ref[...] * u


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prep_fused_operands(u, lam, w_b, w_c, d, block_t, allow_l_pad,
                         qat_bits=None):
    """Shared operand prep for the fused wrappers: padding, weight packing,
    λ^(2^k) offset-operator table, carry-fold table, grid + block specs."""
    from sparsernns_tpu.ops.pallas.scan_kernel import lambda_power_tables
    b, l, h = u.shape
    p = w_b.shape[-1] // 2

    t = min(block_t, _round_up(l, 8))
    l_pad = _round_up(l, t)
    if l_pad != l and not allow_l_pad:
        # Padded (zero-input) steps would advance the carry past the true
        # final state; streaming callers must chunk to a multiple of the
        # time block.
        raise ValueError(
            f"fused_s5_apply_carry needs L divisible by the time block "
            f"(L={l}, block={t}); pad or re-chunk the input")
    p_pad = _round_up(p, 128)
    h_pad = _round_up(h, 128)

    if l_pad != l or h_pad != h:
        u = jnp.pad(u, ((0, 0), (0, l_pad - l), (0, h_pad - h)))
    # Repack W_b (H, 2P) -> (H_pad, 2*P_pad) keeping re|im halves separate.
    wb_re = jnp.pad(w_b[:, :p], ((0, h_pad - h), (0, p_pad - p)))
    wb_im = jnp.pad(w_b[:, p:], ((0, h_pad - h), (0, p_pad - p)))
    wc_re = jnp.pad(w_c[:p, :], ((0, p_pad - p), (0, h_pad - h)))
    wc_im = jnp.pad(w_c[p:, :], ((0, p_pad - p), (0, h_pad - h)))

    lam_re = jnp.pad(lam[0], (0, p_pad - p))
    lam_im = jnp.pad(lam[1], (0, p_pad - p))

    num_passes = max(1, (t - 1).bit_length())
    pow_re, pow_im, ctab = lambda_power_tables(
        lam_re, lam_im, t, num_passes, qat_bits)

    io_block = pl.BlockSpec((1, t, h_pad), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return dict(
        u=u, w_b=jnp.concatenate([wb_re, wb_im], axis=-1),
        w_c=jnp.concatenate([wc_re, wc_im], axis=0),
        d=jnp.pad(d, (0, h_pad - h))[None, :],
        pow_re=pow_re, pow_im=pow_im, ctab=ctab,
        b=b, l=l, h=h, p=p, t=t, l_pad=l_pad, p_pad=p_pad, h_pad=h_pad,
        num_passes=num_passes, grid=(b, l_pad // t),
        io_block=io_block, full=full)


@functools.partial(
    jax.jit, static_argnames=("block_t", "relu_state", "interpret",
                              "block_requant", "wb_scales", "wc_scales",
                              "qat_bits"))
def fused_s5_apply(
    u: jax.Array,          # (B, L, H) float32
    lam: Pair,             # (P,) pair — discretized λ̄
    w_b: jax.Array,        # (H, 2P) stacked [B̄_re^T | B̄_im^T]; int8 when
                           # wb_scales is given
    w_c: jax.Array,        # (2P, H) stacked [C_re^T; -C_im^T], conj-sym 2x
                           # pre-folded by the caller (into wc_scales when
                           # int8)
    d: jax.Array,          # (H,)
    block_t: int = 256,
    relu_state: bool = False,
    interpret: Optional[bool] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
    wb_scales: Optional[Tuple[float, float]] = None,
    wc_scales: Optional[Tuple[float, float]] = None,
    qat_bits: Optional[Tuple[Optional[int], Optional[int]]] = None,
    qat_state_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """y = Re(C x) + D ⊙ u with x the scanned state. Returns (B, L, H).

    ``wb_scales``/``wc_scales``: static per-half pow2 scales for int8
    weight storage — weights stay 8-bit in HBM/VMEM and dequantize on the
    VPU inside the kernel. ``qat_bits``: in-kernel activation QAT (see
    scan_kernel.scan_block_body). ``qat_state_scale``: traced global
    state absmax (scalar array) — the two-pass global-scale QAT mode:
    every in-kernel state fake-quant uses it instead of per-block maxima,
    matching the associative path's per-tensor dynamic scales."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with_qs = qat_state_scale is not None

    def body(u, lam_re, lam_im, w_b, w_c, d, *maybe_qs):
        o = _prep_fused_operands(u, (lam_re, lam_im), w_b, w_c, d, block_t,
                                 allow_l_pad=True, qat_bits=qat_bits)
        kernel = functools.partial(
            _fused_kernel, num_passes=o["num_passes"], block_t=o["t"],
            p=o["p_pad"], relu_state=relu_state,
            block_requant=block_requant,
            wb_scales=wb_scales, wc_scales=wc_scales, qat_bits=qat_bits,
            with_qat_scale=with_qs)
        in_specs = [o["io_block"],
                    o["full"]((o["h_pad"], 2 * o["p_pad"])),
                    o["full"]((2 * o["p_pad"], o["h_pad"])),
                    o["full"]((1, o["h_pad"])),
                    o["full"]((o["num_passes"], o["p_pad"])),
                    o["full"]((o["num_passes"], o["p_pad"])),
                    o["full"]((o["t"], o["p_pad"])),
                    o["full"]((o["t"], o["p_pad"]))]
        operands = [o["u"], o["w_b"], o["w_c"], o["d"], o["pow_re"],
                    o["pow_im"], o["ctab"][0], o["ctab"][1]]
        if with_qs:
            in_specs.append(o["full"]((1, 1)))
            operands.append(maybe_qs[0].reshape(1, 1)
                            .astype(jnp.float32))
        out = pl.pallas_call(
            kernel,
            grid=o["grid"],
            in_specs=in_specs,
            out_specs=o["io_block"],
            out_shape=jax.ShapeDtypeStruct((o["b"], o["l_pad"], o["h_pad"]),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, o["p_pad"]), jnp.float32),
                            pltpu.VMEM((1, o["p_pad"]), jnp.float32)],
            interpret=interpret,
        )(*operands)
        return out[:, :o["l"], :o["h"]]

    # batch-dim SPMD rule: DP-sharded inputs run the kernel per shard
    # instead of being all-gathered around the custom call (partition.py)
    from sparsernns_tpu.ops.pallas.partition import (FUSED_REPLICATED,
                                                     FUSED_RULE,
                                                     batch_partitioned)
    if with_qs:
        # same rule + a replicated (1, 1) scale operand
        rule = FUSED_RULE.replace(" -> ", ", q r -> ")
        repl = FUSED_REPLICATED + ("q", "r")
        return batch_partitioned(body, rule, repl)(
            u, lam[0], lam[1], w_b, w_c, d,
            qat_state_scale.reshape(1, 1))
    return batch_partitioned(body, FUSED_RULE, FUSED_REPLICATED)(
        u, lam[0], lam[1], w_b, w_c, d)


@functools.partial(
    jax.jit, static_argnames=("block_t", "relu_state", "interpret",
                              "block_requant", "wb_scales", "wc_scales"))
def fused_s5_apply_carry(
    u: jax.Array,          # (B, L, H) float32/bf16
    lam: Pair,             # (P,) pair — discretized λ̄
    w_b: jax.Array,        # (H, 2P)
    w_c: jax.Array,        # (2P, H)
    d: jax.Array,          # (H,)
    carry: Pair,           # (B, P) incoming state
    block_t: int = 256,
    relu_state: bool = False,
    interpret: Optional[bool] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
    wb_scales: Optional[Tuple[float, float]] = None,
    wc_scales: Optional[Tuple[float, float]] = None,
) -> Tuple[jax.Array, Pair]:
    """Streaming fused S5: like fused_s5_apply but the scan starts from
    ``carry`` and the final state is returned — chunked serving at
    fused-kernel speed with the recurrent state flowing between chunks.

    Returns (y (B, L, H), new_carry (B, P) pair).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    o = _prep_fused_operands(u, lam, w_b, w_c, d, block_t, allow_l_pad=False)
    # carries as (B, 1, P): Mosaic wants the trailing block dims divisible
    # by (8, 128) or equal to the array dims
    ci_re = jnp.pad(carry[0].astype(jnp.float32),
                    ((0, 0), (0, o["p_pad"] - o["p"])))[:, None, :]
    ci_im = jnp.pad(carry[1].astype(jnp.float32),
                    ((0, 0), (0, o["p_pad"] - o["p"])))[:, None, :]
    carry_block = pl.BlockSpec((1, 1, o["p_pad"]), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _fused_carry_kernel, num_passes=o["num_passes"], block_t=o["t"],
        p=o["p_pad"], relu_state=relu_state, block_requant=block_requant,
        wb_scales=wb_scales, wc_scales=wc_scales)
    out, co_re, co_im = pl.pallas_call(
        kernel,
        grid=o["grid"],
        in_specs=[o["io_block"], carry_block, carry_block,
                  o["full"]((o["h_pad"], 2 * o["p_pad"])),
                  o["full"]((2 * o["p_pad"], o["h_pad"])),
                  o["full"]((1, o["h_pad"])),
                  o["full"]((o["num_passes"], o["p_pad"])),
                  o["full"]((o["num_passes"], o["p_pad"])),
                  o["full"]((o["t"], o["p_pad"])),
                  o["full"]((o["t"], o["p_pad"]))],
        out_specs=[o["io_block"], carry_block, carry_block],
        out_shape=[jax.ShapeDtypeStruct((o["b"], o["l_pad"], o["h_pad"]),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((o["b"], 1, o["p_pad"]), jnp.float32),
                   jax.ShapeDtypeStruct((o["b"], 1, o["p_pad"]), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, o["p_pad"]), jnp.float32),
                        pltpu.VMEM((1, o["p_pad"]), jnp.float32)],
        interpret=interpret,
    )(o["u"], ci_re, ci_im, o["w_b"], o["w_c"], o["d"],
      o["pow_re"], o["pow_im"], o["ctab"][0], o["ctab"][1])

    p, l, h = o["p"], o["l"], o["h"]
    return out[:, :l, :h], (co_re[:, 0, :p], co_im[:, 0, :p])
