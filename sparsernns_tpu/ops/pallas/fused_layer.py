"""Whole-sequence-layer Pallas kernel: norm + S5 mixer + GLU + residual
in ONE pass over the time blocks.

The serving engine's layer body (quantize/engine.engine_layer_forward —
norm -> mixer -> activation -> GLU gate -> residual add -> relu ->
residual requant) compiles under XLA into several HBM round trips per
layer: a pad/re-layout of the mixer input, the fused-mixer custom call
(f32 out), and a large elementwise fusion that keeps BOTH a bf16 and an
f32 copy of the stream alive (measured 640 MB accessed per flagship
batch-8 forward). This kernel runs the ENTIRE layer per (batch,
time-block) grid step, so a layer's HBM traffic collapses to

    read residual block (2 bytes/elem) + write residual block (2 B/elem)

with everything else resident in VMEM. The residual stream lives in HBM
*padded* to the kernel geometry (L_pad, H_pad) and — when the layer has
a calibrated residual requant (layers.quant_residual) — as the INTEGER
codes of that requant grid (int16/int8). Storing the codes is EXACT:
the engine semantics already round the stream onto that grid, so the
int tensor carries the same values the f32 emulation holds, at 2 (or 1)
bytes each. Uncalibrated streams store ``act_dtype`` instead.

Reference analog: the layer body semantics are
/root/reference/sparseRNNs/model/layers.py:180-241 (norm/GLU/residual)
+ ssm.py:84-187 (mixer); the single-pass fusion itself has no reference
counterpart — it is the TPU-native answer to the HBM-bandwidth bound.

w8a8 configs run their GLU dense dots in-kernel on the int8 MXU path
(``_glu_dense``): the activation is quantized onto its frozen calibration
scale in VMEM and the dot is int8 x int8 -> int32 — identical values to
engine.quantized_dense, so the fused route stays bit-exact vs the per-op
route.

Limitations (the engine falls back to the unfused layer path): top-k on
the model dim, block-sparse GLU kernels, bidirectional.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsernns_tpu.ops.scan import Pair

#: residual-stream storage for a requant of ``bits``: integer codes
#: (exact values of the requant grid) at the smallest width that fits.
def requant_storage_dtype(bits: int):
    return jnp.int8 if bits <= 8 else jnp.int16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dequant_weight(ref, scales):
    """int8 weight ref -> f32 values (dequant on the VPU in VMEM)."""
    w = ref[...]
    if scales is None:
        return w.astype(jnp.float32) if w.dtype != jnp.float32 else w
    return w.astype(jnp.float32)


def _qdq(x, spec):
    """Value-form quantize-dequantize onto a frozen (scale, bits) grid —
    the in-kernel analog of static.quant_dequant (same round/clip)."""
    if spec is None:
        return x
    s, bits = spec
    qmax = float(2 ** (bits - 1) - 1)
    return jnp.clip(jnp.round(x / s), -(qmax + 1.0), qmax) * s


#: Half-block MXU/VPU interleave in the float mixer path: compute the
#: B-projection of the block's SECOND half between the two half-block
#: scans, hoping the scheduler overlaps the second dot (MXU) with the
#: first half's doubling passes (VPU). MEASURED NEGATIVE on the v5e
#: (runs/ablate_net.json *-ilv, 2026-08-20): B=32 2.173 vs 1.934 ms,
#: B=8 0.795 vs 0.711 ms — Mosaic does not overlap the adjacent
#: independent MXU/VPU stages, and the split B-proj costs. Default
#: stays False; kept as a re-measurable experiment (a backend/compiler
#: that schedules across units would flip the verdict), correctness
#: pinned by test_interleave_flag_matches_default. Hiding the scan
#: needs cross-grid-step pipelining (manual DMA double-buffering of
#: the NEXT time block's B-proj), not intra-step reordering.
INTERLEAVE = [False]


def _ablate_dot(x, n_out):
    """Shape-matching stand-in for a float dot under ABLATION
    "nodots" — cheap VPU work only, so a timing run isolates the MXU
    share. Timing-only: numerics are intentionally wrong."""
    h = x.shape[-1]
    if n_out <= h:
        return x[:, :n_out] * 1.0
    reps = -(-n_out // h)
    return jnp.tile(x, (1, reps))[:, :n_out]


def _float_dot(x, w):
    """The kernels' float matmul, honoring the timing-attribution
    ABLATION flag (scan_kernel.ABLATION; None in production)."""
    from sparsernns_tpu.ops.pallas.scan_kernel import ABLATION
    flag = ABLATION[0] or ""
    if "nodots" in flag:
        return _ablate_dot(x, w.shape[-1])
    if "bf16dots" in flag:
        return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _glu_dense(x, w_ref, w_scale, in_spec, colsum_ref=None):
    """In-kernel dense dot for the GLU gates. ``in_spec`` set — a
    (scale, bits) frozen activation grid: quantize the activation onto it
    and run the dot on the MXU's int8 path — one int8 x int8 -> int32 dot
    at bits <= 8 (w8a8), or the exact two-plane decomposition
    (ops/intdot.py) at 9..16 bits (w8a16) using the precomputed
    ``colsum_ref`` correction row. Identical values to
    engine.quantized_dense, so the fused path stays bit-exact vs the
    per-op path. Otherwise: f32 dot on the (dequantized) weights with the
    pow2 weight scale applied to the result."""
    from sparsernns_tpu.ops.intdot import int16_dot
    if in_spec is None:
        r = _float_dot(x, _dequant_weight(w_ref, w_scale))
        if w_scale is not None:
            r = r * w_scale
        return r
    in_scale, in_bits = in_spec
    cs = colsum_ref[...] if colsum_ref is not None else None
    acc = int16_dot(x, w_ref[...], cs, in_scale, in_bits)
    return acc * (in_scale * w_scale)


def _mixer_pre(r, refs, *, prenorm, wb_scales, mixer_in16, but_requant):
    """Stage 1 of the layer body: norm affine + B-projection (+ the
    mixer_in16 int-dot path's input quantization and the but_requant).
    Returns (z_d, bu_re, bu_im) — the D-term operand and the scan input.
    Split out of _fused_layer_body so the paired-row network kernel can
    interleave one row's MXU stage with the other row's VPU scan
    (co-issue measured on the v5e: runs/kernel_probe.json
    dot_then_scan = 0.79x of the serial sum)."""
    from sparsernns_tpu.ops.intdot import int16_dot, quantize_codes

    nw = refs["nw"][...]          # (1, Hp)
    nb = refs["nb"][...]
    z = r * nw + nb if prenorm else r

    if mixer_in16 is not None:
        s_ut, a_bits = mixer_in16
        q_ut = quantize_codes(z, s_ut, a_bits)
        cs_wb = refs["cs_wb"][...] if "cs_wb" in refs else None
        acc = int16_dot(z, refs["wb"][...], cs_wb,
                        s_ut, a_bits, codes=q_ut)
        p = acc.shape[-1] // 2
        bu_re = acc[:, :p] * (s_ut * wb_scales[0])
        bu_im = acc[:, p:] * (s_ut * wb_scales[1])
        # the D-term multiplies the quantized u, like the static path
        # (ssm.py:469 d_q * u_q)
        z_d = q_ut * s_ut
        if but_requant is not None:
            s_br, s_bi, b_bits = but_requant
            bu_re = _qdq(bu_re, (s_br, b_bits))
            bu_im = _qdq(bu_im, (s_bi, b_bits))
        return z_d, bu_re, bu_im

    wb = _dequant_weight(refs["wb"], wb_scales)
    p = wb.shape[-1] // 2
    bu = _float_dot(z, wb)
    bu_re, bu_im = bu[:, :p], bu[:, p:]
    if wb_scales is not None:
        bu_re = bu_re * wb_scales[0]
        bu_im = bu_im * wb_scales[1]
    if but_requant is not None:
        s_br, s_bi, b_bits = but_requant
        bu_re = _qdq(bu_re, (s_br, b_bits))
        bu_im = _qdq(bu_im, (s_bi, b_bits))
    return z, bu_re, bu_im


def _mixer_post(x_re, x_im, z_d, r, refs, *, prenorm, relufication, glu,
                relu_state, block_requant, wc_scales, out2_scale,
                out1_scale, out2_in, out1_in, state16, yt_requant,
                out2_out, out1_out):
    """Stage 3: states -> C-projection + D -> activation + GLU +
    residual (engine_layer_forward order). Returns the new residual
    block pre-(output-requant)."""
    from sparsernns_tpu.ops.intdot import int16_dot

    if relu_state:
        x_re = jnp.maximum(x_re, 0.0)
        x_im = jnp.maximum(x_im, 0.0)
    if state16:
        # quant_xt on the states feeding C (exact: relu commutes with the
        # symmetric-grid quantization), then per-half int8-MXU dots.
        # The states ALREADY sit on the block_requant grid (the scan
        # requantized them; relu keeps grid values or 0), so their codes
        # are one exact pow2 multiply — no round/clip re-quantization
        # (bit-identical accumulators, fewer VPU passes).
        s_re, s_im, s_bits = block_requant
        wc = refs["wc"][...]
        pp = wc.shape[0] // 2
        cs_re = refs["cs_wc_re"][...] if "cs_wc_re" in refs else None
        cs_im = refs["cs_wc_im"][...] if "cs_wc_im" in refs else None
        acc_re = int16_dot(x_re, wc[:pp], cs_re, s_re, s_bits,
                           codes=x_re * (1.0 / s_re))
        acc_im = int16_dot(x_im, wc[pp:], cs_im, s_im, s_bits,
                           codes=x_im * (1.0 / s_im))
        y = acc_re * (s_re * wc_scales[0]) + acc_im * (s_im * wc_scales[1])
    else:
        if wc_scales is not None:
            xs_cat = jnp.concatenate([x_re * wc_scales[0],
                                      x_im * wc_scales[1]], axis=-1)
        else:
            xs_cat = jnp.concatenate([x_re, x_im], axis=-1)
        wc = _dequant_weight(refs["wc"], wc_scales)
        y = _float_dot(xs_cat, wc)
    y = y + refs["d"][...] * z_d
    y = _qdq(y, yt_requant)

    x1 = jnp.maximum(y, 0.0) if relufication else jax.nn.gelu(y)
    if glu in ("half1", "half2", "full"):
        g = _glu_dense(x1, refs["out2_k"], out2_scale, out2_in,
                       refs.get("cs_out2"))
        gate = jax.nn.sigmoid(_qdq(g + refs["out2_b"][...], out2_out))
        if glu == "half1":
            base = x1
        elif glu == "half2":
            base = y
        else:
            base = _glu_dense(x1, refs["out1_k"], out1_scale, out1_in,
                              refs.get("cs_out1"))
            base = _qdq(base + refs["out1_b"][...], out1_out)
        h = base * gate
    else:
        h = x1
    h = h + r
    if not prenorm:
        nw = refs["nw"][...]
        nb = refs["nb"][...]
        h = h * nw + nb
    if relufication:
        h = jnp.maximum(h, 0.0)
    return h


def _fused_layer_body(
    r, refs, carry_re, carry_im, j, *,
    num_passes, block_t, prenorm, relufication, glu,
    relu_state, block_requant, wb_scales, wc_scales,
    out2_scale, out1_scale, out2_in=None, out1_in=None, carry_init=None,
    mixer_in16=None, state16=False, but_requant=None, yt_requant=None,
    out2_out=None, out1_out=None,
):
    """Shared layer math on an in-VMEM f32 residual block ``r`` (T, Hp).
    ``refs`` is the dict of operand refs. Returns the new residual block
    (T, Hp) f32, pre-(output-requant). Composed of _mixer_pre ->
    scan_block_body -> _mixer_post (stages shared with the paired-row
    interleaved body below).

    ``mixer_in16`` — a (scale, bits) grid: fake-quantize the mixer input
    onto it (the static path's quant_ut, models/ssm.py:429) and run the
    B-projection on the MXU int8 path via the exact two-plane
    decomposition (ops/intdot.py). ``state16`` — quantize the scan
    states onto the ``block_requant`` grid (the static path's quant_xt)
    and run the C-projection the same way.

    The bit-faithful requants (engine mxu16 mode — all frozen grids the
    static-quant emulation applies and the float engine skips):
    ``but_requant`` (s_re, s_im, bits) = quant_but after the B-projection
    (ssm.py:436); ``yt_requant`` (s, bits) = quant_yt on the mixer output
    incl. the D-term (ssm.py:469); ``out2_out``/``out1_out`` (s, bits) =
    the GLU denses' quant_output after the bias add (static.py
    QuantizedDense)."""
    from sparsernns_tpu.ops.pallas.scan_kernel import scan_block_body

    prescanned = False
    if (mixer_in16 is None and INTERLEAVE[0] and block_t % 16 == 0
            and block_t >= 32):
        # half-block stagger (module flag above): scan_a's VPU passes
        # sit adjacent to bproj_b's independent MXU dot; the half-b
        # states then fold half-a's exit row with the λ^{j+1} table
        # (= ctab rows [:half]) — the same reassociation class as the
        # block tree. Measured NEGATIVE on the v5e (module docstring).
        from sparsernns_tpu.ops.pallas.scan_kernel import _block_scan
        half = block_t // 2
        z_d_a, ar, ai = _mixer_pre(
            r[:half], refs, prenorm=prenorm, wb_scales=wb_scales,
            mixer_in16=None, but_requant=but_requant)
        sar, sai = _block_scan(ar, ai, refs["pow_re"],
                               refs["pow_im"], half)
        z_d_b, br_, bi_ = _mixer_pre(
            r[half:], refs, prenorm=prenorm, wb_scales=wb_scales,
            mixer_in16=None, but_requant=but_requant)
        sbr, sbi = _block_scan(br_, bi_, refs["pow_re"],
                               refs["pow_im"], half)
        tr = refs["ctab_re"][:half]
        ti = refs["ctab_im"][:half]
        car, cai = sar[half - 1:half], sai[half - 1:half]
        sbr = sbr + (tr * car - ti * cai)
        sbi = sbi + (tr * cai + ti * car)
        bu_re = jnp.concatenate([sar, sbr], axis=0)
        bu_im = jnp.concatenate([sai, sbi], axis=0)
        z_d = jnp.concatenate([z_d_a, z_d_b], axis=0)
        prescanned = True
    else:
        z_d, bu_re, bu_im = _mixer_pre(
            r, refs, prenorm=prenorm, wb_scales=wb_scales,
            mixer_in16=mixer_in16, but_requant=but_requant)
    x_re, x_im = scan_block_body(
        bu_re, bu_im, refs["pow_re"], refs["pow_im"],
        refs["ctab_re"], refs["ctab_im"], carry_re, carry_im, j,
        num_passes=num_passes, block_t=block_t,
        block_requant=block_requant, carry_init=carry_init,
        prescanned=prescanned)
    return _mixer_post(
        x_re, x_im, z_d, r, refs, prenorm=prenorm,
        relufication=relufication, glu=glu, relu_state=relu_state,
        block_requant=block_requant, wc_scales=wc_scales,
        out2_scale=out2_scale, out1_scale=out1_scale, out2_in=out2_in,
        out1_in=out1_in, state16=state16, yt_requant=yt_requant,
        out2_out=out2_out, out1_out=out1_out)


def _fused_layer_body_pair(
    r0, r1, refs, carry0, carry1, j, *,
    num_passes, block_t, prenorm, relufication, glu,
    relu_state, block_requant, wb_scales, wc_scales,
    out2_scale, out1_scale, out2_in=None, out1_in=None,
    carry_init0=None, carry_init1=None,
    mixer_in16=None, state16=False, but_requant=None, yt_requant=None,
    out2_out=None, out1_out=None,
):
    """Two-batch-row layer body with a SKEWED emission order: row 1's
    MXU stages (_mixer_pre / _mixer_post dots) sit adjacent to row 0's
    VPU scan in program order, targeting the co-issue the kernel-unit
    probe measured (runs/kernel_probe.json: dot+scan combined = 0.79x
    of the serial sum; the single-row body is one dependency chain with
    zero overlap). MEASURED NEGATIVE end to end on the v5e
    (runs/rowpair_ab.json: 2.16 vs 1.94 ms at B=32/bt512) — the
    micro-scale overlap does not engage across a full layer chain;
    kept as a re-measurable experiment. Per row the op sequence is
    IDENTICAL to
    _fused_layer_body, so outputs are bit-exact vs the unpaired route
    (pinned in tests/test_engine.py). ``carry0``/``carry1`` are (re, im)
    scratch-ref pairs."""
    from sparsernns_tpu.ops.pallas.scan_kernel import scan_block_body
    common = dict(prenorm=prenorm, wb_scales=wb_scales,
                  mixer_in16=mixer_in16, but_requant=but_requant)
    scan_kw = dict(num_passes=num_passes, block_t=block_t,
                   block_requant=block_requant)
    post_kw = dict(prenorm=prenorm, relufication=relufication, glu=glu,
                   relu_state=relu_state, block_requant=block_requant,
                   wc_scales=wc_scales, out2_scale=out2_scale,
                   out1_scale=out1_scale, out2_in=out2_in,
                   out1_in=out1_in, state16=state16,
                   yt_requant=yt_requant, out2_out=out2_out,
                   out1_out=out1_out)

    z0, b0_re, b0_im = _mixer_pre(r0, refs, **common)          # MXU
    z1, b1_re, b1_im = _mixer_pre(r1, refs, **common)          # MXU
    x0 = scan_block_body(b0_re, b0_im, refs["pow_re"], refs["pow_im"],
                         refs["ctab_re"], refs["ctab_im"],
                         carry0[0], carry0[1], j,
                         carry_init=carry_init0, **scan_kw)     # VPU
    # row 0's post (C-proj + GLU dots, MXU) emitted adjacent to row 1's
    # scan (VPU) — the co-issue pair
    h0 = _mixer_post(x0[0], x0[1], z0, r0, refs, **post_kw)     # MXU
    x1 = scan_block_body(b1_re, b1_im, refs["pow_re"], refs["pow_im"],
                         refs["ctab_re"], refs["ctab_im"],
                         carry1[0], carry1[1], j,
                         carry_init=carry_init1, **scan_kw)     # VPU
    h1 = _mixer_post(x1[0], x1[1], z1, r1, refs, **post_kw)     # MXU
    return h0, h1


def _store_out(out_ref, h, *, out_requant, out_dtype):
    if out_requant is not None:
        s, bits = out_requant
        qmax = float(2 ** (bits - 1) - 1)
        q = jnp.clip(jnp.round(h / s), -(qmax + 1.0), qmax)
        out_ref[0] = q.astype(requant_storage_dtype(bits))
    else:
        out_ref[0] = h.astype(out_dtype)


def _load_in(r_ref, *, in_requant):
    r = r_ref[0].astype(jnp.float32)
    if in_requant is not None:
        r = r * in_requant[0]
    return r


def _needs_cs(in_spec) -> bool:
    """A 9..16-bit activation grid needs the two-plane colsum row."""
    return in_spec is not None and in_spec[1] > 8


def colsum_names(glu, *, mixer_in16=None, state16=False, block_requant=None,
                 out2_in=None, out1_in=None, **_):
    """Extra operand names for the int8-MXU dot corrections, in kernel
    order (appended after the base/GLU operands). Only 9..16-bit grids
    need the two-plane colsum row — 8-bit dots are single-plane."""
    names = []
    if mixer_in16 is not None and mixer_in16[1] > 8:
        names += ["cs_wb"]
    if state16 and block_requant is not None and block_requant[2] > 8:
        names += ["cs_wc_re", "cs_wc_im"]
    if glu in ("half1", "half2", "full") and _needs_cs(out2_in):
        names += ["cs_out2"]
    if glu == "full" and _needs_cs(out1_in):
        names += ["cs_out1"]
    return names


def _make_kernel(glu, with_carry, **flags):
    names = ["r"]
    if with_carry:
        names += ["ci_re", "ci_im"]
    names += ["nw", "nb", "wb", "wc", "d",
              "pow_re", "pow_im", "ctab_re", "ctab_im"]
    if glu in ("half1", "half2", "full"):
        names += ["out2_k", "out2_b"]
    if glu == "full":
        names += ["out1_k", "out1_b"]
    names += colsum_names(glu, **flags)
    n_out = 3 if with_carry else 1

    def kernel(*all_refs):
        in_refs = all_refs[:len(names)]
        out_refs = all_refs[len(names):len(names) + n_out]
        carry_re, carry_im = all_refs[len(names) + n_out:]
        refs = dict(zip(names, in_refs))
        j = pl.program_id(1)
        r = _load_in(refs["r"], in_requant=flags["in_requant"])
        carry_init = ((refs["ci_re"][0], refs["ci_im"][0])
                      if with_carry else None)
        h = _fused_layer_body(
            r, refs, carry_re, carry_im, j,
            num_passes=flags["num_passes"], block_t=flags["block_t"],
            prenorm=flags["prenorm"], relufication=flags["relufication"],
            glu=glu, relu_state=flags["relu_state"],
            block_requant=flags["block_requant"],
            wb_scales=flags["wb_scales"], wc_scales=flags["wc_scales"],
            out2_scale=flags["out2_scale"], out1_scale=flags["out1_scale"],
            out2_in=flags.get("out2_in"), out1_in=flags.get("out1_in"),
            mixer_in16=flags.get("mixer_in16"),
            state16=flags.get("state16", False),
            but_requant=flags.get("but_requant"),
            yt_requant=flags.get("yt_requant"),
            out2_out=flags.get("out2_out"), out1_out=flags.get("out1_out"),
            carry_init=carry_init)
        if with_carry:
            out_refs[1][0] = carry_re[...]
            out_refs[2][0] = carry_im[...]
        _store_out(out_refs[0], h,
                   out_requant=flags["out_requant"],
                   out_dtype=flags["out_dtype"])

    return kernel, names


def pad_layer_ops(lam, w_b, w_c, d, norm_w, norm_b, out2, out1,
                  h_pad: int, t: int, colsums=()):
    """Pad one layer's operands to the kernel geometry (H -> h_pad lanes,
    P -> 128-multiple) and precompute its λ tables for time block ``t``.
    Shared by the per-layer kernel and the whole-network kernel
    (fused_network.py). ``colsums``: names of int32 column-sum correction
    rows to precompute for the int8-MXU two-plane dots (the weights must
    be int8 for those). Returns (ops dict, p_pad, num_passes)."""
    from sparsernns_tpu.ops.intdot import weight_colsum
    from sparsernns_tpu.ops.pallas.scan_kernel import lambda_power_tables
    h = w_b.shape[0]
    p = w_b.shape[-1] // 2
    p_pad = _round_up(p, 128)

    wb_re = jnp.pad(w_b[:, :p], ((0, h_pad - h), (0, p_pad - p)))
    wb_im = jnp.pad(w_b[:, p:], ((0, h_pad - h), (0, p_pad - p)))
    wc_re = jnp.pad(w_c[:p, :], ((0, p_pad - p), (0, h_pad - h)))
    wc_im = jnp.pad(w_c[p:, :], ((0, p_pad - p), (0, h_pad - h)))
    lam_re = jnp.pad(lam[0], (0, p_pad - p))
    lam_im = jnp.pad(lam[1], (0, p_pad - p))
    num_passes = max(1, (t - 1).bit_length())
    pow_re, pow_im, ctab = lambda_power_tables(lam_re, lam_im, t, num_passes)

    ops = {
        "nw": jnp.pad(norm_w.astype(jnp.float32), (0, h_pad - h))[None, :],
        "nb": jnp.pad(norm_b.astype(jnp.float32), (0, h_pad - h))[None, :],
        "wb": jnp.concatenate([wb_re, wb_im], axis=-1),
        "wc": jnp.concatenate([wc_re, wc_im], axis=0),
        "d": jnp.pad(d, (0, h_pad - h))[None, :],
        "pow_re": pow_re, "pow_im": pow_im,
        "ctab_re": ctab[0], "ctab_im": ctab[1],
    }
    if out2 is not None:
        k2, b2 = out2
        ops["out2_k"] = jnp.pad(k2, ((0, h_pad - h), (0, h_pad - h)))
        ops["out2_b"] = jnp.pad(b2, (0, h_pad - h))[None, :]
    if out1 is not None:
        k1, b1 = out1
        ops["out1_k"] = jnp.pad(k1, ((0, h_pad - h), (0, h_pad - h)))
        ops["out1_b"] = jnp.pad(b1, (0, h_pad - h))[None, :]
    # int32 correction rows for the two-plane int8-MXU dots (tiny; pad
    # rows are zero so padded == unpadded sums)
    if "cs_wb" in colsums:
        ops["cs_wb"] = weight_colsum(ops["wb"])[None, :]
    if "cs_wc_re" in colsums:
        ops["cs_wc_re"] = weight_colsum(ops["wc"][:p_pad])[None, :]
        ops["cs_wc_im"] = weight_colsum(ops["wc"][p_pad:])[None, :]
    if "cs_out2" in colsums:
        ops["cs_out2"] = weight_colsum(ops["out2_k"])[None, :]
    if "cs_out1" in colsums:
        ops["cs_out1"] = weight_colsum(ops["out1_k"])[None, :]
    return ops, p_pad, num_passes


def _prep(r, lam, w_b, w_c, d, norm_w, norm_b, out2, out1, block_t,
          colsums=()):
    """Pad every operand to the kernel geometry. ``r`` must already be
    (B, L_pad, H_pad) with L_pad % block_t == 0, H_pad % 128 == 0 — the
    stream stays padded ACROSS layers, so this pads only the (tiny)
    weights. Returns the operand dict + geometry."""
    b, l_pad, h_pad = r.shape
    t = min(block_t, l_pad)
    assert l_pad % t == 0 and h_pad % 128 == 0, (r.shape, block_t)
    ops, p_pad, num_passes = pad_layer_ops(
        lam, w_b, w_c, d, norm_w, norm_b, out2, out1, h_pad, t,
        colsums=colsums)
    geo = dict(b=b, l_pad=l_pad, h_pad=h_pad, p_pad=p_pad, t=t,
               num_passes=num_passes)
    return ops, geo


def _specs(ops, geo):
    io_block = pl.BlockSpec((1, geo["t"], geo["h_pad"]),
                            lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return io_block, full


def _out_storage(out_requant, act_dtype):
    if out_requant is not None:
        return requant_storage_dtype(out_requant[1])
    return act_dtype


@functools.partial(
    jax.jit, static_argnames=(
        "block_t", "prenorm", "relufication", "glu", "relu_state",
        "in_requant", "out_requant", "block_requant", "wb_scales",
        "wc_scales", "out2_scale", "out1_scale", "out2_in_scale",
        "out1_in_scale", "mixer_in16", "state16", "but_requant",
        "yt_requant", "out2_out_requant", "out1_out_requant",
        "act_dtype", "interpret"))
def fused_layer_apply(
    r: jax.Array,                # (B, L_pad, H_pad) int16/int8/bf16/f32
    lam: Pair,
    w_b: jax.Array,              # (H, 2P) int8 (wb_scales) or f32
    w_c: jax.Array,              # (2P, H)
    d: jax.Array,                # (H,)
    norm_w: jax.Array,           # (H,) folded-BN / LN affine
    norm_b: jax.Array,
    out2_kernel: Optional[jax.Array] = None,   # (H, H) GLU gate dense
    out2_bias: Optional[jax.Array] = None,
    out1_kernel: Optional[jax.Array] = None,   # (H, H) "full" value dense
    out1_bias: Optional[jax.Array] = None,
    *,
    block_t: int = 256,
    prenorm: bool = True,
    relufication: bool = False,
    glu: str = "half1",
    relu_state: bool = False,
    in_requant: Optional[Tuple[float, int]] = None,
    out_requant: Optional[Tuple[float, int]] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
    wb_scales: Optional[Tuple[float, float]] = None,
    wc_scales: Optional[Tuple[float, float]] = None,
    out2_scale: Optional[float] = None,
    out1_scale: Optional[float] = None,
    out2_in_scale: Optional[Tuple[float, int]] = None,  # (scale, bits)
    out1_in_scale: Optional[Tuple[float, int]] = None,
    mixer_in16: Optional[Tuple[float, int]] = None,
    state16: bool = False,
    but_requant: Optional[Tuple[float, float, int]] = None,
    yt_requant: Optional[Tuple[float, int]] = None,
    out2_out_requant: Optional[Tuple[float, int]] = None,
    out1_out_requant: Optional[Tuple[float, int]] = None,
    act_dtype: Any = jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One serving layer in one kernel. Returns the new residual stream,
    same padded shape as ``r``, stored as the out_requant codes
    (int16/int8) or ``act_dtype``. ``mixer_in16``/``state16``/the in-scale
    specs route the dots onto the exact int8-MXU path (ops/intdot.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    glu_args = [a for a in (out2_kernel, out2_bias, out1_kernel, out1_bias)
                if a is not None]
    cs = colsum_names(glu, mixer_in16=mixer_in16, state16=state16,
                      block_requant=block_requant,
                      out2_in=out2_in_scale, out1_in=out1_in_scale)

    def body(r, lam_re, lam_im, w_b, w_c, d, norm_w, norm_b, *glu_ws):
        out2 = (glu_ws[0], glu_ws[1]) if len(glu_ws) >= 2 else None
        out1 = (glu_ws[2], glu_ws[3]) if len(glu_ws) >= 4 else None
        ops, geo = _prep(r, (lam_re, lam_im), w_b, w_c, d,
                         norm_w, norm_b, out2, out1, block_t, colsums=cs)
        kernel, names = _make_kernel(
            glu, False, num_passes=geo["num_passes"], block_t=geo["t"],
            prenorm=prenorm, relufication=relufication,
            relu_state=relu_state, in_requant=in_requant,
            out_requant=out_requant, block_requant=block_requant,
            wb_scales=wb_scales, wc_scales=wc_scales,
            out2_scale=out2_scale, out1_scale=out1_scale,
            out2_in=out2_in_scale, out1_in=out1_in_scale,
            mixer_in16=mixer_in16, state16=state16,
            but_requant=but_requant, yt_requant=yt_requant,
            out2_out=out2_out_requant, out1_out=out1_out_requant,
            out_dtype=act_dtype)
        io_block, full = _specs(ops, geo)
        in_specs = [io_block] + [full(ops[n]) for n in names[1:]]
        out = pl.pallas_call(
            kernel,
            grid=(geo["b"], geo["l_pad"] // geo["t"]),
            in_specs=in_specs,
            out_specs=io_block,
            out_shape=jax.ShapeDtypeStruct(
                r.shape, _out_storage(out_requant, act_dtype)),
            scratch_shapes=[pltpu.VMEM((1, geo["p_pad"]), jnp.float32),
                            pltpu.VMEM((1, geo["p_pad"]), jnp.float32)],
            interpret=interpret,
        )(r, *[ops[n] for n in names[1:]])
        return out

    from sparsernns_tpu.ops.pallas.partition import batch_partitioned
    rule, repl = _layer_rule(8 + len(glu_args))
    return batch_partitioned(body, rule, repl)(
        r, lam[0], lam[1], w_b, w_c, d, norm_w, norm_b, *glu_args)


@functools.partial(
    jax.jit, static_argnames=(
        "block_t", "prenorm", "relufication", "glu", "relu_state",
        "in_requant", "out_requant", "block_requant", "wb_scales",
        "wc_scales", "out2_scale", "out1_scale", "out2_in_scale",
        "out1_in_scale", "mixer_in16", "state16", "but_requant",
        "yt_requant", "out2_out_requant", "out1_out_requant",
        "act_dtype", "interpret"))
def fused_layer_apply_carry(
    r: jax.Array,                # (B, L, H_pad); L % block == 0
    carry: Pair,                 # (B, P) incoming state
    lam: Pair,
    w_b: jax.Array,
    w_c: jax.Array,
    d: jax.Array,
    norm_w: jax.Array,
    norm_b: jax.Array,
    out2_kernel: Optional[jax.Array] = None,
    out2_bias: Optional[jax.Array] = None,
    out1_kernel: Optional[jax.Array] = None,
    out1_bias: Optional[jax.Array] = None,
    *,
    block_t: int = 256,
    prenorm: bool = True,
    relufication: bool = False,
    glu: str = "half1",
    relu_state: bool = False,
    in_requant: Optional[Tuple[float, int]] = None,
    out_requant: Optional[Tuple[float, int]] = None,
    block_requant: Optional[Tuple[float, float, int]] = None,
    wb_scales: Optional[Tuple[float, float]] = None,
    wc_scales: Optional[Tuple[float, float]] = None,
    out2_scale: Optional[float] = None,
    out1_scale: Optional[float] = None,
    out2_in_scale: Optional[Tuple[float, int]] = None,
    out1_in_scale: Optional[Tuple[float, int]] = None,
    mixer_in16: Optional[Tuple[float, int]] = None,
    state16: bool = False,
    but_requant: Optional[Tuple[float, float, int]] = None,
    yt_requant: Optional[Tuple[float, int]] = None,
    out2_out_requant: Optional[Tuple[float, int]] = None,
    out1_out_requant: Optional[Tuple[float, int]] = None,
    act_dtype: Any = jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, Pair]:
    """Streaming variant: the scan starts from ``carry`` and the final
    state is returned — chunked serving with the whole layer fused.
    Returns (new_residual, new_carry)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    glu_args = [a for a in (out2_kernel, out2_bias, out1_kernel, out1_bias)
                if a is not None]
    cs = colsum_names(glu, mixer_in16=mixer_in16, state16=state16,
                      block_requant=block_requant,
                      out2_in=out2_in_scale, out1_in=out1_in_scale)

    def body(r, ci_re, ci_im, lam_re, lam_im, w_b, w_c, d,
             norm_w, norm_b, *glu_ws):
        out2 = (glu_ws[0], glu_ws[1]) if len(glu_ws) >= 2 else None
        out1 = (glu_ws[2], glu_ws[3]) if len(glu_ws) >= 4 else None
        ops, geo = _prep(r, (lam_re, lam_im), w_b, w_c, d,
                         norm_w, norm_b, out2, out1, block_t, colsums=cs)
        kernel, names = _make_kernel(
            glu, True, num_passes=geo["num_passes"], block_t=geo["t"],
            prenorm=prenorm, relufication=relufication,
            relu_state=relu_state, in_requant=in_requant,
            out_requant=out_requant, block_requant=block_requant,
            wb_scales=wb_scales, wc_scales=wc_scales,
            out2_scale=out2_scale, out1_scale=out1_scale,
            out2_in=out2_in_scale, out1_in=out1_in_scale,
            mixer_in16=mixer_in16, state16=state16,
            but_requant=but_requant, yt_requant=yt_requant,
            out2_out=out2_out_requant, out1_out=out1_out_requant,
            out_dtype=act_dtype)
        io_block, full = _specs(ops, geo)
        carry_block = pl.BlockSpec((1, 1, geo["p_pad"]),
                                   lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        in_specs = ([io_block, carry_block, carry_block]
                    + [full(ops[n]) for n in names[3:]])
        out, co_re, co_im = pl.pallas_call(
            kernel,
            grid=(geo["b"], geo["l_pad"] // geo["t"]),
            in_specs=in_specs,
            out_specs=[io_block, carry_block, carry_block],
            out_shape=[
                jax.ShapeDtypeStruct(
                    r.shape, _out_storage(out_requant, act_dtype)),
                jax.ShapeDtypeStruct((geo["b"], 1, geo["p_pad"]),
                                     jnp.float32),
                jax.ShapeDtypeStruct((geo["b"], 1, geo["p_pad"]),
                                     jnp.float32)],
            scratch_shapes=[pltpu.VMEM((1, geo["p_pad"]), jnp.float32),
                            pltpu.VMEM((1, geo["p_pad"]), jnp.float32)],
            interpret=interpret,
        )(r, ci_re, ci_im, *[ops[n] for n in names[3:]])
        return out, co_re, co_im

    p = w_b.shape[-1] // 2
    p_pad = _round_up(p, 128)
    ci_re = jnp.pad(carry[0].astype(jnp.float32),
                    ((0, 0), (0, p_pad - p)))[:, None, :]
    ci_im = jnp.pad(carry[1].astype(jnp.float32),
                    ((0, 0), (0, p_pad - p)))[:, None, :]

    from sparsernns_tpu.ops.pallas.partition import batch_partitioned
    rule, repl = _layer_carry_rule(10 + len(glu_args))
    out, co_re, co_im = batch_partitioned(body, rule, repl,
                                          batch_args=(0, 1, 2))(
        r, ci_re, ci_im, lam[0], lam[1], w_b, w_c, d, norm_w, norm_b,
        *glu_args)
    return out, (co_re[:, 0, :p], co_im[:, 0, :p])


def _gen_rule(arg_shapes_nd, result_nd, batch_args):
    """Shardy rule: unique replicated factor per non-batch dim; the
    leading batch factor ``b`` is shared by ``batch_args`` and results."""
    factors = []
    parts = []
    i = 0
    for ai, nd in enumerate(arg_shapes_nd):
        dims = []
        for k in range(nd):
            if k == 0 and ai in batch_args:
                dims.append("b")
            else:
                f = f"f{i}"
                i += 1
                factors.append(f)
                dims.append(f)
        parts.append(" ".join(dims))
    # results share the FIRST batch arg's non-batch factors
    res = []
    first = parts[batch_args[0]].split()
    for nd in result_nd:
        res.append(" ".join(first[:nd]) if nd == len(first)
                   else " ".join(["b"] + first[1:nd]))
    return ", ".join(parts) + " -> " + ", ".join(res), tuple(factors)


def _layer_rule(n_args):
    # (r[b,l,h], lam_re[p], lam_im[p], wb[h,2p], wc[2p,h], d[h],
    #  nw[h], nb[h][, out2k[h,h], out2b[h][, out1k, out1b]]) -> r'[b,l,h]
    nds = [3, 1, 1, 2, 2, 1, 1, 1] + [2, 1, 2, 1][: n_args - 8]
    return _gen_rule(nds, [3], [0])


def _layer_carry_rule(n_args):
    # adds ci_re/ci_im (b,1,p) operands and carry results
    nds = [3, 3, 3, 1, 1, 2, 2, 1, 1, 1] + [2, 1, 2, 1][: n_args - 10]
    rule, factors = _gen_rule(nds, [3], [0, 1, 2])
    # results: r' shares r's factors; carries share ci_re's factors
    head, _ = rule.split(" -> ")
    parts = head.split(", ")
    rule = head + " -> " + ", ".join([parts[0], parts[1], parts[1]])
    return rule, factors
