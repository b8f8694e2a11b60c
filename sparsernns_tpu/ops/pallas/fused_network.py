"""Whole-NETWORK Pallas kernel: encoder -> N sequence layers -> decoder
in one pass over the time blocks — the serving engine's speed-of-light.

The per-layer whole-layer kernel (fused_layer.py) already collapses each
layer to one read + one write of the 2-byte residual stream, but the
stream still round-trips HBM between layers (3 x 31 MB at the flagship
batch-8 forward) and the encoder/decoder boundaries cost another ~90 MB
of XLA pad/cast/matmul round trips. TPU grids execute sequentially, so
each layer's scan carry can live in VMEM scratch across time blocks —
which means ALL layers can process a time block back to back in one
grid step, with inter-layer activations never leaving VMEM:

    HBM traffic = read input (B, L, D_in) f32
                + weights + λ tables once
                + write mask (B, L, D_out) f32

(~65 MB vs ~289 MB for the per-layer-kernel stack at the flagship
shape). At that point the kernel is MXU-bound, not HBM-bound — the
honest floor is max(bytes/BW, padded_flops/peak_flops); see
profiling.engine_padded_flops and the bench's roofline accounting.

Geometry — MAIN + TAIL calls. Mosaic requires a block's sublane dim to
be 8-divisible OR to span the whole axis, and NDNS L=3751 is odd, so no
8-aligned time block tiles L exactly (and flattening (B, L) into one
row stream forces 29 MB tiled-layout copies at both boundaries — the
padded per-batch tiling of odd L is physically different from the flat
tiling). Instead the forward runs as TWO pallas calls on the original
(B, L, D) layout: a MAIN grid of 8-aligned t-row blocks covering
L - L%t rows (zero copies — the input operand is the parameter itself),
and a TAIL call whose single block spans the remaining L%t rows (a
whole-axis block is exempt from alignment). The per-layer scan carries
cross between the calls as explicit (B, 1, P) outputs/inputs — the same
mechanism the streaming chunk kernel uses. The tail output lands with a
dynamic-update-slice (in-place on the main output buffer); the only
extra traffic is the ~2 MB tail slice. No partial blocks anywhere, so
interpret-mode (CPU tests) matches compiled behavior exactly.

Numerics: bit-identical to the per-layer-kernel stack path
(W8A16Engine._apply_stack) at the same ``block_t`` — the time-block
decomposition (and therefore the state-requant boundaries) is the same,
and the inter-layer requant/act-dtype store+load round trip is
reproduced in VMEM value form: integer codes times a pow2 scale are
exact in f32, so "requantize and keep f32" equals "store int16 codes
and dequantize". Pre/post per-tensor pow2 weight scales commute exactly
with the f32 dot.

Reference analog: the composed forward is
/root/reference/sparseRNNs/model/seq_model.py:392-456 (encoder -> layers
-> decoder); the single-kernel execution has no reference counterpart —
it is the TPU-native endpoint of SURVEY §7's build plan for the serving
path.

w8a8 configs run the encoder/decoder dots in-kernel on the int8 MXU
path (``_boundary_dense``) exactly like the GLU dots — identical values
to engine.quantized_dense, so the single-kernel route stays bit-exact
vs the per-op route.

Limitations (engine falls back to the per-layer stack or per-op paths):
everything fused_layer.py excludes (model-dim top-k, block-sparse GLU,
>16-bit requant) plus block-sparse encoder/decoder packs. The kernel is
not batch-partitioned; sharded serving uses the dp/sp/tp engine paths.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsernns_tpu.ops.pallas.fused_layer import (_fused_layer_body,
                                                   _fused_layer_body_pair,
                                                   _qdq, _round_up,
                                                   pad_layer_ops)

#: operand names per layer, in kernel order (matches _fused_layer_body)
_LAYER_BASE = ("nw", "nb", "wb", "wc", "d",
               "pow_re", "pow_im", "ctab_re", "ctab_im")


class NetLayerStatic(NamedTuple):
    """Per-layer static (trace-time) kernel parameters."""

    out_requant: Optional[Tuple[float, int]] = None
    block_requant: Optional[Tuple[float, float, int]] = None
    wb_scales: Optional[Tuple[float, float]] = None
    wc_scales: Optional[Tuple[float, float]] = None
    out2_scale: Optional[float] = None
    out1_scale: Optional[float] = None
    # frozen activation (scale, bits) grids for the int8-MXU GLU dots —
    # single-plane at bits <= 8 (w8a8), exact two-plane at 9..16 bits
    # (w8a16; ops/intdot.py). None = float-activation dots.
    out2_in_scale: Optional[Tuple[float, int]] = None
    out1_in_scale: Optional[Tuple[float, int]] = None
    # (scale, bits) quant_ut grid for the int8-MXU B-projection, and the
    # quant_xt switch for the C-projection (grid = block_requant's)
    mixer_in16: Optional[Tuple[float, int]] = None
    state16: bool = False
    # bit-faithful requants (engine mxu16 mode): quant_but after the
    # B-projection, quant_yt on the mixer output, and the GLU denses'
    # quant_output — the frozen grids the static-quant emulation applies
    # (fused_layer._fused_layer_body docstring)
    but_requant: Optional[Tuple[float, float, int]] = None
    yt_requant: Optional[Tuple[float, int]] = None
    out2_out_requant: Optional[Tuple[float, int]] = None
    out1_out_requant: Optional[Tuple[float, int]] = None


def _value_roundtrip(h, out_requant, act_dtype):
    """The inter-layer stream store+load of the per-layer path, in VMEM
    value form: requant codes x pow2 scale are exact in f32, so this is
    bit-identical to materializing int16/int8 (or act_dtype) in HBM.
    The requant itself IS fused_layer._qdq — shared so the cross-route
    bit-exactness claims rest on one implementation."""
    from sparsernns_tpu.ops.pallas.fused_layer import _qdq
    if out_requant is not None:
        return _qdq(h, out_requant)
    if act_dtype == jnp.float32:
        return h
    return h.astype(act_dtype).astype(jnp.float32)


def _boundary_dense(x, k_ref, w_scale, in_spec, colsum_ref=None):
    """Encoder/decoder dot inside the network kernel — exactly
    fused_layer._glu_dense (one implementation for every in-kernel
    quantized dense, so the int8-MXU/float dot logic cannot drift
    between the per-layer and whole-network routes)."""
    from sparsernns_tpu.ops.pallas.fused_layer import _glu_dense
    return _glu_dense(x, k_ref, w_scale, in_spec, colsum_ref)


def _net_call(x, enc_k, enc_b, dec_k, dec_b, layer_flat, layer_names,
              p_pads, num_passes, statics, carries_in, *,
              t, carry_out, enc_scale, dec_scale, enc_in, dec_in,
              prenorm, relufication, glu, relu_state, act_dtype,
              interpret, cs_enc=None, cs_dec=None, enc_out=None,
              dec_out=None, out_dtype=jnp.float32, rows: int = 1):
    """One pallas_call running the full depth over ``t``-row time blocks
    of ``x`` (grid (B/rows, L // t); L % t rows are left untouched — the
    tail call handles them). ``carries_in``: per-layer ((B,1,P), (B,1,P))
    initial scan states or None; ``carry_out``: also return the final
    per-layer states (the main->tail handoff). ``cs_enc``/``cs_dec``:
    int32 colsum correction rows for 9..16-bit boundary dots.

    ``rows=2``: paired-row interleaved mode — each grid step processes
    TWO batch rows with row 1's MXU stages emitted adjacent to row 0's
    VPU scan (fused_layer._fused_layer_body_pair), exploiting the
    measured MXU/VPU co-issue (runs/kernel_probe.json). Per row the op
    sequence is identical, so outputs are bit-exact vs rows=1. Requires
    B % 2 == 0."""
    b, l, d_in = x.shape
    n_t = l // t
    d_out = dec_k.shape[1]
    n_layers = len(p_pads)
    n_per_layer = len(layer_names)
    with_cin = carries_in is not None
    assert rows in (1, 2) and b % rows == 0, (b, rows)

    def _encode(xrow, enc_k_ref, enc_b_ref, cs_enc_ref):
        hb = _boundary_dense(xrow.astype(jnp.float32), enc_k_ref,
                             enc_scale, enc_in, cs_enc_ref)
        hb = _qdq(hb + enc_b_ref[...], enc_out)
        if relufication:
            hb = jnp.maximum(hb, 0.0)
        return _value_roundtrip(hb, None, act_dtype)

    def _layer_kw(st):
        return dict(
            num_passes=num_passes, block_t=t, prenorm=prenorm,
            relufication=relufication, glu=glu, relu_state=relu_state,
            block_requant=st.block_requant,
            wb_scales=st.wb_scales, wc_scales=st.wc_scales,
            out2_scale=st.out2_scale, out1_scale=st.out1_scale,
            out2_in=st.out2_in_scale, out1_in=st.out1_in_scale,
            mixer_in16=st.mixer_in16, state16=st.state16,
            but_requant=st.but_requant, yt_requant=st.yt_requant,
            out2_out=st.out2_out_requant, out1_out=st.out1_out_requant)

    def kernel(*refs):
        x_ref, enc_k_ref, enc_b_ref = refs[:3]
        base = 3
        cin = None
        if with_cin:
            cin = refs[base:base + 2 * n_layers]
            base += 2 * n_layers
        layer_refs = [
            dict(zip(layer_names,
                     refs[base + i * n_per_layer:
                          base + (i + 1) * n_per_layer]))
            for i in range(n_layers)]
        base += n_layers * n_per_layer
        dec_k_ref, dec_b_ref = refs[base], refs[base + 1]
        base += 2
        cs_enc_ref = cs_dec_ref = None
        if cs_enc is not None:
            cs_enc_ref = refs[base]
            base += 1
        if cs_dec is not None:
            cs_dec_ref = refs[base]
            base += 1
        out_ref = refs[base]
        base += 1
        cout = None
        if carry_out:
            # one (rows, 1, P) re/im output block per layer — covers
            # every row of the pair
            cout = refs[base:base + 2 * n_layers]
            base += 2 * n_layers
        scratch = refs[base:]
        j = pl.program_id(1)

        if rows == 1:
            # encoder (engine_encode): dense + relu, cast to stream dtype
            hb = _encode(x_ref[0], enc_k_ref, enc_b_ref, cs_enc_ref)
            for i in range(n_layers):
                st = statics[i]
                carry_init = ((cin[2 * i][0], cin[2 * i + 1][0])
                              if with_cin else None)
                # _fused_layer_body mutates this layer's carry scratch
                # and returns the block pre-(output-requant); the
                # store+load the per-layer path does through HBM happens
                # here in VMEM value form (bit-identical — module doc).
                hb = _fused_layer_body(
                    hb, layer_refs[i], scratch[2 * i], scratch[2 * i + 1],
                    j, carry_init=carry_init, **_layer_kw(st))
                hb = _value_roundtrip(hb, st.out_requant, act_dtype)
                if carry_out:
                    cout[2 * i][0] = scratch[2 * i][...]
                    cout[2 * i + 1][0] = scratch[2 * i + 1][...]
            # decoder: pad-lane rows of dec_k are zero → no lane slicing
            y = _boundary_dense(hb, dec_k_ref, dec_scale, dec_in,
                                cs_dec_ref)
            out_ref[0] = _qdq(y + dec_b_ref[...], dec_out).astype(out_dtype)
            return

        # ---- rows == 2: paired-row interleaved schedule ----
        h0 = _encode(x_ref[0], enc_k_ref, enc_b_ref, cs_enc_ref)
        h1 = _encode(x_ref[1], enc_k_ref, enc_b_ref, cs_enc_ref)
        for i in range(n_layers):
            st = statics[i]
            ci0 = ci1 = None
            if with_cin:
                ci0 = (cin[2 * i][0], cin[2 * i + 1][0])
                ci1 = (cin[2 * i][1], cin[2 * i + 1][1])
            h0, h1 = _fused_layer_body_pair(
                h0, h1, layer_refs[i],
                (scratch[4 * i], scratch[4 * i + 1]),
                (scratch[4 * i + 2], scratch[4 * i + 3]), j,
                carry_init0=ci0, carry_init1=ci1, **_layer_kw(st))
            h0 = _value_roundtrip(h0, st.out_requant, act_dtype)
            h1 = _value_roundtrip(h1, st.out_requant, act_dtype)
            if carry_out:
                cout[2 * i][0] = scratch[4 * i][...]
                cout[2 * i][1] = scratch[4 * i + 2][...]
                cout[2 * i + 1][0] = scratch[4 * i + 1][...]
                cout[2 * i + 1][1] = scratch[4 * i + 3][...]
        y0 = _boundary_dense(h0, dec_k_ref, dec_scale, dec_in, cs_dec_ref)
        out_ref[0] = _qdq(y0 + dec_b_ref[...], dec_out).astype(out_dtype)
        y1 = _boundary_dense(h1, dec_k_ref, dec_scale, dec_in, cs_dec_ref)
        out_ref[1] = _qdq(y1 + dec_b_ref[...], dec_out).astype(out_dtype)

    io_in = pl.BlockSpec((rows, t, d_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    io_out = pl.BlockSpec((rows, t, d_out), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    carry_specs = [pl.BlockSpec((rows, 1, p_pad), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
                   for p_pad in p_pads for _ in range(2)]

    in_specs = [io_in, full(enc_k), full(enc_b)]
    args = [x, enc_k, enc_b]
    if with_cin:
        in_specs += carry_specs
        for c_re, c_im in carries_in:
            args += [c_re, c_im]
    in_specs += [full(a) for a in layer_flat] + [full(dec_k), full(dec_b)]
    args += [*layer_flat, dec_k, dec_b]
    for cs in (cs_enc, cs_dec):
        if cs is not None:
            in_specs.append(full(cs))
            args.append(cs)

    out_shape = [jax.ShapeDtypeStruct((b, l, d_out), out_dtype)]
    out_specs = [io_out]
    if carry_out:
        for p_pad in p_pads:
            out_shape += [jax.ShapeDtypeStruct((b, 1, p_pad), jnp.float32)
                          ] * 2
        out_specs += carry_specs

    scratch = []
    for p_pad in p_pads:
        scratch += [pltpu.VMEM((1, p_pad), jnp.float32)] * 2 * rows

    res = pl.pallas_call(
        kernel,
        grid=(b // rows, n_t),
        in_specs=in_specs,
        out_specs=out_specs if carry_out else out_specs[0],
        out_shape=out_shape if carry_out else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    if not carry_out:
        return res, None
    out = res[0]
    carries = [(res[1 + 2 * i], res[2 + 2 * i]) for i in range(n_layers)]
    return out, carries


def fused_network_apply(
    x: jax.Array,                 # (B, L, D_in) f32 or bf16 (bf16 halves
                                  # the kernel's input HBM read)
    enc_kernel: jax.Array,        # (D_in, H) int8 (enc_scale) or f32
    enc_bias: jax.Array,          # (H,)
    layers: Tuple[dict, ...],     # per-layer operand dicts (see below)
    dec_kernel: jax.Array,        # (H, D_out)
    dec_bias: jax.Array,          # (D_out,)
    *,
    statics: Tuple[NetLayerStatic, ...],
    enc_scale: Optional[float] = None,
    dec_scale: Optional[float] = None,
    enc_in_scale: Optional[Tuple[float, int]] = None,  # (scale, bits)
    dec_in_scale: Optional[Tuple[float, int]] = None,
    enc_out_requant: Optional[Tuple[float, int]] = None,
    dec_out_requant: Optional[Tuple[float, int]] = None,
    block_t: int = 256,
    prenorm: bool = True,
    relufication: bool = False,
    glu: str = "half1",
    relu_state: bool = False,
    act_dtype: Any = jnp.bfloat16,
    out_dtype: Any = jnp.float32,
    interpret: Optional[bool] = None,
    row_pair: bool = False,
) -> jax.Array:
    """Full serving forward as one main (+ one tail) Pallas call. Each
    ``layers[i]`` dict holds: lam (pair), w_b (H, 2P), w_c (2P, H),
    d (H,), norm_w, norm_b and optionally out2_kernel/out2_bias/
    out1_kernel/out1_bias — the same operands fused_layer_apply takes.
    Any B, L and ``block_t`` work (the effective time block is
    8-aligned; L % t rows go through the tail call). Returns the
    (B, L, D_out) output in ``out_dtype`` (bf16 halves the output HBM
    write; the cast is the single store-time rounding, identical to
    casting the f32 result). Call inside jit.

    ``row_pair``: process two batch rows per grid step with interleaved
    MXU/VPU stages (the measured co-issue — _net_call docstring);
    bit-exact vs the unpaired schedule, needs B even (silently ignored
    otherwise)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, l, d_in = x.shape
    rows = 2 if (row_pair and b % 2 == 0) else 1
    if not interpret:
        # Pin the default row-major layout at both boundaries: XLA's
        # layout assignment otherwise picks a time-minor entry/exit
        # layout (driven by the tail slice/update on the time dim) and
        # brackets the kernels with two full-tensor relayout copies
        # (2 x 29 MB at the flagship shape — measured).
        from jax.experimental.layout import Layout, with_layout_constraint
        x = with_layout_constraint(x, Layout((0, 1, 2)))
    t = min(block_t, l)
    if t < l:
        t -= t % 8          # Mosaic sublane alignment (whole-axis exempt)
        t = max(t, 8)
    h_dim = enc_kernel.shape[1]
    h_pad = _round_up(h_dim, 128)
    n_layers = len(layers)
    with_glu = glu in ("half1", "half2", "full")

    from sparsernns_tpu.ops.intdot import weight_colsum
    from sparsernns_tpu.ops.pallas.fused_layer import colsum_names

    # colsum operand names for the int8-MXU dots — uniform across layers
    # (the engine's eligibility check enforces all-or-none)
    st0 = statics[0]
    cs_names = colsum_names(glu, mixer_in16=st0.mixer_in16,
                            state16=st0.state16,
                            block_requant=st0.block_requant,
                            out2_in=st0.out2_in_scale,
                            out1_in=st0.out1_in_scale)
    layer_names = list(_LAYER_BASE)
    if with_glu:
        layer_names += ["out2_k", "out2_b"]
    if glu == "full":
        layer_names += ["out1_k", "out1_b"]
    layer_names += cs_names

    # ---- pad operands to the kernel geometry (weights only: tiny) ----
    enc_k = jnp.pad(enc_kernel, ((0, 0), (0, h_pad - h_dim)))
    enc_b = jnp.pad(enc_bias.astype(jnp.float32),
                    (0, h_pad - h_dim))[None, :]
    dec_k = jnp.pad(dec_kernel, ((0, h_pad - h_dim), (0, 0)))
    dec_b = dec_bias.astype(jnp.float32)[None, :]
    cs_enc = (weight_colsum(enc_k)[None, :]
              if enc_in_scale is not None and enc_in_scale[1] > 8 else None)
    cs_dec = (weight_colsum(dec_k)[None, :]
              if dec_in_scale is not None and dec_in_scale[1] > 8 else None)

    def prep(t_eff):
        flat, p_pads, num_passes = [], [], None
        for lay in layers:
            out2 = ((lay["out2_kernel"], lay["out2_bias"])
                    if with_glu else None)
            out1 = ((lay["out1_kernel"], lay["out1_bias"])
                    if glu == "full" else None)
            ops, p_pad, np_ = pad_layer_ops(
                lay["lam"], lay["w_b"], lay["w_c"], lay["d"],
                lay["norm_w"], lay["norm_b"], out2, out1, h_pad, t_eff,
                colsums=cs_names)
            num_passes = np_
            p_pads.append(p_pad)
            flat.extend(ops[n_] for n_ in layer_names)
        return flat, p_pads, num_passes

    kw = dict(enc_scale=enc_scale, dec_scale=dec_scale,
              enc_in=enc_in_scale, dec_in=dec_in_scale,
              enc_out=enc_out_requant, dec_out=dec_out_requant,
              prenorm=prenorm,
              relufication=relufication, glu=glu, relu_state=relu_state,
              act_dtype=act_dtype, out_dtype=out_dtype,
              interpret=interpret,
              cs_enc=cs_enc, cs_dec=cs_dec, rows=rows)

    main_rows = (l // t) * t
    tail = l - main_rows

    if main_rows:
        flat, p_pads, num_passes = prep(t)
        out, carries = _net_call(
            x, enc_k, enc_b, dec_k, dec_b, flat, layer_names,
            p_pads, num_passes, statics, None,
            t=t, carry_out=tail > 0, **kw)
        if not tail:
            return out
    else:
        carries = None

    # ---- tail: one whole-axis block for the L % t remainder ----------
    x_tail = jax.lax.slice_in_dim(x, main_rows, l, axis=1)
    flat_t, p_pads_t, num_passes_t = prep(tail)
    if carries is None and main_rows == 0:
        carries = [(jnp.zeros((b, 1, p), jnp.float32),
                    jnp.zeros((b, 1, p), jnp.float32)) for p in p_pads_t]
    out_tail, _ = _net_call(
        x_tail, enc_k, enc_b, dec_k, dec_b, flat_t, layer_names,
        p_pads_t, num_passes_t, statics, carries,
        t=tail, carry_out=False, **kw)
    if not main_rows:
        return out_tail
    res = jax.lax.dynamic_update_slice(out, out_tail, (0, main_rows, 0))
    if not interpret:
        from jax.experimental.layout import Layout, with_layout_constraint
        res = with_layout_constraint(res, Layout((0, 1, 2)))
    return res
