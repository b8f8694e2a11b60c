"""Fixed-point (integer) inference engine for the S5 stack.

Capability parity with the reference `sparseRNNs/fxpmodel.py` (FxpDense,
FxpSSM with integer recurrence, FxpBatchNorm, FxpSigmoid LUT,
FxpSequenceLayer, FxpStackedEncoderModel, FxpRegression/Classification
models, per-module export of params+config+intermediates).

Design: plain dataclasses holding FxpArray weights with STATIC
(bits, exp, signed) configs — every forward is jit-compilable, and the
integer recurrence runs as pure shift/multiply int32 ops under `lax.scan`
(reference fxpmodel.py:147-208). The engine's role is bit-exact
verification of the quantized TPU kernels and export for integer NPUs;
the serving path is the Pallas kernels.

Specs are derived from a calibrated static-quant checkpoint by
`sparsernns_tpu.fxp.derive` (the fxputils.py replacement).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.fxp.array import (ComplexFxpArray, FxpArray, RoundingMode,
                                      fxp_add, fxp_change_cfg, fxp_from_fp,
                                      fxp_matmul, fxp_mul, fxp_relu,
                                      fxp_relu_top_k, fxp_rshift_round,
                                      fxp_top_k)


@dataclasses.dataclass(frozen=True)
class FxpSpec:
    """Static fixed-point format: value = int(data) / 2^exp, int has
    ``bits`` bits, two's complement if signed."""

    bits: int
    exp: int
    signed: bool = True

    def quantize(self, x: jax.Array,
                 round_mode: RoundingMode = RoundingMode.ROUND) -> FxpArray:
        return fxp_from_fp(x, self.bits, self.exp, self.signed, round_mode)

    def cast(self, x: FxpArray,
             round_mode: RoundingMode = RoundingMode.ROUND) -> FxpArray:
        # ROUND default: matches the float static-quant path's
        # round-to-nearest (hardware exports preferring floor shifts can
        # pass FLOOR explicitly)
        return fxp_change_cfg(x, self.bits, self.exp, self.signed, round_mode)


def spec_for(x: np.ndarray | jax.Array, bits: int,
             signed: bool = True) -> FxpSpec:
    """Best exponent for representing ``x`` in ``bits`` bits.

    Uses the SAME symmetric power-of-2 rule as the float static-quant path
    (quantize.static.calculate_qparams: scale = pow2_round(absmax/qmax)),
    so fxp weight grids are bit-identical to the dequantized int weights
    the flax/engine paths compute — a grid mismatch here dominated the
    fxp-vs-static verification error. (The reference's fxputils uses an
    intbits/fracbits formulation, fxputils.py:67-80; pow2-rounding of
    absmax/qmax is the same quantity up to the rounding convention, and we
    pick the convention that matches our own calibration.)
    """
    # pure numpy: engine/fxp packing is HOST-side and must not round-trip
    # through the device (some transports cannot read back — the jnp.max
    # here made build_fxp_model fail on the real TPU)
    absmax = float(np.max(np.abs(np.asarray(x))))
    if absmax == 0.0 or not np.isfinite(absmax):
        return FxpSpec(bits, bits - 1 if signed else bits, signed)
    qmax = 2.0 ** (bits - 1) - 1.0
    exp = -int(round(np.log2(absmax / qmax)))
    return FxpSpec(bits, max(0, exp), signed)


def exp_from_scale(scale: float, clamp_min: int = 0) -> int:
    """Power-of-2 quantization scale -> fxp exponent (scale = 2^-exp).
    Reference: load_modeldict's log2 of scales (fxputils.py:121-134)."""
    return max(clamp_min, int(round(-np.log2(float(scale)))))


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class FxpModule:
    """Base: intermediates capture for the verification Reporter
    (reference FxpModule fxpmodel.py:260-289)."""

    def __init__(self):
        self.intermediates: Dict[str, Any] = {}
        self.store_intermediates = False

    def sow(self, name: str, value):
        if self.store_intermediates:
            if isinstance(value, FxpArray):
                value = value.to_float()
            elif isinstance(value, ComplexFxpArray):
                value = value.to_float()
            self.intermediates[name] = value

    def set_store_intermediates(self, on: bool):
        self.store_intermediates = on
        for child in self.__dict__.values():
            if isinstance(child, FxpModule):
                child.set_store_intermediates(on)
            elif isinstance(child, (list, tuple)):
                for c in child:
                    if isinstance(c, FxpModule):
                        c.set_store_intermediates(on)

    def collect_intermediates(self, prefix: str = "") -> Dict[str, Any]:
        out = {f"{prefix}{k}": v for k, v in self.intermediates.items()}
        for name, child in self.__dict__.items():
            if isinstance(child, FxpModule):
                out.update(child.collect_intermediates(f"{prefix}{name}."))
            elif isinstance(child, (list, tuple)):
                for i, c in enumerate(child):
                    if isinstance(c, FxpModule):
                        out.update(
                            c.collect_intermediates(f"{prefix}{name}_{i}."))
        return out

    def export(self) -> Dict[str, Any]:
        """Self-describing export bundle (int data + specs)."""
        out = {"type": type(self).__name__}
        for name, val in self.__dict__.items():
            if isinstance(val, FxpArray):
                out[name] = {"data": np.asarray(val.data), "bits": val.bits,
                             "exp": val.exp, "signed": val.signed}
            elif isinstance(val, ComplexFxpArray):
                out[name] = {
                    "real": {"data": np.asarray(val.real.data),
                             "bits": val.real.bits, "exp": val.real.exp},
                    "imag": {"data": np.asarray(val.imag.data),
                             "bits": val.imag.bits, "exp": val.imag.exp}}
            elif isinstance(val, FxpSpec):
                out[name] = dataclasses.asdict(val)
            elif isinstance(val, FxpModule):
                out[name] = val.export()
            elif isinstance(val, list) and val and isinstance(val[0], FxpModule):
                out[name] = [m.export() for m in val]
        return out


class FxpDense(FxpModule):
    """Integer dense: y = requant(x_q @ W_q + bias).
    Reference: FxpDense fxpmodel.py:292-393."""

    #: headroom above the OUTPUT grid kept in the 32-bit accumulator:
    #: saturation kicks in at |value| = 2^(31 - out.exp - GUARD). The
    #: naive acc exp (in.exp + w.exp) reaches 31 at w16a16 — zero
    #: headroom, every pre-requant value >= 1.0 clipped (cost the
    #: w16a16 fxp engine 1.3 dB before the round-3 sweep caught it).
    ACC_GUARD_BITS = 12

    def __init__(self, kernel: np.ndarray, bias: Optional[np.ndarray],
                 in_spec: FxpSpec, w_bits: int, out_spec: FxpSpec):
        super().__init__()
        self.in_spec = in_spec
        self.out_spec = out_spec
        w_spec = spec_for(kernel, w_bits)
        self.w = w_spec.quantize(np.asarray(kernel))
        self.acc_exp = min(in_spec.exp + w_spec.exp,
                           out_spec.exp + self.ACC_GUARD_BITS)
        self.bias = (fxp_from_fp(np.asarray(bias), 32, self.acc_exp,
                                 round_mode=RoundingMode.ROUND)
                     if bias is not None else None)

    def __call__(self, x: FxpArray) -> FxpArray:
        x = self.in_spec.cast(x)
        self.sow("input", x)
        acc = fxp_matmul(x, self.w, result_bits=32,
                         result_exp=self.acc_exp)
        if self.bias is not None:
            acc = fxp_add(acc, self.bias, result_bits=32)
        y = self.out_spec.cast(acc)
        self.sow("output", y)
        return y


class FxpBatchNorm(FxpModule):
    """Folded inference batchnorm: y = w ⊙ x + b with w = γ/√(σ²+ε),
    b = β − μ·w, both pre-quantized. Reference: FxpBatchNorm
    fxpmodel.py:850-968 (incl. its NaN-patching of degenerate stats)."""

    def __init__(self, mean, var, scale, bias, eps: float,
                 in_spec: FxpSpec, out_spec: FxpSpec, w_bits: int = 16):
        super().__init__()
        w = np.asarray(scale) / np.sqrt(np.asarray(var) + eps)
        b = np.asarray(bias) - np.asarray(mean) * w
        w = np.nan_to_num(w, nan=1.0, posinf=1.0, neginf=1.0)
        b = np.nan_to_num(b, nan=0.0)
        self.w = spec_for(w, w_bits).quantize(np.asarray(w))
        self.b_spec = spec_for(b, 16)
        self.b = self.b_spec.quantize(np.asarray(b))
        self.in_spec = in_spec
        self.out_spec = out_spec

    def __call__(self, x: FxpArray) -> FxpArray:
        x = self.in_spec.cast(x)
        wx = fxp_mul(x, self.w, result_exp=self.out_spec.exp,
                     result_bits=32, round_mode=RoundingMode.ROUND)
        y = fxp_add(wx, self.b, result_bits=32)
        y = self.out_spec.cast(y)
        self.sow("output", y)
        return y


class FxpSigmoid(FxpModule):
    """Piecewise-linear integer sigmoid LUT with interpolation.
    Reference: FxpSigmoid fxpmodel.py:70-144 (8-entry interpolated); here
    segments of width 2^-half_log2 over [-RANGE, RANGE) (default 32
    half-width segments — max PWL error ~3e-3)."""

    RANGE = 8  # segments cover [-RANGE, RANGE)

    def __init__(self, out_spec: FxpSpec, half_log2: int = 1):
        super().__init__()
        assert not out_spec.signed or out_spec.exp <= out_spec.bits - 1
        self.out_spec = out_spec
        self.half_log2 = half_log2  # width = 2^-half_log2
        width = 2.0 ** -half_log2
        edges = np.arange(-self.RANGE, self.RANGE + width / 2, width)
        vals = 1.0 / (1.0 + np.exp(-edges))
        y0 = vals[:-1]
        slope = vals[1:] - vals[:-1]  # per segment
        e = out_spec.exp
        self.y0 = np.round(y0 * (1 << e)).astype(np.int32)
        self.slope = np.round(slope * (1 << e)).astype(np.int32)

    def __call__(self, x: FxpArray) -> FxpArray:
        k = self.half_log2
        n_seg = 2 * self.RANGE << k
        if x.exp < k:  # too coarse for sub-unit segments: widen first
            x = fxp_change_cfg(x, max(x.bits, 16), k + 2, x.signed)
        shift = x.exp - k  # fractional bits within a segment
        offset = self.RANGE << k
        # saturate the input to the table domain so out-of-range values
        # don't extrapolate past the last segment
        lo = -(self.RANGE << x.exp)
        hi = (self.RANGE << x.exp) - 1
        data = jnp.clip(x.data, lo, hi)
        idx = (data >> shift) + offset
        idx = jnp.clip(idx, 0, n_seg - 1)
        frac = data - ((idx - offset) << shift)  # in [0, 2^shift)
        # tables are stored as numpy (host-side packing; model.py keeps
        # ALL module constants off-device so tracing never needs a
        # readback) — jnp.asarray here embeds them at trace time
        y0 = jnp.asarray(self.y0)
        slope = jnp.asarray(self.slope)
        y = y0[idx] + fxp_rshift_round(
            slope[idx] * frac, shift, RoundingMode.ROUND)
        out = FxpArray(y, self.out_spec.bits, self.out_spec.exp,
                       self.out_spec.signed).clip()
        self.sow("output", out)
        return out


@dataclasses.dataclass(frozen=True)
class FxpSSMSpecs:
    """Formats for every tensor in the integer SSM."""

    a: Tuple[FxpSpec, FxpSpec]       # Λ̄ re/im
    b: Tuple[FxpSpec, FxpSpec]       # B̄ weights re/im (separate grids —
                                     # matching FakeQuantComplex, which
                                     # calibrates re/im per-tensor scales
                                     # independently; a shared grid made
                                     # the cancellation-heavy B̄u product
                                     # diverge ~15% from the static path)
    c: Tuple[FxpSpec, FxpSpec]       # C weights re/im
    d: FxpSpec                        # D
    u: FxpSpec                        # input activations
    bu: Tuple[FxpSpec, FxpSpec]      # B̄u re/im
    x: Tuple[FxpSpec, FxpSpec]       # state re/im
    y: FxpSpec                        # output activations


class FxpSSM(FxpModule):
    """Integer S5: B̄u matmuls, shift/mul recurrence under lax.scan, C/D
    application. Reference: FxpSSM fxpmodel.py:426-793 (discretize in
    float, quantize Ā/B̄/C/D, integer recurrent loop, BN fusion)."""

    def __init__(self, lam_bar: Tuple[np.ndarray, np.ndarray],
                 b_bar: Tuple[np.ndarray, np.ndarray],
                 c_tilde: Tuple[np.ndarray, np.ndarray],
                 d: np.ndarray, specs: FxpSSMSpecs, conj_sym: bool = True,
                 relufication: bool = False,
                 d_bias: Optional[np.ndarray] = None,
                 topk: float = 1.0):
        super().__init__()
        self.specs = specs
        self.conj_sym = conj_sym
        self.relufication = relufication
        self.topk = topk
        self.a = ComplexFxpArray(
            real=specs.a[0].quantize(np.asarray(lam_bar[0])),
            imag=specs.a[1].quantize(np.asarray(lam_bar[1])))
        # store transposed for (L, H) @ (H, P) matmuls
        self.b_re = specs.b[0].quantize(np.asarray(b_bar[0].T))
        self.b_im = specs.b[1].quantize(np.asarray(b_bar[1].T))
        self.c_re = specs.c[0].quantize(np.asarray(c_tilde[0].T))
        self.c_im = specs.c[1].quantize(np.asarray(c_tilde[1].T))
        self.d = specs.d.quantize(np.asarray(d))
        self.d_bias = (spec_for(d_bias, 16).quantize(np.asarray(d_bias))
                       if d_bias is not None else None)

    def __call__(self, u: FxpArray) -> Tuple[FxpArray, ComplexFxpArray]:
        sp = self.specs
        u = sp.u.cast(u)
        self.sow("input", u)

        # ROUND (not FLOOR) matches the float static-quant path's
        # round-to-nearest quant-dequant; floor bias would be amplified by
        # the resonant recurrence (gain ~1/(1-|λ|)).
        bu_re = fxp_matmul(u, self.b_re, result_bits=sp.bu[0].bits,
                           result_exp=sp.bu[0].exp,
                           round_mode=RoundingMode.ROUND)
        bu_im = fxp_matmul(u, self.b_im, result_bits=sp.bu[1].bits,
                           result_exp=sp.bu[1].exp,
                           round_mode=RoundingMode.ROUND)
        self.sow("Bu", ComplexFxpArray(bu_re, bu_im))

        # Integer recurrence x_t = requant(Ā ⊙ x_{t-1}) + bu_t under scan.
        # All shifts are static; data is int32.
        a_re, a_im = self.a.real, self.a.imag
        x_re_exp, x_im_exp = sp.x[0].exp, sp.x[1].exp
        time_axis = bu_re.data.ndim - 2
        bu_r = jnp.moveaxis(bu_re.data, time_axis, 0)
        bu_i = jnp.moveaxis(bu_im.data, time_axis, 0)
        # align bu to state exps
        dr = x_re_exp - sp.bu[0].exp
        di = x_im_exp - sp.bu[1].exp
        bu_r = (bu_r << dr if dr >= 0
                else fxp_rshift_round(bu_r, -dr, RoundingMode.ROUND))
        bu_i = (bu_i << di if di >= 0
                else fxp_rshift_round(bu_i, -di, RoundingMode.ROUND))

        minv_r, maxv_r = -(1 << (sp.x[0].bits - 1)), (1 << (sp.x[0].bits - 1)) - 1
        minv_i, maxv_i = -(1 << (sp.x[1].bits - 1)), (1 << (sp.x[1].bits - 1)) - 1

        # Guard bits: accumulate each step's complex sum at g extra
        # fractional bits and round ONCE — matching the float static-quant
        # path, which quant-dequants the full step result once per step
        # (ssm.py:287-310); rounding each of the 4 products separately
        # compounds through the resonant recurrence. g chosen so
        # a·x >> (a_exp-g) and bu << g stay within int32: each of the
        # three accumulands is bounded by 2^(bits-1+g), so the int32
        # budget is g <= 29 - bits (three terms < 2^31). Near-resonant
        # channels (|λ|→1, gain ~1/(1-|λ|)) amplify per-step rounding
        # differences, so run at the largest affordable guard (was
        # capped at 8: max rel error vs the static-quant emulation ~11%;
        # 12 guard bits brings the worst channel under ~3%).
        g_re = max(0, min(12, a_re.exp, 29 - sp.x[0].bits))
        g_im = max(0, min(12, a_im.exp, 29 - sp.x[1].bits))
        g = min(g_re, g_im)

        def step(carry, bu_t):
            xr, xi = carry
            rnd = RoundingMode.ROUND
            prod_rr = (a_re.data * xr) >> (a_re.exp - g)
            prod_ii = (a_im.data * xi) >> (a_im.exp - g)
            prod_ri = (a_re.data * xi) >> (a_re.exp - g)
            prod_ir = (a_im.data * xr) >> (a_im.exp - g)
            acc_r = prod_rr - prod_ii + (bu_t[0] << g)
            acc_i = prod_ri + prod_ir + (bu_t[1] << g)
            new_r = jnp.clip(fxp_rshift_round(acc_r, g, rnd),
                             minv_r, maxv_r)
            new_i = jnp.clip(fxp_rshift_round(acc_i, g, rnd),
                             minv_i, maxv_i)
            return (new_r, new_i), (new_r, new_i)

        x0 = (jnp.zeros_like(bu_r[0]), jnp.zeros_like(bu_i[0]))
        _, (xs_r, xs_i) = jax.lax.scan(step, x0, (bu_r, bu_i))
        xs_r = jnp.moveaxis(xs_r, 0, time_axis)
        xs_i = jnp.moveaxis(xs_i, 0, time_axis)
        xs = ComplexFxpArray(
            FxpArray(xs_r, sp.x[0].bits, x_re_exp),
            FxpArray(xs_i, sp.x[1].bits, x_im_exp))
        if self.relufication:
            if self.topk < 1.0:
                # per-component relu_top_k on the states, matching the
                # float path (models/ssm.py:299-303 / engine
                # state_activation)
                k = int(self.topk * xs.real.data.shape[-1])
                xs = fxp_relu_top_k(xs, k)
            else:
                xs = fxp_relu(xs)
        # sown post-relufication: matches the flax model's pre_C sow
        self.sow("states", xs)

        yc_re = fxp_matmul(xs.real, self.c_re, result_bits=32,
                           result_exp=sp.y.exp + 1,
                           round_mode=RoundingMode.ROUND)
        yc_im = fxp_matmul(xs.imag, self.c_im, result_bits=32,
                           result_exp=sp.y.exp + 1,
                           round_mode=RoundingMode.ROUND)
        y = FxpArray(yc_re.data - yc_im.data, 32, sp.y.exp + 1)
        if self.conj_sym:
            y = FxpArray(y.data << 1, 32, y.exp)

        du = fxp_mul(self.d, u, result_exp=y.exp, result_bits=32,
                     round_mode=RoundingMode.ROUND)
        y = fxp_add(y, du, result_bits=32)
        if self.d_bias is not None:
            y = fxp_add(y, self.d_bias, result_bits=32)
        y = sp.y.cast(y)
        self.sow("output", y)
        return y, xs


class FxpSequenceLayer(FxpModule):
    """norm -> SSM -> relu -> GLU gate -> residual (+ relufication).
    Reference: FxpSequenceLayer fxpmodel.py:971-1207."""

    def __init__(self, ssm: FxpSSM, norm: Optional[FxpBatchNorm],
                 out2: Optional[FxpDense], out1: Optional[FxpDense],
                 glu_variant: str, act_spec: FxpSpec,
                 relufication: bool = True, prenorm: bool = True,
                 mult_specs: Optional[Tuple[FxpSpec, FxpSpec]] = None,
                 topk: float = 1.0):
        super().__init__()
        self.ssm = ssm
        self.norm = norm
        self.out1 = out1
        self.out2 = out2
        self.glu_variant = glu_variant
        self.act_spec = act_spec
        self.relufication = relufication
        self.prenorm = prenorm
        self.topk = topk
        # Calibrated formats for the GLU multiply's operands: the static
        # path's QuantizedMultiply quantizes BOTH operands on frozen
        # per-tensor grids (quant_left/quant_right) — including the CLIP
        # at the calibrated absmax. Skipping that clip made the fxp layer
        # output diverge ~11% wherever the value stream exceeded the
        # calibration range (the round-1 worst-case error).
        self.mult_specs = mult_specs
        self.sigmoid = (FxpSigmoid(FxpSpec(act_spec.bits,
                                           min(act_spec.bits - 1, 14),
                                           signed=False))
                        if glu_variant in ("full", "half1", "half2")
                        else None)

    def __call__(self, x: FxpArray) -> FxpArray:
        skip = self.act_spec.cast(x)
        self.sow("input", skip)
        if self.norm is not None and self.prenorm:
            x = self.norm(skip)
        else:
            x = skip
        y, _ = self.ssm(x)

        if self.relufication and self.topk < 1.0:
            # relu_top_k on the GLU input, matching layers._glu_act /
            # engine_layer_forward's x1 site
            x1 = fxp_relu_top_k(y, int(self.topk * y.data.shape[-1]))
        elif self.relufication:
            x1 = fxp_relu(y)
        else:
            x1 = y
        self.sow("pre_GLU", x1)

        def mult(left, g):
            if self.mult_specs is not None:
                left = self.mult_specs[0].cast(left)
                g = self.mult_specs[1].cast(g)
            return fxp_mul(left, g, result_exp=self.act_spec.exp,
                           result_bits=self.act_spec.bits,
                           round_mode=RoundingMode.ROUND)

        if self.glu_variant == "full":
            x = mult(self.out1(x1), self.sigmoid(self.out2(x1)))
        elif self.glu_variant == "half1":
            x = mult(x1, self.sigmoid(self.out2(x1)))
        elif self.glu_variant == "half2":
            x = mult(y, self.sigmoid(self.out2(x1)))
        else:
            x = self.act_spec.cast(x1)

        x = fxp_add(x, skip, result_bits=self.act_spec.bits + 1,
                    result_exp=self.act_spec.exp)
        if self.norm is not None and not self.prenorm:
            x = self.norm(x)
        if self.relufication:
            x = fxp_relu(x)
        if self.topk < 1.0:
            # layer-output top_k (post-relu, pre-requant) — matching
            # layers.py's residual-tail site / engine_layer_forward
            x = fxp_top_k(x, int(self.topk * x.data.shape[-1]))
        x = self.act_spec.cast(x)
        self.sow("output", x)
        return x


class FxpStackedEncoder(FxpModule):
    """Encoder dense + N sequence layers.
    Reference: FxpStackedEncoderModel fxpmodel.py:1210-1289."""

    def __init__(self, encoder: FxpDense, layers: List[FxpSequenceLayer],
                 relufication: bool = True, topk: float = 1.0):
        super().__init__()
        self.encoder = encoder
        self.layers = layers
        self.relufication = relufication
        self.topk = topk

    def __call__(self, x: FxpArray) -> FxpArray:
        x = self.encoder(x)
        if self.topk < 1.0:
            # top-k implies relu at the encoder output (seq_model.py's
            # topk_op / engine_encode)
            x = fxp_relu_top_k(x, int(self.topk * x.data.shape[-1]))
        elif self.relufication:
            x = fxp_relu(x)
        for layer in self.layers:
            x = layer(x)
        return x


class FxpRegressionModel(FxpModule):
    """Integer NDNS head: encoder stack + per-step decoder.
    Reference: FxpRegressionModel fxpmodel.py:1380-1458."""

    def __init__(self, encoder: FxpStackedEncoder, decoder: FxpDense,
                 in_spec: FxpSpec):
        super().__init__()
        self.encoder = encoder
        self.decoder = decoder
        self.in_spec = in_spec

    def __call__(self, x) -> FxpArray:
        if not isinstance(x, FxpArray):
            x = self.in_spec.quantize(x)
        self.sow("input", x)
        x = self.encoder(x)
        out = self.decoder(x)
        self.sow("output", out)
        return out


class FxpClassificationModel(FxpModule):
    """Integer classifier: encoder stack + meanpool + decoder +
    integer log-softmax. The reference's fxp_log_softmax is an
    unimplemented stub (fxparray.py:698-701); here it is a real integer
    implementation (LUT exp + integer-MSB log, fxp_log_softmax), so the
    output matches the flax ClassificationModel's log-probs in VALUE,
    not just argmax. Reference: FxpClassificationModel
    fxpmodel.py:1292-1377."""

    def __init__(self, encoder: FxpStackedEncoder, decoder: FxpDense,
                 in_spec: FxpSpec, log_softmax: bool = True):
        super().__init__()
        self.encoder = encoder
        self.decoder = decoder
        self.in_spec = in_spec
        self.log_softmax = log_softmax

    def __call__(self, x) -> FxpArray:
        if not isinstance(x, FxpArray):
            x = self.in_spec.quantize(x)
        x = self.encoder(x)
        from sparsernns_tpu.fxp.array import fxp_log_softmax, fxp_mean
        x = fxp_mean(x, axis=x.ndim - 2)
        out = self.decoder(x)
        if self.log_softmax:
            out = fxp_log_softmax(out)
        self.sow("output", out)
        return out
