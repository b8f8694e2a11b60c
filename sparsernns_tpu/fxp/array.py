"""Fixed-point integer tensor emulation — the bit-exact verification
substrate.

Capability parity with the reference `sparseRNNs/fxparray.py` (FxpArray /
ComplexFxpArray: int32 data + static (bits, exp, signed) config, shift-round
in FLOOR/CEIL/ROUND modes, add/sub/mul/matmul/change_exp/change_cfg with
overflow clipping, int64 escalation when products would overflow).

Design differences:
- (bits, exp, signed) are static Python ints — every op is jit-compatible
  and the integer arithmetic lowers to XLA int ops (these run on TPU too,
  though the fxp engine's role in this framework is *bit-exact golden
  verification* of the real int8/int16 Pallas kernels, not the serving
  path — see SURVEY.md §7 design stance).
- Overflow handling is always clip-to-range (the reference warns via host
  logging inside jit-incompatible code paths; here `fxp_overflow_count`
  offers the same diagnostic as a traced value).
- Product dtype escalation to int64 is decided statically from the operand
  bit-widths instead of from runtime data (reference fxparray.py:611-616
  inspects values; static is both safer and traceable). The widening is
  REAL regardless of the global x64 setting: the widening ops run under a
  local `jax.enable_x64(True)` context (without it, astype(int64)
  silently stays int32 and 16x16-bit matmul accumulators WRAP — cost the
  w16a16 fxp engine 1.3 dB SI-SNR before the round-3 sweep caught it).
"""

from __future__ import annotations

import contextlib

import dataclasses
import enum
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class RoundingMode(enum.Enum):
    FLOOR = 0
    CEIL = 1
    ROUND = 2
    STOCHASTIC = 3


def round_array(x: Array, round_mode: RoundingMode = RoundingMode.FLOOR,
                dtype=jnp.int32) -> Array:
    # numpy stays numpy: module packing is HOST-side and must not create
    # device arrays (closure-captured device constants need a
    # device->host readback at trace time, which some transports cannot
    # do — this broke build_fxp_model + jit on the real TPU)
    xp = np if isinstance(x, np.ndarray) else jnp
    if round_mode == RoundingMode.ROUND:
        return xp.round(x).astype(dtype)
    if round_mode == RoundingMode.CEIL:
        return xp.ceil(x).astype(dtype)
    if round_mode == RoundingMode.FLOOR:
        return xp.floor(x).astype(dtype)
    raise NotImplementedError(f"rounding mode {round_mode}")


def fxp_rshift_round(x: Array, rshift: int,
                     round_mode: RoundingMode = RoundingMode.FLOOR) -> Array:
    """Arithmetic right shift with rounding (reference fxparray.py:274-284)."""
    if rshift == 0:
        return x
    if round_mode == RoundingMode.FLOOR:
        return x >> rshift
    if round_mode == RoundingMode.CEIL:
        return (x + (1 << rshift) - 1) >> rshift
    if round_mode == RoundingMode.ROUND:
        # round-half-to-EVEN, matching jnp.round: the float static-quant
        # emulation this engine verifies against rounds ties to even, and
        # on pow2 grids exact ties are common — half-up here would make
        # the two realizations diverge by 1 LSB at every tie, which the
        # near-resonant recurrence then preserves (this was the dominant
        # term of the fxp-vs-static max error).
        half = jnp.asarray(1 << (rshift - 1), x.dtype)
        q = (x + half) >> rshift
        tie = (x & ((1 << rshift) - 1)) == half
        return jnp.where(tie, q - (q & 1), q)
    raise NotImplementedError(f"rounding mode {round_mode}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FxpArray:
    """Integer tensor with fixed-point interpretation value = data / 2^exp."""

    data: Array
    bits: int = dataclasses.field(metadata=dict(static=True), default=16)
    exp: int = dataclasses.field(metadata=dict(static=True), default=8)
    signed: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def minval(self) -> int:
        return -(1 << (self.bits - 1)) if self.signed else 0

    def maxval(self) -> int:
        return (1 << (self.bits - 1)) - 1 if self.signed else (1 << self.bits) - 1

    def to_float(self) -> Array:
        return self.data.astype(jnp.float32) / (1 << self.exp)

    def clip(self) -> "FxpArray":
        # numpy stays numpy (host-side packing; see round_array)
        xp = np if isinstance(self.data, np.ndarray) else jnp
        return FxpArray(
            data=xp.clip(self.data, self.minval(), self.maxval()),
            bits=self.bits, exp=self.exp, signed=self.signed)

    def overflow_count(self) -> Array:
        return jnp.sum((self.data > self.maxval()) | (self.data < self.minval()))

    def change_exp(self, new_exp: int,
                   round_mode: RoundingMode = RoundingMode.FLOOR) -> "FxpArray":
        return fxp_change_exp(self, new_exp, round_mode)

    def change_cfg(self, new_bits: int, new_exp: int, new_signed: bool,
                   round_mode: RoundingMode = RoundingMode.FLOOR) -> "FxpArray":
        return fxp_change_cfg(self, new_bits, new_exp, new_signed, round_mode)

    def astype_wide(self) -> "FxpArray":
        return FxpArray(self.data.astype(_wide_dtype()), self.bits, self.exp,
                        self.signed)

    def __add__(self, other):
        return fxp_add(self, other)

    def __sub__(self, other):
        return fxp_sub(self, other)

    def __mul__(self, other):
        return fxp_mul(self, other)

    def __matmul__(self, other):
        return fxp_matmul(self, other)

    def __getitem__(self, idx):
        return FxpArray(self.data[idx], self.bits, self.exp, self.signed)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ComplexFxpArray:
    real: FxpArray
    imag: FxpArray

    @property
    def shape(self):
        return self.real.shape

    def to_float(self) -> Tuple[Array, Array]:
        return self.real.to_float(), self.imag.to_float()

    def __add__(self, other):
        return ComplexFxpArray(real=self.real + other.real,
                               imag=self.imag + other.imag)

    def __getitem__(self, idx):
        return ComplexFxpArray(self.real[idx], self.imag[idx])


def _wide_dtype():
    return jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32


def fxp_from_fp(x: Array, bits: int = 16, exp: int = 8, signed: bool = True,
                round_mode: RoundingMode = RoundingMode.FLOOR) -> FxpArray:
    """Quantize float -> fxp (reference fxparray.py:287-307). numpy in ->
    numpy out (host-side weight packing; see round_array)."""
    xp = np if isinstance(x, np.ndarray) else jnp
    xint = x * (1 << exp)
    if not signed:
        xint = xp.abs(xint)
    data = round_array(xint, round_mode)
    return FxpArray(data=data, bits=bits, exp=exp, signed=signed).clip()


def fxp_change_exp(arr: FxpArray, new_exp: int,
                   round_mode: RoundingMode = RoundingMode.FLOOR) -> FxpArray:
    if new_exp == arr.exp:
        return arr
    if new_exp > arr.exp:
        shift = new_exp - arr.exp
        # left-shifts can WRAP int32 before the clip can saturate them
        # (arr.bits + shift > 31); widen, clip in int64, downcast
        wide = arr.bits + shift > 31
        with _wide_ctx(wide):
            data = _to_wide(arr.data) if wide else arr.data
            data = data << shift
            if wide:
                out = FxpArray(data, arr.bits, new_exp, arr.signed).clip()
                return FxpArray(out.data.astype(jnp.int32), arr.bits,
                                new_exp, arr.signed)
    else:
        data = fxp_rshift_round(arr.data, arr.exp - new_exp, round_mode)
    return FxpArray(data, arr.bits, new_exp, arr.signed).clip()


def fxp_change_cfg(arr: FxpArray, new_bits: int, new_exp: int,
                   new_signed: bool,
                   round_mode: RoundingMode = RoundingMode.FLOOR) -> FxpArray:
    if (arr.bits, arr.exp, arr.signed) == (new_bits, new_exp, new_signed):
        return arr
    out = fxp_change_exp(arr, new_exp, round_mode)
    return FxpArray(out.data, new_bits, new_exp, new_signed).clip()


def fxp_add(op1: FxpArray, op2: FxpArray,
            result_bits: Optional[int] = None,
            result_bits_fn: Callable[[int, int], int] = max,
            result_bits_add: int = 0,
            result_exp: Optional[int] = None,
            round_mode: RoundingMode = RoundingMode.FLOOR) -> FxpArray:
    """Aligned integer addition (reference fxparray.py:386-473; the
    'compute_best' data-dependent exponent mode is intentionally excluded —
    exponents here always come from the calibration-derived config)."""
    result_signed = op1.signed or op2.signed
    if result_bits is None:
        result_bits = result_bits_fn(op1.bits, op2.bits) + result_bits_add
    if result_exp is None:
        result_exp = max(op1.exp, op2.exp)
        s1, s2 = result_exp - op1.exp, result_exp - op2.exp
        # aligned operands can reach bits+shift and their SUM one more
        # bit — int32 would wrap before the clip saturates
        wide = max(op1.bits + s1, op2.bits + s2) + 1 > 31
        with _wide_ctx(wide):
            a, b = op1.data, op2.data
            if wide:
                a, b = _to_wide(a), _to_wide(b)
            a = a << s1 if s1 else a
            b = b << s2 if s2 else b
            data = a + b
            if wide:
                out = FxpArray(data, result_bits, result_exp,
                               result_signed).clip()
                return FxpArray(out.data.astype(jnp.int32), result_bits,
                                result_exp, result_signed)
    else:
        # each change_exp result is clipped to its own bits; two 32-bit
        # codes can still overflow the int32 SUM
        wide = max(op1.bits, op2.bits) + 1 > 31
        with _wide_ctx(wide):
            a = fxp_change_exp(op1, result_exp, round_mode).data
            b = fxp_change_exp(op2, result_exp, round_mode).data
            if wide:
                a, b = _to_wide(a), _to_wide(b)
            data = a + b
            if wide:
                out = FxpArray(data, result_bits, result_exp,
                               result_signed).clip()
                return FxpArray(out.data.astype(jnp.int32), result_bits,
                                result_exp, result_signed)
    return FxpArray(data, result_bits, result_exp, result_signed).clip()


def fxp_sub(op1: FxpArray, op2: FxpArray, **kw) -> FxpArray:
    neg = FxpArray(-op2.data, op2.bits, op2.exp, signed=True)
    return fxp_add(op1, neg, **kw)


def _needs_wide(op1: FxpArray, op2: FxpArray) -> bool:
    """True when the product could overflow an int32 accumulator."""
    return op1.bits + op2.bits > 30


@contextlib.contextmanager
def _wide_ctx(needed: bool):
    """REAL int64 escalation even when jax_enable_x64 is globally off:
    without this context `astype(int64)` silently stays int32 and
    16x16-bit matmul accumulators WRAP — the w16a16 fxp engine lost
    1.3 dB SI-SNR to exactly that (round-3 multi-recipe quality sweep).
    The escaping results are astype(int32)'d inside, so no wide dtype
    leaks to callers."""
    if needed and not jax.config.read("jax_enable_x64"):
        with jax.enable_x64(True):
            yield
    else:
        yield


def _to_wide(x):
    """int64 view preserving numpy-ness (host-side packing must not
    create device arrays — see round_array). jnp casts only widen for
    real under _wide_ctx."""
    return x.astype(np.int64 if isinstance(x, np.ndarray) else jnp.int64)


def _maybe_widen(op1: FxpArray, op2: FxpArray):
    """Escalate the product dtype when operand widths could overflow i32.
    Call under ``_wide_ctx(_needs_wide(op1, op2))``."""
    if _needs_wide(op1, op2):
        return _to_wide(op1.data), _to_wide(op2.data)
    return op1.data, op2.data


def fxp_mul(op1: FxpArray, op2: FxpArray,
            result_exp: Optional[int] = None,
            result_exp_fn: Callable[[int, int], int] = max,
            result_bits: Optional[int] = None,
            result_bits_fn: Callable[[int, int], int] = max,
            round_mode: RoundingMode = RoundingMode.FLOOR) -> FxpArray:
    """Elementwise integer multiply then shift-round to the target exponent
    (reference fxparray.py:573-637)."""
    result_signed = op1.signed or op2.signed
    if result_bits is None:
        result_bits = result_bits_fn(op1.bits, op2.bits)
    if result_exp is None:
        result_exp = result_exp_fn(op1.exp, op2.exp)
    rshift = op1.exp + op2.exp - result_exp
    if rshift < 0:
        raise ValueError(f"invalid result_exp {result_exp} > "
                         f"{op1.exp} + {op2.exp}")
    with _wide_ctx(_needs_wide(op1, op2)):
        a, b = _maybe_widen(op1, op2)
        raw = a * b
        data = fxp_rshift_round(raw, rshift, round_mode).astype(jnp.int32)
    return FxpArray(data, result_bits, result_exp, result_signed).clip()


def fxp_matmul(op1: FxpArray, op2: FxpArray,
               result_bits: Optional[int] = None,
               result_bits_fn: Callable[[int, int], int] = max,
               result_exp: Optional[int] = None,
               result_exp_fn: Callable[[int, int], int] = max,
               round_mode: RoundingMode = RoundingMode.FLOOR) -> FxpArray:
    """Integer matmul with int32/int64 accumulation then shift-round
    (reference fxparray.py:640-678). On TPU the int matmul maps to the
    MXU's int8 path when widths permit."""
    result_signed = op1.signed or op2.signed
    if result_bits is None:
        result_bits = result_bits_fn(op1.bits, op2.bits)
    if result_exp is None:
        result_exp = result_exp_fn(op1.exp, op2.exp)
    with _wide_ctx(_needs_wide(op1, op2)):
        a, b = _maybe_widen(op1, op2)
        acc_dtype = jnp.result_type(a.dtype, b.dtype)
        raw = jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        rshift = op1.exp + op2.exp - result_exp
        if rshift < 0:
            raw = raw << -rshift
            data = raw.astype(jnp.int32)
        else:
            data = fxp_rshift_round(raw, rshift,
                                    round_mode).astype(jnp.int32)
    return FxpArray(data, result_bits, result_exp, result_signed).clip()


def fxp_complex_mul(op1: ComplexFxpArray, op2: ComplexFxpArray,
                    result_exp: Tuple[Optional[int], Optional[int]] = (None, None),
                    result_bits: Tuple[Optional[int], Optional[int]] = (None, None),
                    round_mode: RoundingMode = RoundingMode.FLOOR
                    ) -> ComplexFxpArray:
    """(a+bi)(c+di) as 4 real multiplies + aligned add/sub
    (reference fxparray.py:504-570)."""
    re_exp, im_exp = result_exp
    re_bits, im_bits = result_bits
    mul = lambda x, y, e, b: fxp_mul(x, y, result_exp=e, result_bits=b,
                                     result_bits_fn=max,
                                     round_mode=round_mode)
    ac = mul(op1.real, op2.real, re_exp, re_bits)
    bd = mul(op1.imag, op2.imag, re_exp, re_bits)
    ad = mul(op1.real, op2.imag, im_exp, im_bits)
    bc = mul(op1.imag, op2.real, im_exp, im_bits)
    real = fxp_sub(ac, bd, result_bits=re_bits, result_exp=re_exp,
                   round_mode=round_mode)
    imag = fxp_add(ad, bc, result_bits=im_bits, result_exp=im_exp,
                   round_mode=round_mode)
    return ComplexFxpArray(real=real, imag=imag)


def fxp_relu(x: Union[FxpArray, ComplexFxpArray]):
    """ReLU on fxp data; complex applies to re/im separately
    (reference fxpmodel.py:27-63)."""
    if isinstance(x, ComplexFxpArray):
        return ComplexFxpArray(real=fxp_relu(x.real), imag=fxp_relu(x.imag))
    return FxpArray(jnp.maximum(x.data, 0), x.bits, x.exp, x.signed)


def fxp_top_k(x: Union[FxpArray, ComplexFxpArray], k: int):
    """Keep the (approximately) k largest entries along the last axis,
    zero the rest — the integer analog of ops/topk.top_k_sparsity.

    Selection parity with the float path: the integer codes are a
    positive pow2 scaling of the float values the quantized model
    thresholds, so `approx_max_k` over the codes picks the same entries;
    the keep/zero compare itself runs on the integer codes (hardware: a
    compare against the k-th-max code). Codes at bits <= 24 cast to f32
    exactly. Complex applies per component (matching the model's
    per-component relu_top_k on states, models/ssm.py:299-303)."""
    if isinstance(x, ComplexFxpArray):
        return ComplexFxpArray(real=fxp_top_k(x.real, k),
                               imag=fxp_top_k(x.imag, k))
    if k >= x.data.shape[-1]:
        return x
    top_vals, _ = jax.lax.approx_max_k(x.data.astype(jnp.float32), k)
    thr = top_vals[..., -1:].astype(x.data.dtype)
    keep = jnp.where(x.data >= thr, x.data, jnp.zeros_like(x.data))
    return FxpArray(keep, x.bits, x.exp, x.signed)


def fxp_relu_top_k(x: Union[FxpArray, ComplexFxpArray], k: int):
    """relu(top_k(x)) — the integer ops/topk.relu_top_k_sparsity."""
    return fxp_relu(fxp_top_k(x, k))


def fxp_log_softmax(x: FxpArray, out_bits: int = 16,
                    out_exp: int = 10) -> FxpArray:
    """Integer log-softmax along the last axis.

    The reference's fxp_log_softmax is an unimplemented stub
    (fxparray.py:698-701, it returns its input); this is a real integer
    implementation: y_i = z_i − ln Σ exp(z_i) with z = x − max(x), built
    from compares, shifts, adds, and two piecewise-linear LUTs —
    exp(z) over [−16, 0] (width-2⁻³ segments) and log₂(m) over [1, 2)
    (width-2⁻⁵ segments) with the exponent of the sum extracted by pure
    integer MSB search. Max abs error vs the float log_softmax of the
    dequantized input ≈ the exp-LUT PWL error (~2e-3), far below the
    output grid of typical 16-bit heads.
    """
    e = x.exp
    ke = 3                       # exp-LUT segment width = 2^-ke
    r = 16                       # exp(z) ≈ 0 below z = -r
    se = 15                      # exp-LUT output frac bits (unsigned)
    if e < ke:                   # too coarse for the LUT segments
        # widen bits BY the exponent shift so large-magnitude logits are
        # not clipped by the recast (fxp_change_cfg saturates at the OLD
        # width before widening, which collapsed distinct logits >
        # 2^(bits-1-ke-2+e) to identical log-probs); int32 codes cap the
        # widening at 31 bits
        sh = ke + 2 - e
        x = FxpArray(x.data.astype(jnp.int32) << sh,
                     min(x.bits + sh, 31), ke + 2, x.signed).clip()
        e = x.exp

    # z = x - max(x) over the last axis (exact in integers), clipped to
    # the LUT domain [-r, 0]
    m = jnp.max(x.data, axis=-1, keepdims=True)
    z = x.data - m                               # <= 0
    z = jnp.maximum(z, -(r << e) + 1)

    # ---- exp LUT: exp(z_f), z_f in [-r, 0) -> (0, 1], frac bits se ----
    import numpy as np
    width = 2.0 ** -ke
    edges = np.arange(-r, 0 + width / 2, width)
    vals = np.exp(edges)
    y0 = np.round(vals[:-1] * (1 << se))
    slope = np.round((vals[1:] - vals[:-1]) * (1 << se))
    y0_t = jnp.asarray(y0, jnp.int32)
    slope_t = jnp.asarray(slope, jnp.int32)
    shift = e - ke                               # frac bits per segment
    idx = (z >> shift) + (r << ke)               # arithmetic shift: floor
    idx = jnp.clip(idx, 0, (r << ke) - 1)
    frac = z - ((idx - (r << ke)) << shift)      # in [0, 2^shift)
    ez = y0_t[idx] + fxp_rshift_round(
        slope_t[idx].astype(_wide_dtype()) * frac, shift,
        RoundingMode.ROUND).astype(jnp.int32)    # (..., N) at 2^-se

    # ---- s = sum exp(z): in [2^se, N * 2^se] ----
    # int32-safe for N <= 2^(31-se) = 65536 classes
    s = jnp.sum(ez.astype(_wide_dtype()), axis=-1, keepdims=True)
    s = jnp.maximum(s, 1)

    # ---- ln(s / 2^se) = (b - se + log2(mantissa)) * ln2 ----
    # MSB position b by integer compares (no float ops)
    n_lead = int(np.ceil(np.log2(max(2, x.data.shape[-1])))) + 1
    b = jnp.full_like(s, se)
    for i in range(se + 1, se + n_lead + 1):
        b = b + (s >= (1 << i)).astype(s.dtype)
    k2 = 5                       # log2-LUT segment width = 2^-k2
    edges2 = 1.0 + np.arange(0, (1 << k2) + 1) / (1 << k2)
    vals2 = np.log2(edges2)
    l2e = 14                     # log2-LUT output frac bits
    ly0 = jnp.asarray(np.round(vals2[:-1] * (1 << l2e)), jnp.int32)
    lslope = jnp.asarray(
        np.round((vals2[1:] - vals2[:-1]) * (1 << l2e)), jnp.int32)
    # normalize to a 15-bit mantissa FIRST so every later product stays
    # int32-safe regardless of b (a direct lslope * frac2 overflows for
    # heads past ~2k classes): mant in [2^14, 2^15)
    mbits = k2 + 10
    mant = s >> (b - (mbits - 1))
    idx2 = (mant >> (mbits - 1 - k2)) - (1 << k2)        # [0, 2^k2)
    idx2 = jnp.clip(idx2, 0, (1 << k2) - 1).astype(jnp.int32)
    frac2 = mant - ((idx2 + (1 << k2)).astype(s.dtype)
                    << (mbits - 1 - k2))                  # [0, 2^9)
    prod = lslope[idx2] * frac2.astype(jnp.int32)         # < 2^24
    log2m = ly0[idx2] + fxp_rshift_round(prod, mbits - 1 - k2,
                                         RoundingMode.ROUND)
    # ln s_f at frac bits l2e, split so both products stay in int32:
    # (b-se)*ln2 (integer part) + log2m*ln2 (fractional part)
    ln2_q = int(round(np.log(2.0) * (1 << 14)))  # ln2 at 14 frac bits
    assert l2e == 14
    ln_int = (b - se).astype(jnp.int32) * ln2_q           # frac bits 14
    ln_frac = fxp_rshift_round(log2m * ln2_q, 14, RoundingMode.ROUND)
    ln_s = ln_int + ln_frac

    # ---- y = z - ln(s), assembled at out_exp ----
    dz = out_exp - e
    z_o = (z.astype(_wide_dtype()) << dz if dz >= 0
           else fxp_rshift_round(z.astype(_wide_dtype()), -dz,
                                 RoundingMode.ROUND))
    dl = out_exp - l2e
    ln_o = (ln_s << dl if dl >= 0
            else fxp_rshift_round(ln_s, -dl, RoundingMode.ROUND))
    y = (z_o - ln_o).astype(jnp.int32)
    return FxpArray(y, out_bits, out_exp, True).clip()


def fxp_mean(x: FxpArray, axis: int = 0,
             round_mode: RoundingMode = RoundingMode.ROUND) -> FxpArray:
    """Mean via multiply by fxp(1/n) (reference fxparray.py:681-695)."""
    n = x.data.shape[axis]
    summed = jnp.sum(x.data.astype(_wide_dtype()), axis=axis)
    recn = fxp_from_fp(jnp.asarray(1.0 / n), bits=x.bits,
                       exp=max(x.exp, int(jnp.ceil(jnp.log2(n))) + 2),
                       signed=False)
    raw = summed * recn.data
    data = fxp_rshift_round(raw, recn.exp, round_mode).astype(jnp.int32)
    return FxpArray(data, x.bits, x.exp, x.signed).clip()
