"""The S5 SSM mixer, designed TPU-first.

Capability parity with the reference `sparseRNNs/model/ssm.py` (qS5SSM:
ZOH/bilinear discretization, conj-sym, clip_eigs, bidirectional,
relufication, approx top-k, QAT fake-quant ops, static-quant observers with
per-step state requantization, BatchNorm fusion into B̄/D), re-designed:

- **Natively batched**: inputs are (B, L, H); the reference vmaps a
  per-sample module. Complex B/C projections are each ONE real matmul
  against a stacked (H, 2P)/(2P, H) weight — the reference issues 4 real
  dots per projection per sample (ssm.py:116-124, :179-185). Big batched
  matmuls keep the MXU fed.
- **Complex-as-pairs**: the scan carries (re, im) real arrays (TPU has no
  complex ALU); see ops/scan.py. Scan backend ("associative" | "sequential"
  | "pallas") is configuration.
- Discretization stays in float32 and is computed once per apply (cheap,
  O(P·H)); XLA folds it into the projection weights at compile time for
  inference.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sparsernns_tpu.models.ssm_init import (init_cv, init_log_steps,
                                            init_vinv_b, trunc_standard_normal)
from sparsernns_tpu.ops.scan import diag_ssm_scan
from sparsernns_tpu.ops.topk import relu_top_k_sparsity
from sparsernns_tpu.quantize.config import QuantizationConfig
from sparsernns_tpu.quantize.qat import QuantizedOps, fake_quant
from sparsernns_tpu.quantize.static import FakeQuant, FakeQuantComplex

Array = jax.Array
Pair = Tuple[Array, Array]


def discretize_zoh(lam: Pair, b: Pair, delta: Array) -> Tuple[Pair, Pair]:
    """Zero-order-hold discretization of a diagonal SSM.

    lam: (P,) pair; b: (P, H) pair; delta: (P,). Returns discretized
    (lambda_bar (P,), b_bar (P, H)) pairs. Reference: ssm.py:37-50.
    """
    lr, li = lam
    # Lambda_bar = exp(Lambda * Delta)
    er = jnp.exp(lr * delta)
    lam_bar = (er * jnp.cos(li * delta), er * jnp.sin(li * delta))
    # B_bar = (1/Lambda) (Lambda_bar - 1) * B
    denom = lr * lr + li * li
    gr = (lam_bar[0] - 1.0) * lr / denom + lam_bar[1] * li / denom
    gi = lam_bar[1] * lr / denom - (lam_bar[0] - 1.0) * li / denom
    br, bi = b
    b_bar = (gr[:, None] * br - gi[:, None] * bi,
             gr[:, None] * bi + gi[:, None] * br)
    return lam_bar, b_bar


def discretize_bilinear(lam: Pair, b: Pair, delta: Array) -> Tuple[Pair, Pair]:
    """Bilinear (Tustin) discretization. Reference: ssm.py:19-34."""
    lr, li = lam
    hr, hi = 1.0 - 0.5 * delta * lr, -0.5 * delta * li  # 1 - Δ/2·Λ
    denom = hr * hr + hi * hi
    blr, bli = hr / denom, -hi / denom  # BL = 1/(1 - Δ/2·Λ)
    pr, pi = 1.0 + 0.5 * delta * lr, 0.5 * delta * li  # 1 + Δ/2·Λ
    lam_bar = (blr * pr - bli * pi, blr * pi + bli * pr)
    gr, gi = blr * delta, bli * delta
    br, bi = b
    b_bar = (gr[:, None] * br - gi[:, None] * bi,
             gr[:, None] * bi + gi[:, None] * br)
    return lam_bar, b_bar


def _relu_pair(x: Pair) -> Pair:
    """ReLU applied to real and imaginary parts separately (the fxp engine's
    complex-relu semantics; reference fxpmodel.py:27-63)."""
    return jax.nn.relu(x[0]), jax.nn.relu(x[1])


class S5SSM(nn.Module):
    """S5 state-space sequence mixer over (B, L, H) inputs.

    Parameters (matching the reference's checkpointable shapes,
    ssm.py:436-513): Lambda_re/Lambda_im (P,), B (P, H, 2),
    C (H, P, 2) (or C1+C2 with bidirectional), D (H,), log_step (P, 1).
    """

    lambda_init: Any  # complex (P,) numpy/jax array
    v: Any            # complex (ssm_size, P)
    vinv: Any         # complex (P, ssm_size)
    h: int
    p: int
    c_init: str = "lecun_normal"
    discretization: str = "zoh"
    dt_min: float = 0.001
    dt_max: float = 0.1
    conj_sym: bool = True
    clip_eigs: bool = False
    bidirectional: bool = False
    step_rescale: float = 1.0
    relufication: bool = False
    q_config: QuantizationConfig = QuantizationConfig.none()
    scan_mode: str = "associative"
    # Time-block size for the Pallas kernel paths (scan_kernel/fused_s5).
    # Shape- and chip-dependent; measured by utils/autotune.py.
    block_t: int = 256
    topk: float = 1.0
    approx_topk: bool = False
    # Activation-QAT on the fused kernel: quantize the in-scan state
    # operands on a GLOBAL two-pass absmax (an extra unquantized
    # projection+scan computes it) instead of the kernel's per-block
    # dynamic scales — matches the associative path's per-tensor scale
    # semantics at ~2x forward HBM (the backward, which dominates
    # training, is unchanged). Off by default: per-block scales already
    # give loss parity; turn on to tighten forward parity.
    qat_global_scales: bool = False
    # Mesh for scan_mode="sp": the sequence-parallel TRAINING scan —
    # time sharded over SEQ with log-depth ppermute carry combine, batch
    # on DATA, state dim on MODEL (parallel/seqscan.make_sp_train_scan).
    # Greenfield capability; no reference equivalent (SURVEY §2.2).
    sp_mesh: Any = None

    def setup(self):
        cfg = self.q_config
        self.q_ops = QuantizedOps.create(cfg)
        if cfg.static_quant:
            kw = dict(pow2scale=True, calibrating=cfg.calibrating)
            self.quant_a = FakeQuantComplex(bits=cfg.a_precision, **kw)
            self.quant_b = FakeQuantComplex(bits=cfg.b_precision, **kw)
            self.quant_c = FakeQuantComplex(bits=cfg.c_precision, **kw)
            self.quant_d = FakeQuant(bits=cfg.d_precision, **kw)
            self.quant_xt = FakeQuantComplex(bits=cfg.ssm_act_precision, **kw)
            self.quant_ut = FakeQuant(bits=cfg.ssm_act_precision, **kw)
            self.quant_but = FakeQuantComplex(bits=cfg.ssm_act_precision, **kw)
            self.quant_yt = FakeQuant(bits=cfg.ssm_act_precision, **kw)

        local_p = 2 * self.p if self.conj_sym else self.p

        # np, not jnp: lambda_init is complex64 and an eager device_put
        # of complex is refused on conformance-limited TPU transports
        # (and pointless — only the f32 real/imag parts become params)
        lam_init = np.asarray(self.lambda_init)
        self.lambda_re = self.param(
            "Lambda_re", lambda rng, _: lam_init.real.astype(jnp.float32), (None,))
        self.lambda_im = self.param(
            "Lambda_im", lambda rng, _: lam_init.imag.astype(jnp.float32), (None,))

        b_init = nn.initializers.lecun_normal()
        self.b = self.param(
            "B", lambda rng, shape: init_vinv_b(b_init, rng, shape, self.vinv),
            (local_p, self.h))

        if self.c_init == "trunc_standard_normal":
            c_fn, project = trunc_standard_normal, True
        elif self.c_init == "lecun_normal":
            c_fn, project = nn.initializers.lecun_normal(), True
        elif self.c_init == "complex_normal":
            c_fn, project = nn.initializers.normal(stddev=0.5 ** 0.5), False
        else:
            raise NotImplementedError(f"C_init {self.c_init}")

        c_shape = (self.h, local_p, 2)
        if project:
            c_initializer = lambda rng, shape: init_cv(c_fn, rng, shape, self.v)
        else:
            c_initializer = lambda rng, shape: c_fn(
                rng, (self.h, 2 * self.p if self.bidirectional else self.p, 2))
        if self.bidirectional and project:
            self.c1 = self.param("C1", c_initializer, c_shape)
            self.c2 = self.param("C2", c_initializer, c_shape)
        else:
            self.c = self.param("C", c_initializer, c_shape)

        self.d = self.param("D", nn.initializers.normal(stddev=1.0), (self.h,))
        self.log_step = self.param(
            "log_step", init_log_steps, (self.p, self.dt_min, self.dt_max))

    def _lambda(self) -> Pair:
        lr = self.lambda_re
        if self.clip_eigs:
            lr = jnp.clip(lr, None, -1e-4)
        return lr, self.lambda_im

    def _c_tilde(self) -> Pair:
        if self.bidirectional and hasattr(self, "c1"):
            cr = jnp.concatenate([self.c1[..., 0], self.c2[..., 0]], axis=-1)
            ci = jnp.concatenate([self.c1[..., 1], self.c2[..., 1]], axis=-1)
            return cr, ci
        return self.c[..., 0], self.c[..., 1]

    def discretized(self) -> Tuple[Pair, Pair]:
        """(lambda_bar (P,), b_bar (P, H)) pairs."""
        step = self.step_rescale * jnp.exp(self.log_step[:, 0])
        b_pair = (self.b[..., 0], self.b[..., 1])
        if self.discretization == "zoh":
            return discretize_zoh(self._lambda(), b_pair, step)
        if self.discretization == "bilinear":
            return discretize_bilinear(self._lambda(), b_pair, step)
        raise NotImplementedError(f"discretization {self.discretization}")

    @nn.compact
    def __call__(self, u: Array, bn_fusion: Optional[dict] = None):
        """u: (..., L, H) -> (ys (..., L, H), xs state pair (..., L, P)).

        ``bn_fusion``: optional dict(mean, var, eps, scale, bias) — folds a
        preceding BatchNorm into B̄/D exactly as reference ssm.py:544-555.
        """
        if self.q_config.static_quant:
            return self._apply_static_quant(u, bn_fusion)
        return self._apply(u, bn_fusion)

    # ---------------- float / QAT path ----------------

    def _fused_operands(self, bn_fusion):
        lam_bar, b_bar = self.discretized()
        d = self.d
        b_bias = None
        d_bias = None
        if bn_fusion is not None:
            scale = bn_fusion["scale"] / jnp.sqrt(
                bn_fusion["var"] + bn_fusion["eps"])
            bias = bn_fusion["bias"] - bn_fusion["mean"] * scale
            b_bias = (b_bar[0] @ bias, b_bar[1] @ bias)
            b_bar = (b_bar[0] * scale, b_bar[1] * scale)
            d_bias = self.d * bias
            d = self.d * scale
        return lam_bar, b_bar, d, b_bias, d_bias

    def _apply(self, u, bn_fusion):
        cfg = self.q_config
        lam_bar, b_bar, d, b_bias, d_bias = self._fused_operands(bn_fusion)

        streaming = (not self.is_initializing()) and (
            self.is_mutable_collection("cache")
            or self.has_variable("cache", "carry_re"))
        # Activation-QAT runs AT KERNEL SPEED: the fused kernel applies
        # in-scan dynamic fake-quant (scan_kernel.scan_block_body qat_bits
        # — the doubling-form analog of reference ssm.py:54-77), so QAT
        # training no longer falls back off the kernels (VERDICT round-1
        # item 5).
        act_qat = any(p is not None and p < 32 for p in (
            cfg.ssm_act_precision, cfg.a_precision, cfg.d_precision))
        qat_bits = ((cfg.a_precision, cfg.ssm_act_precision)
                    if act_qat else None)
        if (self.scan_mode == "fused" and not self.bidirectional
                and b_bias is None and not (self.topk < 1.0)
                and not streaming):
            # Single fused Pallas kernel: B-proj + scan + C-proj (+ relu on
            # the state). The state dim never touches HBM in the forward;
            # the custom VJP rematerializes it (fused_vjp.py).
            from sparsernns_tpu.ops.pallas.fused_vjp import \
                fused_s5_apply_diff
            w_b = jnp.concatenate(
                [fake_quant(b_bar[0], cfg.b_precision).T,
                 fake_quant(b_bar[1], cfg.b_precision).T], axis=-1)
            cr, ci = self._c_tilde()
            scale = 2.0 if self.conj_sym else 1.0
            w_c = scale * jnp.concatenate(
                [fake_quant(cr, cfg.c_precision).T,
                 -fake_quant(ci, cfg.c_precision).T], axis=0)
            u_in = fake_quant(u, cfg.ssm_act_precision) if act_qat else u
            d_in = fake_quant(d, cfg.d_precision) if act_qat else d
            qat_scale = None
            if act_qat and self.qat_global_scales:
                # two-pass GLOBAL absmax of the unquantized states: the
                # stats pass is stop_gradient'd so its backward is dead
                # code; the scale then feeds every in-kernel state
                # fake-quant (per-tensor semantics, like the associative
                # path's dynamic q_had scales)
                bu_s = jnp.matmul(u_in, w_b,
                                  precision=jax.lax.Precision.HIGHEST)
                xs_s = diag_ssm_scan(
                    lam_bar, (bu_s[..., :self.p], bu_s[..., self.p:]),
                    mode="pallas", block_t=self.block_t)
                qat_scale = jax.lax.stop_gradient(jnp.maximum(
                    jnp.max(jnp.abs(xs_s[0])), jnp.max(jnp.abs(xs_s[1]))))
            # (d_bias is always None here: it is only set together with
            # b_bias, and b_bias routes to the non-fused path above)
            ys = fused_s5_apply_diff(u_in, lam_bar, w_b, w_c, d_in,
                                     qat_scale, self.block_t,
                                     self.relufication, qat_bits)
            return ys, None

        # Input projection: ONE (..., L, H) @ (H, 2P) matmul. Each operand
        # is fake-quantized exactly once (re/im weight halves on their own
        # per-tensor grids), then multiplied in float — mathematically the
        # integer matmul with per-tensor scales.
        w_b = jnp.concatenate(
            [fake_quant(b_bar[0], cfg.b_precision).T,
             fake_quant(b_bar[1], cfg.b_precision).T], axis=-1)
        bu_cat = jnp.matmul(fake_quant(u, cfg.ssm_act_precision), w_b,
                            precision=jax.lax.Precision.HIGHEST)
        bu = (bu_cat[..., :self.p], bu_cat[..., self.p:])
        if b_bias is not None:
            bu = (bu[0] + b_bias[0], bu[1] + b_bias[1])

        had_aa, had_ax = self.q_ops.a_had
        carry_init, carry_vars = self._carry(u)
        # "fused" handles the whole mixer above; when it can't apply
        # (bidirectional / BN-bias / streaming / init), scan standalone.
        mode = "pallas" if self.scan_mode == "fused" else self.scan_mode
        if mode == "sp":
            if self.sp_mesh is None:
                raise ValueError("scan_mode='sp' requires sp_mesh")
            if self.bidirectional or carry_init is not None:
                raise NotImplementedError(
                    "sequence-parallel scan does not support "
                    "bidirectional or streaming carries")
            from sparsernns_tpu.parallel.seqscan import make_sp_train_scan
            xs = make_sp_train_scan(self.sp_mesh)(lam_bar, bu)
        else:
            xs = diag_ssm_scan(lam_bar, bu, mode=mode,
                               carry_init=carry_init,
                               had_aa=had_aa, had_ax=had_ax,
                               qat_bits=qat_bits, block_t=self.block_t)
        if carry_vars is not None:
            carry_vars[0].value = xs[0][..., -1, :]
            carry_vars[1].value = xs[1][..., -1, :]

        if self.relufication:
            if self.topk < 1.0 and self.approx_topk:
                k = int(self.topk * xs[0].shape[-1])
                xs = (relu_top_k_sparsity(xs[0], k),
                      relu_top_k_sparsity(xs[1], k))
            elif self.topk < 1.0:
                raise NotImplementedError("exact top-k not implemented")
            else:
                xs = _relu_pair(xs)

        if self.bidirectional:
            # NOTE: matching the reference, the backward pass is NOT
            # relufied/sparsified before the concat (ssm.py:161-177).
            # The reverse Pallas scan has its own VJP (a forward scan of
            # the cotangents, scan_vjp.pallas_diag_scan_diff_rev), so
            # bidirectional trains on the kernels in BOTH directions.
            xs_bwd = diag_ssm_scan(lam_bar, bu, mode=mode,
                                   reverse=True, had_aa=had_aa,
                                   had_ax=had_ax, qat_bits=qat_bits,
                                   block_t=self.block_t)
            xs = (jnp.concatenate([xs[0], xs_bwd[0]], axis=-1),
                  jnp.concatenate([xs[1], xs_bwd[1]], axis=-1))

        ys = self._output_projection(xs, u, d, d_bias, cfg)
        return ys, xs

    def _output_projection(self, xs, u, d, d_bias, cfg):
        cr, ci = self._c_tilde()
        # ys = Re(C x) = x_re @ C_re^T - x_im @ C_im^T: ONE (..., 2P)@(2P, H).
        # Single fake-quant per operand part (see _apply).
        w_c = jnp.concatenate(
            [fake_quant(cr, cfg.c_precision).T,
             -fake_quant(ci, cfg.c_precision).T], axis=0)
        xs_cat = jnp.concatenate(
            [fake_quant(xs[0], cfg.ssm_act_precision),
             fake_quant(xs[1], cfg.ssm_act_precision)], axis=-1)
        ys = jnp.matmul(xs_cat, w_c, precision=jax.lax.Precision.HIGHEST)
        if self.conj_sym:
            ys = 2.0 * ys
        ys = ys + self.q_ops.d_had(d, u)
        if d_bias is not None:
            ys = ys + d_bias
        return ys

    def layer_tail_operands(self):
        """Operands for the whole-layer TRAINING kernel
        (ops/pallas/fused_layer_train.py): (lam_bar, w_b, w_c, d,
        relu_state, block_t), or None when this mixer configuration
        cannot be expressed by that kernel (the caller then runs the
        normal mixer path). Float path only — fake-quant would be the
        identity here anyway (gated on !any_quantized)."""
        cfg = self.q_config
        if (self.scan_mode != "fused" or self.bidirectional
                or self.topk < 1.0 or cfg.static_quant
                or cfg.any_quantized or self.is_initializing()
                or self.is_mutable_collection("cache")
                or self.has_variable("cache", "carry_re")):
            return None
        lam_bar, b_bar = self.discretized()
        w_b = jnp.concatenate([b_bar[0].T, b_bar[1].T], axis=-1)
        cr, ci = self._c_tilde()
        scale = 2.0 if self.conj_sym else 1.0
        w_c = scale * jnp.concatenate([cr.T, -ci.T], axis=0)
        return lam_bar, w_b, w_c, self.d, self.relufication, self.block_t

    def _carry(self, u):
        """Streaming state: when the caller runs apply with the "cache"
        collection (mutable or restored), the scan starts from the cached
        carry and writes the final state back — chunked/stateful inference
        (SURVEY.md §5 'streaming ... carry x_t passed between chunks').

        No reference equivalent (the reference always scans full 30 s
        clips); this is the serving-path primitive.
        """
        if self.bidirectional or self.is_initializing() or not (
                self.is_mutable_collection("cache")
                or self.has_variable("cache", "carry_re")):
            return None, None
        batch_shape = u.shape[:-2]
        init = lambda: jnp.zeros(batch_shape + (self.p,), u.dtype)
        c_re = self.variable("cache", "carry_re", init)
        c_im = self.variable("cache", "carry_im", init)
        return (c_re.value, c_im.value), (c_re, c_im)

    # ---------------- static-quant path ----------------

    def _state_scales(self):
        """Scales for in-scan state requantization, derived from the
        quant_xt observers (running stats during calibration, restored
        stats at static inference) or frozen params scales.

        Reference semantics: ssm.py:253-310.
        """
        s_re = self.quant_xt.quant_real.calibration_scale()
        s_im = self.quant_xt.quant_imag.calibration_scale()
        gate = None
        if s_re is not None and s_im is not None:
            # Calibration: requant only once the observers have seen real
            # (nonzero) data. Model.init runs on a dummy input whose zeros
            # seed min=max=0 -> eps scale; requantizing with that scale
            # would clip states to ~qmax*eps, the observers would only ever
            # see clipped states, and the scale could never grow (a
            # self-referential lock). Gating on observed absmax > 0 makes
            # the first real batch pass through unclipped.
            obs_r = self.quant_xt.quant_real.get_variable(
                "batch_stats", "observer")
            obs_i = self.quant_xt.quant_imag.get_variable(
                "batch_stats", "observer")
            absmax = jnp.maximum(
                jnp.maximum(jnp.abs(obs_r["observer_min"]),
                            jnp.abs(obs_r["observer_max"])).max(),
                jnp.maximum(jnp.abs(obs_i["observer_min"]),
                            jnp.abs(obs_i["observer_max"])).max())
            gate = jnp.isfinite(absmax) & (absmax > 0.0)
        else:
            s_re = self.quant_xt.quant_real.frozen_scale()
            s_im = self.quant_xt.quant_imag.frozen_scale()
        if s_re is None or s_im is None:
            return None
        return s_re, s_im, gate

    def _apply_static_quant(self, u, bn_fusion):
        from sparsernns_tpu.quantize.static import quant_dequant
        cfg = self.q_config
        lam_bar, b_bar_unfused, d_unfused, _, _ = self._fused_operands(None)
        # NOTE: the reference applies BN fusion only on the float path and
        # passes the *unfused* B̄ into the static-quant apply (ssm.py:571-576);
        # we mirror that here and let the SequenceLayer fall back to explicit
        # BatchNorm when static_quant is enabled.
        del bn_fusion

        u_q = self.quant_ut(u)
        b_bar = self.quant_b(*b_bar_unfused)
        lam_q = self.quant_a(*lam_bar)
        c_q = self.quant_c(*self._c_tilde())

        w_b = jnp.concatenate([b_bar[0].T, b_bar[1].T], axis=-1)
        bu_cat = jnp.matmul(u_q, w_b, precision=jax.lax.Precision.HIGHEST)
        bu = self.quant_but(bu_cat[..., :self.p], bu_cat[..., self.p:])

        scales = self._state_scales()
        state_requant = None
        if scales is not None:
            s_re, s_im, gate = scales
            bits = cfg.ssm_act_precision

            def state_requant(x):
                qr = quant_dequant(x[0], s_re, 0.0, bits)
                qi = quant_dequant(x[1], s_im, 0.0, bits)
                if gate is None:
                    return qr, qi
                return (jnp.where(gate, qr, x[0]),
                        jnp.where(gate, qi, x[1]))

        xs = diag_ssm_scan(lam_q, bu, mode="sequential",
                           state_requant=state_requant)
        self.quant_xt(*xs)  # feed the observers (no-op transform while calibrating)

        if self.relufication:
            xs = _relu_pair(xs)
        if self.bidirectional:
            raise NotImplementedError(
                "bidirectional static quant (reference raises too, ssm.py:327-330)")

        cr, ci = c_q
        w_c = jnp.concatenate([cr.T, -ci.T], axis=0)
        xs_cat = jnp.concatenate(list(xs), axis=-1)
        ys = jnp.matmul(xs_cat, w_c, precision=jax.lax.Precision.HIGHEST)
        if self.conj_sym:
            ys = 2.0 * ys
        d_q = self.quant_d(d_unfused)
        ys = self.quant_yt(ys + d_q * u_q)
        return ys, xs


def make_ssm_init_fn(
    h: int,
    p: int,
    lambda_init,
    v,
    vinv,
    c_init: str = "lecun_normal",
    discretization: str = "zoh",
    dt_min: float = 0.001,
    dt_max: float = 0.1,
    conj_sym: bool = True,
    clip_eigs: bool = False,
    bidirectional: bool = False,
    relufication: bool = False,
    q_config: QuantizationConfig = QuantizationConfig.none(),
    scan_mode: str = "associative",
    sp_mesh=None,
    block_t: Optional[int] = None,
    qat_global_scales: bool = False,
) -> Callable:
    """Factory mirroring reference init_qS5SSM (ssm.py:625-663): returns a
    partial taking the per-layer knobs (step_rescale, topk, approx_topk).

    ``block_t=None`` consults the persisted autotune cache keyed by this
    model's (h, p) geometry (VERDICT r4 #5): the "scan" entry for the
    standalone-kernel mode, the "layer" entry (the whole-layer training
    kernel's tile) otherwise; hand-set 256 stays the fallback."""
    if block_t is None:
        from sparsernns_tpu.utils.autotune_cache import resolve_block_t
        mode_key = "scan" if scan_mode == "pallas" else "layer"
        block_t = resolve_block_t(mode_key, h=h, p=p, default=256)
    return partial(
        S5SSM,
        h=h, p=p, lambda_init=lambda_init, v=v, vinv=vinv,
        c_init=c_init, discretization=discretization,
        dt_min=dt_min, dt_max=dt_max, conj_sym=conj_sym,
        clip_eigs=clip_eigs, bidirectional=bidirectional,
        relufication=relufication, q_config=q_config, scan_mode=scan_mode,
        sp_mesh=sp_mesh, block_t=block_t,
        qat_global_scales=qat_global_scales,
    )
