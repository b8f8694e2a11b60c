"""Sequence layer: norm → S5 mixer → GLU gate → residual.

Capability parity with reference `sparseRNNs/model/layers.py` (QSequenceLayer:
pre/post BatchNorm/LayerNorm, BN-fusion into the mixer, GLU variants
full/half1/half2/none with a quantized multiply gate, dropout, relufication,
approx top-k). Natively batched over (B, L, H): BatchNorm reduces over
(batch, length) directly, which under pjit is a *global* reduction across
the data-parallel mesh axis — no vmap axis_name plumbing needed (the
reference relied on `axis_name="batch"`, layers.py:149).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sparsernns_tpu.ops.topk import relu_top_k_sparsity, top_k_sparsity
from sparsernns_tpu.quantize.config import QuantizationConfig
from sparsernns_tpu.quantize.qat import QuantizedOps, fake_quant, q_had
from sparsernns_tpu.quantize.static import QuantizedDense, QuantizedMultiply

GLU_VARIANTS = ("full", "half1", "half2", "none")


class QDense(nn.Module):
    """Dense with a pluggable (quantized) dot. Param names match nn.Dense."""

    features: int
    dot: Callable
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        y = self.dot(x, kernel)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y


def make_dense_cls(q_config: QuantizationConfig,
                   axis_name: Optional[str] = None):
    """Dense factory for non-SSM layers: static-quant -> QuantizedDense
    (observer-calibrated), else QDense with a QAT fake-quant dot.
    Reference: layers.py:88-105."""
    if q_config.static_quant:
        return partial(
            QuantizedDense,
            a_bits=q_config.non_ssm_act_precision,
            w_bits=q_config.non_ssm_precision,
            calibrating=q_config.calibrating,
            axis_name=axis_name,
        )
    ops = QuantizedOps.create(q_config)
    return partial(QDense, dot=ops.dense_dot)


class SequenceLayer(nn.Module):
    """One S5 block. Reference: QSequenceLayer layers.py:40-241."""

    mixer_cls: Callable
    d_model: int
    dropout: float = 0.0
    batchnorm: bool = True
    prenorm: bool = True
    glu_variant: str = "none"
    bn_momentum: float = 0.90
    training: bool = True
    step_rescale: float = 1.0
    relufication: bool = False
    fuse_batchnorm_linear: bool = False
    q_config: QuantizationConfig = QuantizationConfig.none()
    use_batchnorm_scale: bool = True
    use_batchnorm_bias: bool = True
    topk: float = 1.0
    approx_topk: bool = False
    axis_name: Optional[str] = None  # set under shard_map; None under pjit

    def setup(self):
        assert self.glu_variant in GLU_VARIANTS, (
            f"glu_variant must be one of {GLU_VARIANTS}")
        if self.fuse_batchnorm_linear:
            assert self.batchnorm and self.prenorm, (
                "fuse_batchnorm_linear requires batchnorm+prenorm "
                "(reference layers.py:134-138)")

        self.mixer = self.mixer_cls(
            step_rescale=self.step_rescale,
            topk=self.topk,
            approx_topk=self.approx_topk,
        )

        dense_cls = make_dense_cls(self.q_config, self.axis_name)
        if self.glu_variant == "full":
            self.out1 = dense_cls(self.d_model)
            self.out2 = dense_cls(self.d_model)
        elif self.glu_variant in ("half1", "half2"):
            self.out2 = dense_cls(self.d_model)

        if self.batchnorm:
            self.norm = nn.BatchNorm(
                use_running_average=not self.training,
                momentum=self.bn_momentum,
                axis_name=self.axis_name,
                use_scale=self.use_batchnorm_scale,
                use_bias=self.use_batchnorm_bias,
            )
        else:
            self.norm = nn.LayerNorm()

        # Dropout is broadcast along time (axis 1 of (B, L, H)); the
        # reference broadcasts along axis 0 of its per-sample (L, H) input —
        # same semantics.
        self.drop = nn.Dropout(
            self.dropout, broadcast_dims=(1,), deterministic=not self.training)

        act_bits = self.q_config.non_ssm_act_precision
        if act_bits is not None and self.q_config.static_quant:
            self.mult_gate = QuantizedMultiply(
                left_bits=act_bits, right_bits=act_bits,
                calibrating=self.q_config.calibrating,
                axis_name=self.axis_name)
            # Residual-stream observer: calibrates the layer OUTPUT so the
            # integer engines get a per-layer residual format instead of
            # inheriting one from the encoder/decoder observers (greenfield
            # — the reference never observes the residual; round-1 ROADMAP
            # item).
            from sparsernns_tpu.quantize.static import FakeQuant
            self.quant_residual = FakeQuant(
                bits=act_bits, calibrating=self.q_config.calibrating,
                axis_name=self.axis_name)
        elif act_bits is not None:
            self.mult_gate = q_had(act_bits, act_bits)
            self.quant_residual = None
        else:
            self.mult_gate = jnp.multiply
            self.quant_residual = None

    def _glu_act(self, x):
        if self.relufication:
            if self.topk < 1.0 and self.approx_topk:
                return relu_top_k_sparsity(x, int(self.topk * self.d_model))
            if self.topk < 1.0:
                raise NotImplementedError("exact top-k not implemented")
            return jax.nn.relu(x)
        return jax.nn.gelu(x)

    def _tail_ops(self):
        """The whole-layer kernel's mixer operands when this layer's
        configuration is expressible by ops/pallas/fused_layer_train.py,
        else None. Shared eligibility source for the per-layer fast path
        and the stack's padded-stream path (seq_model.py)."""
        cfg = self.q_config
        if (not self.prenorm or self.topk < 1.0 or cfg.static_quant
                or cfg.any_quantized or self.fuse_batchnorm_linear
                or self.is_initializing()
                or self.is_mutable_collection("intermediates")):
            return None
        tail_ops = getattr(self.mixer, "layer_tail_operands", None)
        return tail_ops() if tail_ops is not None else None

    def _fused_tail(self, x, padded_true_l=None):
        """Whole-layer training fusion: when the configuration is
        expressible by ops/pallas/fused_layer_train.py (float path,
        prenorm, no top-k, fused-scan mixer), run norm in flax (BatchNorm
        statistics must reduce over (B, L) and the mesh data axis) and
        everything after it — mixer, GLU, dropout, residual, relufication
        — as ONE Pallas kernel with the reverse-time adjoint kernel as
        its VJP. Returns the layer output, or None to take the unfused
        path.

        ``padded_true_l``: the stream is ALREADY in the kernel geometry
        (B, L_pad, H_pad) with exactly-zero pads and this is the true L —
        no per-layer pad/slice, BatchNorm statistics from sums over the
        padded stream (exact: pads are zero), output stays padded with
        its pad rows re-zeroed in-kernel (seq_model.py stack path)."""
        ops = self._tail_ops()
        if ops is None:
            assert padded_true_l is None, (
                "padded-stream mode requires the tail kernel")
            return None
        lam_bar, w_b, w_c, d, relu_state, block_t = ops

        glu = self.glu_variant
        m1 = m2 = None
        if self.dropout > 0.0 and self.training:
            # Extract the masks FROM self.drop (applied to ones): the
            # same rng stream, fold order, and mask distribution as the
            # unfused path — fused and unfused training see identical
            # dropout draws for a given step rng. Masks stay f32 even on
            # a bf16 stream: 1/keep_prob must not round (mask HBM is
            # (B, 1, H) — negligible).
            ones = jnp.ones((x.shape[0], 1, self.d_model), jnp.float32)
            m1 = self.drop(ones)
            if glu != "none":
                m2 = self.drop(ones)

        o2k = o2b = o1k = o1b = None
        if glu in ("full", "half1", "half2"):
            o2k = self.out2.variables["params"]["kernel"]
            o2b = self.out2.variables["params"]["bias"]
        if glu == "full":
            o1k = self.out1.variables["params"]["kernel"]
            o1b = self.out1.variables["params"]["bias"]

        from sparsernns_tpu.ops.pallas.fused_layer_train import \
            fused_layer_tail_diff
        nw = nb = None
        if self.batchnorm:
            # BatchNorm folds to a per-feature affine once its statistics
            # are known, so the kernel reads the stream ONCE (raw x is
            # both the norm input and the residual). In training the
            # stats come from x differentiably — autodiff carries the
            # kernel's nw/nb cotangents back through mean/var to x, which
            # IS the BatchNorm backward. self.norm is still called for
            # the running-stats update; its normalized output is unused
            # and DCE'd by XLA.
            nvar = self.norm.variables
            h_dim = self.d_model
            params = nvar.get("params", {})
            p_scale = params.get("scale", jnp.ones((h_dim,), x.dtype))
            p_bias = params.get("bias", jnp.zeros((h_dim,), x.dtype))
            if self.training and padded_true_l is not None:
                # exact statistics from the padded stream: the pads are
                # EXACTLY zero (kernel-maintained invariant), so sums are
                # the true sums — only the divisor needs the true count.
                # f32 accumulation regardless of the stream dtype (XLA
                # fuses the convert into the reduce — no materialization)
                denom = float(x.shape[0] * padded_true_l)
                xf = x.astype(jnp.float32)
                s1 = jnp.sum(xf, axis=(0, 1))[:h_dim]
                s2 = jnp.sum(jnp.square(xf), axis=(0, 1))[:h_dim]
                mean = s1 / denom
                var = s2 / denom - mean * mean
                # running-stats update (what self.norm(x) would do, with
                # the masked statistics)
                if self.norm.is_mutable_collection("batch_stats"):
                    mom = self.bn_momentum
                    ra_m = self.norm.get_variable("batch_stats", "mean")
                    ra_v = self.norm.get_variable("batch_stats", "var")
                    sg = jax.lax.stop_gradient
                    self.norm.put_variable(
                        "batch_stats", "mean",
                        mom * ra_m + (1.0 - mom) * sg(mean))
                    self.norm.put_variable(
                        "batch_stats", "var",
                        mom * ra_v + (1.0 - mom) * sg(var))
            elif self.training:
                mean = jnp.mean(x, axis=(0, 1))
                var = jnp.mean(jnp.square(x), axis=(0, 1)) - mean * mean
                self.norm(x)
            else:
                stats = nvar["batch_stats"]
                mean, var = stats["mean"], stats["var"]
            nw = p_scale * jax.lax.rsqrt(var + self.norm.epsilon)
            nb = p_bias - mean * nw
            z, skip = x, None
        else:
            assert padded_true_l is None, (
                "padded-stream mode requires BatchNorm (affine fold)")
            z, skip = self.norm(x), x
        return fused_layer_tail_diff(
            z, skip, lam_bar, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2,
            nw, nb, block_t, "relu" if self.relufication else "gelu", glu,
            relu_state, self.relufication, padded_true_l is not None,
            padded_true_l)

    def __call__(self, x, padded_true_l=None):
        fused = self._fused_tail(x, padded_true_l)
        if fused is not None:
            return fused
        assert padded_true_l is None, (
            "padded-stream mode requires the tail kernel")
        skip = x
        self.sow("intermediates", "input", x)

        norm_vars_exist = ("batch_stats" in self.norm.variables
                           and "params" in self.norm.variables)
        if (self.fuse_batchnorm_linear and self.batchnorm and self.prenorm
                and norm_vars_exist and not self.q_config.static_quant):
            self.sow("intermediates", "pre_s5", x)
            x, x_pre_c = self.mixer(x, bn_fusion=dict(
                mean=self.norm.variables["batch_stats"]["mean"],
                var=self.norm.variables["batch_stats"]["var"],
                eps=self.norm.epsilon,
                scale=self.norm.variables["params"]["scale"],
                bias=self.norm.variables["params"]["bias"],
            ))
        else:
            if self.prenorm:
                x = self.norm(x)
            self.sow("intermediates", "pre_s5", x)
            x, x_pre_c = self.mixer(x)

        if x_pre_c is not None:  # fused-kernel mode keeps the state in VMEM
            self.sow("intermediates", "pre_C", x_pre_c)
        x1 = self.drop(self._glu_act(x))
        self.sow("intermediates", "pre_GLU", x)

        if self.glu_variant == "full":
            x = self.mult_gate(self.out1(x1), jax.nn.sigmoid(self.out2(x1)))
            x = self.drop(x)
        elif self.glu_variant == "half1":
            x = self.mult_gate(x1, jax.nn.sigmoid(self.out2(x1)))
            x = self.drop(x)
        elif self.glu_variant == "half2":
            x = self.mult_gate(x, jax.nn.sigmoid(self.out2(x1)))
            x = self.drop(x)
        else:  # "none"
            x = x1

        x = x + skip
        if not self.prenorm:
            x = self.norm(x)
        if self.relufication:
            x = jax.nn.relu(x)
        if self.topk < 1.0 and self.approx_topk:
            x = top_k_sparsity(x, int(self.topk * self.d_model))
        elif self.topk < 1.0:
            raise NotImplementedError("exact top-k not implemented")
        if self.quant_residual is not None:
            x = self.quant_residual(x)
        return x
