"""Stacked S5 encoder and task heads (classification / regression / retrieval).

Capability parity with reference `sparseRNNs/model/seq_model.py`
(QStackedEncoderModel, QClassificationModel, QRetrievalModel + decoder,
QRegressionModel, masked_meanpool, quant_input_fn). All modules are
natively batched over (B, L, ...) — the reference wraps per-sample modules
in `nn.vmap` (seq_model.py:118-132, :459-473); here batching is just the
leading array axis, which lets every Dense run as one large MXU matmul and
makes data-parallel sharding a pjit annotation instead of a code change.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sparsernns_tpu.models.layers import SequenceLayer, make_dense_cls
from sparsernns_tpu.ops.topk import relu_top_k_sparsity
from sparsernns_tpu.quantize.config import QuantizationConfig


def quant_input_fn(x: jax.Array, quant_input_exp: Optional[float] = None):
    """Round the input to a fixed power-of-2 grid (reference
    seq_model.py:14-20) — used to match fxp input quantization."""
    if quant_input_exp is None:
        return x
    return jnp.round(x * 2.0 ** quant_input_exp) / 2.0 ** quant_input_exp


def masked_meanpool(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Mean-pool (B, L, H) over valid timesteps only; lengths (B,).
    Reference: seq_model.py:137-150."""
    length = x.shape[-2]
    mask = jnp.arange(length) < lengths[..., None]  # (B, L)
    return jnp.sum(mask[..., None] * x, axis=-2) / lengths[..., None]


class _Base(nn.Module):
    mixer_cls: Callable = None
    n_layers: int = 1
    d_model: int = 128
    dropout: float = 0.2
    batchnorm: bool = True
    prenorm: bool = False
    bn_momentum: float = 0.9
    glu_variant: str = "none"
    training: bool = True
    step_rescale: float = 1.0
    relufication: bool = False
    fuse_batchnorm_linear: bool = False
    q_config: QuantizationConfig = QuantizationConfig.none()
    use_batchnorm_scale: bool = True
    use_batchnorm_bias: bool = True
    topk: float = 1.0
    approx_topk: bool = False
    quant_input: Optional[float] = None
    axis_name: Optional[str] = None
    #: inter-layer residual-stream storage dtype on the padded-stream
    #: training fast path: "bfloat16" halves the stream HBM traffic of
    #: the whole-layer kernels (fwd reads/writes AND the adjoint's
    #: stream cotangents); params/grads/BN statistics stay f32. Opt-in
    #: (--train_stream_dtype bfloat16); quality impact measured in
    #: PERF.md.
    stream_dtype: str = "float32"

    def _encoder_stack(self):
        return StackedEncoderModel(
            mixer_cls=self.mixer_cls,
            n_layers=self.n_layers,
            d_model=self.d_model,
            dropout=self.dropout,
            batchnorm=self.batchnorm,
            prenorm=self.prenorm,
            bn_momentum=self.bn_momentum,
            glu_variant=self.glu_variant,
            training=self.training,
            step_rescale=self.step_rescale,
            relufication=self.relufication,
            fuse_batchnorm_linear=self.fuse_batchnorm_linear,
            q_config=self.q_config,
            stream_dtype=self.stream_dtype,
            use_batchnorm_scale=self.use_batchnorm_scale,
            use_batchnorm_bias=self.use_batchnorm_bias,
            topk=self.topk,
            approx_topk=self.approx_topk,
            axis_name=self.axis_name,
        )


class StackedEncoderModel(_Base):
    """Linear encoder + N S5 sequence layers.
    Reference: QStackedEncoderModel seq_model.py:44-115."""

    def setup(self):
        dense_cls = make_dense_cls(self.q_config, self.axis_name)
        self.encoder = dense_cls(self.d_model)
        if self.topk < 1.0 and self.approx_topk:
            self.topk_op = partial(
                relu_top_k_sparsity, k=int(self.topk * self.d_model))
        elif self.topk < 1.0:
            raise NotImplementedError("exact top-k not implemented")
        elif self.relufication:
            self.topk_op = jax.nn.relu
        else:
            self.topk_op = lambda x: x

        self.layers = [
            SequenceLayer(
                mixer_cls=self.mixer_cls,
                d_model=self.d_model,
                dropout=self.dropout,
                batchnorm=self.batchnorm,
                prenorm=self.prenorm,
                glu_variant=self.glu_variant,
                bn_momentum=self.bn_momentum,
                training=self.training,
                step_rescale=self.step_rescale,
                relufication=self.relufication,
                fuse_batchnorm_linear=self.fuse_batchnorm_linear,
                q_config=self.q_config,
                use_batchnorm_scale=self.use_batchnorm_scale,
                use_batchnorm_bias=self.use_batchnorm_bias,
                topk=self.topk,
                approx_topk=self.approx_topk,
                axis_name=self.axis_name,
            )
            for _ in range(self.n_layers)
        ]

    def __call__(self, x, integration_timesteps=None):
        self.sow("intermediates", "pre_encoder", x)
        x = self.encoder(x)
        x = self.topk_op(x)
        self.sow("intermediates", "encoder_output", x)
        # Padded-stream fast path: when every layer runs the whole-layer
        # kernel (they share one config), pad the stream ONCE to the
        # kernel geometry and keep it padded across the stack — no
        # per-layer pad/slice round trips. The kernels re-zero the L-pad
        # rows so BatchNorm statistics (computed from sums / true count)
        # stay exact. Gated off under shard_map meshes (axis_name BN
        # stats) — pjit shards the jnp sums itself.
        import os
        tail_ops = (self.layers[0]._tail_ops()
                    if (self.batchnorm and self.prenorm
                        and self.axis_name is None and self.n_layers > 0
                        and os.environ.get(
                            "SPARSERNNS_NO_PADDED_STREAM") != "1")
                    else None)
        if tail_ops is not None:
            from sparsernns_tpu.ops.pallas.fused_layer_train import \
                tail_geometry
            block_t = tail_ops[5]
            b, l, h = x.shape
            t, l_pad, h_pad = tail_geometry(l, h, block_t)
            sd = (jnp.bfloat16 if self.stream_dtype == "bfloat16"
                  else jnp.float32)
            xp = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, h_pad - h))
                         ).astype(sd)
            for layer in self.layers:
                xp = layer(xp, padded_true_l=l)
            return xp[:, :l, :h].astype(jnp.float32)
        for layer in self.layers:
            x = layer(x)
        return x


class ClassificationModel(_Base):
    """Encoder stack + pooling + linear decoder + log-softmax.
    Reference: QClassificationModel seq_model.py:157-239."""

    d_output: int = None
    padded: bool = False
    mode: str = "pool"

    def setup(self):
        assert self.d_output is not None
        self.encoder = self._encoder_stack()
        dense_cls = make_dense_cls(self.q_config, self.axis_name)
        self.decoder = dense_cls(self.d_output)

    def __call__(self, x, integration_timesteps=None):
        if self.padded:
            x, lengths = x
        if self.quant_input is not None:
            x = quant_input_fn(x, self.quant_input)
        x = self.encoder(x, integration_timesteps)
        if self.mode == "pool":
            if self.padded:
                x = masked_meanpool(x, lengths)
            else:
                x = jnp.mean(x, axis=-2)
        elif self.mode == "last":
            if self.padded:
                raise NotImplementedError(
                    "mode='last' with padded sequences not implemented "
                    "(reference raises too, seq_model.py:221-224)")
            x = x[..., -1, :]
        else:
            raise NotImplementedError(f"mode {self.mode}")
        x = self.decoder(x)
        return nn.log_softmax(x, axis=-1)


class RegressionModel(_Base):
    """Encoder stack + per-step linear decoder (the NDNS denoising head).
    Reference: QRegressionModel seq_model.py:392-456."""

    d_output: int = None
    padded: bool = False

    def setup(self):
        assert self.d_output is not None
        self.encoder = self._encoder_stack()
        dense_cls = make_dense_cls(self.q_config, self.axis_name)
        self.decoder = dense_cls(self.d_output)

    def __call__(self, x, integration_timesteps=None):
        if self.padded:
            x, _ = x
        if self.quant_input is not None:
            x = quant_input_fn(x, self.quant_input)
        x = self.encoder(x, integration_timesteps)
        self.sow("intermediates", "pre_decoder", x)
        return self.decoder(x)


class RetrievalDecoder(nn.Module):
    """MLP over the 4-feature concatenation [u1, u2, u1-u2, u1*u2].
    Reference: QRetrievalDecoder seq_model.py:330-389."""

    d_model: int
    d_output: int
    q_config: QuantizationConfig = QuantizationConfig.none()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        dense_cls = make_dense_cls(self.q_config, self.axis_name)
        x = dense_cls(self.d_model)(x)
        x = jax.nn.gelu(x)
        x = dense_cls(self.d_output)(x)
        return x

class RetrievalModel(_Base):
    """Document-matching head: encode both sequences, pool, combine
    features, MLP-decode. Reference: QRetrievalModel seq_model.py:259-327.

    Input x: (2B, L, d_input) — first half are the first documents, second
    half the second documents (the reference's layout after its dataloader
    collates pairs).
    """

    d_output: int = None
    padded: bool = False

    def setup(self):
        assert self.d_output is not None
        self.encoder = self._encoder_stack()
        self.decoder = RetrievalDecoder(
            d_model=self.d_model, d_output=self.d_output,
            q_config=self.q_config, axis_name=self.axis_name)

    def __call__(self, x, integration_timesteps=None):
        if self.padded:
            x, lengths = x
        x = self.encoder(x, integration_timesteps)
        if self.padded:
            x = masked_meanpool(x, lengths)
        else:
            x = jnp.mean(x, axis=-2)
        outs = jnp.split(x, 2, axis=0)  # (B, H), (B, H)
        features = jnp.concatenate(
            [outs[0], outs[1], outs[0] - outs[1], outs[0] * outs[1]], axis=-1)
        out = self.decoder(features)
        return nn.log_softmax(out, axis=-1)
