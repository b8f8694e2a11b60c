"""Sequence-parallel and tensor-parallel engine inference.

Runs the serving engine forward with either the time axis L sharded over
the SEQ mesh axis (per-layer scan carries combine in log2(n) ppermute
rounds — parallel/seqscan.py) or the SSM state dim P sharded over the
MODEL axis (per-shard diagonal scans, column/row-parallel B/C projections,
one psum per layer). Everything outside the scan is embarrassingly
parallel, so cross-chip traffic per layer is O(P) (SP) or O(T·H) for the
psum (TP).

The layer body itself (norm -> mixer -> GLU -> residual -> relu/top-k)
is the SHARED `engine_layer_forward` from quantize/engine.py — only the
mixer's scan differs per parallelism mode, keeping all serving paths
numerically in sync.

No reference equivalent (single-device only; SURVEY.md §2.2) — greenfield
TPU capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sparsernns_tpu.ops.scan import associative_diag_scan
from sparsernns_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
from sparsernns_tpu.parallel.seqscan import seq_chunk_scan
from sparsernns_tpu.quantize.engine import (W8A16Engine, engine_encode,
                                            engine_layer_forward,
                                            quantized_dense,
                                            state_activation)


def make_dp_forward(engine: W8A16Engine, mesh: Mesh):
    """Data-parallel engine forward: batch rows sharded over the DATA
    axis, weights replicated. Each chip runs the engine's best
    single-chip route (the whole-NETWORK kernel when eligible,
    quantize/engine._apply) on its local rows — DP serving needs ZERO
    forward collectives, and shard_map makes that structural: XLA's
    partitioner cannot see inside the Pallas custom calls and would
    otherwise all-gather the batch around each one (see
    ops/pallas/partition.py for the per-kernel rules the jit path uses).

    The global batch must be divisible by ``mesh.shape[DATA_AXIS]``.
    Bit-identical per row to the single-chip engine (same kernels, same
    time-block decomposition — the batch grid axis is independent).
    """
    def _local(weights, x_local):
        return engine._apply(weights, x_local, block_t=engine.block_t)

    x_spec = P(DATA_AXIS)
    # check_vma=False: pallas_call cannot declare its outputs' varying
    # axes (jax requires an explicit `vma` on every out ShapeDtypeStruct
    # under check_vma=True), so the check cannot be satisfied with the
    # kernels in the body. There is nothing for it to verify here anyway
    # — the body is collective-free per-shard fan-out, which
    # tests/test_engine.py::test_data_parallel_engine pins structurally
    # (zero collective bytes in the compiled HLO).
    sharded = jax.shard_map(_local, mesh=mesh,
                            in_specs=(P(), x_spec), out_specs=x_spec,
                            check_vma=False)
    fwd = jax.jit(sharded)

    def forward(x):
        n = mesh.shape[DATA_AXIS]
        if x.shape[0] % n:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by data axis ({n})")
        return fwd(engine.weights, x)

    return forward


def _reject_mxu16(engine, what: str):
    """The sp/tp serving paths run the per-op float-dot MIXER body — they
    have no hooks for the mxu16 mode's quant_ut/quant_xt/but/yt requant
    chain, so serving such an engine through them would silently diverge
    from the single-chip forward. The DENSE sites are faithful here
    (engine_encode / the decoder quantized_dense / engine_layer_forward's
    GLU dots all consume the engine's frozen in_scales — so plain w8a8
    engines serve identically); DP wraps engine._apply and supports
    everything."""
    m = getattr(engine, "mxu16", None)
    if m and (m.get("mixer") or m.get("state") or m.get("requants")):
        raise NotImplementedError(
            f"{what} does not support the mxu16 engine mode — build the "
            "engine with mxu16=False, or use make_dp_forward")


def make_sp_forward(engine: W8A16Engine, mesh: Mesh):
    """Sequence-parallel engine.__call__ over ``mesh``. L must be
    divisible by mesh.shape[SEQ_AXIS]."""
    _reject_mxu16(engine, "make_sp_forward")
    cfg = engine.cfg

    def _chunk_forward(x_local):
        h = engine_encode(cfg, engine.encoder_kernel, engine.encoder_bias,
                          x_local, in_scale=engine.encoder_in_scale)
        for layer in engine.layers:
            def mixer(z, layer=layer):
                z = z.astype(jnp.float32)
                # int8 stays in HBM; dequant is traced inside the jit
                bu = z @ layer.wb_f32()
                p = layer.p
                xs = seq_chunk_scan(layer.lam, (bu[..., :p], bu[..., p:]),
                                    axis_name=SEQ_AXIS)
                xs = state_activation(cfg, xs)
                return jnp.concatenate(xs, axis=-1) @ layer.wc_f32() \
                    + layer.d * z

            h = engine_layer_forward(cfg, layer, h, mixer,
                                     act_dtype=engine.act_dtype)
        return quantized_dense(h, engine.decoder_kernel,
                               engine.decoder_bias,
                               engine.decoder_in_scale)

    spec = P(None, SEQ_AXIS, None)
    sharded = jax.shard_map(_chunk_forward, mesh=mesh,
                            in_specs=spec, out_specs=spec)
    return jax.jit(sharded)


def make_tp_forward(engine: W8A16Engine, mesh: Mesh):
    """Tensor-parallel engine forward: the SSM state dim P sharded over the
    MODEL axis."""
    _reject_mxu16(engine, "make_tp_forward")
    cfg = engine.cfg

    def _chunk_forward(x, *layer_shards):
        # layer_shards: per-layer (lam_re, lam_im, w_b_shard, w_c_shard)
        h = engine_encode(cfg, engine.encoder_kernel, engine.encoder_bias,
                          x, in_scale=engine.encoder_in_scale)
        for layer, shard in zip(engine.layers, layer_shards):
            lam_re, lam_im, w_b_s, w_c_s = shard

            def mixer(z, layer=layer, lam_re=lam_re, lam_im=lam_im,
                      w_b_s=w_b_s, w_c_s=w_c_s):
                z = z.astype(jnp.float32)
                p_loc = w_b_s.shape[-1] // 2
                bu = z @ w_b_s
                xs = associative_diag_scan(
                    (lam_re, lam_im), (bu[..., :p_loc], bu[..., p_loc:]))
                xs = state_activation(cfg, xs)
                y_part = jnp.concatenate(xs, axis=-1) @ w_c_s
                return jax.lax.psum(y_part, MODEL_AXIS) + layer.d * z

            h = engine_layer_forward(cfg, layer, h, mixer,
                                     act_dtype=engine.act_dtype)
        return quantized_dense(h, engine.decoder_kernel,
                               engine.decoder_bias,
                               engine.decoder_in_scale)

    # Pre-split each layer's P-dim operands into shard-layout arrays
    # (dequantized: TP shards the float operands — the int8 packing is a
    # per-chip serving optimization, kept out of the cross-chip layout).
    shard_args = []
    for layer in engine.layers:
        p = layer.p
        w_b, w_c = layer.wb_f32(), layer.wc_f32()
        shard_args.append((layer.lam[0], layer.lam[1],
                           w_b[:, :p], w_b[:, p:],
                           w_c[:p, :], w_c[p:, :]))

    lam_spec = P(MODEL_AXIS)
    in_layer_specs = tuple(
        (lam_spec, lam_spec,
         P(None, MODEL_AXIS), P(None, MODEL_AXIS),
         P(MODEL_AXIS, None), P(MODEL_AXIS, None))
        for _ in engine.layers)

    def _wrapper(x, *args):
        packed = []
        for (lam_re, lam_im, wb_re, wb_im, wc_re, wc_im) in args:
            packed.append((lam_re, lam_im,
                           jnp.concatenate([wb_re, wb_im], axis=-1),
                           jnp.concatenate([wc_re, wc_im], axis=0)))
        return _chunk_forward(x, *packed)

    sharded = jax.shard_map(
        _wrapper, mesh=mesh,
        in_specs=(P(),) + in_layer_specs,
        out_specs=P())
    f = jax.jit(sharded)
    return lambda x: f(x, *shard_args)
