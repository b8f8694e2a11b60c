"""Sequence-parallel inference: the whole S5 stack sharded over time.

Runs the W8A16/float engine forward with the sequence axis L sharded over
the SEQ mesh axis: every device processes its own time-chunk through ALL
layers, and each layer's scan carries combine across devices in
log2(n_seq) ppermute rounds (parallel/seqscan.py). Elementwise ops and
the B/C/GLU matmuls are embarrassingly parallel along time, so cross-chip
traffic per layer is O(P) — this is how a 30 s clip (or an unbounded
stream window) runs across a pod slice.

No reference equivalent (single-device only; SURVEY.md §2.2) — greenfield
TPU capability.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparsernns_tpu.parallel.mesh import SEQ_AXIS
from sparsernns_tpu.parallel.seqscan import seq_chunk_scan
from sparsernns_tpu.quantize.engine import W8A16Engine


def make_sp_forward(engine: W8A16Engine, mesh: Mesh):
    """Sequence-parallel version of engine.__call__ over ``mesh``.

    Returns fn(x (B, L, d_in)) with L divisible by mesh.shape[SEQ_AXIS].
    """
    cfg = engine.cfg

    def _layer(h_local, layer):
        skip = h_local
        z = h_local * layer.norm_w + layer.norm_b if cfg.prenorm else h_local
        z = z.astype(engine.act_dtype).astype(jnp.float32)

        bu = z @ layer.w_b
        p = layer.w_b.shape[-1] // 2
        xs = seq_chunk_scan(layer.lam, (bu[..., :p], bu[..., p:]),
                            axis_name=SEQ_AXIS)
        if cfg.relufication:  # state relu before C, matching the model
            xs = (jax.nn.relu(xs[0]), jax.nn.relu(xs[1]))
        y = jnp.concatenate(xs, axis=-1) @ layer.w_c + layer.d * z

        x1 = jax.nn.relu(y) if cfg.relufication else jax.nn.gelu(y)
        if cfg.glu_variant in ("half1", "half2", "full"):
            gate = jax.nn.sigmoid(x1 @ layer.out2_kernel + layer.out2_bias)
            base = x1 if cfg.glu_variant == "half1" else (
                y if cfg.glu_variant == "half2" else
                x1 @ layer.out1_kernel + layer.out1_bias)
            h_local = base * gate
        else:
            h_local = x1
        h_local = h_local + skip
        if not cfg.prenorm:
            h_local = h_local * layer.norm_w + layer.norm_b
        if cfg.relufication:
            h_local = jax.nn.relu(h_local)
        return h_local

    def _chunk_forward(x_local):
        h = x_local @ engine.encoder_kernel + engine.encoder_bias
        if cfg.relufication:
            h = jax.nn.relu(h)
        for layer in engine.layers:
            h = _layer(h, layer)
        return h @ engine.decoder_kernel + engine.decoder_bias

    spec = P(None, SEQ_AXIS, None)
    sharded = jax.shard_map(_chunk_forward, mesh=mesh,
                            in_specs=spec, out_specs=spec,
                            check_vma=False)
    return jax.jit(sharded)


def make_tp_forward(engine: W8A16Engine, mesh: Mesh):
    """Tensor-parallel engine forward: the SSM state dim P sharded over the
    MODEL axis. Each device scans its own P-shard (the diagonal recurrence
    is embarrassingly parallel over P); the B projection is column-parallel,
    the C projection row-parallel with one psum per layer. Dense layers
    replicate (they are H-sized and tiny next to the scan).
    """
    from sparsernns_tpu.parallel.mesh import MODEL_AXIS
    from sparsernns_tpu.ops.scan import associative_diag_scan
    cfg = engine.cfg
    n_model = mesh.shape[MODEL_AXIS]

    def _chunk_forward(x, *layer_shards):
        # layer_shards: per-layer (lam_re, lam_im, w_b_shard, w_c_shard)
        h = x @ engine.encoder_kernel + engine.encoder_bias
        if cfg.relufication:
            h = jax.nn.relu(h)
        for layer, (lam_re, lam_im, w_b_s, w_c_s) in zip(
                engine.layers, layer_shards):
            skip = h
            z = h * layer.norm_w + layer.norm_b if cfg.prenorm else h
            z = z.astype(engine.act_dtype).astype(jnp.float32)
            p_loc = w_b_s.shape[-1] // 2
            bu = z @ w_b_s
            xs = associative_diag_scan(
                (lam_re, lam_im), (bu[..., :p_loc], bu[..., p_loc:]))
            if cfg.relufication:  # state relu before C
                xs = (jax.nn.relu(xs[0]), jax.nn.relu(xs[1]))
            y_part = jnp.concatenate(xs, axis=-1) @ w_c_s
            y = jax.lax.psum(y_part, MODEL_AXIS) + layer.d * z
            x1 = jax.nn.relu(y) if cfg.relufication else jax.nn.gelu(y)
            if cfg.glu_variant in ("half1", "half2", "full"):
                gate = jax.nn.sigmoid(x1 @ layer.out2_kernel
                                      + layer.out2_bias)
                base = x1 if cfg.glu_variant == "half1" else (
                    y if cfg.glu_variant == "half2" else
                    x1 @ layer.out1_kernel + layer.out1_bias)
                h = base * gate
            else:
                h = x1
            h = h + skip
            if not cfg.prenorm:
                h = h * layer.norm_w + layer.norm_b
            if cfg.relufication:
                h = jax.nn.relu(h)
        return h @ engine.decoder_kernel + engine.decoder_bias

    # Pre-split each layer's P-dim operands into shard-layout arrays.
    shard_args = []
    for layer in engine.layers:
        p = layer.w_b.shape[-1] // 2
        # w_b columns (re|im halves independently), w_c rows likewise
        wb_re, wb_im = layer.w_b[:, :p], layer.w_b[:, p:]
        wc_re, wc_im = layer.w_c[:p, :], layer.w_c[p:, :]
        shard_args.append((layer.lam[0], layer.lam[1], wb_re, wb_im,
                           wc_re, wc_im))

    lam_spec = P(MODEL_AXIS)
    in_layer_specs = tuple(
        (lam_spec, lam_spec,
         P(None, MODEL_AXIS), P(None, MODEL_AXIS),
         P(MODEL_AXIS, None), P(MODEL_AXIS, None))
        for _ in engine.layers)

    def _wrapper(x, *args):
        # repack per-shard (re, im) halves into the kernel layouts
        packed = []
        for (lam_re, lam_im, wb_re, wb_im, wc_re, wc_im) in args:
            packed.append((lam_re, lam_im,
                           jnp.concatenate([wb_re, wb_im], axis=-1),
                           jnp.concatenate([wc_re, wc_im], axis=0)))
        return _chunk_forward(x, *packed)

    sharded = jax.shard_map(
        _wrapper, mesh=mesh,
        in_specs=(P(),) + in_layer_specs,
        out_specs=P(),
        check_vma=False)
    f = jax.jit(sharded)
    return lambda x: f(x, *shard_args)
