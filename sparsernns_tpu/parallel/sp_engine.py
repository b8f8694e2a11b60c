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
