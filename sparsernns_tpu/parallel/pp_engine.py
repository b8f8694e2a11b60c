"""Pipeline-parallel engine inference: contiguous layer groups (stages)
live on different chips of the MODEL mesh axis, and TIME CHUNKS flow
stage-to-stage through a `ppermute` ring while each stage's SSM carries
stay chip-local.

Why time chunks (not microbatches): an S5 layer is a recurrence over
time, so chunk c+1 of stage s needs stage s's carry from chunk c — which
is exactly the GPipe schedule with the batch dim replaced by time, and
with ZERO recomputation or stashing: the carry (B, P) is the only state.
Chunked scans with carries are bit-identical to the whole-sequence scan
(the same property the streaming path rests on), so the pipeline output
matches the single-chip per-op engine to float tolerance.

Cross-chip traffic: one (B, L/C, H) activation chunk per tick over ICI
(the classic pipeline transfer), plus one final psum that replicates the
(B, L, F) output from the last stage. Pipeline bubble: (S-1)/(C+S-1) of
ticks, amortized by C >> S.

No reference equivalent (single-device only; SURVEY.md §2.2) —
greenfield TPU capability, same family as sp_engine's SP/TP serving.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from sparsernns_tpu.ops.scan import (apply_carry, associative_diag_scan)
from sparsernns_tpu.parallel.mesh import MODEL_AXIS
from sparsernns_tpu.parallel.sp_engine import _reject_mxu16
from sparsernns_tpu.quantize.engine import (W8A16Engine, engine_encode,
                                            quantized_dense,
                                            state_activation)


def _make_pp_forward_mpmd(engine: W8A16Engine, mesh: Mesh,
                          chunks: Optional[int] = None):
    """Pipeline-parallel serving for the bit-faithful mxu16 engine:
    host-scheduled MPMD — each stage is its OWN jitted program
    (engine._apply_chunk over its layer range) pinned to its mesh device
    by committed inputs, with time chunks handed stage-to-stage via
    device_put and SSM carries staying stage-local.

    Why MPMD and not the float path's single shard_map program: the int
    route bakes per-layer requant/scale constants (frozen grids) into
    the compiled kernels, and they differ across layers — one SPMD
    program would need them uniform across stages. Per-stage programs
    keep each stage's constants exactly as the single-chip engine
    compiles them, so the pipeline output is BIT-IDENTICAL to
    single-chip chunked serving (process_chunk) at the same chunk size —
    the same carry-exactness the streaming path rests on. Dispatch is
    asynchronous, so in steady state all stages execute concurrently
    (the classic GPipe overlap); per-tick cross-device traffic is one
    (B, L/C, H_pad) activation chunk, same as the shard_map route.

    No reference equivalent (single-device only; SURVEY.md §2.2)."""
    from functools import partial

    n_stages = mesh.shape[MODEL_AXIS]
    n_layers = len(engine.layers)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not partition into "
                         f"{n_stages} stages")
    per = n_layers // n_stages
    n_chunks = chunks if chunks is not None else 2 * n_stages
    axis = mesh.axis_names.index(MODEL_AXIS)
    devs = np.moveaxis(mesh.devices, axis, 0).reshape(n_stages, -1)[:, 0]

    stage_fns = []
    stage_weights = []
    for s in range(n_stages):
        lo, hi = s * per, (s + 1) * per
        stage_fns.append(jax.jit(partial(
            engine._apply_chunk, block_t=engine.block_t, lo=lo,
            encode=(s == 0), decode=(s == n_stages - 1))))
        # ship each stage ONLY its layer slice (encoder/decoder tensors
        # are small; they ride along so the weights pytree keeps the
        # structure _apply_chunk expects)
        w = dict(engine.weights)
        w["layers"] = list(w["layers"][lo:hi])
        stage_weights.append(jax.device_put(w, devs[s]))

    def forward(x):
        b, l, _ = x.shape
        if l % n_chunks:
            raise ValueError(
                f"L={l} not divisible by {n_chunks} chunks")
        lc = l // n_chunks
        carries = engine.init_stream_state(b)
        stage_carries = [
            jax.device_put(tuple(carries[s * per:(s + 1) * per]), devs[s])
            for s in range(n_stages)]
        x_chunks = [jax.device_put(x[:, c * lc:(c + 1) * lc], devs[0])
                    for c in range(n_chunks)]
        outs = [None] * n_chunks
        handoff = [None] * n_stages   # stage s's output awaiting stage s+1
        # GPipe over time: tick t runs chunk t-s on stage s; stages are
        # visited LAST-first so each consumes the handoff produced on the
        # previous tick before it is overwritten. Dispatch is async —
        # the host races ahead and the devices overlap for real.
        for t in range(n_chunks + n_stages - 1):
            for s in reversed(range(n_stages)):
                c = t - s
                if not 0 <= c < n_chunks:
                    continue
                inp = (x_chunks[c] if s == 0
                       else jax.device_put(handoff[s - 1], devs[s]))
                out, stage_carries[s] = stage_fns[s](
                    stage_weights[s], inp, stage_carries[s])
                if s == n_stages - 1:
                    outs[c] = out
                else:
                    handoff[s] = out
        return jnp.concatenate(outs, axis=1)

    return forward


def _uniform(vals, what: str):
    """All layers must share the value (stages run one SPMD program)."""
    if len(set(vals)) > 1:
        raise NotImplementedError(
            f"make_pp_forward requires uniform per-layer {what}, got "
            f"{vals}")
    return vals[0]


def make_pp_forward(engine: W8A16Engine, mesh: Mesh,
                    chunks: Optional[int] = None):
    """Pipeline the engine's layers over ``mesh.shape[MODEL_AXIS]``
    stages. ``n_layers`` must divide evenly into stages; layer operand
    shapes must be uniform (state compaction off or uniform). Returns
    ``forward(x (B, L, d_in)) -> (B, L, d_out)`` with L divisible by
    ``chunks`` (default ``2 * n_stages``).

    mxu16 engines route to the MPMD schedule (_make_pp_forward_mpmd):
    unlike SP — where chunk states are computed in parallel without the
    true carry, which per-step requantization makes unrecoverable
    (PARITY.md) — PP stages own whole layers and process time chunks
    SEQUENTIALLY with the true carry in hand, so the bit-faithful int
    kernels run unchanged per stage."""
    m = getattr(engine, "mxu16", None)
    if m and (m.get("mixer") or m.get("state") or m.get("requants")):
        return _make_pp_forward_mpmd(engine, mesh, chunks)
    cfg = engine.cfg
    n_stages = mesh.shape[MODEL_AXIS]
    layers = engine.layers
    n_layers = len(layers)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not partition into "
                         f"{n_stages} stages")
    per = n_layers // n_stages
    n_chunks = chunks if chunks is not None else 2 * n_stages

    # ---- stack per-layer operands into (S, per, ...) arrays ----------
    p = _uniform([lp.lam[0].shape[0] for lp in layers], "state dim P")
    del p
    rq_bits = _uniform(
        [None if lp.residual_requant is None else lp.residual_requant[1]
         for lp in layers], "residual_requant bits")
    in_bits = _uniform(
        [None if lp.out2_in_scale is None else lp.out2_in_scale[1]
         for lp in layers], "out2 in_scale bits")
    if cfg.glu_variant not in ("half1", "none"):
        raise NotImplementedError(
            f"make_pp_forward supports glu half1/none, got "
            f"{cfg.glu_variant}")
    with_glu = cfg.glu_variant == "half1"
    if cfg.topk < 1.0:
        raise NotImplementedError("make_pp_forward does not support top-k")

    def stack(get):
        rows = [np.stack([np.asarray(get(layers[s * per + j]))
                          for j in range(per)])
                for s in range(n_stages)]
        return jnp.asarray(np.stack(rows))  # (S, per, ...)

    ops = dict(
        lam_re=stack(lambda lp: lp.lam[0]),
        lam_im=stack(lambda lp: lp.lam[1]),
        w_b=stack(lambda lp: lp.wb_f32()),
        w_c=stack(lambda lp: lp.wc_f32()),
        d=stack(lambda lp: lp.d),
        norm_w=stack(lambda lp: lp.norm_w),
        norm_b=stack(lambda lp: lp.norm_b),
    )
    if with_glu:
        from sparsernns_tpu.quantize.engine import _deq
        ops["out2_k"] = stack(lambda lp: _deq(lp.out2_kernel))
        ops["out2_b"] = stack(lambda lp: lp.out2_bias)
        if in_bits is not None:
            ops["out2_s"] = stack(
                lambda lp: np.float32(lp.out2_in_scale[0]))
    if rq_bits is not None:
        ops["rq_s"] = stack(
            lambda lp: np.float32(lp.residual_requant[0]))

    names = sorted(ops)
    stage_args = [ops[n] for n in names]
    stage_specs = tuple(P(MODEL_AXIS) for _ in names)

    def _fq(h, scale, bits):
        """Value-form quantize-dequantize (fused_layer._qdq with a
        traced scale)."""
        qmax = float(2 ** (bits - 1) - 1)
        return jnp.clip(jnp.round(h / scale), -(qmax + 1.0), qmax) * scale

    def _layer(h, o, j, carry):
        """One serving layer (engine_layer_forward's float body) on a
        time chunk, threading the scan carry. ``o``: this stage's
        stacked operands (leading (per,) dim), ``j``: layer-in-stage."""
        skip = h
        z = h * o["norm_w"][j] + o["norm_b"][j] if cfg.prenorm else h
        zf = z.astype(jnp.float32)
        bu = zf @ o["w_b"][j]
        pp = bu.shape[-1] // 2
        lam = (o["lam_re"][j], o["lam_im"][j])
        xs = associative_diag_scan(lam, (bu[..., :pp], bu[..., pp:]))
        xs = apply_carry(xs, lam, carry)
        new_carry = (xs[0][..., -1, :], xs[1][..., -1, :])
        xs = state_activation(cfg, xs)
        y = jnp.concatenate(xs, axis=-1) @ o["w_c"][j] + o["d"][j] * zf

        if cfg.relufication:
            x1 = jax.nn.relu(y)
        else:
            x1 = jax.nn.gelu(y)
        if with_glu:
            g_in = (_fq(x1, o["out2_s"][j], in_bits)
                    if in_bits is not None else x1)
            gate = jax.nn.sigmoid(g_in @ o["out2_k"][j] + o["out2_b"][j])
            h = x1 * gate
        else:
            h = x1
        h = h + skip
        if not cfg.prenorm:
            h = h * o["norm_w"][j] + o["norm_b"][j]
        if cfg.relufication:
            h = jax.nn.relu(h)
        if rq_bits is not None:
            h = _fq(h, o["rq_s"][j], rq_bits)
        return h, new_carry

    def _pipeline(x, *flat_ops):
        o = {n: a[0] for n, a in zip(names, flat_ops)}  # drop stage dim
        stage = lax.axis_index(MODEL_AXIS)
        b, l, _ = x.shape
        lc = l // n_chunks
        h_dim = engine.encoder_bias.shape[0]
        d_out = engine.decoder_bias.shape[0]
        pp = o["w_b"].shape[-1] // 2

        def _v(a):
            # mark as varying over the stage axis (the loop carry types
            # must match the stage-dependent outputs)
            if hasattr(lax, "pcast"):
                return lax.pcast(a, MODEL_AXIS, to="varying")
            return lax.pvary(a, MODEL_AXIS)

        carries0 = tuple(
            (_v(jnp.zeros((b, pp), jnp.float32)),
             _v(jnp.zeros((b, pp), jnp.float32)))
            for _ in range(per))
        out0 = _v(jnp.zeros((b, l, d_out), jnp.float32))
        h0 = _v(jnp.zeros((b, lc, h_dim), jnp.float32))

        def tick(t, state):
            h_in, carries, out = state
            c = t - stage                       # chunk index at this stage
            valid = jnp.logical_and(c >= 0, c < n_chunks)

            # stage 0 sources its chunk from the encoder each tick
            c0 = jnp.clip(t, 0, n_chunks - 1)
            x_chunk = lax.dynamic_slice_in_dim(x, c0 * lc, lc, axis=1)
            h_enc = engine_encode(cfg, engine.encoder_kernel,
                                  engine.encoder_bias, x_chunk,
                                  in_scale=engine.encoder_in_scale)
            h = jnp.where(stage == 0, h_enc.astype(jnp.float32),
                          h_in.astype(jnp.float32))

            new_carries = []
            for j in range(per):
                h, nc = _layer(h, o, j, carries[j])
                new_carries.append((
                    jnp.where(valid, nc[0], carries[j][0]),
                    jnp.where(valid, nc[1], carries[j][1])))

            # last stage: decode + write chunk c into the output slab
            y = quantized_dense(h, engine.decoder_kernel,
                                engine.decoder_bias,
                                engine.decoder_in_scale)
            cw = jnp.clip(c, 0, n_chunks - 1)
            write = jnp.logical_and(valid, stage == n_stages - 1)
            out = jnp.where(
                write,
                lax.dynamic_update_slice(out, y, (0, cw * lc, 0)), out)

            # hand the processed chunk to the next stage
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            h_next = lax.ppermute(
                jnp.where(valid, h, jnp.zeros_like(h)), MODEL_AXIS, perm)
            return h_next, tuple(new_carries), out

        _, _, out = lax.fori_loop(0, n_chunks + n_stages - 1, tick,
                                  (h0, carries0, out0))
        # replicate the last stage's slab (others contribute zeros)
        return lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)),
            MODEL_AXIS)

    sharded = jax.shard_map(
        _pipeline, mesh=mesh,
        in_specs=(P(),) + stage_specs,
        out_specs=P())
    f = jax.jit(sharded)

    def forward(x):
        if x.shape[1] % n_chunks:
            raise ValueError(
                f"L={x.shape[1]} not divisible by {n_chunks} chunks")
        return f(x, *stage_args)

    return forward
