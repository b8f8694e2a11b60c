"""Whole-layer TRAINING kernel: S5 mixer + GLU + residual in one Pallas
call, with a rematerializing custom VJP.

The serving engine already fuses whole layers (fused_layer.py), but the
training path fused only the mixer (fused_s5.py + fused_vjp.py): the GLU
gate, dropout, residual add and relufication ran as XLA ops, each
materializing (B, L, H) intermediates in HBM — and standard autodiff
additionally SAVES several of them (x1, the sigmoid output, the mixer
output) as residuals for the backward. This kernel runs everything after
the norm in one pass per (batch, time-block):

    z_blk --MXU--> bu = z @ W_b --VPU--> xs = scan(λ, bu)   (VMEM)
          --MXU--> y = [xs] @ W_c + D ⊙ z
          --VPU--> x1 = act(y) ⊙ m1        (dropout mask, broadcast in L)
          --MXU--> gate = σ(x1 @ W2 + b2)  (GLU)
          --VPU--> out = base ⊙ gate ⊙ m2 + skip   [+ relu]

so forward HBM traffic per layer is read z + read skip + write out, and
the custom VJP saves ONLY the inputs — the backward rematerializes the
chain (two extra Pallas scans + XLA matmuls, the jax.checkpoint trade).

The norm stays OUTSIDE (flax BatchNorm/LayerNorm): BatchNorm's training
statistics reduce over (B, L) — across time blocks AND across the
data-parallel mesh axis — which cannot live inside an independent
per-block grid step.

Layer semantics mirrored exactly: models/layers.py SequenceLayer.__call__
(reference analog /root/reference/sparseRNNs/model/layers.py:180-241 +
ssm.py:84-187); the single-pass training fusion itself has no reference
counterpart — it is the TPU-native answer to the HBM-bandwidth bound.

Supported: prenorm, glu ∈ {full, half1, half2, none}, relu/gelu
activation, relu_state (mixer relufication), layer relufication, dropout
via precomputed broadcast masks, float path only (the QAT and
static-quant paths keep their existing kernel/faithful routes).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsernns_tpu.ops.scan import Pair

GLU_KINDS = ("full", "half1", "half2", "none")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tail_geometry(l: int, h: int, block_t: int):
    """(t, l_pad, h_pad) kernel geometry for a (B, l, h) stream — the ONE
    formula shared by the per-layer pads, the padded-stream stack path
    (seq_model.py) and the backward kernel."""
    t = min(block_t, _round_up(l, 8))
    return t, _round_up(l, t), _round_up(h, 128)


def _act(y, act: str):
    return jnp.maximum(y, 0.0) if act == "relu" else jax.nn.gelu(y)


def _make_tail_kernel(glu: str, act: str, with_m1: bool, with_m2: bool,
                      affine: bool, *, num_passes: int, block_t: int,
                      relu_state: bool, layer_relu: bool, true_l=None):
    # ``affine``: the stream operand is the RAW layer input x, read once;
    # the norm is applied in-kernel as the per-feature affine (nw, nb)
    # computed outside from the batch statistics (BatchNorm folds to an
    # affine once mean/var are known — the stats reduction is the only
    # thing that must happen before the kernel). Non-affine (LayerNorm):
    # separate normed ``z`` and residual ``skip`` streams.
    names = ["z"] if affine else ["z", "skip"]
    if affine:
        names += ["nw", "nb"]
    if with_m1:
        names.append("m1")
    if with_m2:
        names.append("m2")
    names += ["wb", "wc", "d", "pow_re", "pow_im", "ctab_re", "ctab_im"]
    if glu in ("full", "half1", "half2"):
        names += ["o2k", "o2b"]
    if glu == "full":
        names += ["o1k", "o1b"]

    def kernel(*all_refs):
        from sparsernns_tpu.ops.pallas.scan_kernel import scan_block_body
        refs = dict(zip(names, all_refs[: len(names)]))
        out_ref = all_refs[len(names)]
        carry_re, carry_im = all_refs[len(names) + 1:]
        j = pl.program_id(1)

        z = refs["z"][0].astype(jnp.float32)        # (T, Hp)
        if affine:
            skip = z
            z = z * refs["nw"][...] + refs["nb"][...]
        else:
            skip = refs["skip"][0].astype(jnp.float32)

        # ---- mixer (fused_s5 semantics) ----
        bu = jnp.dot(z, refs["wb"][...], preferred_element_type=jnp.float32)
        p = bu.shape[-1] // 2
        x_re, x_im = scan_block_body(
            bu[:, :p], bu[:, p:], refs["pow_re"], refs["pow_im"],
            refs["ctab_re"], refs["ctab_im"], carry_re, carry_im, j,
            num_passes=num_passes, block_t=block_t)
        if relu_state:
            x_re = jnp.maximum(x_re, 0.0)
            x_im = jnp.maximum(x_im, 0.0)
        xs_cat = jnp.concatenate([x_re, x_im], axis=-1)
        y = jnp.dot(xs_cat, refs["wc"][...],
                    preferred_element_type=jnp.float32)
        y = y + refs["d"][...] * z

        # ---- GLU + dropout + residual (SequenceLayer order) ----
        x1 = _act(y, act)
        if with_m1:
            x1 = x1 * refs["m1"][0]
        if glu != "none":
            s = jnp.dot(x1, refs["o2k"][...],
                        preferred_element_type=jnp.float32)
            gate = jax.nn.sigmoid(s + refs["o2b"][...])
            if glu == "half1":
                base = x1
            elif glu == "half2":
                base = y
            else:
                base = jnp.dot(x1, refs["o1k"][...],
                               preferred_element_type=jnp.float32)
                base = base + refs["o1b"][...]
            h = base * gate
            if with_m2:
                h = h * refs["m2"][0]
        else:
            h = x1
        o = h + skip
        if layer_relu:
            o = jnp.maximum(o, 0.0)
        if true_l is not None:
            # padded-stream mode: keep the L-pad rows EXACTLY zero (the
            # scan carry evolves through them, so untouched they would
            # leak nonzero values into the next layer's BatchNorm sums)
            rows = (jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
                    + j * block_t)
            o = jnp.where(rows < true_l, o, 0.0)
        # single store-time rounding onto the stream dtype (bf16 streams
        # halve the inter-layer HBM traffic; compute stays f32 in VMEM)
        out_ref[0] = o.astype(out_ref.dtype)

    return kernel, names


@functools.partial(
    jax.jit, static_argnames=("block_t", "act", "glu", "relu_state",
                              "layer_relu", "pre_padded", "true_l",
                              "interpret"))
def fused_layer_tail(
    z: jax.Array,                 # (B, L, H): normed input, or the RAW
                                  # layer input when (nw, nb) are given
    skip: Optional[jax.Array],    # (B, L, H) residual input; None in
                                  # affine mode (the raw input is both)
    lam: Pair,                    # (P,) pair — discretized λ̄
    w_b: jax.Array,               # (H, 2P) stacked [B̄_re^T | B̄_im^T]
    w_c: jax.Array,               # (2P, H) stacked [C̃_re^T; -C̃_im^T] (conj
                                  # 2x pre-folded)
    d: jax.Array,                 # (H,)
    o2k: Optional[jax.Array] = None,   # (H, H) GLU gate dense
    o2b: Optional[jax.Array] = None,
    o1k: Optional[jax.Array] = None,   # (H, H) "full" value dense
    o1b: Optional[jax.Array] = None,
    m1: Optional[jax.Array] = None,    # (B, 1, H) dropout mask (prescaled)
    m2: Optional[jax.Array] = None,    # (B, 1, H)
    nw: Optional[jax.Array] = None,    # (H,) in-kernel norm affine (BN
    nb: Optional[jax.Array] = None,    # folded from batch statistics)
    *,
    block_t: int = 256,
    act: str = "gelu",
    glu: str = "none",
    relu_state: bool = False,
    layer_relu: bool = False,
    pre_padded: bool = False,
    true_l: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """out = residual(skip, GLU(act(mixer(norm(x))))) in one kernel,
    (B, L, H). In affine mode (nw/nb given) the stream is read ONCE —
    the norm affine and the residual both use the raw input in VMEM.

    ``pre_padded``: the stream already lives in the kernel geometry
    (B, L_pad, H_pad) — no pad/slice round trip per layer; the output
    stays padded and the kernel zeroes the L-pad rows (``true_l``) so
    the padded-stream invariant holds across a layer stack
    (seq_model.py padded-stream fast path)."""
    assert glu in GLU_KINDS, glu
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with_m1, with_m2 = m1 is not None, m2 is not None
    affine = nw is not None
    assert affine == (skip is None), "affine mode takes the raw x only"

    extra = ([nw, nb] if affine else [])
    extra += [a for a in (m1, m2, o2k, o2b, o1k, o1b) if a is not None]
    streams = (z,) if affine else (z, skip)

    def body(*flat):
        from sparsernns_tpu.ops.pallas.fused_layer import pad_layer_ops
        it = iter(flat)
        z = next(it)
        skip = None if affine else next(it)
        lam_re, lam_im, w_b, w_c, d = (next(it) for _ in range(5))
        enw = next(it) if affine else None
        enb = next(it) if affine else None
        em1 = next(it) if with_m1 else None
        em2 = next(it) if with_m2 else None
        eo2 = (next(it), next(it)) if glu != "none" else None
        eo1 = (next(it), next(it)) if glu == "full" else None

        b, l, h = z.shape
        if pre_padded:
            h = w_b.shape[0]
            l_pad, h_pad = l, z.shape[-1]
            t = min(block_t, l_pad)
            assert l_pad % t == 0 and h_pad % 128 == 0, (z.shape, block_t)
        else:
            t, l_pad, h_pad = tail_geometry(l, h, block_t)
            if l_pad != l or h_pad != h:
                pad = ((0, 0), (0, l_pad - l), (0, h_pad - h))
                z = jnp.pad(z, pad)
                if skip is not None:
                    skip = jnp.pad(skip, pad)
        if not interpret:
            # pin the kernel operands row-major (fused_network's rule):
            # at B=32 XLA otherwise picks a time-minor layout for the
            # big (B, L, H) streams and brackets the Pallas call with
            # relayout copies — measured 17% of the tail forward at the
            # recipe batch (tools/bwd_probe.py tail_fwd vs tail_fwd_pin)
            from jax.experimental.layout import (Layout,
                                                 with_layout_constraint)
            z = with_layout_constraint(z, Layout((0, 1, 2)))
            if skip is not None:
                skip = with_layout_constraint(skip, Layout((0, 1, 2)))
        # pad_layer_ops packs weights/λ tables to the kernel geometry; its
        # norm slots carry the affine (identity placeholders when unused).
        ops, p_pad, num_passes = pad_layer_ops(
            (lam_re, lam_im), w_b, w_c, d,
            enw if affine else jnp.ones((h,), jnp.float32),
            enb if affine else jnp.zeros((h,), jnp.float32),
            eo2, eo1, h_pad, t)

        operands = {"z": z}
        if not affine:
            operands["skip"] = skip
        else:
            operands["nw"] = ops["nw"]
            operands["nb"] = ops["nb"]
        if with_m1:
            operands["m1"] = jnp.pad(em1, ((0, 0), (0, 0), (0, h_pad - h)))
        if with_m2:
            operands["m2"] = jnp.pad(em2, ((0, 0), (0, 0), (0, h_pad - h)))
        operands.update(
            wb=ops["wb"], wc=ops["wc"], d=ops["d"],
            pow_re=ops["pow_re"], pow_im=ops["pow_im"],
            ctab_re=ops["ctab_re"], ctab_im=ops["ctab_im"])
        if glu != "none":
            operands.update(o2k=ops["out2_k"], o2b=ops["out2_b"])
        if glu == "full":
            operands.update(o1k=ops["out1_k"], o1b=ops["out1_b"])

        kernel, names = _make_tail_kernel(
            glu, act, with_m1, with_m2, affine, num_passes=num_passes,
            block_t=t, relu_state=relu_state, layer_relu=layer_relu,
            true_l=true_l if pre_padded else None)

        io_block = pl.BlockSpec((1, t, h_pad), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        mask_block = pl.BlockSpec((1, 1, h_pad), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)

        def spec(n):
            if n in ("z", "skip"):
                return io_block
            if n in ("m1", "m2"):
                return mask_block
            return full(operands[n])

        out = pl.pallas_call(
            kernel,
            grid=(b, l_pad // t),
            in_specs=[spec(n) for n in names],
            out_specs=io_block,
            # the output stream keeps the input stream's dtype (bf16
            # streams halve the layer's read+write HBM traffic)
            out_shape=jax.ShapeDtypeStruct((b, l_pad, h_pad), z.dtype),
            scratch_shapes=[pltpu.VMEM((1, p_pad), jnp.float32),
                            pltpu.VMEM((1, p_pad), jnp.float32)],
            interpret=interpret,
        )(*[operands[n] for n in names])
        return out if pre_padded else out[:, :l, :h]

    from sparsernns_tpu.ops.pallas.fused_layer import _gen_rule
    from sparsernns_tpu.ops.pallas.partition import batch_partitioned
    # args: z(b,l,h) [skip(b,l,h)] lam_re(p) lam_im(p) wb(h,2p) wc(2p,h)
    #       d(h) [nw(h) nb(h)] [m1(b,1,h)] [m2(b,1,h)]
    #       [o2k(h,h) o2b(h)] [o1k(h,h) o1b(h)]
    nds = [3] + ([] if affine else [3]) + [1, 1, 2, 2, 1]
    batch_args = [0] if affine else [0, 1]
    if affine:
        nds += [1, 1]
    for a in (m1, m2):
        if a is not None:
            batch_args.append(len(nds))
            nds.append(3)
    if glu != "none":
        nds += [2, 1]
    if glu == "full":
        nds += [2, 1]
    rule, repl = _gen_rule(nds, [3], batch_args)
    return batch_partitioned(body, rule, repl, batch_args=tuple(batch_args))(
        *streams, lam[0], lam[1], w_b, w_c, d, *extra)


# --------------------------------------------------------------------------
# Differentiable wrapper: remat backward (XLA matmuls + two Pallas scans).
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(14, 15, 16, 17, 18, 19, 20))
def fused_layer_tail_diff(z, skip, lam: Pair, w_b, w_c, d,
                          o2k, o2b, o1k, o1b, m1, m2, nw, nb,
                          block_t: int = 256, act: str = "gelu",
                          glu: str = "none", relu_state: bool = False,
                          layer_relu: bool = False,
                          pre_padded: bool = False,
                          true_l: Optional[int] = None):
    """Differentiable whole-layer tail. Forward = one Pallas kernel that
    saves only its inputs; backward = the reverse-time adjoint kernel
    (fused_layer_bwd.py; XLA remat under SPARSERNNS_XLA_TAIL_BWD=1). In
    affine mode (nw/nb arrays, skip=None) gradients flow to nw/nb — and
    from there through the caller's batch-statistics computation back to
    x, so BatchNorm training gradients come out of plain autodiff."""
    return fused_layer_tail(
        z, skip, lam, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2, nw, nb,
        block_t=block_t, act=act, glu=glu, relu_state=relu_state,
        layer_relu=layer_relu, pre_padded=pre_padded, true_l=true_l)


def _fwd(z, skip, lam, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2, nw, nb,
         block_t, act, glu, relu_state, layer_relu, pre_padded, true_l):
    out = fused_layer_tail(
        z, skip, lam, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2, nw, nb,
        block_t=block_t, act=act, glu=glu, relu_state=relu_state,
        layer_relu=layer_relu, pre_padded=pre_padded, true_l=true_l)
    return out, (z, skip, lam, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2,
                 nw, nb)


def _act_and_grad(y, act: str):
    if act == "relu":
        x1 = jnp.maximum(y, 0.0)
        return x1, (y > 0).astype(y.dtype)
    x1, vjp = jax.vjp(jax.nn.gelu, y)
    return x1, vjp(jnp.ones_like(y))[0]


def _bwd(block_t, act, glu, relu_state, layer_relu, pre_padded, true_l,
         res, g):
    import os

    from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan
    z, skip, lam, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2, nw, nb = res
    if os.environ.get("SPARSERNNS_XLA_TAIL_BWD") != "1":
        # Adjoint KERNEL: one reverse-time Pallas pass recomputes the
        # chain per block in VMEM and emits every gradient — layer
        # backward HBM traffic collapses to read z + read g + write g_x
        # (fused_layer_bwd.py). The XLA rematerialization below remains
        # as the reference implementation (SPARSERNNS_XLA_TAIL_BWD=1).
        from sparsernns_tpu.ops.pallas.fused_layer_bwd import fused_tail_bwd
        return fused_tail_bwd(
            z, skip, lam, w_b, w_c, d, o2k, o2b, o1k, o1b, m1, m2, nw, nb,
            g, block_t=block_t, act=act, glu=glu, relu_state=relu_state,
            layer_relu=layer_relu, pre_padded=pre_padded, true_l=true_l)
    pad_back = None
    if pre_padded:
        # XLA reference path on a padded stream: compute on the true
        # window, zero-pad the stream cotangents back at the end.
        h_true = w_b.shape[0]
        lt = true_l if true_l is not None else z.shape[1]
        pad_back = ((0, 0), (0, z.shape[1] - lt), (0, z.shape[2] - h_true))
        z = z[:, :lt, :h_true]
        if skip is not None:
            skip = skip[:, :lt, :h_true]
        g = g[:, :lt, :h_true]
    p = w_b.shape[-1] // 2
    axes = tuple(range(z.ndim - 1))
    affine = nw is not None
    # bf16 streams: math in f32, stream cotangents cast back at return
    # (custom_vjp requires cotangent dtypes to match the primal inputs)
    stream_dtype = z.dtype
    z = z.astype(jnp.float32)
    g = g.astype(jnp.float32)
    if skip is not None:
        skip = skip.astype(jnp.float32)
    x_raw = None
    if affine:
        x_raw, skip = z, z
        z = z * nw + nb

    # ---- rematerialize the forward chain ----
    bu = z @ w_b
    xs = pallas_diag_scan(lam, (bu[..., :p], bu[..., p:]), block_t=block_t)
    xs_cat = jnp.concatenate(xs, axis=-1)
    if relu_state:
        s_mask = (xs_cat > 0).astype(g.dtype)
        xs_act = xs_cat * s_mask
    else:
        xs_act = xs_cat
    y = xs_act @ w_c + d * z
    x1, dact = _act_and_grad(y, act)
    x1d = x1 * m1 if m1 is not None else x1
    if glu != "none":
        gate = jax.nn.sigmoid(x1d @ o2k + o2b)
        if glu == "half1":
            base = x1d
        elif glu == "half2":
            base = y
        else:
            base = x1d @ o1k + o1b
        h = base * gate
        hd = h * m2 if m2 is not None else h
    else:
        hd = x1d

    # ---- adjoint chain (top down) ----
    if layer_relu:
        g = g * ((hd + skip) > 0).astype(g.dtype)
    g_skip = g
    d_o2k = d_o2b = d_o1k = d_o1b = None
    d_m1 = d_m2 = None
    g_y_extra = None
    if glu != "none":
        g_h = g
        if m2 is not None:
            d_m2 = jnp.sum(g * h, axis=1, keepdims=True)
            g_h = g * m2
        g_base = g_h * gate
        g_s = (g_h * base) * gate * (1.0 - gate)
        d_o2k = jnp.einsum("...h,...q->hq", x1d, g_s)
        d_o2b = jnp.sum(g_s, axis=axes)
        g_x1d = g_s @ o2k.T
        if glu == "half1":
            g_x1d = g_x1d + g_base
        elif glu == "half2":
            g_y_extra = g_base
        else:
            d_o1k = jnp.einsum("...h,...q->hq", x1d, g_base)
            d_o1b = jnp.sum(g_base, axis=axes)
            g_x1d = g_x1d + g_base @ o1k.T
    else:
        g_x1d = g
    g_x1 = g_x1d
    if m1 is not None:
        d_m1 = jnp.sum(g_x1d * x1, axis=1, keepdims=True)
        g_x1 = g_x1d * m1
    g_y = g_x1 * dact
    if g_y_extra is not None:
        g_y = g_y + g_y_extra

    # ---- mixer adjoint (fused_vjp math, u -> z) ----
    g_xs = g_y @ w_c.T
    if relu_state:
        g_xs = g_xs * s_mask
    v = pallas_diag_scan((lam[0], -lam[1]), (g_xs[..., :p], g_xs[..., p:]),
                         reverse=True, block_t=block_t)
    v_cat = jnp.concatenate(v, axis=-1)
    g_z = v_cat @ w_b.T + g_y * d
    d_w_b = jnp.einsum("...h,...q->hq", z, v_cat)
    d_w_c = jnp.einsum("...q,...h->qh", xs_act, g_y)
    d_d = jnp.sum(g_y * z, axis=axes)

    def shift(a):
        pad = [(0, 0)] * a.ndim
        pad[-2] = (1, 0)
        return jnp.pad(a, pad)[..., :-1, :]

    xp_re, xp_im = shift(xs[0]), shift(xs[1])
    d_lam = (jnp.sum(v[0] * xp_re + v[1] * xp_im, axis=axes),
             jnp.sum(v[1] * xp_re - v[0] * xp_im, axis=axes))

    if affine:
        # z = x*nw + nb and skip = x: fold both paths into the x grad;
        # nw/nb cotangents continue through the caller's stats math.
        d_nw = jnp.sum(g_z * x_raw, axis=axes)
        d_nb = jnp.sum(g_z, axis=axes)
        g_x = g_z * nw + g_skip
        if pad_back is not None:
            g_x = jnp.pad(g_x, pad_back)
        return (g_x.astype(stream_dtype), None, d_lam, d_w_b, d_w_c, d_d,
                d_o2k, d_o2b, d_o1k, d_o1b, d_m1, d_m2, d_nw, d_nb)
    if pad_back is not None:
        g_z = jnp.pad(g_z, pad_back)
        g_skip = jnp.pad(g_skip, pad_back)
    return (g_z.astype(stream_dtype), g_skip.astype(stream_dtype),
            d_lam, d_w_b, d_w_c, d_d,
            d_o2k, d_o2b, d_o1k, d_o1b, d_m1, d_m2, None, None)


fused_layer_tail_diff.defvjp(_fwd, _bwd)
