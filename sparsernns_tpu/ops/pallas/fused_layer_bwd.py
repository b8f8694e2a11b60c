"""Whole-layer TRAINING BACKWARD kernel: the adjoint of the layer tail
(fused_layer_train.py) in one Pallas pass per (batch, time-block).

The tail's custom VJP used to rematerialize the forward chain in XLA:
the train-step byte audit at the flagship shape showed ~18 GB of
(B, L, H)-shaped tensors materialized per step — bu, xs, y, x1, gate,
base, h and their cotangents, each round-tripping HBM. This kernel
recomputes the whole chain per time block IN VMEM (the jax.checkpoint
trade at block granularity) and emits the adjoints in the same pass, so
a layer's backward HBM traffic collapses to

    read z + read g + write g_x (+ the tiny weight-grad accumulators)

Two structural tricks make the single pass possible on a TPU grid:

1. **Block carry checkpoints**: recomputing block j's states needs the
   scan carry entering the block. A tiny forward pre-pass kernel
   (`_carry_hist`) re-reads z once and writes ONLY the per-block entry
   carries (B, n_blocks, P) — ~60 KB at flagship shape.
2. **Reverse-time grid**: the adjoint state recurrence v_t = g_t +
   λ* ⊙ v_{t+1} flows right-to-left, so the grid maps block j to time
   block (n_blocks-1-j); the adjoint carry lives in VMEM scratch across
   grid steps (scan_kernel.scan_block_body_rev) exactly like the forward
   carry does in the forward kernels.

Weight/λ/bias gradients accumulate across grid steps into outputs with
constant index maps (resident in VMEM, flushed once) — initialized at
the first grid step, `+=` afterwards. Per-batch dropout-mask gradients
accumulate per batch row the same way.

Semantics mirror fused_layer_train._bwd exactly (which remains available
as the XLA reference under SPARSERNNS_XLA_TAIL_BWD=1 and for configs the
kernel does not cover). Reference analog: none — the reference trains
with standard autodiff; this is the TPU answer to its HBM cost.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsernns_tpu.ops.scan import Pair


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dotT_accum(a, b):
    """aᵀ @ b over the time rows: (T, M) x (T, N) -> (M, N) on the MXU."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_rt(a, w):
    """a @ wᵀ: contract a's last dim with w's LAST dim -> (T, w.shape[0])."""
    return jax.lax.dot_general(a, w, (((a.ndim - 1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _rsum(x):
    """Sum over the time rows, keepdims -> (1, N)."""
    return jnp.sum(x, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Carry-checkpoint pre-pass: per-block entry carries, forward time order.
# ---------------------------------------------------------------------------


def _make_hist_kernel(affine: bool, *, num_passes: int, block_t: int):
    names = ["z"] + (["nw", "nb"] if affine else []) + [
        "wb", "pow_re", "pow_im", "ctab_re", "ctab_im"]

    def kernel(*all_refs):
        from sparsernns_tpu.ops.pallas.scan_kernel import scan_block_body
        refs = dict(zip(names, all_refs[: len(names)]))
        ch_re_ref, ch_im_ref = all_refs[len(names): len(names) + 2]
        carry_re, carry_im = all_refs[len(names) + 2:]
        j = pl.program_id(1)

        # entry carry of THIS block = scratch state before scanning it.
        # The history block holds ALL n_t rows (TPU tiling forbids a
        # (1, 1, P) block over a (B, n_t, P) array unless n_t % 8 == 0);
        # each grid step writes its own row j of the resident block.
        @pl.when(j == 0)
        def _():
            ch_re_ref[0, pl.ds(0, 1)] = jnp.zeros_like(carry_re[...])
            ch_im_ref[0, pl.ds(0, 1)] = jnp.zeros_like(carry_im[...])

        @pl.when(j > 0)
        def _():
            ch_re_ref[0, pl.ds(j, 1)] = carry_re[...]
            ch_im_ref[0, pl.ds(j, 1)] = carry_im[...]

        z = refs["z"][0].astype(jnp.float32)
        if affine:
            z = z * refs["nw"][...] + refs["nb"][...]
        bu = jnp.dot(z, refs["wb"][...], preferred_element_type=jnp.float32)
        p = bu.shape[-1] // 2
        scan_block_body(bu[:, :p], bu[:, p:], refs["pow_re"],
                        refs["pow_im"], refs["ctab_re"], refs["ctab_im"],
                        carry_re, carry_im, j,
                        num_passes=num_passes, block_t=block_t)

    return kernel, names


# ---------------------------------------------------------------------------
# The adjoint kernel: reverse-time grid, forward recompute per block.
# ---------------------------------------------------------------------------


def _make_bwd_kernel(glu: str, act: str, with_m1: bool, with_m2: bool,
                     affine: bool, *, num_passes: int, block_t: int,
                     relu_state: bool, layer_relu: bool,
                     true_l=None, n_t=None):
    from sparsernns_tpu.ops.pallas.fused_layer_train import _act_and_grad

    in_names = ["z", "g"] + ([] if affine else ["skip"])
    if affine:
        in_names += ["nw", "nb"]
    if with_m1:
        in_names.append("m1")
    if with_m2:
        in_names.append("m2")
    in_names += ["wb", "wc", "d", "pow_re", "pow_im", "ctab_re", "ctab_im",
                 "rpow_re", "rpow_im", "rtab_re", "rtab_im"]
    if glu in ("full", "half1", "half2"):
        in_names += ["o2k", "o2b"]
    if glu == "full":
        in_names += ["o1k", "o1b"]
    in_names += ["ch_re", "ch_im"]

    out_names = ["gx"] + ([] if affine else ["gskip"])
    out_names += ["dwb", "dwc", "dd", "dlam_re", "dlam_im"]
    if glu in ("full", "half1", "half2"):
        out_names += ["do2k", "do2b"]
    if glu == "full":
        out_names += ["do1k", "do1b"]
    if with_m1:
        out_names.append("dm1")
    if with_m2:
        out_names.append("dm2")
    if affine:
        out_names += ["dnw", "dnb"]

    def kernel(*all_refs):
        from sparsernns_tpu.ops.pallas.scan_kernel import (
            scan_block_body, scan_block_body_rev)
        refs = dict(zip(in_names, all_refs[: len(in_names)]))
        outs = dict(zip(out_names,
                        all_refs[len(in_names):
                                 len(in_names) + len(out_names)]))
        fc_re, fc_im, vc_re, vc_im = all_refs[len(in_names)
                                              + len(out_names):]
        i = pl.program_id(0)
        j = pl.program_id(1)

        # ---- forward recompute of THIS time block (from its carry) ----
        x_raw = refs["z"][0].astype(jnp.float32)          # (T, Hp)
        if affine:
            nw = refs["nw"][...]
            zn = x_raw * nw + refs["nb"][...]
            skip = x_raw
        else:
            zn = x_raw
            skip = refs["skip"][0].astype(jnp.float32)
        g = refs["g"][0].astype(jnp.float32)
        if true_l is not None:
            # padded-stream mode: the forward zeroes the L-pad rows of
            # its output, so its adjoint zeroes the incoming cotangent
            # there (the logical time block is n_t-1-j — reverse grid)
            rows = (jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
                    + (n_t - 1 - j) * block_t)
            g = jnp.where(rows < true_l, g, 0.0)

        bu = jnp.dot(zn, refs["wb"][...],
                     preferred_element_type=jnp.float32)
        p = bu.shape[-1] // 2
        # the history input block holds all n_t rows (same TPU tiling
        # constraint as the pre-pass); this block's entry carry is the
        # logical-time row n_t-1-j of the reverse grid
        row = n_t - 1 - j
        ch = (refs["ch_re"][0, pl.ds(row, 1)],
              refs["ch_im"][0, pl.ds(row, 1)])            # (1, Pp)
        # traced j=0: scan_block_body's carry-init branch loads ``ch``
        # every block (each block restarts from its checkpoint).
        x_re, x_im = scan_block_body(
            bu[:, :p], bu[:, p:], refs["pow_re"], refs["pow_im"],
            refs["ctab_re"], refs["ctab_im"], fc_re, fc_im,
            jnp.zeros((), jnp.int32),
            num_passes=num_passes, block_t=block_t, carry_init=ch)
        if relu_state:
            xa_re = jnp.maximum(x_re, 0.0)
            xa_im = jnp.maximum(x_im, 0.0)
        else:
            xa_re, xa_im = x_re, x_im
        xs_act = jnp.concatenate([xa_re, xa_im], axis=-1)
        y = jnp.dot(xs_act, refs["wc"][...],
                    preferred_element_type=jnp.float32)
        y = y + refs["d"][...] * zn
        x1, dact = _act_and_grad(y, act)
        x1d = x1 * refs["m1"][0] if with_m1 else x1
        if glu != "none":
            s = jnp.dot(x1d, refs["o2k"][...],
                        preferred_element_type=jnp.float32)
            gate = jax.nn.sigmoid(s + refs["o2b"][...])
            if glu == "half1":
                base = x1d
            elif glu == "half2":
                base = y
            else:
                base = jnp.dot(x1d, refs["o1k"][...],
                               preferred_element_type=jnp.float32)
                base = base + refs["o1b"][...]
            h = base * gate
            hd = h * refs["m2"][0] if with_m2 else h
        else:
            hd = x1d

        # ---- adjoint chain (fused_layer_train._bwd order) ----
        if layer_relu:
            g = g * ((hd + skip) > 0).astype(g.dtype)
        g_skip = g
        blk = {}
        g_y_extra = None
        if glu != "none":
            g_h = g
            if with_m2:
                blk["dm2"] = _rsum(g * h)[None]
                g_h = g * refs["m2"][0]
            g_base = g_h * gate
            g_s = (g_h * base) * gate * (1.0 - gate)
            blk["do2k"] = _dotT_accum(x1d, g_s)
            blk["do2b"] = _rsum(g_s)
            g_x1d = _dot_rt(g_s, refs["o2k"][...])
            if glu == "half1":
                g_x1d = g_x1d + g_base
            elif glu == "half2":
                g_y_extra = g_base
            else:
                blk["do1k"] = _dotT_accum(x1d, g_base)
                blk["do1b"] = _rsum(g_base)
                g_x1d = g_x1d + _dot_rt(g_base, refs["o1k"][...])
        else:
            g_x1d = g
        g_x1 = g_x1d
        if with_m1:
            blk["dm1"] = _rsum(g_x1d * x1)[None]
            g_x1 = g_x1d * refs["m1"][0]
        g_y = g_x1 * dact
        if g_y_extra is not None:
            g_y = g_y + g_y_extra

        # ---- mixer adjoint: reverse scan with cross-block carry ----
        g_xs = _dot_rt(g_y, refs["wc"][...])              # g_y @ wcᵀ
        gxs_re, gxs_im = g_xs[:, :p], g_xs[:, p:]
        if relu_state:
            gxs_re = gxs_re * (x_re > 0).astype(gxs_re.dtype)
            gxs_im = gxs_im * (x_im > 0).astype(gxs_im.dtype)
        v_re, v_im = scan_block_body_rev(
            gxs_re, gxs_im, refs["rpow_re"], refs["rpow_im"],
            refs["rtab_re"], refs["rtab_im"], vc_re, vc_im, j,
            num_passes=num_passes, block_t=block_t)
        v_cat = jnp.concatenate([v_re, v_im], axis=-1)
        g_zn = _dot_rt(v_cat, refs["wb"][...]) + g_y * refs["d"][...]

        blk["dwb"] = _dotT_accum(zn, v_cat)[None]
        blk["dwc"] = _dotT_accum(xs_act, g_y)[None]
        blk["dd"] = _rsum(g_y * zn)
        # xp = previous-step RAW states: row 0 is the entry carry
        xp_re = jnp.concatenate([ch[0], x_re[: block_t - 1]], axis=0)
        xp_im = jnp.concatenate([ch[1], x_im[: block_t - 1]], axis=0)
        blk["dlam_re"] = _rsum(v_re * xp_re + v_im * xp_im)
        blk["dlam_im"] = _rsum(v_im * xp_re - v_re * xp_im)
        if glu != "none":
            blk["do2k"] = blk["do2k"][None]
            if glu == "full":
                blk["do1k"] = blk["do1k"][None]

        if affine:
            blk["dnw"] = _rsum(g_zn * x_raw)
            blk["dnb"] = _rsum(g_zn)
            outs["gx"][0] = (g_zn * nw + g_skip).astype(
                outs["gx"].dtype)
        else:
            outs["gx"][0] = g_zn.astype(outs["gx"].dtype)
            outs["gskip"][0] = g_skip.astype(outs["gskip"].dtype)

        # ---- accumulate into the resident PER-BATCH-ROW output blocks
        # (summed over the batch OUTSIDE the custom call, so a DP-sharded
        # batch reduces via a plain XLA psum — no reduction rule needed
        # inside the custom partitioning) ----
        del i
        for name, val in blk.items():
            pred = j == 0

            @pl.when(pred)
            def _(ref=outs[name], v=val):
                ref[...] = v.astype(ref.dtype).reshape(ref.shape)

            @pl.when(jnp.logical_not(pred))
            def _(ref=outs[name], v=val):
                ref[...] = ref[...] + v.astype(ref.dtype).reshape(ref.shape)

    return kernel, in_names, out_names


_NDS = {"z": 3, "g": 3, "skip": 3, "lam_re": 1, "lam_im": 1,
        "w_b": 2, "w_c": 2, "d": 1, "o2k": 2, "o2b": 1, "o1k": 2,
        "o1b": 1, "m1": 3, "m2": 3, "nw": 1, "nb": 1}
_BATCH_NAMES = ("z", "g", "skip", "m1", "m2")


def _bwd_rule(in_order, out_names):
    """Shardy rule for the batch-partitioned backward: every operand and
    result leads with the shared batch factor ``b`` (or is replicated);
    gradient results reuse the factors of the weight they differentiate,
    so a sharded weight propagates its sharding to its gradient."""
    cnt = [0]

    def fx():
        cnt[0] += 1
        return f"f{cnt[0]}"

    fac, parts, factors, batch_args = {}, [], [], []
    for idx, n in enumerate(in_order):
        dims = []
        for k in range(_NDS[n]):
            if k == 0 and n in _BATCH_NAMES:
                dims.append("b")
            else:
                f = fx()
                factors.append(f)
                dims.append(f)
        fac[n] = dims
        parts.append(" ".join(dims))
        if n in _BATCH_NAMES:
            batch_args.append(idx)
    out_fac = {
        "gx": fac["z"], "gskip": fac["z"],
        "dwb": ["b"] + fac["w_b"], "dwc": ["b"] + fac["w_c"],
        "dd": ["b"] + fac["d"],
        "dlam_re": ["b"] + fac["lam_re"],
        "dlam_im": ["b"] + fac["lam_im"],
        "do2k": (["b"] + fac["o2k"]) if "o2k" in fac else None,
        "do2b": (["b"] + fac["o2b"]) if "o2b" in fac else None,
        "do1k": (["b"] + fac["o1k"]) if "o1k" in fac else None,
        "do1b": (["b"] + fac["o1b"]) if "o1b" in fac else None,
        "dm1": fac.get("m1"), "dm2": fac.get("m2"),
        "dnw": (["b"] + fac["nw"]) if "nw" in fac else None,
        "dnb": (["b"] + fac["nb"]) if "nb" in fac else None,
    }
    res = [" ".join(out_fac[n]) for n in out_names]
    rule = ", ".join(parts) + " -> " + ", ".join(res)
    return rule, tuple(factors), tuple(batch_args)


def fused_tail_bwd(z, skip, lam: Pair, w_b, w_c, d,
                   o2k, o2b, o1k, o1b, m1, m2, nw, nb, g, *,
                   block_t: int, act: str, glu: str, relu_state: bool,
                   layer_relu: bool, pre_padded: bool = False,
                   true_l: Optional[int] = None,
                   interpret: Optional[bool] = None):
    """Kernel backward of fused_layer_tail. Returns the same gradient
    tuple as fused_layer_train._bwd: (g_z_or_x, g_skip, d_lam, d_w_b,
    d_w_c, d_d, d_o2k, d_o2b, d_o1k, d_o1b, d_m1, d_m2, d_nw, d_nb).

    The custom call is batch-partitioned (partition.batch_partitioned)
    and every gradient it emits is PER BATCH ROW; the cross-batch sums
    happen outside, so under data parallelism they lower to a plain XLA
    sharded reduction (psum) with no all-gather around the kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    affine = nw is not None
    with_m1, with_m2 = m1 is not None, m2 is not None

    in_order = ["z", "g"] + ([] if affine else ["skip"]) + [
        "lam_re", "lam_im", "w_b", "w_c", "d"]
    if glu != "none":
        in_order += ["o2k", "o2b"]
    if glu == "full":
        in_order += ["o1k", "o1b"]
    if with_m1:
        in_order.append("m1")
    if with_m2:
        in_order.append("m2")
    if affine:
        in_order += ["nw", "nb"]
    vals = dict(z=z, g=g, skip=skip, lam_re=lam[0], lam_im=lam[1],
                w_b=w_b, w_c=w_c, d=d, o2k=o2k, o2b=o2b, o1k=o1k,
                o1b=o1b, m1=m1, m2=m2, nw=nw, nb=nb)

    def body(*arrays):
        from sparsernns_tpu.ops.pallas.fused_layer import pad_layer_ops
        from sparsernns_tpu.ops.pallas.scan_kernel import \
            lambda_power_tables
        a = dict(zip(in_order, arrays))
        zz, gg = a["z"], a["g"]
        b, l, h = zz.shape
        p = a["w_b"].shape[-1] // 2
        if pre_padded:
            h = a["w_b"].shape[0]
            l_pad, h_pad = l, zz.shape[-1]
            t = min(block_t, l_pad)
            assert l_pad % t == 0 and h_pad % 128 == 0
            zp, gp = zz, gg
            pad3 = None
        else:
            from sparsernns_tpu.ops.pallas.fused_layer_train import \
                tail_geometry
            t, l_pad, h_pad = tail_geometry(l, h, block_t)
            pad3 = ((0, 0), (0, l_pad - l), (0, h_pad - h))
            zp = jnp.pad(zz, pad3) if (l_pad != l or h_pad != h) else zz
            gp = jnp.pad(gg, pad3) if (l_pad != l or h_pad != h) else gg
        n_t = l_pad // t

        ops, p_pad, num_passes = pad_layer_ops(
            (a["lam_re"], a["lam_im"]), a["w_b"], a["w_c"], a["d"],
            a["nw"] if affine else jnp.ones((h,), jnp.float32),
            a["nb"] if affine else jnp.zeros((h,), jnp.float32),
            (a["o2k"], a["o2b"]) if glu != "none" else None,
            (a["o1k"], a["o1b"]) if glu == "full" else None, h_pad, t)
        # reverse tables: conj λ; fold table flipped (rtab row t = λ*^(T-t))
        lam_re_p = jnp.pad(a["lam_re"], (0, p_pad - p))
        lam_im_p = jnp.pad(a["lam_im"], (0, p_pad - p))
        rpow_re, rpow_im, rtab = lambda_power_tables(
            lam_re_p, -lam_im_p, t, num_passes)
        rtab = (rtab[0][::-1], rtab[1][::-1])

        if not interpret:   # resolved to a bool at entry
            # row-major pins on the stream operands (fused_layer_train's
            # rule — measured 16% of the adjoint at B=32,
            # tools/bwd_probe.py tail_bwd vs tail_bwd_pin)
            from jax.experimental.layout import (Layout,
                                                 with_layout_constraint)
            zp = with_layout_constraint(zp, Layout((0, 1, 2)))
            gp = with_layout_constraint(gp, Layout((0, 1, 2)))
        operands = {"z": zp, "g": gp}
        if not affine:
            operands["skip"] = (jnp.pad(a["skip"], pad3)
                                if pad3 and (l_pad != l or h_pad != h)
                                else a["skip"])
        else:
            operands["nw"] = ops["nw"]
            operands["nb"] = ops["nb"]
        if with_m1:
            operands["m1"] = jnp.pad(a["m1"],
                                     ((0, 0), (0, 0), (0, h_pad - h)))
        if with_m2:
            operands["m2"] = jnp.pad(a["m2"],
                                     ((0, 0), (0, 0), (0, h_pad - h)))
        operands.update(
            wb=ops["wb"], wc=ops["wc"], d=ops["d"],
            pow_re=ops["pow_re"], pow_im=ops["pow_im"],
            ctab_re=ops["ctab_re"], ctab_im=ops["ctab_im"],
            rpow_re=rpow_re, rpow_im=rpow_im,
            rtab_re=rtab[0], rtab_im=rtab[1])
        if glu != "none":
            operands.update(o2k=ops["out2_k"], o2b=ops["out2_b"])
        if glu == "full":
            operands.update(o1k=ops["out1_k"], o1b=ops["out1_b"])

        io_fwd = pl.BlockSpec((1, t, h_pad), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        io_rev = pl.BlockSpec((1, t, h_pad),
                              lambda i, j: (i, n_t - 1 - j, 0),
                              memory_space=pltpu.VMEM)
        mask_blk = pl.BlockSpec((1, 1, h_pad), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        full = lambda arr: pl.BlockSpec(
            arr.shape, lambda i, j: (0,) * arr.ndim,
            memory_space=pltpu.VMEM)

        # ---- pre-pass: per-block entry carries (forward time order) ----
        hk, hk_names = _make_hist_kernel(affine, num_passes=num_passes,
                                         block_t=t)
        # whole-history block, resident across j (constant index map):
        # TPU tiling forbids a 1-row block over the n_t dim when
        # n_t % 8 != 0; the history is tiny ((n_t, P) ~ 8 KB) so the
        # full-rows block costs nothing.
        hist_blk = pl.BlockSpec((1, n_t, p_pad), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        ch_re, ch_im = pl.pallas_call(
            hk,
            grid=(b, n_t),
            in_specs=[io_fwd if n == "z" else full(operands[n])
                      for n in hk_names],
            out_specs=[hist_blk, hist_blk],
            out_shape=[jax.ShapeDtypeStruct((b, n_t, p_pad),
                                            jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((1, p_pad), jnp.float32)] * 2,
            interpret=interpret,
        )(*[operands[n] for n in hk_names])
        operands["ch_re"] = ch_re
        operands["ch_im"] = ch_im
        # same whole-history block on the adjoint side; the kernel picks
        # its reverse-time row dynamically (row = n_t-1-j)
        hist_rev = hist_blk

        # ---- the adjoint kernel (reverse time order) ----
        kernel, in_names, out_names = _make_bwd_kernel(
            glu, act, with_m1, with_m2, affine, num_passes=num_passes,
            block_t=t, relu_state=relu_state, layer_relu=layer_relu,
            true_l=true_l if pre_padded else None, n_t=n_t)

        def in_spec(n):
            if n in ("z", "g", "skip"):
                return io_rev
            if n in ("m1", "m2"):
                return mask_blk
            if n in ("ch_re", "ch_im"):
                return hist_rev
            return full(operands[n])

        def mat_blk(r, c):
            return pl.BlockSpec((1, r, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def row_blk(cols):
            # rank-3 (B, 1, cols) rather than (B, cols): a (1, cols)
            # block over (B, cols) violates the TPU (8, 128) tiling of
            # the last two dims; the singleton middle dim satisfies it
            return mat_blk(1, cols)

        out_specs, out_shapes = [], []
        for n in out_names:
            if n in ("gx", "gskip"):
                # stream cotangents keep the stream's dtype (bf16 halves
                # the adjoint's g_x write; no accumulation on this path)
                out_specs.append(io_rev)
                out_shapes.append(
                    jax.ShapeDtypeStruct((b, l_pad, h_pad), zp.dtype))
            elif n in ("dm1", "dm2"):
                out_specs.append(mask_blk)
                out_shapes.append(
                    jax.ShapeDtypeStruct((b, 1, h_pad), jnp.float32))
            elif n in ("dwb", "dwc", "do2k", "do1k"):
                r, c = {"dwb": (h_pad, 2 * p_pad),
                        "dwc": (2 * p_pad, h_pad),
                        "do2k": (h_pad, h_pad),
                        "do1k": (h_pad, h_pad)}[n]
                out_specs.append(mat_blk(r, c))
                out_shapes.append(
                    jax.ShapeDtypeStruct((b, r, c), jnp.float32))
            else:
                cols = p_pad if n.startswith("dlam") else h_pad
                out_specs.append(row_blk(cols))
                out_shapes.append(
                    jax.ShapeDtypeStruct((b, 1, cols), jnp.float32))

        res = pl.pallas_call(
            kernel,
            grid=(b, n_t),
            in_specs=[in_spec(n) for n in in_names],
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((1, p_pad), jnp.float32)] * 4,
            interpret=interpret,
        )(*[operands[n] for n in in_names])
        r = dict(zip(out_names, res))

        # ---- unpad to ORIGINAL dims (per batch row) inside the call
        # (stream cotangents stay padded in padded-stream mode) ----
        if pre_padded:
            out = {"gx": r["gx"]}
            if not affine:
                out["gskip"] = r["gskip"]
        else:
            out = {"gx": r["gx"][:, :l, :h]}
            if not affine:
                out["gskip"] = r["gskip"][:, :l, :h]
        out["dwb"] = jnp.concatenate(
            [r["dwb"][:, :h, :p], r["dwb"][:, :h, p_pad:p_pad + p]],
            axis=-1)
        out["dwc"] = jnp.concatenate(
            [r["dwc"][:, :p, :h], r["dwc"][:, p_pad:p_pad + p, :h]],
            axis=1)
        out["dd"] = r["dd"][:, 0, :h]
        out["dlam_re"] = r["dlam_re"][:, 0, :p]
        out["dlam_im"] = r["dlam_im"][:, 0, :p]
        if glu != "none":
            out["do2k"] = r["do2k"][:, :h, :h]
            out["do2b"] = r["do2b"][:, 0, :h]
        if glu == "full":
            out["do1k"] = r["do1k"][:, :h, :h]
            out["do1b"] = r["do1b"][:, 0, :h]
        if with_m1:
            out["dm1"] = r["dm1"][:, :, :h]
        if with_m2:
            out["dm2"] = r["dm2"][:, :, :h]
        if affine:
            out["dnw"] = r["dnw"][:, 0, :h]
            out["dnb"] = r["dnb"][:, 0, :h]
        return tuple(out[n] for n in out_names)

    # the result order matches _make_bwd_kernel's out_names
    out_names = ["gx"] + ([] if affine else ["gskip"])
    out_names += ["dwb", "dwc", "dd", "dlam_re", "dlam_im"]
    if glu != "none":
        out_names += ["do2k", "do2b"]
    if glu == "full":
        out_names += ["do1k", "do1b"]
    if with_m1:
        out_names.append("dm1")
    if with_m2:
        out_names.append("dm2")
    if affine:
        out_names += ["dnw", "dnb"]

    from sparsernns_tpu.ops.pallas.partition import batch_partitioned
    rule, repl, batch_args = _bwd_rule(in_order, out_names)
    res = batch_partitioned(body, rule, repl, batch_args=batch_args)(
        *[vals[n] for n in in_order])
    r = dict(zip(out_names, res))

    # cross-batch sums OUTSIDE the custom call (sharded-reduce under DP)
    g_x = r["gx"]
    g_skip = None if affine else r["gskip"]
    d_wb = jnp.sum(r["dwb"], axis=0)
    d_wc = jnp.sum(r["dwc"], axis=0)
    d_d = jnp.sum(r["dd"], axis=0)
    d_lam = (jnp.sum(r["dlam_re"], axis=0), jnp.sum(r["dlam_im"], axis=0))
    d_o2k = jnp.sum(r["do2k"], axis=0) if "do2k" in r else None
    d_o2b = jnp.sum(r["do2b"], axis=0) if "do2b" in r else None
    d_o1k = jnp.sum(r["do1k"], axis=0) if "do1k" in r else None
    d_o1b = jnp.sum(r["do1b"], axis=0) if "do1b" in r else None
    d_m1 = r.get("dm1")
    d_m2 = r.get("dm2")
    d_nw = jnp.sum(r["dnw"], axis=0) if affine else None
    d_nb = jnp.sum(r["dnb"], axis=0) if affine else None
    if affine:
        return (g_x, None, d_lam, d_wb, d_wc, d_d,
                d_o2k, d_o2b, d_o1k, d_o1b, d_m1, d_m2, d_nw, d_nb)
    return (g_x, g_skip, d_lam, d_wb, d_wc, d_d,
            d_o2k, d_o2b, d_o1k, d_o1b, d_m1, d_m2, None, None)
