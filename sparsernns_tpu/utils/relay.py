"""Jaxpr relay: re-emit a traced program through ``eval_jaxpr`` so its
jit lowering carries NO flax named-scope / source metadata.

Why this exists (measured 2026-08-20, runs/backend_probe.json): the
tunnel TPU backend's compile service refuses every flax-built model
program ``UNIMPLEMENTED`` in <1 s — while a HAND-BUILT forward with the
exact same op content (same blocked scan, same dot shapes, flat pytree
args; probe stages ``handbuilt_model_fwd`` / ``handbuilt_model_fwd_args``)
compiles and executes. Diffing the two lowerings shows identical
StableHLO op sets; the flax module carries ~160 extra location/scope
metadata entries (``BatchNorm.__call__``, name-stack paths, site-package
file names). Re-tracing the SAME jaxpr through ``jax.core.eval_jaxpr``
reproduces the computation op-for-op while the new trace's metadata is
generic — the relay is therefore semantically exact (same jaxpr, same
primitives, same constants) and acceptable to the conformance-limited
compiler.

This is a serving/bench-path tool: training code keeps plain ``jax.jit``
(compile-service quirks of one tunnel transport are not a reason to
complicate the programming model).

Reference context: the reference framework never needs this — torch
submits TorchScript/ATen kernels, and its CUDA backend accepts whatever
they emit (sparseRNNs/train_helpers.py has no backend gating).
"""

from __future__ import annotations

from typing import Any, Optional

import jax


def strip_source_info(closed_jaxpr):
    """Return a copy of ``closed_jaxpr`` with every equation's source
    info (file/line locations AND the flax name stack) replaced by a
    fresh empty one, recursively through sub-jaxprs (scan/cond/pjit
    bodies). ``eval_jaxpr`` REPLAYS each eqn's stored source info into
    the new trace, so without this the relayed lowering still carries
    the flax scope metadata it exists to remove (pinned by
    tests/test_relay.py::test_relay_strips_flax_scope_metadata)."""
    from jax._src import core as jcore
    from jax._src import source_info_util

    fresh = source_info_util.new_source_info()

    def clean_jaxpr(jaxpr):
        eqns = []
        for eqn in jaxpr.eqns:
            params = {}
            for k, p_val in eqn.params.items():
                params[k] = _clean_param(p_val)
            eqns.append(eqn.replace(params=params, source_info=fresh))
        return jaxpr.replace(eqns=eqns)

    def _clean_param(p_val):
        if isinstance(p_val, jcore.ClosedJaxpr):
            return jcore.ClosedJaxpr(clean_jaxpr(p_val.jaxpr),
                                     p_val.consts)
        if isinstance(p_val, jcore.Jaxpr):
            return clean_jaxpr(p_val)
        if (isinstance(p_val, (tuple, list)) and not hasattr(p_val, "_fields")
                and any(isinstance(q, (jcore.Jaxpr, jcore.ClosedJaxpr))
                        for q in p_val)):
            # e.g. cond's `branches`; plain namedtuple params
            # (GatherDimensionNumbers etc.) pass through untouched
            return type(p_val)(_clean_param(q) for q in p_val)
        return p_val

    return jcore.ClosedJaxpr(clean_jaxpr(closed_jaxpr.jaxpr),
                             closed_jaxpr.consts)


def normalize_dot_precision(closed_jaxpr, to=None):
    """Rewrite every ``dot_general``/``conv`` eqn's ``precision`` param
    to ``to`` (None = backend default), recursively through sub-jaxprs.

    Why (measured 2026-08-20, runs/jaxpr_bisect.json): the tunnel TPU
    executor REFUSES ``Precision.HIGHEST`` dots at execution
    (UNIMPLEMENTED) while compiling them fine — the very first encoder
    dense convicted at prefix k=1 of the runtime bisect, and the same
    program with default precision executes. HIGHEST exists in model
    code for fp32 torch-parity (qat.py:67, static.py:246, stft.py:96,
    ssm.py:271); serving at default precision is the platform-correct
    choice anyway (quantized engines carry their own int/bf16 dot
    dtypes, and a bf16-pass f32 dot is the TPU-native fast path)."""
    from jax._src import core as jcore

    def clean_jaxpr(jaxpr):
        eqns = []
        for eqn in jaxpr.eqns:
            params = {k: _clean_param(v) for k, v in eqn.params.items()}
            if "precision" in params:
                params["precision"] = to
            eqns.append(eqn.replace(params=params))
        return jaxpr.replace(eqns=eqns)

    def _clean_param(p_val):
        if isinstance(p_val, jcore.ClosedJaxpr):
            return jcore.ClosedJaxpr(clean_jaxpr(p_val.jaxpr),
                                     p_val.consts)
        if isinstance(p_val, jcore.Jaxpr):
            return clean_jaxpr(p_val)
        if (isinstance(p_val, (tuple, list)) and not hasattr(p_val, "_fields")
                and any(isinstance(q, (jcore.Jaxpr, jcore.ClosedJaxpr))
                        for q in p_val)):
            return type(p_val)(_clean_param(q) for q in p_val)
        return p_val

    return jcore.ClosedJaxpr(clean_jaxpr(closed_jaxpr.jaxpr),
                             closed_jaxpr.consts)


def relay_jit(fn, *example_args, in_shardings: Optional[tuple] = None,
              out_shardings: Any = None, default_precision: bool = True,
              **jit_kw):
    """``jax.jit(fn)`` with the lowering metadata stripped and (by
    default) every dot's precision normalized to the backend default —
    the two constructs the tunnel backend refuses (compile-time:
    flax scope metadata; run-time: Precision.HIGHEST dots, convicted at
    prefix k=1 by tools/jaxpr_bisect.py --execute). The relay exists
    only for that backend, so normalization is opt-out
    (``default_precision=False`` restores the traced precisions).

    Traces ``fn`` ONCE at ``example_args`` (structure + shapes fixed —
    same contract as a jitted call signature) and returns a callable
    with the same pytree-in/pytree-out signature whose compiled program
    is the re-emitted jaxpr.

    ``in_shardings``: optional tuple aligned with ``example_args``; each
    entry (a Format/Sharding or None) is broadcast over that argument's
    leaves. ``out_shardings``: broadcast over the output's leaves.
    """
    jpr, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    jpr = strip_source_info(jpr)
    if default_precision:
        jpr = normalize_dot_precision(jpr)
    out_tree = jax.tree_util.tree_structure(out_shape)
    flat_example, in_tree = jax.tree_util.tree_flatten(example_args)

    def relay(*leaves):
        outs = jax.core.eval_jaxpr(jpr.jaxpr, jpr.literals, *leaves)
        return outs

    if in_shardings is not None:
        if len(in_shardings) != len(example_args):
            raise ValueError(
                f"in_shardings has {len(in_shardings)} entries for "
                f"{len(example_args)} arguments")
        flat_in = []
        for spec, arg in zip(in_shardings, example_args):
            flat_in.extend([spec] * len(jax.tree_util.tree_leaves(arg)))
        jit_kw["in_shardings"] = tuple(flat_in)
    if out_shardings is not None:
        # relay returns a flat LIST of leaves — broadcast the spec
        jit_kw["out_shardings"] = [out_shardings] * out_tree.num_leaves
    jitted = jax.jit(relay, **jit_kw)

    def wrapped(*args):
        flat, tree = jax.tree_util.tree_flatten(args)
        if tree != in_tree:
            raise TypeError(
                f"relay_jit called with a different argument structure "
                f"than it was traced at:\n  traced: {in_tree}\n"
                f"  called: {tree}")
        outs = jitted(*flat)
        return jax.tree_util.tree_unflatten(out_tree, outs)

    #: drop-in for the bench's `jitted.lower(*args)` cost-analysis path
    wrapped.lower = lambda *args: jitted.lower(
        *jax.tree_util.tree_leaves(args))
    wrapped._relay_jitted = jitted
    return wrapped
