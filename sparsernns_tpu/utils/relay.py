"""Jaxpr relay: re-emit a traced program through ``eval_jaxpr`` with
its lowering metadata stripped and (optionally) dot precisions
normalized.

History — built on a conviction later FALSIFIED (round 4, 2026-08-20):
the tunnel backend appeared to refuse every flax-built model program
``UNIMPLEMENTED`` while hand-built equivalents passed, and flax's scope
metadata was the only observable diff. The real mechanism
(tools/jaxpr_bisect.py + transfer-guard ladder, runs/jaxpr_bisect.json)
was an eager complex64 ``device_put`` at model construction
(ssm_init.py pre-fix): the refused transfer is ASYNC, surfaces at the
next synchronizing call, and poisons every later device call in the
process — so whichever program was dispatched after building a model
"failed", and the metadata-free stages passed only because they never
built one. With complex kept host-side, flax lowerings compile and
execute unmodified and the relay is NOT engaged (bench._relay_enabled
reads the re-measured conformance table).

The relay stays as a diagnostic/escape hatch: it produces a
semantically exact re-emission (same jaxpr, same primitives, bit-exact
outputs — tests/test_relay.py) with none of the scope/location
metadata, plus a jaxpr-level dot-precision rewrite — the two knobs a
future conformance-limited backend is most likely to need.

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

    HIGHEST was briefly convicted by the k=1 runtime bisect
    (2026-08-20) and then CLEARED — the dot_highest probe stage executes
    fine; the real culprit was the async complex64 transfer poisoning
    (module docstring). Kept because it is independently useful: HIGHEST
    exists in model code for fp32 torch-parity (qat.py:67,
    static.py:246, stft.py:96, ssm.py:271), and serving at default
    precision is the TPU-native fast path (quantized engines carry
    their own int/bf16 dot dtypes; a 6-pass f32-emulation dot is never
    what a throughput route wants)."""
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
    default) every dot's precision normalized to the backend default.
    Both knobs target conformance-limited backends (module docstring:
    neither is needed on the current tunnel after the complex-transfer
    fix); normalization is opt-out (``default_precision=False``
    restores the traced precisions) because a throughput route never
    wants 6-pass f32-emulation dots anyway.

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
