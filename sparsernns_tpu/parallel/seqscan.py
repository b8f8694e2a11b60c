"""Sequence-parallel diagonal scan across chips.

The SSM analog of ring attention (SURVEY.md §5): chunk the time axis over
the SEQ mesh axis, scan each chunk locally, then combine chunk carries with
the same associative operator in log2(n_seq) `ppermute` rounds over ICI,
and fold the incoming carry into local states with precomputed λ-powers.

Total cross-chip traffic: O(P) per device per round — negligible next to
the O(L·P/n) local work, so scaling efficiency is bounded by the carry
latency chain only.

Reference capability being scaled: the single-device associative scan at
ssm.py:127 over L=3751.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparsernns_tpu.ops.scan import (Pair, apply_carry, associative_diag_scan,
                                     complex_mul)
from sparsernns_tpu.parallel.mesh import SEQ_AXIS


def _device_prefix_carry(lam_pow_t: Pair, local_end: Pair,
                         axis_name: str) -> Pair:
    """Exclusive prefix-combine of per-chunk (A=λ^T, b=end-state) pairs over
    the mesh axis, via Hillis-Steele doubling with ppermute.

    Returns the global state entering this device's chunk.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    a = (jnp.broadcast_to(lam_pow_t[0], local_end[0].shape),
         jnp.broadcast_to(lam_pow_t[1], local_end[1].shape))
    b = local_end

    shift = 1
    while shift < n:
        perm = [(i, (i + shift) % n) for i in range(n)]
        a_recv = tuple(lax.ppermute(x, axis_name, perm) for x in a)
        b_recv = tuple(lax.ppermute(x, axis_name, perm) for x in b)
        # Only devices with idx >= shift have a valid left contribution.
        # Combine (left=recv) ∘ (right=self): A = A_l*A_r, b = A_r⊙b_l + b_r.
        valid = idx >= shift
        b_new = (jnp.where(valid, complex_mul(a, b_recv)[0] + b[0], b[0]),
                 jnp.where(valid, complex_mul(a, b_recv)[1] + b[1], b[1]))
        a_new_full = complex_mul(a, a_recv)
        a = (jnp.where(valid, a_new_full[0], a[0]),
             jnp.where(valid, a_new_full[1], a[1]))
        b = b_new
        shift *= 2

    # b now holds the INCLUSIVE prefix (global state at end of own chunk);
    # shift right by one device for the exclusive carry.
    perm = [(i, (i + 1) % n) for i in range(n)]
    carry = tuple(lax.ppermute(x, axis_name, perm) for x in b)
    zero = idx == 0
    return (jnp.where(zero, 0.0, carry[0]), jnp.where(zero, 0.0, carry[1]))


def seq_chunk_scan(lam: Pair, bu_local: Pair,
                   axis_name: str = SEQ_AXIS) -> Pair:
    """Inside shard_map: bu_local (..., L/n, P) -> global states for the
    local chunk."""
    xs_local = associative_diag_scan(lam, bu_local)
    local_end = (xs_local[0][..., -1, :], xs_local[1][..., -1, :])

    t_local = bu_local[0].shape[-2]
    from sparsernns_tpu.ops.scan import lambda_powers
    pw = lambda_powers(lam, t_local)
    lam_pow_t = (pw[0][-1], pw[1][-1])  # λ^{T_local}

    carry = _device_prefix_carry(lam_pow_t, local_end, axis_name)
    return apply_carry(xs_local, lam, carry)


def make_sp_train_scan(mesh: Mesh):
    """DP x TP x SP sharded differentiable scan for the TRAINING step.

    Unlike :func:`make_seq_parallel_scan` (serving; batch handled by the
    caller), this declares ALL three mesh axes in the shard_map specs:
    batch on DATA, time on SEQ, and the state dim P on MODEL — so a
    TP-sharded λ̄/B̄u stays sharded through the scan and the carry
    exchange rides the SEQ axis only. Fully differentiable (the combine
    is built from ppermute/where/mul, all with transpose rules), so the
    same construction serves forward and backward.

    Time lengths that don't divide the SEQ axis are zero-padded at the
    END (padding only ever sits after the true sequence, so the carry
    chain for real steps is unaffected) and sliced off the result.
    """
    from sparsernns_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_seq = mesh.shape[SEQ_AXIS]
    bu_spec = P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS)
    lam_spec = P(MODEL_AXIS)
    f = jax.shard_map(
        partial(seq_chunk_scan, axis_name=SEQ_AXIS),
        mesh=mesh,
        in_specs=((lam_spec, lam_spec), (bu_spec, bu_spec)),
        out_specs=(bu_spec, bu_spec),
    )

    def scan(lam: Pair, bu: Pair) -> Pair:
        if bu[0].ndim != 3:
            raise ValueError(
                f"sp training scan expects (B, L, P) inputs, got "
                f"{bu[0].shape}")
        l = bu[0].shape[-2]
        l_pad = -(-l // n_seq) * n_seq
        if l_pad != l:
            pad = [(0, 0), (0, l_pad - l), (0, 0)]
            bu = (jnp.pad(bu[0], pad), jnp.pad(bu[1], pad))
        xs = f(lam, bu)
        if l_pad != l:
            xs = (xs[0][..., :l, :], xs[1][..., :l, :])
        return xs

    return scan


def make_seq_parallel_scan(mesh: Mesh):
    """Returns scan(lam (P,) pair, bu (..., L, P) pair) -> states, with the
    time axis sharded over SEQ. L must be divisible by mesh.shape[SEQ_AXIS].
    """
    def scan(lam: Pair, bu: Pair) -> Pair:
        ndim = bu[0].ndim
        # (..., L, P): shard L over SEQ, leading batch over nothing here
        # (batch sharding is handled by the caller's jit); replicate P.
        spec_list = [None] * ndim
        spec_list[-2] = SEQ_AXIS
        bu_spec = P(*spec_list)
        lam_spec = P(None)

        f = jax.shard_map(
            partial(seq_chunk_scan, axis_name=SEQ_AXIS),
            mesh=mesh,
            in_specs=((lam_spec, lam_spec), (bu_spec, bu_spec)),
            out_specs=(bu_spec, bu_spec),
        )
        return f(lam, bu)

    return scan
