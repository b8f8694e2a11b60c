"""SPMD partitioning for the Pallas kernels: batch-parallel custom calls.

XLA's SPMD partitioner cannot see inside a Pallas custom call, so under
pure data parallelism it would ALL-GATHER the batch-sharded activations
before the kernel and re-shard after — per layer (measured: 23.6 MB of
all-gather per step for the flagship fused forward on a 2-way DP mesh,
where DP needs ZERO forward collectives). The kernels here are
embarrassingly parallel over the leading batch dim (their grid iterates
batch rows independently), so we register a `custom_partitioning` rule:

- the leading dim of the first operand and of every result shards freely
  and propagates (Shardy factor ``b``),
- every other dimension is replicated (time must stay whole for the
  in-kernel carry chain; weights/λ tables live in VMEM per chip),
- the per-shard lowering is the kernel body itself (it works for any
  local batch size).

No reference analog (single device); this is what makes `scan_mode=
"fused"`/"pallas" compose with DP sharding annotations the same way the
pure-XLA paths do.
"""

from __future__ import annotations

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_spec(sharding, ndim: int) -> P:
    """Keep only the leading-dim component of a sharding's spec."""
    spec = [None] * ndim
    try:
        s = sharding.spec
        if len(s) > 0:
            spec[0] = s[0]
    except (AttributeError, TypeError):
        pass
    return P(*spec)


def batch_partitioned(body, rule: str, need_replication=(),
                      batch_args=(0,)):
    """Wrap ``body(*arrays) -> array|tuple`` as a batch-dim-partitioned
    custom call. ``rule`` is the Shardy einsum-like sharding rule; the
    operands in ``batch_args`` and all results must lead with the shared
    batch factor, and every non-batch factor must be listed in
    ``need_replication`` (time must stay whole per shard for the carry
    chain). Every batch_args operand shards with arg 0's leading-dim
    sharding — leaving one out forces an all-gather of that operand
    around the custom call.
    """
    fn = custom_partitioning(body)

    def infer_sharding_from_operands(mesh, arg_infos, result_infos):
        u = arg_infos[0]
        return jax.tree.map(
            lambda r: NamedSharding(
                mesh, _batch_spec(u.sharding, len(r.shape))),
            result_infos)

    def partition(mesh, arg_infos, result_infos):
        u = arg_infos[0]

        def arg_sharding(i, a):
            nd = len(a.shape)
            if i in batch_args:
                return NamedSharding(mesh, _batch_spec(u.sharding, nd))
            return NamedSharding(mesh, P(*([None] * nd)))

        arg_shardings = tuple(
            arg_sharding(i, a) for i, a in enumerate(arg_infos))
        out_shardings = jax.tree.map(
            lambda r: NamedSharding(
                mesh, _batch_spec(u.sharding, len(r.shape))),
            result_infos)
        return mesh, body, out_shardings, arg_shardings

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(need_replication))
    return fn


#: rule for the fused S5 kernel:
#: (u, lam_re, lam_im, w_b, w_c, d) -> y
#: b shards; time l and feature/state dims need replication.
FUSED_RULE = "b l i, j, j, i k, k i, i -> b l i"
FUSED_REPLICATED = ("l", "i", "j", "k")

#: rule for the standalone diagonal scan:
#: (bu_re, bu_im, lam_re, lam_im) -> (xs_re, xs_im)
SCAN_RULE = "b l p, b l p, p, p -> b l p, b l p"
SCAN_REPLICATED = ("l", "p")
