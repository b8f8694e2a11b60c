"""Block-sparse dense matmul: the TPU-exploitable form of weight sparsity.

The reference prunes unstructured (jaxpruner STE magnitude, ERK — see
/root/reference/sparseRNNs/utils/pruning.py:7-54); on the MXU that is
masked-dense: zero FLOP or HBM savings (SURVEY.md §7 hard part). The
structure the MXU CAN exploit is the weight TILE: when whole (bk, bn)
blocks of a weight matrix are zero, the matmul can skip them entirely —
fewer MXU passes AND fewer HBM bytes, with the savings exactly equal to
the zero-tile fraction (no marketing sparsity).

`pack_block_sparse` stores only nonzero tiles (block-CSC, sorted by
output tile) plus int32 coordinate arrays; `block_sparse_matmul` is a
Pallas kernel over grid (M-tiles, nnz-blocks) that uses scalar prefetch
(`pltpu.PrefetchScalarGridSpec`) to route each kept block's input/output
tiles. Output tiles accumulate across their consecutive kept blocks in
VMEM (blocks are sorted by output tile, so revisits are adjacent — the
Pallas revolving-buffer rule makes the accumulation safe); `is_first`
zeroes each output tile once. Output tiles with no kept blocks get one
padded zero block so every tile is written.

int8 weights (the serving engine's storage) keep their 8-bit HBM
footprint: tiles are dequantized block-wise on the VPU inside the kernel
(values are integers ≤ 2^7 — exactly representable in bf16/f32) and the
per-tensor pow2 scale is applied to the accumulated result outside, so
the MXU runs its fast low-precision path.

Greenfield component — no reference equivalent (the reference has no
kernels at all).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BK = 128   # sublane-dim tile (weight rows)
DEFAULT_BN = 128   # lane-dim tile (weight cols / MXU width)
DEFAULT_BM = 128   # activation rows per grid step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockSparseWeight:
    """Packed zero-tile-skipping weight. A pytree: jitted consumers take
    it as an argument (same rule as quantize.engine._LayerPack)."""

    data: jax.Array       # (nnz, bk, bn) kept tiles; int8 or float32
    blk_k: jax.Array      # (nnz,) int32 input-tile index of each block
    blk_j: jax.Array      # (nnz,) int32 output-tile index, NON-DECREASING
    is_first: jax.Array   # (nnz,) int32 1 at each output tile's first block
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    bk: int = dataclasses.field(metadata=dict(static=True))
    bn: int = dataclasses.field(metadata=dict(static=True))
    scale: Optional[float] = dataclasses.field(  # pow2 dequant scale (int8)
        default=None, metadata=dict(static=True))
    n_zero_blocks: int = dataclasses.field(default=0,
                                           metadata=dict(static=True))

    @property
    def nnz(self) -> int:
        return self.data.shape[0]

    @property
    def density(self) -> float:
        """Fraction of weight tiles actually stored/computed — the
        honest realized cost ratio vs the dense matmul (padded empty
        output tiles count as stored)."""
        k_tiles = -(-self.shape[0] // self.bk)
        n_tiles = -(-self.shape[1] // self.bn)
        return self.nnz / (k_tiles * n_tiles)

    def hbm_bytes(self) -> int:
        itemsize = jnp.dtype(self.data.dtype).itemsize
        return (self.data.size * itemsize
                + self.blk_k.size * 4 * 3)


def pack_block_sparse(w: np.ndarray, bk: int = DEFAULT_BK,
                      bn: int = DEFAULT_BN,
                      scale: Optional[float] = None) -> BlockSparseWeight:
    """Pack a (K, N) weight into kept tiles. Pure numpy (host-side
    packing, no device round trips — engine rule). ``scale``: record the
    per-tensor dequant scale when ``w`` holds int8 data."""
    w = np.asarray(w)
    k_dim, n_dim = w.shape
    k_tiles, n_tiles = -(-k_dim // bk), -(-n_dim // bn)
    wp = np.zeros((k_tiles * bk, n_tiles * bn), w.dtype)
    wp[:k_dim, :n_dim] = w

    data, kk, jj, first = [], [], [], []
    n_zero = 0
    for j in range(n_tiles):
        first_of_j = True
        for k in range(k_tiles):
            blk = wp[k * bk:(k + 1) * bk, j * bn:(j + 1) * bn]
            if np.any(blk != 0):
                data.append(blk)
                kk.append(k)
                jj.append(j)
                first.append(1 if first_of_j else 0)
                first_of_j = False
            else:
                n_zero += 1
        if first_of_j:      # fully-zero output tile: pad one zero block
            data.append(np.zeros((bk, bn), w.dtype))
            kk.append(0)
            jj.append(j)
            first.append(1)
            n_zero -= 1     # the pad is stored/computed: not a saving
    return BlockSparseWeight(
        data=jnp.asarray(np.stack(data)),
        blk_k=jnp.asarray(kk, jnp.int32),
        blk_j=jnp.asarray(jj, jnp.int32),
        is_first=jnp.asarray(first, jnp.int32),
        shape=(k_dim, n_dim), bk=bk, bn=bn, scale=scale,
        n_zero_blocks=n_zero)


def _bs_kernel(bk_ref, bj_ref, f_ref, x_ref, w_ref, o_ref, *,
               compute_dtype):
    s = pl.program_id(1)

    @pl.when(f_ref[s] == 1)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # int8 tiles dequantize on the VPU; integer values are exact in
    # bf16/f32, so the MXU can run its low-precision fast path and the
    # pow2 scale applies once to the accumulated result (in the wrapper).
    x = x_ref[...].astype(compute_dtype)
    w = w_ref[0].astype(compute_dtype)
    o_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def block_sparse_matmul(x: jax.Array, w: BlockSparseWeight,
                        bm: int = DEFAULT_BM,
                        interpret: Optional[bool] = None) -> jax.Array:
    """y = x @ w for (..., K) activations, skipping zero weight tiles.
    Returns (..., N) in float32 (dequantized when ``w.scale`` is set)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_dim, n_dim = w.shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    xm = x.reshape(m, x.shape[-1])

    bm = min(bm, max(8, -(-m // 8) * 8))
    m_pad = -(-m // bm) * bm
    k_pad = -(-k_dim // w.bk) * w.bk
    if m_pad != m or k_pad != k_dim:
        xm = jnp.pad(xm, ((0, m_pad - m), (0, k_pad - k_dim)))
    n_tiles = -(-n_dim // w.bn)

    compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_pad // bm, w.nnz),
        in_specs=[
            pl.BlockSpec((bm, w.bk),
                         lambda i, s, bkr, bjr, fr: (i, bkr[s])),
            pl.BlockSpec((1, w.bk, w.bn),
                         lambda i, s, bkr, bjr, fr: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, w.bn),
                               lambda i, s, bkr, bjr, fr: (i, bjr[s])),
    )
    y = pl.pallas_call(
        functools.partial(_bs_kernel, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_tiles * w.bn),
                                       jnp.float32),
        interpret=interpret,
    )(w.blk_k, w.blk_j, w.is_first, xm, w.data)
    y = y[:m, :n_dim]
    if w.scale is not None:
        y = y * w.scale
    return y.reshape(*lead, n_dim)
