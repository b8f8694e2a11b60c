"""Block-sparse dense matmul: packing, kernel parity, and the honest
cost accounting (realized savings == zero-tile fraction, nothing more).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.pallas.block_sparse import (BlockSparseWeight,
                                                    block_sparse_matmul,
                                                    pack_block_sparse)


def _tiled_sparse_weight(rng, k, n, bk, bn, zero_frac):
    w = rng.randn(k, n).astype(np.float32)
    k_tiles, n_tiles = -(-k // bk), -(-n // bn)
    flat = [(i, j) for i in range(k_tiles) for j in range(n_tiles)]
    rng.shuffle(flat)
    for (i, j) in flat[: int(zero_frac * len(flat))]:
        w[i * bk:(i + 1) * bk, j * bn:(j + 1) * bn] = 0.0
    return w


@pytest.mark.parametrize("zero_frac", [0.0, 0.4, 0.9])
def test_matches_dense(rng, zero_frac):
    k, n, bk, bn = 48, 40, 8, 8
    w = _tiled_sparse_weight(rng, k, n, bk, bn, zero_frac)
    bsw = pack_block_sparse(w, bk=bk, bn=bn)
    x = rng.randn(2, 11, k).astype(np.float32)   # odd M exercises padding
    y = block_sparse_matmul(jnp.asarray(x), bsw, bm=8)
    np.testing.assert_allclose(np.asarray(y), x @ w, rtol=1e-5, atol=1e-5)


def test_fully_zero_output_tile_written():
    """Output tiles with no kept weight block must still produce zeros
    (the pad block), never garbage."""
    w = np.zeros((16, 16), np.float32)
    w[:8, :8] = 1.0          # only tile (0, 0) nonzero
    bsw = pack_block_sparse(w, bk=8, bn=8)
    x = np.ones((4, 16), np.float32)
    y = np.asarray(block_sparse_matmul(jnp.asarray(x), bsw, bm=8))
    assert np.all(y[:, 8:] == 0.0)
    np.testing.assert_allclose(y[:, :8], x @ w[:, :8] @ np.eye(8)[:8],
                               rtol=1e-6)


def test_int8_scale_dequant(rng):
    k, n, bk, bn = 16, 16, 8, 8
    wq = rng.randint(-127, 128, size=(k, n)).astype(np.int8)
    wq[8:, :8] = 0
    scale = 2.0 ** -5
    bsw = pack_block_sparse(wq, bk=bk, bn=bn, scale=scale)
    assert bsw.data.dtype == jnp.int8
    x = rng.randn(5, k).astype(np.float32)
    y = block_sparse_matmul(jnp.asarray(x), bsw, bm=8)
    np.testing.assert_allclose(np.asarray(y),
                               x @ (wq.astype(np.float32) * scale),
                               rtol=1e-4, atol=1e-4)


def test_density_accounting(rng):
    """density reports what is actually stored/computed: padded empty
    output tiles count as cost, zeroed tiles as savings."""
    k, n, bk, bn = 32, 32, 8, 8           # 4x4 = 16 tiles
    w = _tiled_sparse_weight(rng, k, n, bk, bn, 0.0)
    # zero one full output-tile column (4 tiles) + 2 scattered tiles
    w[:, 0:8] = 0.0
    w[0:8, 8:16] = 0.0
    w[8:16, 16:24] = 0.0
    bsw = pack_block_sparse(w, bk=bk, bn=bn)
    # kept: 16 - 6 zeroed + 1 pad for the empty column = 11
    assert bsw.nnz == 11
    assert bsw.density == pytest.approx(11 / 16)
    assert bsw.n_zero_blocks == 5         # 6 zeroed - 1 repurposed as pad
    dense_bytes = k * n * 4
    assert bsw.hbm_bytes() < dense_bytes


def test_pytree_roundtrip(rng):
    w = _tiled_sparse_weight(rng, 16, 16, 8, 8, 0.5)
    bsw = pack_block_sparse(w, bk=8, bn=8, scale=0.5)
    leaves, treedef = jax.tree_util.tree_flatten(bsw)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, BlockSparseWeight)
    assert rebuilt.scale == 0.5 and rebuilt.shape == (16, 16)


def test_bf16_activations(rng):
    k, n = 16, 16
    w = _tiled_sparse_weight(rng, k, n, 8, 8, 0.5)
    bsw = pack_block_sparse(w, bk=8, bn=8)
    x = rng.randn(4, k).astype(np.float32)
    y = block_sparse_matmul(jnp.asarray(x, jnp.bfloat16), bsw, bm=8)
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y), x @ w, rtol=0.05, atol=0.05)
