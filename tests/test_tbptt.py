"""TBPTT chunked training (data/tbptt.py) — the reference's
TBPTTDataLoader capability (dataloaders/base.py:208-283) rebuilt on the
model's "cache" carry collection."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.data.tbptt import (TBPTTLoader, init_carry,
                                       make_tbptt_train_step, tbptt_chunks,
                                       zero_carry)
from sparsernns_tpu.models.seq_model import RegressionModel
from sparsernns_tpu.models.ssm import make_ssm_init_fn
from sparsernns_tpu.models.ssm_init import blocked_dplr_init
from sparsernns_tpu.train.optim import create_optimizer
from sparsernns_tpu.train.state import TrainState


def _reference_chunks(x, y, chunk_len, overlap_len):
    """Line-for-line numpy oracle of base.py:235-281 (without the
    divisibility min(), which only triggers on ragged tails we drop)."""
    b, seq = x.shape[0], x.shape[1]
    pad = np.zeros((b, overlap_len - 1) + x.shape[2:], x.dtype)
    xp = np.concatenate([pad, x], axis=1)
    ypad = np.zeros((b, overlap_len - 1) + y.shape[2:], y.dtype)
    yp = np.concatenate([ypad, y], axis=1)
    out = []
    reset = True
    for begin in list(range(overlap_len - 1, xp.shape[1], chunk_len))[:-1]:
        out.append((xp[:, begin - overlap_len + 1:begin + chunk_len],
                    yp[:, begin:begin + chunk_len], reset))
        reset = False
    return out


def test_chunker_matches_reference_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 37, 3).astype(np.float32)
    y = rng.randn(2, 37, 1).astype(np.float32)
    for chunk_len, overlap in [(8, 1), (8, 4), (10, 3)]:
        got = list(tbptt_chunks(x, y, chunk_len, overlap))
        want = _reference_chunks(x, y, chunk_len, overlap)
        assert len(got) == len(want) > 0
        for (gx, gy, gr), (wx, wy, wr) in zip(got, want):
            assert gr == wr
            assert gx.shape == (2, chunk_len + overlap - 1, 3)
            np.testing.assert_array_equal(gx, wx)
            np.testing.assert_array_equal(gy, wy)


def test_chunker_per_sequence_labels_pass_through():
    x = np.zeros((2, 20, 1), np.float32)
    labels = np.asarray([3, 1])
    chunks = list(tbptt_chunks(x, labels, 8))
    assert len(chunks) == 2
    for _, y, _ in chunks:
        np.testing.assert_array_equal(y, labels)


def test_tbptt_loader_wraps_batches():
    class Loader:
        seq_len = 24

        def __iter__(self):
            rng = np.random.RandomState(1)
            for _ in range(2):
                yield (rng.randn(2, 24, 1).astype(np.float32),
                       rng.randn(2, 24, 1).astype(np.float32))

        def __len__(self):
            return 2

    tb = TBPTTLoader(Loader(), chunk_len=8)
    chunks = list(tb)
    assert len(chunks) == len(tb) == 4  # 2 per batch (last partial dropped)
    resets = [r for _, _, r in chunks]
    assert resets == [True, False, True, False]


def _tiny_model(training):
    init = blocked_dplr_init(8, 2, conj_sym=True)
    mixer = make_ssm_init_fn(h=8, p=init["P"], lambda_init=init["Lambda"],
                             v=init["V"], vinv=init["Vinv"], clip_eigs=True)
    return RegressionModel(mixer_cls=mixer, n_layers=1, d_model=8,
                           d_output=2, dropout=0.0, prenorm=True,
                           batchnorm=False, glu_variant="none",
                           training=training)


def test_carry_threading_matches_full_sequence():
    """Forward through TBPTT chunks with the cache carry == one forward
    over the whole sequence (the truncation only affects gradients)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 2), jnp.float32)
    model = _tiny_model(training=False)
    variables = model.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(model.apply(variables, x))

    carry = init_carry(model, variables, x[:, :4])
    outs = []
    for i in range(0, 16, 4):
        y, mut = model.apply({**variables, "cache": carry}, x[:, i:i + 4],
                             mutable=["cache"])
        carry = mut["cache"]
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), y_full,
                               atol=1e-5)


def test_tbptt_train_step_truncates_and_learns():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 32, 2).astype(np.float32)
    y = rng.randn(2, 32, 2).astype(np.float32) * 0.1

    model = _tiny_model(training=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:, :8]))
    tx = create_optimizer("standard", lr=1e-3, ssm_lr=1e-3,
                          total_steps=10, warmup_steps=1)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats"))
    loss_fn = lambda pred, tgt: jnp.mean((pred - jnp.asarray(tgt)) ** 2)
    step = make_tbptt_train_step(model, loss_fn, batchnorm=False)
    carry = init_carry(model, variables, jnp.asarray(x[:, :8]))

    losses = []
    for x_c, y_c, reset in tbptt_chunks(x, y, 8):
        if reset:
            carry = zero_carry(carry)
        state, carry, metrics = step(state, jax.random.PRNGKey(1), carry,
                                     jnp.asarray(x_c), jnp.asarray(y_c))
        losses.append(float(metrics["loss"]))
    assert len(losses) == 3 and all(np.isfinite(losses))
    # the carry really moved (stateful across chunks)
    assert any(float(jnp.abs(v).max()) > 0
               for v in jax.tree_util.tree_leaves(carry))
    # params updated
    d0 = jax.tree_util.tree_leaves(variables["params"])[0]
    d1 = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.abs(d0 - d1).max()) > 0
