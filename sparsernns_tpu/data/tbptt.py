"""Truncated backprop-through-time (TBPTT) chunked training.

Ports the capability of the reference's TBPTTDataLoader
(/root/reference/sparseRNNs/dataloaders/base.py:208-283, registered as
loader_registry["tbptt"] at base.py:417-421): long sequences are split
into fixed-length chunks with an optional overlap prefix, each chunk
yielded with a ``reset`` flag that is True only for the first chunk of
a batch of sequences. Gradients are truncated at chunk boundaries.

TPU-native design differences from the torch loader:

- The chunker is a pure generator over host numpy batches (it composes
  with any loader yielding ``(x, y)`` with x of shape (B, L, ...)); all
  chunks of one batch share a static shape so XLA compiles ONE step.
- State threading uses the model's existing "cache" carry collection
  (models/ssm.py S5SSM._carry): the carry returned from one chunk's
  ``apply`` enters the next chunk as plain data, which IS the TBPTT
  truncation — no ``detach()`` needed, gradients cannot flow backward
  through a non-differentiated input.
- ``reset`` zeroes the carry pytree outside the compiled step (a
  host-side bool, mirroring the reference's per-sequence reset flag).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tbptt_chunks(x: np.ndarray, y: Optional[np.ndarray], chunk_len: int,
                 overlap_len: int = 1, pad_value: float = 0.0
                 ) -> Iterator[Tuple[np.ndarray, Any, bool]]:
    """Split one batch (x: (B, L, ...), y: per-step (B, L, ...) or
    per-sequence (B,)) into TBPTT chunks.

    Semantics match the reference loader (base.py:235-281): the input is
    left-padded with ``overlap_len - 1`` ``pad_value`` steps, each chunk
    carries that overlap prefix, per-step targets cover only the
    non-overlap span, and ``reset`` is True for the first chunk. Chunks
    keep a static (chunk_len + overlap_len - 1) length; the final
    partial chunk is dropped exactly as the reference's ``[:-1]`` does.
    """
    if chunk_len <= 0:
        raise ValueError(f"chunk_len must be positive, got {chunk_len}")
    if overlap_len < 1:
        raise ValueError(f"overlap_len must be >= 1, got {overlap_len}")
    b, seq = x.shape[0], x.shape[1]

    def pad(a, val):
        pad_block = np.full((b, overlap_len - 1) + a.shape[2:], val,
                            a.dtype)
        return np.concatenate([pad_block, a], axis=1)

    x = pad(x, pad_value)
    y_stepwise = y is not None and y.ndim > 1 and y.shape[1] == seq
    if y_stepwise:
        y = pad(y, 0)
    total = x.shape[1]

    reset = True
    for begin in list(range(overlap_len - 1, total, chunk_len))[:-1]:
        start = begin - overlap_len + 1
        end = begin + chunk_len
        x_chunk = x[:, start:end]
        y_chunk = y[:, begin:end] if y_stepwise else y
        yield x_chunk, y_chunk, reset
        reset = False


class TBPTTLoader:
    """Wrap any ``(x, y)`` batch loader into a TBPTT chunk stream —
    the analog of loader_registry["tbptt"] (base.py:417-421)."""

    def __init__(self, loader, chunk_len: int, overlap_len: int = 1,
                 pad_value: float = 0.0):
        self.loader = loader
        self.chunk_len = chunk_len
        self.overlap_len = overlap_len
        self.pad_value = pad_value

    def __iter__(self):
        for x, y in self.loader:
            yield from tbptt_chunks(np.asarray(x), np.asarray(y),
                                    self.chunk_len, self.overlap_len,
                                    self.pad_value)

    def __len__(self):
        # chunks per batch = len(range(overlap-1, seq+overlap-1, chunk)) - 1
        # = ceil(seq / chunk) - 1 (the range's start offset cancels the
        # overlap padding)
        per_batch = max(0, -(-_first_len(self.loader) // self.chunk_len) - 1)
        return len(self.loader) * per_batch


def _first_len(loader) -> int:
    seq = getattr(loader, "seq_len",
                  getattr(getattr(loader, "dataset", None), "seq_len", None))
    if seq is None:
        raise TypeError("loader must expose seq_len for len(TBPTTLoader)")
    return seq


def zero_carry(carry) -> Any:
    """Reset pytree for the model's "cache" carry collection."""
    return jax.tree_util.tree_map(jnp.zeros_like, carry)


def init_carry(model, variables, x_chunk, rng=None) -> Any:
    """Create the "cache" carry collection by running one forward with
    the cache mutable (models/ssm.py _carry materializes the variables
    on first use). ``rng`` feeds dropout for training-mode models."""
    rngs = {"dropout": rng if rng is not None else jax.random.PRNGKey(0)}
    _, mutated = model.apply(variables, x_chunk, mutable=["cache"],
                             rngs=rngs)
    return zero_carry(mutated["cache"])


def make_tbptt_train_step(model, loss_fn: Callable[[jax.Array, Any],
                                                   jax.Array],
                          batchnorm: bool = True,
                          overlap_len: int = 1):
    """One TBPTT chunk step: forward from the incoming carry, loss on the
    chunk's non-overlap span, grads truncated at the chunk boundary (the
    carry is a non-differentiated input), carry written back from the
    chunk's final state.

    Returns ``step(state, rng, carry, x_chunk, y_chunk) ->
    (state, carry, metrics)``; call :func:`zero_carry` on ``reset``.
    """

    @jax.jit
    def step(state, rng, carry, x_chunk, y_chunk):
        def compute(params):
            variables = {"params": params, "cache": carry}
            mutable = ["cache"]
            if batchnorm:
                variables["batch_stats"] = state.batch_stats
                mutable.append("batch_stats")
            out, mutated = state.apply_fn(
                variables, x_chunk, mutable=mutable,
                rngs={"dropout": rng})
            if overlap_len > 1:
                out = out[:, overlap_len - 1:]
            return loss_fn(out, y_chunk), mutated

        (loss, mutated), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if batchnorm:
            state = state.replace(batch_stats=mutated["batch_stats"])
        return state, mutated["cache"], {"loss": loss}

    return step
