"""Activation top-k sparsification.

Reference semantics: `top_k_sparsity`/`relu_top_k_sparsity`/`jump_relu`
layers.py:16-37. TPU-first: uses `jax.lax.approx_max_k` (hardware-friendly
approximate top-k that XLA tiles onto the VPU without full sorts) and a
scatter-free mask construction based on the k-th value threshold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def top_k_sparsity(x: jax.Array, k: int) -> jax.Array:
    """Keep the (approximately) k largest entries along the last axis,
    zero out the rest. Works for any leading batch shape.

    Instead of the reference's scatter of gathered values (layers.py:17-25,
    which XLA lowers to a serial scatter), we threshold against the k-th
    approximate max — a fully vectorized compare+select. Values equal to
    the threshold are kept, so ties may retain slightly more than k entries
    (approx_max_k itself is approximate, as in the reference).
    """
    if k >= x.shape[-1]:
        return x
    top_vals, _ = jax.lax.approx_max_k(x, k)
    threshold = top_vals[..., -1:]
    return jnp.where(x >= threshold, x, 0.0)


@partial(jax.jit, static_argnames=("k",))
def relu_top_k_sparsity(x: jax.Array, k: int) -> jax.Array:
    return jax.nn.relu(top_k_sparsity(x, k))


@partial(jax.jit, static_argnames=("threshold",))
def jump_relu(x: jax.Array, threshold: float) -> jax.Array:
    return jnp.where(x > threshold, x, 0.0)
