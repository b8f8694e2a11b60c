"""Loss functions and quality metrics.

Reference parity: SI-SNR (train_helpers.py:16-53), the NDNS loss
0.001·MSE(mag) + (100 − SI-SNR) (train_helpers.py:1466-1469), and
cross-entropy for classification (train_helpers.py one-hot CE).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sparsernns_tpu.ops.stft import stft_mixer_tm

_EPS = 1e-8


@jax.jit
def si_snr(target: jax.Array, estimate: jax.Array) -> jax.Array:
    """Scale-invariant SNR in dB; last axis is time. Returns per-example
    values (leading axes preserved)."""
    s_target = target - jnp.mean(target, axis=-1, keepdims=True)
    s_estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)

    dot = jnp.sum(s_target * s_estimate, axis=-1, keepdims=True)
    t_norm = jnp.sum(s_target ** 2, axis=-1, keepdims=True)
    proj = dot * s_target / t_norm
    noise = s_estimate - proj

    ratio = jnp.sum(proj ** 2, axis=-1) / (jnp.sum(noise ** 2, axis=-1) + _EPS)
    return 10.0 * jnp.log10(ratio + _EPS)


STFT_MAG_MEAN = 0.0007  # input mean-subtraction constant (train_helpers.py:1434)
NDNS_LOSS_LAMBDA = 0.001


def ndns_loss_from_mask_tm(
    mask: jax.Array,
    noisy_mag: jax.Array,
    noisy_phase: jax.Array,
    clean_mag: jax.Array,
    clean_audio: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """TIME-MAJOR NDNS objective: all spectral tensors are (B, L, F) —
    the layout the model emits — so the mask needs no transpose inside
    the differentiated graph (the train step's phase/clean inputs
    transpose ONCE outside it; they carry no gradients). XLA lowers this
    and the frequency-major form to byte-identical programs on the v5e
    (measured); the tm entry point exists for time-major callers and to
    keep the step graph free of layout plumbing. Semantics identical to
    `ndns_loss_from_mask` (reference train_helpers.py:1461-1469): the
    MSE and SI-SNR terms are layout-invariant reductions.

    Returns (loss, mean SI-SNR, cleaned magnitude (B, L, F))."""
    cleaned_mag = noisy_mag * (1.0 + mask)
    cleaned = stft_mixer_tm(cleaned_mag, noisy_phase)
    # iSTFT length is hop-aligned and may exceed the original audio length
    cleaned = cleaned[..., :clean_audio.shape[-1]]
    snr = si_snr(cleaned, clean_audio)
    loss = NDNS_LOSS_LAMBDA * jnp.mean((cleaned_mag - clean_mag) ** 2) + (
        100.0 - jnp.mean(snr))
    return loss, jnp.mean(snr), cleaned_mag


def ndns_loss_from_mask(
    mask: jax.Array,
    noisy_mag: jax.Array,
    noisy_phase: jax.Array,
    clean_mag: jax.Array,
    clean_audio: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NDNS objective given the model's predicted spectral mask, in the
    reference's frequency-major convention.

    mask, *_mag, *_phase: (B, F, L); clean_audio: (B, T).
    Returns (loss, mean SI-SNR, cleaned magnitude (B, F, L)).
    Reference: train_helpers.py:1461-1469.
    """
    t = lambda a: jnp.swapaxes(a, -1, -2)  # noqa: E731
    loss, snr, cleaned_mag = ndns_loss_from_mask_tm(
        t(mask), t(noisy_mag), t(noisy_phase), t(clean_mag), clean_audio)
    return loss, snr, t(cleaned_mag)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean NLL of integer labels given log-probabilities (B, C)."""
    one_hot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(one_hot * logits, axis=-1))


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)
