"""On-device STFT / iSTFT for the NDNS audio-denoising task.

Reference semantics: `stft_splitter`/`stft_mixer` train_helpers.py:1381-1412
(nfft=512, hop=128, boxcar window, one-sided). Runs fully on device —
`jax.scipy.signal.stft` lowers to rFFTs which XLA maps well to TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NFFT = 512
HOP_LENGTH = 128
NOVERLAP = NFFT - HOP_LENGTH
N_FREQ = NFFT // 2 + 1  # = 257 = NDNS feature dim


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_splitter(audio: jax.Array, nfft: int = NFFT,
                  hop_length: int = HOP_LENGTH) -> Tuple[jax.Array, jax.Array]:
    """audio (..., T) -> (magnitude, phase), each (..., nfft//2+1, n_frames).

    Magnitudes use the torch.stft convention (raw frame rFFT, no 1/N
    window normalization) — the convention the reference trained with
    (train_helpers.py:1381-1396 via torch parity, and the 0.0007
    mean-subtraction constant at :1434). scipy's stft scales by
    1/win.sum(); we undo that here and re-apply it in stft_mixer.
    """
    _, _, spec = jax.scipy.signal.stft(
        audio,
        nperseg=nfft,
        nfft=nfft,
        noverlap=nfft - hop_length,
        window="boxcar",
        return_onesided=True,
    )
    spec = spec * nfft  # scipy 1/win.sum() -> torch convention
    return jnp.abs(spec), jnp.angle(spec)


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_mixer(mag: jax.Array, phase: jax.Array, nfft: int = NFFT,
               hop_length: int = HOP_LENGTH) -> jax.Array:
    """(magnitude, phase) -> audio (..., T). Inverse of stft_splitter."""
    _, audio = jax.scipy.signal.istft(
        (mag / nfft) * jnp.exp(1j * phase),
        nperseg=nfft,
        nfft=nfft,
        noverlap=nfft - hop_length,
        window="boxcar",
        input_onesided=True,
    )
    return audio
