"""On-device STFT / iSTFT for the NDNS audio-denoising task.

Reference semantics: `stft_splitter`/`stft_mixer` train_helpers.py:1381-1412
(nfft=512, hop=128, boxcar window, one-sided). Runs fully on device —
`jax.scipy.signal.stft` lowers to rFFTs which XLA maps well to TPU.
"""

from __future__ import annotations

from functools import lru_cache, partial, reduce
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NFFT = 512
HOP_LENGTH = 128
NOVERLAP = NFFT - HOP_LENGTH
N_FREQ = NFFT // 2 + 1  # = 257 = NDNS feature dim


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_splitter_fft(audio: jax.Array, nfft: int = NFFT,
                      hop_length: int = HOP_LENGTH
                      ) -> Tuple[jax.Array, jax.Array]:
    """audio (..., T) -> (magnitude, phase), each (..., nfft//2+1, n_frames).

    FFT/complex reference implementation (jax.scipy stft) — the
    semantics oracle for stft_splitter, which replaces it on the hot
    path (XLA's TPU rFFT lowers to factorized convolution stages; at the
    flagship batch this call cost 2.06e9 HBM bytes and the train loop
    makes it twice per batch).

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


@lru_cache(maxsize=4)
def _dft_matrix(nfft: int) -> np.ndarray:
    """(nfft, nfft+2) real one-sided DFT basis: columns are [cos | -sin]
    so that frames @ _dft_matrix == [Re rfft(frames) | Im rfft(frames)]."""
    f = nfft // 2 + 1
    n = np.arange(nfft)[:, None]
    k = np.arange(f)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    return np.concatenate([np.cos(ang), -np.sin(ang)],
                          axis=1).astype(np.float32)


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_splitter(audio: jax.Array, nfft: int = NFFT,
                  hop_length: int = HOP_LENGTH) -> Tuple[jax.Array, jax.Array]:
    """audio (..., T) -> (magnitude, phase), each (..., nfft//2+1, n_frames).

    TPU-idiomatic STFT: overlapping frames come from hop-width reshapes
    (nfft/hop shifted views of one zero-extended buffer, no gather) and
    the one-sided DFT is ONE MXU matmul against a (nfft, nfft+2) basis —
    no complex dtype, no FFT factorization stages. Identical semantics
    to stft_splitter_fft (same boundary/padded framing as scipy's stft,
    torch-convention magnitudes); parity pinned in tests/test_losses.py.
    """
    if nfft % hop_length != 0:
        return stft_splitter_fft(audio, nfft=nfft, hop_length=hop_length)
    lead = audio.shape[:-1]
    t = audio.shape[-1]
    # scipy framing: 'zeros' boundary pads nfft//2 both ends, then
    # `padded=True` zero-extends so (len - nfft) % hop == 0
    ext = t + nfft
    nadd = (-(ext - nfft) % hop_length) % nfft
    ext += nadd
    n_frames = (ext - nfft) // hop_length + 1
    x = jnp.pad(audio, [(0, 0)] * len(lead)
                + [(nfft // 2, nfft // 2 + nadd)])
    strips = x.reshape(*lead, ext // hop_length, hop_length)
    frames = jnp.concatenate(
        [strips[..., j:j + n_frames, :]
         for j in range(nfft // hop_length)], axis=-1)  # (..., L, nfft)
    basis = jnp.asarray(_dft_matrix(nfft))
    spec = jax.lax.dot_general(
        frames, basis, (((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # (..., L, nfft+2)
    f = nfft // 2 + 1
    re = jnp.swapaxes(spec[..., :f], -1, -2)  # (..., F, L)
    im = jnp.swapaxes(spec[..., f:], -1, -2)
    return jnp.sqrt(re * re + im * im), jnp.arctan2(im, re)


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_mixer_fft(mag: jax.Array, phase: jax.Array, nfft: int = NFFT,
                   hop_length: int = HOP_LENGTH) -> jax.Array:
    """(magnitude, phase) -> audio (..., T). Inverse of stft_splitter.

    FFT/complex reference implementation (jax.scipy istft). Kept as the
    semantics oracle for stft_mixer; not used in the training hot path —
    XLA lowers the 512-point irFFT into factorized convolution stages
    with layout copies, and the train step's loss backward through it
    dominated the step's XLA-side HBM traffic (byte audit, PERF.md)."""
    _, audio = jax.scipy.signal.istft(
        (mag / nfft) * jnp.exp(1j * phase),
        nperseg=nfft,
        nfft=nfft,
        noverlap=nfft - hop_length,
        window="boxcar",
        input_onesided=True,
    )
    return audio


@lru_cache(maxsize=4)
def _idft_matrix(nfft: int) -> np.ndarray:
    """(nfft+2, nfft) real one-sided inverse-DFT basis: rows are the
    [cos; -sin] responses so that for spectrum Z (one-sided, F=nfft/2+1)
    irfft(Z, nfft) == [Re Z; Im Z]^T @ _idft_matrix (the k=0 and k=N/2
    bins undoubled, matching numpy.fft.irfft's hermitian convention)."""
    f = nfft // 2 + 1
    k = np.arange(f)[:, None]
    n = np.arange(nfft)[None, :]
    ang = 2.0 * np.pi * k * n / nfft
    w = np.full((f, 1), 2.0)
    w[0, 0] = 1.0
    w[-1, 0] = 1.0
    c = w * np.cos(ang) / nfft
    s = -w * np.sin(ang) / nfft
    return np.concatenate([c, s], axis=0).astype(np.float32)


@lru_cache(maxsize=8)
def _ola_norm(n_frames: int, nfft: int, hop: int) -> np.ndarray:
    """Boxcar window-overlap counts of the OLA output (scipy istft's
    `norm`), trimmed by nfft//2 at both ends (boundary=True)."""
    total = (n_frames - 1) * hop + nfft
    norm = np.zeros(total, np.float32)
    for start in range(0, total - nfft + 1, hop):
        norm[start:start + nfft] += 1.0
    return norm[nfft // 2: total - nfft // 2]


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_mixer_tm(mag: jax.Array, phase: jax.Array, nfft: int = NFFT,
                  hop_length: int = HOP_LENGTH) -> jax.Array:
    """TIME-MAJOR iSTFT core: (..., L, F) magnitude/phase -> audio (..., T).

    TPU-idiomatic: the one-sided inverse DFT runs as ONE MXU matmul
    against a (nfft+2, nfft) basis, and the boxcar overlap-add is
    nfft/hop shifted pad+adds — no complex dtype, no FFT factorization
    convolutions. The frequency-plane contraction happens on the
    MINOR-MOST axis — the layout the model emits its mask in (B, L, F),
    so the train/eval loss path carries no transposes in the
    user-visible graph. (Measured on the v5e lowering: XLA normalizes
    the frequency-major form to the same program — cost-model bytes are
    identical — so this core is an API/clarity choice for time-major
    callers, not a throughput claim.) Bit-compatible with
    stft_mixer_fft to f32 matmul precision (tests/test_losses.py);
    gradients flow through `mag` via the transposed dot.

    Bin-count handling matches the reference's `irfft(..., n=nfft)`
    (train_helpers.py:1399-1412): inputs with FEWER than nfft//2+1
    frequency bins are treated as a truncated one-sided spectrum and
    zero-padded up to the full bin count; inputs with MORE bins imply
    the caller framed at a larger nfft, which we infer as 2*(F-1)."""
    f_in = mag.shape[-1]
    if f_in > nfft // 2 + 1:
        nfft = 2 * (f_in - 1)
    if nfft % hop_length != 0:
        return stft_mixer_fft(jnp.swapaxes(mag, -1, -2),
                              jnp.swapaxes(phase, -1, -2),
                              nfft=nfft, hop_length=hop_length)
    if f_in < nfft // 2 + 1:
        # zero-pad the missing high bins (irfft n=nfft semantics)
        pad = [(0, 0)] * (mag.ndim - 1) + [(0, nfft // 2 + 1 - f_in)]
        mag = jnp.pad(mag, pad)
        phase = jnp.pad(phase, pad)
    n_frames = mag.shape[-2]
    lead = mag.shape[:-2]
    # (..., L, nfft+2): one fused elementwise producing both DFT planes
    products = jnp.concatenate(
        [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
    basis = jnp.asarray(_idft_matrix(nfft))
    # contract the minor-most frequency-plane dim -> frames (..., L, nfft)
    frames = jax.lax.dot_general(
        products, basis,
        (((products.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    # overlap-add: frame l covers samples [l*hop, l*hop + nfft)
    total = (n_frames - 1) * hop_length + nfft
    flat = n_frames * hop_length
    pieces = []
    for j in range(nfft // hop_length):
        piece = frames[..., :, j * hop_length:(j + 1) * hop_length]
        piece = piece.reshape(*lead, flat)
        pad = [(0, 0)] * len(lead) + [(j * hop_length,
                                       total - flat - j * hop_length)]
        pieces.append(jnp.pad(piece, pad))
    x = reduce(jnp.add, pieces)
    norm = jnp.asarray(_ola_norm(n_frames, nfft, hop_length))
    return x[..., nfft // 2: total - nfft // 2] / norm


@partial(jax.jit, static_argnames=("nfft", "hop_length"))
def stft_mixer(mag: jax.Array, phase: jax.Array, nfft: int = NFFT,
               hop_length: int = HOP_LENGTH) -> jax.Array:
    """(magnitude, phase) (..., F, L) -> audio (..., T). Inverse of
    stft_splitter (the reference's frequency-major convention,
    train_helpers.py:1399-1412). Thin transpose wrapper over the
    time-major core `stft_mixer_tm`; hot paths that already hold
    time-major tensors (the train/eval loss) call the core directly."""
    return stft_mixer_tm(jnp.swapaxes(mag, -1, -2),
                         jnp.swapaxes(phase, -1, -2),
                         nfft=nfft, hop_length=hop_length)
