"""Loss / STFT tests — the reference validated these against PyTorch
(dataloaders/NDNS/{stft,si_snr}_jax_vs_pytorch.py); here we validate against
closed-form properties and numpy."""

import jax.numpy as jnp
import numpy as np

import jax

from sparsernns_tpu.ops.stft import stft_mixer, stft_mixer_fft, stft_splitter
from sparsernns_tpu.train.losses import (accuracy, cross_entropy_loss,
                                         ndns_loss_from_mask, si_snr)


def test_si_snr_perfect_estimate_is_high():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 1000), jnp.float32)
    snr = si_snr(x, x)
    assert snr.shape == (3,)
    assert np.all(np.asarray(snr) > 50.0)


def test_si_snr_scale_invariance():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 500), jnp.float32)
    est = x + 0.1 * jnp.asarray(rng.randn(2, 500), jnp.float32)
    np.testing.assert_allclose(si_snr(x, est), si_snr(x, 3.7 * est), atol=1e-3)


def test_si_snr_known_value():
    t = np.linspace(0, 1, 1600).astype(np.float32)
    clean = np.sin(2 * np.pi * 100 * t)
    noise = 0.1 * np.cos(2 * np.pi * 333 * t)
    snr = float(si_snr(jnp.asarray(clean[None]), jnp.asarray((clean + noise)[None]))[0])
    # power ratio ≈ (0.5)/(0.005) = 100 → ≈ 20 dB
    assert 18.0 < snr < 22.0


def test_stft_roundtrip():
    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(2, 16000), jnp.float32)
    mag, phase = stft_splitter(audio)
    assert mag.shape[1] == 257
    recon = stft_mixer(mag, phase)
    n = min(recon.shape[-1], audio.shape[-1])
    np.testing.assert_allclose(recon[:, 256:n - 256],
                               np.asarray(audio)[:, 256:n - 256], atol=1e-3)


def test_stft_mixer_matmul_matches_fft():
    """The MXU matmul-DFT iSTFT is the hot training path; the jax.scipy
    FFT istft is its semantics oracle — values AND mag-gradients must
    agree (the loss only differentiates through mag)."""
    rng = np.random.RandomState(7)
    for n_frames in (126, 37):  # even/odd frame counts, incl. tiny
        t = (n_frames - 1) * 128
        audio = jnp.asarray(rng.randn(2, t + 128), jnp.float32)
        mag, phase = stft_splitter(audio)
        assert mag.shape[-1] >= n_frames
        mag, phase = mag[..., :n_frames], phase[..., :n_frames]
        fast = stft_mixer(mag, phase)
        ref = stft_mixer_fft(mag, phase)
        assert fast.shape == ref.shape
        scale = float(np.abs(np.asarray(ref)).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(fast) / scale,
                                   np.asarray(ref) / scale, atol=2e-6)

        def loss_fast(m):
            return jnp.sum(jnp.abs(stft_mixer(m, phase)))

        def loss_ref(m):
            return jnp.sum(jnp.abs(stft_mixer_fft(m, phase)))

        g_fast = np.asarray(jax.grad(loss_fast)(mag))
        g_ref = np.asarray(jax.grad(loss_ref)(mag))
        gs = np.abs(g_ref).max() + 1e-6
        np.testing.assert_allclose(g_fast / gs, g_ref / gs, atol=2e-5)


def test_ndns_loss_zero_mask_on_clean_input():
    rng = np.random.RandomState(3)
    audio = jnp.asarray(rng.randn(1, 16000), jnp.float32)
    mag, phase = stft_splitter(audio)
    loss, snr, cleaned_mag = ndns_loss_from_mask(
        jnp.zeros_like(mag), mag, phase, mag, audio)
    # mask=0 on clean==noisy -> cleaned==clean -> SI-SNR very high, loss ≈ 100-snr
    assert snr > 40.0
    assert loss < 60.0
    np.testing.assert_allclose(cleaned_mag, mag, atol=1e-6)


def test_cross_entropy_and_accuracy():
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    labels = jnp.asarray([0, 1])
    loss = float(cross_entropy_loss(logits, labels))
    expected = -(np.log(0.7) + np.log(0.8)) / 2
    np.testing.assert_allclose(loss, expected, atol=1e-4)
    assert float(accuracy(logits, labels)) == 1.0
