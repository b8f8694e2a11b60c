"""Loss / STFT tests — the reference validated these against PyTorch
(dataloaders/NDNS/{stft,si_snr}_jax_vs_pytorch.py); here we validate against
closed-form properties and numpy."""

import jax.numpy as jnp
import numpy as np

import jax

from sparsernns_tpu.ops.stft import (stft_mixer, stft_mixer_fft,
                                     stft_mixer_tm, stft_splitter)
from sparsernns_tpu.train.losses import (accuracy, cross_entropy_loss,
                                         ndns_loss_from_mask,
                                         ndns_loss_from_mask_tm, si_snr)


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


def test_stft_mixer_pads_truncated_bins():
    """Regression for round-2's HEAD bug: models whose feature dim F is
    not nfft//2+1 must still mix — the reference's irfft(..., n=512)
    zero-pads missing bins (train_helpers.py:1399-1412). F=33 is the
    exact shape from the failed MULTICHIP_r02 dryrun."""
    rng = np.random.RandomState(11)
    mag = jnp.asarray(np.abs(rng.randn(2, 33, 17)), jnp.float32)
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 33, 17)), jnp.float32)
    fast = stft_mixer(mag, phase)  # default nfft=512, hop=128
    assert fast.shape == (2, 16 * 128)
    # oracle: zero-pad the spectrum to 257 bins and run the FFT path
    pad = [(0, 0), (0, 257 - 33), (0, 0)]
    ref = stft_mixer_fft(jnp.pad(mag, pad), jnp.pad(phase, pad))
    scale = float(np.abs(np.asarray(ref)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(fast) / scale,
                               np.asarray(ref) / scale, atol=2e-6)


def test_stft_mixer_matches_fft_at_non_512_nfft():
    """Mixer/splitter parity at nfft=64, hop=16 — bin-count inference
    must not regress explicit non-default framing."""
    rng = np.random.RandomState(12)
    audio = jnp.asarray(rng.randn(2, 2000), jnp.float32)
    mag, phase = stft_splitter(audio, nfft=64, hop_length=16)
    assert mag.shape[-2] == 33
    fast = stft_mixer(mag, phase, nfft=64, hop_length=16)
    ref = stft_mixer_fft(mag, phase, nfft=64, hop_length=16)
    assert fast.shape == ref.shape
    scale = float(np.abs(np.asarray(ref)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(fast) / scale,
                               np.asarray(ref) / scale, atol=2e-6)
    # F > nfft//2+1 with the DEFAULT nfft: infer nfft=2*(F-1) — a
    # 513-bin input mixes as a 1024-point iSTFT instead of crashing
    big_mag = jnp.asarray(np.abs(rng.randn(1, 513, 9)), jnp.float32)
    big_phase = jnp.zeros((1, 513, 9), jnp.float32)
    out = stft_mixer(big_mag, big_phase)
    assert out.shape == (1, 8 * 128)


def test_ndns_loss_small_feature_dim():
    """ndns_loss_from_mask at F=33 (the 13-test round-2 regression)."""
    rng = np.random.RandomState(13)
    mag = jnp.asarray(np.abs(rng.randn(2, 33, 17)), jnp.float32)
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 33, 17)), jnp.float32)
    audio = jnp.asarray(rng.randn(2, 16 * 128), jnp.float32)
    loss, snr, cleaned = ndns_loss_from_mask(
        jnp.zeros_like(mag), mag, phase, mag, audio)
    assert np.isfinite(float(loss)) and np.isfinite(float(snr))
    assert cleaned.shape == mag.shape
    # and gradients flow (the train-step path)
    g = jax.grad(lambda m: ndns_loss_from_mask(m, mag, phase, mag, audio)[0])(
        jnp.zeros_like(mag))
    assert np.isfinite(np.asarray(g)).all()


def test_stft_mixer_tm_matches_freq_major():
    """The time-major core (the train/eval hot path — frequency
    contraction on the minor-most axis, no relayout) must match the
    frequency-major wrapper AND the FFT oracle, at the default framing,
    truncated bins, and a non-default nfft."""
    rng = np.random.RandomState(21)
    cases = [
        ((2, 257, 37), {}),             # default nfft, full bins
        ((2, 33, 17), {}),              # truncated bins (F=33 regression)
        ((2, 33, 29), {"nfft": 64, "hop_length": 16}),  # explicit framing
    ]
    for shape, kw in cases:
        mag = jnp.asarray(np.abs(rng.randn(*shape)), jnp.float32)
        phase = jnp.asarray(rng.uniform(-np.pi, np.pi, shape), jnp.float32)
        fm = stft_mixer(mag, phase, **kw)
        tm = stft_mixer_tm(jnp.swapaxes(mag, -1, -2),
                           jnp.swapaxes(phase, -1, -2), **kw)
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(tm))

        def loss_tm(m):
            return jnp.sum(jnp.abs(stft_mixer_tm(
                m, jnp.swapaxes(phase, -1, -2), **kw)))

        g = np.asarray(jax.grad(loss_tm)(jnp.swapaxes(mag, -1, -2)))
        assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_ndns_loss_tm_matches_freq_major():
    """ndns_loss_from_mask_tm (the in-step layout) == ndns_loss_from_mask
    (the reference-convention API) on identical data."""
    rng = np.random.RandomState(22)
    mag = jnp.asarray(np.abs(rng.randn(2, 257, 37)), jnp.float32)
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 257, 37)), jnp.float32)
    clean_mag = mag * 0.9
    audio = jnp.asarray(rng.randn(2, 36 * 128), jnp.float32)
    mask = jnp.asarray(0.1 * rng.randn(2, 257, 37), jnp.float32)
    t = lambda a: jnp.swapaxes(a, -1, -2)  # noqa: E731
    loss_f, snr_f, cleaned_f = ndns_loss_from_mask(
        mask, mag, phase, clean_mag, audio)
    loss_t, snr_t, cleaned_t = ndns_loss_from_mask_tm(
        t(mask), t(mag), t(phase), t(clean_mag), audio)
    np.testing.assert_allclose(float(loss_f), float(loss_t), rtol=1e-6)
    np.testing.assert_allclose(float(snr_f), float(snr_t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(cleaned_f),
                                  np.asarray(t(cleaned_t)))


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
