"""Numerical parity vs PyTorch for the signal-path primitives — the
test-suite version of the reference's standalone parity scripts
(dataloaders/NDNS/{stft,si_snr}_jax_vs_pytorch.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sparsernns_tpu.ops.stft import stft_mixer, stft_splitter
from sparsernns_tpu.train.losses import si_snr


def test_stft_magnitude_matches_torch():
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 16000).astype(np.float32)

    mag, phase = stft_splitter(jnp.asarray(audio))

    # torch.stft with the noverlap = nfft - hop mapping documented by the
    # reference (stft_jax_vs_pytorch.py:1-2): center=True, rect window.
    t = torch.stft(torch.from_numpy(audio), n_fft=512, hop_length=128,
                   window=torch.ones(512), center=True,
                   return_complex=True, pad_mode="constant")
    t_mag = t.abs().numpy()

    n = min(mag.shape[-1], t_mag.shape[-1])
    # stft_splitter emits torch-convention magnitudes directly
    np.testing.assert_allclose(np.asarray(mag)[..., 1:n - 1],
                               t_mag[..., 1:n - 1],
                               atol=2e-3 * t_mag.max())


def test_istft_roundtrip_matches_torch_roundtrip():
    rng = np.random.RandomState(1)
    audio = rng.randn(1, 8192).astype(np.float32)
    mag, phase = stft_splitter(jnp.asarray(audio))
    recon = np.asarray(stft_mixer(mag, phase))[:, :8192]
    np.testing.assert_allclose(recon[:, 512:-512], audio[:, 512:-512],
                               atol=1e-3)


def test_si_snr_matches_torch_formula():
    rng = np.random.RandomState(2)
    target = rng.randn(3, 4000).astype(np.float32)
    est = (target + 0.3 * rng.randn(3, 4000)).astype(np.float32)

    ours = np.asarray(si_snr(jnp.asarray(target), jnp.asarray(est)))

    t = torch.from_numpy(target)
    e = torch.from_numpy(est)
    t = t - t.mean(dim=-1, keepdim=True)
    e = e - e.mean(dim=-1, keepdim=True)
    proj = (t * e).sum(-1, keepdim=True) * t / (t ** 2).sum(-1, keepdim=True)
    noise = e - proj
    ref = 10 * torch.log10(
        (proj ** 2).sum(-1) / ((noise ** 2).sum(-1) + 1e-8) + 1e-8)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-3)
