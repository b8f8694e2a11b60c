"""Regression tests for the round-1 review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.stft import stft_splitter


def test_stft_torch_scale_convention():
    """Feature magnitudes are raw-rfft scale (a frame of ones -> DC = 512),
    matching the reference's torch.stft training convention."""
    audio = jnp.ones((1, 4096), jnp.float32)
    mag, _ = stft_splitter(audio)
    # interior frames: DC bin magnitude == window sum == 512
    np.testing.assert_allclose(np.asarray(mag)[0, 0, 5:-5], 512.0, rtol=1e-5)


def test_streaming_features_match_training_features(rng):
    """The streaming server's rfft features equal stft_splitter's for the
    same (uncentered-aligned) frames."""
    audio = rng.randn(1, 4096).astype(np.float32)
    mag, _ = stft_splitter(jnp.asarray(audio))
    # stft_splitter pads nfft//2 at both ends (centered); frame k of the
    # uncentered streaming analysis equals centered frame k+2 (256/128)
    frame0 = audio[0, 0:512]
    spec = np.abs(np.fft.rfft(frame0))
    np.testing.assert_allclose(spec, np.asarray(mag)[0, :, 2], atol=1e-2)


def test_grad_clip_binds_on_raw_gradients():
    import optax
    from sparsernns_tpu.train.optim import create_optimizer
    params = {"dense": {"kernel": jnp.ones((4, 4))}}
    tx = create_optimizer("standard", lr=1e-3, total_steps=10,
                          warmup_steps=1, grad_clip_threshold=1.0)
    state = tx.init(params)
    huge = {"dense": {"kernel": jnp.full((4, 4), 1e6)}}
    small = {"dense": {"kernel": jnp.full((4, 4), 1e-6)}}
    up_huge, _ = tx.update(huge, state, params)
    up_small, _ = tx.update(small, state, params)
    # with raw-grad clipping, a 1e6 gradient is indistinguishable from a
    # clipped one: the Adam update magnitudes must be comparable (both
    # bounded by ~lr), not scaled by 1e12
    h = float(jnp.abs(up_huge["dense"]["kernel"]).max())
    s = float(jnp.abs(up_small["dense"]["kernel"]).max())
    assert h < 1e-2 and s < 1e-2


def test_cli_optional_flags_typed():
    from sparsernns_tpu.cli import build_parser
    from sparsernns_tpu.utils.config import config_from_args
    args = build_parser().parse_args(
        ["train", "--grad_clip_threshold", "0.5", "--quant_input", "8"])
    cfg = config_from_args(args)
    assert cfg.grad_clip_threshold == 0.5
    assert isinstance(cfg.grad_clip_threshold, float)
    assert cfg.quant_input == 8.0


def test_loader_propagates_producer_errors(tmp_path):
    from sparsernns_tpu.data.ndns import NDNSLoader

    class BrokenDataset:
        length = 100

        def __len__(self):
            return 4

        def __getitem__(self, idx):
            raise ValueError("corrupt file")

    loader = NDNSLoader(BrokenDataset(), batch_size=2)
    with pytest.raises(ValueError, match="corrupt file"):
        list(loader)


def test_fxp_sigmoid_saturates():
    from sparsernns_tpu.fxp.array import fxp_from_fp
    from sparsernns_tpu.fxp.model import FxpSigmoid, FxpSpec
    sig = FxpSigmoid(FxpSpec(16, 14, signed=False))
    x = fxp_from_fp(jnp.asarray([100.0, -100.0, 0.0]), bits=16, exp=6)
    out = np.asarray(sig(x).to_float())
    assert out[0] <= 1.0 + 1e-3
    assert out[1] >= 0.0
    assert abs(out[2] - 0.5) < 1e-2


def test_affine_quant_dequant_covers_range():
    from sparsernns_tpu.quantize.config import QuantScheme
    from sparsernns_tpu.quantize.static import (calculate_qparams,
                                                quant_dequant)
    x = jnp.asarray(np.linspace(2.0, 6.0, 100), jnp.float32)  # strictly +
    scale, zp = calculate_qparams(jnp.min(x), jnp.max(x), bits=8,
                                  qscheme=QuantScheme.per_tensor_affine,
                                  pow2scale=False)
    out = np.asarray(quant_dequant(x, scale, zp, 8))
    # the whole range must be representable, not clipped
    np.testing.assert_allclose(out, np.asarray(x), atol=2 * float(scale))


def test_qat_single_quantization_is_scale_exact(rng):
    """Each re/im weight half keeps its own grid through the projection
    (no joint-grid double rounding)."""
    from sparsernns_tpu.models.seq_model import RegressionModel
    from tests.test_qat_training import qat_model
    x = jnp.asarray(rng.randn(1, 8, 17) * 0.01, jnp.float32)
    m = qat_model("w8a16").clone(training=False)
    vs = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vs, x)
    assert np.isfinite(np.asarray(y)).all()


def test_calibration_not_locked_by_zeros_init(rng):
    """Initializing the calibration model on an all-zeros example must not
    lock the in-scan state-requant scale at the eps floor (the
    self-referential clipping lock found in review round 2)."""
    import jax.numpy as jnp
    from tests.test_static_quant import _model, D_IO
    from sparsernns_tpu.quantize.calibrate import calibrate
    from sparsernns_tpu.quantize.config import quantization_recipes

    x = jnp.asarray(rng.randn(2, 24, D_IO) * 0.5, jnp.float32)
    fp = _model(quantization_recipes["none"]())
    vs = fp.init(jax.random.PRNGKey(0), x)
    _, mv = fp.apply(vs, x, mutable=["intermediates"])
    pre_c = mv["intermediates"]["encoder"]["layers_0"]["pre_C"][0]
    float_absmax = float(jnp.abs(pre_c[0]).max())

    cal = _model(quantization_recipes["w8a16"](static_quant=True,
                                               calibrating=True))
    zeros_example = jnp.zeros_like(x)  # convert.py uses a zeros example
    fparams, _ = calibrate(cal, jax.random.PRNGKey(1), zeros_example,
                           vs["params"], vs.get("batch_stats"), [x, x])
    s = float(np.asarray(
        fparams["encoder"]["layers_0"]["mixer"]["quant_xt"]["quant_real"]
        ["scale"]))
    qmax = 2 ** 15 - 1
    assert s * qmax > 0.5 * float_absmax, (s, float_absmax)
