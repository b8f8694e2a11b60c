"""Fxp classification engine + alternate bit-width (w8a8) static pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


from sparsernns_tpu.fxp.derive import FxpModelConfig, build_fxp_model
from sparsernns_tpu.models.seq_model import ClassificationModel
from sparsernns_tpu.models.ssm import make_ssm_init_fn
from sparsernns_tpu.models.ssm_init import blocked_dplr_init
from sparsernns_tpu.quantize.calibrate import calibrate
from sparsernns_tpu.quantize.config import quantization_recipes


def _cls_model(q_config, h=12, d_in=6, n_cls=4, training=False):
    init = blocked_dplr_init(16, 2, conj_sym=True)
    mixer = make_ssm_init_fn(
        h=h, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
        vinv=init["Vinv"], clip_eigs=True, relufication=True,
        q_config=q_config)
    return ClassificationModel(
        mixer_cls=mixer, n_layers=1, d_model=h, d_output=n_cls,
        dropout=0.0, prenorm=True, batchnorm=True, glu_variant="half1",
        training=training, relufication=True, q_config=q_config,
        mode="pool")


@pytest.mark.parametrize("recipe", ["w8a16", "w8a8"])
def test_fxp_classification_pipeline(rng, recipe):
    x = jnp.asarray(rng.randn(3, 16, 6) * 0.5, jnp.float32)
    fp = _cls_model(quantization_recipes["none"]())
    vs = fp.init(jax.random.PRNGKey(0), x)
    y_fp = np.asarray(fp.apply(vs, x))  # log-probs (3, 4)

    cal = _cls_model(quantization_recipes[recipe](static_quant=True,
                                                  calibrating=True))
    fparams, fstats = calibrate(cal, jax.random.PRNGKey(1), x,
                                vs["params"], vs.get("batch_stats"), [x])

    inf_cfg = quantization_recipes[recipe](static_quant=True,
                                           calibrating=False)
    fxp = build_fxp_model(
        fparams, fstats, inf_cfg,
        model_cfg=FxpModelConfig.infer(
            fparams, glu_variant="half1", relufication=True,
            prenorm=True, clip_eigs=True, task="classification"))
    logits_fxp = np.asarray(fxp(x).to_float())
    assert logits_fxp.shape == y_fp.shape
    # integer classifier agrees with the float model on most predictions
    agree = np.mean(logits_fxp.argmax(-1) == y_fp.argmax(-1))
    assert agree >= 2 / 3, (agree, logits_fxp.argmax(-1), y_fp.argmax(-1))
    # and the integer log-softmax produces actual LOG-PROBS (the
    # reference's fxp_log_softmax is a stub): normalized and close in
    # value wherever quantization hasn't shifted the logits themselves
    probs = np.exp(logits_fxp)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=0.02)


def test_fxp_log_softmax_tracks_float():
    from sparsernns_tpu.fxp.array import fxp_from_fp, fxp_log_softmax
    rng = np.random.RandomState(7)
    x = rng.randn(5, 11) * 4.0
    fx = fxp_from_fp(jnp.asarray(x), bits=16, exp=10)
    y = np.asarray(fxp_log_softmax(fx).to_float())
    ref = np.asarray(jax.nn.log_softmax(fx.to_float(), axis=-1))
    mask = ref > -14  # below the exp-LUT domain the output saturates
    assert np.abs(y - ref)[mask].max() < 5e-3
    assert (y.argmax(-1) == ref.argmax(-1)).all()


def test_profiling_cost_model():
    from sparsernns_tpu.utils.profiling import S5Cost, StepTimer
    c = S5Cost.forward(b=8, l=3751, h=192, p=128)
    assert c.flops > 0
    assert c.hbm_bytes_fused < c.hbm_bytes_unfused
    assert c.speed_of_light_us() > 0
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            pass
    assert t.mean >= 0 and len(t.times) == 2


def test_fxp_log_softmax_wide_and_coarse_heads():
    """Review regressions: (a) a coarse-exponent recast used to saturate
    at the OLD bit width, collapsing distinct large logits to identical
    log-probs; (b) the log2-mantissa product overflowed int32 for heads
    past ~2k classes, returning positive 'log-probs'."""
    from sparsernns_tpu.fxp.array import (FxpArray, fxp_from_fp,
                                          fxp_log_softmax)
    # (a) exp=1 logits [5000, 2000, 0]: winner must stay separated
    x = FxpArray(jnp.asarray([[10000, 4000, 0]], jnp.int32), 16, 1)
    y = np.asarray(fxp_log_softmax(x).to_float())
    assert y[0, 0] > -0.01 and y[0, 1] < -10 and y[0, 2] < -10, y
    # moderate values at a coarse exp track the float reference
    x2 = FxpArray(jnp.asarray([[20, 10, 0]], jnp.int32), 16, 1)
    y2 = np.asarray(fxp_log_softmax(x2).to_float())
    ref2 = np.asarray(jax.nn.log_softmax(x2.to_float(), axis=-1))
    assert np.abs(y2 - ref2).max() < 5e-3
    # (b) 4096-class near-uniform head: all log-probs ~ -ln(4096), never
    # positive, within the LUT error of the float reference
    rng = np.random.RandomState(0)
    fx = fxp_from_fp(jnp.asarray(rng.randn(2, 4096) * 0.01), bits=16,
                     exp=10)
    y3 = np.asarray(fxp_log_softmax(fx).to_float())
    ref3 = np.asarray(jax.nn.log_softmax(fx.to_float(), axis=-1))
    assert (y3 <= 0).all()
    assert np.abs(y3 - ref3).max() < 5e-3
