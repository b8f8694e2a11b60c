"""Quantization substrate tests — ports the intent of the reference's inline
tests (quantization.py:877-1093): observers, quant-dequant, quantized dense,
STE gradients, calibration->inference scale transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.quantize.config import (QuantizationConfig, QuantScheme,
                                            quantization_recipes)
from sparsernns_tpu.quantize.qat import QuantizedOps, fake_quant, q_dot, q_had
from sparsernns_tpu.quantize.static import (FakeQuant, MinMaxObserver,
                                            QuantizedDense, QuantizedMultiply,
                                            calculate_qparams,
                                            merge_trained_params_into_calibrated,
                                            move_scales_to_params,
                                            quant_dequant)


def test_recipes():
    cfg = quantization_recipes["w8a16"]()
    assert cfg.a_precision == 16 and cfg.b_precision == 8
    assert cfg.ssm_act_precision == 16
    assert not cfg.static_quant
    cfg2 = quantization_recipes["w8a16"](static_quant=True, calibrating=True)
    assert cfg2.static_quant and cfg2.calibrating
    assert not quantization_recipes["none"]().any_quantized
    rt = QuantizationConfig.from_dict(cfg.to_dict())
    assert rt == cfg


def test_fake_quant_grid():
    x = jnp.asarray([-1.0, -0.5, 0.0, 0.5, 1.0])
    out = np.asarray(fake_quant(x, 8))
    np.testing.assert_allclose(out, x, atol=1.0 / 127)
    # None/32-bit passthrough
    assert fake_quant(x, None) is x
    assert fake_quant(x, 32) is x


def test_fake_quant_ste_gradient():
    g = jax.grad(lambda x: jnp.sum(fake_quant(x, 8) ** 2))(
        jnp.asarray([0.3, -0.7, 1.0]))
    assert np.all(np.abs(np.asarray(g)) > 0)


def test_q_dot_matches_float_at_high_bits():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8), jnp.float32)
    w = jnp.asarray(rng.randn(8, 3), jnp.float32)
    exact = np.asarray(x @ w)
    q16 = np.asarray(q_dot(16, 16)(x, w))
    np.testing.assert_allclose(q16, exact, atol=1e-2)
    q8 = np.asarray(q_dot(8, 8)(x, w))
    np.testing.assert_allclose(q8, exact, atol=0.3)
    assert np.abs(q8 - exact).max() > np.abs(q16 - exact).max()


def test_q_had():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(5, 5), jnp.float32)
    b = jnp.asarray(rng.randn(5, 5), jnp.float32)
    np.testing.assert_allclose(q_had(16, 16)(a, b), a * b, atol=1e-3)


def test_quantized_ops_bundle():
    ops = QuantizedOps.create(quantization_recipes["w8a16"]())
    x = jnp.ones((2, 4))
    w = jnp.ones((4, 3))
    assert ops.b_dot(x, w).shape == (2, 3)
    ops_none = QuantizedOps.create(QuantizationConfig.none())
    assert ops_none.d_had is jnp.multiply


def test_minmax_observer_accumulates():
    obs = MinMaxObserver()
    x1 = jnp.asarray([[1.0, -2.0], [3.0, 0.5]])
    vars0 = obs.init(jax.random.PRNGKey(0), x1)
    _, s1 = obs.apply(vars0, x1, mutable=["batch_stats"])
    assert float(s1["batch_stats"]["observer_max"]) == 3.0
    x2 = jnp.asarray([[10.0, -20.0]])
    _, s2 = obs.apply(s1, x2, mutable=["batch_stats"])
    assert float(s2["batch_stats"]["observer_max"]) == 10.0
    assert float(s2["batch_stats"]["observer_min"]) == -20.0


def test_per_channel_observer():
    obs = MinMaxObserver(qscheme=QuantScheme.per_channel_symmetric)
    x = jnp.asarray([[1.0, -2.0], [3.0, 0.5]])
    vars0 = obs.init(jax.random.PRNGKey(0), x)
    _, s1 = obs.apply(vars0, x, mutable=["batch_stats"])
    np.testing.assert_allclose(s1["batch_stats"]["observer_max"], [3.0, 0.5])


def test_calculate_qparams_pow2():
    scale, zp = calculate_qparams(
        jnp.asarray(-0.9), jnp.asarray(1.1), bits=8, pow2scale=True)
    s = float(scale)
    assert abs(np.log2(s) - round(np.log2(s))) < 1e-6
    assert float(zp) == 0.0


def test_quant_dequant_sandwich():
    """atol sandwich mirroring reference test_quantdequant (quantization.py)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-1, 1, size=(100,)), jnp.float32)
    scale, _ = calculate_qparams(jnp.min(x), jnp.max(x), 8, pow2scale=False)
    out = np.asarray(quant_dequant(x, scale, 0.0, 8))
    assert np.abs(out - np.asarray(x)).max() < 0.1
    assert np.abs(out - np.asarray(x)).max() > 1e-5


def test_fake_quant_module_calibrate_then_freeze():
    """Calibration -> move scales to params -> static inference. The
    end-to-end scale-transfer equivalence test (quantization.py:955-1020)."""
    x = jnp.asarray(np.random.RandomState(3).uniform(-2, 2, (4, 16)), jnp.float32)
    fq_cal = FakeQuant(bits=8, calibrating=True)
    vars0 = fq_cal.init(jax.random.PRNGKey(0), x)
    out, state = fq_cal.apply(vars0, x, mutable=["batch_stats"])
    np.testing.assert_allclose(out, x)  # calibration is observation-only

    params, remaining = move_scales_to_params(
        vars0.get("params", {}), state["batch_stats"])
    scale = params["scale"]
    assert float(scale) > 0

    fq_inf = FakeQuant(bits=8, calibrating=False)
    out_inf = fq_inf.apply({"params": params}, x)
    expected = quant_dequant(x, scale, 0.0, 8)
    np.testing.assert_allclose(out_inf, expected)


def test_quantized_dense_calibration_flow():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(8, 16), jnp.float32)
    qd = QuantizedDense(features=4, a_bits=8, w_bits=8, calibrating=True)
    vars0 = qd.init(jax.random.PRNGKey(0), x)
    y, state = qd.apply(vars0, x, mutable=["batch_stats"])
    assert y.shape == (8, 4)

    params, _ = move_scales_to_params(vars0["params"], state["batch_stats"])
    qd_inf = QuantizedDense(features=4, a_bits=8, w_bits=8, calibrating=False)
    y_inf = qd_inf.apply({"params": params}, x)
    assert y_inf.shape == (8, 4)
    # quantized output close to float dense
    y_float = x @ vars0["params"]["kernel"] + vars0["params"]["bias"]
    assert np.abs(np.asarray(y_inf) - np.asarray(y_float)).max() < 0.5


def test_quantized_dense_backward_nonzero_grads():
    """STE: gradients flow through the quantized dense
    (reference test_backward_pass)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 16), jnp.float32)
    qd = QuantizedDense(features=4, a_bits=8, w_bits=8, calibrating=True)
    vars0 = qd.init(jax.random.PRNGKey(0), x)

    def loss(params):
        y, _ = qd.apply(
            {"params": params, "batch_stats": vars0["batch_stats"]},
            x, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(vars0["params"])
    assert float(jnp.abs(g["kernel"]).sum()) > 0


def test_quantized_multiply():
    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.randn(4, 8), jnp.float32)
    b = jnp.asarray(rng.randn(4, 8), jnp.float32)
    qm = QuantizedMultiply(left_bits=8, right_bits=8, calibrating=True)
    vars0 = qm.init(jax.random.PRNGKey(0), a, b)
    y, _ = qm.apply(vars0, a, b, mutable=["batch_stats"])
    np.testing.assert_allclose(y, a * b, atol=1e-6)


def test_merge_trained_params_into_calibrated():
    trained = {"dense": {"kernel": jnp.ones((2, 2))}}
    calibrated = {"dense": {"kernel": jnp.zeros((2, 2)),
                            "quant_input": {"scale": jnp.asarray(0.5)}}}
    merged = merge_trained_params_into_calibrated(trained, calibrated)
    np.testing.assert_allclose(merged["dense"]["kernel"], 1.0)
    assert float(merged["dense"]["quant_input"]["scale"]) == 0.5
