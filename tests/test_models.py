"""Model-level tests: shapes, init parity, BN fusion, discretization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.models.ssm import (S5SSM, discretize_bilinear,
                                       discretize_zoh, make_ssm_init_fn)
from sparsernns_tpu.models.ssm_init import blocked_dplr_init, make_dplr_hippo
from sparsernns_tpu.models.seq_model import (ClassificationModel,
                                             RegressionModel, RetrievalModel,
                                             masked_meanpool)
from sparsernns_tpu.quantize.config import QuantizationConfig


def small_init(ssm_size=16, blocks=2, conj_sym=True):
    return blocked_dplr_init(ssm_size, blocks, conj_sym)


def make_mixer(h=8, init=None, **kw):
    init = init or small_init()
    return make_ssm_init_fn(
        h=h, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
        vinv=init["Vinv"], **kw)


def test_dplr_hippo_eigendecomposition():
    n = 8
    lam, p, b, v, b_orig = make_dplr_hippo(n)
    # V diagonalizes the normal part: V Λ V* ≈ S
    s = np.zeros((n, n))
    hip = -(np.tril(np.sqrt(1 + 2 * np.arange(n))[:, None]
                    * np.sqrt(1 + 2 * np.arange(n))[None, :])
            - np.diag(np.arange(n)))
    pp = np.sqrt(np.arange(n) + 0.5)
    s = hip + pp[:, None] * pp[None, :]
    recon = v @ np.diag(lam) @ v.conj().T
    np.testing.assert_allclose(recon.real, s, atol=1e-4)


def test_blocked_init_shapes():
    init = blocked_dplr_init(16, 2, conj_sym=True)
    assert init["P"] == 8
    assert init["Lambda"].shape == (8,)
    assert init["V"].shape == (16, 8)
    assert init["Vinv"].shape == (8, 16)


def test_discretize_zoh_matches_complex():
    rng = np.random.RandomState(0)
    p, h = 6, 4
    lam = -np.abs(rng.randn(p)) + 1j * rng.randn(p)
    b = rng.randn(p, h) + 1j * rng.randn(p, h)
    delta = np.abs(rng.rand(p)) * 0.1
    lam_bar = np.exp(lam * delta)
    b_bar = ((lam_bar - 1.0) / lam)[:, None] * b
    got_lam, got_b = discretize_zoh(
        (jnp.asarray(lam.real, jnp.float32), jnp.asarray(lam.imag, jnp.float32)),
        (jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32)),
        jnp.asarray(delta, jnp.float32))
    np.testing.assert_allclose(got_lam[0], lam_bar.real, atol=1e-5)
    np.testing.assert_allclose(got_lam[1], lam_bar.imag, atol=1e-5)
    np.testing.assert_allclose(got_b[0], b_bar.real, atol=1e-4)
    np.testing.assert_allclose(got_b[1], b_bar.imag, atol=1e-4)


def test_discretize_bilinear_matches_complex():
    rng = np.random.RandomState(1)
    p, h = 5, 3
    lam = -np.abs(rng.randn(p)) + 1j * rng.randn(p)
    b = rng.randn(p, h) + 1j * rng.randn(p, h)
    delta = np.abs(rng.rand(p)) * 0.1
    bl = 1.0 / (1.0 - delta / 2.0 * lam)
    lam_bar = bl * (1.0 + delta / 2.0 * lam)
    b_bar = (bl * delta)[:, None] * b
    got_lam, got_b = discretize_bilinear(
        (jnp.asarray(lam.real, jnp.float32), jnp.asarray(lam.imag, jnp.float32)),
        (jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32)),
        jnp.asarray(delta, jnp.float32))
    np.testing.assert_allclose(got_lam[0], lam_bar.real, atol=1e-5)
    np.testing.assert_allclose(got_lam[1], lam_bar.imag, atol=1e-5)
    np.testing.assert_allclose(got_b[0], b_bar.real, atol=1e-4)


def test_ssm_forward_shapes_and_param_shapes():
    init = small_init()
    h, p = 8, init["P"]
    model = make_mixer(h, init)()
    x = jnp.ones((2, 12, h))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert params["Lambda_re"].shape == (p,)
    assert params["B"].shape == (p, h, 2)
    assert params["C"].shape == (h, p, 2)
    assert params["D"].shape == (h,)
    assert params["log_step"].shape == (p, 1)
    ys, xs = model.apply(variables, x)
    assert ys.shape == (2, 12, h)
    assert xs[0].shape == (2, 12, p)


def test_ssm_scan_modes_agree():
    init = small_init()
    h = 8
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, h), jnp.float32)
    m_assoc = make_mixer(h, init, scan_mode="associative")()
    variables = m_assoc.init(jax.random.PRNGKey(0), x)
    ys_a, _ = m_assoc.apply(variables, x)
    m_seq = make_mixer(h, init, scan_mode="sequential")()
    ys_s, _ = m_seq.apply(variables, x)
    np.testing.assert_allclose(ys_a, ys_s, atol=1e-4)
    # blocked (pure-XLA matmul scan, the conformance-fallback backend)
    m_blk = make_mixer(h, init, scan_mode="blocked")()
    ys_b, _ = m_blk.apply(variables, x)
    np.testing.assert_allclose(ys_a, ys_b, atol=1e-4)


def test_ssm_blocked_bidirectional_matches_associative():
    init = small_init()
    h = 8
    x = jnp.asarray(np.random.RandomState(1).randn(2, 20, h), jnp.float32)
    m_a = make_mixer(h, init, bidirectional=True,
                     scan_mode="associative")()
    variables = m_a.init(jax.random.PRNGKey(0), x)
    ys_a, _ = m_a.apply(variables, x)
    m_b = make_mixer(h, init, bidirectional=True, scan_mode="blocked")()
    ys_b, _ = m_b.apply(variables, x)
    np.testing.assert_allclose(ys_a, ys_b, atol=1e-4)


def test_ssm_bidirectional():
    init = small_init()
    h = 8
    model = make_mixer(h, init, bidirectional=True)()
    x = jnp.ones((2, 12, h))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["C1"].shape == (h, init["P"], 2)
    ys, xs = model.apply(variables, x)
    assert ys.shape == (2, 12, h)
    assert xs[0].shape == (2, 12, 2 * init["P"])


def test_bn_fusion_matches_explicit_bn():
    """Fused BN-into-B̄/D == explicit BatchNorm -> mixer (eval mode).
    Gate from SURVEY.md §7 'hard parts'."""
    init = small_init()
    h = 8
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, h), jnp.float32)

    model = make_mixer(h, init)()
    variables = model.init(jax.random.PRNGKey(0), x)

    mean = jnp.asarray(rng.randn(h), jnp.float32) * 0.1
    var = jnp.asarray(np.abs(rng.randn(h)) + 0.5, jnp.float32)
    scale = jnp.asarray(rng.randn(h), jnp.float32)
    bias = jnp.asarray(rng.randn(h), jnp.float32)
    eps = 1e-5

    x_norm = (x - mean) / jnp.sqrt(var + eps) * scale + bias
    ys_explicit, _ = model.apply(variables, x_norm)
    ys_fused, _ = model.apply(
        variables, x,
        bn_fusion=dict(mean=mean, var=var, eps=eps, scale=scale, bias=bias))
    np.testing.assert_allclose(ys_fused, ys_explicit, atol=1e-3)


@pytest.mark.parametrize("glu", ["full", "half1", "half2", "none"])
def test_regression_model_forward(glu):
    init = small_init()
    h, d_in = 8, 5
    model = RegressionModel(
        mixer_cls=make_mixer(h, init), n_layers=2, d_model=h,
        d_output=d_in, dropout=0.0, prenorm=True, batchnorm=True,
        glu_variant=glu, training=False)
    x = jnp.ones((2, 12, d_in))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 12, d_in)


def test_classification_model_forward():
    init = small_init()
    h, d_in, n_cls = 8, 5, 7
    model = ClassificationModel(
        mixer_cls=make_mixer(h, init), n_layers=1, d_model=h,
        d_output=n_cls, dropout=0.0, training=False, mode="pool")
    x = jnp.ones((3, 12, d_in))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (3, n_cls)
    np.testing.assert_allclose(np.exp(y).sum(-1), 1.0, atol=1e-4)


def test_retrieval_model_forward():
    init = small_init()
    h, d_in, n_cls = 8, 5, 2
    model = RetrievalModel(
        mixer_cls=make_mixer(h, init), n_layers=1, d_model=h,
        d_output=n_cls, dropout=0.0, training=False)
    x = jnp.ones((6, 12, d_in))  # 2*B documents
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (3, n_cls)


def test_masked_meanpool():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
    lengths = jnp.asarray([2.0, 4.0])
    out = masked_meanpool(x, lengths)
    np.testing.assert_allclose(out[0], x[0, :2].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[1], x[1].mean(0), atol=1e-6)


def test_relufication_and_topk():
    init = small_init()
    h = 8
    model = RegressionModel(
        mixer_cls=make_mixer(h, init, relufication=True), n_layers=1,
        d_model=h, d_output=5, dropout=0.0, training=False,
        relufication=True, topk=0.5, approx_topk=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 12, 5)


def test_training_mode_with_dropout_and_bn():
    init = small_init()
    h = 8
    model = RegressionModel(
        mixer_cls=make_mixer(h, init), n_layers=2, d_model=h,
        d_output=5, dropout=0.3, training=True, prenorm=True,
        batchnorm=True, glu_variant="half1")
    x = jnp.ones((2, 12, 5))
    variables = model.init(jax.random.PRNGKey(0), x)
    y, mutated = model.apply(
        variables, x, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert y.shape == (2, 12, 5)
    assert "batch_stats" in mutated


def test_device_programs_are_complex_free():
    """Round-4 root-cause regression pin (PERF.md): complex64 anywhere
    on the device path — an eager transfer at model construction or a
    complex op inside model.init/apply — is refused (transfer) or
    wedges (execution) on conformance-limited TPU transports, and is
    never MXU-native. The contract: eigendecomposition products stay
    host numpy; init projects through real-pair matmuls; every traced
    program is complex-free."""
    # 1. construction performs NO device transfers at all (the old code
    #    device_put complex64 V/Vinv here; jax.transfer_guard only
    #    guards implicit transfers, which is exactly the class the old
    #    jnp.asarray(numpy) calls were)
    with jax.transfer_guard("disallow"):
        init = blocked_dplr_init(16, 2, conj_sym=True)
        mixer = make_ssm_init_fn(
            h=8, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
            vinv=init["Vinv"], clip_eigs=True)
        model = RegressionModel(
            mixer_cls=mixer, n_layers=2, d_model=8, d_output=33,
            dropout=0.0, prenorm=True, batchnorm=True,
            glu_variant="half1", training=False)
    assert isinstance(init["V"], np.ndarray)  # host, not device

    # 2. neither the init program nor the apply program contains any
    #    complex-dtype value
    x = jnp.zeros((1, 16, 33), jnp.float32)

    def _assert_complex_free(jpr, label):
        def walk(jaxpr):
            for eqn in jaxpr.eqns:
                for v_ in list(eqn.invars) + list(eqn.outvars):
                    aval = getattr(v_, "aval", None)
                    if aval is not None and jnp.issubdtype(
                            aval.dtype, jnp.complexfloating):
                        raise AssertionError(
                            f"{label}: complex {aval} in "
                            f"{eqn.primitive.name}")
                for pval in eqn.params.values():
                    for sub in (pval if isinstance(pval, (tuple, list))
                                else [pval]):
                        inner = getattr(sub, "jaxpr", None)
                        if inner is not None and hasattr(inner, "eqns"):
                            walk(inner)
                        elif hasattr(sub, "eqns"):
                            walk(sub)
        walk(jpr.jaxpr)

    jpr_init = jax.make_jaxpr(model.init)(jax.random.PRNGKey(0), x)
    _assert_complex_free(jpr_init, "model.init")
    variables = model.init(jax.random.PRNGKey(0), x)
    jpr_apply = jax.make_jaxpr(model.apply)(variables, x)
    _assert_complex_free(jpr_apply, "model.apply")
