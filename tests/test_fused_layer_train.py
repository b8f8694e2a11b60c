"""Whole-layer TRAINING kernel (fused_layer_train.py): forward and grad
parity vs the composed (unfused) layer math, and engagement from
SequenceLayer's fast path."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.pallas.fused_layer_train import (
    fused_layer_tail, fused_layer_tail_diff)
from sparsernns_tpu.ops.scan import associative_diag_scan


def composed_tail(z, skip, lam, w_b, w_c, d, o2k=None, o2b=None,
                  o1k=None, o1b=None, m1=None, m2=None, *, act="gelu",
                  glu="none", relu_state=False, layer_relu=False):
    """Plain-jnp reference of the layer tail (models/layers.py order)."""
    p = w_b.shape[-1] // 2
    bu = z @ w_b
    xs = associative_diag_scan(lam, (bu[..., :p], bu[..., p:]))
    if relu_state:
        xs = (jax.nn.relu(xs[0]), jax.nn.relu(xs[1]))
    y = jnp.concatenate(xs, axis=-1) @ w_c + d * z
    x1 = jax.nn.relu(y) if act == "relu" else jax.nn.gelu(y)
    if m1 is not None:
        x1 = x1 * m1
    if glu != "none":
        gate = jax.nn.sigmoid(x1 @ o2k + o2b)
        base = {"half1": x1, "half2": y}.get(glu)
        if base is None:  # full
            base = x1 @ o1k + o1b
        h = base * gate
        if m2 is not None:
            h = h * m2
    else:
        h = x1
    out = h + skip
    return jax.nn.relu(out) if layer_relu else out


def _operands(rng, b=2, l=40, h=8, p=8, masks=False, glu="half1"):
    lam_c = 0.85 * np.exp(1j * rng.uniform(0, np.pi, p))
    kw = dict(
        z=jnp.asarray(rng.randn(b, l, h), jnp.float32),
        skip=jnp.asarray(rng.randn(b, l, h), jnp.float32),
        lam=(jnp.asarray(lam_c.real, jnp.float32),
             jnp.asarray(lam_c.imag, jnp.float32)),
        w_b=jnp.asarray(rng.randn(h, 2 * p) * 0.3, jnp.float32),
        w_c=jnp.asarray(rng.randn(2 * p, h) * 0.3, jnp.float32),
        d=jnp.asarray(rng.randn(h) * 0.3, jnp.float32),
    )
    if glu != "none":
        kw["o2k"] = jnp.asarray(rng.randn(h, h) * 0.3, jnp.float32)
        kw["o2b"] = jnp.asarray(rng.randn(h) * 0.3, jnp.float32)
    if glu == "full":
        kw["o1k"] = jnp.asarray(rng.randn(h, h) * 0.3, jnp.float32)
        kw["o1b"] = jnp.asarray(rng.randn(h) * 0.3, jnp.float32)
    if masks:
        kw["m1"] = jnp.asarray(
            rng.binomial(1, 0.8, (b, 1, h)) / 0.8, jnp.float32)
        if glu != "none":
            kw["m2"] = jnp.asarray(
                rng.binomial(1, 0.8, (b, 1, h)) / 0.8, jnp.float32)
    return kw


@pytest.mark.parametrize("glu", ["none", "half1", "half2", "full"])
@pytest.mark.parametrize("act,relu_state,layer_relu",
                         [("gelu", False, False), ("relu", True, True)])
def test_tail_matches_composed(rng, glu, act, relu_state, layer_relu):
    kw = _operands(rng, glu=glu, masks=True)
    flags = dict(act=act, glu=glu, relu_state=relu_state,
                 layer_relu=layer_relu)
    y_ref = composed_tail(**kw, **flags)
    y = fused_layer_tail(**kw, block_t=16, **flags)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-3)


@pytest.mark.parametrize("glu", ["none", "half1", "half2", "full"])
def test_tail_grads_match_composed(rng, glu):
    kw = _operands(rng, glu=glu, masks=(glu == "half1"))
    names = list(kw)
    flags = dict(act="relu", glu=glu, relu_state=True, layer_relu=True)

    def loss_fused(*args):
        d = dict(zip(names, args))
        y = fused_layer_tail_diff(
            d["z"], d["skip"], d["lam"], d["w_b"], d["w_c"], d["d"],
            d.get("o2k"), d.get("o2b"), d.get("o1k"), d.get("o1b"),
            d.get("m1"), d.get("m2"), None, None, 16, flags["act"],
            flags["glu"], flags["relu_state"], flags["layer_relu"])
        return jnp.sum(y ** 2)

    def loss_ref(*args):
        return jnp.sum(composed_tail(**dict(zip(names, args)), **flags) ** 2)

    argnums = tuple(range(len(names)))
    gf = jax.grad(loss_fused, argnums=argnums)(*kw.values())
    gr = jax.grad(loss_ref, argnums=argnums)(*kw.values())
    for name, a, b in zip(names, gf, gr):
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), rtol=2e-2,
                atol=2e-2, err_msg=f"grad mismatch for {name}")


def test_tail_affine_mode_matches_composed(rng):
    """Affine (BatchNorm-folded) mode: the kernel reads the raw stream
    once and applies z = x*nw + nb in VMEM — must equal the two-stream
    form with the affine applied outside, for values AND grads."""
    kw = _operands(rng, glu="half1", masks=False)
    h = kw["z"].shape[-1]
    nw = jnp.asarray(rng.rand(h) + 0.5, jnp.float32)
    nb = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    x = kw.pop("z")
    kw.pop("skip")
    flags = dict(act="relu", glu="half1", relu_state=True, layer_relu=True)

    def loss_aff(x, nw, nb, w_b, w_c, d, o2k, o2b):
        y = fused_layer_tail_diff(
            x, None, kw["lam"], w_b, w_c, d, o2k, o2b, None, None,
            None, None, nw, nb, 16, flags["act"], flags["glu"],
            flags["relu_state"], flags["layer_relu"])
        return jnp.sum(y ** 2)

    def loss_ref(x, nw, nb, w_b, w_c, d, o2k, o2b):
        y = composed_tail(x * nw + nb, x, kw["lam"], w_b, w_c, d,
                          o2k, o2b, **flags)
        return jnp.sum(y ** 2)

    args = (x, nw, nb, kw["w_b"], kw["w_c"], kw["d"], kw["o2k"], kw["o2b"])
    np.testing.assert_allclose(float(loss_aff(*args)),
                               float(loss_ref(*args)), rtol=1e-4)
    ga = jax.grad(loss_aff, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for i, (a, b) in enumerate(zip(ga, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"grad mismatch for arg {i}")


def _layer_model(scan_mode, training=False, dropout=0.0, glu="half1",
                 relufication=True):
    from tests.test_models import make_mixer, small_init
    from sparsernns_tpu.models.seq_model import RegressionModel
    return RegressionModel(
        mixer_cls=make_mixer(8, small_init(), scan_mode=scan_mode,
                             relufication=relufication),
        n_layers=2, d_model=8, d_output=17, dropout=dropout, prenorm=True,
        batchnorm=True, glu_variant=glu, training=training,
        relufication=relufication)


def test_layer_fast_path_engages_and_matches(rng):
    """scan_mode='fused' routes the whole layer through the training
    kernel (asserted via call counting) and matches scan_mode='pallas'
    (same math, unfused) on the same variables."""
    import sparsernns_tpu.ops.pallas.fused_layer_train as flt

    x = jnp.asarray(rng.randn(2, 24, 17), jnp.float32)
    m_fused = _layer_model("fused")
    variables = m_fused.init(jax.random.PRNGKey(0), x)
    calls = []
    orig = flt.fused_layer_tail_diff
    with mock.patch.object(
            flt, "fused_layer_tail_diff",
            side_effect=lambda *a, **k: calls.append(1) or orig(*a, **k)):
        y_fused = m_fused.apply(variables, x)
    assert len(calls) == 2  # both layers took the fused tail
    y_ref = _layer_model("pallas").apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=5e-3)


@pytest.mark.slow
def test_layer_fast_path_grads_match(rng):
    x = jnp.asarray(rng.randn(2, 24, 17), jnp.float32)
    m_fused = _layer_model("fused", training=True)
    m_ref = _layer_model("pallas", training=True)
    variables = m_fused.init(jax.random.PRNGKey(0), x)

    def loss(model):
        def f(params):
            y, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        return jax.grad(f)(variables["params"])

    gf = loss(m_fused)
    gr = loss(m_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a), (_, b) in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_layer_fast_path_dropout_structure(rng):
    """Training dropout in the fused tail: channels are dropped whole
    (broadcast along time, nn.Dropout broadcast_dims=(1,) semantics) and
    the masks differ across layers/streams."""
    x = jnp.asarray(rng.randn(2, 24, 17), jnp.float32)
    m = _layer_model("fused", training=True, dropout=0.5, glu="none")
    variables = m.init(jax.random.PRNGKey(0), x)
    def run(seed):
        y, _ = m.apply(variables, x, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(seed)})
        return y

    y1, y2, y3 = run(1), run(1), run(2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.abs(np.asarray(y1) - np.asarray(y3)).max() > 0


def test_layer_fallbacks_preserved(rng):
    """Configs the kernel can't express still run (unfused path): top-k,
    postnorm, QAT quantization, intermediates capture."""
    import sparsernns_tpu.ops.pallas.fused_layer_train as flt
    from tests.test_models import make_mixer, small_init
    from sparsernns_tpu.models.seq_model import RegressionModel
    from sparsernns_tpu.quantize.config import quantization_recipes

    x = jnp.asarray(rng.randn(1, 16, 17), jnp.float32)
    with mock.patch.object(
            flt, "fused_layer_tail_diff",
            side_effect=AssertionError("fast path must not engage")):
        # QAT quantization
        m = RegressionModel(
            mixer_cls=make_mixer(8, small_init(), scan_mode="fused",
                                 q_config=quantization_recipes["w8a16"]()),
            n_layers=1, d_model=8, d_output=17, prenorm=True,
            training=False, q_config=quantization_recipes["w8a16"]())
        v = m.init(jax.random.PRNGKey(0), x)
        m.apply(v, x)
        # postnorm
        m2 = _layer_model("fused").clone(prenorm=False)
        v2 = m2.init(jax.random.PRNGKey(0), x)
        m2.apply(v2, x)
        # intermediates capture
        m3 = _layer_model("fused")
        v3 = m3.init(jax.random.PRNGKey(0), x)
        m3.apply(v3, x, mutable=["intermediates"])


@pytest.mark.slow
def test_train_step_through_fused_tail(rng):
    """A full NDNS train step with the whole-layer kernel engaged."""
    import sparsernns_tpu.ops.pallas.fused_layer_train as flt
    from tests.test_train import make_state
    from sparsernns_tpu.train.steps import make_ndns_train_step

    model = _layer_model("fused", training=True, dropout=0.1)
    x = jnp.asarray(rng.randn(2, 16, 17), jnp.float32)
    calls = []
    orig = flt.fused_layer_tail_diff
    with mock.patch.object(
            flt, "fused_layer_tail_diff",
            side_effect=lambda *a, **k: calls.append(1) or orig(*a, **k)):
        state = make_state(model, x)
        noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
        clean = jnp.asarray(rng.randn(2, 15 * 128), jnp.float32)
        step = make_ndns_train_step(model, batchnorm=True)
        losses = []
        for i in range(8):
            state, m = step(state, jax.random.PRNGKey(0), noisy_mag,
                            jnp.zeros_like(noisy_mag), noisy_mag * 0.9,
                            clean)
            losses.append(float(m["loss"]))
    assert calls  # kernel path engaged inside the jitted step trace
    assert np.isfinite(losses).all()
    # trend over several steps (single-step deltas are dropout-noisy)
    assert np.mean(losses[-2:]) < losses[0]


@pytest.mark.parametrize("glu", ["none", "half1", "half2", "full"])
def test_kernel_bwd_matches_xla_remat_bwd(rng, glu, monkeypatch):
    """The adjoint KERNEL (fused_layer_bwd.py) vs the XLA remat backward
    it replaces: same gradients to float tolerance (the only differences
    are per-block vs whole-sequence summation order)."""
    kw = _operands(rng, l=37, glu=glu, masks=True)
    names = list(kw)
    flags = dict(act="gelu", glu=glu, relu_state=True, layer_relu=True)

    def loss(*args):
        d = dict(zip(names, args))
        y = fused_layer_tail_diff(
            d["z"], d["skip"], d["lam"], d["w_b"], d["w_c"], d["d"],
            d.get("o2k"), d.get("o2b"), d.get("o1k"), d.get("o1b"),
            d.get("m1"), d.get("m2"), None, None, 16, flags["act"],
            flags["glu"], flags["relu_state"], flags["layer_relu"])
        return jnp.sum(jnp.sin(y))

    argnums = tuple(range(len(names)))
    gk = jax.grad(loss, argnums=argnums)(*kw.values())
    monkeypatch.setenv("SPARSERNNS_XLA_TAIL_BWD", "1")
    gx = jax.grad(loss, argnums=argnums)(*kw.values())
    for name, a, b in zip(names, gk, gx):
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), rtol=2e-4,
                atol=2e-4, err_msg=f"kernel-vs-XLA grad mismatch: {name}")


def test_kernel_bwd_affine_matches_xla(rng, monkeypatch):
    kw = _operands(rng, l=40, glu="half1", masks=False)
    h = kw["z"].shape[-1]
    nw = jnp.asarray(rng.randn(h) * 0.3 + 1.0, jnp.float32)
    nb = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    names = [n for n in kw if n != "skip"] + ["nw", "nb"]
    vals = {**{n: kw[n] for n in kw if n != "skip"}, "nw": nw, "nb": nb}

    def loss(*args):
        d = dict(zip(names, args))
        y = fused_layer_tail_diff(
            d["z"], None, d["lam"], d["w_b"], d["w_c"], d["d"],
            d.get("o2k"), d.get("o2b"), None, None, None, None,
            d["nw"], d["nb"], 16, "relu", "half1", True, True)
        return jnp.sum(jnp.sin(y))

    argnums = tuple(range(len(names)))
    gk = jax.grad(loss, argnums=argnums)(*vals.values())
    monkeypatch.setenv("SPARSERNNS_XLA_TAIL_BWD", "1")
    gx = jax.grad(loss, argnums=argnums)(*vals.values())
    for name, a, b in zip(names, gk, gx):
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), rtol=2e-4,
                atol=2e-4, err_msg=f"affine grad mismatch: {name}")


@pytest.mark.slow
def test_padded_stream_stack_matches_unfused(rng):
    """The stack's padded-stream path (one pad, layers on the padded
    stream, one slice) must match the unfused pallas path exactly-ish:
    values, gradients AND the BatchNorm running statistics (updated
    manually from masked sums in padded mode) — at an odd L that forces
    nonempty pad rows through the in-kernel re-zeroing."""
    import sparsernns_tpu.ops.pallas.fused_layer_train as flt

    x = jnp.asarray(rng.randn(2, 37, 17), jnp.float32)
    m_fused = _layer_model("fused", training=True)
    m_ref = _layer_model("pallas", training=True)
    variables = m_fused.init(jax.random.PRNGKey(0), x)

    # engagement: the tail kernel must run in pre_padded mode
    padded_calls = []
    orig = flt.fused_layer_tail_diff
    with mock.patch.object(
            flt, "fused_layer_tail_diff",
            side_effect=lambda *a, **k: padded_calls.append(
                a[19] if len(a) > 19 else k.get("pre_padded"))
            or orig(*a, **k)):
        y_fused, upd_f = m_fused.apply(
            variables, x, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)})
    assert padded_calls == [True, True], padded_calls

    y_ref, upd_r = m_ref.apply(variables, x, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=5e-3)
    # running stats: the padded path updates them by hand (put_variable)
    for a, b in zip(jax.tree_util.tree_leaves(upd_f),
                    jax.tree_util.tree_leaves(upd_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def loss(fn, params):
        y, _ = fn.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        x, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(lambda p: loss(m_fused, p))(variables["params"])
    gr = jax.grad(lambda p: loss(m_ref, p))(variables["params"])
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}")


@pytest.mark.slow
def test_bf16_stream_training_matches_f32(rng, monkeypatch):
    """Opt-in bf16 residual stream (stream_dtype="bfloat16" on the
    padded-stream fast path): losses/gradients track the f32 stream
    within bf16 rounding, on BOTH the adjoint-kernel and XLA-remat
    backward paths; BN statistics stay f32-accumulated."""
    import dataclasses

    from sparsernns_tpu.train.loop import build_model
    from sparsernns_tpu.train.optim import create_optimizer
    from sparsernns_tpu.train.state import TrainState
    from sparsernns_tpu.train.steps import make_ndns_train_step
    from sparsernns_tpu.utils.config import RunConfig

    B, L, F = 2, 200, 33
    nm = jnp.asarray(np.abs(rng.randn(B, F, L)), jnp.float32)
    cl = jnp.asarray(rng.randn(B, (L - 1) * 128), jnp.float32)

    def run(sd):
        cfg = RunConfig(dataset="ndns", n_layers=2, d_model=16,
                        ssm_size_base=16, blocks=2, scan_mode="fused",
                        block_t=64, p_dropout=0.05, glu_variant="half1",
                        prenorm=True, batchnorm=True, relufication=True,
                        train_stream_dtype=sd)
        model = build_model(cfg, F, F, training=True)
        x = jnp.zeros((B, 16, F), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        tx = create_optimizer("noBCdecay", lr=1e-3, ssm_lr=1e-3,
                              total_steps=10, warmup_steps=1)
        state = TrainState.create(apply_fn=model.apply,
                                  params=variables["params"], tx=tx,
                                  batch_stats=variables.get("batch_stats"))
        step = make_ndns_train_step(model, batchnorm=True)
        losses = []
        for i in range(3):
            state, m = step(state, jax.random.PRNGKey(i), nm,
                            jnp.zeros_like(nm), nm * 0.9, cl)
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    l32 = run("float32")
    l16 = run("bfloat16")
    assert np.all(np.isfinite(l16))
    np.testing.assert_allclose(l16, l32, rtol=2e-3)
    # the stream dtype must not change the training trend
    assert l16[-1] < l16[0]

    # XLA-remat backward path at bf16 (cotangent dtypes must match the
    # bf16 primal streams there too)
    monkeypatch.setenv("SPARSERNNS_XLA_TAIL_BWD", "1")
    l16_xla = run("bfloat16")
    np.testing.assert_allclose(l16_xla, l16, rtol=2e-3)
