"""Whole-layer fused kernel (ops/pallas/fused_layer) vs a plain-jnp
replica of the engine layer body (quantize/engine.engine_layer_forward
semantics: norm -> mixer -> activation -> GLU -> residual -> requant).
The engine-level integration (bit-exactness of the fused stack against
the per-op path at f32) is pinned in test_engine.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.ops.pallas.fused_layer import (fused_layer_apply,
                                                   fused_layer_apply_carry,
                                                   requant_storage_dtype)
from sparsernns_tpu.ops.scan import sequential_diag_scan

B, L, H, P = 2, 32, 12, 8
HP = 128  # padded lanes
BLOCK_T = 16


def _operands(seed=0, glu="half1"):
    rng = np.random.RandomState(seed)
    lam = (jnp.asarray(0.8 + 0.1 * rng.rand(P), jnp.float32),
           jnp.asarray(0.3 * rng.randn(P), jnp.float32))
    w_b = jnp.asarray(rng.randn(H, 2 * P) * 0.3, jnp.float32)
    w_c = jnp.asarray(rng.randn(2 * P, H) * 0.3, jnp.float32)
    d = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    nw = jnp.asarray(1.0 + 0.1 * rng.randn(H), jnp.float32)
    nb = jnp.asarray(0.1 * rng.randn(H), jnp.float32)
    glu_ws = {}
    if glu in ("half1", "half2", "full"):
        glu_ws["out2_kernel"] = jnp.asarray(rng.randn(H, H) * 0.3,
                                            jnp.float32)
        glu_ws["out2_bias"] = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    if glu == "full":
        glu_ws["out1_kernel"] = jnp.asarray(rng.randn(H, H) * 0.3,
                                            jnp.float32)
        glu_ws["out1_bias"] = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    r = jnp.asarray(rng.randn(B, L, H) * 0.5, jnp.float32)
    return r, lam, w_b, w_c, d, nw, nb, glu_ws


def _pad_stream(r):
    return jnp.pad(r, ((0, 0), (0, 0), (0, HP - H)))


def _reference_layer(r, lam, w_b, w_c, d, nw, nb, glu_ws, *, prenorm,
                     relufication, glu, relu_state, out_requant,
                     carry=None):
    """The engine layer body in plain jnp (mirrors engine_layer_forward
    + the fused mixer), unpadded."""
    z = r * nw + nb if prenorm else r
    bu = z @ w_b
    bu_re, bu_im = bu[..., :P], bu[..., P:]
    xs, final = sequential_diag_scan(lam, (bu_re, bu_im), carry_init=carry)
    x_re, x_im = xs
    if relu_state:
        x_re, x_im = jnp.maximum(x_re, 0), jnp.maximum(x_im, 0)
    y = jnp.concatenate([x_re, x_im], -1) @ w_c + d * z
    x1 = jnp.maximum(y, 0) if relufication else jax.nn.gelu(y)
    if glu in ("half1", "half2", "full"):
        gate = jax.nn.sigmoid(
            x1 @ glu_ws["out2_kernel"] + glu_ws["out2_bias"])
        base = (x1 if glu == "half1" else y if glu == "half2"
                else x1 @ glu_ws["out1_kernel"] + glu_ws["out1_bias"])
        h = base * gate
    else:
        h = x1
    h = h + r
    if not prenorm:
        h = h * nw + nb
    if relufication:
        h = jnp.maximum(h, 0)
    if out_requant is not None:
        s, bits = out_requant
        qmax = 2.0 ** (bits - 1) - 1
        h = jnp.clip(jnp.round(h / s), -(qmax + 1), qmax) * s
    return h, final  # final scan state, pre-relu (what the kernel carries)


@pytest.mark.parametrize("glu", ["none", "half1", "half2", "full"])
@pytest.mark.parametrize("prenorm", [True, False])
def test_fused_layer_matches_reference(glu, prenorm):
    r, lam, w_b, w_c, d, nw, nb, glu_ws = _operands(glu=glu)
    out = fused_layer_apply(
        _pad_stream(r), lam, w_b, w_c, d, nw, nb, **glu_ws,
        block_t=BLOCK_T, prenorm=prenorm, relufication=True, glu=glu,
        relu_state=True, act_dtype=jnp.float32)
    ref, _ = _reference_layer(
        r, lam, w_b, w_c, d, nw, nb, glu_ws, prenorm=prenorm,
        relufication=True, glu=glu, relu_state=True, out_requant=None)
    got = np.asarray(out)[:, :, :H]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)
    # padded lanes stay exactly zero (the invariant that lets the stream
    # live padded across layers)
    assert np.abs(np.asarray(out)[:, :, H:]).max() == 0.0


def test_fused_layer_gelu_path():
    r, lam, w_b, w_c, d, nw, nb, glu_ws = _operands()
    out = fused_layer_apply(
        _pad_stream(r), lam, w_b, w_c, d, nw, nb, **glu_ws,
        block_t=BLOCK_T, prenorm=True, relufication=False, glu="half1",
        relu_state=False, act_dtype=jnp.float32)
    ref, _ = _reference_layer(
        r, lam, w_b, w_c, d, nw, nb, glu_ws, prenorm=True,
        relufication=False, glu="half1", relu_state=False,
        out_requant=None)
    np.testing.assert_allclose(np.asarray(out)[:, :, :H], np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_layer_requant_io_roundtrip():
    """int16-coded output -> next layer's int input reproduces the
    requant-grid values exactly."""
    r, lam, w_b, w_c, d, nw, nb, glu_ws = _operands()
    rq = (1 / 256.0, 16)
    out = fused_layer_apply(
        _pad_stream(r), lam, w_b, w_c, d, nw, nb, **glu_ws,
        block_t=BLOCK_T, prenorm=True, relufication=True, glu="half1",
        relu_state=True, out_requant=rq, act_dtype=jnp.float32)
    assert out.dtype == requant_storage_dtype(16) == jnp.int16
    ref, _ = _reference_layer(
        r, lam, w_b, w_c, d, nw, nb, glu_ws, prenorm=True,
        relufication=True, glu="half1", relu_state=True, out_requant=rq)
    got = np.asarray(out).astype(np.float32)[:, :, :H] * rq[0]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=0, atol=1e-6)

    # feed the codes back in as the next layer's input format
    out2 = fused_layer_apply(
        out, lam, w_b, w_c, d, nw, nb, **glu_ws,
        block_t=BLOCK_T, prenorm=True, relufication=True, glu="half1",
        relu_state=True, in_requant=rq, act_dtype=jnp.float32)
    ref2, _ = _reference_layer(
        jnp.asarray(got), lam, w_b, w_c, d, nw, nb, glu_ws, prenorm=True,
        relufication=True, glu="half1", relu_state=True, out_requant=None)
    np.testing.assert_allclose(np.asarray(out2)[:, :, :H],
                               np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_fused_layer_int8_storage():
    assert requant_storage_dtype(8) == jnp.int8
    r, lam, w_b, w_c, d, nw, nb, glu_ws = _operands()
    out = fused_layer_apply(
        _pad_stream(r), lam, w_b, w_c, d, nw, nb, **glu_ws,
        block_t=BLOCK_T, prenorm=True, relufication=True, glu="half1",
        relu_state=True, out_requant=(1 / 16.0, 8),
        act_dtype=jnp.float32)
    assert out.dtype == jnp.int8
    assert np.isfinite(np.asarray(out).astype(np.float32)).all()


def test_fused_layer_carry_chunks_match_whole():
    r, lam, w_b, w_c, d, nw, nb, glu_ws = _operands()
    whole = fused_layer_apply(
        _pad_stream(r), lam, w_b, w_c, d, nw, nb, **glu_ws,
        block_t=BLOCK_T, prenorm=True, relufication=True, glu="half1",
        relu_state=True, act_dtype=jnp.float32)
    carry = (jnp.zeros((B, P)), jnp.zeros((B, P)))
    outs = []
    for i in range(0, L, BLOCK_T):
        o, carry = fused_layer_apply_carry(
            _pad_stream(r[:, i:i + BLOCK_T]), carry, lam, w_b, w_c, d,
            nw, nb, **glu_ws, block_t=BLOCK_T, prenorm=True,
            relufication=True, glu="half1", relu_state=True,
            act_dtype=jnp.float32)
        outs.append(o)
    chunked = np.concatenate([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(chunked, np.asarray(whole),
                               rtol=1e-5, atol=1e-5)
    # final carry equals the reference scan's final state
    _, (cr, ci) = _reference_layer(
        r, lam, w_b, w_c, d, nw, nb, glu_ws, prenorm=True,
        relufication=True, glu="half1", relu_state=True,
        out_requant=None)
    np.testing.assert_allclose(np.asarray(carry[0]), np.asarray(cr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry[1]), np.asarray(ci),
                               rtol=1e-5, atol=1e-5)


def test_interleave_flag_matches_default():
    """fused_layer.INTERLEAVE (half-block MXU/VPU stagger) must serve
    the same engine outputs as the default whole-block scan — the
    per-block state requant snaps both reassociation trees onto the
    same grid, so the routes agree exactly on the quantized engine."""
    import bench
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sparsernns_tpu.ops.pallas.fused_layer import INTERLEAVE

    engine, _, _ = bench._build_engine(2, 96, 17)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 96, 17),
                    jnp.float32)
    base = engine._apply(engine.weights, x, block_t=32)
    INTERLEAVE[0] = True
    try:
        ilv = jax.jit(lambda w, xi: engine._apply(w, xi, block_t=32))(
            engine.weights, x)
    finally:
        INTERLEAVE[0] = False
    np.testing.assert_allclose(np.asarray(base), np.asarray(ilv),
                               rtol=2e-3, atol=2e-4)
