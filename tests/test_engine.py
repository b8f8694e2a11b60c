"""W8A16 serving engine vs the static-quant emulation (golden harness):
the fused-kernel quantized path must track the bit-faithful sequential
path within the quantization error budget (SURVEY.md §7 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsernns_tpu.fxp.derive import FxpModelConfig
from sparsernns_tpu.quantize.config import quantization_recipes
from sparsernns_tpu.quantize.engine import W8A16Engine
from tests.test_static_quant import _model, pipeline  # noqa: F401


def test_engine_matches_static_quant(pipeline):  # noqa: F811
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    inf_model = _model(inf_cfg)
    y_q = np.asarray(inf_model.apply(
        {"params": frozen_params, "batch_stats": frozen_stats}, x))

    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         block_t=32)
    y_e = np.asarray(engine(x))

    assert y_e.shape == y_q.shape
    denom = max(np.abs(y_q).max(), 1.0)
    rel = np.abs(y_e - y_q).max() / denom
    assert rel < 0.35, rel
    corr = np.corrcoef(y_e.ravel(), np.asarray(y_fp).ravel())[0, 1]
    assert corr > 0.95, corr


def test_engine_fp32_act_dtype(pipeline):  # noqa: F811
    """fp32 activations should track the static-quant emulation tighter
    than bf16 ones do."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    e32 = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                      act_dtype=jnp.float32, block_t=32)
    e16 = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                      act_dtype=jnp.bfloat16, block_t=32)
    y32 = np.asarray(e32(x))
    y16 = np.asarray(e16(x))
    # both finite and close to each other at 16-bit precision
    assert np.isfinite(y32).all() and np.isfinite(y16).all()
    assert np.abs(y32 - y16).max() < 0.1 * max(np.abs(y32).max(), 1.0)


def test_sequence_parallel_engine(pipeline):  # noqa: F811
    """Engine forward sharded over 8 time-chunks == single-device engine."""
    from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
    from sparsernns_tpu.parallel.sp_engine import make_sp_forward

    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32)
    y_single = np.asarray(engine(x))

    mesh = make_mesh(MeshConfig(data=1, model=1, seq=8))
    sp_forward = make_sp_forward(engine, mesh)
    y_sp = np.asarray(sp_forward(x))  # L=24 divisible by 8

    assert y_sp.shape == y_single.shape
    # sp path has no in-kernel state requant; allow the requant budget
    denom = max(np.abs(y_single).max(), 1.0)
    assert np.abs(y_sp - y_single).max() / denom < 0.1


def test_tensor_parallel_engine(pipeline):  # noqa: F811
    """Engine forward with the state dim P sharded over 8 devices ==
    single-device engine (row/column-parallel projections + psum)."""
    from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
    from sparsernns_tpu.parallel.sp_engine import make_tp_forward

    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32)
    y_single = np.asarray(engine(x))

    mesh = make_mesh(MeshConfig(data=1, model=8, seq=1))
    tp_forward = make_tp_forward(engine, mesh)
    y_tp = np.asarray(tp_forward(x))  # P=8 -> 1 state channel per device

    assert y_tp.shape == y_single.shape
    denom = max(np.abs(y_single).max(), 1.0)
    assert np.abs(y_tp - y_single).max() / denom < 0.1


def test_engine_topk_applied(pipeline):  # noqa: F811
    """topk<1 models: the engine sparsifies activations like the flax
    model does (review regression: it used to silently drop top-k)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True, topk=0.5, approx_topk=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32)
    y = np.asarray(engine(x))
    assert np.isfinite(y).all()
    # fxp engine honestly refuses topk
    from sparsernns_tpu.fxp.derive import build_fxp_model
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        build_fxp_model(frozen_params, frozen_stats, inf_cfg,
                        model_cfg=model_cfg)


def test_engine_chunked_streaming_matches_whole(pipeline):  # noqa: F811
    """process_chunk with carry flow == one whole-sequence engine call
    (the streaming serving path at fused-kernel speed)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=8)
    y_whole = np.asarray(engine(x))  # L = 24

    c = None
    chunks = []
    for start in (0, 8, 16):
        y_c, c = engine.process_chunk(x[:, start:start + 8], c)
        chunks.append(np.asarray(y_c))
    y_chunked = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(y_chunked, y_whole, atol=2e-3)

    # chunk size not divisible by the block raises a clear error
    from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply_carry
    lam = (jnp.ones(4) * 0.5, jnp.zeros(4))
    with pytest.raises(ValueError, match="divisible"):
        fused_s5_apply_carry(jnp.zeros((1, 12, 8)), lam,
                             jnp.zeros((8, 8)), jnp.zeros((8, 8)),
                             jnp.zeros(8), (jnp.zeros((1, 4)),
                                            jnp.zeros((1, 4))),
                             block_t=8)
