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
    # tight budget (VERDICT round-1 weak #2: the old 35% would pass a
    # broken quantizer; measured max-rel is ~6.5%, dominated by the
    # block-vs-per-step requant realization difference)
    assert rel < 0.10, rel
    mean_rel = np.abs(y_e - y_q).mean() / denom
    assert mean_rel < 0.005, mean_rel
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


def test_data_parallel_engine(pipeline):  # noqa: F811
    """DP engine forward (batch sharded over the data axis, shard_map
    around the full single-chip route incl. the whole-network kernel):
    bit-identical to the single-chip engine and ZERO collectives — the
    batch grid axis is independent, so DP serving is pure fan-out."""
    import pytest as _pytest
    from sparsernns_tpu.parallel.comms import collective_bytes_from_hlo
    from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
    from sparsernns_tpu.parallel.sp_engine import make_dp_forward

    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    x8 = jnp.concatenate([x + 0.01 * i for i in range(4)], axis=0)  # B=8
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32)
    assert engine._network_ok  # DP wraps the best route
    y_single = np.asarray(engine(x8))

    mesh = make_mesh(MeshConfig(data=8, model=1, seq=1))
    dp_forward = make_dp_forward(engine, mesh)
    y_dp = np.asarray(dp_forward(x8))
    assert y_dp.shape == y_single.shape
    assert np.abs(y_dp - y_single).max() == 0.0

    # structural: the compiled DP forward moves zero collective bytes
    import jax as _jax
    hlo = _jax.jit(
        _jax.shard_map(
            lambda w, xi: engine._apply(w, xi, block_t=engine.block_t),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(),
                      jax.sharding.PartitionSpec("data")),
            out_specs=jax.sharding.PartitionSpec("data"),
            check_vma=False),
    ).lower(engine.weights, x8).compile().as_text()
    acct = collective_bytes_from_hlo(hlo)
    assert acct["total_bytes"] == 0, acct

    with _pytest.raises(ValueError, match="not divisible"):
        dp_forward(x8[:6])


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
    # the fxp integer engine supports approx top-k too (round-2; see
    # tests/test_fxp_golden.py::test_fxp_topk_tracks_static_quant for the
    # accuracy gate) — only EXACT top-k still raises, like the flax model
    from sparsernns_tpu.fxp.derive import build_fxp_model
    fxp_model = build_fxp_model(frozen_params, frozen_stats, inf_cfg,
                                model_cfg=model_cfg)
    y_f = np.asarray(fxp_model(x).to_float())
    assert np.isfinite(y_f).all()
    denom = max(np.abs(y).max(), 1e-6)
    assert np.abs(y_f - y).max() / denom < 0.12


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

    # pipeline-stage split of the same chunk call (pp_engine's MPMD
    # building block): layer 0 with decode=False hands the raw residual
    # to layer 1 with encode=False/lo=1, and the composition is
    # BIT-IDENTICAL to the unsplit _apply_chunk (same kernels, same
    # constants — only the Python loop is cut in two)
    carries = engine.init_stream_state(x.shape[0])
    xc = x[:, :8]
    import jax as _jax
    y_full, nc_full = _jax.jit(
        lambda w, xi, c: engine._apply_chunk(w, xi, c,
                                             block_t=engine.block_t))(
        engine.weights, xc, carries)
    w0 = dict(engine.weights); w0["layers"] = engine.weights["layers"][:1]
    w1 = dict(engine.weights); w1["layers"] = engine.weights["layers"][1:]
    r, nc0 = _jax.jit(
        lambda w, xi, c: engine._apply_chunk(w, xi, c, lo=0, decode=False,
                                             block_t=engine.block_t))(
        w0, xc, carries[:1])
    y_split, nc1 = _jax.jit(
        lambda w, xi, c: engine._apply_chunk(w, xi, c, lo=1, encode=False,
                                             block_t=engine.block_t))(
        w1, r, carries[1:])
    np.testing.assert_array_equal(np.asarray(y_full), np.asarray(y_split))
    for a, b in zip(nc_full, nc0 + nc1):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_engine_weights_are_int8_storage(pipeline):  # noqa: F811
    """VERDICT round-1 item 2: weights must be REAL int8 arrays (4x less
    weight HBM), not float arrays holding int-valued numbers — and the
    dequantized values must be bit-identical to the static-quant rule."""
    from sparsernns_tpu.quantize.engine import QWeight, pow2_quantize
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         block_t=8)

    assert isinstance(engine.encoder_kernel, QWeight)
    assert engine.encoder_kernel.data.dtype == jnp.int8
    assert engine.decoder_kernel.data.dtype == jnp.int8
    for layer in engine.layers:
        assert layer.w_b.dtype == jnp.int8
        assert layer.w_c.dtype == jnp.int8
        assert layer.wb_scales is not None and layer.wc_scales is not None
        # scales are powers of two
        for s in layer.wb_scales + layer.wc_scales:
            l2 = np.log2(abs(s))
            assert abs(l2 - round(l2)) < 1e-9
        assert layer.out2_kernel.data.dtype == jnp.int8

    # dequant == the pow2 grid values (the rule quant_dequant applies)
    k = np.asarray(frozen_params["encoder"]["encoder"]["kernel"])
    q, s = pow2_quantize(k, 8)
    np.testing.assert_array_equal(
        np.asarray(engine.encoder_kernel.dequant()), q.astype(np.float32) * s)

    # weight HBM bytes: ~4x smaller than float storage for the quantized
    # tensors
    int_bytes = sum(
        int(np.prod(a.shape))
        for a in [engine.encoder_kernel.data, engine.decoder_kernel.data]
        + [l.w_b for l in engine.layers] + [l.w_c for l in engine.layers]
        + [l.out2_kernel.data for l in engine.layers])
    # same tensors at f32 would be 4x
    assert int_bytes * 4 == sum(
        4 * int(np.prod(a.shape))
        for a in [engine.encoder_kernel.data, engine.decoder_kernel.data]
        + [l.w_b for l in engine.layers] + [l.w_c for l in engine.layers]
        + [l.out2_kernel.data for l in engine.layers])


def test_engine_int8_xla_weight_bytes_drop(pipeline):  # noqa: F811
    """XLA cost analysis: the jitted engine forward's total bytes accessed
    must reflect int8 weight reads (weights enter the executable as int8
    pytree leaves)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         block_t=8)
    lowered = engine._forward.lower(engine.weights, x)
    # int8 leaves reach the executable unconverted (storage dtype)
    text = lowered.as_text()
    assert "i8" in text, "no int8 operand in the lowered engine HLO"


def test_engine_w8a8_int8_mxu_dense_path():
    """With 8-bit activations the engine's dense layers run REAL int8 x
    int8 -> int32 dots (SURVEY §2.3 dot_general/preferred_element_type
    obligation), matching the static-quant emulation."""
    from sparsernns_tpu.quantize.calibrate import calibrate
    from tests.test_static_quant import D_IO

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, D_IO) * 0.5, jnp.float32)
    fp_model = _model(quantization_recipes["none"]())
    variables = fp_model.init(jax.random.PRNGKey(0), x)
    cal_model = _model(quantization_recipes["w8a8"](static_quant=True,
                                                    calibrating=True))
    batches = [x, jnp.asarray(rng.randn(2, 24, D_IO) * 0.5, jnp.float32)]
    fpq, fps = calibrate(cal_model, jax.random.PRNGKey(1), x,
                         variables["params"], variables.get("batch_stats"),
                         batches)
    inf_cfg = quantization_recipes["w8a8"](static_quant=True,
                                           calibrating=False)
    y_q = np.asarray(_model(inf_cfg).apply(
        {"params": fpq, "batch_stats": fps}, x))

    model_cfg = FxpModelConfig.infer(fpq, glu_variant="half1",
                                     relufication=True, prenorm=True,
                                     clip_eigs=True)
    engine = W8A16Engine(jax.tree_util.tree_map(np.asarray, fpq),
                         jax.tree_util.tree_map(np.asarray, fps),
                         inf_cfg, model_cfg, block_t=8)
    assert engine.encoder_in_scale is not None
    assert engine.decoder_in_scale is not None
    assert engine.layers[0].out2_in_scale is not None

    # the lowered StableHLO really contains int8 dot operands producing
    # an int32 accumulator
    hlo = engine._forward.lower(engine.weights, x).as_text()
    assert "xi8>" in hlo, "no int8 tensor in the lowered module"
    import re
    assert re.search(r"dot_general.*i8.*->.*i32", hlo), \
        "no int8 x int8 -> int32 dot_general in the lowered module"

    y_e = np.asarray(engine(x))
    denom = max(np.abs(y_q).max(), 1.0)
    rel = np.abs(y_e - y_q).max() / denom
    assert rel < 0.15, rel  # a8 is coarser than a16; budget accordingly
    mean_rel = np.abs(y_e - y_q).mean() / denom
    assert mean_rel < 0.02, mean_rel


def test_engine_fused_stack_matches_per_op(pipeline):  # noqa: F811
    """The whole-layer-fused stack (one kernel per layer, padded
    int16/bf16 residual stream in HBM) is BIT-EXACT against the per-op
    engine path at f32 activations, and within bf16-cast noise at bf16
    (the per-op path casts the mixer input to bf16; the stack keeps it
    f32 in VMEM — its only stream quantization is the calibrated
    residual requant both paths share)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    for adt, tol in ((jnp.float32, 0.0), (jnp.bfloat16, 5e-3)):
        e_new = W8A16Engine(frozen_params, frozen_stats, inf_cfg,
                            model_cfg, block_t=32, act_dtype=adt)
        assert e_new._stack_ok
        e_old = W8A16Engine(frozen_params, frozen_stats, inf_cfg,
                            model_cfg, block_t=32, act_dtype=adt)
        e_old._stack_ok = False
        d = np.abs(np.asarray(e_new(x)) - np.asarray(e_old(x)))
        assert d.max() <= tol, (adt, d.max())


def test_engine_block_sparse_dense(pipeline):  # noqa: F811
    """Block-pruned dense kernels pack into the zero-tile-skipping
    kernel with identical results to the masked-dense path, and the
    engine records the honest kept/total tile accounting."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    pruned = jax.tree_util.tree_map(lambda a: a, frozen_params)  # copy
    for i in range(2):
        k = np.asarray(pruned["encoder"][f"layers_{i}"]["out2"]["kernel"])
        k = k.copy()
        k[0:4, 4:8] = 0.0       # one (4,4) tile
        k[4:8, 0:4] = 0.0
        k[8:12, 8:12] = 0.0
        pruned["encoder"][f"layers_{i}"]["out2"]["kernel"] = jnp.asarray(k)

    e_dense = W8A16Engine(pruned, frozen_stats, inf_cfg, model_cfg,
                          block_t=32, block_sparse_dense=None)
    # block-sparse packs are excluded from the whole-layer-fused stack
    # (engine._fused_stack_eligible), so compare like-for-like on the
    # per-op path — the claim under test is tile-skipping == masked
    # dense, not stack-vs-per-op numerics (covered by
    # test_engine_fused_stack_matches_per_op).
    e_dense._stack_ok = False
    e_bs = W8A16Engine(pruned, frozen_stats, inf_cfg, model_cfg,
                       block_t=32, block_sparse_dense=(4, 4),
                       block_sparse_min_saving=0.1)
    assert not e_bs._stack_ok
    # out2 is (12, 12) -> 9 tiles, 3 zeroed per layer
    assert e_bs.dense_blocks["layers_0/out2"] == (6, 9)
    assert e_bs.dense_blocks["layers_1/out2"] == (6, 9)
    assert "encoder" not in e_bs.dense_blocks       # dense: no saving

    y_d = np.asarray(e_dense(x))
    y_b = np.asarray(e_bs(x))
    np.testing.assert_allclose(y_b, y_d, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_engine_fused_network_matches_stack(pipeline):  # noqa: F811
    """The whole-NETWORK kernel (encoder + every layer + decoder in one
    Pallas call, inter-layer stream never leaving VMEM) is BIT-EXACT
    against the per-layer-kernel stack path at the same time block: the
    stack's HBM store+load round trip is reproduced in VMEM value form
    (requant codes x pow2 scale are exact in f32; pre/post pow2 weight
    scales commute exactly with the dot). Covers the whole-axis (t==L),
    aligned-main, and odd-tail (L % t != 0, non-8-aligned) geometries."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    cases = [
        (jnp.float32, 32, x),              # whole-axis: t == L == 24
        (jnp.float32, 8, x),               # aligned main, no tail
        (jnp.float32, 16, x[:, :23]),      # main 16 + odd 7-row tail
        (jnp.bfloat16, 16, x[:, :23]),     # bf16 stream, odd tail
    ]
    for adt, bt, xi in cases:
        e_net = W8A16Engine(frozen_params, frozen_stats, inf_cfg,
                            model_cfg, block_t=bt, act_dtype=adt)
        assert e_net._network_ok and e_net._stack_ok
        e_stk = W8A16Engine(frozen_params, frozen_stats, inf_cfg,
                            model_cfg, block_t=bt, act_dtype=adt)
        e_stk._network_ok = False
        d = np.abs(np.asarray(e_net(xi)) - np.asarray(e_stk(xi)))
        assert d.max() == 0.0, (adt, bt, xi.shape, d.max())


def test_engine_w8a8_fused_routes_match_per_op(pipeline):  # noqa: F811
    """w8a8 (int8-activation) dense dots now run INSIDE the fused
    kernels (_glu_dense / _boundary_dense int8-MXU paths): the whole-
    network and whole-layer routes are eligible and BIT-EXACT against
    the per-op quantized_dense route at f32 activations (integer dots
    are exact; every float op is reproduced in the same order)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a8"](static_quant=True,
                                           calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    def eng():
        return W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                           act_dtype=jnp.float32, block_t=32)

    e_net = eng()
    assert e_net._network_ok and e_net._stack_ok
    assert e_net.encoder_in_scale is not None  # really on the a8 route
    assert e_net.layers[0].out2_in_scale is not None
    e_stk = eng()
    e_stk._network_ok = False
    e_op = eng()
    e_op._network_ok = e_op._stack_ok = False

    y_net = np.asarray(e_net(x))
    y_stk = np.asarray(e_stk(x))
    y_op = np.asarray(e_op(x))
    assert np.abs(y_net - y_stk).max() == 0.0
    assert np.abs(y_net - y_op).max() == 0.0

    # the in-kernel dots really are int8: the engine still lowers with
    # int8 leaves and no f32 dequantized GLU weights appear as operands
    hlo = e_net._forward.lower(e_net.weights, x).as_text()
    assert "xi8>" in hlo


def test_engine_mxu16_w8a16(pipeline):  # noqa: F811
    """mxu16: the w8a16 engine's B/C/GLU/encoder/decoder dots run on the
    int8 MXU via the EXACT two-plane decomposition of the 16-bit
    activation codes (ops/intdot.py). The input quantization it adds is
    the static path's own quant_ut/quant_xt/quant_input (models/ssm.py:
    429, :454; quantize/static.py QuantizedDense), so the mxu16 engine
    must pass the SAME accuracy gates vs the static-quant emulation as
    the float-dot engine, and its network/stack kernel routes must stay
    bit-exact vs each other."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    inf_model = _model(inf_cfg)
    y_q = np.asarray(inf_model.apply(
        {"params": frozen_params, "batch_stats": frozen_stats}, x))
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    def eng():
        return W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                           act_dtype=jnp.float32, block_t=32, mxu16=True)

    e_net = eng()
    # every dot site resolved onto the int path
    assert e_net.mxu16 == {"requested": True, "mixer": True,
                           "state": True, "dense": True, "requants": True}
    assert e_net.encoder_in_scale is not None
    assert e_net.encoder_in_scale[1] == 16
    assert e_net.layers[0].mixer_in16 is not None
    assert e_net._network_ok and e_net._stack_ok

    # Max-error budget: the float engine sits at ~6.5% max / 0.17% mean
    # vs static (per-block vs per-step state requant drift). Site-wise
    # bisection shows the int path's quant_ut/quant_xt/encoder/decoder
    # quantization adds ZERO deviation; the single budget increase is the
    # GLU gate's quant_input, where quantizing the already-drifted gate
    # input adds an independent rounding that the sigmoid*base multiply
    # amplifies at ONE element (~10.9% max; the mean moves 0.17->0.19%).
    y_mxu = np.asarray(e_net(x))
    denom = max(np.abs(y_q).max(), 1.0)
    assert np.abs(y_mxu - y_q).max() / denom < 0.12
    assert np.abs(y_mxu - y_q).mean() / denom < 0.005

    # network and per-layer-stack kernel routes: bit-exact (integer dots
    # have no summation-order ambiguity)
    e_stk = eng()
    e_stk._network_ok = False
    assert np.abs(y_mxu - np.asarray(e_stk(x))).max() == 0.0

    # close to the float-dot engine (only difference: the static path's
    # input quantization, which the float engine skips)
    e_f32 = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                        act_dtype=jnp.float32, block_t=32)
    y_f = np.asarray(e_f32(x))
    assert np.abs(y_mxu - y_f).max() / max(np.abs(y_f).max(), 1.0) < 0.05

    # int8 weight leaves really reach the lowering
    hlo = e_net._forward.lower(e_net.weights, x).as_text()
    assert "xi8>" in hlo


def test_engine_mxu16_streaming_chunks(pipeline):  # noqa: F811
    """Chunked mxu16 serving == whole-sequence mxu16 serving."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=8, mxu16=True)
    y_whole = np.asarray(engine(x))
    carries = None
    outs = []
    for i in range(0, x.shape[1], 8):
        y, carries = engine.process_chunk(x[:, i:i + 8], carries)
        outs.append(np.asarray(y))
    y_chunked = np.concatenate(outs, axis=1)
    denom = max(np.abs(y_whole).max(), 1.0)
    assert np.abs(y_chunked - y_whole).max() / denom < 1e-5


def test_engine_mxu16_parallel_paths(pipeline):  # noqa: F811
    """sp/tp serving paths have no mxu16 hooks — they must REFUSE a
    mxu16 engine instead of silently serving different numerics; the DP
    path wraps engine._apply and must match it exactly."""
    import pytest as _pytest

    from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
    from sparsernns_tpu.parallel.sp_engine import (make_dp_forward,
                                                   make_sp_forward,
                                                   make_tp_forward)
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=8, mxu16=True)
    mesh = make_mesh(MeshConfig(data=8, model=1, seq=1))
    with _pytest.raises(NotImplementedError, match="mxu16"):
        make_sp_forward(engine, mesh)
    with _pytest.raises(NotImplementedError, match="mxu16"):
        make_tp_forward(engine, mesh)
    x8 = jnp.concatenate([x + 0.01 * i for i in range(4)], axis=0)
    y_dp = np.asarray(make_dp_forward(engine, mesh)(x8))
    np.testing.assert_array_equal(y_dp, np.asarray(engine(x8)))


def test_vmem_budget_demotes_routes(pipeline, monkeypatch):  # noqa: F811
    """The fused routes estimate their VMEM residency and refuse kernels
    that would not fit (~16 MiB/core): a tiny budget must demote
    network -> stack -> per-op, with the per-op forward still correct —
    the failure mode this guards is a Mosaic compile crash at
    dim_scale >= ~4, where the whole-network kernel's resident operands
    outgrow VMEM."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    def eng():
        return W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                           act_dtype=jnp.float32, block_t=8)

    e_full = eng()
    assert e_full._stack_ok and e_full._network_ok
    stack_b, net_b = e_full._route_vmem_estimates()
    assert 0 < stack_b <= net_b < e_full._vmem_budget()
    y_full = np.asarray(e_full(x))

    monkeypatch.setenv("SPARSERNNS_VMEM_BUDGET_MB", "0")
    e_none = eng()
    assert not e_none._stack_ok and not e_none._network_ok
    # mxu16 would be demoted too on the per-op route
    y_none = np.asarray(e_none(x))
    denom = max(np.abs(y_full).max(), 1.0)
    assert np.abs(y_none - y_full).max() / denom < 5e-6


def test_engine_mxu16_demotes_int16_weight_packs(pipeline):  # noqa: F811
    """Review regression: w16a16 packs B/C as int16, which must NOT be
    routed onto the int8 two-plane MXU path (its int32 budget assumes
    int8 weights). The engine demotes the mixer/state int sites and keeps
    serving through the float dots."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w16a16"](static_quant=True,
                                             calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32, mxu16=True)
    assert not engine.mxu16["mixer"] and not engine.mxu16["state"]
    y = np.asarray(engine(x))
    assert np.isfinite(y).all()


def test_engine_mxu16_requant_introspection_covers_all_sites(pipeline):  # noqa: F811
    """The sp/tp guard keys off mxu16['requants']; it must be true
    whenever ANY bit-faithful requant is active anywhere (not just
    layer 0's quant_yt)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32, mxu16=True)
    if not engine.mxu16["requested"]:
        return
    # the pipeline calibrates quant_output on the GLU/enc/dec denses and
    # quant_but/quant_yt on the mixer — any one of them must flip the flag
    any_rq = (any(lp.yt_requant is not None or lp.but_requant is not None
                  or lp.out2_out_requant is not None
                  for lp in engine.layers)
              or engine.encoder_out_requant is not None
              or engine.decoder_out_requant is not None)
    assert engine.mxu16["requants"] == any_rq
    # and zeroing layer 0's yt alone must NOT clear it while others remain
    if engine.layers[0].yt_requant is not None and any(
            lp.out2_out_requant is not None for lp in engine.layers):
        import dataclasses as _dc
        engine.layers[0] = _dc.replace(engine.layers[0], yt_requant=None)
        rebuilt = bool(
            any(lp.yt_requant is not None or lp.but_requant is not None
                or lp.out2_out_requant is not None
                for lp in engine.layers)
            or engine.encoder_out_requant is not None
            or engine.decoder_out_requant is not None)
        assert rebuilt  # the sp/tp guard would still refuse this engine


@pytest.fixture(scope="module")
def pipeline_p256():
    """Calibrated pipeline at ssm_size=512 (conj-sym P=256 -> the packed
    C projection's reduction dim is 2P=512) — the dim_scale=2 flagship
    geometry that exceeds the single-int32-accumulator budget."""
    from sparsernns_tpu.models.seq_model import RegressionModel
    from sparsernns_tpu.models.ssm import make_ssm_init_fn
    from sparsernns_tpu.models.ssm_init import blocked_dplr_init
    from sparsernns_tpu.quantize.calibrate import calibrate

    h, d_io, layers = 16, 9, 2

    def model(q_config):
        init = blocked_dplr_init(512, 8, conj_sym=True)
        mixer = make_ssm_init_fn(
            h=h, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
            vinv=init["Vinv"], clip_eigs=True, relufication=True,
            q_config=q_config)
        return RegressionModel(
            mixer_cls=mixer, n_layers=layers, d_model=h, d_output=d_io,
            dropout=0.0, prenorm=True, batchnorm=True, glu_variant="half1",
            training=False, relufication=True, q_config=q_config)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, d_io) * 0.5, jnp.float32)
    fp_model = model(quantization_recipes["none"]())
    variables = fp_model.init(jax.random.PRNGKey(0), x)
    cal_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=True)
    frozen_params, frozen_stats = calibrate(
        model(cal_cfg), jax.random.PRNGKey(1), x,
        variables["params"], variables.get("batch_stats"), [x])
    inf_model = model(quantization_recipes["w8a16"](static_quant=True,
                                                    calibrating=False))
    y_q = np.asarray(inf_model.apply(
        {"params": frozen_params, "batch_stats": frozen_stats}, x))
    return x, y_q, frozen_params, frozen_stats


@pytest.mark.slow
def test_engine_mxu16_w8a16_p256(pipeline_p256):
    """VERDICT r2 #5: lift the K<=511 int32 cap. At P=256 the state
    (C-projection) reduction dim is 2P=512 — beyond the single int32
    accumulator — and must now serve on the int8 MXU via plane-wise
    accumulation (ops/intdot.py) instead of silently demoting to f32
    dots. Reference target: w8a16 at every dim, quantization.py:127-136."""
    x, y_q, frozen_params, frozen_stats = pipeline_p256
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    def eng():
        return W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                           act_dtype=jnp.float32, block_t=8, mxu16=True)

    e_net = eng()
    # the 2P=512 state site stays on the int path (the round-2 gate
    # demoted it) and so does everything else
    assert e_net.layers[0].w_c.shape[0] == 512
    assert e_net.mxu16["state"] and e_net.mxu16["mixer"]
    assert e_net.mxu16["dense"]

    y_mxu = np.asarray(e_net(x))
    denom = max(np.abs(y_q).max(), 1.0)
    assert np.abs(y_mxu - y_q).max() / denom < 0.12
    assert np.abs(y_mxu - y_q).mean() / denom < 0.005

    # network / stack kernel routes bit-exact (plane-wise accumulation is
    # deterministic: exact int32 terms, one f32 add)
    if e_net._network_ok:
        e_stk = eng()
        e_stk._network_ok = False
        assert np.abs(y_mxu - np.asarray(e_stk(x))).max() == 0.0


def test_engine_bf16_io(pipeline):  # noqa: F811
    """bf16 serving io: the mask comes back in the dtype the magnitudes
    arrived in, halving the whole-network kernel's boundary HBM traffic
    (its input read + output write dominate the serving forward). Routes
    round once at the final store, so network/stack stay bit-exact, and
    the bf16 rounding must stay inside the engine's accuracy budget."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    def eng():
        return W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                           act_dtype=jnp.bfloat16, block_t=32, mxu16=True)

    e_net = eng()
    x16 = x.astype(jnp.bfloat16)
    y16 = e_net(x16)
    assert y16.dtype == jnp.bfloat16
    y32 = np.asarray(e_net(x)).astype(np.float32)
    dev = np.abs(np.asarray(y16, np.float32) - y32).max()
    denom = max(np.abs(y32).max(), 1.0)
    # bf16 input rounding (2^-9 relative) through the quant grids
    assert dev / denom < 0.02, dev / denom

    # network vs stack route: still bit-exact at bf16 io
    if e_net._network_ok:
        e_stk = eng()
        e_stk._network_ok = False
        y16s = e_stk(x16)
        assert y16s.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(y16, np.float32),
                                      np.asarray(y16s, np.float32))


@pytest.mark.slow
def test_pipeline_parallel_engine(pipeline):  # noqa: F811
    """Engine forward with the LAYERS partitioned over 2 pipeline stages
    (time chunks flow stage-to-stage, carries stay stage-local) ==
    single-device engine. Same accuracy budget as the sp/tp paths (the
    pp stages run the float per-op layer body)."""
    from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
    from sparsernns_tpu.parallel.pp_engine import make_pp_forward

    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=32)
    y_single = np.asarray(engine(x))

    mesh = make_mesh(MeshConfig(data=1, model=2, seq=1),
                     devices=jax.devices()[:2])
    pp_forward = make_pp_forward(engine, mesh)  # 2 layers -> 1 per stage
    y_pp = np.asarray(pp_forward(x))  # L=24, 4 chunks of 6

    assert y_pp.shape == y_single.shape
    denom = max(np.abs(y_single).max(), 1.0)
    assert np.abs(y_pp - y_single).max() / denom < 0.1

    # chunk count must not change the result (carries are exact across
    # chunk boundaries)
    y_pp2 = np.asarray(make_pp_forward(engine, mesh, chunks=8)(x))
    assert np.abs(y_pp2 - y_single).max() / denom < 0.1

    # mxu16 engines route to the MPMD pipeline (per-stage jitted
    # programs — unlike SP, PP stages advance time chunks SEQUENTIALLY
    # with the true carry, so the bit-faithful int kernels run
    # unchanged). The pipeline must be BIT-IDENTICAL to single-chip
    # chunked serving (process_chunk) at the same chunk size.
    e16 = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                      act_dtype=jnp.float32, block_t=32, mxu16=True)
    assert e16.mxu16["mixer"] or e16.mxu16["requants"]  # really int mode
    if e16.mxu16["requants"] or e16.mxu16["mixer"]:
        n_chunks = 4
        lc = x.shape[1] // n_chunks
        y_pp16 = np.asarray(make_pp_forward(e16, mesh,
                                            chunks=n_chunks)(x))
        carries, ys = None, []
        for c in range(n_chunks):
            yc, carries = e16.process_chunk(
                x[:, c * lc:(c + 1) * lc], carries)
            ys.append(np.asarray(yc))
        y_ref = np.concatenate(ys, axis=1)
        np.testing.assert_array_equal(y_pp16, y_ref)
        # and within the usual budget of the whole-sequence int forward
        y16_whole = np.asarray(e16(x))
        denom16 = max(np.abs(y16_whole).max(), 1.0)
        assert np.abs(y_pp16 - y16_whole).max() / denom16 < 0.1


def test_engine_xla_route_matches_auto(pipeline):  # noqa: F811
    """route='xla' (blocked matmul scan + dequantized float dots, zero
    Pallas/int8-dot ops) must track both the auto-route engine and the
    static-quant emulation within the same error budget — it is the
    serving path for conformance-limited transports (PERF.md round-3)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    e_auto = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         block_t=32)
    e_xla = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                        block_t=32, route="xla")
    assert not e_xla._stack_ok and not e_xla._network_ok
    y_a = np.asarray(e_auto(x))
    y_x = np.asarray(e_xla(x))
    denom = max(np.abs(y_a).max(), 1.0)
    # same block_t and the same per-block requant grid: the two scans
    # snap states onto identical grid points, differences stay tiny
    assert np.abs(y_x - y_a).max() / denom < 0.02

    inf_model = _model(inf_cfg)
    y_q = np.asarray(inf_model.apply(
        {"params": frozen_params, "batch_stats": frozen_stats}, x))
    rel = np.abs(y_x - y_q).max() / max(np.abs(y_q).max(), 1.0)
    assert rel < 0.10, rel


def test_engine_xla_route_program_is_pallas_free(pipeline):  # noqa: F811
    """The lowered xla-route program must contain NO custom-calls (Pallas)
    and NO integer dot_generals — the op classes the round-3 tunnel
    refuses or wedges on (runs/backend_probe.json)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    e_xla = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                        block_t=32, route="xla")
    txt = jax.jit(lambda w, xi: e_xla._apply(w, xi, block_t=32)
                  ).lower(e_xla.weights, x).as_text()
    assert "custom_call" not in txt and "custom-call" not in txt
    # every dot runs on dequantized float operands
    import re
    for m in re.finditer(r"stablehlo\.dot_general.*?->.*?tensor<[^>]*>",
                         txt):
        assert "xi8" not in m.group(0) and "xi16" not in m.group(0), \
            m.group(0)[:200]


def test_engine_xla_route_chunked_matches_whole(pipeline):  # noqa: F811
    """xla-route process_chunk with carry flow == one whole-sequence
    xla-route call (streaming on the Pallas-free path)."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(frozen_params, frozen_stats, inf_cfg, model_cfg,
                         act_dtype=jnp.float32, block_t=8, route="xla")
    y_whole = np.asarray(engine(x))  # L = 24

    c = None
    chunks = []
    for start in (0, 8, 16):
        y_c, c = engine.process_chunk(x[:, start:start + 8], c)
        chunks.append(np.asarray(y_c))
    y_chunked = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(y_chunked, y_whole, atol=2e-3)


def test_engine_row_pair_matches_unpaired(pipeline):  # noqa: F811
    """The paired-row interleaved network schedule (fused_network
    rows=2 — one row's VPU scan emitted adjacent to the other row's MXU
    dots for the measured co-issue, runs/kernel_probe.json) is BIT-EXACT
    against the unpaired schedule: per row the op sequence is identical.
    Covers even batch (paired), odd-tail geometry, mxu16 int dots, and
    the odd-batch silent fallback."""
    x, variables, y_fp, frozen_params, frozen_stats = pipeline
    inf_cfg = quantization_recipes["w8a16"](static_quant=True,
                                            calibrating=False)
    model_cfg = FxpModelConfig.infer(
        frozen_params, glu_variant="half1", relufication=True,
        prenorm=True, clip_eigs=True)

    def eng(row_pair, mxu16=False, bt=16):
        return W8A16Engine(frozen_params, frozen_stats, inf_cfg,
                           model_cfg, block_t=bt, mxu16=mxu16,
                           row_pair=row_pair)

    for mxu16 in (False, True):
        for xi in (x, x[:, :23]):          # aligned and odd-tail
            d = np.abs(np.asarray(eng(True, mxu16)(xi))
                       - np.asarray(eng(False, mxu16)(xi)))
            assert d.max() == 0.0, (mxu16, xi.shape, d.max())

    # odd batch: row_pair silently ignored, still exact
    x_odd = x[:3]
    d = np.abs(np.asarray(eng(True)(x_odd))
               - np.asarray(eng(False)(x_odd)))
    assert d.max() == 0.0
