"""Magnitude-STE pruning engine tests (replaces jaxpruner; SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.train.pruning import (MagnitudePruner, PruningConfig,
                                          pruning_recipes, scheduled_sparsity,
                                          sparsity_distribution,
                                          summarize_sparsity)


def _params(rng):
    return {
        "encoder": {"kernel": jnp.asarray(rng.randn(16, 32), jnp.float32),
                    "bias": jnp.asarray(rng.randn(32), jnp.float32)},
        "ssm": {"B": jnp.asarray(rng.randn(8, 16, 2), jnp.float32),
                "Lambda_re": jnp.asarray(rng.randn(8), jnp.float32)},
    }


def test_recipes_shape():
    r = pruning_recipes(epochs=10, steps_per_epoch=100)
    assert not r["no_prune"].enabled
    cfg = r["iterative-ste-mag-0.9"]
    assert cfg.final_sparsity == 0.9
    assert cfg.update_start == 50 and cfg.update_end == 900
    assert cfg.update_freq == 50


def test_schedule_cubic():
    cfg = PruningConfig(final_sparsity=0.8, update_start=0, update_end=100)
    assert float(scheduled_sparsity(cfg, jnp.asarray(0))) == 0.0
    np.testing.assert_allclose(
        float(scheduled_sparsity(cfg, jnp.asarray(100))), 0.8, atol=1e-6)
    mid = float(scheduled_sparsity(cfg, jnp.asarray(50)))
    assert 0.6 < mid < 0.8  # cubic front-loads sparsification


def test_distribution_skips_small_leaves(rng):
    params = _params(rng)
    cfg = PruningConfig(final_sparsity=0.5)
    rel = sparsity_distribution(params, cfg)
    assert rel["encoder"]["bias"] == 0.0
    assert rel["ssm"]["Lambda_re"] == 0.0
    assert rel["encoder"]["kernel"] > 0.0
    assert rel["ssm"]["B"] > 0.0


def test_erk_global_sparsity_achieved(rng):
    params = _params(rng)
    cfg = PruningConfig(final_sparsity=0.5, update_start=0, update_end=10,
                        update_freq=1)
    pruner = MagnitudePruner(cfg)
    masks = pruner.init_masks(params)
    masks = pruner.update_masks(params, masks, jnp.asarray(10))
    masked = jax.tree_util.tree_map(lambda p, m: p * m, params, masks)
    s = summarize_sparsity(
        {"k": masked["encoder"]["kernel"], "B": masked["ssm"]["B"]})
    assert 0.4 < s["_total_sparsity"] < 0.6


def test_ste_masked_forward_dense_gradient(rng):
    params = {"w": jnp.asarray(rng.randn(8, 8), jnp.float32)}
    cfg = PruningConfig(final_sparsity=0.5, update_start=0, update_end=1,
                        update_freq=1, distribution="uniform")
    pruner = MagnitudePruner(cfg)
    masks = pruner.init_masks(params)
    masks = pruner.update_masks(params, masks, jnp.asarray(1))
    assert 0.3 < float(1 - masks["w"].mean()) < 0.7

    v = jnp.asarray(rng.randn(8, 8), jnp.float32)

    def loss(p):
        masked = pruner.apply_masks(p, masks)
        return jnp.sum(masked["w"] * v)

    g = jax.grad(loss)(params)
    # STE: dL/dp == dL/dmasked everywhere, even at pruned coordinates
    np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(v), atol=1e-6)

    # hard mode: pruned coordinates get zero gradient
    hard = MagnitudePruner(
        PruningConfig(final_sparsity=0.5, update_start=0, update_end=1,
                      update_freq=1, distribution="uniform", mode="hard"))

    def loss_hard(p):
        return jnp.sum(hard.apply_masks(p, masks)["w"] * v)

    gh = jax.grad(loss_hard)(params)
    assert float((jnp.abs(gh["w"]) > 0).mean()) < 0.7


def test_mask_update_respects_schedule_gate(rng):
    params = {"w": jnp.asarray(rng.randn(8, 8), jnp.float32)}
    cfg = PruningConfig(final_sparsity=0.5, update_start=10, update_end=20,
                        update_freq=5, distribution="uniform")
    pruner = MagnitudePruner(cfg)
    masks = pruner.init_masks(params)
    # before start: unchanged
    m1 = pruner.update_masks(params, masks, jnp.asarray(3))
    assert float(m1["w"].mean()) == 1.0
    # mid-schedule on an update step: prunes
    m2 = pruner.update_masks(params, masks, jnp.asarray(15))
    assert float(m2["w"].mean()) < 1.0
    # mid-schedule off an update step: unchanged
    m3 = pruner.update_masks(params, masks, jnp.asarray(16))
    assert float(m3["w"].mean()) == 1.0


def test_no_prune_passthrough(rng):
    params = {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)}
    pruner = MagnitudePruner(PruningConfig())
    masks = pruner.init_masks(params)
    assert pruner.apply_masks(params, masks) is params


def test_structured_state_pruning_masks(rng):
    """structure='state': B rows and C columns zero as WHOLE channels,
    jointly scored (the MXU-exploitable structure; SURVEY §7 hard part)."""
    import dataclasses as _dc
    p, h = 16, 8
    params = {"encoder": {"layers_0": {"mixer": {
        "B": jnp.asarray(rng.randn(p, h, 2), jnp.float32),
        "C": jnp.asarray(rng.randn(h, p, 2), jnp.float32),
        "Lambda_re": jnp.asarray(rng.randn(p), jnp.float32),
    }}}}
    cfg = PruningConfig(final_sparsity=0.5, update_start=0, update_end=1,
                        update_freq=1, structure="state",
                        distribution="uniform")
    pruner = MagnitudePruner(cfg)
    masks = pruner.init_masks(params)
    m = pruner.update_masks(params, masks, jnp.asarray(10))
    mb = np.asarray(m["encoder"]["layers_0"]["mixer"]["B"])
    mc = np.asarray(m["encoder"]["layers_0"]["mixer"]["C"])
    # whole-channel structure: each B row / C column is all-0 or all-1
    row_any = mb.reshape(p, -1)
    assert ((row_any == row_any[:, :1]).all()), "B rows not channel-whole"
    col_any = np.moveaxis(mc, 1, 0).reshape(p, -1)
    assert ((col_any == col_any[:, :1]).all()), "C cols not channel-whole"
    # the SAME channels pruned in both
    keep_b = row_any[:, 0] > 0
    keep_c = col_any[:, 0] > 0
    np.testing.assert_array_equal(keep_b, keep_c)
    assert 0 < keep_b.sum() < p
    # ~50% pruned
    assert abs(float(keep_b.mean()) - 0.5) < 0.2


def test_structured_pruned_training_and_engine_compaction(rng):
    """Train a few steps with the structured recipe, convert the masked
    params to the serving engine: pruned channels COMPACT away (smaller
    scan/projection width) with identical outputs."""
    from tests.test_train import make_state, tiny_ndns_model
    from sparsernns_tpu.train.steps import (make_mask_update_fn,
                                            make_ndns_train_step)
    from sparsernns_tpu.fxp.derive import FxpModelConfig
    from sparsernns_tpu.quantize.config import quantization_recipes
    from sparsernns_tpu.quantize.engine import W8A16Engine

    model = tiny_ndns_model(d_model=8, ssm_size=16, d_io=17)
    x = jnp.asarray(rng.randn(2, 16, 17), jnp.float32)
    cfg = PruningConfig(final_sparsity=0.5, update_start=1, update_end=4,
                        update_freq=1, structure="state",
                        distribution="uniform")
    pruner = MagnitudePruner(cfg)
    variables = model.init(jax.random.PRNGKey(0), x)
    masks = pruner.init_masks(variables["params"])
    state = make_state(model, x, masks=masks)
    step = make_ndns_train_step(model, batchnorm=True, pruner=pruner)
    mask_update = make_mask_update_fn(pruner)
    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    clean = jnp.asarray(rng.randn(2, 15 * 128), jnp.float32)
    for _ in range(6):
        state = mask_update(state)
        state, m = step(state, jax.random.PRNGKey(1), noisy_mag,
                        jnp.zeros_like(noisy_mag), noisy_mag * 0.9, clean)
    assert np.isfinite(float(m["loss"]))

    masked = jax.tree_util.tree_map(lambda p, q: np.asarray(p * q),
                                    state.params, state.masks)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    q_cfg = quantization_recipes["w8a16"](static_quant=True,
                                          calibrating=False)
    mcfg = FxpModelConfig.infer(masked, glu_variant="half1",
                                relufication=False, prenorm=True,
                                clip_eigs=True)
    e_full = W8A16Engine(masked, stats, q_cfg, mcfg, block_t=8,
                         act_dtype=jnp.float32, compact_state=False)
    e_comp = W8A16Engine(masked, stats, q_cfg, mcfg, block_t=8,
                         act_dtype=jnp.float32, compact_state=True)
    p_orig, p_kept = e_comp.state_channels[0]
    assert p_kept < p_orig, e_comp.state_channels
    y_full = np.asarray(e_full(x))
    y_comp = np.asarray(e_comp(x))
    np.testing.assert_allclose(y_comp, y_full, atol=2e-4)


def test_block_pruning_masks(rng):
    """structure="block": whole tiles of 2-D kernels zero together at
    the scheduled fraction; non-2-D leaves are untouched."""
    cfg = PruningConfig(
        final_sparsity=0.5, update_start=0, update_end=100, update_freq=1,
        structure="block", distribution="uniform", block_shape=(4, 8),
        mode="ste")
    params = {
        "encoder": {"kernel": jnp.asarray(rng.randn(16, 24), jnp.float32),
                    "bias": jnp.asarray(rng.randn(24), jnp.float32)},
        "mixer": {"B": jnp.asarray(rng.randn(8, 16, 2), jnp.float32)},
    }
    pruner = MagnitudePruner(cfg)
    masks = pruner.init_masks(params)
    # at update_end the full 50% target applies
    masks = pruner.update_masks(params, masks, jnp.asarray(cfg.update_end))

    m = np.asarray(masks["encoder"]["kernel"])     # (16, 24) -> 4x3 tiles
    tiles = m.reshape(4, 4, 3, 8).transpose(0, 2, 1, 3).reshape(12, 32)
    per_tile = tiles.mean(axis=1)
    assert set(np.unique(per_tile)).issubset({0.0, 1.0})   # whole tiles
    assert abs(per_tile.mean() - 0.5) <= 1 / 12 + 1e-6     # ~target
    # kept tiles are the highest-Frobenius ones
    w = np.asarray(params["encoder"]["kernel"])
    wt = w.reshape(4, 4, 3, 8).transpose(0, 2, 1, 3).reshape(12, 32)
    norms = (wt ** 2).sum(axis=1)
    kept = per_tile == 1.0
    assert norms[kept].min() >= norms[~kept].max() - 1e-6
    # 3-D and bias leaves untouched in block mode
    assert np.all(np.asarray(masks["mixer"]["B"]) == 1.0)
    assert np.all(np.asarray(masks["encoder"]["bias"]) == 1.0)
