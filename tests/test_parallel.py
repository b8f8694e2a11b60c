"""Multi-device tests on the 8-device virtual CPU mesh: DP/TP sharded
training step and the sequence-parallel scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


from sparsernns_tpu.ops.scan import associative_diag_scan
from sparsernns_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, SEQ_AXIS,
                                          MeshConfig, make_mesh)
from sparsernns_tpu.parallel.seqscan import make_seq_parallel_scan
from sparsernns_tpu.parallel.sharding import (param_sharding, shard_batch,
                                              shard_train_state)


def test_mesh_construction():
    mesh = make_mesh(MeshConfig(data=-1, model=2, seq=2))
    assert mesh.shape[DATA_AXIS] == 2
    assert mesh.shape[MODEL_AXIS] == 2
    assert mesh.shape[SEQ_AXIS] == 2

    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, model=3, seq=1))


def test_seq_parallel_scan_matches_single_device(rng):
    mesh = make_mesh(MeshConfig(data=1, model=1, seq=8))
    p, l, b = 16, 64, 2
    lam_c = 0.9 * np.exp(1j * rng.uniform(0, np.pi, p)) * rng.uniform(0.5, 1, p)
    bu_c = rng.randn(b, l, p) + 1j * rng.randn(b, l, p)
    lam = (jnp.asarray(lam_c.real, jnp.float32),
           jnp.asarray(lam_c.imag, jnp.float32))
    bu = (jnp.asarray(bu_c.real, jnp.float32),
          jnp.asarray(bu_c.imag, jnp.float32))

    expected = associative_diag_scan(lam, bu)
    scan = make_seq_parallel_scan(mesh)
    got = jax.jit(scan)(lam, bu)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(expected[0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(expected[1]),
                               atol=2e-3)


def test_sharded_train_step_matches_single_device(rng):
    """DP×TP sharded NDNS train step == unsharded step (same math)."""
    from tests.test_train import make_state, tiny_ndns_model
    from sparsernns_tpu.train.steps import make_ndns_train_step

    model = tiny_ndns_model(d_io=33)
    x = jnp.asarray(rng.randn(4, 16, 33), jnp.float32)
    state = make_state(model, x)

    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    noisy_phase = jnp.zeros_like(noisy_mag)
    clean = jnp.asarray(rng.randn(4, 15 * 128), jnp.float32)
    clean_mag = noisy_mag * 0.9
    step = make_ndns_train_step(model, batchnorm=True)
    key = jax.random.PRNGKey(0)

    _, metrics_ref = step(state, key, noisy_mag, noisy_phase, clean_mag, clean)

    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    state_sh = shard_train_state(state, mesh)
    batch_sh = shard_batch((noisy_mag, noisy_phase, clean_mag, clean), mesh)
    new_state, metrics_sh = step(state_sh, key, *batch_sh)
    np.testing.assert_allclose(float(metrics_sh["loss"]),
                               float(metrics_ref["loss"]), rtol=1e-4)
    # params remain TP-sharded after the step
    b_sharding = new_state.params["encoder"]["layers_0"]["mixer"]["B"].sharding
    assert b_sharding.spec[0] == MODEL_AXIS


def test_param_sharding_rules(rng):
    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    params = {"mixer": {"B": jnp.ones((8, 4, 2)), "C": jnp.ones((4, 8, 2)),
                        "Lambda_re": jnp.ones((8,)), "D": jnp.ones((4,))},
              "encoder": {"kernel": jnp.ones((4, 4))}}
    shardings = param_sharding(params, mesh)
    assert shardings["mixer"]["B"].spec[0] == MODEL_AXIS
    assert shardings["mixer"]["C"].spec[1] == MODEL_AXIS
    assert shardings["mixer"]["D"].spec == ()
    assert shardings["encoder"]["kernel"].spec == ()


def test_train_loop_with_mesh_flags(tmp_path):
    """train() honors the --mesh_* flags: params TP-sharded, batches
    data-sharded, same orchestrator code."""
    from sparsernns_tpu.train.loop import train
    from sparsernns_tpu.utils.config import RunConfig

    cfg = RunConfig(
        dataset="ndns", synthetic_data=True, synthetic_size=4,
        synthetic_seconds=0.5, n_layers=1, d_model=12, ssm_size_base=16,
        blocks=2, bsz=4, epochs=1, opt_config="standard", logger="none",
        checkpoint_dir=None, p_dropout=0.0, jax_seed=0,
        mesh_data=4, mesh_model=2, mesh_seq=1)
    out = train(cfg)
    assert out["metadata"]["best_val_loss"] < float("inf")
    b = out["state"].params["encoder"]["layers_0"]["mixer"]["B"]
    assert b.sharding.spec[0] == MODEL_AXIS


def test_opt_state_moments_sharded_by_param_rules(rng):
    """Adam moments follow the param TP rules instead of being replicated
    (VERDICT round-1 item 9)."""
    from tests.test_train import make_state, tiny_ndns_model

    model = tiny_ndns_model(d_io=33)
    x = jnp.asarray(rng.randn(4, 16, 33), jnp.float32)
    state = make_state(model, x, opt_config="standard")
    mesh = make_mesh(MeshConfig(data=4, model=2, seq=1))
    state_sh = shard_train_state(state, mesh)

    found_sharded = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            state_sh.opt_state):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if not hasattr(leaf, "sharding"):
            continue
        if names and names[-1] in ("B", "Lambda_re", "Lambda_im",
                                   "log_step"):
            assert leaf.sharding.spec[0] == MODEL_AXIS, (names, leaf.shape)
            found_sharded += 1
        elif names and names[-1] in ("C", "C1", "C2"):
            assert leaf.sharding.spec[1] == MODEL_AXIS, names
            found_sharded += 1
    assert found_sharded >= 4, found_sharded  # mu+nu for ssm group at least

    # and the sharded state still steps correctly
    from sparsernns_tpu.train.steps import make_ndns_train_step
    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    clean = jnp.asarray(rng.randn(4, 15 * 128), jnp.float32)
    step = make_ndns_train_step(model, batchnorm=True)
    batch_sh = shard_batch((noisy_mag, jnp.zeros_like(noisy_mag),
                            noisy_mag * 0.9, clean), mesh)
    new_state, m = step(state_sh, jax.random.PRNGKey(0), *batch_sh)
    assert np.isfinite(float(m["loss"]))


def test_collective_bytes_accounting(rng):
    """SP engine collectives are O(P·log n) per layer (carry exchange),
    TP engine collectives are O(B·L·H) psums — NOT full-activation
    volumes (VERDICT round-1 item 7)."""
    from sparsernns_tpu.parallel.comms import (collective_bytes,
                                               scaling_efficiency_model)
    from sparsernns_tpu.parallel.seqscan import seq_chunk_scan
    from jax.sharding import PartitionSpec as P

    n = 8
    p, l, b = 16, 64, 2
    mesh = make_mesh(MeshConfig(data=1, model=1, seq=n))
    lam = (jnp.full((p,), 0.9, jnp.float32), jnp.zeros((p,), jnp.float32))
    bu = (jnp.asarray(rng.randn(b, l, p), jnp.float32),
          jnp.asarray(rng.randn(b, l, p), jnp.float32))

    spec = P(None, SEQ_AXIS, None)
    f = jax.jit(jax.shard_map(
        lambda lam, bu: seq_chunk_scan(lam, bu, axis_name=SEQ_AXIS),
        mesh=mesh, in_specs=((P(), P()), (spec, spec)),
        out_specs=(spec, spec)))
    acct = collective_bytes(f, lam, bu)
    assert acct["total_bytes"] > 0
    # log-depth ppermute of (b, p) carries: ~2 arrays * b*p*4 bytes *
    # log2(n) rounds * n devices; full activations would be b*l*p*4*n =
    # 32x more — assert we are well under that
    full_activations = 2 * b * l * p * 4 * n
    assert acct["total_bytes"] < full_activations, acct
    assert "collective-permute" in acct["per_op_bytes"], acct

    eff = scaling_efficiency_model(
        compute_bytes=2 * b * l * p * 4, collective_total=acct["total_bytes"])
    assert 0.0 < eff["efficiency"] <= 1.0


def test_sequence_parallel_training_step(rng):
    """DP x TP x SP train step (scan_mode='sp': time sharded over SEQ with
    ppermute carry combine INSIDE the jitted step) == unsharded step."""
    from tests.test_train import make_state
    from sparsernns_tpu.models.seq_model import RegressionModel
    from sparsernns_tpu.models.ssm import make_ssm_init_fn
    from sparsernns_tpu.models.ssm_init import blocked_dplr_init
    from sparsernns_tpu.train.steps import make_ndns_train_step

    mesh = make_mesh(MeshConfig(data=2, model=2, seq=2))

    def build(sp_mesh):
        init = blocked_dplr_init(8, 1, conj_sym=True)
        mixer = make_ssm_init_fn(
            h=8, p=init["P"], lambda_init=init["Lambda"], v=init["V"],
            vinv=init["Vinv"], clip_eigs=True,
            scan_mode="sp" if sp_mesh is not None else "associative",
            sp_mesh=sp_mesh)
        return RegressionModel(
            mixer_cls=mixer, n_layers=1, d_model=8, d_output=33,
            dropout=0.0, prenorm=True, batchnorm=True, glu_variant="half1",
            training=True)

    x = jnp.asarray(rng.randn(4, 16, 33), jnp.float32)
    noisy_mag = jnp.transpose(x, (0, 2, 1)) ** 2
    noisy_phase = jnp.zeros_like(noisy_mag)
    clean = jnp.asarray(rng.randn(4, 15 * 128), jnp.float32)
    clean_mag = noisy_mag * 0.9
    key = jax.random.PRNGKey(0)

    ref_model = build(None)
    state = make_state(ref_model, x)
    _, m_ref = make_ndns_train_step(ref_model, batchnorm=True)(
        state, key, noisy_mag, noisy_phase, clean_mag, clean)

    sp_model = build(mesh)
    state_sp = make_state(sp_model, x)
    state_sp = shard_train_state(state_sp, mesh)
    from sparsernns_tpu.parallel.sharding import shard_batch as sb
    batch_sh = sb((noisy_mag, noisy_phase, clean_mag, clean), mesh,
                  time_axis_3d=-1)
    # time axis really is sharded over SEQ
    assert batch_sh[0].sharding.spec[-1] == SEQ_AXIS
    new_state, m_sp = make_ndns_train_step(sp_model, batchnorm=True)(
        state_sp, key, *batch_sh)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_sp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-3)


def test_sp_train_scan_pads_indivisible_lengths(rng):
    """L not divisible by the SEQ axis: end-padded internally, result
    matches the plain scan (the flagship L=3751 is not divisible by any
    power of two)."""
    from sparsernns_tpu.parallel.seqscan import make_sp_train_scan

    mesh = make_mesh(MeshConfig(data=1, model=1, seq=8))
    p, l = 8, 23  # 23 % 8 != 0
    lam = (jnp.full((p,), 0.9, jnp.float32),
           jnp.full((p,), 0.1, jnp.float32))
    bu = (jnp.asarray(rng.randn(2, l, p), jnp.float32),
          jnp.asarray(rng.randn(2, l, p), jnp.float32))
    xs_sp = jax.jit(make_sp_train_scan(mesh))(lam, bu)
    xs_ref = associative_diag_scan(lam, bu)
    np.testing.assert_allclose(np.asarray(xs_sp[0]), np.asarray(xs_ref[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs_sp[1]), np.asarray(xs_ref[1]),
                               atol=1e-5)


def test_train_loop_with_seq_mesh(tmp_path):
    """train() with mesh_seq>1 routes the mixer through the sp scan and
    shards the STFT time axis over SEQ."""
    from sparsernns_tpu.train.loop import train
    from sparsernns_tpu.utils.config import RunConfig

    cfg = RunConfig(
        dataset="ndns", synthetic_data=True, synthetic_size=4,
        synthetic_seconds=0.5, n_layers=1, d_model=12, ssm_size_base=16,
        blocks=2, bsz=4, epochs=1, opt_config="standard", logger="none",
        checkpoint_dir=None, p_dropout=0.0, jax_seed=0,
        mesh_data=2, mesh_model=2, mesh_seq=2)
    out = train(cfg)
    assert out["metadata"]["best_val_loss"] < float("inf")


def test_fused_kernel_partitions_under_dp(rng):
    """The Pallas kernels carry a batch-dim custom_partitioning rule:
    a DP-sharded fused forward compiles with ZERO collectives (before the
    fix, XLA all-gathered the batch around every custom call — 23.6 MB
    per step at flagship shapes)."""
    from sparsernns_tpu.parallel.comms import collective_bytes
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.test_train import tiny_ndns_model

    mesh = make_mesh(MeshConfig(data=8, model=1, seq=1))
    model = tiny_ndns_model(d_io=33).clone(training=False)
    # fused scan mode
    from sparsernns_tpu.models.seq_model import RegressionModel
    from sparsernns_tpu.models.ssm import make_ssm_init_fn
    from sparsernns_tpu.models.ssm_init import blocked_dplr_init
    init = blocked_dplr_init(8, 1, conj_sym=True)
    mixer = make_ssm_init_fn(h=8, p=init["P"], lambda_init=init["Lambda"],
                             v=init["V"], vinv=init["Vinv"],
                             clip_eigs=True, scan_mode="fused")
    model = RegressionModel(mixer_cls=mixer, n_layers=1, d_model=8,
                            d_output=33, dropout=0.0, prenorm=True,
                            batchnorm=True, glu_variant="half1",
                            training=False)
    x = jax.device_put(jnp.asarray(rng.randn(8, 16, 33), jnp.float32),
                       NamedSharding(mesh, P(DATA_AXIS)))
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda v, xi: model.apply(v, xi))
    acct = collective_bytes(fwd, variables, x)
    assert acct["total_bytes"] == 0, acct
    # and the result matches the unsharded forward
    y_sharded = np.asarray(fwd(variables, x))
    y_plain = np.asarray(model.apply(variables, np.asarray(x)))
    np.testing.assert_allclose(y_sharded, y_plain, atol=1e-5)


def test_tail_backward_partitions_under_dp(rng):
    """The whole-layer BACKWARD kernel (fused_layer_bwd.py) emits
    per-batch-row weight gradients and is batch-partitioned, so a
    DP-sharded training gradient compiles WITHOUT all-gathering the
    (B, L, H) streams around the custom call: the only collectives are
    the small weight-grad reductions (psum of (H,2P)-scale partials) —
    orders of magnitude below one stream's bytes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsernns_tpu.models.seq_model import RegressionModel
    from sparsernns_tpu.models.ssm import make_ssm_init_fn
    from sparsernns_tpu.models.ssm_init import blocked_dplr_init
    from sparsernns_tpu.parallel.comms import collective_bytes

    mesh = make_mesh(MeshConfig(data=8, model=1, seq=1))
    init = blocked_dplr_init(8, 1, conj_sym=True)
    mixer = make_ssm_init_fn(h=8, p=init["P"], lambda_init=init["Lambda"],
                             v=init["V"], vinv=init["Vinv"],
                             clip_eigs=True, scan_mode="fused")
    model = RegressionModel(mixer_cls=mixer, n_layers=1, d_model=8,
                            d_output=33, dropout=0.0, prenorm=True,
                            batchnorm=True, glu_variant="half1",
                            training=True)
    b, l, d_io = 8, 16, 33
    x = jax.device_put(jnp.asarray(rng.randn(b, l, d_io), jnp.float32),
                       NamedSharding(mesh, P(DATA_AXIS)))
    variables = model.init(jax.random.PRNGKey(0), x)
    params, rest = variables["params"], {
        k: v for k, v in variables.items() if k != "params"}

    def loss(p, xi):
        y, _ = model.apply({"params": p, **rest}, xi,
                           mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    gfn = jax.jit(jax.grad(loss))
    acct = collective_bytes(gfn, params, x)
    # no stream gathers: the only collectives are small REDUCTIONS (the
    # per-row weight-grad psums and the padded-stream BN stat sums)
    assert "all-gather" not in acct["per_op_bytes"], acct
    stream_bytes = b * l * 8 * 4
    assert acct["total_bytes"] < 4 * stream_bytes, acct
    # gradients match the unsharded run
    g_sharded = gfn(params, x)
    g_plain = jax.grad(loss)(params, np.asarray(x))
    for a, bb in zip(jax.tree_util.tree_leaves(g_sharded),
                     jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)
