"""Jaxpr relay (utils/relay.py): the metadata-stripping jit used by the
bench/serving paths on the conformance-limited tunnel backend, where the
compile service refuses flax lowerings but accepts the same jaxpr
re-emitted through eval_jaxpr (runs/backend_probe.json, 2026-08-20:
handbuilt_model_fwd ok vs layer_tiny_blocked UNIMPLEMENTED)."""

import numpy as np
import pytest

# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from sparsernns_tpu.utils.relay import relay_jit


def _tiny_model_and_args():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    model = _flagship_model(d_model=16, ssm_size=16, blocks=2, n_layers=2,
                            d_io=33, training=False, scan_mode="blocked")
    x = jnp.zeros((1, 64, 33), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(0)
    v = jax.tree_util.tree_map(
        lambda s: (0.1 * np.abs(rng.randn(*s.shape)) + 0.01
                   ).astype(s.dtype), shapes)
    return model, v, x


def test_relay_model_forward_bit_exact():
    model, v, x = _tiny_model_and_args()

    def fn(vv, xx):
        return model.apply(vv, xx)

    y_jit = jax.jit(fn)(v, x)
    y_relay = relay_jit(fn, v, x)(v, x)
    np.testing.assert_array_equal(np.asarray(y_jit), np.asarray(y_relay))


def test_relay_pytree_output_and_structure():
    model, v, x = _tiny_model_and_args()

    def fn(vv, xx):
        y = model.apply(vv, xx)
        return y, {"sum": jnp.sum(xx), "pair": (xx + 1.0, xx * 2.0)}

    o_jit = jax.jit(fn)(v, x)
    o_relay = relay_jit(fn, v, x)(v, x)
    assert (jax.tree_util.tree_structure(o_jit)
            == jax.tree_util.tree_structure(o_relay))
    for a, b in zip(jax.tree_util.tree_leaves(o_jit),
                    jax.tree_util.tree_leaves(o_relay)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_relay_strips_flax_scope_metadata():
    """The point of the relay: same op content, none of flax's
    class/scope location entries the tunnel compiler refuses."""
    import re
    model, v, x = _tiny_model_and_args()

    def fn(vv, xx):
        return model.apply(vv, xx)

    t_flax = jax.jit(fn).lower(v, x).as_text(debug_info=True)
    t_relay = relay_jit(fn, v, x).lower(v, x).as_text(debug_info=True)

    def ops(t):
        import collections
        return collections.Counter(re.findall(r'= "?([a-z_]+\.[a-z_]+)', t))

    # same op VOCABULARY (re-tracing may CSE/duplicate a broadcast or
    # split a clamp, so exact counts can differ by a couple while
    # numerics stay bit-exact — pinned by the bit-exactness test above)
    assert set(ops(t_flax)) == set(ops(t_relay))
    assert "BatchNorm.__call__" in t_flax       # flax scopes present...
    assert "BatchNorm.__call__" not in t_relay  # ...and stripped
    assert "S5SSM" not in t_relay


def test_relay_signature_mismatch_raises():
    def fn(a, b):
        return a + b

    r = relay_jit(fn, jnp.ones((4,)), jnp.ones((4,)))
    with pytest.raises(TypeError, match="different argument structure"):
        r(jnp.ones((4,)), {"oops": jnp.ones((4,))})


def test_relay_lower_cost_analysis_path():
    """bench._xla_cost calls fwd.lower(*args).compile().cost_analysis();
    the relay wrapper must support that chain."""
    def fn(a, b):
        return a @ b

    a, b = jnp.ones((32, 32)), jnp.ones((32, 32))
    r = relay_jit(fn, a, b)
    compiled = r.lower(a, b).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    assert float(ca.get("flops", 0.0)) > 0


def test_relay_train_step_pytree_state():
    """A TrainState-holding step (custom VJP + optimizer) relays
    bit-exactly — the bench train-step mode's requirement."""
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.train.optim import create_optimizer
    from sparsernns_tpu.train.state import TrainState
    from sparsernns_tpu.train.steps import make_ndns_train_step

    model = _flagship_model(d_model=16, ssm_size=16, blocks=2, n_layers=1,
                            d_io=33, training=True, scan_mode="blocked")
    b, l, d_io = 1, 64, 33
    x = jnp.zeros((b, l, d_io), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = create_optimizer("noBCdecay", lr=1e-3, ssm_lr=1e-3,
                          total_steps=10, warmup_steps=2)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats"))
    step = make_ndns_train_step(model, batchnorm=True)
    rng = np.random.RandomState(0)
    nm = jnp.asarray(np.abs(rng.randn(b, d_io, l)), jnp.float32)
    nph = jnp.zeros_like(nm)
    cm = nm * 0.9
    clean = jnp.asarray(rng.randn(b, (l - 1) * 128), jnp.float32)
    key = jax.random.PRNGKey(1)

    def fn(st, k, a, ph, c, cl):
        return step(st, k, a, ph, c, cl)

    s1, m1 = jax.jit(fn)(state, key, nm, nph, cm, clean)
    s2, m2 = relay_jit(fn, state, key, nm, nph, cm, clean)(
        state, key, nm, nph, cm, clean)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
