"""Streaming serving path: SSM carry cache at the model level, and
chunked-vs-whole equivalence of the StreamingDenoiser."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.serve.streaming import StreamingDenoiser
from tests.test_train import tiny_ndns_model


def _eval_model(d_io=257):
    return tiny_ndns_model(d_io=d_io).clone(training=False)


def test_model_cache_carry_matches_full_sequence(rng):
    model = _eval_model(d_io=17)
    x = jnp.asarray(rng.randn(2, 32, 17), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    y_full = model.apply(variables, x)

    # chunked with cache threading
    y1, state = model.apply(variables, x[:, :16], mutable=["cache"])
    y2, _ = model.apply({**variables, **state}, x[:, 16:],
                        mutable=["cache"])
    y_chunked = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(y_chunked), np.asarray(y_full),
                               atol=1e-3)


def test_cache_shape_and_reset(rng):
    model = _eval_model(d_io=9)
    x = jnp.asarray(rng.randn(1, 8, 9), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, state = model.apply(variables, x, mutable=["cache"])
    carries = jax.tree_util.tree_leaves(state["cache"])
    assert carries and all(c.shape == (1, 4) for c in carries)  # P = 8//2
    assert any(float(jnp.abs(c).max()) > 0 for c in carries)


def test_streaming_denoiser_chunked_equals_whole(rng):
    model = _eval_model(d_io=257)
    t_total = 6000
    dummy_frames = (t_total - 512) // 128 + 1
    x_init = jnp.zeros((1, dummy_frames, 257), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)

    audio = rng.randn(1, t_total).astype(np.float32)

    whole = StreamingDenoiser(model, variables, batch_size=1)
    out_whole = np.concatenate(
        [whole.process(audio), whole.flush()], axis=-1)

    chunked = StreamingDenoiser(model, variables, batch_size=1)
    out_chunked = chunked.process_offline(audio, chunk_samples=1111)

    assert out_whole.shape == out_chunked.shape
    np.testing.assert_allclose(out_chunked, out_whole, atol=1e-4)


def test_streaming_emits_incrementally(rng):
    model = _eval_model(d_io=257)
    x_init = jnp.zeros((1, 5, 257), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)
    d = StreamingDenoiser(model, variables, batch_size=1)
    # less than one frame -> nothing
    out = d.process(rng.randn(1, 300).astype(np.float32))
    assert out.shape[1] == 0
    # enough for several frames -> some emission
    out = d.process(rng.randn(1, 2000).astype(np.float32))
    assert out.shape[1] > 0
