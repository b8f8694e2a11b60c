"""Benchmark: NDNS S5 inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Benchmarks the flagship NDNS model (recipes/ndns.json: d_model=192, P=128
conj-sym, 3 layers, L=3751) forward pass under each scan backend:

  associative — XLA lax.associative_scan, the reference's own execution
                strategy (ssm.py:127) run through our natively-batched
                model: this is the "reference on TPU" baseline
  pallas      — our single-pass VMEM scan kernel
  fused       — B-proj + scan + C-proj in one Pallas kernel

value = frames/sec/chip of the best backend. vs_baseline = best vs the
associative (reference-style) backend measured in the same run, unless
BASELINE.json provides a recorded absolute number.
"""

from __future__ import annotations

import contextlib
import json
import signal
import sys
import time

import jax
import jax.numpy as jnp

BENCH_MODE_TIMEOUT_S = 900


class _BenchTimeout(Exception):
    pass


@contextlib.contextmanager
def _alarm(seconds: int):
    """Per-mode watchdog so one hung compile can't swallow the bench."""

    def handler(signum, frame):
        raise _BenchTimeout(f"exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def bench_mode(mode: str, batch=8, seq_len=3751, d_io=257, iters=10):
    from __graft_entry__ import _flagship_model
    model = _flagship_model(training=False, scan_mode=mode)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x)

    fwd(variables, x).block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    out.block_until_ready()
    elapsed = time.perf_counter() - start
    return batch * seq_len * iters / elapsed


def bench_w8a16_engine(batch=8, seq_len=3751, d_io=257, iters=10):
    """The north-star config: w8a16 quantized serving engine
    (int8-valued weights, bf16 activations, fused Pallas mixer)."""
    import numpy as np

    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.fxp.derive import FxpModelConfig
    from sparsernns_tpu.quantize.config import quantization_recipes
    from sparsernns_tpu.quantize.engine import W8A16Engine

    model = _flagship_model(training=False)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    # Engine packing reads weights on the HOST — build the parameter tree
    # with numpy from eval_shape (no device round-trips; some TPU transports
    # cannot read back).
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(0)
    # positive values keep BN var / timescales well-defined; sign is
    # irrelevant for throughput
    variables = jax.tree_util.tree_map(
        lambda s: (0.1 * np.abs(rng.randn(*s.shape)) + 0.01
                   ).astype(s.dtype), shapes)
    cfg = quantization_recipes["w8a16"](static_quant=True, calibrating=False)
    model_cfg = FxpModelConfig.infer(
        variables["params"], glu_variant="half1", relufication=False,
        prenorm=True, clip_eigs=True)
    engine = W8A16Engine(variables["params"], variables.get("batch_stats"),
                         cfg, model_cfg)
    engine(x).block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        out = engine(x)
    out.block_until_ready()
    elapsed = time.perf_counter() - start
    return batch * seq_len * iters / elapsed


def bench_train_step(batch=8, seq_len=3751, d_io=257, iters=5,
                     scan_mode="fused"):
    """Training-step throughput (forward + backward through the custom-VJP
    fused kernel + optimizer update)."""
    import numpy as np

    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.train.optim import create_optimizer
    from sparsernns_tpu.train.state import TrainState
    from sparsernns_tpu.train.steps import make_ndns_train_step

    model = _flagship_model(training=True, scan_mode=scan_mode)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = create_optimizer("noBCdecay", lr=1e-3, ssm_lr=1e-3,
                          total_steps=1000, warmup_steps=10)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"))
    step = make_ndns_train_step(model, batchnorm=True)

    rng = np.random.RandomState(0)
    noisy_mag = jnp.asarray(np.abs(rng.randn(batch, d_io, seq_len)),
                            jnp.float32)
    noisy_phase = jnp.zeros_like(noisy_mag)
    clean_mag = noisy_mag * 0.9
    clean = jnp.asarray(rng.randn(batch, (seq_len - 1) * 128), jnp.float32)
    key = jax.random.PRNGKey(1)

    state, _ = step(state, key, noisy_mag, noisy_phase, clean_mag, clean)
    jax.block_until_ready(state.params)
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, key, noisy_mag, noisy_phase,
                              clean_mag, clean)
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - start
    return batch * seq_len * iters / elapsed


def main():
    results = {}
    for mode in ("associative", "pallas", "fused"):
        try:
            with _alarm(BENCH_MODE_TIMEOUT_S):
                results[mode] = bench_mode(mode)
            print(f"[bench] {mode}: {results[mode]:,.0f} frames/s",
                  file=sys.stderr)
        except Exception as e:  # keep the bench robust per-mode
            print(f"[bench] {mode} failed: {e}", file=sys.stderr)
    try:
        with _alarm(BENCH_MODE_TIMEOUT_S):
            results["w8a16-engine"] = bench_w8a16_engine()
        print(f"[bench] w8a16-engine: {results['w8a16-engine']:,.0f} "
              "frames/s", file=sys.stderr)
    except Exception as e:
        print(f"[bench] w8a16-engine failed: {e}", file=sys.stderr)
    try:
        with _alarm(BENCH_MODE_TIMEOUT_S):
            train_fps = bench_train_step()
        print(f"[bench] train-step (fused VJP): {train_fps:,.0f} "
              "frames/s", file=sys.stderr)
    except Exception as e:
        print(f"[bench] train-step failed: {e}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "ndns_s5_frames_per_sec_per_chip",
                          "value": 0.0, "unit": "frames/s",
                          "vs_baseline": 0.0}))
        return 1

    best_mode = max(results, key=results.get)
    best = results[best_mode]

    baseline = results.get("associative")
    try:
        with open("BASELINE.json") as f:
            recorded = json.load(f).get("measured_frames_per_sec")
            if recorded:
                baseline = recorded
    except Exception:
        pass
    vs_baseline = best / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "ndns_s5_frames_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
