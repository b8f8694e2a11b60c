"""Benchmark: NDNS S5 inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: audio STFT frames/sec/chip for the flagship NDNS model
(d_model=192, P=128 conj-sym, 3 layers — recipes/ndns.json) at the
reference quantization target (w8a16 semantics; fp32/QAT numerics on the
float path until the Pallas int kernels land). The baseline value in
BASELINE.json is the measurement protocol (the reference publishes no
numbers — BASELINE.md); vs_baseline compares against a recorded reference
of this same benchmark from round 0 if present, else 1.0.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _flagship_model

    batch, seq_len, d_io = 8, 3751, 257
    model = _flagship_model(training=False)
    x = jnp.zeros((batch, seq_len, d_io), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x)

    # compile
    fwd(variables, x).block_until_ready()

    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, x)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    frames_per_sec = batch * seq_len * n_iters / elapsed

    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("measured_frames_per_sec")
    except Exception:
        pass
    vs_baseline = frames_per_sec / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "ndns_s5_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
