"""Multi-chip scaling-efficiency benchmark (BASELINE.md north star:
≥90% efficiency 1 host -> 2 hosts for continuous-batched streaming audio).

Runs the flagship forward data-parallel over 1, 2, 4, ... of the available
devices (per-device batch held constant — weak scaling of a continuous
batch) and reports throughput + efficiency. Single-chip environments just
print the 1-device row; run under a pod slice (and with
jax.distributed across hosts) for the real numbers.

Usage: python bench_scaling.py [per_device_batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

# CPU runs (JAX_PLATFORMS=cpu) get an 8-device virtual mesh so the
# collective accounting below has real shards to compile against (jax may
# be pre-imported by a sitecustomize hook: append the flag AND set the
# platform through jax.config, as tests/conftest.py does).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main(per_device_batch: int = 4, seq_len: int = 3751, d_io: int = 257):
    from __graft_entry__ import _flagship_model
    from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh

    # Timing-trust canary (bench.py): on a backend with an unbounded
    # dispatch queue + no-op sync, per-device wall-clocks are backlog
    # artifacts and the efficiency RATIO is meaningless noise.
    timeable = True
    if jax.default_backend() == "tpu":
        import bench
        from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                    timing_trust_canary)
        try:
            # plain canary only: this bench never uses saturated-queue
            # timings, so the ballast variant would be wasted work
            with bench._alarm(bench.BENCH_MODE_TIMEOUT_S):
                timeable, t_iter, floor = timing_trust_canary(
                    chip_peaks()[0])
                if not timeable:
                    print(f"[scaling] canary: steady {t_iter*1e3:.2f} ms "
                          f"vs floor {floor*1e3:.2f} ms — wall-clock "
                          "untrusted", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"[scaling] canary failed ({e}); keeping wall-clock",
                  file=sys.stderr)

    n_total = len(jax.devices())
    model = _flagship_model(training=False, scan_mode="fused")

    results = {}
    n = 1
    while timeable and n <= n_total:
        devices = jax.devices()[:n]
        mesh = make_mesh(MeshConfig(data=n, model=1, seq=1),
                         devices=devices)
        batch = per_device_batch * n
        x = jax.device_put(
            jnp.zeros((batch, seq_len, d_io), jnp.float32),
            NamedSharding(mesh, P("data")))
        variables = model.init(jax.random.PRNGKey(0), x)

        fwd = jax.jit(lambda v, x: model.apply(v, x))
        fwd(variables, x).block_until_ready()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, x)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        fps = batch * seq_len * iters / dt
        results[n] = fps
        eff = fps / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(f"[scaling] {n} device(s): {fps:,.0f} frames/s "
              f"(efficiency {eff:.1%})", file=sys.stderr)
        n *= 2

    # --- model-based 2-host efficiency prediction from the compiled
    # collective traffic (parallel/comms.py): works without pod hardware
    # and bounds the measured number from below (assumes zero overlap).
    predicted = None
    try:
        from sparsernns_tpu.parallel.comms import (collective_bytes,
                                                   scaling_efficiency_model)
        from sparsernns_tpu.utils.profiling import compiled_cost
        if n_total >= 2:
            n = min(2, n_total)
            devices = jax.devices()[:n]
            mesh = make_mesh(MeshConfig(data=n, model=1, seq=1),
                             devices=devices)
            batch = per_device_batch * n
            x = jax.device_put(
                jnp.zeros((batch, seq_len, d_io), jnp.float32),
                NamedSharding(mesh, P("data")))
            variables = model.init(jax.random.PRNGKey(0), x)
            fwd = jax.jit(lambda v, xi: model.apply(v, xi))
            acct = collective_bytes(fwd, variables, x)
            _, total_bytes = compiled_cost(
                lambda v, xi: model.apply(v, xi), variables, x)
            eff = scaling_efficiency_model(
                compute_bytes=total_bytes / n,
                collective_total=acct["total_bytes"] / max(1, n),
                over="dcn")
            predicted = {
                "collective_bytes_per_chip": acct["total_bytes"] / n,
                "per_op": acct["per_op_bytes"],
                "predicted_2host_efficiency": round(eff["efficiency"], 4),
            }
            print(f"[scaling] comms-model 2-host prediction: "
                  f"{eff['efficiency']:.1%} "
                  f"(collectives {acct['total_bytes'] / n:,.0f} B/chip)",
                  file=sys.stderr)
    except Exception as e:  # keep the bench robust
        print(f"[scaling] comms model failed: {e}", file=sys.stderr)

    if not results:
        # untimeable backend: report only the comms-model prediction,
        # clearly labelled (never a backlog artifact)
        print(json.dumps({
            "metric": "ndns_s5_scaling_efficiency",
            "value": (predicted or {}).get("predicted_2host_efficiency"),
            "unit": "fraction",
            "devices": None,
            "measurement": "comms-model(untimeable-backend)",
            "comms_model": predicted,
        }))
        return
    best_n = max(results)
    print(json.dumps({
        "metric": "ndns_s5_scaling_efficiency",
        "value": round(results[best_n] / (results[1] * best_n), 4)
        if best_n > 1 else 1.0,
        "unit": "fraction",
        "devices": best_n,
        "frames_per_sec": {str(k): round(v, 1) for k, v in results.items()},
        "comms_model": predicted,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
