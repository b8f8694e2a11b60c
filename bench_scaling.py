"""Multi-chip scaling-efficiency benchmark (BASELINE.md north star:
≥90% efficiency 1 host -> 2 hosts for continuous-batched streaming audio).

Runs the flagship forward data-parallel over 1, 2, 4, ... of the available
devices (per-device batch held constant — weak scaling of a continuous
batch) and reports throughput + efficiency. Single-chip environments just
print the 1-device row; run under a pod slice (and with
jax.distributed across hosts) for the real numbers.

Usage: python bench_scaling.py [per_device_batch]
       python bench_scaling.py --dryrun-2host

--dryrun-2host (the 2-host readiness kit, VERDICT r2 #9): spawns TWO
real jax.distributed processes (4 virtual CPU devices each), builds the
8-device global mesh, and runs the FULL flagship config end to end —
fused-kernel NDNS train steps at B=8, L=3751, d_model=192, ssm_size=256,
3 layers with per-host input shards, then the DP serving forward. A real
pod slice runs the same code with no edits (drop the env overrides).
Also run by tests/test_bench_scaling_dryrun.py.
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


_DRYRUN_WORKER = r"""
import os, sys, time
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2 and len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, os.environ["REPO_ROOT"])
from __graft_entry__ import _flagship_model
from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
from sparsernns_tpu.parallel.sharding import shard_train_state
from sparsernns_tpu.train.optim import create_optimizer
from sparsernns_tpu.train.state import TrainState
from sparsernns_tpu.train.steps import make_ndns_train_step

B, L, F = 8, 3751, 257   # flagship geometry (recipes/ndns.json)
mesh = make_mesh(MeshConfig(data=8, model=1, seq=1))
model = _flagship_model(training=True, scan_mode="fused")
rng = np.random.RandomState(0)
x_init = jnp.zeros((2, 64, F), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), x_init)
tx = create_optimizer("noBCdecay", lr=1e-3, ssm_lr=1e-3,
                      total_steps=10, warmup_steps=1)
state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                          tx=tx, batch_stats=variables.get("batch_stats"))
state = shard_train_state(state, mesh)

sharding = NamedSharding(mesh, P("data"))
def globalize(arr):
    local = arr[proc_id * (B // 2):(proc_id + 1) * (B // 2)]
    return jax.make_array_from_process_local_data(sharding, local, arr.shape)

noisy_mag = globalize(np.abs(rng.randn(B, F, L)).astype(np.float32))
noisy_phase = jnp.zeros_like(noisy_mag)
clean_mag = noisy_mag * 0.9
clean = globalize(rng.randn(B, (L - 1) * 128).astype(np.float32))

step = make_ndns_train_step(model, batchnorm=True)
losses = []
for i in range(2):
    state, metrics = step(state, jax.random.PRNGKey(i), noisy_mag,
                          noisy_phase, clean_mag, clean)
    losses.append(float(metrics["loss"]))
assert all(np.isfinite(l) for l in losses), losses
print(f"DRYRUN2HOST_TRAIN_OK proc={proc_id} losses="
      f"{losses[0]:.5f},{losses[1]:.5f}", flush=True)

# DP serving forward at flagship dims on the same global mesh
eval_model = _flagship_model(training=False, scan_mode="fused")
x_eval = globalize(rng.randn(B, L, F).astype(np.float32))
y = jax.jit(lambda v, xi: eval_model.apply(v, xi))(
    {"params": state.params, "batch_stats": state.batch_stats}, x_eval)
assert y.shape == (B, L, F)
print(f"DRYRUN2HOST_SERVE_OK proc={proc_id}", flush=True)
"""


def dryrun_2host(timeout_s: int = 900) -> int:
    """Spawn the 2-process flagship dryrun; returns 0 on success."""
    import socket
    import subprocess
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["REPO_ROOT"] = os.path.dirname(os.path.abspath(__file__))
    env.pop("JAX_PLATFORMS", None)
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "worker.py")
        with open(script, "w") as f:
            f.write(_DRYRUN_WORKER)
        procs = [subprocess.Popen(
            [sys.executable, script, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True) for i in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                print("[scaling] dryrun-2host TIMEOUT", file=sys.stderr)
                return 1
            outs.append(out)
    ok = all(p.returncode == 0 for p in procs) and all(
        "DRYRUN2HOST_TRAIN_OK" in o and "DRYRUN2HOST_SERVE_OK" in o
        for o in outs)
    losses = [line.split("losses=")[1] for o in outs
              for line in o.splitlines() if "DRYRUN2HOST_TRAIN_OK" in line]
    ok = ok and len(set(losses)) == 1  # identical global loss on both hosts
    for i, o in enumerate(outs):
        if not ok:
            print(f"[scaling] proc {i} output:\n{o[-3000:]}",
                  file=sys.stderr)
    print(json.dumps({
        "metric": "flagship_2host_dryrun",
        "value": 1 if ok else 0,
        "unit": "ok",
        "geometry": {"batch": 8, "seq_len": 3751, "d_model": 192,
                     "ssm_size": 256, "n_layers": 3},
        "losses": losses[:1],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    if "--dryrun-2host" in sys.argv:
        sys.exit(dryrun_2host())
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
