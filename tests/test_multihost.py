"""Two-process jax.distributed test — the multi-host runtime path
(SURVEY.md §5: 'multi-host tests on CPU meshes via jax.distributed').

Spawns 2 real processes with 4 virtual CPU devices each, builds a global
8-device mesh, and runs a data-parallel NDNS train step with per-host
input shards (jax.make_array_from_process_local_data)."""

import os
import socket
import subprocess
import sys

import pytest

# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["REPO_ROOT"])
sys.path.insert(0, os.path.join(os.environ["REPO_ROOT"], "tests"))
from sparsernns_tpu.parallel.mesh import MeshConfig, make_mesh
from test_train import make_state, tiny_ndns_model
from sparsernns_tpu.train.steps import make_ndns_train_step

mesh = make_mesh(MeshConfig(data=8, model=1, seq=1))

model = tiny_ndns_model(d_io=33)
rng = np.random.RandomState(0)
global_batch = 8
x = jnp.asarray(rng.randn(global_batch, 16, 33), jnp.float32)
state = make_state(model, x)

noisy_mag_h = np.abs(rng.randn(global_batch, 33, 16)).astype(np.float32)
clean_h = rng.randn(global_batch, 15 * 128).astype(np.float32)

sharding = NamedSharding(mesh, P("data"))
def globalize(arr):
    local = arr[proc_id * (global_batch // 2):(proc_id + 1) * (global_batch // 2)]
    return jax.make_array_from_process_local_data(sharding, local, arr.shape)

noisy_mag = globalize(noisy_mag_h)
noisy_phase = jnp.zeros_like(noisy_mag)
clean = globalize(clean_h)
clean_mag = noisy_mag * 0.9

step = make_ndns_train_step(model, batchnorm=True)
new_state, metrics = step(state, jax.random.PRNGKey(0), noisy_mag,
                          noisy_phase, clean_mag, clean)
loss = float(metrics["loss"])
assert np.isfinite(loss)
print(f"MULTIHOST_OK proc={proc_id} loss={loss:.5f}", flush=True)

# --- multi-host async checkpoint save + restore (reference
# restore-resume protocol train.py:209-341, here across 2 processes —
# VERDICT round-1 item 8) ---
from sparsernns_tpu.train.checkpoint import CheckpointManager
mngr = CheckpointManager(os.environ["CKPT_DIR"])
mngr.save(0, new_state, metadata={"loss": loss, "next_epoch": 1},
          metrics={"val_quality": float(loss)})
mngr.wait()

# the abstract restore target must carry GLOBAL shardings (a plain
# make_state would be process-local and the restored arrays could not
# interoperate with mesh-global ones)
from sparsernns_tpu.parallel.sharding import shard_train_state
fresh = shard_train_state(make_state(model, x), mesh)
restored, meta = mngr.restore(fresh)
mngr.close()
assert meta is not None and meta.get("next_epoch") == 1, meta
for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                jax.tree_util.tree_leaves(new_state.params)):
    diff = float(jnp.max(jnp.abs(a - b)))
    assert diff == 0.0, diff
assert int(restored.step) == int(new_state.step)
print(f"MULTIHOST_CKPT_OK proc={proc_id}", flush=True)
"""


def test_two_process_data_parallel_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["REPO_ROOT"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["CKPT_DIR"] = str(tmp_path / "ckpt")
    env.pop("JAX_PLATFORMS", None)

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out
        assert "MULTIHOST_CKPT_OK" in out
    # both processes computed the same global loss
    losses = [line.split("loss=")[1] for out in outs
              for line in out.splitlines() if "MULTIHOST_OK" in line]
    assert len(set(losses)) == 1, losses
