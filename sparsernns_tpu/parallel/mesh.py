"""Device mesh construction for SPMD execution.

The reference has no distributed execution at all (SURVEY.md §2.2); this is
a greenfield TPU-native layer. Axes:

  data  — data parallelism over batch (rides DCN across hosts, ICI within)
  model — tensor parallelism over the SSM state dim P / dense features
  seq   — sequence parallelism over the scan's time axis (chunked scan with
          carry exchange over ICI; see parallel/seqscan.py)

Multi-host: call `maybe_initialize_distributed()` first (no-op single
host); `make_mesh` then spans all processes' devices.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: infer (all remaining devices)
    model: int = 1
    seq: int = 1


def maybe_initialize_distributed() -> None:
    """Initialize the multi-host JAX runtime when launched under a
    multi-process coordinator (JAX_COORDINATOR_ADDRESS env)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model, seq = cfg.model, cfg.seq
    data = cfg.data if cfg.data > 0 else n // (model * seq)
    if data * model * seq != n:
        raise ValueError(
            f"mesh {data}x{model}x{seq} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, seq)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def local_data_shard_info(mesh: Mesh):
    """(num_shards, shard_index) for host-side data loading: each process
    feeds only the batch rows its local devices own along the data axis."""
    procs = jax.process_count()
    return procs, jax.process_index()
