"""Profiling helpers: jax.profiler integration + kernel cost accounting.

Reference parity: the optional per-batch trace hooks
(train_helpers.py:619/:642-650/:749-753). Extended with a roofline-style
cost model for the S5 forward so kernel timings can be judged against
speed-of-light (SURVEY.md §7 M3).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Perfetto-compatible profiler trace window."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling endpoint for tensorboard/xprof attach."""
    return jax.profiler.start_server(port)


def save_memory_profile(path: str):
    jax.profiler.save_device_memory_profile(path)


@dataclasses.dataclass
class S5Cost:
    """FLOPs / bytes for one S5 layer forward at (B, L, H, P)."""

    flops: int
    hbm_bytes_fused: int
    hbm_bytes_unfused: int

    @staticmethod
    def forward(b: int, l: int, h: int, p: int,
                dtype_bytes: int = 4) -> "S5Cost":
        bl = b * l
        proj = 2 * bl * h * (2 * p) * 2          # B and C projections (MACs*2)
        scan = bl * p * 8                        # complex mul-add per step
        d_term = bl * h * 2
        flops = proj + scan + d_term
        # fused kernel: read u, write y (+ weights once)
        io = 2 * bl * h * dtype_bytes
        weights = (h * 2 * p + 2 * p * h + h) * dtype_bytes
        fused = io + weights
        # unfused XLA: u, bu (2P), scan intermediates (~2 passes min), xs, y
        unfused = io + weights + (3 * 2 * bl * p) * dtype_bytes * 2
        return S5Cost(flops, fused, unfused)

    def speed_of_light_us(self, hbm_gbps: float = 820.0,
                          tflops: float = 98.0) -> float:
        """Lower bound runtime (us) on one chip (defaults ~ v5e fp32)."""
        t_mem = self.hbm_bytes_fused / (hbm_gbps * 1e3)
        t_flops = self.flops / (tflops * 1e6)
        return max(t_mem, t_flops)


class StepTimer:
    """Wall-clock step timer with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))
