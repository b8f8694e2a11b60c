"""Collective-communication accounting for sharded executables.

Parses the compiled (post-SPMD-partitioning) HLO of a jitted function and
sums the bytes moved by each collective kind — the measurement behind the
scaling-efficiency model (BASELINE.md: >=90% efficiency from 1 to 2
hosts). Host-side only: nothing executes.

No reference equivalent (the reference is single-device, SURVEY.md §2.2);
this is the greenfield accounting obligation from VERDICT round-1 item 7:
verify that the SP engine moves O(P) bytes per layer (carry exchange) and
the TP engine O(T·H) (one psum per layer), not something accidentally
proportional to full activations.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

#: HLO opcodes that move data across devices.
COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all", "collective-broadcast")

# e.g. "  %x = (f32[2,8,16]{2,1,0}, f32[...]) all-reduce(...)" or
# "  y = f32[16,8]{1,0} collective-permute(...)"
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|f8e4m3fn|f8e5m2|s64|u64|s32|u32"
                       r"|s16|u16|s8|u8|pred)\[([0-9,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes_from_hlo(hlo_text: str) -> Dict[str, Any]:
    """Sum output bytes per collective kind in an HLO module dump."""
    out = {op: 0 for op in COLLECTIVE_OPS}
    counts = {op: 0 for op in COLLECTIVE_OPS}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        for op in COLLECTIVE_OPS:
            # match the opcode position: "<result shape> op-name(", also
            # covering "op-name-start(" (async collectives); skip the
            # corresponding -done ops so nothing is double-counted
            if re.search(rf"\s{op}(-start)?\(", stripped) and \
                    f"{op}-done" not in stripped:
                lhs = stripped.split(f" {op}")[0]
                out[op] += _shape_bytes(lhs)
                counts[op] += 1
    total = sum(out.values())
    return {"per_op_bytes": {k: v for k, v in out.items() if v},
            "per_op_counts": {k: v for k, v in counts.items() if v},
            "total_bytes": total}


def collective_bytes(jitted, *args, **kw) -> Dict[str, Any]:
    """Compile ``jitted(*args)`` and account its collective traffic."""
    compiled = jitted.lower(*args, **kw).compile()
    return collective_bytes_from_hlo(compiled.as_text())


def scaling_efficiency_model(compute_bytes: float, collective_total: float,
                             hbm_gbps: float = 819.0,
                             ici_gbps: float = 180.0,
                             dcn_gbps: float = 25.0,
                             over: str = "ici") -> Dict[str, float]:
    """First-order scaling-efficiency estimate: per-chip step time is
    compute (HBM-bound) + exposed collective time over the given fabric.
    Efficiency = t_compute / (t_compute + t_comm) — the fraction of ideal
    linear scaling retained (assumes zero overlap: a lower bound)."""
    speed = {"ici": ici_gbps, "dcn": dcn_gbps}[over] * 1e9
    t_compute = compute_bytes / (hbm_gbps * 1e9)
    t_comm = collective_total / speed
    eff = t_compute / (t_compute + t_comm) if t_compute > 0 else 0.0
    return {"t_compute_s": t_compute, "t_comm_s": t_comm,
            "efficiency": eff}
