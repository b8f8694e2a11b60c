"""2-host readiness kit (VERDICT r2 #9): the FULL flagship config —
fused-kernel NDNS train steps at B=8, L=3751, d_model=192, ssm_size=256,
3 layers — must run end to end on a real 2-process jax.distributed mesh
(4 virtual CPU devices per process), identical global loss on both
hosts, plus the DP serving forward. A future pod slice runs the same
code path with zero edits: `python bench_scaling.py --dryrun-2host`."""

import sys
import pytest
# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


def test_flagship_2host_dryrun():
    sys.path.insert(0, ".")
    from bench_scaling import dryrun_2host
    assert dryrun_2host(timeout_s=900) == 0
