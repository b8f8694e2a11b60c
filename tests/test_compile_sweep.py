"""tools/compile_sweep.py must keep building/compiling — it is the
round's real-chip Mosaic gate (PERF.md compile-sweep table), so a broken
entry builder would silently drop that coverage. CPU compiles the same
programs in interpret mode (fast)."""

import sys

import jax
import pytest
# end-to-end / multi-process / compile-heavy module: excluded from the
# fast local path (`pytest -m "not slow"`) — VERDICT r4 #9
pytestmark = pytest.mark.slow


def test_quick_entries_compile_on_cpu():
    sys.path.insert(0, ".")
    from tools.compile_sweep import sweep_entries

    entries = sweep_entries(quick=True)
    names = [n for n, _ in entries]
    assert "fused-train-step L=3751" in names
    assert any("network-mxu16" in n for n in names)
    for name, build in entries:
        fn, args = build()
        jax.jit(fn).lower(*args).compile()


def test_ds2_entry_resolves_planewise():
    """The dim_scale=2 entry must really exercise the lifted K cap:
    2P=512 with mxu16 state serving enabled."""
    sys.path.insert(0, ".")
    from tools.compile_sweep import sweep_entries

    (name, build), = [e for e in sweep_entries(quick=False)
                      if "ds2" in e[0]]
    fn, (weights, x) = build()
    assert x.shape[-1] == 257
    jax.jit(fn).lower(weights, x).compile()
