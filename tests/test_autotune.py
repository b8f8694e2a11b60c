"""block_t autotuner: timing-source selection, speed-of-light gating,
and best-candidate choice (ROADMAP round-3 item 2).

The measurement machinery mirrors bench.py's hardware-honesty rules;
here we exercise the in-process wall-clock path on CPU (interpret-mode
kernels) and the pure selection logic.
"""

import pytest

from sparsernns_tpu.utils import autotune


def _rec(block_t, t, valid=True, source="wall-clock"):
    return {"mode": "fused", "block_t": block_t, "t_iter_s": t,
            "n_timings": 3, "source": source, "xla_bytes": 1e6,
            "sol_t_s": 1e-5, "hbm_util": 0.5, "valid": valid}


def test_pick_best_prefers_fastest_valid():
    best = autotune.pick_best([
        _rec(128, 2e-3),
        _rec(256, 1e-3),
        _rec(512, 0.5e-3, valid=False),   # impossible timing: excluded
    ])
    assert best["block_t"] == 256


def test_pick_best_tie_goes_to_smaller_block():
    best = autotune.pick_best([_rec(512, 1e-3), _rec(128, 1e-3)])
    assert best["block_t"] == 128


def test_pick_best_none_when_nothing_valid():
    assert autotune.pick_best([_rec(128, 1e-6, valid=False)]) is None
    assert autotune.pick_best([]) is None


@pytest.mark.parametrize("mode", ["scan", "fused"])
def test_measure_candidate_cpu_wallclock(mode):
    rec = autotune.measure_candidate(mode, 32, b=2, l=48, h=8, p=4,
                                     iters=2, use_profiler=False)
    assert rec["source"] == "wall-clock"
    assert rec["t_iter_s"] > 0
    assert rec["xla_bytes"] > 0
    # CPU interpret-mode timings are far ABOVE the TPU HBM floor
    assert rec["valid"]


def test_block_t_invariance():
    """block_t is a pure performance knob: fused/scan outputs must be
    bit-stable across block sizes (the autotuner may pick any)."""
    import jax.numpy as jnp
    import numpy as np

    from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply
    from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan

    rng = np.random.RandomState(0)
    b, l, h, p = 2, 48, 8, 4
    lam = (jnp.asarray(rng.uniform(0.7, 0.99, p), jnp.float32),
           jnp.asarray(rng.uniform(0.0, 0.2, p), jnp.float32))
    u = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    w_b = jnp.asarray(rng.randn(h, 2 * p), jnp.float32)
    w_c = jnp.asarray(rng.randn(2 * p, h), jnp.float32)
    d = jnp.asarray(rng.randn(h), jnp.float32)
    y16 = fused_s5_apply(u, lam, w_b, w_c, d, block_t=16)
    y48 = fused_s5_apply(u, lam, w_b, w_c, d, block_t=48)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y48),
                               rtol=2e-5, atol=2e-5)

    bu = (jnp.asarray(rng.randn(b, l, p), jnp.float32),
          jnp.asarray(rng.randn(b, l, p), jnp.float32))
    x16 = pallas_diag_scan(lam, bu, block_t=16)
    x48 = pallas_diag_scan(lam, bu, block_t=48)
    np.testing.assert_allclose(np.asarray(x16[0]), np.asarray(x48[0]),
                               rtol=2e-5, atol=2e-5)


def test_block_t_flows_from_config():
    """RunConfig.block_t reaches the S5SSM modules built by build_model."""
    from sparsernns_tpu.train.loop import build_model
    from sparsernns_tpu.utils.config import RunConfig

    cfg = RunConfig(dataset="ndns", scan_mode="fused", block_t=128,
                    d_model=8, ssm_size_base=8, blocks=2, n_layers=1)
    model = build_model(cfg, d_input=4, d_output=4, training=False)
    assert model.mixer_cls.keywords["block_t"] == 128


def test_autotune_inprocess_sweep():
    res = autotune.autotune_block_t(mode="scan", candidates=(16, 32),
                                    b=2, l=48, h=8, p=4, iters=2,
                                    isolate=False)
    assert len(res["records"]) == 2
    assert res["best"] is not None
    assert res["best"]["block_t"] in (16, 32)


class TestAutotuneCache:
    """Persisted autotune cache consulted at kernel-build time
    (VERDICT r4 #5)."""

    def _write(self, tmp_path, monkeypatch, table):
        import json
        path = tmp_path / "autotune.json"
        path.write_text(json.dumps(table))
        monkeypatch.setenv("SPARSERNNS_AUTOTUNE_CACHE", str(path))
        return str(path)

    def test_lookup_priority(self, tmp_path, monkeypatch):
        from sparsernns_tpu.utils.autotune_cache import resolve_block_t
        self._write(tmp_path, monkeypatch, {
            "scan:b8:l3751:p128": {"block_t": 1024},
            "scan:l3751:p128": {"block_t": 768},
            "scan:any": {"block_t": 64},
        })
        assert resolve_block_t("scan", b=8, l=3751, p=128,
                               default=256) == 1024
        assert resolve_block_t("scan", b=32, l=3751, p=128,
                               default=256) == 768   # batch-free fallback
        assert resolve_block_t("scan", b=1, l=99, p=4,
                               default=256) == 64    # mode-wide fallback
        assert resolve_block_t("layer", l=99, p=4,
                               default=512) == 512   # hand-set default

    def test_record_best_merges(self, tmp_path, monkeypatch):
        from sparsernns_tpu.utils.autotune_cache import (record_best,
                                                         resolve_block_t)
        self._write(tmp_path, monkeypatch, {"engine:any": {"block_t": 512}})
        record_best("scan", 1024, b=8, l=3751, p=128, batch_free=True)
        assert resolve_block_t("scan", b=32, l=3751, p=128,
                               default=256) == 1024
        assert resolve_block_t("engine", default=256) == 512  # preserved

    def test_pallas_scan_consults_cache(self, tmp_path, monkeypatch):
        """block_t=None resolves through the cache — and the resolved
        tile produces the same values as any explicit one (the knob is
        performance-only)."""
        import jax.numpy as jnp
        import numpy as np

        from sparsernns_tpu.ops.pallas import scan_kernel

        b, l, p = 2, 48, 4
        self._write(tmp_path, monkeypatch,
                    {f"scan:b{b}:l{l}:p{p}": {"block_t": 16}})
        assert scan_kernel.resolve_scan_block_t((b, l, p)) == 16

        rng = np.random.RandomState(0)
        lam = (jnp.asarray(rng.uniform(0.7, 0.99, p), jnp.float32),
               jnp.asarray(rng.uniform(0.0, 0.2, p), jnp.float32))
        bu = (jnp.asarray(rng.randn(b, l, p), jnp.float32),
              jnp.asarray(rng.randn(b, l, p), jnp.float32))
        seen = {}
        orig = scan_kernel._pallas_diag_scan

        def spy(lam, bu, **kw):
            seen["block_t"] = kw.get("block_t")
            return orig(lam, bu, **kw)

        monkeypatch.setattr(scan_kernel, "_pallas_diag_scan", spy)
        x_cached = scan_kernel.pallas_diag_scan(lam, bu)   # block_t=None
        assert seen["block_t"] == 16
        x_explicit = scan_kernel.pallas_diag_scan(lam, bu, block_t=48)
        np.testing.assert_allclose(np.asarray(x_cached[0]),
                                   np.asarray(x_explicit[0]),
                                   rtol=2e-5, atol=2e-5)

    def test_engine_resolves_block_t_from_cache(self, tmp_path,
                                                monkeypatch):
        """W8A16Engine(block_t=None) consults the 'engine' cache entry
        keyed by (h, p)."""
        from sparsernns_tpu.utils.autotune_cache import resolve_block_t
        self._write(tmp_path, monkeypatch,
                    {"engine:h192:p128": {"block_t": 512},
                     "engine:any": {"block_t": 384}})
        assert resolve_block_t("engine", h=192, p=128, default=999) == 512
        assert resolve_block_t("engine", h=64, p=32, default=999) == 384

    def test_shipped_cache_pins_measured_scan_optimum(self):
        """The committed runs/autotune.json carries the round-4 measured
        scan optimum (1024 at the flagship shape) — the standalone scan
        must pick it up by default (VERDICT r4 #5 'Done' criterion)."""
        import os

        from sparsernns_tpu.ops.pallas import scan_kernel
        if not os.path.exists(
                os.path.join(os.path.dirname(__file__), "..", "runs",
                             "autotune.json")):
            import pytest
            pytest.skip("no shipped cache in this tree")
        assert scan_kernel.resolve_scan_block_t((8, 3751, 128)) == 1024
