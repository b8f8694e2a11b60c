"""Flagship-geometry compile sweep on the real chip (VERDICT r2 #6).

Mosaic lowering constraints only surface on real hardware (CPU tests run
the kernels in interpret mode), and tail geometry is where they bite:
the flagship sequence length L=3751 is odd, so every block_t choice
leaves a remainder block. This sweep compiles (and dispatches, where
safe on a no-readback backend) each major config path at B=8, L=3751,
d_model=192, ssm_size=256, 3 layers — the recipes/ndns.json shapes.

Run:  python tools/compile_sweep.py [--quick]
Prints one PASS/FAIL line per config plus compile seconds; exits
non-zero if any config fails. No device-to-host readback is performed
(works on the tunnel backend).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, L, D_IO = 8, 3751, 257


def _flagship(training, scan_mode, q_config=None, dim_scale=1):
    from __graft_entry__ import _flagship_model
    return _flagship_model(training=training, scan_mode=scan_mode,
                           q_config=q_config,
                           d_model=192 * dim_scale,
                           ssm_size=256 * dim_scale)


def _synthetic_static_params(q_config, dim_scale=1):
    """Host-numpy parameter tree for the static-quant flagship model —
    eval_shape init (no device compute), positive synthetic values so
    quant scales exist everywhere the engine looks."""
    model = _flagship(training=False, scan_mode="associative",
                      q_config=q_config, dim_scale=dim_scale)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, D_IO), jnp.float32))
    rng = np.random.RandomState(0)

    def fill(s):
        return (0.05 * np.abs(rng.randn(*s.shape)) + 2.0 ** -6).astype(
            s.dtype)

    return jax.tree_util.tree_map(fill, shapes)


def sweep_entries(quick: bool = False):
    from sparsernns_tpu.fxp.derive import FxpModelConfig
    from sparsernns_tpu.quantize.config import quantization_recipes
    from sparsernns_tpu.quantize.engine import W8A16Engine

    x_fwd = jnp.zeros((B, L, D_IO), jnp.float32)

    def model_forward(scan_mode, training):
        model = _flagship(training=training, scan_mode=scan_mode)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                   jnp.zeros((2, 16, D_IO), jnp.float32))
        rng = np.random.RandomState(0)
        variables = jax.tree_util.tree_map(
            lambda s: (0.05 * np.abs(rng.randn(*s.shape)) + 0.01).astype(
                s.dtype), variables)

        if training:
            def fn(params, x):
                y, _ = model.apply(
                    {"params": params,
                     **{k: v for k, v in variables.items()
                        if k != "params"}}, x,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                return y
        else:
            def fn(params, x):
                return model.apply(
                    {"params": params,
                     **{k: v for k, v in variables.items()
                        if k != "params"}}, x)
        return fn, (variables["params"], x_fwd)

    def fused_fwd():
        return model_forward("fused", training=False)

    def train_step(scan_mode="fused"):
        """FULL NDNS train step (loss + backward + optimizer) through the
        given scan backend at flagship geometry. ``fused`` = the Pallas
        whole-layer kernels; ``blocked`` = the pure-XLA matmul scan the
        conformance-limited tunnel can execute (bench train-step-xla)."""
        from sparsernns_tpu.train.optim import create_optimizer
        from sparsernns_tpu.train.state import TrainState
        from sparsernns_tpu.train.steps import make_ndns_train_step

        model = _flagship(training=True, scan_mode=scan_mode)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                   jnp.zeros((2, 16, D_IO), jnp.float32))
        rng = np.random.RandomState(0)
        variables = jax.tree_util.tree_map(
            lambda s: (0.05 * np.abs(rng.randn(*s.shape)) + 0.01).astype(
                s.dtype), variables)
        tx = create_optimizer("noBCdecay", lr=1e-3, ssm_lr=1e-3,
                              total_steps=100, warmup_steps=10)
        state = TrainState.create(apply_fn=model.apply,
                                  params=variables["params"], tx=tx,
                                  batch_stats=variables.get("batch_stats"))
        step = make_ndns_train_step(model, batchnorm=True)
        noisy_mag = jnp.zeros((B, D_IO, L), jnp.float32)
        clean = jnp.zeros((B, (L - 1) * 128), jnp.float32)

        def fn(state, noisy_mag, clean):
            return step(state, jax.random.PRNGKey(1), noisy_mag,
                        noisy_mag, noisy_mag, clean)

        return fn, (state, noisy_mag, clean)

    def engine(route, mxu16, dim_scale=1, engine_route="auto"):
        q_cfg = quantization_recipes["w8a16"](static_quant=True,
                                              calibrating=False)
        params = _synthetic_static_params(q_cfg, dim_scale)["params"]
        mcfg = FxpModelConfig.infer(params, glu_variant="half1",
                                    relufication=False, prenorm=True,
                                    clip_eigs=True)
        eng = W8A16Engine(params, None, q_cfg, mcfg,
                          act_dtype=jnp.bfloat16, block_t=256,
                          mxu16=mxu16, route=engine_route)
        if route == "network":
            assert eng._network_ok, "network route ineligible"
        elif route == "stack":
            eng._network_ok = False
            assert eng._stack_ok, "stack route ineligible"
        elif route == "per-op":
            eng._network_ok = eng._stack_ok = False
        if mxu16:
            assert eng.mxu16["mixer"] and eng.mxu16["state"], eng.mxu16

        def fn(weights, x):
            return eng._apply(weights, x, block_t=eng.block_t)

        return fn, (eng.weights, x_fwd)

    def engine_bf16io():
        fn, (weights, xi) = engine("network", True)
        return fn, (weights, xi.astype(jnp.bfloat16))

    def engine_chunk():
        q_cfg = quantization_recipes["w8a16"](static_quant=True,
                                              calibrating=False)
        params = _synthetic_static_params(q_cfg)["params"]
        mcfg = FxpModelConfig.infer(params, glu_variant="half1",
                                    relufication=False, prenorm=True,
                                    clip_eigs=True)
        eng = W8A16Engine(params, None, q_cfg, mcfg,
                          act_dtype=jnp.bfloat16, block_t=256, mxu16=True)
        carries = eng.init_stream_state(B)
        x_chunk = jnp.zeros((B, 256, D_IO), jnp.float32)

        def fn(weights, x, carries):
            return eng._apply_chunk(weights, x, carries,
                                    block_t=eng.block_t)

        return fn, (eng.weights, x_chunk, carries)

    entries = [
        ("fused-forward L=3751", fused_fwd),
        ("fused-train-step L=3751", train_step),
        ("engine-network L=3751", lambda: engine("network", False)),
        ("engine-network-mxu16 L=3751", lambda: engine("network", True)),
        # the conformance-safe paths the round-3 tunnel can execute
        # (bench modes w8a16-engine-xla / train-step-xla)
        ("engine-xla-route L=3751",
         lambda: engine(None, False, engine_route="xla")),
        ("blocked-train-step L=3751", lambda: train_step("blocked")),
    ]
    if not quick:
        entries += [
            ("blocked-forward L=3751",
             lambda: model_forward("blocked", training=False)),
            # dim_scale=2: 2P=512 > the single-int32 budget, so the
            # B/C int dots lower through intdot's PLANE-WISE path —
            # the Mosaic compile check for the lifted K cap
            ("engine-mxu16-ds2 (2P=512) L=3751",
             lambda: engine(None, True, dim_scale=2)),
            ("engine-stack-mxu16 L=3751", lambda: engine("stack", True)),
        # bf16 serving io: bf16 input read + bf16 mask write
        ("engine-mxu16-bf16io L=3751", engine_bf16io),
            ("engine-per-op L=3751", lambda: engine("per-op", False)),
            ("engine-chunk-mxu16 B=8", engine_chunk),
            ("associative-forward L=3751",
             lambda: model_forward("associative", training=False)),
            ("pallas-forward L=3751",
             lambda: model_forward("pallas", training=False)),
        ]
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="substring filter on config names")
    args = ap.parse_args()

    failures = 0
    for name, build in sweep_entries(args.quick):
        if args.only and args.only not in name:
            continue
        t0 = time.perf_counter()
        try:
            fn, fargs = build()
            jax.jit(fn).lower(*fargs).compile()
            dt = time.perf_counter() - t0
            print(f"[sweep] PASS {name}  ({dt:.1f}s)", flush=True)
        except Exception:
            dt = time.perf_counter() - t0
            failures += 1
            print(f"[sweep] FAIL {name}  ({dt:.1f}s)", flush=True)
            traceback.print_exc()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
