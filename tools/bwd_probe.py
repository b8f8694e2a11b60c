"""Per-component train-step timing at B=8 vs B=32 (VERDICT r4 #3).

Round-4 measured the full-batch recipe step at 0.55 of its own HBM
cost-model bound (402 GB/s achieved at B=32 vs 679 at B=8) and blamed
"larger bwd working sets pipeline worse" without isolating WHERE. The
per-(batch,time-block) I/O of the layer kernels is batch-INDEPENDENT
(grid (B, n_t), fixed block shapes), so if the kernels themselves hold
their GB/s at B=32 the collapse lives in the XLA glue (loss path /
batch reductions / optimizer), not in fused_layer_bwd.

Components, each timed standalone through the readback-drain channel at
B in {8, 32} (flagship L=3751, H=192, P=128, glu=half1, relufied):

  tail_fwd    one whole-layer training forward kernel
  hist        the backward's carry-checkpoint pre-pass alone
  tail_bwd    the reverse-time adjoint kernel (fused_tail_bwd)
  loss        stft_mixer + SI-SNR loss value_and_grad wrt the mask
  opt         optimizer update on a flagship-sized gradient pytree

Each record: t_ms, min_bytes, achieved GB/s — the B=32/B=8 GB/s ratio
per component localizes the collapse. Appends to runs/bwd_probe.json.

Usage: python tools/bwd_probe.py [--batches 8,32] [--components ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pre-imports jax with the axon plugin registered;
    # honoring a CPU request needs the config switch BEFORE backend init
    # (tests/conftest.py rule)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import numpy as np

L, H, P, D_IO = 3751, 192, 128, 257
BLOCK_T = 512

if os.environ.get("BWD_PROBE_SMOKE"):      # tiny-geometry CI/CPU smoke
    L, H, P, D_IO, BLOCK_T = 96, 16, 8, 17, 32


def _layer_operands(b, rng):
    import jax.numpy as jnp
    x = jnp.asarray(rng.randn(b, L, H).astype(np.float32) * 0.1)
    decay = rng.uniform(0.7, 0.999, P).astype(np.float32)
    theta = rng.uniform(0.0, 0.3, P).astype(np.float32)
    lam = (jnp.asarray(decay * np.cos(theta)),
           jnp.asarray(decay * np.sin(theta)))
    w_b = jnp.asarray(rng.randn(H, 2 * P).astype(np.float32) * 0.05)
    w_c = jnp.asarray(rng.randn(2 * P, H).astype(np.float32) * 0.05)
    d = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    o2k = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.05)
    o2b = jnp.asarray(rng.randn(H).astype(np.float32) * 0.01)
    nw = jnp.asarray(1.0 + 0.05 * rng.randn(H).astype(np.float32))
    nb = jnp.asarray(0.05 * rng.randn(H).astype(np.float32))
    g = jnp.asarray(rng.randn(b, L, H).astype(np.float32) * 0.1)
    return dict(x=x, lam=lam, w_b=w_b, w_c=w_c, d=d, o2k=o2k, o2b=o2b,
                nw=nw, nb=nb, g=g)


def _build(component: str, b: int):
    import jax
    import jax.numpy as jnp

    from sparsernns_tpu.utils.profiling import min_traffic_bytes

    rng = np.random.RandomState(0)
    kw = dict(block_t=BLOCK_T, act="relu", glu="half1", relu_state=True,
              layer_relu=True)

    if component in ("tail_fwd", "tail_bwd", "hist",
                     "tail_fwd_pin", "tail_bwd_pin"):
        pinned = component.endswith("_pin")
        component = component[:-4] if pinned else component
        o = _layer_operands(b, rng)
        if component == "tail_fwd":
            from sparsernns_tpu.ops.pallas.fused_layer_train import \
                fused_layer_tail

            def bwd_probe_target(x, g):
                return fused_layer_tail(
                    x, None, o["lam"], o["w_b"], o["w_c"], o["d"],
                    o["o2k"], o["o2b"], None, None, None, None,
                    o["nw"], o["nb"], **kw)
        elif component == "tail_bwd":
            from sparsernns_tpu.ops.pallas.fused_layer_bwd import \
                fused_tail_bwd

            def bwd_probe_target(x, g):
                return fused_tail_bwd(
                    x, None, o["lam"], o["w_b"], o["w_c"], o["d"],
                    o["o2k"], o["o2b"], None, None, None, None,
                    o["nw"], o["nb"], g, **kw)
        else:
            # the pre-pass in isolation: rebuild its pallas_call the way
            # fused_tail_bwd does but stop after the history kernel —
            # measured by running the bwd with a tiny adjoint is not
            # separable, so approximate with the forward mixer only
            from sparsernns_tpu.ops.pallas.fused_s5 import fused_s5_apply

            def bwd_probe_target(x, g):
                return fused_s5_apply(x, o["lam"], o["w_b"], o["w_c"],
                                      o["d"], block_t=BLOCK_T)
        if pinned and jax.default_backend() == "tpu":
            # row-major entry pins (the serving engine's
            # _io_format_pins rule): if the batch-dependent GB/s
            # collapse is XLA flipping to a time-minor layout for the
            # big (B, L, H) operands and bracketing the Pallas calls
            # with relayout copies, pinning removes it
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding
            fmt = Format(Layout((0, 1, 2)),
                         SingleDeviceSharding(jax.devices()[0]))
            fn = jax.jit(bwd_probe_target, in_shardings=(fmt, fmt))
            o["x"] = jax.device_put(o["x"], fmt)
            o["g"] = jax.device_put(o["g"], fmt)
        else:
            fn = jax.jit(bwd_probe_target)
        mb = min_traffic_bytes(bwd_probe_target, o["x"], o["g"])

        # precompiled perturbation (bench._chained_dispatch's rule): a
        # per-iteration EAGER op chain throttles the host dispatch rate
        # below the device completion rate on a contended machine, and
        # the drain then measures the host (first run of this tool:
        # B=8 and B=32 timing identically at ~7 ms — host-bound)
        def _perturb(leaf, x):
            return x + (1e-20 * jnp.reshape(leaf, (-1,))[0]).astype(
                x.dtype)
        if pinned and jax.default_backend() == "tpu":
            perturb = jax.jit(_perturb, out_shardings=fmt)
        else:
            perturb = jax.jit(_perturb)

        def dispatch(prev):
            xi = o["x"] if prev is None else perturb(
                jax.tree_util.tree_leaves(prev)[0], o["x"])
            return fn(xi, o["g"])
        return dispatch, mb

    if component == "loss":
        # the train step's time-major loss path (steps.py convention)
        from sparsernns_tpu.train.losses import ndns_loss_from_mask_tm
        noisy_mag = jnp.asarray(
            np.abs(rng.randn(b, L, D_IO)).astype(np.float32))
        noisy_phase = jnp.zeros_like(noisy_mag)
        clean_mag = noisy_mag * 0.9
        clean = jnp.asarray(
            rng.randn(b, (L - 1) * 128).astype(np.float32))
        mask = jnp.asarray(rng.randn(b, L, D_IO).astype(np.float32) * 0.1)

        def bwd_probe_target(mask):
            def f(m):
                loss, _, _ = ndns_loss_from_mask_tm(
                    m, noisy_mag, noisy_phase, clean_mag, clean)
                return loss
            return jax.value_and_grad(f)(mask)
        fn = jax.jit(bwd_probe_target)
        mb = min_traffic_bytes(bwd_probe_target, mask)

        @jax.jit
        def perturb(leaf, x):
            return x + (1e-20 * jnp.reshape(leaf, (-1,))[0]).astype(
                x.dtype)

        def dispatch(prev):
            mi = mask if prev is None else perturb(prev[1], mask)
            return fn(mi)
        return dispatch, mb

    if component == "opt":
        import optax

        from sparsernns_tpu.train.optim import create_optimizer
        tx = create_optimizer("noBCdecay", lr=1e-4, ssm_lr=1e-4,
                              total_steps=1000, warmup_steps=10)
        params = {"encoder": {
            "encoder": {"kernel": jnp.zeros((D_IO, H)),
                        "bias": jnp.zeros((H,))}}}
        for i in range(3):
            params["encoder"][f"layers_{i}"] = {
                "mixer": {"lambda_re": jnp.zeros((P,)) - 0.1,
                          "lambda_im": jnp.zeros((P,)),
                          "b_re": jnp.zeros((P, H)),
                          "b_im": jnp.zeros((P, H)),
                          "c_re": jnp.zeros((H, P)),
                          "c_im": jnp.zeros((H, P)),
                          "d": jnp.zeros((H,)),
                          "log_step": jnp.zeros((P, 1))},
                "out2": {"kernel": jnp.zeros((H, H)),
                         "bias": jnp.zeros((H,))}}
        params["decoder"] = {"kernel": jnp.zeros((H, D_IO)),
                             "bias": jnp.zeros((D_IO,))}
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(lambda a: a + 1e-3, params)

        def bwd_probe_target(grads, opt_state, params):
            updates, new_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_state
        fn = jax.jit(bwd_probe_target)
        mb = min_traffic_bytes(bwd_probe_target, grads, opt_state, params)
        holder = {"s": (params, opt_state)}

        def dispatch(prev):
            p, s = holder["s"]
            p2, s2 = fn(grads, s, p)
            holder["s"] = (p2, s2)
            return p2
        return dispatch, mb

    raise ValueError(component)


COMPONENTS = ["tail_fwd", "tail_bwd", "hist", "loss", "opt"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32")
    ap.add_argument("--components", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "bwd_probe.json"))
    args = ap.parse_args()
    batches = [int(x) for x in args.batches.split(",")]
    comps = (args.components.split(",") if args.components
             else COMPONENTS)

    import jax

    from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                device_module_times,
                                                probe_readback_channel,
                                                readback_drain_time)
    peaks = chip_peaks()
    on_tpu = jax.default_backend() == "tpu"
    # DEVICE-PROFILER first (the channel that delivered the round-5
    # streaming percentiles): real on-device module durations, immune
    # to host sync AND to host dispatch-rate throttling (the first run
    # of this tool was host-bound). Fall back to the drain channel.
    use_profiler = on_tpu and os.environ.get(
        "BWD_PROBE_NO_PROFILER") != "1"
    drain_ok = False
    if on_tpu and not use_profiler:
        drain_ok = probe_readback_channel(peaks[0])
        if not drain_ok:
            print(json.dumps({"tool": "bwd_probe",
                              "error": "no readback channel"}))
            return 1

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for comp in comps:
        for b in batches:
            key = f"{comp}-b{b}"
            t0 = time.time()
            try:
                disp, mb = _build(comp, b)
                sol = mb / peaks[1]
                source = "wall-clock"
                if use_profiler:
                    durs = device_module_times(disp, 12,
                                               "bwd_probe_target")
                    if len(durs) < 3:
                        raise RuntimeError(
                            f"profiler matched {len(durs)} modules")
                    durs.sort()
                    elapsed, n_eff = durs[len(durs) // 2], 1
                    source = "device-profiler"
                elif on_tpu:
                    elapsed, n_eff = readback_drain_time(disp, 16, sol)
                    source = "readback-drain"
                else:
                    out = disp(None)
                    jax.block_until_ready(out)
                    t1 = time.perf_counter()
                    prev = None
                    for _ in range(3):
                        prev = disp(prev)
                    jax.block_until_ready(prev)
                    elapsed, n_eff = time.perf_counter() - t1, 3
                t = elapsed / max(n_eff, 1)
                rec = {"component": comp, "batch": b,
                       "t_ms": round(t * 1e3, 4),
                       "min_bytes": int(mb),
                       "gbps": round(mb / t / 1e9, 1) if t > 0 else 0.0,
                       "n_eff": n_eff, "source": source,
                       "valid": t >= 0.6 * sol,
                       "elapsed_s": round(time.time() - t0, 1),
                       "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
            except Exception as e:  # noqa: BLE001
                rec = {"component": comp, "batch": b,
                       "error": repr(e)[:300]}
            results[key] = rec
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
            print(f"[bwd] {key}: {rec.get('t_ms')} ms "
                  f"{rec.get('gbps')} GB/s {rec.get('error', '')}",
                  file=sys.stderr, flush=True)

    # per-component batch-scaling verdict
    summary = {"tool": "bwd_probe"}
    for comp in comps:
        r8 = results.get(f"{comp}-b{batches[0]}", {})
        r32 = results.get(f"{comp}-b{batches[-1]}", {})
        if r8.get("gbps") and r32.get("gbps"):
            summary[comp] = {
                "gbps": [r8["gbps"], r32["gbps"]],
                "bw_ratio": round(r32["gbps"] / r8["gbps"], 3)}
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
