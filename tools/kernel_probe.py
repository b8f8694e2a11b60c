"""Kernel-unit probe: measured MXU/VPU rates and co-issue behavior.

VERDICT r4 #1/#2 both hinge on unmeasured hardware facts:

- the saturated engine (B=32, bt=512) sits 2.1x above its padded-MXU
  floor, with the scan's VPU passes = 33% of the forward — closing it
  by overlap requires Mosaic to CO-ISSUE independent MXU and VPU
  chains (the half-block interleave measured negative, but that split
  the dot; this probe tests clean overlap at several granularities);
- the bit-faithful mxu16 engine regresses 2.5x at saturation — is the
  cost the quantize/plane VPU math, the f32->int8 relayout, or the
  int8 dots themselves?

Each stage is ONE Pallas kernel iterating in a fori_loop over
VMEM-resident operands (no HBM traffic inside the loop), timed through
the readback-drain channel. Per-stage per-iteration times divide into
unit rates:

  dot_f32 / dot_bf16 / dot_i8      MXU rate ladder at (512,256)@(256,256)
  cast_bf16 / cast_i8 / quantize   conversion + plane-prep VPU costs
  scanpass                         the work-efficient block scan at t=512
  dot_then_scan                    independent dot+scan chains in one body
                                   (co-issue iff t < t_dot + t_scan)
  dot_scan_fine                    same work, interleaved at quarter-dot
                                   granularity
  intdot16 / intdot16_bf16planes   the current int8 two-plane dot vs the
                                   proposed bf16-plane formulation (planes
                                   exact in bf16; int32 combine, same
                                   accumulator values)

Usage: python tools/kernel_probe.py [--stages dot_f32,scanpass,...]
Appends to runs/kernel_probe.json and prints one JSON line.

Reference analog: none — this is TPU microarchitecture calibration for
the kernel roadmap (PERF.md).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pre-imports jax with the axon plugin registered;
    # honoring a CPU request needs the config switch BEFORE backend init
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import numpy as np

T, K, N = 512, 256, 256     # dot geometry: (T, K) @ (K, N)
LOOP = 256                  # in-kernel iterations per dispatch


def _operands(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(T, K).astype(np.float32) * 0.1
    w = (rng.randn(K, N).astype(np.float32) * (1.0 / np.sqrt(K)))
    decay = rng.uniform(0.7, 0.999, N).astype(np.float32)
    theta = rng.uniform(0.0, 0.3, N).astype(np.float32)
    return x, w, decay * np.cos(theta), decay * np.sin(theta)


def _build(stage: str, loop: int = LOOP):
    """Returns (dispatch, flops_per_iter, kind) for one stage; dispatch
    is chained (prev output perturbs the input) for drain timing."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparsernns_tpu.ops.pallas.scan_kernel import (_block_scan,
                                                       lambda_power_tables)

    x_np, w_np, lr_np, li_np = _operands()
    x = jnp.asarray(x_np)
    w = jnp.asarray(w_np)
    lam_re = jnp.asarray(lr_np)
    lam_im = jnp.asarray(li_np)
    num_passes = max(1, (T - 1).bit_length())
    pow_re, pow_im, _ = lambda_power_tables(lam_re, lam_im, T, num_passes)

    dot_flops = 2.0 * T * K * N
    # work-efficient tree ~= 4.6 full-array passes at t=512, 8 flops/elem
    # on the complex pair
    scan_flops = 4.6 * 8.0 * T * N

    interpret = jax.default_backend() != "tpu"
    vmem = lambda shape, dt=jnp.float32: pl.BlockSpec(
        shape, lambda: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def call(kernel, args, out_shape, extra_in=()):
        return pl.pallas_call(
            kernel,
            in_specs=[vmem(a.shape, a.dtype) for a in args],
            out_specs=vmem(out_shape[0], out_shape[1]),
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            interpret=interpret,
        )(*args)

    if stage == "dot_f32":
        def kernel(x_ref, w_ref, o_ref):
            def body(_, acc):
                return acc * 1e-6 + jnp.dot(
                    x_ref[...] + acc * 1e-9, w_ref[...],
                    preferred_element_type=jnp.float32)
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, N), jnp.float32))
        fn = jax.jit(lambda x, w: call(kernel, (x, w),
                                       ((T, N), jnp.float32)))
        disp = lambda prev: fn(x if prev is None else x + 1e-20 * prev, w)
        return disp, loop * dot_flops, "mxu"

    if stage == "dot_bf16":
        xb = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)

        def kernel(x_ref, w_ref, o_ref):
            def body(_, acc):
                return (acc * 1e-6 + jnp.dot(
                    x_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)
                    + acc[0, 0] * 1e-9)
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, N), jnp.float32))
        fn = jax.jit(lambda x, w: call(kernel, (x, w),
                                       ((T, N), jnp.float32)))
        disp = lambda prev: fn(
            xb if prev is None
            else (xb + (1e-20 * prev[:T]).astype(jnp.bfloat16)), wb)
        return disp, loop * dot_flops, "mxu"

    if stage == "dot_i8":
        rng = np.random.RandomState(1)
        qi = jnp.asarray(rng.randint(-128, 128, (T, K)), jnp.int8)
        wi = jnp.asarray(rng.randint(-128, 128, (K, N)), jnp.int8)

        def kernel(q_ref, w_ref, o_ref):
            def body(_, acc):
                d = jax.lax.dot_general(
                    q_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc + d
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, N), jnp.int32))
        fn = jax.jit(lambda q, w: call(kernel, (q, w), ((T, N), jnp.int32)))
        disp = lambda prev: fn(qi, wi)  # independent iters; loop is in-kernel
        return disp, loop * dot_flops, "mxu"

    if stage == "scanpass":
        def kernel(xr_ref, xi_ref, pr_ref, pi_ref, o_ref):
            def body(_, c):
                xr, xi = c
                xr, xi = _block_scan(xr * 1e-3, xi * 1e-3, pr_ref, pi_ref,
                                     T)
                return xr, xi
            xr, xi = jax.lax.fori_loop(
                0, loop, body, (xr_ref[...], xi_ref[...]))
            o_ref[...] = xr + xi
        fn = jax.jit(lambda a, b, c, d: call(
            kernel, (a, b, c, d), ((T, N), jnp.float32)))
        xr0 = jnp.asarray(np.random.RandomState(2).randn(T, N),
                          jnp.float32)
        disp = lambda prev: fn(
            xr0 if prev is None else xr0 + 1e-20 * prev, xr0 * 0.5,
            pow_re, pow_im)
        return disp, loop * scan_flops, "vpu"

    if stage == "scanpass_prescale":
        # candidate intra-8 combine: scale rows by λ^{-(k mod 8)}, run
        # the 3 doubling passes as PURE ADDS (2 flops/elem instead of
        # the 8-flop complex MAC), then scale by λ^{k mod 8} — same
        # shifts, ~40% fewer VPU flops. Numerically valid only when
        # |λ|^-7 is small (flagship init: |λ| >= 0.95); this stage only
        # measures the speed question.
        lam_np = lr_np + 1j * li_np
        idx = np.arange(8)
        pre = (lam_np[None, :] ** (-idx[:, None]))[None]     # (1,8,N)
        post = (lam_np[None, :] ** (idx[:, None]))[None]
        fold = (lam_np[None, :] ** (idx[:, None] + 1))[None]  # λ^{k+1}
        cvt = lambda a: jnp.asarray(np.ascontiguousarray(a)
                                    .astype(np.complex64))
        pre_r = jnp.asarray(pre.real.astype(np.float32))
        pre_i = jnp.asarray(pre.imag.astype(np.float32))
        post_r = jnp.asarray(post.real.astype(np.float32))
        post_i = jnp.asarray(post.imag.astype(np.float32))
        fold_r = jnp.asarray(fold.real.astype(np.float32))
        fold_i = jnp.asarray(fold.imag.astype(np.float32))
        del cvt

        def kernel(xr_ref, xi_ref, pr_ref, pi_ref, prer, prei,
                   postr, posti, foldr, foldi, o_ref):
            def prescale_scan(xr, xi):
                x3r = xr.reshape(T // 8, 8, N)
                x3i = xi.reshape(T // 8, 8, N)
                pr_, pi_ = prer[...], prei[...]
                ar = x3r * pr_ - x3i * pi_
                ai = x3r * pi_ + x3i * pr_
                for k in range(3):        # pure-add doubling passes
                    d = 1 << k
                    pad = jnp.zeros((T // 8, d, N), ar.dtype)
                    ar = ar + jnp.concatenate([pad, ar[:, : 8 - d]],
                                              axis=1)
                    ai = ai + jnp.concatenate([pad, ai[:, : 8 - d]],
                                              axis=1)
                qr_, qi_ = postr[...], posti[...]
                x3r = ar * qr_ - ai * qi_
                x3i = ar * qi_ + ai * qr_
                # cross-sub: plain tree on the (T/8, N) sub totals
                cr, ci = _block_scan(x3r[:, 7, :], x3i[:, 7, :],
                                     pr_ref, pi_ref, T // 8, 3)
                zp = jnp.zeros((1, N), xr.dtype)
                cer = jnp.concatenate([zp, cr[:-1]], axis=0)[:, None, :]
                cei = jnp.concatenate([zp, ci[:-1]], axis=0)[:, None, :]
                fr_, fi_ = foldr[...], foldi[...]
                x3r = x3r + (fr_ * cer - fi_ * cei)
                x3i = x3i + (fr_ * cei + fi_ * cer)
                return x3r.reshape(T, N), x3i.reshape(T, N)

            def body(_, c):
                xr, xi = c
                return prescale_scan(xr * 1e-3, xi * 1e-3)
            xr, xi = jax.lax.fori_loop(
                0, loop, body, (xr_ref[...], xi_ref[...]))
            o_ref[...] = xr + xi
        fn = jax.jit(lambda *a: call(kernel, a, ((T, N), jnp.float32)))
        xr0 = jnp.asarray(np.random.RandomState(2).randn(T, N),
                          jnp.float32)
        disp = lambda prev: fn(
            xr0 if prev is None else xr0 + 1e-20 * prev, xr0 * 0.5,
            pow_re, pow_im, pre_r, pre_i, post_r, post_i,
            fold_r, fold_i)
        return disp, loop * scan_flops, "vpu"

    if stage in ("dot_then_scan", "dot_scan_fine"):
        fine = stage == "dot_scan_fine"

        def kernel(x_ref, w_ref, xr_ref, xi_ref, pr_ref, pi_ref, o_ref):
            def body(_, c):
                acc, xr, xi = c
                if not fine:
                    # one full dot, then one full scan — independent
                    d = jnp.dot(x_ref[...], w_ref[...],
                                preferred_element_type=jnp.float32)
                    xr, xi = _block_scan(xr * 1e-3, xi * 1e-3,
                                         pr_ref, pi_ref, T)
                else:
                    # quarter-row dot chunks interleaved with the scan's
                    # sub-stages (same total work, finer alternation)
                    q = T // 4
                    parts = []
                    for ci in range(4):
                        parts.append(jnp.dot(
                            x_ref[ci * q:(ci + 1) * q, :], w_ref[...],
                            preferred_element_type=jnp.float32))
                        if ci == 0:
                            xr, xi = _block_scan(xr * 1e-3, xi * 1e-3,
                                                 pr_ref, pi_ref, T)
                    d = jnp.concatenate(parts, axis=0)
                return acc * 1e-6 + d, xr, xi
            acc, xr, xi = jax.lax.fori_loop(
                0, loop, body,
                (jnp.zeros((T, N), jnp.float32), xr_ref[...], xi_ref[...]))
            o_ref[...] = acc + xr + xi
        fn = jax.jit(lambda a, b, c, d, e, f: call(
            kernel, (a, b, c, d, e, f), ((T, N), jnp.float32)))
        xr0 = jnp.asarray(np.random.RandomState(2).randn(T, N),
                          jnp.float32)
        disp = lambda prev: fn(
            x if prev is None else x + 1e-20 * prev, w,
            xr0, xr0 * 0.5, pow_re, pow_im)
        return disp, loop * (dot_flops + scan_flops), "mixed"

    if stage == "cast_bf16":
        def kernel(x_ref, o_ref):
            def body(_, acc):
                b = (x_ref[...] + acc * 1e-9).astype(jnp.bfloat16)
                return acc * 1e-6 + b.astype(jnp.float32)
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, K), jnp.float32))
        fn = jax.jit(lambda a: call(kernel, (a,), ((T, K), jnp.float32)))
        disp = lambda prev: fn(x if prev is None else x + 1e-20 * prev)
        return disp, loop * 2.0 * T * K, "vpu"

    if stage == "cast_i8":
        def kernel(x_ref, o_ref):
            def body(_, acc):
                q = jnp.clip(x_ref[...] * 100.0 + acc * 1e-9,
                             -127.0, 127.0).astype(jnp.int8)
                return acc * 1e-6 + q.astype(jnp.float32)
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, K), jnp.float32))
        fn = jax.jit(lambda a: call(kernel, (a,), ((T, K), jnp.float32)))
        disp = lambda prev: fn(x if prev is None else x + 1e-20 * prev)
        return disp, loop * 2.0 * T * K, "vpu"

    if stage == "quantize":
        from sparsernns_tpu.ops.intdot import i16_planes, quantize_codes

        def kernel(x_ref, o_ref):
            def body(_, acc):
                q = quantize_codes(x_ref[...] + acc * 1e-9, 1e-3, 16)
                hi, lo = i16_planes(q)
                return (acc * 1e-6 + hi.astype(jnp.float32)
                        + lo.astype(jnp.float32))
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, K), jnp.float32))
        fn = jax.jit(lambda a: call(kernel, (a,), ((T, K), jnp.float32)))
        disp = lambda prev: fn(x if prev is None else x + 1e-20 * prev)
        return disp, loop * 8.0 * T * K, "vpu"

    if stage in ("intdot16", "intdot16_bf16planes"):
        from sparsernns_tpu.ops.intdot import (i16_planes, quantize_codes,
                                               weight_colsum)
        rng = np.random.RandomState(1)
        wi = jnp.asarray(rng.randint(-128, 128, (K, N)), jnp.int8)
        cs = weight_colsum(np.asarray(wi))
        bf = stage.endswith("bf16planes")
        wf = wi.astype(jnp.bfloat16) if bf else wi

        def kernel(x_ref, w_ref, cs_ref, o_ref):
            def body(_, acc):
                q = quantize_codes(x_ref[...] + acc * 1e-9, 1e-3, 16)
                hi, lo = i16_planes(q)
                if bf:
                    # planes are exact in bf16 (|v| <= 128 integers);
                    # products <= 2^14, sums over K=256 < 2^24 -> the f32
                    # accumulator is exact; int32 combine reproduces the
                    # int-path accumulator bit for bit
                    dh = jnp.dot(hi.astype(jnp.bfloat16), w_ref[...],
                                 preferred_element_type=jnp.float32)
                    dl = jnp.dot(lo.astype(jnp.bfloat16), w_ref[...],
                                 preferred_element_type=jnp.float32)
                    a = (dh.astype(jnp.int32) * 256 + dl.astype(jnp.int32)
                         + cs_ref[...] * 128)
                else:
                    dh = jax.lax.dot_general(
                        hi, w_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    dl = jax.lax.dot_general(
                        lo, w_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    a = dh * 256 + dl + cs_ref[...] * 128
                return acc * 1e-6 + a.astype(jnp.float32) * 1e-6
            o_ref[...] = jax.lax.fori_loop(
                0, loop, body, jnp.zeros((T, N), jnp.float32))
        fn = jax.jit(lambda a, b, c: call(kernel, (a, b, c),
                                          ((T, N), jnp.float32)))
        csr = jnp.asarray(cs, jnp.int32)[None, :]
        disp = lambda prev: fn(x if prev is None else x + 1e-20 * prev,
                               wf, csr)
        return disp, loop * 2.0 * dot_flops, "mxu"

    raise ValueError(f"unknown stage {stage!r}")


STAGES = ["dot_f32", "dot_bf16", "dot_i8", "scanpass", "dot_then_scan",
          "dot_scan_fine", "cast_bf16", "cast_i8", "quantize",
          "intdot16", "intdot16_bf16planes"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default=None)
    ap.add_argument("--loop", type=int, default=LOOP)
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "kernel_probe.json"))
    args = ap.parse_args()
    stages = args.stages.split(",") if args.stages else STAGES

    import jax

    from sparsernns_tpu.utils.profiling import (chip_peaks,
                                                probe_readback_channel,
                                                readback_drain_time)
    peaks = chip_peaks()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not probe_readback_channel(peaks[0]):
        print(json.dumps({"tool": "kernel_probe",
                          "error": "no readback channel"}))
        return 1

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    recs = results.setdefault("stages", {})

    for st in stages:
        t0 = time.time()
        try:
            disp, flops, kind = _build(st, args.loop)
            # rough sol guess to size the drain span
            sol = flops / peaks[0]
            elapsed, n_eff = readback_drain_time(disp, 32, sol) \
                if on_tpu else _wallclock(disp)
            t_iter = elapsed / max(n_eff, 1)
            rec = {"stage": st, "kind": kind,
                   "t_dispatch_ms": round(t_iter * 1e3, 4),
                   "flops_per_dispatch": flops,
                   "tflops": round(flops / t_iter / 1e12, 2),
                   "loop": args.loop, "n_eff": n_eff,
                   "elapsed_s": round(time.time() - t0, 1),
                   "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"stage": st, "error": repr(e)[:300],
                   "elapsed_s": round(time.time() - t0, 1)}
        recs[st] = rec
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"[probe] {st}: {rec.get('t_dispatch_ms')} ms/dispatch "
              f"({rec.get('tflops')} TF/s) {rec.get('error', '')}",
              file=sys.stderr, flush=True)

    summary = {"tool": "kernel_probe",
               "stages": {k: {kk: v[kk] for kk in
                              ("t_dispatch_ms", "tflops")
                              if kk in v}
                          for k, v in recs.items()}}
    # co-issue verdict: does the combined body beat the serial sum?
    try:
        td = recs["dot_f32"]["t_dispatch_ms"]
        ts = recs["scanpass"]["t_dispatch_ms"]
        tb = recs["dot_then_scan"]["t_dispatch_ms"]
        summary["coissue_ratio"] = round(tb / (td + ts), 3)
        summary["coissue"] = tb < 0.85 * (td + ts)
    except KeyError:
        pass
    print(json.dumps(summary), flush=True)
    return 0


def _wallclock(disp):
    import time as _t

    import jax
    out = disp(None)
    jax.block_until_ready(out)
    t0 = _t.perf_counter()
    prev = None
    for _ in range(3):
        prev = disp(prev)
    jax.block_until_ready(prev)
    return _t.perf_counter() - t0, 3


if __name__ == "__main__":
    sys.exit(main())
