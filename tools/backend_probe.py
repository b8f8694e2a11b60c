"""Backend conformance probe: which op classes does this device ACTUALLY run?

The round-3 tunnel backend executes plain matmul chains but refuses every
model program with ``UNIMPLEMENTED`` and *wedges the shared device* on an
int8 ``dot_general`` (the hang persists for every later process for tens of
minutes). Debugging that one op class cost a full session — this probe maps
the supported-op surface systematically so route selection (and future
sessions) can consult a measured conformance table instead of rediscovering
it by wedging the device.

Design (mirrors bench.py's isolation rules):
  * every stage runs in its OWN subprocess — an in-process hang inside the
    C transport cannot be interrupted by SIGALRM, a subprocess can be killed;
  * stages are ordered least- to most-likely to wedge (known wedgers LAST);
  * each stage drains a 1-element readback, because on this backend
    execution errors only surface at the first synchronizing readback;
  * after a HANG the probe waits for device recovery (drained-matmul health
    probe, exponential backoff) before continuing, and records the outage;
  * results append to a JSON table (default runs/backend_probe.json) keyed
    by stage name: {"status": "ok"|"error"|"hang", "detail": ..., "s": ...}.

Usage:
  python tools/backend_probe.py                # run all stages
  python tools/backend_probe.py --stages a,b   # subset
  python tools/backend_probe.py --list         # show stage names
  python tools/backend_probe.py --skip-wedgers # leave known hangs out
  python tools/backend_probe.py --stage X      # internal: run one stage

Reference context: the reference framework assumes CUDA devices execute
whatever torch emits (sparseRNNs/train_helpers.py has no backend gating);
a tunnel TPU transport offers no such guarantee, so we measure it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: stage name -> (builder source, known_wedger). Each builder is exec'd in a
#: fresh subprocess with jax/jnp/np in scope and must end with ``OUT = ...``
#: (a device array or pytree); the driver drains a 1-element readback of it.
STAGES = {
    # --- controls ---
    "f32_matmul": ("x = jnp.ones((256, 256), jnp.float32)\n"
                   "OUT = jax.jit(lambda a: a @ a)(x)", False),
    "bf16_matmul": ("x = jnp.ones((256, 256), jnp.bfloat16)\n"
                    "OUT = jax.jit(lambda a: a @ a)(x)", False),
    # --- program shapes ---
    "multi_output": ("x = jnp.ones((64, 64), jnp.float32)\n"
                     "OUT = jax.jit(lambda a: (a @ a, a + 1.0))(x)", False),
    "donated_arg": ("x = jnp.ones((64, 64), jnp.float32)\n"
                    "OUT = jax.jit(lambda a: a * 2.0, donate_argnums=0)(x)",
                    False),
    "s32_output": ("x = jnp.ones((64, 64), jnp.float32)\n"
                   "OUT = jax.jit(lambda a: (a > 0).sum())(x)", False),
    # bool_output wedges the device (recorded 2026-08-19); this is the
    # documented WORKAROUND class: predicates cast to u8 before the jit
    # boundary (VERDICT r3 #7 — no shipped route returns bools today,
    # pruning/top-k masks are float-cast at train/pruning.py:208,220)
    "predicate_u8_output": (
        "x = jnp.ones((64,), jnp.float32)\n"
        "OUT = jax.jit(lambda a: (a > 0.5).astype(jnp.uint8))(x)", False),
    "bool_output": ("x = jnp.ones((64,), jnp.float32)\n"
                    "OUT = jax.jit(lambda a: a > 0.5)(x)", False),
    # --- dtypes / quantization path ---
    "s8_transfer": ("w = np.arange(-8, 8, dtype=np.int8).reshape(4, 4)\n"
                    "d = jax.device_put(w)\n"
                    "OUT = jax.jit(lambda a: a.astype(jnp.float32).sum())(d)",
                    False),
    "s8_dequant_matmul": (
        "w = jax.device_put(np.ones((128, 128), np.int8))\n"
        "x = jnp.ones((8, 128), jnp.bfloat16)\n"
        "OUT = jax.jit(lambda a, b: a @ (b.astype(jnp.bfloat16) * 0.01))"
        "(x, w)", False),
    "f32_from_s8_dot": (
        "w = jax.device_put(np.ones((128, 128), np.int8))\n"
        "OUT = jax.jit(lambda b: (b.astype(jnp.float32) @ "
        "b.astype(jnp.float32)))(w)", False),
    # --- RNG (model.init runs this on device) ---
    "rng_normal": ("OUT = jax.jit(lambda k: jax.random.normal(k, (64, 64)))"
                   "(jax.random.PRNGKey(0))", False),
    # --- control flow / scan family ---
    "associative_scan_add": (
        "x = jnp.ones((64, 128), jnp.float32)\n"
        "OUT = jax.jit(lambda a: jax.lax.associative_scan(\n"
        "    lambda p, q: p + q, a, axis=0))(x)", True),
    "lax_scan": ("x = jnp.ones((64, 128), jnp.float32)\n"
                 "OUT = jax.jit(lambda a: jax.lax.scan(\n"
                 "    lambda c, t: (c * 0.9 + t, c), a[0], a)[0])(x)", False),
    "while_loop": ("OUT = jax.jit(lambda n: jax.lax.while_loop(\n"
                   "    lambda s: s[0] < n, lambda s: (s[0] + 1, s[1] * 1.01),"
                   " (0, jnp.ones((128,)))))(16)", False),
    "cumsum": ("x = jnp.ones((64, 128), jnp.float32)\n"
               "OUT = jax.jit(lambda a: jnp.cumsum(a, axis=0))(x)", False),
    # --- elementwise / layer math ---
    "activations": ("x = jnp.linspace(-3, 3, 512).reshape(4, 128)\n"
                    "OUT = jax.jit(lambda a: jax.nn.gelu(a) + "
                    "jax.nn.sigmoid(a) + jnp.tanh(a))(x)", False),
    "bn_rsqrt": ("x = jnp.ones((8, 128), jnp.float32)\n"
                 "OUT = jax.jit(lambda a: (a - a.mean(0)) * "
                 "jax.lax.rsqrt(a.var(0) + 1e-5))(x)", False),
    "exp_log": ("x = jnp.ones((8, 128), jnp.float32)\n"
                "OUT = jax.jit(lambda a: jnp.log1p(jnp.exp(a)))(x)", False),
    # stablehlo.minimum is one of only two ops present in the refused
    # flax model programs but absent from the passing hand-built ones
    # (the other, rsqrt, passed in bn_rsqrt) — split op-vs-metadata
    "minimum_op": ("x = jnp.ones((8, 128), jnp.float32)\n"
                   "OUT = jax.jit(lambda a: jnp.minimum(a, 0.5) + "
                   "jnp.clip(a, -0.1, 0.9))(x)", False),
    # --- data movement ---
    "concat_pad_transpose": (
        "x = jnp.ones((8, 64, 32), jnp.float32)\n"
        "OUT = jax.jit(lambda a: jnp.pad(jnp.concatenate([a, a], -1),\n"
        "    ((0, 0), (0, 0), (0, 32))).transpose(0, 2, 1))(x)", False),
    "dynamic_slice": ("x = jnp.ones((64, 128), jnp.float32)\n"
                      "OUT = jax.jit(lambda a, i: jax.lax.dynamic_slice(\n"
                      "    a, (i, 0), (8, 128)))(x, 3)", False),
    "gather_take": ("x = jnp.ones((64, 128), jnp.float32)\n"
                    "idx = jnp.arange(0, 64, 2)\n"
                    "OUT = jax.jit(lambda a, i: a[i])(x, idx)", False),
    "top_k": ("x = jnp.linspace(0, 1, 128 * 8).reshape(8, 128)\n"
              "OUT = jax.jit(lambda a: jax.lax.top_k(a, 16)[0])(x)", False),
    "sort": ("x = jnp.linspace(1, 0, 128 * 8).reshape(8, 128)\n"
             "OUT = jax.jit(lambda a: jnp.sort(a, axis=-1))(x)", False),
    "iota": ("OUT = jax.jit(lambda: jnp.arange(1024, dtype=jnp.float32)"
             ".reshape(8, 128) * 2.0)()", False),
    # --- Pallas ---
    "pallas_copy": (
        "from jax.experimental import pallas as pl\n"
        "def kern(x_ref, o_ref):\n"
        "    o_ref[...] = x_ref[...] * 2.0\n"
        "x = jnp.ones((8, 128), jnp.float32)\n"
        "OUT = jax.jit(pl.pallas_call(kern,\n"
        "    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)))(x)", False),
    "pallas_diag_scan": (
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.ops.pallas.scan_kernel import pallas_diag_scan\n"
        "lam = (jnp.full((128,), 0.9), jnp.full((128,), 0.01))\n"
        "bu = (jnp.ones((2, 64, 128)), jnp.ones((2, 64, 128)))\n"
        "OUT = jax.jit(lambda l0, l1, b0, b1: pallas_diag_scan(\n"
        "    (l0, l1), (b0, b1), block_t=64))(lam[0], lam[1], bu[0], bu[1])"
        % REPO, False),
    # --- model-level (weights built HOST-side; no on-device init) ---
    "model_fwd_tiny_assoc": (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(training=False, scan_mode='associative')\n"
        "x = jnp.zeros((1, 64, 257), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "OUT = jax.jit(lambda vv, xx: model.apply(vv, xx))(v, x)" % REPO,
        True),
    "model_init_tiny": (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(training=False, scan_mode='associative')\n"
        "x = jnp.zeros((1, 64, 257), jnp.float32)\n"
        "OUT = model.init(jax.random.PRNGKey(0), x)" % REPO, True),
    # --- compile-only variants: split compile-time vs execution-time
    #     failures (an UNIMPLEMENTED from .compile() is a compiler-service
    #     limitation; one from the drained readback is an executor one) ---
    "assoc_scan_compile_only": (
        "x = jnp.ones((64, 128), jnp.float32)\n"
        "f = jax.jit(lambda a: jax.lax.associative_scan(\n"
        "    lambda p, q: p + q, a, axis=0))\n"
        "f.lower(x).compile()\n"
        "OUT = jnp.ones((2,), jnp.float32)", False),
    "model_fwd_compile_only": (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(training=False, scan_mode='associative')\n"
        "x = jnp.zeros((1, 64, 257), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "jax.jit(lambda vv, xx: model.apply(vv, xx)).lower(v, x).compile()\n"
        "OUT = jnp.ones((2,), jnp.float32)" % REPO, False),
    "s8_dot_compile_only": (
        "a = jnp.ones((128, 128), jnp.int8)\n"
        "f = jax.jit(lambda m: jax.lax.dot_general(m, m,\n"
        "    (((1,), (0,)), ((), ())),\n"
        "    preferred_element_type=jnp.int32))\n"
        "f.lower(a).compile()\n"
        "OUT = jnp.ones((2,), jnp.float32)", False),
    # --- round-3 bisect: the tunnel runs plain matmul chains at 98.9%
    #     of the MXU floor but refuses every model program UNIMPLEMENTED.
    #     These stages climb from the known-good control to the model in
    #     op-class steps, to find the eliminating construct. ---
    "matmul_batched_3d": (
        "a = jnp.ones((128, 64, 64), jnp.float32)\n"
        "b = jnp.ones((128, 64, 32), jnp.float32)\n"
        "OUT = jax.jit(lambda x, y: jax.lax.dot_general(x, y,\n"
        "    (((2,), (1,)), ((0,), (0,)))))(a, b)", False),
    "reduce_mean_axis": ("x = jnp.ones((8, 128, 64), jnp.float32)\n"
                         "OUT = jax.jit(lambda a: a.mean(axis=1))(x)", False),
    "logistic_3d": ("x = jnp.ones((8, 64, 128), jnp.float32)\n"
                    "OUT = jax.jit(lambda a: jax.nn.sigmoid(a) * a)(x)",
                    False),
    "transpose_021": ("x = jnp.ones((8, 64, 128), jnp.float32)\n"
                      "OUT = jax.jit(lambda a: a.transpose(0, 2, 1) @ "
                      "jnp.ones((8, 64, 128), jnp.float32))(x)", False),
    "many_args": ("xs = [jnp.full((64, 64), float(i)) for i in range(40)]\n"
                  "OUT = jax.jit(lambda *a: sum(a))(*xs)", False),
    "big_program": ("x = jnp.ones((128, 128), jnp.float32)\n"
                    "def f(a):\n"
                    "    for i in range(200):\n"
                    "        a = a * 1.001 + 0.001\n"
                    "        if i % 20 == 0:\n"
                    "            a = a @ a * 1e-3\n"
                    "    return a\n"
                    "OUT = jax.jit(f)(x)", False),
    "stft_splitter_dot": (
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.ops.stft import stft_splitter\n"
        "x = jnp.ones((1, 8192), jnp.float32)\n"
        "OUT = stft_splitter(x)" % REPO, False),
    "encoder_dense_relu": (
        "w = jnp.ones((257, 192), jnp.float32) * 0.01\n"
        "x = jnp.ones((1, 64, 257), jnp.float32)\n"
        "OUT = jax.jit(lambda a, k: jax.nn.relu(a @ k + 0.1))(x, w)", False),
    "blocked_scan_tiny": (
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.ops.scan import blocked_diag_scan\n"
        "lam = (jnp.full((128,), 0.9), jnp.full((128,), 0.01))\n"
        "bu = (jnp.ones((2, 64, 128)), jnp.ones((2, 64, 128)))\n"
        "OUT = jax.jit(lambda l0, l1, b0, b1: blocked_diag_scan(\n"
        "    (l0, l1), (b0, b1), block_t=32))(lam[0], lam[1], bu[0], bu[1])"
        % REPO, False),
    "model_fwd_tiny_blocked": (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(d_model=16, ssm_size=16, blocks=2,\n"
        "    n_layers=2, d_io=33, training=False, scan_mode='blocked')\n"
        "x = jnp.zeros((1, 64, 33), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "OUT = jax.jit(lambda vv, xx: model.apply(vv, xx))(v, x)" % REPO,
        False),
    "engine_xla_tiny": (
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import _build_engine\n"
        "engine, variables, x = _build_engine(1, 64, 257, route='xla')\n"
        "OUT = engine(x)" % REPO, False),
    # --- round-4 bisect: every op-level stage (incl. Pallas, scans,
    #     trig-in-blocked-scan, 600-op programs) is OK on the 2026-08-20
    #     tunnel, while model_fwd_compile_only and engine_xla_tiny are
    #     refused AT COMPILE in <1s. These stages split the remaining
    #     candidates: the tuple-combine associative scan (the one scan
    #     class never compiled standalone), the model program minus the
    #     associative scan (blocked variant, compile-only), engine BUILD
    #     vs engine FORWARD, and raw program size ~1300 ops. ---
    "assoc_scan_pair_compile_only": (
        "def comb(p, q):\n"
        "    (ar, ai, br, bi), (cr, ci, dr, di) = p, q\n"
        "    return (ar * cr - ai * ci, ar * ci + ai * cr,\n"
        "            cr * br - ci * bi + dr, cr * bi + ci * br + di)\n"
        "a = tuple(jnp.full((64, 128), v) for v in (0.9, 0.01, 0.1, 0.1))\n"
        "f = jax.jit(lambda *t: jax.lax.associative_scan(comb, t, axis=0))\n"
        "f.lower(*a).compile()\n"
        "OUT = jnp.ones((2,), jnp.float32)", False),
    "model_blocked_compile_only": (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(training=False, scan_mode='blocked')\n"
        "x = jnp.zeros((1, 64, 257), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "jax.jit(lambda vv, xx: model.apply(vv, xx)).lower(v, x).compile()\n"
        "OUT = jnp.ones((2,), jnp.float32)" % REPO, False),
    "engine_xla_build_only": (
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import _build_engine\n"
        "engine, variables, x = _build_engine(1, 64, 257, route='xla')\n"
        "OUT = jnp.ones((2,), jnp.float32)" % REPO, False),
    "engine_xla_compile_only": (
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import _build_engine\n"
        "engine, variables, x = _build_engine(1, 64, 257, route='xla')\n"
        "jax.jit(lambda w, xi: engine._apply(w, xi,\n"
        "    block_t=engine.block_t)).lower(engine.weights, x).compile()\n"
        "OUT = jnp.ones((2,), jnp.float32)" % REPO, False),
    "handbuilt_model_fwd": (
        # the tiny blocked model rebuilt from RAW ops (no flax, flat
        # args): encoder dense -> 2 x [BN-infer, B-proj, blocked scan,
        # C-proj+D, GLU half1, residual] -> decoder. If this passes
        # while model_fwd_tiny_blocked (same math through flax.apply)
        # is refused, the conviction is structural, not op-level —
        # and this composition IS the serving route.
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.ops.scan import blocked_diag_scan\n"
        "rng = np.random.RandomState(0)\n"
        "def W(*s):\n"
        "    return jnp.asarray(0.05 * rng.randn(*s).astype(np.float32))\n"
        "H, P, D = 16, 8, 33\n"
        "x = jnp.asarray(rng.randn(1, 64, D).astype(np.float32))\n"
        "enc_k, enc_b, dec_k, dec_b = W(D, H), W(H), W(H, D), W(D)\n"
        "layers = [dict(nw=W(H), nb=W(H), wb=W(H, 2 * P), wc=W(2 * P, H),\n"
        "               d=W(H), gk=W(H, H), gb=W(H),\n"
        "               lr=jnp.full((P,), 0.9), li=jnp.full((P,), 0.05))\n"
        "          for _ in range(2)]\n"
        "def fwd(x):\n"
        "    h = jax.nn.gelu(x @ enc_k + enc_b)\n"
        "    for L in layers:\n"
        "        z = h * L['nw'] + L['nb']\n"
        "        bu = z @ L['wb']\n"
        "        xs = blocked_diag_scan((L['lr'], L['li']),\n"
        "                               (bu[..., :P], bu[..., P:]),\n"
        "                               block_t=32)\n"
        "        y = jnp.concatenate(xs, -1) @ L['wc'] + L['d'] * z\n"
        "        g = jax.nn.gelu(y)\n"
        "        h = h + g * jax.nn.sigmoid(g @ L['gk'] + L['gb'])\n"
        "    return h @ dec_k + dec_b\n"
        "OUT = jax.jit(fwd)(x)" % REPO, False),
    "handbuilt_model_fwd_args": (
        # same as handbuilt_model_fwd but weights enter as JIT ARGUMENTS
        # (flat pytree) like flax apply does, instead of closure
        # constants — splits "model programs refused" between program
        # CONTENT and parameter-passing structure.
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.ops.scan import blocked_diag_scan\n"
        "rng = np.random.RandomState(0)\n"
        "def W(*s):\n"
        "    return jnp.asarray(0.05 * rng.randn(*s).astype(np.float32))\n"
        "H, P, D = 16, 8, 33\n"
        "x = jnp.asarray(rng.randn(1, 64, D).astype(np.float32))\n"
        "wd = dict(enc_k=W(D, H), enc_b=W(H), dec_k=W(H, D), dec_b=W(D),\n"
        "          layers=[dict(nw=W(H), nb=W(H), wb=W(H, 2 * P),\n"
        "                       wc=W(2 * P, H), d=W(H), gk=W(H, H),\n"
        "                       gb=W(H), lr=jnp.full((P,), 0.9),\n"
        "                       li=jnp.full((P,), 0.05))\n"
        "                  for _ in range(2)])\n"
        "def fwd(w, x):\n"
        "    h = jax.nn.gelu(x @ w['enc_k'] + w['enc_b'])\n"
        "    for L in w['layers']:\n"
        "        z = h * L['nw'] + L['nb']\n"
        "        bu = z @ L['wb']\n"
        "        xs = blocked_diag_scan((L['lr'], L['li']),\n"
        "                               (bu[..., :P], bu[..., P:]),\n"
        "                               block_t=32)\n"
        "        y = jnp.concatenate(xs, -1) @ L['wc'] + L['d'] * z\n"
        "        g = jax.nn.gelu(y)\n"
        "        h = h + g * jax.nn.sigmoid(g @ L['gk'] + L['gb'])\n"
        "    return h @ w['dec_k'] + w['dec_b']\n"
        "OUT = jax.jit(fwd)(wd, x)" % REPO, False),
    "model_fwd_jaxpr_relay": (
        # THE CONVICTION TEST (2026-08-20): handbuilt_model_fwd passes,
        # the flax-built identical math is refused at compile — so
        # re-emit the flax program through utils.relay.relay_jit
        # (make_jaxpr + strip_source_info + eval_jaxpr: same ops
        # bit-for-bit, NONE of flax's scope/location metadata). If this
        # passes, the relay IS the serving route for every model/engine
        # program on this backend.
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.utils.relay import relay_jit\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(d_model=16, ssm_size=16, blocks=2,\n"
        "    n_layers=2, d_io=33, training=False, scan_mode='blocked')\n"
        "x = jnp.zeros((1, 64, 33), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "fn = lambda vv, xx: model.apply(vv, xx)\n"
        "OUT = relay_jit(fn, v, x)(v, x)" % REPO, False),
    "model_fwd_relay_unstripped": (
        # CONTROL: the same re-emission WITHOUT metadata stripping
        # (eval_jaxpr replays each eqn's stored source info, flax scopes
        # included). unstripped-refused + stripped-ok = metadata is the
        # convicted construct, beyond doubt.
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(d_model=16, ssm_size=16, blocks=2,\n"
        "    n_layers=2, d_io=33, training=False, scan_mode='blocked')\n"
        "x = jnp.zeros((1, 64, 33), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "fn = lambda vv, xx: model.apply(vv, xx)\n"
        "jpr = jax.make_jaxpr(fn)(v, x)\n"
        "flat, _ = jax.tree_util.tree_flatten((v, x))\n"
        "OUT = jax.jit(lambda *ls: jax.core.eval_jaxpr(\n"
        "    jpr.jaxpr, jpr.literals, *ls))(*flat)" % REPO, False),
    "engine_build_traceback": (
        # engine_xla_build_only is refused on TPU while every device op
        # the build makes on CPU is trivial (scalar convert/broadcast,
        # threefry) — capture WHICH call site the refusal comes from
        # (the worker records repr(e), so fold the traceback tail in).
        "import sys, traceback; sys.path.insert(0, %r)\n"
        "try:\n"
        "    from bench import _build_engine\n"
        "    engine, variables, x = _build_engine(1, 64, 257,\n"
        "                                         route='xla')\n"
        "    OUT = jnp.ones((2,), jnp.float32)\n"
        "except Exception:\n"
        "    tb = traceback.format_exc().splitlines()\n"
        "    site = [ln.strip() for ln in tb if 'File' in ln]\n"
        "    raise RuntimeError('; '.join(site[-4:])[:280])\n" % REPO,
        False),
    "engine_relay_tiny": (
        # the w8a16 xla-route engine forward through the STRIPPING
        # relay — if this passes, bench's engine modes get real drained
        # timings. (Build-time device work is also under test:
        # engine_xla_build_only / engine_build_traceback.)
        "import sys; sys.path.insert(0, %r)\n"
        "from sparsernns_tpu.utils.relay import relay_jit\n"
        "from bench import _build_engine\n"
        "engine, variables, x = _build_engine(1, 64, 257, route='xla')\n"
        "fn = lambda w, xi: engine._apply(w, xi, block_t=engine.block_t)\n"
        "OUT = relay_jit(fn, engine.weights, x)(engine.weights, x)"
        % REPO, False),
    "mixed_rank_args": (
        "rng = np.random.RandomState(0)\n"
        "args = []\n"
        "for i in range(13):\n"
        "    args += [jnp.asarray(rng.randn(16).astype(np.float32)),\n"
        "             jnp.asarray(rng.randn(2, 16).astype(np.float32)),\n"
        "             jnp.asarray(rng.randn(1, 64, 33).astype(np.float32))]\n"
        "OUT = jax.jit(lambda *a: sum(x.sum() for x in a))(*args)", False),
    "huge_program_1300": (
        "x = jnp.ones((128, 128), jnp.float32)\n"
        "def f(a):\n"
        "    for i in range(430):\n"
        "        a = a * 1.001 + 0.001\n"
        "        if i % 20 == 0:\n"
        "            a = a @ a * 1e-3\n"
        "    return a\n"
        "OUT = jax.jit(f)(x)", False),
    "layer_tiny_blocked": (
        "import sys; sys.path.insert(0, %r)\n"
        "from __graft_entry__ import _flagship_model\n"
        "model = _flagship_model(d_model=16, ssm_size=16, blocks=2,\n"
        "    n_layers=1, d_io=33, training=False, scan_mode='blocked')\n"
        "x = jnp.zeros((1, 64, 33), jnp.float32)\n"
        "shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)\n"
        "rng = np.random.RandomState(0)\n"
        "v = jax.tree_util.tree_map(lambda s: (0.1 * np.abs(\n"
        "    rng.randn(*s.shape)) + 0.01).astype(s.dtype), shapes)\n"
        "OUT = jax.jit(lambda vv, xx: model.apply(vv, xx))(v, x)" % REPO,
        False),
    # --- round-4 conviction A/B (runs/jaxpr_bisect.json 2026-08-20):
    #     the runtime prefix bisect convicted the FIRST eqn of the model
    #     program — a dot_general with precision=(HIGHEST, HIGHEST) —
    #     refused at EXECUTION while compiling fine; every earlier
    #     passing dot stage used default precision. These two stages pin
    #     the A/B in the conformance table. dot_highest poisons its
    #     worker (execution refusal), so it sits just before the
    #     wedger block. ---
    "dot_default_enc_shape": (
        "x = jnp.ones((1, 64, 33), jnp.float32)\n"
        "w = jnp.ones((33, 16), jnp.float32)\n"
        "OUT = jax.jit(lambda a, k: jnp.matmul(a, k))(x, w)", False),
    "dot_highest": (
        "x = jnp.ones((1, 64, 33), jnp.float32)\n"
        "w = jnp.ones((33, 16), jnp.float32)\n"
        "OUT = jax.jit(lambda a, k: jnp.matmul(a, k,\n"
        "    precision=jax.lax.Precision.HIGHEST))(x, w)", False),
    # --- known wedgers (run LAST; skipped by --skip-wedgers) ---
    "complex_scan": ("x = jnp.ones((64, 128), jnp.complex64)\n"
                     "OUT = jax.jit(lambda a: jax.lax.associative_scan(\n"
                     "    lambda p, q: p * q, a, axis=0))(x)", True),
    "s8_dot": ("a = jnp.ones((128, 128), jnp.int8)\n"
               "OUT = jax.jit(lambda m: jax.lax.dot_general(m, m,\n"
               "    (((1,), (0,)), ((), ())),\n"
               "    preferred_element_type=jnp.int32))(a)", True),
}

#: jax may be PRE-IMPORTED by a sitecustomize hook with the tunnel
#: platform selected — plain env vars are too late, so the workers apply
#: PROBE_PLATFORM through jax.config (same trick as tests/conftest.py).
_PLATFORM_PRELUDE = """\
import os
import jax
_plat = os.environ.get("PROBE_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)
"""

_WORKER_TEMPLATE = _PLATFORM_PRELUDE + """\
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, {repo!r})
from sparsernns_tpu.utils.profiling import drain_readback
ns = dict(jax=jax, jnp=jnp, np=np)
exec(compile({src!r}, "<stage>", "exec"), ns)
drain_readback(ns["OUT"], warm=True)
print("PROBE_OK")
"""

#: batch worker: warm the transport ONCE, then serve stages fed one per
#: line on stdin, draining after each and printing a marker line per
#: stage. Amortizes the per-process transport warm-up (measured
#: 2026-08-20: 540 s — at one stage per subprocess the remaining table
#: would cost hours of device time in warm-ups alone). After a stage
#: errors, a ~34 ms warm-channel health drain decides whether the
#: process survived the refusal (measured 2026-08-20: an UNIMPLEMENTED
#: compile refusal poisons EVERY later device call in the process —
#: hence the parent's warm-spare pool); if poisoned, the worker exits
#: and the parent promotes the spare.
_BATCH_TEMPLATE = _PLATFORM_PRELUDE + """\
import json as _json
import time as _time
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, {repo!r})
from sparsernns_tpu.utils.profiling import drain_readback
stages = dict({stages!r})
_warm = jnp.ones((128, 128), jnp.float32)
drain_readback(_warm @ _warm, warm=True)
print("PROBE_WARM", flush=True)
for _line in sys.stdin:
    _name = _line.strip()
    if not _name or _name == "EXIT":
        break
    _src = stages[_name]
    print("PROBE_STAGE_START " + _name, flush=True)
    _t0 = _time.time()
    try:
        ns = dict(jax=jax, jnp=jnp, np=np)
        exec(compile(_src, "<stage>", "exec"), ns)
        drain_readback(ns["OUT"])
        print("PROBE_STAGE_OK %s %.1f" % (_name, _time.time() - _t0),
              flush=True)
    except Exception as e:
        _tail = repr(e)[:300].replace(chr(10), " ")
        print("PROBE_STAGE_ERR %s %.1f %s" % (_name, _time.time() - _t0,
                                              _tail), flush=True)
        try:
            drain_readback(_warm @ _warm)
            print("PROBE_HEALTH_OK", flush=True)
        except Exception:
            print("PROBE_HEALTH_DEAD", flush=True)
            break
print("PROBE_BATCH_DONE", flush=True)
"""


class _PoolWorker:
    """One stdin-driven batch worker. The parent keeps a SPARE warming
    while the active one serves stages, so a poisoning refusal costs
    only the stage, not a fresh multi-minute transport warm-up."""

    def __init__(self, names):
        stages = [(n, STAGES[n][0]) for n in names]
        code = _BATCH_TEMPLATE.format(repo=REPO, stages=stages)
        self.proc = subprocess.Popen(
            [sys.executable, "-c", code], stdin=subprocess.PIPE,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            bufsize=1)
        self.t_launch = time.time()
        self.warm = False

    def _readline(self, timeout_s: float):
        """Line or None on timeout (select on the pipe)."""
        import select
        end = time.time() + timeout_s
        while True:
            left = end - time.time()
            if left <= 0:
                return None
            r, _, _ = select.select([self.proc.stdout], [], [],
                                    min(left, 1.0))
            if r:
                return self.proc.stdout.readline()
            if self.proc.poll() is not None:
                return ""

    def wait_warm(self, timeout_s: float) -> bool:
        if self.warm:
            return True
        end = time.time() + timeout_s
        while time.time() < end:
            line = self._readline(end - time.time())
            if line is None or line == "":
                return False
            if line.strip() == "PROBE_WARM":
                self.warm = True
                return True
        return False

    def is_warm_now(self) -> bool:
        """Non-blocking warm check."""
        return self.warm or self.wait_warm(0.01)

    def run_stage(self, name: str, timeout_s: float) -> dict:
        """Returns the stage record; rec["worker_dead"] set when the
        worker cannot take further stages (poisoned / hung / exited)."""
        try:
            self.proc.stdin.write(name + "\n")
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            return {"status": "error", "detail": "worker gone", "s": 0.0,
                    "worker_dead": True}
        t0 = time.time()
        rec = None
        deadline = t0 + timeout_s
        while True:
            line = self._readline(deadline - time.time())
            if line is None:
                rec = {"status": "hang", "s": round(time.time() - t0, 1),
                       "detail": f"killed after {timeout_s:.0f}s (pool)",
                       "worker_dead": True}
                self.kill()
                return rec
            if line == "":
                return rec or {"status": "error", "detail": "worker died",
                               "s": round(time.time() - t0, 1),
                               "worker_dead": True}
            line = line.strip()
            if line.startswith("PROBE_STAGE_OK "):
                _, n, s = line.split(" ")
                return {"status": "ok", "detail": "", "s": float(s)}
            if line.startswith("PROBE_STAGE_ERR "):
                _, n, s, detail = line.split(" ", 3)
                rec = {"status": "error", "detail": detail[:300],
                       "s": float(s)}
                # health verdict follows
                verdict = self._readline(max(60.0, deadline - time.time()))
                if verdict is None or "PROBE_HEALTH_DEAD" in (verdict or ""):
                    rec["worker_dead"] = True
                    self.kill()
                return rec

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()
        self.proc.wait()


def _run_pool(names, warm_timeout_s: float, stage_timeout_s: float,
              log, on_record=None) -> dict:
    """Warm-spare scheduler: feed ``names`` (in order) to a warm worker;
    keep one spare warming concurrently so a poisoning refusal or hang
    promotes the spare instead of paying the warm-up again. Wedge
    recovery stays with the caller (a hang record triggers it)."""
    results: dict = {}
    remaining = list(names)
    active = _PoolWorker(remaining)
    #: the spare launches only AFTER the active warms: two transports
    #: warming concurrently contend (observed 2026-08-20: solo warm
    #: 540 s, two concurrent >16 min)
    spare = None
    consecutive_warm_failures = 0
    try:
        while remaining:
            if not active.wait_warm(warm_timeout_s):
                active.kill()
                consecutive_warm_failures += 1
                log(f"pool: worker failed to warm "
                    f"({consecutive_warm_failures} in a row)")
                if consecutive_warm_failures >= 2:
                    log("pool: transport will not warm — giving up "
                        "(device down or wedged)")
                    break
                active = spare if spare is not None else \
                    _PoolWorker(remaining)
                spare = None
                continue
            consecutive_warm_failures = 0
            if spare is None:
                spare = _PoolWorker(remaining)
            name = remaining[0]
            rec = active.run_stage(name, stage_timeout_s)
            dead = rec.pop("worker_dead", False)
            results[name] = rec
            remaining.pop(0)
            log(f"pool: {name}: {rec['status']} ({rec['s']}s) "
                f"{rec['detail'][:100]}")
            if on_record is not None:
                on_record(name, rec)
            if rec["status"] == "hang":
                # possible device wedge: stop and let the caller decide
                break
            if dead:
                log("pool: promoting the spare worker")
                active.kill()
                active = spare if spare is not None else \
                    _PoolWorker(remaining)
                spare = None
    finally:
        active.kill()
        if spare is not None:
            spare.kill()
    return results


def _run_stage(name: str, timeout_s: float) -> dict:
    src = STAGES[name][0]
    code = _WORKER_TEMPLATE.format(repo=REPO, src=src)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return {"status": "hang", "detail": f"killed after {timeout_s:.0f}s",
                "s": round(time.time() - t0, 1)}
    dt = round(time.time() - t0, 1)
    if "PROBE_OK" in r.stdout:
        return {"status": "ok", "detail": "", "s": dt}
    err = (r.stderr or "").strip().splitlines()
    tail = next((ln for ln in reversed(err)
                 if ln and "WARNING" not in ln), "no stderr")
    return {"status": "error", "detail": tail[-300:], "s": dt}


def _device_healthy(timeout_s: float = 600) -> bool:
    code = (_PLATFORM_PRELUDE +
            "import jax.numpy as jnp\n"
            "import sys; sys.path.insert(0, %r)\n"
            "from sparsernns_tpu.utils.profiling import drain_readback\n"
            "x = jnp.ones((128, 128), jnp.float32)\n"
            "drain_readback(x @ x, warm=True)\n"
            "print('DEVICE_OK')\n" % REPO)
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    return "DEVICE_OK" in r.stdout


def _wait_for_recovery(max_wait_s: float, log) -> float:
    """Block until the device answers a drained matmul again (or give up).
    Returns seconds waited. The tunnel wedge self-heals after a backend
    restart; 5-minute polls keep the load negligible."""
    t0 = time.time()
    delay = 120.0
    while time.time() - t0 < max_wait_s:
        log(f"waiting {delay:.0f}s for device recovery "
            f"({time.time() - t0:.0f}s so far)")
        time.sleep(delay)
        if _device_healthy():
            waited = time.time() - t0
            log(f"device recovered after {waited:.0f}s")
            return waited
        delay = min(delay * 1.5, 600.0)
    log(f"device did NOT recover within {max_wait_s:.0f}s")
    return time.time() - t0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--stages", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--skip-wedgers", action="store_true",
                    help="skip stages marked as known device-wedgers")
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "backend_probe.json"))
    ap.add_argument("--timeout", type=float, default=240.0,
                    help="per-stage subprocess timeout (s)")
    ap.add_argument("--batch", action="store_true",
                    help="run non-wedger stages through shared batch "
                         "workers (amortizes the multi-minute transport "
                         "warm-up); wedgers stay one-per-process")
    ap.add_argument("--warm-timeout", type=float, default=600.0,
                    help="batch mode: allowance for the first stage "
                         "(includes transport warm-up)")
    ap.add_argument("--skip-done", action="store_true",
                    help="skip stages already recorded in --out")
    ap.add_argument("--max-recovery-wait", type=float, default=3600.0)
    args = ap.parse_args(argv)

    if args.list:
        for n, (_, wedger) in STAGES.items():
            print(f"{n}{'  [known-wedger]' if wedger else ''}")
        return 0

    names = (args.stages.split(",") if args.stages else
             [n for n, (_, w) in STAGES.items()
              if not (w and args.skip_wedgers)])
    unknown = [n for n in names if n not in STAGES]
    if unknown:
        print(f"unknown stages: {unknown}", file=sys.stderr)
        return 2
    # known wedgers last, preserving declaration order otherwise
    names.sort(key=lambda n: STAGES[n][1])

    def log(m):
        print(f"[probe] {m}", file=sys.stderr, flush=True)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    if args.skip_done:
        names = [n for n in names
                 if not isinstance(results.get(n), dict)
                 or results[n].get("status") not in ("ok", "error", "hang")]
        if not names:
            print(json.dumps({"ok": [], "failed": [],
                              "table": args.out, "note": "all done"}))
            return 0

    # batch mode: the first batch's own warm-up doubles as the health
    # check (an upfront _device_healthy costs a full ~6-min transport
    # warm-up of its own on the 2026-08-20 tunnel)
    if not args.batch and not _device_healthy():
        log("device not healthy at start")
        waited = _wait_for_recovery(args.max_recovery_wait, log)
        if not _device_healthy():
            results["_meta"] = {"aborted": "device never became healthy",
                                "waited_s": round(waited, 1),
                                "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
            _write(args.out, results)
            return 1

    if args.batch:
        remaining = [n for n in names if not STAGES[n][1]]
        names = [n for n in names if STAGES[n][1]]  # wedgers: isolated

        def on_record(n, rec):
            rec = dict(rec)
            rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
            results[n] = rec
            _write(args.out, results)

        rounds = 0
        while remaining and rounds < 8:
            rounds += 1
            log(f"pool round {rounds}: {len(remaining)} stages")
            got = _run_pool(remaining, args.warm_timeout, args.timeout,
                            log, on_record=on_record)
            progressed = bool(got)
            remaining = [n for n in remaining if n not in got]
            hung = any(r.get("status") == "hang" for r in got.values())
            if hung:
                log("pool saw a hang — checking device health")
                if not _device_healthy():
                    _wait_for_recovery(args.max_recovery_wait, log)
                    if not _device_healthy():
                        log("stopping: device did not recover")
                        remaining = []
                        break
            elif not progressed:
                log("pool made no progress — checking device health "
                    "(a refusal can wedge the device for later clients)")
                if not _device_healthy():
                    _wait_for_recovery(args.max_recovery_wait, log)
                    if not _device_healthy():
                        log("stopping: device did not recover")
                        break
                else:
                    # the device recovered while the pool was giving up
                    # (observed 2026-08-20: wedge cleared during the
                    # second warm window) — retry, the rounds cap bounds
                    # the loop
                    log("device healthy — retrying the pool")

    for name in names:
        rec = _run_stage(name, args.timeout)
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        results[name] = rec
        log(f"{name}: {rec['status']} ({rec['s']}s) {rec['detail'][:120]}")
        _write(args.out, results)
        if rec["status"] == "hang":
            log(f"{name} hung — checking whether it wedged the device")
            if not _device_healthy():
                rec["wedged_device"] = True
                _write(args.out, results)
                _wait_for_recovery(args.max_recovery_wait, log)
                if not _device_healthy():
                    log("stopping: device did not recover")
                    break
    ok = sorted(n for n, r in results.items()
                if isinstance(r, dict) and r.get("status") == "ok")
    bad = sorted(n for n, r in results.items()
                 if isinstance(r, dict) and r.get("status") in
                 ("error", "hang"))
    print(json.dumps({"ok": ok, "failed": bad,
                      "table": args.out}))
    return 0


def _write(path, results):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    sys.exit(main())
