"""Surgical jaxpr prefix bisect: convict the exact equation the tunnel
backend's compile service refuses.

Round-4 context (runs/backend_probe.json, 2026-08-20): every op-level
probe stage passes, a hand-built flax-free model forward passes, but the
flax-traced model program is refused UNIMPLEMENTED in <1 s — and the
metadata-stripped jaxpr relay (utils/relay.py) is refused identically,
so the convicting construct is genuine op CONTENT, not lowering
metadata. The op-multiset diff between the refused and passing programs
is {div, min, neg, rsqrt, 2 extra nested pjit eqns} — each fine
standalone, so only a program-level bisect can decide.

Method: trace the refused fn once, then compile (compile ONLY — the
refusal surfaces at .compile(), no execution, no wedge risk) prefixes
eqns[:k] for k = 1..n in ONE warm process. The first refused k convicts
eqn k-1 (primitive, shapes, params recorded). A compile refusal poisons
every later device call in the process (measured 2026-08-20), so the
scan runs k ascending: exactly one refusal ends the run with the
conviction in hand. If the convicted eqn is a nested pjit, rerun with
--inline to flatten pjit bodies first so the conviction lands on a leaf
primitive.

Usage:
  python tools/jaxpr_bisect.py                 # tiny blocked model
  python tools/jaxpr_bisect.py --inline        # flatten nested pjit eqns
  python tools/jaxpr_bisect.py --target engine # w8a16 xla-route engine
  python tools/jaxpr_bisect.py --start K       # resume from prefix K

Results append to runs/jaxpr_bisect.json.

Reference context: the reference never needs this — its CUDA backend
accepts whatever torch emits (sparseRNNs/train_helpers.py has no
backend gating). A tunnel TPU transport offers no such guarantee.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build_target(name: str):
    """Returns (fn, example_args) for the refused program class."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    if name == "model":
        from __graft_entry__ import _flagship_model
        model = _flagship_model(d_model=16, ssm_size=16, blocks=2,
                                n_layers=2, d_io=33, training=False,
                                scan_mode="blocked")
        x = jnp.zeros((1, 64, 33), jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        rng = np.random.RandomState(0)
        v = jax.tree_util.tree_map(
            lambda s: (0.1 * np.abs(rng.randn(*s.shape)) + 0.01
                       ).astype(s.dtype), shapes)
        return (lambda vv, xx: model.apply(vv, xx)), (v, x)
    if name == "engine":
        from bench import _build_engine
        engine, variables, x = _build_engine(1, 64, 257, route="xla")
        return (lambda w, xi: engine._apply(w, xi,
                                            block_t=engine.block_t),
                (engine.weights, x))
    raise SystemExit(f"unknown target {name!r}")


def _inline_pjits(jaxpr):
    """Flatten nested pjit/closed_call eqns into the parent eqn list so
    the prefix scan convicts a LEAF primitive. Constvars of sub-jaxprs
    are rebound through fresh intermediate names."""
    from jax._src import core as jcore

    out_eqns = []
    for eqn in jaxpr.eqns:
        sub = None
        if eqn.primitive.name in ("pjit", "closed_call", "custom_jvp_call",
                                  "custom_vjp_call", "remat"):
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    sub = eqn.params[key]
                    break
        if sub is None:
            out_eqns.append(eqn)
            continue
        closed = sub if isinstance(sub, jcore.ClosedJaxpr) else None
        inner = closed.jaxpr if closed is not None else sub
        if closed is not None and closed.consts:
            # constvars feed literals — alpha-rename is overkill here;
            # skip inlining eqns with captured consts (rare at this size)
            out_eqns.append(eqn)
            continue
        inner = _inline_pjits(inner)
        # alpha-substitute: inner invars -> eqn invars, inner outvars ->
        # eqn outvars
        sub_map = dict(zip(inner.invars, eqn.invars))
        for iv, ov in zip(inner.outvars, eqn.outvars):
            sub_map[iv] = ov

        def subst(v):
            from jax._src.core import Literal
            if isinstance(v, Literal):
                return v
            return sub_map.get(v, v)

        for ieqn in inner.eqns:
            new_in = [subst(v) for v in ieqn.invars]
            new_out = [subst(v) for v in ieqn.outvars]
            out_eqns.append(ieqn.replace(invars=new_in, outvars=new_out))
    return jaxpr.replace(eqns=out_eqns)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--target", default="model",
                    choices=("model", "engine"))
    ap.add_argument("--inline", action="store_true",
                    help="flatten nested pjit bodies before scanning")
    ap.add_argument("--start", type=int, default=1,
                    help="first prefix length to compile (resume point)")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--default-precision", action="store_true",
                    help="rewrite every dot's precision param to the "
                         "backend default before scanning (the convicted "
                         "construct: HIGHEST-precision dots refuse at "
                         "execution on the tunnel)")
    ap.add_argument("--execute", action="store_true",
                    help="EXECUTE each prefix (compile + run + 1-elem "
                         "drain) instead of compile-only — convicts "
                         "runtime refusals (round-4 finding: the full "
                         "stripped model program COMPILES on the tunnel "
                         "but the relay probe stage fails at execution)")
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "jaxpr_bisect.json"))
    args = ap.parse_args(argv)

    import jax
    # jax may be pre-imported with the tunnel platform selected; honor
    # PROBE_PLATFORM via jax.config like tools/backend_probe.py does
    plat = os.environ.get("PROBE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from jax._src import core as jcore
    from sparsernns_tpu.utils.relay import strip_source_info

    fn, ex = _build_target(args.target)
    jpr = jax.make_jaxpr(fn)(*ex)
    jpr = strip_source_info(jpr)  # metadata already ruled out; keep one
    #                               variable between this and the relay
    if args.default_precision:
        from sparsernns_tpu.utils.relay import normalize_dot_precision
        jpr = normalize_dot_precision(jpr)
    jaxpr = jpr.jaxpr
    if args.inline:
        jaxpr = _inline_pjits(jaxpr)
    n = len(jaxpr.eqns)
    flat, _ = jax.tree_util.tree_flatten(ex)
    print(f"[bisect] target={args.target} inline={args.inline} "
          f"eqns={n}", file=sys.stderr, flush=True)

    rec = {"target": args.target, "inline": args.inline,
           "execute": args.execute,
           "default_precision": args.default_precision, "eqns": n,
           "ts": time.strftime("%Y-%m-%d %H:%M:%S"), "prefix_ok": 0,
           "convicted": None, "log": []}

    def flush():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        existing = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing = [r for r in existing
                    if not (r.get("target") == rec["target"]
                            and r.get("inline") == rec["inline"]
                            and r.get("execute") == rec["execute"]
                            and r.get("default_precision")
                            == rec["default_precision"])]
        existing.append(rec)
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)

    def prefix_compile(k: int) -> tuple[bool, str]:
        eqns = jaxpr.eqns[:k]
        outs = [v for v in eqns[-1].outvars
                if not isinstance(v, jcore.DropVar)]
        if not outs:
            return True, "no-outvars (skipped)"
        sub = jaxpr.replace(eqns=eqns, outvars=outs)

        def f(*leaves):
            return jcore.eval_jaxpr(sub, jpr.literals, *leaves)

        t0 = time.time()
        try:
            if args.execute:
                from sparsernns_tpu.utils.profiling import drain_readback
                out = jax.jit(f)(*flat)
                drain_readback(out, warm=(k == args.start))
            else:
                jax.jit(f).lower(*flat).compile()
            return True, f"{time.time() - t0:.1f}s"
        except Exception as e:  # noqa: BLE001 — record any refusal class
            return False, repr(e)[:300]

    for k in range(args.start, n + 1, args.stride):
        ok, detail = prefix_compile(k)
        eqn = jaxpr.eqns[k - 1]
        desc = (f"{eqn.primitive.name} "
                f"{[str(v.aval) for v in eqn.invars if hasattr(v, 'aval')]}"
                f" -> {[str(v.aval) for v in eqn.outvars]}")
        if ok:
            rec["prefix_ok"] = k
            if k % 10 == 0 or k == n:
                print(f"[bisect] prefix {k}/{n} ok ({detail}) last={desc}",
                      file=sys.stderr, flush=True)
                flush()
        else:
            rec["convicted"] = {
                "k": k, "primitive": eqn.primitive.name, "eqn": desc,
                "params": {p: repr(val)[:200]
                           for p, val in eqn.params.items()},
                "detail": detail}
            print(f"[bisect] CONVICTED at k={k}: {desc}\n  {detail}",
                  file=sys.stderr, flush=True)
            flush()
            print(json.dumps(rec["convicted"]))
            return 0
    flush()
    print(json.dumps({"prefix_ok": rec["prefix_ok"], "convicted": None,
                      "note": "full program compiled — refusal must "
                              "come from outvar structure or execution"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
