"""ContinuousBatcher churn soak on hardware.

The round-4 streaming bench timed the steady-state chunk forward
(bench_streaming.py); admission/retirement churn — streams of varied
lengths arriving while a live batch advances, slots recycling through
the waiting queue — was only ever exercised by the CPU logic tests.
This soak drives the real engine-backed batcher on the device:

- batch-B StreamingDenoiser.from_engine (w8a16, block_t=chunk frames),
- seeded random arrivals (lengths 1-4 s, Poisson-ish admissions),
- per-step wall-clock (each step ends in a device readback, so on the
  drain-channel backend time-to-readback scales with the queued work;
  latencies are transport-INCLUSIVE, same label as the e2e percentiles
  in bench_streaming.py),
- a content-exactness canary: one stream admitted at global time 0 is
  re-run solo through a fresh denoiser and compared sample-exact (the
  batcher's admission semantics promise byte-identical output;
  tests/test_streaming.py pins this on CPU — this checks it on the
  real kernels on hardware).

Appends to runs/stream_soak.json and prints one summary JSON line.

Usage: python tools/stream_soak.py [--steps 120] [--batch 8]
       [--chunk-frames 64] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "runs", "stream_soak.json")
SAMPLE_RATE = 16000


def _percentile(durs, q):
    import math
    s = sorted(durs)
    if not s:
        return None
    i = max(0, min(len(s) - 1, math.ceil(q / 100 * len(s)) - 1))
    return s[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk-frames", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arrival-rate", type=float, default=0.8,
                    help="mean new streams per step")
    args = ap.parse_args()
    if args.steps < 1:
        sys.exit("stream_soak: need --steps >= 1 (no steps means no "
                 "latency percentiles to report)")

    import bench
    from sparsernns_tpu.ops.stft import HOP_LENGTH
    from sparsernns_tpu.serve.streaming import (ContinuousBatcher,
                                                StreamingDenoiser)

    chunk_samples = args.chunk_frames * HOP_LENGTH
    rng = np.random.RandomState(args.seed)

    engine, _, _ = bench._build_engine(args.batch, args.chunk_frames, 257,
                                       block_t=args.chunk_frames)
    den = StreamingDenoiser.from_engine(engine, batch_size=args.batch)
    bat = ContinuousBatcher(den)

    # pre-generated stream library: id -> audio (1-4 s)
    def new_stream(i):
        n = int(rng.uniform(1.0, 4.0) * SAMPLE_RATE)
        return f"s{i}", (rng.randn(n) * 0.05).astype(np.float32)

    streams, feed_pos, ended = {}, {}, set()
    next_id = 0
    admitted = completed = 0
    max_queue = 0
    canary_id = None

    def admit(n):
        nonlocal next_id, admitted, canary_id
        for _ in range(n):
            sid, audio = new_stream(next_id)
            next_id += 1
            streams[sid] = audio
            feed_pos[sid] = 0
            bat.add_stream(sid)
            admitted += 1
            if canary_id is None:
                canary_id = sid

    admit(args.batch)  # fill the batch at t=0 (canary admitted at T=0)

    durs = []
    payload_frames = 0
    t_soak0 = time.perf_counter()
    for step in range(args.steps):
        # feed each live stream its next chunk of audio; end drained ones
        for sid in list(streams):
            if sid in ended:
                continue
            audio = streams[sid]
            pos = feed_pos[sid]
            if pos >= audio.shape[0]:
                bat.end_stream(sid)
                ended.add(sid)
                continue
            bat.feed(sid, audio[pos:pos + chunk_samples])
            feed_pos[sid] = pos + chunk_samples
        n_before = sum(s is not None for s in bat.slots)
        t0 = time.perf_counter()
        real_samples = bat.step(chunk_samples)
        durs.append(time.perf_counter() - t0)
        # honest payload: only REAL samples consumed (starved /
        # drained-awaiting-emission slots advance on zero-padding and
        # must not inflate rtf_aggregate — ADVICE r4)
        payload_frames += real_samples // HOP_LENGTH
        n_after = sum(s is not None for s in bat.slots)
        completed += max(0, n_before - n_after)
        # churn: admit a random number of new arrivals (bounded queue)
        if len(bat._waiting) < 2 * args.batch:
            admit(int(rng.poisson(args.arrival_rate)))
        max_queue = max(max_queue, len(bat._waiting))
    t_soak = time.perf_counter() - t_soak0

    # ---- content-exactness canary: solo replay of the T=0 stream ----
    canary_out = bat.collect(canary_id)
    solo = StreamingDenoiser.from_engine(engine, batch_size=args.batch)
    audio = streams[canary_id]
    outs = []
    for start in range(0, audio.shape[0], chunk_samples):
        # always advance a FULL chunk (zero-padded tail) — the batcher's
        # step() pads starved slots the same way, so frame boundaries
        # line up sample-exactly
        x = np.zeros((args.batch, chunk_samples), np.float32)
        seg = audio[start:start + chunk_samples]
        x[0, :seg.shape[0]] = seg
        outs.append(solo.process(x))
    # keep feeding silence until the solo emission covers the batched one
    while sum(o.shape[1] for o in outs) < canary_out.shape[0]:
        outs.append(solo.process(
            np.zeros((args.batch, chunk_samples), np.float32)))
    solo_out = np.concatenate([o[0] for o in outs if o.size], axis=-1)
    n = min(canary_out.shape[0], solo_out.shape[0])
    max_diff = (float(np.max(np.abs(canary_out[:n] - solo_out[:n])))
                if n else float("nan"))

    steady = durs[3:] if len(durs) > 6 else durs
    audio_s = payload_frames * HOP_LENGTH / SAMPLE_RATE
    rec = {
        "tool": "stream_soak", "steps": args.steps, "batch": args.batch,
        "chunk_frames": args.chunk_frames, "seed": args.seed,
        "backend": __import__("jax").default_backend(),
        "admitted": admitted, "completed": completed,
        "max_queue": max_queue,
        "payload_frames": payload_frames,
        "payload_audio_s": round(audio_s, 2),
        "soak_wall_s": round(t_soak, 3),
        "rtf_aggregate": round(audio_s / t_soak, 1),
        "step_p50_ms": round(_percentile(steady, 50) * 1e3, 3),
        "step_p95_ms": round(_percentile(steady, 95) * 1e3, 3),
        "step_p99_ms": round(_percentile(steady, 99) * 1e3, 3),
        "latency_note": "transport-inclusive wall per batcher step "
                        "(readback each step; excludes first 3 warmup)",
        "canary_stream": canary_id,
        "canary_samples": int(n),
        "canary_max_abs_diff": max_diff,
        "canary_exact": bool(n > 0 and max_diff == 0.0),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }

    hist = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            hist = json.load(f)
    hist.append(rec)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
