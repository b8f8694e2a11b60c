"""Streaming / stateful audio denoising — the serving path.

The reference only processes whole 30 s clips (SURVEY.md §5: no streaming
exists). Here inference is chunked: per-layer SSM carries live in the flax
"cache" collection (see S5SSM._carry) and flow between chunks, so a
stream of arbitrary length runs in O(chunk) memory with bit-identical
recurrence to the offline scan. The STFT analysis is uncentered (frame k
covers samples [k·hop, k·hop + nfft)); synthesis is boxcar overlap-add
with samples emitted once no future frame can touch them.

The chunk forward is ONE jitted function of (variables, cache, frames) ->
(mask, new cache); batch B streams B channels concurrently (continuous
batching = fixed B with per-slot cache/stream reset via `reset(slot)`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparsernns_tpu.ops.stft import HOP_LENGTH, NFFT
from sparsernns_tpu.train.losses import STFT_MAG_MEAN


class StreamingDenoiser:
    """Stateful chunked inference around an eval-mode RegressionModel —
    or, via :meth:`from_engine`, around the quantized W8A16Engine (incl.
    its mxu16 int-dot mode), so continuous batching serves the same
    kernels the offline engine does."""

    def __init__(self, model, variables: Dict, batch_size: int = 1,
                 hop: int = HOP_LENGTH, nfft: int = NFFT,
                 frame_multiple: int = 1):
        self.model = model
        self.variables = dict(variables)
        self.batch = batch_size
        self.hop = hop
        self.nfft = nfft
        self.overlap = nfft // hop
        #: frames are consumed in multiples of this (buffering the rest):
        #: engine backing sets it to the engine's time block so every
        #: forward honours the fused carry kernels' chunk contract
        self.frame_multiple = frame_multiple

        @jax.jit
        def forward(variables, cache, frames_mag):
            # frames_mag: (B, F, T) magnitudes; returns (mask, new cache)
            x = jnp.transpose(frames_mag - STFT_MAG_MEAN, (0, 2, 1))
            vs = dict(variables)
            if cache:
                vs["cache"] = cache
            out, mutated = self.model.apply(vs, x, mutable=["cache"])
            return jnp.transpose(out, (0, 2, 1)), mutated.get("cache", {})

        self._forward = forward
        self.reset()

    @classmethod
    def from_engine(cls, engine, batch_size: int = 1,
                    hop: int = HOP_LENGTH, nfft: int = NFFT
                    ) -> "StreamingDenoiser":
        """Streaming denoiser over the quantized serving engine
        (quantize/engine.W8A16Engine.process_chunk): per-layer (B, P)
        state-pair carries, same fused/whole-layer kernels and mxu16
        int dots as offline serving. Frames buffer to the engine's
        ``block_t`` so each forward is one whole time block."""
        self = cls.__new__(cls)
        self.model = None
        self.engine = engine
        self.variables = {}
        self.batch = batch_size
        self.hop = hop
        self.nfft = nfft
        self.overlap = nfft // hop
        self.frame_multiple = int(engine.block_t)

        def forward(variables, cache, frames_mag):
            x = jnp.transpose(frames_mag - STFT_MAG_MEAN, (0, 2, 1))
            carries = cache if cache else None
            out, new_carries = engine.process_chunk(x, carries)
            return jnp.transpose(out, (0, 2, 1)), new_carries

        self._forward = forward
        self.reset()
        return self

    def reset(self, slot: Optional[int] = None):
        if slot is None:
            self.cache: Optional[Dict] = None
            self._pending = np.zeros((self.batch, 0), np.float32)
            self._ola = np.zeros((self.batch, 0), np.float32)
            self._ola_w = np.zeros((0,), np.float32)
            self._emit_pos = 0      # global sample index of next emit
            self._ola_start = 0     # global sample index of _ola[:, 0]
            self._frames_done = 0   # global frames processed so far
            self._in_pos = 0        # global samples ingested so far
        else:
            if self.cache is not None:
                self.cache = jax.tree_util.tree_map(
                    lambda c: c.at[slot].set(0.0), self.cache)
            self._pending[slot] = 0.0
            self._ola[slot] = 0.0

    def process(self, audio_chunk: np.ndarray) -> np.ndarray:
        """Feed (B, T) new samples; returns finalized denoised samples
        (empty until a full analysis frame is available)."""
        audio_chunk = np.atleast_2d(np.asarray(audio_chunk, np.float32))
        assert audio_chunk.shape[0] == self.batch
        self._pending = np.concatenate([self._pending, audio_chunk], axis=1)
        self._in_pos += audio_chunk.shape[1]

        n_avail = self._pending.shape[1]
        if n_avail < self.nfft:
            return np.zeros((self.batch, 0), np.float32)
        n_frames = (n_avail - self.nfft) // self.hop + 1
        n_frames -= n_frames % self.frame_multiple
        if n_frames <= 0:
            return np.zeros((self.batch, 0), np.float32)
        return self._run_frames(n_frames)

    def _run_frames(self, n_frames: int) -> np.ndarray:
        starts = np.arange(n_frames) * self.hop
        frames = np.stack(
            [self._pending[:, s:s + self.nfft] for s in starts], axis=1)
        spec = np.fft.rfft(frames, axis=-1)          # (B, T, F)
        mag = np.abs(spec).astype(np.float32).transpose(0, 2, 1)
        phase = np.angle(spec).transpose(0, 2, 1)

        mask, self.cache = self._forward(
            self.variables, self.cache, jnp.asarray(mag))
        cleaned = mag * (1.0 + np.asarray(mask))
        spec_out = (cleaned * np.exp(1j * phase)).transpose(0, 2, 1)
        time_frames = np.fft.irfft(spec_out, axis=-1).astype(np.float32)

        # --- overlap-add into the global synthesis buffer ---
        first_global = self._frames_done * self.hop
        last_end = first_global + (n_frames - 1) * self.hop + self.nfft
        need = last_end - self._ola_start
        if need > self._ola.shape[1]:
            grow = need - self._ola.shape[1]
            self._ola = np.pad(self._ola, ((0, 0), (0, grow)))
            self._ola_w = np.pad(self._ola_w, (0, grow))
        for t in range(n_frames):
            s = first_global + t * self.hop - self._ola_start
            self._ola[:, s:s + self.nfft] += time_frames[:, t]
            self._ola_w[s:s + self.nfft] += 1.0

        self._frames_done += n_frames
        # keep the last (overlap-1) hops of input as context for the next
        # frame, drop fully-consumed samples
        self._pending = self._pending[:, n_frames * self.hop:]

        # --- emit samples no future frame (start >= next_start) touches ---
        next_start = self._frames_done * self.hop
        emit_until = next_start  # future frames cover [next_start, ...)
        if emit_until <= self._emit_pos:
            return np.zeros((self.batch, 0), np.float32)
        lo = self._emit_pos - self._ola_start
        hi = emit_until - self._ola_start
        w = np.maximum(self._ola_w[lo:hi], 1.0)
        out = self._ola[:, lo:hi] / w[None, :]
        # drop emitted region from the buffer
        self._ola = self._ola[:, hi:]
        self._ola_w = self._ola_w[hi:]
        self._ola_start = emit_until
        self._emit_pos = emit_until
        return out

    def flush(self) -> np.ndarray:
        """Emit everything accumulated (end of stream). Frames still
        buffered by the frame_multiple flooring are processed first (a
        final sub-multiple forward — always a single time block)."""
        outs = []
        if self.frame_multiple > 1 and self._pending.shape[1] >= self.nfft:
            n_frames = (self._pending.shape[1] - self.nfft) // self.hop + 1
            if n_frames > 0:
                outs.append(self._run_frames(n_frames))
        if self._ola.shape[1] == 0:
            return (np.concatenate(outs, axis=-1) if outs
                    else np.zeros((self.batch, 0), np.float32))
        w = np.maximum(self._ola_w, 1.0)
        out = self._ola / w[None, :]
        self._ola = np.zeros((self.batch, 0), np.float32)
        self._ola_w = np.zeros((0,), np.float32)
        self._ola_start = self._emit_pos = self._emit_pos + out.shape[1]
        outs.append(out)
        return np.concatenate(outs, axis=-1)

    def process_offline(self, audio: np.ndarray,
                        chunk_samples: int = 16000) -> np.ndarray:
        """Stream a whole signal chunk-by-chunk and stitch the output."""
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        outs = []
        for start in range(0, audio.shape[-1], chunk_samples):
            outs.append(self.process(audio[:, start:start + chunk_samples]))
        outs.append(self.flush())
        return np.concatenate([o for o in outs if o.size], axis=-1)


class ContinuousBatcher:
    """Continuous batching of independent audio streams over the fixed-B
    StreamingDenoiser: per-slot ADMISSION (new streams join a live batch
    on a free slot, carries reset for that slot only), per-stream output
    routing, and a waiting queue when all slots are busy.

    Semantics: all slots advance on the batch's global frame clock; a
    stream admitted at global sample time T behaves exactly like a solo
    stream whose audio is preceded by T zero samples (tested in
    test_streaming.py). The serving north star's "continuous batching of
    streaming audio sequences" (BASELINE.json); no reference equivalent.
    """

    def __init__(self, denoiser: StreamingDenoiser):
        self.denoiser = denoiser
        self.slots: list = [None] * denoiser.batch
        self._inputs: Dict[str, np.ndarray] = {}
        self._outputs: Dict[str, list] = {}
        self._waiting: list = []
        self._ended: set = set()
        #: global sample index one past each stream's last REAL sample —
        #: a slot is only recycled once emission has passed it, so the
        #: per-slot reset can never destroy unprocessed tail audio (the
        #: engine path buffers up to block_t-1 frames in _pending)
        self._content_end: Dict[str, int] = {}
        #: global sample index of each stream's FIRST real sample (its
        #: admission ingest position): emissions before it belong to the
        #: slot's previous occupant / pre-admission silence and are NOT
        #: routed to the stream — collect() is content-exact even under
        #: admission churn (emission lags ingestion, so without this
        #: clip a freshly admitted stream would receive the tail of the
        #: previous stream's denoised silence)
        self._content_start: Dict[str, int] = {}

    @property
    def n_free(self) -> int:
        return sum(s is None for s in self.slots)

    def add_stream(self, stream_id: str) -> Optional[int]:
        """Admit a stream; returns its slot, or None if queued."""
        if stream_id in self._inputs:
            raise ValueError(f"stream {stream_id!r} already active")
        self._inputs[stream_id] = np.zeros((0,), np.float32)
        self._outputs[stream_id] = []
        for i, s in enumerate(self.slots):
            if s is None:
                self.slots[i] = stream_id
                self.denoiser.reset(slot=i)
                self._content_start[stream_id] = self.denoiser._in_pos
                return i
        self._waiting.append(stream_id)
        return None

    def feed(self, stream_id: str, samples: np.ndarray):
        self._inputs[stream_id] = np.concatenate(
            [self._inputs[stream_id], np.asarray(samples, np.float32)])

    def end_stream(self, stream_id: str):
        """No more input; the stream finishes once its buffer drains."""
        self._ended.add(stream_id)

    def step(self, chunk_samples: int) -> int:
        """Advance the global clock by ``chunk_samples``: every occupied
        slot consumes that many samples from its stream's buffer
        (zero-padded if starved), idle slots feed silence; finished
        streams release their slots to the waiting queue.

        Returns the number of REAL samples consumed across slots this
        step (excluding starvation zero-padding) — the honest payload
        measure for throughput accounting (ADVICE r4)."""
        start = self.denoiser._in_pos
        real_samples = 0
        batch = np.zeros((self.denoiser.batch, chunk_samples), np.float32)
        for i, sid in enumerate(self.slots):
            if sid is None:
                continue
            buf = self._inputs[sid]
            take = min(chunk_samples, buf.shape[0])
            batch[i, :take] = buf[:take]
            self._inputs[sid] = buf[take:]
            real_samples += take
            if take:
                self._content_end[sid] = start + take
        emit0 = self.denoiser._emit_pos
        out = self.denoiser.process(batch)
        for i, sid in enumerate(self.slots):
            if sid is not None and out.shape[1]:
                # route only samples inside the stream's real content —
                # emissions past content_end are denoised trailing
                # silence, not the stream's audio
                end = self._content_end.get(sid, emit0 + out.shape[1])
                lo = max(0, self._content_start.get(sid, 0) - emit0)
                hi = min(out.shape[1], max(0, end - emit0))
                if hi > lo:
                    self._outputs[sid].append(out[i, lo:hi])
        # release drained+ended+fully-EMITTED streams, admit from the
        # queue (emission trails ingestion by the analysis window plus
        # any frame_multiple buffering; recycling earlier would zero the
        # slot's unprocessed tail)
        for i, sid in enumerate(self.slots):
            if (sid is not None and sid in self._ended
                    and self._inputs[sid].shape[0] == 0
                    and self.denoiser._emit_pos
                    >= self._content_end.get(sid, 0)):
                self.slots[i] = None
                if self._waiting:
                    nxt = self._waiting.pop(0)
                    self.slots[i] = nxt
                    self.denoiser.reset(slot=i)
                    self._content_start[nxt] = self.denoiser._in_pos
        return real_samples

    def backlog_samples(self) -> int:
        """Largest per-slot buffered sample count — how far behind the
        batch clock the most-backlogged live stream is."""
        return max((self._inputs[sid].shape[0]
                    for sid in self.slots if sid is not None), default=0)

    def step_auto(self, chunk_samples: int, max_chunks: int = 8) -> int:
        """Backlog-adaptive step (VERDICT r4 #6): per-chunk latency is
        dispatch-dominated (~0.5 ms fixed vs ~0.002 ms compute at serving
        chunk sizes — PERF.md round-4 streaming table), so under load the
        right move is to consume SEVERAL buffered chunks in one dispatch
        rather than dispatching per chunk. Advances the global clock by
        n * chunk_samples where n = clamp(backlog // chunk, 1,
        max_chunks); one dispatch amortizes its fixed cost over n chunks.
        Per-stream output semantics are identical to n sequential step()
        calls with no feeds in between (the denoiser consumes all
        buffered frames of a process() call in one dispatch already);
        the only difference is that slot release / queue admission runs
        once at the end instead of between chunks. Returns real samples
        consumed, like step()."""
        n = max(1, min(max_chunks,
                       self.backlog_samples() // max(1, chunk_samples)))
        return self.step(n * chunk_samples)

    def collect(self, stream_id: str) -> np.ndarray:
        """Denoised samples produced so far for a stream."""
        chunks = self._outputs.get(stream_id, [])
        if not chunks:
            return np.zeros((0,), np.float32)
        out = np.concatenate(chunks)
        self._outputs[stream_id] = [out]
        return out
