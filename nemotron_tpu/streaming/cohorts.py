"""Phase-staggered cohort serving: multiply stream capacity by duty cycle.

At the single-slab headline the chip is ~10% busy: 800 streams' 1120 ms
chunk is processed in ~118 ms, then the TensorCore idles until the next
chunk of audio EXISTS. The latency bar (<120 ms per chunk), not
throughput, is what stops a bigger slab -- growing B past ~800 pushes the
step itself over the bar.

The idle 90% is recoverable without touching the step: run C independent
cohorts of B streams whose chunk arrivals are staggered by 1/C of the
chunk period (assign each incoming stream to the cohort whose phase
matches its arrival -- admission-time bookkeeping, no resampling). Each
cohort's tick is the same ~118 ms program; the device serves them
round-robin, so per-chunk latency stays one step time while capacity
becomes C x B. The budget is

    C  <=  floor(chunk_period / step_time)      (compute)
    C  <=  (HBM - weights) / (B * state_bytes)  (memory)

at full size (R=13, w8a8+int8kv: ~4.6 MB/slot) memory binds first:
C=3 x 800 fits a 16 GB v5e with room for activations; int4 KV rings
(the round-3 memory option) halve state again for C=5-6.

Implementation: C `LockstepEngine`s sharing one set of device-resident
weights (cast_params is identity on already-cast leaves, so only the
FIRST engine allocates; asserted in tests). The jitted tick executable is
shared too (same shapes -> one compile). Global stream ids are
`cohort * B + lane`.

The reference has no analogue (one session per process); this is the
TPU-shaped answer to "the chip is latency-bound, not throughput-bound".
"""

from __future__ import annotations

import numpy as np

from ..config import CacheConfig, ModelConfig
from .lockstep import LockstepEngine


class CohortScheduler:
    """C phase-staggered LockstepEngine cohorts sharing one weight set.

    The caller drives cadence: at wall-clock phase (c/C) * chunk_period,
    feed cohort c one `cc.shift_samples` PCM block per stream via
    `tick(c, pcm)`. `assign(arrival_s)` returns the cohort whose phase is
    nearest to a new stream's arrival time, which is what keeps every
    stream's first chunk from waiting more than chunk_period / (2C).
    """

    def __init__(self, params, cfg: ModelConfig,
                 vocab: list[str] | None = None,
                 cache_config: CacheConfig | None = None,
                 n_streams: int = 256, n_cohorts: int = 2,
                 **engine_kw):
        if n_cohorts < 1:
            raise ValueError(f"n_cohorts must be >= 1, got {n_cohorts}")
        self.cfg = cfg
        self.cc = cache_config or CacheConfig(n_mels=cfg.n_mels)
        self.n_streams = n_streams          # per cohort
        self.n_cohorts = n_cohorts
        self.engines: list[LockstepEngine] = []
        for c in range(n_cohorts):
            # after the first engine casts the params, sharing its pytree
            # makes every later cast a no-op over the SAME device buffers
            p = self.engines[0].params if self.engines else params
            eng = LockstepEngine(p, cfg, vocab, self.cc,
                                 n_streams=n_streams, **engine_kw)
            if self.engines:
                eng.pos_heads = self.engines[0].pos_heads
                eng.window = self.engines[0].window
                eng.filterbank = self.engines[0].filterbank
            self.engines.append(eng)

    # -- stream-id mapping ---------------------------------------------------

    def stream_id(self, cohort: int, lane: int) -> int:
        return cohort * self.n_streams + lane

    def locate(self, stream_id: int) -> tuple[int, int]:
        return divmod(stream_id, self.n_streams)

    def assign(self, arrival_s: float) -> int:
        """Cohort whose tick phase is nearest AFTER an arrival at
        `arrival_s` (seconds, any epoch): the stream's first chunk
        completes right as its cohort ticks."""
        period = self.cc.chunk_samples / self.cc.sample_rate
        frac = (arrival_s % period) / period
        return int(np.ceil(frac * self.n_cohorts)) % self.n_cohorts

    # -- serving ---------------------------------------------------------------

    def tick(self, cohort: int, pcm_i16: np.ndarray,
             pipelined: bool = False) -> dict[int, str]:
        """One cohort's tick; keys of the returned text dict are GLOBAL
        stream ids. pcm_i16: [n_streams, samples]."""
        eng = self.engines[cohort]
        out = (eng.tick_pipelined if pipelined else eng.tick)(pcm_i16)
        base = cohort * self.n_streams
        return {base + s: t for s, t in out.items()}

    def finalize(self) -> list[str]:
        """Flush every cohort; returns all C*B transcripts in global
        stream-id order."""
        texts: list[str] = []
        for eng in self.engines:
            texts.extend(eng.finalize())
        return texts

    @property
    def transcripts(self) -> list[str]:
        out: list[str] = []
        for eng in self.engines:
            out.extend(eng.transcripts)
        return out

    def refresh_transcripts(self) -> list[str]:
        for eng in self.engines:
            eng.refresh_transcripts()
        return self.transcripts

    # -- snapshots ---------------------------------------------------------------

    def save(self, prefix: str) -> None:
        """One snapshot file per cohort: <prefix>.cohort<k>.npz."""
        for c, eng in enumerate(self.engines):
            eng.save(f"{prefix}.cohort{c}.npz")

    def load(self, prefix: str) -> None:
        for c, eng in enumerate(self.engines):
            eng.load(f"{prefix}.cohort{c}.npz")
