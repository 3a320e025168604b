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


class ServingCohorts:
    """Phase-staggered cohorts of RAGGED `ServingEngine`s (VERDICT r4
    item 4: cohort stacking for the realistic-arrival engine, not just the
    fused lockstep slab).

    Same capacity argument as `CohortScheduler` -- C staggered engine
    ticks reclaim the chip's idle duty cycle -- but each cohort is a full
    continuous-batching engine: per-slot rates, admission/eviction,
    ring realignment, endpointing. Streams are assigned to the cohort
    whose tick phase matches their arrival (`assign`), then live their
    whole life in that cohort's engine; all engines share one set of
    device-resident weights and pos-emb projections (the cast in later
    engines is a no-op over the same buffers, like CohortScheduler).

    Global stream ids are `cohort * n_slots + slot`."""

    def __init__(self, params, cfg: ModelConfig,
                 vocab: list[str] | None = None,
                 cache_config: CacheConfig | None = None,
                 n_slots: int = 64, n_cohorts: int = 2,
                 **engine_kw):
        from .serving import ServingEngine

        if n_cohorts < 1:
            raise ValueError(f"n_cohorts must be >= 1, got {n_cohorts}")
        self.cfg = cfg
        self.cc = cache_config or CacheConfig(n_mels=cfg.n_mels)
        self.n_slots = n_slots              # per cohort
        self.n_cohorts = n_cohorts
        self.engines: list[ServingEngine] = []
        for c in range(n_cohorts):
            p = self.engines[0].params if self.engines else params
            eng = ServingEngine(p, cfg, vocab, self.cc, n_slots=n_slots,
                                **engine_kw)
            if self.engines:
                eng.pos_heads = self.engines[0].pos_heads
            self.engines.append(eng)

    # -- stream-id mapping --------------------------------------------------

    def stream_id(self, cohort: int, slot: int) -> int:
        return cohort * self.n_slots + slot

    def locate(self, stream_id: int) -> tuple[int, int]:
        return divmod(stream_id, self.n_slots)

    def assign(self, arrival_s: float) -> int:
        """Cohort whose tick phase is nearest AFTER an arrival at
        `arrival_s` (same rule as CohortScheduler.assign)."""
        period = self.cc.chunk_samples / self.cc.sample_rate
        frac = (arrival_s % period) / period
        return int(np.ceil(frac * self.n_cohorts)) % self.n_cohorts

    # -- stream lifecycle ---------------------------------------------------

    def add_stream(self, cohort: int | None = None,
                   arrival_s: float | None = None) -> int:
        """Admit a stream; returns its GLOBAL id. Chooses the cohort from
        `arrival_s` when given, else the least-loaded cohort."""
        if cohort is None:
            if arrival_s is not None:
                cohort = self.assign(arrival_s)
            else:
                cohort = min(range(self.n_cohorts),
                             key=lambda c: int(self.engines[c].active.sum()))
        slot = self.engines[cohort].add_stream()
        return self.stream_id(cohort, slot)

    def remove_stream(self, stream_id: int) -> str:
        c, s = self.locate(stream_id)
        return self.engines[c].remove_stream(s)

    def feed_audio(self, audio: dict[int, np.ndarray]) -> None:
        """{global stream id: PCM i16} -- forwarded per cohort."""
        per: list[dict] = [{} for _ in range(self.n_cohorts)]
        for gid, pcm in audio.items():
            c, s = self.locate(gid)
            per[c][s] = pcm
        for c, d in enumerate(per):
            if d:
                self.engines[c].feed_audio(d)

    def step(self, cohort: int) -> dict[int, str]:
        """One cohort's engine tick at its stagger phase; emitted text is
        keyed by GLOBAL stream id."""
        out = self.engines[cohort].step()
        base = cohort * self.n_slots
        return {base + s: t for s, t in out.items()}

    # -- results ------------------------------------------------------------

    @property
    def transcripts(self) -> dict[int, str]:
        out: dict[int, str] = {}
        for c, eng in enumerate(self.engines):
            base = c * self.n_slots
            for s, t in enumerate(eng.transcripts):
                if eng.active[s]:
                    out[base + s] = t
        return out

    @property
    def tokens(self) -> dict[int, list]:
        out: dict[int, list] = {}
        for c, eng in enumerate(self.engines):
            base = c * self.n_slots
            for s in range(self.n_slots):
                if eng.active[s]:
                    out[base + s] = eng.tokens[s]
        return out

    def stats(self) -> dict:
        per = [eng.stats() for eng in self.engines]
        return {
            "n_cohorts": self.n_cohorts,
            "active_slots": sum(p["active_slots"] for p in per),
            "engine_steps": sum(p["engine_steps"] for p in per),
            "cohorts": per,
        }
