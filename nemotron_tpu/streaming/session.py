"""Streaming session engine.

The TPU-native counterpart of the reference's nemo_stream_* API
(reference src/nemo-stream.h:176-312). One `StreamSession` manages S parallel
streams (S=1 for the interactive CLI): host-side PCM->mel frontend and mel
ring buffer, plus ONE fused jitted `chunk_step` that runs the whole
encoder + greedy decode on device and returns only int32 tokens -- replacing
the reference's per-symbol host round-trips (src/nemo-stream.cpp:813-875).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CacheConfig, MAX_SYMBOLS_PER_STEP, ModelConfig
from ..models import decoder as dec_mod
from ..models import encoder as enc_mod
from ..params import ModelParams
from ..frontend.preprocessor import StreamingPreprocessor
from ..utils.text import tokens_to_text


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def _chunk_step_jit(params: ModelParams, cfg: ModelConfig, cc: CacheConfig,
                    mel_chunk, enc_state, dec_state, pos_heads):
    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    tokens, dec_state = dec_mod.greedy_decode(params, cfg, enc_out, dec_state)
    return tokens, enc_state, dec_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def _chunk_step_conf_jit(params: ModelParams, cfg: ModelConfig,
                         cc: CacheConfig, mel_chunk, enc_state, dec_state,
                         pos_heads):
    """chunk_step + per-emission log-posteriors (greedy_decode's
    with_confidence): returns (tokens, confs [S, valid_out, MAX] f32,
    enc_state', dec_state')."""
    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    tokens, dec_state, confs = dec_mod.greedy_decode(
        params, cfg, enc_out, dec_state, with_confidence=True)
    return tokens, confs, enc_state, dec_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def _chunk_step_masked_conf_jit(params: ModelParams, cfg: ModelConfig,
                                cc: CacheConfig, mel_chunk, enc_state,
                                dec_state, pos_heads, step_mask):
    """chunk_step_masked + per-emission log-posteriors (continuous-batching
    serving with confidence): returns (tokens, confs, enc_state', dec_state')."""
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_chunk, enc_state, pos_heads, step_mask=step_mask)
    tokens, dec_state, confs = dec_mod.greedy_decode(
        params, cfg, enc_out, dec_state, step_mask=step_mask,
        with_confidence=True)
    return tokens, confs, enc_state, dec_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def _chunk_step_masked_jit(params: ModelParams, cfg: ModelConfig,
                           cc: CacheConfig, mel_chunk, enc_state, dec_state,
                           pos_heads, step_mask):
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_chunk, enc_state, pos_heads, step_mask=step_mask)
    tokens, dec_state = dec_mod.greedy_decode(params, cfg, enc_out, dec_state,
                                              step_mask=step_mask)
    return tokens, enc_state, dec_state


# -- ring-layout-pinned variants (the single-device hot path) ---------------
#
# Left to its own layout assignment, XLA gives the K/V ring PARAMETERS a
# layout that makes the one-segment ring write contiguous ({4,2,3,1,0}:
# heads interleaved inside the window axis) while the 24 attention dots
# read row-major -- so it inserts a full-ring relayout copy of BOTH rings
# on every step: 2 x 1.65 GB at B=800 int8 ~= 10 ms/step, 21% of the step
# as pure "data formatting" (xplane, scripts/profile_step.py). XLA can't
# see the steady-state serving loop, so it optimizes the single call the
# wrong way. Pinning the entry/exit layouts to row-major keeps the rings
# in the layout the dots want; the strided segment write is ~1 ms.

def _ring_pinned_step(cfg: ModelConfig, cc: CacheConfig, masked: bool, dev):
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    rm = Format(Layout(major_to_minor=(0, 1, 2, 3, 4)),
                SingleDeviceSharding(dev))
    fmt = enc_mod.EncoderState(k_cache=rm, v_cache=rm, k_scale=None,
                               v_scale=None, conv_cache=None,
                               valid_len=None, phase=None)
    if masked:
        def f(params, mel_chunk, enc_state, dec_state, pos_heads, step_mask):
            enc_out, enc_state = enc_mod.encode_chunk(
                params, cfg, cc, mel_chunk, enc_state, pos_heads,
                step_mask=step_mask)
            tokens, dec_state = dec_mod.greedy_decode(
                params, cfg, enc_out, dec_state, step_mask=step_mask)
            return tokens, enc_state, dec_state

        in_sh = (None, None, fmt, None, None, None)
    else:
        def f(params, mel_chunk, enc_state, dec_state, pos_heads):
            enc_out, enc_state = enc_mod.encode_chunk(
                params, cfg, cc, mel_chunk, enc_state, pos_heads)
            tokens, dec_state = dec_mod.greedy_decode(
                params, cfg, enc_out, dec_state)
            return tokens, enc_state, dec_state

        in_sh = (None, None, fmt, None, None)
    return jax.jit(f, donate_argnums=(2, 3), in_shardings=in_sh,
                   out_shardings=(None, fmt, None))


_pinned_steps: dict = {}


def _pinned_for(cfg, cc, masked, enc_state):
    """The layout-pinned jit for this config IF the state lives on one
    device (the serving case); None under mesh sharding / abstract args.

    int8 rings are NOT pinned: measured on the v5e, XLA's auto layout
    ({4,2,3,1,0} entry + read-side relayout) beats pinned row-major for
    the s8 (4,1)-packed dots (768: 111.9 vs 120.5 ms). The bf16 dots
    read row-major natively, so pinning removes the relayout copies
    outright (640 dense: 116.0 -> 112.4 ms).

    DEFAULT OFF (NEMOTRON_TPU_PIN_LAYOUT=1 to enable): executables
    compiled with layout-pinned entry points fail to DESERIALIZE from
    the persistent compilation cache on the tunneled axon TPU backend
    (INVALID_ARGUMENT on cache read), and the failed load wedges the
    backend client for the rest of the process. In-process use is fine;
    any flow that may reload the executable from cache in a fresh
    process is not. Dense 640 fits the latency bar either way
    (115.7 ms unpinned), so stability wins until the backend fixes
    executable deserialization."""
    import os

    from jax.sharding import SingleDeviceSharding

    if os.environ.get("NEMOTRON_TPU_PIN_LAYOUT", "0") != "1":
        return None
    if cc.kv_quant_max is not None:
        return None
    sh = getattr(enc_state.k_cache, "sharding", None)
    if not isinstance(sh, SingleDeviceSharding):
        return None
    dev = next(iter(sh.device_set))
    key = (cfg, cc, masked, dev)
    if key not in _pinned_steps:
        _pinned_steps[key] = _ring_pinned_step(cfg, cc, masked, dev)
    return _pinned_steps[key]


def _pin_rings(enc_state, dev):
    """One-time relayout of freshly initialized rings to the pinned
    row-major layout. Required before the first pinned call: with buffer
    DONATION, the output ring aliases the donated input buffer and
    silently inherits ITS layout, defeating the out_shardings pin (and
    crashing the second call on the layout mismatch)."""
    import dataclasses

    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    want = (0, 1, 2, 3, 4)
    fmt = getattr(enc_state.k_cache, "format", None)
    if fmt is not None and fmt.layout.major_to_minor == want:
        return enc_state
    rm = Format(Layout(major_to_minor=want), SingleDeviceSharding(dev))
    return dataclasses.replace(
        enc_state,
        k_cache=jax.device_put(enc_state.k_cache, rm),
        v_cache=jax.device_put(enc_state.v_cache, rm))


def chunk_step(params: ModelParams, cfg: ModelConfig, cc: CacheConfig,
               mel_chunk, enc_state, dec_state, pos_heads):
    """Fused streaming step: cached encoder + greedy RNN-T decode.

    mel_chunk: [S, chunk_mel_frames, n_mels]
    Returns (tokens [S, valid_out, MAX_SYMBOLS] int32 blank-padded,
             enc_state', dec_state').

    The state pytrees are DONATED: XLA reuses their buffers for the updated
    caches (the K/V window shift becomes an in-place update instead of an
    alloc+copy of ~7 MB/stream). Callers must rebind the returned state, as
    all call sites here do. On a single device the K/V ring entry/exit
    layouts are pinned row-major (see _ring_pinned_step)."""
    fn = _pinned_for(cfg, cc, False, enc_state)
    if fn is not None:
        dev = next(iter(enc_state.k_cache.sharding.device_set))
        enc_state = _pin_rings(enc_state, dev)
        return fn(params, mel_chunk, enc_state, dec_state, pos_heads)
    return _chunk_step_jit(params, cfg, cc, mel_chunk, enc_state, dec_state,
                           pos_heads)


def chunk_step_masked(params: ModelParams, cfg: ModelConfig, cc: CacheConfig,
                      mel_chunk, enc_state, dec_state, pos_heads, step_mask):
    """chunk_step for continuous batching: `step_mask` [S] bool marks which
    streams actually advance; the rest keep caches, decoder state and
    valid_len frozen and emit nothing (their mel rows are padding)."""
    fn = _pinned_for(cfg, cc, True, enc_state)
    if fn is not None:
        dev = next(iter(enc_state.k_cache.sharding.device_set))
        enc_state = _pin_rings(enc_state, dev)
        return fn(params, mel_chunk, enc_state, dec_state, pos_heads,
                  step_mask)
    return _chunk_step_masked_jit(params, cfg, cc, mel_chunk, enc_state,
                                  dec_state, pos_heads, step_mask)


@functools.partial(jax.jit, static_argnums=(1, 2, 7, 8),
                   donate_argnums=(4, 5))
def chunk_step_beam(params: ModelParams, cfg: ModelConfig, cc: CacheConfig,
                    mel_chunk, enc_state, beam_state, pos_heads,
                    beam_size: int, expansions: int,
                    lm=None, lm_weight=0.3, lm_bonus=0.0):
    """Fused streaming step with BEAM decode: cached encoder + on-device
    batched RNN-T beam search (models/beam.py). The beam state (K
    hypotheses per stream) is carried across chunks exactly like the
    greedy DecoderState -- beam_decode's chunk-carry invariance is tested
    in tests/test_beam.py."""
    from ..models import beam as beam_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    beam_state = beam_mod.beam_decode(params, cfg, enc_out, beam_state,
                                      beam_size, expansions, lm=lm,
                                      lm_weight=lm_weight,
                                      lm_bonus=lm_bonus)
    return enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(1, 2, 8, 9),
                   donate_argnums=(4, 5))
def chunk_step_masked_beam(params: ModelParams, cfg: ModelConfig,
                           cc: CacheConfig, mel_chunk, enc_state,
                           beam_state, pos_heads, step_mask,
                           beam_size: int, expansions: int,
                           lm=None, lm_weight=0.3, lm_bonus=0.0):
    """chunk_step_beam for continuous batching: `step_mask` [S] bool marks
    which slots advance; frozen slots keep caches AND their entire beam
    (all K hypotheses) untouched -- carried by beam_decode's enc_lengths
    mechanism with a 0 frame limit, so a masked slot's frames all pass
    through."""
    from ..models import beam as beam_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads,
                                              step_mask=step_mask)
    t_lim = jnp.where(step_mask, enc_out.shape[1], 0).astype(jnp.int32)
    beam_state = beam_mod.beam_decode(params, cfg, enc_out, beam_state,
                                      beam_size, expansions,
                                      enc_lengths=t_lim, lm=lm,
                                      lm_weight=lm_weight,
                                      lm_bonus=lm_bonus)
    return enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4,))
def _chunk_step_ctc_jit(params: ModelParams, cfg: ModelConfig,
                        cc: CacheConfig, mel_chunk, enc_state, pos_heads):
    """Fused streaming step with CTC decode (hybrid checkpoints): cached
    encoder + per-frame argmax of the auxiliary CTC head. Returns
    (ids [S, valid_out] int32, enc_state'). The CTC greedy rule is
    stateless over frames, so unlike greedy RNN-T there is no decoder
    state to carry -- only the LAST frame id crosses the chunk boundary
    (host-side, for the collapse of a repeat spanning two chunks)."""
    from ..models import ctc as ctc_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    ids = jnp.argmax(ctc_mod.ctc_logits(params, enc_out),
                     axis=-1).astype(jnp.int32)
    return ids, enc_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def _chunk_step_tdt_jit(params: ModelParams, cfg: ModelConfig,
                        cc: CacheConfig, mel_chunk, enc_state, dec_state,
                        pos_heads, skip):
    """Fused streaming step for TDT checkpoints: cached encoder + the
    duration-aware greedy walk (models/tdt.py). `skip` [S] int32 carries a
    duration jump that overshot the previous chunk's valid frames into this
    one; the returned skip is next chunk's carry."""
    from ..models import tdt as tdt_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    tokens, dec_state, skip = tdt_mod.tdt_greedy_decode(
        params, cfg, enc_out, dec_state, skip_in=skip)
    return tokens, enc_state, dec_state, skip


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def _chunk_step_tdt_conf_jit(params: ModelParams, cfg: ModelConfig,
                             cc: CacheConfig, mel_chunk, enc_state,
                             dec_state, pos_heads, skip):
    """_chunk_step_tdt_jit + per-emission token-head log-posteriors
    (tdt_greedy_decode's with_confidence output)."""
    from ..models import tdt as tdt_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    tokens, confs, dec_state, skip = tdt_mod.tdt_greedy_decode(
        params, cfg, enc_out, dec_state, skip_in=skip, with_confidence=True)
    return tokens, confs, enc_state, dec_state, skip


@functools.partial(jax.jit, static_argnums=(1, 2, 7, 9, 10),
                   donate_argnums=(4, 5))
def chunk_step_tdt_beam(params: ModelParams, cfg: ModelConfig,
                        cc: CacheConfig, mel_chunk, enc_state, beam_state,
                        pos_heads, beam_size: int,
                        lm=None, lm_weight=0.3, lm_bonus=0.0):
    """Fused streaming step with duration-aware BEAM decode for TDT
    checkpoints (models/tdt.py tdt_beam_decode). The TdtBeamState carries
    per-hypothesis time-pointer overshoots across chunks, so no separate
    tdt_skip is needed; chunked == one-shot exactly (frontier-synchronized
    expansion, tested in tests/test_tdt.py)."""
    from ..models import tdt as tdt_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    beam_state = tdt_mod.tdt_beam_decode(params, cfg, enc_out, beam_state,
                                         beam_size, lm=lm,
                                         lm_weight=lm_weight,
                                         lm_bonus=lm_bonus)
    return enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4,))
def _chunk_step_ctc_conf_jit(params: ModelParams, cfg: ModelConfig,
                             cc: CacheConfig, mel_chunk, enc_state,
                             pos_heads):
    """_chunk_step_ctc_jit + the argmax's log-posterior per frame
    (models/ctc.py frame_log_posteriors); the host collapse attaches the
    emitting frame's posterior to each surviving token."""
    from ..models import ctc as ctc_mod

    enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, mel_chunk,
                                              enc_state, pos_heads)
    ids, logp = ctc_mod.frame_log_posteriors(params, enc_out)
    return ids, logp, enc_state


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def chunk_step_captured(params: ModelParams, cfg: ModelConfig,
                        cc: CacheConfig, mel_chunk, enc_state, dec_state,
                        pos_heads):
    """chunk_step + named intermediate capture (for dump tracing)."""
    enc_out, enc_state, inter = enc_mod.encode_chunk(
        params, cfg, cc, mel_chunk, enc_state, pos_heads, capture=True)
    tokens, dec_state = dec_mod.greedy_decode(params, cfg, enc_out, dec_state)
    return tokens, enc_state, dec_state, inter


class StreamSession:
    """Lifecycle mirror of nemo_stream_init / process_incremental / finalize /
    get_transcript / get_tokens / reset / free (free == GC)."""

    def __init__(self, params: ModelParams, cfg: ModelConfig,
                 vocab: list[str] | None = None,
                 cache_config: CacheConfig | None = None,
                 n_streams: int = 1,
                 filterbank: np.ndarray | None = None,
                 window: np.ndarray | None = None,
                 compute_dtype=jnp.float32,
                 trace_dir: str | None = None,
                 timestamp_words: bool = False,
                 beam_size: int = 1,
                 beam_expansions: int | None = None,
                 max_beam_tokens: int = 4096,
                 confidence: bool = False,
                 confidence_words: bool = False,
                 ctc: bool = False,
                 lm=None, lm_weight: float = 0.3,
                 lm_bonus: float = 0.0):
        """trace_dir: when set, every chunk dumps named intermediates (mel,
        pre_encode_out, per-layer outputs, encoder_out, tokens) in the
        reference's binary dump format to that directory -- the analogue of
        the reference's my_bin/ tensor tracing (src/nemo-stream.cpp:880-958);
        diff runs with scripts/compare_tensors.py."""
        # Cast float leaves to the compute dtype AND materialize on device
        # once: raw numpy leaves would be re-uploaded on EVERY jitted
        # chunk_step call (2.4 GB/chunk for the full f32 model -- fatal
        # through a slow host<->TPU link). cast_params is idempotent on
        # already-device, already-cast pytrees.
        from ..params import cast_params

        self.params = cast_params(params, compute_dtype)
        self.cfg = cfg
        self.cc = cache_config or CacheConfig(n_mels=cfg.n_mels)
        self.vocab = vocab or []
        self.n_streams = n_streams
        self.dtype = compute_dtype
        # word timestamps in the transcript ({sec} markers): the reference
        # has the flag but no CLI switch (src/nemo-ggml.h:226, :1446-1450)
        self.timestamp_words = timestamp_words
        # beam_size > 1: per-chunk decode runs the on-device beam search
        # instead of greedy; the K-hypothesis BeamState carries across
        # chunks. Transcripts come from the CURRENT best hypothesis, so
        # earlier text may be rewritten as better hypotheses win (inherent
        # to streaming beam) -- process() returns "" increments and the
        # transcript is read via get_transcript()/finalize().
        self.beam_size = beam_size
        self.beam_expansions = (beam_expansions if beam_expansions is not None
                                else MAX_SYMBOLS_PER_STEP)
        self.max_beam_tokens = max_beam_tokens
        # per-emission log-posteriors from the greedy label loop: tokens
        # become (id, frame, conf) triples; confidence_words additionally
        # annotates transcripts with {p=...} word posteriors
        self.confidence = confidence or confidence_words
        self.confidence_words = confidence_words
        if beam_size > 1:
            if timestamp_words:
                raise ValueError("word timestamps require greedy decode")
            if trace_dir is not None:
                raise ValueError("tracing supports greedy decode only")
            if self.confidence:
                raise ValueError("confidence requires greedy decode (beam "
                                 "hypotheses carry whole-sequence scores)")
        # LM shallow fusion (models/lm.py): labels score
        # log P_rnnt + lm_weight * log P_lm inside the beam search
        if lm is not None and beam_size <= 1:
            raise ValueError("LM shallow fusion requires beam_size > 1 "
                             "(the LM rescored search IS the beam)")
        self.lm = (None if lm is None
                   else jax.tree_util.tree_map(jnp.asarray, lm))
        self.lm_weight = float(lm_weight)
        self.lm_bonus = float(lm_bonus)
        if self.confidence and trace_dir is not None:
            raise ValueError("confidence and tracing are mutually exclusive "
                             "(the traced step has no confidence output)")
        # ctc=True: decode each chunk with the hybrid checkpoint's auxiliary
        # CTC head instead of the RNN-T label loop (streaming CTC). Word
        # timestamps and confidence work (every emission has a frame index
        # and an argmax log-posterior); beam search over CTC would be a
        # prefix search -- a different algorithm the framework does not
        # implement (use the RNN-T head of the hybrid checkpoint for beam).
        self.ctc = ctc
        if ctc:
            if params.ctc is None:
                raise ValueError("ctc=True needs a model with a CTC head "
                                 "(ctc_decoder.* tensors)")
            if beam_size > 1 or trace_dir is not None:
                raise ValueError("ctc decode excludes beam/tracing (CTC "
                                 "beam would be a prefix search; decode the "
                                 "hybrid's RNN-T head for beam)")
        # TDT checkpoints (cfg.tdt_durations): duration-aware greedy walk,
        # duration-aware beam (models/tdt.py tdt_beam_decode, with optional
        # LM fusion) and greedy confidence; tracing stays RNN-T-greedy-only
        self.tdt = bool(cfg.tdt_durations) and not ctc
        if self.tdt and trace_dir is not None:
            raise ValueError("tracing supports greedy decode only")
        self.tracer = None
        if trace_dir is not None:
            from ..utils.dump import DumpTracer

            self.tracer = DumpTracer(trace_dir)

        fb = filterbank if filterbank is not None else np.asarray(
            params.preprocessor.filterbank)
        win = window if window is not None else np.asarray(
            params.preprocessor.window)
        from ..config import PreprocessorConfig

        self.preproc = StreamingPreprocessor(
            fb, win, n_streams=n_streams,
            cfg=PreprocessorConfig(n_mels=cfg.n_mels))

        self.pos_heads = enc_mod.precompute_pos_heads(
            self.params, cfg, self.cc, dtype=compute_dtype)
        self.reset()

    # -- state --------------------------------------------------------------

    def reset(self) -> None:
        """Clear caches/transcript, keep compiled step (reference
        src/nemo-stream.cpp:81-101)."""
        cfg, cc, S = self.cfg, self.cc, self.n_streams
        self.enc_state = enc_mod.init_encoder_state(cfg, cc, S, self.dtype)
        self.dec_state = dec_mod.init_decoder_state(cfg, S, self.dtype)
        self.beam_state = None
        if self.beam_size > 1:
            if self.tdt:
                from ..models import tdt as tdt_mod

                self.beam_state = tdt_mod.init_tdt_beam_state(
                    cfg, S, self.beam_size, self.max_beam_tokens,
                    self.dtype, lm=self.lm)
            else:
                from ..models import beam as beam_mod

                self.beam_state = beam_mod.init_beam_state(
                    cfg, S, self.beam_size, self.max_beam_tokens, self.dtype,
                    lm=self.lm)
        # cross-chunk CTC collapse carry: the raw LAST frame argmax id of
        # the previous chunk per stream (-1 = stream start, matches nothing)
        self.ctc_prev = np.full(S, -1, np.int64)
        # cross-chunk TDT duration-jump carry (frames to skip next chunk)
        self.tdt_skip = jnp.zeros((S,), jnp.int32)
        self.preproc.reset()
        # 9-frame zero-seeded overlap (reference src/nemo-stream.cpp:58-60)
        self.mel_buffer = np.zeros((S, cc.pre_encode_cache_size, cfg.n_mels),
                                   np.float32)
        self.tokens: list[list[tuple[int, int]]] = [[] for _ in range(S)]
        self.transcripts = [""] * S
        self.frame_offset = 0
        # stats (reference src/nemo-stream.h:228-252)
        self.total_audio_seconds = 0.0
        self.total_compute_seconds = 0.0
        self.frontend_seconds = 0.0
        self.chunk_seconds = 0.0
        self.total_chunks = 0

    # -- processing ---------------------------------------------------------

    def process(self, audio_i16: np.ndarray) -> list[str] | str:
        """Feed PCM ([S, N] or [N] int16); returns newly decoded text per
        stream (a plain str when n_streams == 1)."""
        squeeze = audio_i16.ndim == 1
        if squeeze:
            audio_i16 = audio_i16[None]
        t0 = time.perf_counter()
        self.total_audio_seconds += (
            audio_i16.shape[1] / self.preproc.cfg.sample_rate)

        mel = self.preproc.process(audio_i16)
        t1 = time.perf_counter()
        self.frontend_seconds += t1 - t0
        if mel.shape[1]:
            self.mel_buffer = np.concatenate([self.mel_buffer, mel], axis=1)
        new_text = self._drain_chunks()
        self.total_compute_seconds += time.perf_counter() - t0
        return new_text[0] if squeeze else new_text

    def process_mel(self, mel: np.ndarray) -> list[str]:
        """Feed mel frames directly ([S, T, n_mels])."""
        t0 = time.perf_counter()
        self.mel_buffer = np.concatenate([self.mel_buffer, mel], axis=1)
        out = self._drain_chunks()
        self.total_compute_seconds += time.perf_counter() - t0
        return out

    def _drain_chunks(self) -> list[str]:
        cc = self.cc
        new_text = [""] * self.n_streams
        while self.mel_buffer.shape[1] >= cc.chunk_mel_frames:
            chunk = jnp.asarray(
                self.mel_buffer[:, : cc.chunk_mel_frames], self.dtype)
            t0 = time.perf_counter()
            if self.beam_state is not None:
                if self.tdt:
                    self.enc_state, self.beam_state = chunk_step_tdt_beam(
                        self.params, self.cfg, cc, chunk, self.enc_state,
                        self.beam_state, self.pos_heads, self.beam_size,
                        self.lm, self.lm_weight, self.lm_bonus)
                else:
                    self.enc_state, self.beam_state = chunk_step_beam(
                        self.params, self.cfg, cc, chunk, self.enc_state,
                        self.beam_state, self.pos_heads, self.beam_size,
                        self.beam_expansions, self.lm, self.lm_weight,
                        self.lm_bonus)
                self.chunk_seconds += time.perf_counter() - t0
                self.total_chunks += 1
                self.mel_buffer = self.mel_buffer[:, cc.shift_mel_frames:]
                self.frame_offset += cc.valid_out_len
                self._refresh_beam_transcripts()
                continue
            if self.ctc:
                frame_lp = None
                if self.confidence:
                    ids, frame_lp, self.enc_state = _chunk_step_ctc_conf_jit(
                        self.params, self.cfg, cc, chunk, self.enc_state,
                        self.pos_heads)
                    frame_lp = np.asarray(frame_lp)
                else:
                    ids, self.enc_state = _chunk_step_ctc_jit(
                        self.params, self.cfg, cc, chunk, self.enc_state,
                        self.pos_heads)
                ids = np.asarray(ids, np.int64)  # [S, valid_out]
                self.chunk_seconds += time.perf_counter() - t0
                self.total_chunks += 1
                self.mel_buffer = self.mel_buffer[:, cc.shift_mel_frames:]
                blank = self.cfg.blank_token
                for s in range(self.n_streams):
                    prev, toks = self.ctc_prev[s], []
                    for t in range(ids.shape[1]):
                        i = int(ids[s, t])
                        if i != prev and i != blank:
                            if frame_lp is None:
                                toks.append((i, self.frame_offset + t))
                            else:
                                toks.append((i, self.frame_offset + t,
                                             float(frame_lp[s, t])))
                        prev = i
                    self.ctc_prev[s] = prev
                    if toks:
                        self.tokens[s].extend(toks)
                        text = tokens_to_text(
                            toks, self.vocab,
                            timestamp_words=self.timestamp_words,
                            confidence_words=self.confidence_words)
                        self.transcripts[s] += text
                        new_text[s] += text
                self.frame_offset += ids.shape[1]
                continue
            confs = None
            if self.tdt and self.confidence:
                (tokens, confs, self.enc_state, self.dec_state,
                 self.tdt_skip) = _chunk_step_tdt_conf_jit(
                    self.params, self.cfg, cc, chunk, self.enc_state,
                    self.dec_state, self.pos_heads, self.tdt_skip)
                confs = np.asarray(confs)
            elif self.tdt:
                (tokens, self.enc_state, self.dec_state,
                 self.tdt_skip) = _chunk_step_tdt_jit(
                    self.params, self.cfg, cc, chunk, self.enc_state,
                    self.dec_state, self.pos_heads, self.tdt_skip)
            elif self.tracer is not None:
                tokens, self.enc_state, self.dec_state = self._traced_step(
                    chunk)
            elif self.confidence:
                tokens, confs, self.enc_state, self.dec_state = (
                    _chunk_step_conf_jit(self.params, self.cfg, cc, chunk,
                                         self.enc_state, self.dec_state,
                                         self.pos_heads))
                confs = np.asarray(confs)
            else:
                tokens, self.enc_state, self.dec_state = chunk_step(
                    self.params, self.cfg, cc, chunk, self.enc_state,
                    self.dec_state, self.pos_heads)
            tokens = np.asarray(tokens)  # [S, valid_out, MAX]
            self.chunk_seconds += time.perf_counter() - t0
            self.total_chunks += 1
            self.mel_buffer = self.mel_buffer[:, cc.shift_mel_frames :]

            emitted = dec_mod.extract_emitted(
                tokens, self.cfg.blank_token,
                np.full(self.n_streams, self.frame_offset, np.int64),
                confs=confs)
            for s, toks in emitted.items():
                self.tokens[s].extend(toks)
                text = tokens_to_text(toks, self.vocab,
                                      timestamp_words=self.timestamp_words,
                                      confidence_words=self.confidence_words)
                self.transcripts[s] += text
                new_text[s] += text
            self.frame_offset += tokens.shape[1]
        return new_text

    def _refresh_beam_transcripts(self) -> None:
        """Rewrite transcripts/tokens from the CURRENT best hypothesis
        (length-normalized selection, the serving default)."""
        from ..models import beam as beam_mod

        btok, blen, _ = beam_mod.best_hypothesis(self.beam_state,
                                                 length_norm=True)
        btok, blen = np.asarray(btok), np.asarray(blen)
        for s in range(self.n_streams):
            toks = [(int(t), 0) for t in btok[s, : blen[s]]]
            self.tokens[s] = toks
            self.transcripts[s] = tokens_to_text(toks, self.vocab)

    def _traced_step(self, chunk):
        """Chunk step with named-intermediate capture + dump-file tracing."""
        tokens, enc_state, dec_state, inter = chunk_step_captured(
            self.params, self.cfg, self.cc, chunk, self.enc_state,
            self.dec_state, self.pos_heads)
        self.tracer("mel", chunk)
        self.tracer("pre_encode_out", inter["pre_encode_out"])
        layer_out = np.asarray(inter["layer_out"])
        for l in range(layer_out.shape[0]):
            self.tracer(f"layer_{l:02d}_out", layer_out[l])
        self.tracer("encoder_out", inter["encoder_out"])
        self.tracer("tokens", np.asarray(tokens).astype(np.float32))
        return tokens, enc_state, dec_state

    # -- checkpoint / resume --------------------------------------------------

    def state_dict(self) -> dict:
        """Full session snapshot: encoder caches, decoder state, DSP state,
        mel buffer, accumulated tokens/transcripts. The reference designs
        its stream state to be snapshot-able (nemo_decoder_state POD +
        persistent cache tensors, src/nemo-ggml.h:358-398); this makes it an
        actual API."""
        return {
            "enc/k_cache": np.asarray(self.enc_state.k_cache),
            "enc/v_cache": np.asarray(self.enc_state.v_cache),
            "enc/conv_cache": np.asarray(self.enc_state.conv_cache),
            "enc/valid_len": np.asarray(self.enc_state.valid_len),
            "enc/phase": np.asarray(self.enc_state.phase),
            "enc/k_scale": np.asarray(self.enc_state.k_scale),
            "enc/v_scale": np.asarray(self.enc_state.v_scale),
            "dec/h": np.asarray(self.dec_state.h),
            "dec/c": np.asarray(self.dec_state.c),
            "dec/prev_token": np.asarray(self.dec_state.prev_token),
            "preproc": self.preproc.state_dict(),
            "mel_buffer": self.mel_buffer.copy(),
            "tokens": [list(t) for t in self.tokens],
            "transcripts": list(self.transcripts),
            "frame_offset": self.frame_offset,
        } | ({} if self.beam_state is None else {
            f"beam/{k}": np.asarray(getattr(self.beam_state, k))
            for k in ("h", "c", "prev_token", "scores", "tokens", "lengths")
            + (("t", "sym") if self.tdt else ())   # TdtBeamState extras
            + (("lm_h", "lm_c") if self.beam_state.lm_h is not None else ())
        }) | ({"ctc_prev": self.ctc_prev.copy()} if self.ctc else {}) \
          | ({"tdt_skip": np.asarray(self.tdt_skip)} if self.tdt else {})

    def load_state_dict(self, st: dict) -> None:
        ring_dtype = (jnp.int8 if self.cc.kv_quant_max is not None
                      else self.dtype)
        self.enc_state = enc_mod.EncoderState(
            k_cache=jnp.asarray(st["enc/k_cache"], ring_dtype),
            v_cache=jnp.asarray(st["enc/v_cache"], ring_dtype),
            k_scale=jnp.asarray(st["enc/k_scale"], jnp.float32),
            v_scale=jnp.asarray(st["enc/v_scale"], jnp.float32),
            conv_cache=jnp.asarray(st["enc/conv_cache"], self.dtype),
            valid_len=jnp.asarray(st["enc/valid_len"], jnp.int32),
            phase=jnp.asarray(st["enc/phase"], jnp.int32),
        )
        self.dec_state = dec_mod.DecoderState(
            h=jnp.asarray(st["dec/h"], self.dtype),
            c=jnp.asarray(st["dec/c"], self.dtype),
            prev_token=jnp.asarray(st["dec/prev_token"], jnp.int32),
        )
        # Beam-state compatibility: a greedy session must not silently adopt
        # (or drop) a beam snapshot, and a beam session must not resume with
        # a freshly-reset beam alongside restored encoder/decoder state.
        # CTC carry compatibility mirrors the beam check below: the decode
        # mode is part of the snapshot's shape.
        if self.ctc and "ctc_prev" not in st:
            raise ValueError("session decodes with ctc=True but the "
                             "snapshot carries no ctc_prev (saved from an "
                             "RNN-T-decode session)")
        if not self.ctc and "ctc_prev" in st:
            raise ValueError("snapshot carries CTC collapse state but this "
                             "session decodes RNN-T (ctc=False)")
        if self.ctc:
            self.ctc_prev = np.asarray(st["ctc_prev"], np.int64).copy()
        if self.tdt and "tdt_skip" not in st:
            raise ValueError("session decodes TDT but the snapshot carries "
                             "no tdt_skip (saved from another decode mode)")
        if not self.tdt and "tdt_skip" in st:
            raise ValueError("snapshot carries TDT skip state but this "
                             "session does not decode TDT")
        if self.tdt:
            self.tdt_skip = jnp.asarray(st["tdt_skip"], jnp.int32)
        has_beam = "beam/h" in st
        if self.beam_size > 1 and not has_beam:
            raise ValueError(
                f"session has beam_size={self.beam_size} but the snapshot "
                "carries no beam state (saved from a greedy session)")
        if self.beam_size <= 1 and has_beam:
            raise ValueError(
                f"snapshot carries beam state (K={st['beam/h'].shape[1]}) "
                "but this session decodes greedily (beam_size=1)")
        if has_beam and st["beam/h"].shape[1] != self.beam_size:
            raise ValueError(
                f"snapshot beam width K={st['beam/h'].shape[1]} != session "
                f"beam_size={self.beam_size}")
        if has_beam:
            has_lm = "beam/lm_h" in st
            if has_lm != (self.lm is not None):
                raise ValueError(
                    "snapshot/session LM-fusion mismatch: snapshot "
                    f"{'carries' if has_lm else 'has no'} LM state, session "
                    f"lm={'set' if self.lm is not None else 'None'}")
            has_tdt_beam = "beam/t" in st
            if has_tdt_beam != self.tdt:
                raise ValueError(
                    "snapshot/session beam-family mismatch: snapshot is "
                    f"{'TDT' if has_tdt_beam else 'RNN-T'}, session is "
                    f"{'TDT' if self.tdt else 'RNN-T'}")
            common = dict(
                h=jnp.asarray(st["beam/h"], self.dtype),
                c=jnp.asarray(st["beam/c"], self.dtype),
                prev_token=jnp.asarray(st["beam/prev_token"], jnp.int32),
                scores=jnp.asarray(st["beam/scores"], jnp.float32),
                tokens=jnp.asarray(st["beam/tokens"], jnp.int32),
                lengths=jnp.asarray(st["beam/lengths"], jnp.int32),
                lm_h=(jnp.asarray(st["beam/lm_h"], self.dtype)
                      if has_lm else None),
                lm_c=(jnp.asarray(st["beam/lm_c"], self.dtype)
                      if has_lm else None),
            )
            if self.tdt:
                from ..models import tdt as tdt_mod

                self.beam_state = tdt_mod.TdtBeamState(
                    t=jnp.asarray(st["beam/t"], jnp.int32),
                    sym=jnp.asarray(st["beam/sym"], jnp.int32),
                    **common)
            else:
                from ..models import beam as beam_mod

                self.beam_state = beam_mod.BeamState(**common)
        self.preproc.load_state_dict(st["preproc"])
        self.mel_buffer = np.asarray(st["mel_buffer"], np.float32).copy()
        self.tokens = [[tuple(t) for t in ts] for ts in st["tokens"]]
        self.transcripts = list(st["transcripts"])
        self.frame_offset = int(st["frame_offset"])

    def save(self, path: str) -> None:
        st = self.state_dict()
        flat = {k: v for k, v in st.items() if isinstance(v, np.ndarray)}
        flat["preproc/last_sample"] = st["preproc"]["last_sample"]
        flat["preproc/residue"] = st["preproc"]["residue"]
        flat["frame_offset"] = np.int64(st["frame_offset"])
        for s, toks in enumerate(st["tokens"]):
            if self.confidence:   # (id, frame, log-posterior) triples
                flat[f"tokens/{s}"] = np.asarray(
                    toks, np.float64).reshape(-1, 3)
            else:
                flat[f"tokens/{s}"] = np.asarray(
                    toks, np.int64).reshape(-1, 2)
        flat["transcripts"] = np.asarray(st["transcripts"], dtype=object)
        from ..utils.npz import savez_bf16_safe

        savez_bf16_safe(path, flat)

    def load(self, path: str) -> None:
        from ..utils.npz import npz_decode

        z = np.load(path, allow_pickle=True)
        st = {k: npz_decode(z[k]) for k in z.files
              if not k.startswith(("preproc/", "tokens/"))
              and k not in ("transcripts", "frame_offset")}
        st["preproc"] = {"last_sample": z["preproc/last_sample"],
                         "residue": z["preproc/residue"]}
        st["tokens"] = [
            [(int(row[0]), int(row[1]), float(row[2])) if len(row) == 3
             else (int(row[0]), int(row[1])) for row in z[f"tokens/{s}"]]
            for s in range(self.n_streams)]
        st["transcripts"] = [str(t) for t in z["transcripts"]]
        st["frame_offset"] = int(z["frame_offset"])
        self.load_state_dict(st)

    def finalize(self) -> list[str] | str:
        """Flush: pad the remaining mel buffer out to one more chunk if any
        *new* (non-overlap) frames are pending, then return transcripts."""
        cc = self.cc
        pending = self.mel_buffer.shape[1] - cc.pre_encode_cache_size
        if pending > 0:
            pad = cc.chunk_mel_frames - self.mel_buffer.shape[1]
            if pad > 0:
                self.mel_buffer = np.concatenate(
                    [self.mel_buffer,
                     np.zeros((self.n_streams, pad, self.cfg.n_mels),
                              np.float32)], axis=1)
            self._drain_chunks()
        return (self.transcripts[0] if self.n_streams == 1
                else list(self.transcripts))

    def get_transcript(self, stream: int = 0) -> str:
        return self.transcripts[stream]

    def get_tokens(self, stream: int = 0) -> list[tuple[int, int]]:
        return self.tokens[stream]

    @property
    def rtf(self) -> float:
        """Real-time factor: compute seconds per audio second (per stream
        batch; divide by n_streams for aggregate throughput)."""
        if self.total_audio_seconds == 0:
            return 0.0
        return self.total_compute_seconds / self.total_audio_seconds


def transcribe_batch(params: ModelParams, cfg: ModelConfig,
                     vocab: list[str], audio_i16: np.ndarray,
                     filterbank: np.ndarray | None = None,
                     window: np.ndarray | None = None,
                     timestamp_words: bool = False,
                     compute_dtype=jnp.float32,
                     beam_size: int = 1,
                     beam_expansions: int | None = None,
                     return_confidence: bool = False,
                     return_nbest: int | None = None,
                     ctc: bool = False,
                     lm=None, lm_weight: float = 0.3,
                     lm_bonus: float = 0.0,
                     lm_rescore: bool = False,
                     min_mel_frames: int = 0):
    """Offline full-utterance transcription (the reference `transcribe` CLI
    path: src/transcribe.cpp + nemo_transcribe_audio,
    src/nemo-ggml.cpp:1585-1598). Unlike the reference there is no 164 s
    pos-emb cap: the position table is sized per call.

    beam_size > 1 switches the label search to the on-device batched beam
    -- models/beam.py for RNN-T, the duration-aware models/tdt.py
    tdt_beam_decode for TDT checkpoints -- a capability the reference lacks
    (greedy only). Word timestamps require greedy (beam hypotheses carry no
    frame alignment).

    return_confidence (greedy only; RNN-T, TDT and CTC): returns
    (texts, token_lists) where each token list holds
    (id, frame, log_posterior) triples -- the emission-point argmax
    log-posterior, computed identically across the three decode families so
    confidence thresholds transfer.

    return_nbest=N (beam only): returns, per utterance, the N best
    hypotheses as (text, raw_total_log_prob) tuples sorted best first
    (length-normalized ranking, raw scores -- models/beam.py n_best).

    lm_rescore=True (with lm=, beam only) switches the LM from in-search
    shallow fusion to SECOND-PASS rescoring: the beam runs acoustic-only,
    then the full K-hypothesis list is reranked by
    raw_score + lm_weight * lm_sequence_logp + lm_bonus * length
    (models/lm.py rescore_nbest; one LM pass per utterance instead of one
    per expansion). return_nbest then reports the combined scores.

    ctc=True decodes with the hybrid checkpoint's auxiliary CTC head
    (models/ctc.py; requires params.ctc) instead of the RNN-T label
    loop -- stateless over frames, no prediction network.

    min_mel_frames pads the batched mel's time axis to at least this many
    frames (masked via enc_lengths, so outputs are EXACTLY those of the
    unpadded call) -- callers with varying utterance lengths (the serving
    refiner) bucket shapes with it so jit compiles O(log T) programs
    instead of one per distinct length."""
    if return_confidence and beam_size > 1:
        raise ValueError("confidence requires greedy decode")
    if return_nbest is not None and beam_size <= 1:
        raise ValueError("n-best output requires beam_size > 1")
    if lm is not None and beam_size <= 1:
        raise ValueError("LM shallow fusion requires beam_size > 1 "
                         "(the LM rescored search IS the beam)")
    if lm_rescore and lm is None:
        raise ValueError("lm_rescore needs an LM (lm=)")
    if ctc and (beam_size > 1 or timestamp_words):
        raise ValueError("ctc decode is plain greedy (no beam or word "
                         "timestamps; confidence IS supported)")
    if ctc and params.ctc is None:
        raise ValueError("model has no CTC head (ctc_decoder.* tensors)")
    fb = filterbank if filterbank is not None else np.asarray(
        params.preprocessor.filterbank)
    win = window if window is not None else np.asarray(
        params.preprocessor.window)
    from ..config import PreprocessorConfig

    utterances = (audio_i16 if isinstance(audio_i16, (list, tuple))
                  else [audio_i16])
    mels = []
    for audio in utterances:
        pre = StreamingPreprocessor(fb, win,
                                    cfg=PreprocessorConfig(n_mels=cfg.n_mels))
        mels.append(pre.process(np.asarray(audio).reshape(1, -1))[0])

    def enc_frames(t):
        for _ in range(3):
            t = t // 2 + 1
        return t

    mel_lens = [m.shape[0] for m in mels]
    Tm = max(max(mel_lens), min_mel_frames)
    mel = np.zeros((len(mels), Tm, cfg.n_mels), np.float32)
    for i, m in enumerate(mels):
        mel[i, : m.shape[0]] = m
    enc_lengths = jnp.asarray([enc_frames(t) for t in mel_lens], jnp.int32)

    enc = enc_mod.encode_batch(params, cfg, jnp.asarray(mel, compute_dtype),
                               enc_lengths=enc_lengths)
    if ctc:
        from ..models import ctc as ctc_mod

        if return_confidence:
            ids, lps = jax.jit(ctc_mod.frame_log_posteriors)(params, enc)
            ids, lps = np.asarray(ids), np.asarray(lps)
            lens = np.asarray(enc_lengths)
            token_lists = [
                ctc_mod.collapse_with_confidence(
                    ids[i], lps[i], cfg.blank_token, int(lens[i]))
                for i in range(len(mels))]
            texts = [tokens_to_text(tl, vocab) for tl in token_lists]
            single = not isinstance(audio_i16, (list, tuple))
            return ((texts[0], token_lists[0]) if single
                    else (texts, token_lists))
        ids = ctc_mod.ctc_greedy_decode(params, cfg, enc,
                                        enc_lengths=enc_lengths)
        texts = [tokens_to_text([(i, 0) for i in stream_ids], vocab)
                 for stream_ids in ids]
        return (texts[0] if not isinstance(audio_i16, (list, tuple))
                else texts)
    if cfg.tdt_durations and beam_size <= 1:
        # TDT checkpoint, greedy: the duration-aware walk (models/tdt.py);
        # beam_size > 1 falls through to the shared beam epilogue below
        # with the duration-aware search swapped in.
        from ..models import tdt as tdt_mod

        dec_state = dec_mod.init_decoder_state(cfg, len(mels), compute_dtype)
        if return_confidence:
            decode = functools.partial(tdt_mod.tdt_greedy_decode,
                                       with_confidence=True)
            tokens, confs, _, _ = jax.jit(decode, static_argnums=1)(
                params, cfg, enc, dec_state, enc_lengths=enc_lengths)
            emitted = dec_mod.extract_emitted(np.asarray(tokens),
                                              cfg.blank_token,
                                              confs=np.asarray(confs))
            token_lists = [emitted.get(i, []) for i in range(len(mels))]
            texts = [tokens_to_text(tl, vocab,
                                    timestamp_words=timestamp_words)
                     for tl in token_lists]
            single = not isinstance(audio_i16, (list, tuple))
            return ((texts[0], token_lists[0]) if single
                    else (texts, token_lists))
        tokens, _, _ = jax.jit(tdt_mod.tdt_greedy_decode, static_argnums=1)(
            params, cfg, enc, dec_state, enc_lengths=enc_lengths)
        texts = [
            tokens_to_text(dec_mod.tokens_to_list(np.asarray(tokens)[i],
                                                  cfg.blank_token),
                           vocab, timestamp_words=timestamp_words)
            for i in range(len(mels))]
        return (texts[0] if not isinstance(audio_i16, (list, tuple))
                else texts)
    if beam_size > 1:
        from ..models import beam as beam_mod

        if timestamp_words:
            raise ValueError("word timestamps require greedy decode "
                             "(beam hypotheses carry no frame alignment)")
        exp = (beam_expansions if beam_expansions is not None
               else MAX_SYMBOLS_PER_STEP)
        if lm is not None:
            lm = jax.tree_util.tree_map(jnp.asarray, lm)
        # second-pass rescoring runs the SEARCH acoustic-only; the LM
        # reranks the finished n-best list below (models/lm.py)
        lm_search = None if lm_rescore else lm
        if cfg.tdt_durations:
            # duration-aware search; the n-best / rescore / best-hypothesis
            # epilogue below is state-shape-agnostic (models/beam.py
            # helpers work on TdtBeamState's shared fields)
            from ..models import tdt as tdt_mod

            bstate = tdt_mod.init_tdt_beam_state(
                cfg, len(mels), beam_size,
                max_tokens=int(enc.shape[1]) * MAX_SYMBOLS_PER_STEP,
                dtype=compute_dtype, lm=lm_search)
            bstate = jax.jit(tdt_mod.tdt_beam_decode,
                             static_argnums=(1, 4))(
                params, cfg, enc, bstate, beam_size, enc_lengths, None,
                lm_search, lm_weight, lm_bonus)
        else:
            bstate = beam_mod.init_beam_state(
                cfg, len(mels), beam_size,
                max_tokens=int(enc.shape[1]) * MAX_SYMBOLS_PER_STEP,
                dtype=compute_dtype, lm=lm_search)
            bstate = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))(
                params, cfg, enc, bstate, beam_size, exp, enc_lengths,
                lm_search, lm_weight, lm_bonus)
        if lm_rescore:
            from ..models import lm as lm_mod

            # rescore the FULL beam, then slice the requested n
            ntok, nlen, nsc = beam_mod.n_best(bstate, None,
                                              length_norm=False)
            order, comb = jax.jit(
                lm_mod.rescore_nbest, static_argnums=(4,))(
                lm, ntok, nlen, nsc, cfg.blank_token,
                lm_weight, lm_bonus)
            order, comb = np.asarray(order), np.asarray(comb)
            ntok, nlen = np.asarray(ntok), np.asarray(nlen)
            if return_nbest is not None:
                nbest = [
                    [(tokens_to_text(
                        [(int(t), 0)
                         for t in ntok[i, j, : nlen[i, j]]], vocab),
                      float(comb[i, j]))
                     for j in order[i, :return_nbest]]
                    for i in range(len(mels))]
                return (nbest[0]
                        if not isinstance(audio_i16, (list, tuple))
                        else nbest)
            texts = [
                tokens_to_text(
                    [(int(t), 0)
                     for t in ntok[i, order[i, 0], : nlen[i, order[i, 0]]]],
                    vocab)
                for i in range(len(mels))]
            return (texts[0] if not isinstance(audio_i16, (list, tuple))
                    else texts)
        if return_nbest is not None:
            ntok, nlen, nsc = beam_mod.n_best(bstate, return_nbest,
                                              length_norm=True)
            ntok, nlen = np.asarray(ntok), np.asarray(nlen)
            nsc = np.asarray(nsc)
            nbest = [
                [(tokens_to_text(
                    [(int(t), 0) for t in ntok[i, j, : nlen[i, j]]], vocab),
                  float(nsc[i, j]))
                 for j in range(ntok.shape[1])]
                for i in range(len(mels))]
            return (nbest[0] if not isinstance(audio_i16, (list, tuple))
                    else nbest)
        btok, blen, _ = beam_mod.best_hypothesis(bstate, length_norm=True)
        btok, blen = np.asarray(btok), np.asarray(blen)
        texts = [
            tokens_to_text([(int(t), 0) for t in btok[i, : blen[i]]], vocab)
            for i in range(len(mels))]
        return (texts[0] if not isinstance(audio_i16, (list, tuple))
                else texts)
    dec_state = dec_mod.init_decoder_state(cfg, len(mels), compute_dtype)
    if return_confidence:
        decode = functools.partial(dec_mod.greedy_decode,
                                   with_confidence=True)
        tokens, _, confs = jax.jit(decode, static_argnums=1)(
            params, cfg, enc, dec_state, enc_lengths=enc_lengths)
        emitted = dec_mod.extract_emitted(np.asarray(tokens),
                                          cfg.blank_token,
                                          confs=np.asarray(confs))
        token_lists = [emitted.get(i, []) for i in range(len(mels))]
        texts = [tokens_to_text(tl, vocab, timestamp_words=timestamp_words)
                 for tl in token_lists]
        single = not isinstance(audio_i16, (list, tuple))
        return ((texts[0], token_lists[0]) if single
                else (texts, token_lists))
    tokens, _ = jax.jit(dec_mod.greedy_decode, static_argnums=1)(
        params, cfg, enc, dec_state, enc_lengths=enc_lengths)
    texts = [
        tokens_to_text(dec_mod.tokens_to_list(np.asarray(tokens)[i],
                                              cfg.blank_token),
                       vocab, timestamp_words=timestamp_words)
        for i in range(len(mels))]
    return texts[0] if not isinstance(audio_i16, (list, tuple)) else texts


def transcribe_batch_with_state(params: ModelParams, cfg: ModelConfig,
                                vocab: list[str], audio_i16: np.ndarray,
                                dec_state=None, frame_offset: int = 0,
                                filterbank: np.ndarray | None = None,
                                window: np.ndarray | None = None,
                                compute_dtype=jnp.float32):
    """Batch transcription with decoder-state carry-over across calls (the
    reference's nemo_transcribe_audio_with_state,
    src/nemo-ggml.cpp:1603-1683): successive audio segments share the LSTM
    state and prev_token, and token frame indices continue from
    `frame_offset`.

    Returns (text, tokens [(id, abs_frame)], dec_state', next_frame_offset).
    NOTE: like the reference API, only DECODER state carries over -- the
    encoder sees each segment independently (use StreamSession for true
    cache-aware continuity)."""
    fb = filterbank if filterbank is not None else np.asarray(
        params.preprocessor.filterbank)
    win = window if window is not None else np.asarray(
        params.preprocessor.window)
    from ..config import PreprocessorConfig

    pre = StreamingPreprocessor(fb, win,
                                cfg=PreprocessorConfig(n_mels=cfg.n_mels))
    mel = pre.process(np.asarray(audio_i16).reshape(1, -1))
    enc = enc_mod.encode_batch(params, cfg, jnp.asarray(mel, compute_dtype))
    if dec_state is None:
        dec_state = dec_mod.init_decoder_state(cfg, 1, compute_dtype)
    tokens, dec_state = jax.jit(dec_mod.greedy_decode, static_argnums=1)(
        params, cfg, enc, dec_state)
    toks = [(tid, frame + frame_offset)
            for tid, frame in dec_mod.tokens_to_list(np.asarray(tokens)[0],
                                                     cfg.blank_token)]
    text = tokens_to_text(toks, vocab)
    return text, toks, dec_state, frame_offset + enc.shape[1]
