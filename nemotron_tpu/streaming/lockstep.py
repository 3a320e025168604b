"""Lockstep many-stream serving: ONE device program per tick, PCM to tokens.

The maximum-throughput serving shape (every stream advances every tick, the
configuration all headline numbers are quoted at). Where `ServingEngine`
(serving.py) keeps the DSP and chunk assembly on the host so slots can
advance at independent rates, `LockstepEngine` fuses the ENTIRE pipeline
into a single jitted step:

    i16 PCM [S, N]
      -> on-device DSP (scale, pre-emph, frame, window, rFFT, mel, log)
      -> on-device mel ring (9-frame overlap seeding, chunk assembly)
      -> cache-aware streaming encoder
      -> on-device greedy RNN-T decode
      -> int32 tokens [k, S, valid_out, MAX]

Host work per tick: upload S*N int16 samples (6.4x fewer bytes than framed
f32 windows), download the token tensor, one vectorized detok pass. The
reference's per-chunk boundary crossings (mel upload, enc-out download,
per-symbol transfers, src/nemo-stream.cpp:961-1057) all disappear.

Chunk cadence is data-independent: how many chunks a tick consumes is a
pure function of sample counts, so the host tracks the mel-buffer fill and
bakes it into the jit signature as a static (two or three distinct programs
over a stream's lifetime, all cached).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (MAX_SYMBOLS_PER_STEP, CacheConfig, ModelConfig,
                      PreprocessorConfig)
from ..frontend.device_frontend import (FrontendState, frames_after,
                                        init_frontend_state,
                                        mel_frontend_step)
from ..frontend.preprocessor import pad_window
from ..models import decoder as dec_mod
from ..models import encoder as enc_mod
from ..utils.text import tokens_to_text


def _dsp_encode(cfg: ModelConfig, cc: CacheConfig, pcfg: PreprocessorConfig,
                buf_len: int, params, pcm_i16, front: FrontendState,
                mel_buf, enc_state, pos_heads, window, filterbank):
    """Shared tick front half: on-device DSP, mel-ring insert/shift, and
    the cache-aware encoder for every full chunk. All control flow is
    static: `buf_len` (mel frames already buffered) and the PCM length
    determine how many chunk steps the program contains (k = 0 or 1 at
    steady cadence). Returns (list of enc_out, front, mel_buf, enc_state)
    for the greedy/beam decode back halves."""
    S = pcm_i16.shape[0]
    mel, front = mel_frontend_step(pcm_i16, front, window, filterbank, pcfg)
    f = mel.shape[1]
    dtype = mel_buf.dtype
    if f:
        mel_buf = jax.lax.dynamic_update_slice_in_dim(
            mel_buf, mel.astype(dtype), buf_len, axis=1)

    chunk, shift = cc.chunk_mel_frames, cc.shift_mel_frames
    fill = buf_len + f
    enc_outs = []
    while fill >= chunk:
        enc_out, enc_state = enc_mod.encode_chunk(
            params, cfg, cc, mel_buf[:, :chunk], enc_state, pos_heads)
        enc_outs.append(enc_out)
        mel_buf = jnp.concatenate(
            [mel_buf[:, shift:],
             jnp.zeros((S, shift, mel_buf.shape[2]), dtype)], axis=1)
        fill -= shift
    return enc_outs, front, mel_buf, enc_state


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   donate_argnums=(7, 8, 9, 10))
def _fused_tick(cfg: ModelConfig, cc: CacheConfig, pcfg: PreprocessorConfig,
                buf_len: int, confidence: bool, params, pcm_i16,
                front: FrontendState, mel_buf, enc_state, dec_state,
                pos_heads, window, filterbank):
    """One fused greedy tick: DSP + encoder + greedy RNN-T decode.
    `confidence` (static) additionally returns per-emission log-posteriors
    [k, S, valid_out, MAX] f32 (None otherwise; the compiled program is
    unchanged when off)."""
    S = pcm_i16.shape[0]
    enc_outs, front, mel_buf, enc_state = _dsp_encode(
        cfg, cc, pcfg, buf_len, params, pcm_i16, front, mel_buf, enc_state,
        pos_heads, window, filterbank)
    tokens_out = []
    confs_out = []
    for enc_out in enc_outs:
        if confidence:
            toks, dec_state, confs = dec_mod.greedy_decode(
                params, cfg, enc_out, dec_state, with_confidence=True)
            confs_out.append(confs)
        else:
            toks, dec_state = dec_mod.greedy_decode(params, cfg, enc_out,
                                                    dec_state)
        tokens_out.append(toks)
    if tokens_out:
        tokens = jnp.stack(tokens_out)          # [k, S, valid_out, MAX]
    else:
        tokens = jnp.zeros((0, S, cc.valid_out_len, MAX_SYMBOLS_PER_STEP),
                           jnp.int32)
    confs = None
    if confidence:
        confs = (jnp.stack(confs_out) if confs_out
                 else jnp.zeros(tokens.shape, jnp.float32))
    return tokens, confs, front, mel_buf, enc_state, dec_state


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5),
                   donate_argnums=(8, 9, 10, 11))
def _fused_tick_beam(cfg: ModelConfig, cc: CacheConfig,
                     pcfg: PreprocessorConfig, buf_len: int,
                     beam_size: int, expansions: int, params, pcm_i16,
                     front: FrontendState, mel_buf, enc_state, beam_state,
                     pos_heads, window, filterbank, lm=None,
                     lm_weight=0.3, lm_bonus=0.0):
    """One fused BEAM tick: same DSP/encoder front half, then the
    on-device batched beam search (models/beam.py) chained over the tick's
    chunks. No token tensor leaves the device -- transcripts are fetched
    lazily from the beam state (LockstepEngine.refresh_transcripts)."""
    from ..models import beam as beam_mod

    enc_outs, front, mel_buf, enc_state = _dsp_encode(
        cfg, cc, pcfg, buf_len, params, pcm_i16, front, mel_buf, enc_state,
        pos_heads, window, filterbank)
    for enc_out in enc_outs:
        beam_state = beam_mod.beam_decode(params, cfg, enc_out,
                                          beam_state, beam_size,
                                          expansions, lm=lm,
                                          lm_weight=lm_weight,
                                          lm_bonus=lm_bonus)
    return front, mel_buf, enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   donate_argnums=(7, 8, 9, 10, 14))
def _fused_tick_tdt(cfg: ModelConfig, cc: CacheConfig,
                    pcfg: PreprocessorConfig, buf_len: int,
                    confidence: bool, params,
                    pcm_i16, front: FrontendState, mel_buf, enc_state,
                    dec_state, pos_heads, window, filterbank, skip):
    """One fused TDT tick: DSP + encoder + duration-aware greedy walk,
    with the cross-chunk jump carry (`skip` [S]) threaded through the
    tick's chunks and returned for the next tick. `confidence` (static)
    additionally returns per-emission token-head log-posteriors (None
    otherwise)."""
    from ..models.tdt import tdt_greedy_decode

    S = pcm_i16.shape[0]
    enc_outs, front, mel_buf, enc_state = _dsp_encode(
        cfg, cc, pcfg, buf_len, params, pcm_i16, front, mel_buf, enc_state,
        pos_heads, window, filterbank)
    tokens_out, confs_out = [], []
    for enc_out in enc_outs:
        if confidence:
            toks, confs, dec_state, skip = tdt_greedy_decode(
                params, cfg, enc_out, dec_state, skip_in=skip,
                with_confidence=True)
            confs_out.append(confs)
        else:
            toks, dec_state, skip = tdt_greedy_decode(
                params, cfg, enc_out, dec_state, skip_in=skip)
        tokens_out.append(toks)
    if tokens_out:
        tokens = jnp.stack(tokens_out)          # [k, S, valid_out, MAX]
    else:
        tokens = jnp.zeros((0, S, cc.valid_out_len, MAX_SYMBOLS_PER_STEP),
                           jnp.int32)
    confs = None
    if confidence:
        confs = (jnp.stack(confs_out) if confs_out
                 else jnp.zeros(tokens.shape, jnp.float32))
    return tokens, confs, front, mel_buf, enc_state, dec_state, skip


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 15, 16),
                   donate_argnums=(7, 8, 9, 10))
def _fused_tick_tdt_beam(cfg: ModelConfig, cc: CacheConfig,
                         pcfg: PreprocessorConfig, buf_len: int,
                         beam_size: int, params, pcm_i16,
                         front: FrontendState, mel_buf, enc_state,
                         beam_state, pos_heads, window, filterbank,
                         lm=None, lm_weight=0.3, lm_bonus=0.0):
    """One fused duration-aware BEAM tick for TDT checkpoints
    (models/tdt.py tdt_beam_decode) chained over the tick's chunks; the
    TdtBeamState carries per-hypothesis time-pointer overshoots between
    chunks and ticks."""
    from ..models.tdt import tdt_beam_decode

    enc_outs, front, mel_buf, enc_state = _dsp_encode(
        cfg, cc, pcfg, buf_len, params, pcm_i16, front, mel_buf, enc_state,
        pos_heads, window, filterbank)
    for enc_out in enc_outs:
        beam_state = tdt_beam_decode(params, cfg, enc_out, beam_state,
                                     beam_size, lm=lm, lm_weight=lm_weight,
                                     lm_bonus=lm_bonus)
    return front, mel_buf, enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                   donate_argnums=(7, 8, 9))
def _fused_tick_ctc(cfg: ModelConfig, cc: CacheConfig,
                    pcfg: PreprocessorConfig, buf_len: int,
                    confidence: bool, params,
                    pcm_i16, front: FrontendState, mel_buf, enc_state,
                    pos_heads, window, filterbank):
    """One fused CTC tick: DSP + encoder + the auxiliary head's per-frame
    argmax (the collapse carry lives on the host). `confidence` (static)
    additionally returns the argmax's log-posterior per frame."""
    from ..models import ctc as ctc_mod

    S = pcm_i16.shape[0]
    enc_outs, front, mel_buf, enc_state = _dsp_encode(
        cfg, cc, pcfg, buf_len, params, pcm_i16, front, mel_buf, enc_state,
        pos_heads, window, filterbank)
    ids_out, lp_out = [], []
    for e in enc_outs:
        if confidence:
            ids_e, lp_e = ctc_mod.frame_log_posteriors(params, e)
            lp_out.append(lp_e)
        else:
            ids_e = jnp.argmax(ctc_mod.ctc_logits(params, e),
                               axis=-1).astype(jnp.int32)
        ids_out.append(ids_e)
    if ids_out:
        ids = jnp.stack(ids_out)                # [k, S, valid_out]
    else:
        ids = jnp.zeros((0, S, cc.valid_out_len), jnp.int32)
    logp = None
    if confidence:
        logp = (jnp.stack(lp_out) if lp_out
                else jnp.zeros(ids.shape, jnp.float32))
    return ids, logp, front, mel_buf, enc_state


class LockstepEngine:
    """S streams at a fixed shared cadence, end-to-end on device.

    Lifecycle mirrors StreamSession (reset / tick / finalize / transcripts)
    but `tick` takes one PCM block for ALL streams at once. Typical use:
    feed `cc.shift_samples` of audio per stream per tick (real time)."""

    def __init__(self, params, cfg: ModelConfig,
                 vocab: list[str] | None = None,
                 cache_config: CacheConfig | None = None,
                 n_streams: int = 256,
                 compute_dtype=jnp.bfloat16, mesh=None,
                 beam_size: int = 1, beam_expansions: int | None = None,
                 max_beam_tokens: int = 4096,
                 confidence: bool = False,
                 endpoint_silence_s: float | None = None,
                 endpoint_reset: bool = False,
                 ctc: bool = False,
                 lm=None, lm_weight: float = 0.3,
                 lm_bonus: float = 0.0):
        """beam_size > 1 switches every tick to the fused on-device beam
        search (accuracy-sensitive decode at serving scale -- capability
        beyond both the greedy-only reference and the greedy engines).
        Beam transcripts are REVISABLE (the best hypothesis can change
        between ticks), so tick() returns {} and transcripts are fetched
        lazily: refresh_transcripts() / finalize(). Token timestamps are
        not attributed in beam mode (frame index 0), as in StreamSession."""
        from ..params import cast_params

        self.cfg = cfg
        self.cc = cache_config or CacheConfig(n_mels=cfg.n_mels)
        self.pcfg = PreprocessorConfig(n_mels=cfg.n_mels)
        self.vocab = vocab or []
        self.n_streams = n_streams
        # Multihost (multi-process) subclasses preset n_local/_local_rows
        # BEFORE delegating here: the device batch stays global (n_streams)
        # while each process feeds/reads only its own rows
        # (parallel/multihost.py). Single-process: local == global.
        if not hasattr(self, "n_local"):
            self.n_local = n_streams
            self._local_rows = None
        self.dtype = compute_dtype
        self.mesh = mesh
        self.beam_size = beam_size
        self.beam_expansions = (beam_expansions
                                if beam_expansions is not None
                                else MAX_SYMBOLS_PER_STEP)
        self.max_beam_tokens = max_beam_tokens
        # per-emission log-posteriors: engine tokens become (id, frame,
        # conf) triples; +[k,S,valid_out,MAX] f32 per tick of download
        self.confidence = confidence
        if confidence and beam_size > 1:
            raise ValueError("confidence requires greedy decode")
        # LM shallow fusion (models/lm.py): engine parity with
        # StreamSession's beam decode
        if lm is not None and beam_size <= 1:
            raise ValueError("LM shallow fusion requires beam_size > 1")
        self.lm = (None if lm is None
                   else jax.tree_util.tree_map(jnp.asarray, lm))
        self.lm_weight = float(lm_weight)
        self.lm_bonus = float(lm_bonus)
        # decode-mode widening (engine parity with StreamSession): ctc=True
        # uses the hybrid checkpoint's auxiliary head; TDT checkpoints
        # auto-switch to the duration-aware walk with a per-stream
        # cross-chunk skip carry
        self.ctc = ctc
        self.tdt = bool(cfg.tdt_durations) and not ctc
        if ctc:
            if params.ctc is None:
                raise ValueError("ctc=True needs a model with a CTC head "
                                 "(ctc_decoder.* tensors)")
            if beam_size > 1:
                raise ValueError("ctc decode excludes beam (CTC beam would "
                                 "be a prefix search; decode the hybrid's "
                                 "RNN-T head for beam)")
            if endpoint_reset:
                raise ValueError("endpoint_reset resets the prediction "
                                 "network; CTC decode has none")
        # Utterance endpointing (greedy only; same semantics as
        # ServingEngine): post-emission silence of endpoint_silence_s
        # fires an event per stream and resets its prediction network.
        # In PIPELINED mode the reset lands one tick late (tokens are
        # collected a tick behind the dispatched state) — harmless,
        # because blanks never advance the decoder state, unless the next
        # utterance begins within that single in-flight tick.
        # endpoint_reset defaults OFF — see ServingEngine.__init__: a
        # reset mid-silence re-emits the utterance tail still inside the
        # encoder's attention window (measured phantom utterance).
        self._ep_frames = None
        self._ep_reset = bool(endpoint_reset)
        if endpoint_silence_s is not None:
            if beam_size > 1:
                raise ValueError("endpointing requires greedy decode")
            frame_s = (self.cc.subsampling_factor * self.cc.hop_length
                       / self.cc.sample_rate)
            self._ep_frames = max(1, round(endpoint_silence_s / frame_s))

        self.params = cast_params(params, compute_dtype)
        self.pos_heads = enc_mod.precompute_pos_heads(
            params, cfg, self.cc, dtype=compute_dtype)
        self.window = jnp.asarray(
            pad_window(np.asarray(params.preprocessor.window, np.float32),
                       self.pcfg.n_fft), jnp.float32)
        self.filterbank = jnp.asarray(params.preprocessor.filterbank,
                                      jnp.float32)
        if mesh is not None:
            from ..parallel.mesh import param_shardings, shard_params

            self.params = shard_params(self.params, mesh)
            self.pos_heads = jax.device_put(
                self.pos_heads, param_shardings(self.pos_heads, mesh))
        self.reset()

    def reset(self) -> None:
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
        self._beam_dirty = False
        self.tdt_skip = jnp.zeros((S,), jnp.int32) if self.tdt else None
        self.ctc_prev = (np.full(self.n_local, -1, np.int64)
                         if self.ctc else None)
        self.front = init_frontend_state(S, self.pcfg)
        # 9-frame zero-seeded overlap (reference src/nemo-stream.cpp:58-60)
        cap = cc.chunk_mel_frames + cc.shift_mel_frames + 1
        self.mel_buf = jnp.zeros((S, cap, cfg.n_mels), self.dtype)
        self.buf_len = cc.pre_encode_cache_size
        if self.mesh is not None:
            from ..parallel.mesh import shard_state

            self.enc_state = shard_state(self.enc_state, self.mesh)
            self.dec_state = shard_state(self.dec_state, self.mesh)
            if self.beam_state is not None:
                from ..parallel.mesh import shard_stream_major

                self.beam_state = shard_stream_major(self.beam_state,
                                                     self.mesh)
            self.front = shard_state(self.front, self.mesh)
            self.mel_buf = jax.device_put(
                self.mel_buf,
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec("data", None,
                                                          None)))
            if self.tdt_skip is not None:
                self.tdt_skip = jax.device_put(
                    self.tdt_skip, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec("data")))
        self.tokens: list[list[tuple[int, int]]] = [
            [] for _ in range(self.n_local)]
        self.transcripts = [""] * self.n_local
        self.frame_offset = 0
        self.total_chunks = 0
        self.ep_silence = np.zeros(self.n_local, np.int64)
        self.ep_emitted = np.zeros(self.n_local, bool)
        self.ep_utt_start = np.zeros(self.n_local, np.int64)
        # (stream, end_idx) pairs; end_idx snapshotted at fire time so
        # later emissions never leak into the finished utterance's event
        self._ep_pending: list[tuple[int, int]] = []
        self.utterances_retired = 0
        self._pending = None
        # canonical tick size (samples): fixed by the FIRST tick and used
        # to normalize ragged inputs afterwards (jit-signature reuse)
        self._tick_samples: int | None = None

    # -- host<->device boundary hooks (overridden by the multihost engine) --

    def _put_pcm(self, pcm_i16: np.ndarray):
        """Host PCM block [n_local, N] -> device array [n_streams, N]."""
        return jnp.asarray(pcm_i16, jnp.int16)

    def _fetch_block(self, x, stream_axis: int) -> np.ndarray:
        """Device output -> numpy rows owned by this process along
        `stream_axis` (the whole array in single-process mode)."""
        return np.asarray(x)

    def _chunks_in(self, fill: int) -> int:
        k = 0
        while fill >= self.cc.chunk_mel_frames:
            fill -= self.cc.shift_mel_frames
            k += 1
        return k

    def _issue(self, pcm_i16: np.ndarray):
        """Dispatch one fused tick (async); returns (tokens_jax, frame
        offset base) to be materialized by _collect."""
        assert pcm_i16.shape[0] == self.n_local
        cap = int(self.mel_buf.shape[1])
        f = frames_after(int(self.front.residue.shape[1]), pcm_i16.shape[1],
                         self.pcfg)
        assert self.buf_len + f <= cap, (
            f"tick of {pcm_i16.shape[1]} samples would overflow the mel ring"
            f" ({self.buf_len}+{f} > {cap}); feed at most ~shift_samples"
            " per tick")

        if self.beam_state is not None:
            if self.tdt:
                (self.front, self.mel_buf, self.enc_state,
                 self.beam_state) = _fused_tick_tdt_beam(
                    self.cfg, self.cc, self.pcfg, self.buf_len,
                    self.beam_size, self.params,
                    self._put_pcm(pcm_i16), self.front, self.mel_buf,
                    self.enc_state, self.beam_state, self.pos_heads,
                    self.window, self.filterbank, self.lm, self.lm_weight,
                    self.lm_bonus)
            else:
                (self.front, self.mel_buf, self.enc_state,
                 self.beam_state) = _fused_tick_beam(
                    self.cfg, self.cc, self.pcfg, self.buf_len,
                    self.beam_size, self.beam_expansions, self.params,
                    self._put_pcm(pcm_i16), self.front, self.mel_buf,
                    self.enc_state, self.beam_state, self.pos_heads,
                    self.window, self.filterbank, self.lm, self.lm_weight,
                    self.lm_bonus)
            tokens = confs = ctc_ids = ctc_lp = None
            self._beam_dirty = True
        elif self.ctc:
            (ctc_ids, ctc_lp, self.front, self.mel_buf,
             self.enc_state) = _fused_tick_ctc(
                self.cfg, self.cc, self.pcfg, self.buf_len,
                self.confidence, self.params,
                self._put_pcm(pcm_i16), self.front, self.mel_buf,
                self.enc_state, self.pos_heads, self.window,
                self.filterbank)
            tokens = confs = None
        elif self.tdt:
            (tokens, confs, self.front, self.mel_buf, self.enc_state,
             self.dec_state, self.tdt_skip) = _fused_tick_tdt(
                self.cfg, self.cc, self.pcfg, self.buf_len,
                self.confidence, self.params,
                self._put_pcm(pcm_i16), self.front, self.mel_buf,
                self.enc_state, self.dec_state, self.pos_heads,
                self.window, self.filterbank, self.tdt_skip)
            ctc_ids = ctc_lp = None
        else:
            (tokens, confs, self.front, self.mel_buf, self.enc_state,
             self.dec_state) = _fused_tick(
                self.cfg, self.cc, self.pcfg, self.buf_len,
                self.confidence, self.params, self._put_pcm(pcm_i16),
                self.front, self.mel_buf, self.enc_state,
                self.dec_state, self.pos_heads, self.window,
                self.filterbank)
            ctc_ids = ctc_lp = None
        k = self._chunks_in(self.buf_len + f)
        self.buf_len = self.buf_len + f - k * self.cc.shift_mel_frames
        self.total_chunks += k
        base = self.frame_offset
        self.frame_offset += k * self.cc.valid_out_len
        return tokens, confs, ctc_ids, ctc_lp, base

    def _ctc_collapse_chunk(self, ids: np.ndarray, base: int,
                            lp: np.ndarray | None = None) -> dict:
        """CTC greedy collapse of one chunk's ids [S, valid_out] across
        every stream, continuing each stream's carry. With lp (confidence
        mode) tokens become (id, frame, logp) triples."""
        blank = self.cfg.blank_token
        emitted: dict[int, list] = {}
        for s in range(self.n_local):
            prev, toks = int(self.ctc_prev[s]), []
            for t in range(ids.shape[1]):
                i = int(ids[s, t])
                if i != prev and i != blank:
                    if lp is None:
                        toks.append((i, base + t))
                    else:
                        toks.append((i, base + t, float(lp[s, t])))
                prev = i
            self.ctc_prev[s] = prev
            if toks:
                emitted[s] = toks
        return emitted

    def _collect(self, tokens, confs, ctc_ids, ctc_lp,
                 base: int) -> dict[int, str]:
        """Materialize a tick's tokens and fold them into transcripts."""
        out: dict[int, str] = {}
        if tokens is None and ctc_ids is None:
            return out         # beam mode: transcripts fetched lazily
        k = (tokens if ctc_ids is None else ctc_ids).shape[0]
        if ctc_ids is not None:
            ctc_ids = self._fetch_block(ctc_ids, 1).astype(np.int64)
            if ctc_lp is not None:
                ctc_lp = self._fetch_block(ctc_lp, 1)
        else:
            tokens = self._fetch_block(tokens, 1)
        if confs is not None:
            confs = self._fetch_block(confs, 1)
        for i in range(k):
            if ctc_ids is not None:
                emitted = self._ctc_collapse_chunk(
                    ctc_ids[i], base + i * self.cc.valid_out_len,
                    lp=ctc_lp[i] if ctc_lp is not None else None)
            else:
                emitted = dec_mod.extract_emitted(
                    tokens[i], self.cfg.blank_token,
                    np.full(self.n_local,
                            base + i * self.cc.valid_out_len, np.int64),
                    confs=confs[i] if confs is not None else None)
            for s, toks in emitted.items():
                self.tokens[s].extend(toks)
                text = tokens_to_text(toks, self.vocab)
                self.transcripts[s] += text
                out[s] = out.get(s, "") + text
            if self._ep_frames is not None:
                self._ep_update(emitted,
                                base + (i + 1) * self.cc.valid_out_len)
        return out

    def _ep_update(self, emitted: dict, current_offset: int) -> None:
        """One processed chunk (every stream advanced valid_out_len
        frames): same silence accounting as ServingEngine._ep_update, with
        a shared (lockstep) frame offset."""
        self.ep_silence += self.cc.valid_out_len
        for s, toks in emitted.items():
            self.ep_silence[s] = max(0, current_offset - (toks[-1][1] + 1))
            self.ep_emitted[s] = True
        fired = np.flatnonzero(self.ep_emitted
                               & (self.ep_silence >= self._ep_frames))
        if fired.size == 0:
            return
        self._ep_pending.extend((int(s), len(self.tokens[int(s)]))
                                for s in fired)
        self.ep_emitted[fired] = False
        self.ep_silence[fired] = 0
        if self._ep_reset:
            from .serving import _reset_decoder_slots

            # device-global mask; `fired` holds LOCAL indices, so this is
            # only valid when local == global (the multihost engine rejects
            # endpoint_reset: firing is data-dependent per process and the
            # collective reset call would desync the processes)
            mask = np.zeros(self.n_streams, bool)
            mask[fired] = True
            self.dec_state = _reset_decoder_slots(
                self.dec_state, jnp.asarray(mask),
                jnp.int32(self.cfg.blank_token))

    def poll_endpoints(self) -> list[tuple[int, str, list]]:
        """Drain utterance-endpoint events; see
        ServingEngine.poll_endpoints (identical contract)."""
        out = []
        for s, end in self._ep_pending:
            start = int(self.ep_utt_start[s])
            toks = self.tokens[s][start:end]
            out.append((s, tokens_to_text(toks, self.vocab), toks))
            self.ep_utt_start[s] = end
            self.utterances_retired += 1
        self._ep_pending = []
        return out

    def tick(self, pcm_i16: np.ndarray) -> dict[int, str]:
        """Advance every stream by pcm_i16 [S, N] samples; returns new text
        per stream.

        The FIRST tick's N becomes the canonical tick size (part of the
        compiled program's signature; cc.shift_samples is the natural
        choice). Ragged later ticks are handled without the caller knowing
        the jit-signature rule: a LARGER block is split into canonical
        sub-ticks plus an exact-size remainder (so it can never overflow
        the mel ring), and a SHORT block -- e.g. the tail of a recording
        before finalize() -- is issued at its exact size. Sample-exact in
        both cases; each distinct non-canonical size compiles one extra
        program (a one-off, fine for tail audio; steady-state callers
        should stick to one size)."""
        S, n = pcm_i16.shape
        if self._tick_samples is None:
            self._tick_samples = n
        T = self._tick_samples
        if n <= T:
            return self._collect(*self._issue(pcm_i16))
        out: dict[int, str] = {}
        for ofs in range(0, n, T):
            for s, text in self._collect(
                    *self._issue(pcm_i16[:, ofs:ofs + T])).items():
                out[s] = out.get(s, "") + text
        return out

    def tick_pipelined(self, pcm_i16: np.ndarray) -> dict[int, str]:
        """Depth-1 pipelined tick: dispatches this tick asynchronously and
        returns the PREVIOUS tick's text. The next tick's PCM upload and
        host work overlap the device compute instead of serializing behind
        a sync -- higher throughput for one extra tick of text latency.
        Call flush_pipeline() (or finalize()) to drain the last tick."""
        prev = self._pending
        self._pending = self._issue(pcm_i16)
        return self._collect(*prev) if prev is not None else {}

    def flush_pipeline(self) -> dict[int, str]:
        if self._pending is None:
            return {}
        prev, self._pending = self._pending, None
        return self._collect(*prev)

    def refresh_transcripts(self) -> list[str]:
        """Beam mode: rewrite transcripts/tokens from the CURRENT best
        hypothesis (length-normalized selection, the serving default --
        see models/beam.py best_hypothesis). ONE device call + one [S, U]
        download, only when the beam advanced since the last refresh.
        Greedy mode: transcripts are already incremental; no-op."""
        if self.beam_state is not None and self._beam_dirty:
            from ..models import beam as beam_mod

            btok, blen, _ = beam_mod.best_hypothesis(self.beam_state,
                                                     length_norm=True)
            btok = self._fetch_block(btok, 0)
            blen = self._fetch_block(blen, 0)
            for s in range(self.n_local):
                toks = [(int(t), 0) for t in btok[s, : blen[s]]]
                self.tokens[s] = toks
                self.transcripts[s] = tokens_to_text(toks, self.vocab)
            self._beam_dirty = False
        return list(self.transcripts)

    # -- checkpoint / resume --------------------------------------------------

    def _unsnap_rows(self, a: np.ndarray, dtype, stream_axis: int):
        """Inverse of `_fetch_block` for snapshot restore: numpy rows owned
        by this process along `stream_axis` -> device array. Single-process:
        the rows ARE the whole array (multihost engines reassemble the
        global sharded array from each process's rows)."""
        from ..utils.npz import npz_decode

        return jnp.asarray(npz_decode(a), dtype)

    def save(self, path: str) -> None:
        """Snapshot all device state + transcripts (exact resume, the same
        contract as StreamSession/ServingEngine.save).

        Per-stream device leaves go through `_fetch_block`, so a multihost
        engine snapshots only the rows its process owns."""
        self.flush_pipeline()
        fetch = self._fetch_block
        flat = {
            "enc/k_cache": fetch(self.enc_state.k_cache, 1),
            "enc/v_cache": fetch(self.enc_state.v_cache, 1),
            "enc/k_scale": fetch(self.enc_state.k_scale, 1),
            "enc/v_scale": fetch(self.enc_state.v_scale, 1),
            "enc/conv_cache": fetch(self.enc_state.conv_cache, 1),
            "enc/valid_len": fetch(self.enc_state.valid_len, 0),
            "enc/phase": fetch(self.enc_state.phase, 0),
            "dec/h": fetch(self.dec_state.h, 0),
            "dec/c": fetch(self.dec_state.c, 0),
            "dec/prev_token": fetch(self.dec_state.prev_token, 0),
            "front/last_sample": fetch(self.front.last_sample, 0),
            "front/residue": fetch(self.front.residue, 0),
            "mel_buf": np.asarray(fetch(self.mel_buf, 0), np.float32),
            "buf_len": np.int64(self.buf_len),
            "frame_offset": np.int64(self.frame_offset),
            "total_chunks": np.int64(self.total_chunks),
            "transcripts": np.asarray(self.transcripts, dtype=object),
        }
        if self._ep_frames is not None:
            flat["ep/silence"] = self.ep_silence
            flat["ep/emitted"] = self.ep_emitted
            flat["ep/utt_start"] = self.ep_utt_start
            flat["ep/pending"] = np.asarray(self._ep_pending,
                                            np.int64).reshape(-1, 2)
        if self.beam_state is not None:
            self.refresh_transcripts()
            flat["transcripts"] = np.asarray(self.transcripts, dtype=object)
            keys = ("h", "c", "prev_token", "scores", "tokens", "lengths")
            if hasattr(self.beam_state, "t"):    # TdtBeamState extras
                keys += ("t", "sym")
            if self.beam_state.lm_h is not None:
                keys += ("lm_h", "lm_c")
            for k in keys:
                flat[f"beam/{k}"] = fetch(getattr(self.beam_state, k), 0)
        if self.tdt_skip is not None:
            flat["tdt_skip"] = fetch(self.tdt_skip, 0)
        if self.ctc_prev is not None:
            flat["ctc_prev"] = self.ctc_prev
        for s in range(self.n_local):
            if self.confidence:   # (id, frame, log-posterior) triples
                flat[f"tokens/{s}"] = np.asarray(
                    self.tokens[s], np.float64).reshape(-1, 3)
            else:
                flat[f"tokens/{s}"] = np.asarray(
                    self.tokens[s], np.int64).reshape(-1, 2)
        from ..utils.npz import savez_bf16_safe

        savez_bf16_safe(path, flat)

    def load(self, path: str) -> None:
        from ..frontend.device_frontend import FrontendState

        from ..utils.npz import NpzView

        z = NpzView(np.load(path, allow_pickle=True))
        if len(z["dec/prev_token"]) != self.n_local:
            raise ValueError(
                f"snapshot holds {len(z['dec/prev_token'])} stream rows, "
                f"engine owns {self.n_local}")
        ring_dtype = (jnp.int8 if self.cc.kv_quant_max is not None
                      else self.dtype)
        un = self._unsnap_rows
        self.enc_state = enc_mod.EncoderState(
            k_cache=un(z["enc/k_cache"], ring_dtype, 1),
            v_cache=un(z["enc/v_cache"], ring_dtype, 1),
            k_scale=un(z["enc/k_scale"], jnp.float32, 1),
            v_scale=un(z["enc/v_scale"], jnp.float32, 1),
            conv_cache=un(z["enc/conv_cache"], self.dtype, 1),
            valid_len=un(z["enc/valid_len"], jnp.int32, 0),
            phase=un(z["enc/phase"], jnp.int32, 0))
        self.dec_state = dec_mod.DecoderState(
            h=un(z["dec/h"], self.dtype, 0),
            c=un(z["dec/c"], self.dtype, 0),
            prev_token=un(z["dec/prev_token"], jnp.int32, 0))
        if self.tdt != ("tdt_skip" in z.files):
            raise ValueError("snapshot/engine TDT-mode mismatch")
        if self.tdt:
            self.tdt_skip = un(z["tdt_skip"], jnp.int32, 0)
        if self.ctc != ("ctc_prev" in z.files):
            raise ValueError("snapshot/engine CTC-mode mismatch")
        if self.ctc:
            self.ctc_prev = z["ctc_prev"].astype(np.int64)
        has_beam = "beam/h" in z.files
        if (self.beam_state is not None) != has_beam:
            raise ValueError(
                "snapshot/engine beam-mode mismatch: snapshot "
                f"{'carries' if has_beam else 'has no'} beam state, engine "
                f"beam_size={self.beam_size}")
        if has_beam:
            if z["beam/h"].shape[1] != self.beam_size:
                raise ValueError(
                    f"snapshot beam width K={z['beam/h'].shape[1]} != "
                    f"engine beam_size={self.beam_size}")
            has_lm = "beam/lm_h" in z.files
            if has_lm != (self.lm is not None):
                raise ValueError(
                    "snapshot/engine LM-fusion mismatch: snapshot "
                    f"{'carries' if has_lm else 'has no'} LM state, engine "
                    f"lm={'set' if self.lm is not None else 'None'}")
            has_tdt_beam = "beam/t" in z.files
            if has_tdt_beam != self.tdt:
                raise ValueError(
                    "snapshot/engine beam-family mismatch: snapshot is "
                    f"{'TDT' if has_tdt_beam else 'RNN-T'}, engine is "
                    f"{'TDT' if self.tdt else 'RNN-T'}")
            common = dict(
                h=un(z["beam/h"], self.dtype, 0),
                c=un(z["beam/c"], self.dtype, 0),
                prev_token=un(z["beam/prev_token"], jnp.int32, 0),
                scores=un(z["beam/scores"], jnp.float32, 0),
                tokens=un(z["beam/tokens"], jnp.int32, 0),
                lengths=un(z["beam/lengths"], jnp.int32, 0),
                lm_h=(un(z["beam/lm_h"], self.dtype, 0)
                      if has_lm else None),
                lm_c=(un(z["beam/lm_c"], self.dtype, 0)
                      if has_lm else None))
            if self.tdt:
                from ..models import tdt as tdt_mod

                self.beam_state = tdt_mod.TdtBeamState(
                    t=un(z["beam/t"], jnp.int32, 0),
                    sym=un(z["beam/sym"], jnp.int32, 0), **common)
            else:
                from ..models import beam as beam_mod

                self.beam_state = beam_mod.BeamState(**common)
            self._beam_dirty = True
        self.front = FrontendState(
            last_sample=un(z["front/last_sample"], jnp.float32, 0),
            residue=un(z["front/residue"], jnp.float32, 0))
        self.mel_buf = un(z["mel_buf"], self.dtype, 0)
        self.buf_len = int(z["buf_len"])
        self.frame_offset = int(z["frame_offset"])
        self.total_chunks = int(z["total_chunks"])
        if self._ep_frames is not None and "ep/silence" in z.files:
            self.ep_silence = z["ep/silence"].astype(np.int64)
            self.ep_emitted = z["ep/emitted"].astype(bool)
            self.ep_utt_start = z["ep/utt_start"].astype(np.int64)
            self._ep_pending = [(int(s), int(e))
                                for s, e in z["ep/pending"].reshape(-1, 2)]
        self.transcripts = [str(t) for t in z["transcripts"]]
        self.tokens = [
            [(int(row[0]), int(row[1]), float(row[2])) if len(row) == 3
             else (int(row[0]), int(row[1])) for row in z[f"tokens/{s}"]]
            for s in range(self.n_local)]
        self._pending = None
        self._shard_loaded_state()

    def _shard_loaded_state(self) -> None:
        """Re-shard the freshly-loaded (single-device) state over the mesh.
        Multihost engines override this to a no-op: their `_unsnap_rows`
        already materializes globally-sharded arrays."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_state, shard_stream_major

            self.enc_state = shard_state(self.enc_state, self.mesh)
            self.dec_state = shard_state(self.dec_state, self.mesh)
            self.front = shard_state(self.front, self.mesh)
            if self.beam_state is not None:
                self.beam_state = shard_stream_major(self.beam_state,
                                                     self.mesh)
            if self.tdt_skip is not None:
                self.tdt_skip = jax.device_put(
                    self.tdt_skip, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec("data")))

    def finalize(self) -> list[str]:
        """Flush pending (non-overlap) mel frames with one zero-padded
        chunk, as the session/reference finalize does.

        The pad is issued at its EXACT total size (ragged tick handles
        the split), so the remainder piece compiles one differently-shaped
        program at shutdown -- a deliberate, measured-irrelevant
        recompile."""
        self.flush_pipeline()
        pending = self.buf_len - self.cc.pre_encode_cache_size
        if pending > 0:
            need = (self.cc.chunk_mel_frames - self.buf_len) * \
                self.pcfg.n_window_stride
            pad = np.zeros((self.n_local,
                            max(need, 0) + self.pcfg.n_fft), np.int16)
            self.tick(pad)
        return self.refresh_transcripts()
