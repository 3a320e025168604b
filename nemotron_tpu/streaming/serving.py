"""Many-stream continuous-batching serving engine.

The new capability on top of the reference (which is strictly 1 session = 1
stream, SURVEY.md 2.4): a fixed slab of S stream slots whose state lives
permanently on device (sharded over the mesh 'data' axis), with admission /
eviction implemented as on-device zeroing of slab slices -- the reference's
reset semantics (src/nemo-stream.cpp:81-101) per slot.

Every engine tick runs ONE fused, step-masked chunk_step over all S slots:
slots without a full chunk buffered are masked out (their device state is
frozen, not polluted with padding), so streams may arrive and advance at
fully independent rates. The step shape is static -- one compiled program
for the engine's lifetime -- the TPU analogue of continuous batching. Ring
phases are kept in lockstep; a lagging slot's ring is realigned (rolled) on
resume, preserving exact solo-equivalent transcripts (fuzz-tested).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CacheConfig, ModelConfig, PreprocessorConfig
from ..models import decoder as dec_mod
from ..models import encoder as enc_mod
from ..params import ModelParams
from ..frontend.preprocessor import StreamingPreprocessor
from ..utils.text import tokens_to_text
from .session import (chunk_step_masked, chunk_step_masked_beam,
                      _chunk_step_masked_conf_jit)


class _MelBuffer:
    """Per-slot mel FIFO as a list of parts: appends are O(1); the parts are
    concatenated only when a chunk is actually consumed (once per engine
    tick per ready slot), instead of re-copying the whole buffer on every
    feed_audio call."""

    __slots__ = ("parts", "count")

    def __init__(self, seed: np.ndarray):
        self.parts = [seed]
        self.count = seed.shape[0]

    def append(self, mel: np.ndarray) -> None:
        self.parts.append(mel)
        self.count += mel.shape[0]

    def compact(self) -> np.ndarray:
        if len(self.parts) > 1:
            self.parts = [np.concatenate(self.parts)]
        return self.parts[0]

    def drop(self, k: int) -> None:
        self.parts = [self.compact()[k:]]  # view, no copy
        self.count -= k


class _SegmentBuffer:
    """Per-slot raw-PCM retention for two-pass refinement
    (keep_segment_audio): holds the samples of the CURRENT utterance,
    addressed in absolute samples since slot admission so segment cuts
    can land exactly on the endpointer's processed-frame boundary (any
    buffered-but-unprocessed audio — which may already contain the next
    utterance's onset — stays in the buffer). Bounded by `cap` samples:
    overflowing drops the oldest audio and marks the segment truncated."""

    __slots__ = ("parts", "abs0", "total", "cap", "truncated")

    def __init__(self, cap: int):
        self.parts: list[np.ndarray] = []
        self.abs0 = 0          # absolute sample index of parts[0][0]
        self.total = 0         # buffered samples
        self.cap = cap
        self.truncated = False

    def append(self, pcm: np.ndarray) -> None:
        self.parts.append(pcm)
        self.total += pcm.size
        if self.total > self.cap:
            buf = np.concatenate(self.parts) if len(self.parts) > 1 \
                else self.parts[0]
            drop = self.total - self.cap
            self.parts = [buf[drop:]]
            self.abs0 += drop
            self.total = self.cap
            self.truncated = True

    def cut(self, upto_abs: int) -> np.ndarray:
        """Return buffered samples in [abs0, upto_abs) and drop them."""
        buf = (np.concatenate(self.parts) if len(self.parts) > 1
               else self.parts[0] if self.parts
               else np.zeros(0, np.int16))
        k = max(0, min(int(upto_abs) - self.abs0, buf.size))
        seg, rest = buf[:k], buf[k:]
        self.parts = [rest] if rest.size else []
        self.abs0 += k
        self.total = rest.size
        self.truncated = False
        return seg

    def compact(self) -> np.ndarray:
        if len(self.parts) > 1:
            self.parts = [np.concatenate(self.parts)]
        return self.parts[0] if self.parts else np.zeros(0, np.int16)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _reset_slot(enc_state, dec_state, slot, blank_token):
    """Zero one slot's caches and decoder state on device (admission and
    eviction both reduce to this)."""
    enc_state = enc_mod.EncoderState(
        k_cache=enc_state.k_cache.at[:, slot].set(0),
        v_cache=enc_state.v_cache.at[:, slot].set(0),
        k_scale=enc_state.k_scale.at[:, slot].set(1.0),
        v_scale=enc_state.v_scale.at[:, slot].set(1.0),
        conv_cache=enc_state.conv_cache.at[:, slot].set(0),
        valid_len=enc_state.valid_len.at[slot].set(0),
        phase=enc_state.phase.at[slot].set(0),
    )
    dec_state = dec_mod.DecoderState(
        h=dec_state.h.at[slot].set(0),
        c=dec_state.c.at[slot].set(0),
        prev_token=dec_state.prev_token.at[slot].set(blank_token),
    )
    return enc_state, dec_state


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _reset_slots(enc_state, dec_state, mask, blank_token):
    """Zero ALL masked slots' caches and decoder state in one device call
    (bulk admission: 1 dispatch instead of one per slot)."""
    m5 = mask[None, :, None, None, None]
    m4 = mask[None, :, None, None]
    m1 = mask
    enc_state = enc_mod.EncoderState(
        k_cache=jnp.where(m5, 0, enc_state.k_cache),
        v_cache=jnp.where(m5, 0, enc_state.v_cache),
        k_scale=jnp.where(m4, 1.0, enc_state.k_scale),
        v_scale=jnp.where(m4, 1.0, enc_state.v_scale),
        conv_cache=jnp.where(m4, 0, enc_state.conv_cache),
        valid_len=jnp.where(m1, 0, enc_state.valid_len),
        phase=jnp.where(m1, 0, enc_state.phase),
    )
    dec_state = dec_mod.DecoderState(
        h=jnp.where(mask[:, None, None], 0, dec_state.h),
        c=jnp.where(mask[:, None, None], 0, dec_state.c),
        prev_token=jnp.where(m1, blank_token, dec_state.prev_token),
    )
    return enc_state, dec_state


@functools.partial(jax.jit, donate_argnums=(0,))
def _reset_decoder_slots(dec_state, mask, blank_token):
    """Fresh prediction-network state for masked slots in one device call.

    Utterance endpointing resets ONLY the decoder (LSTM h/c + prev_token):
    the encoder's K/V and conv caches keep rolling, so acoustic context
    carries across the utterance boundary while the language-ish prediction
    network starts clean — the standard RNN-T endpoint semantics (the
    reference has no endpointer; its decoder state lives for the whole
    stream, src/nemo-ggml.h:358-398)."""
    return dec_mod.DecoderState(
        h=jnp.where(mask[:, None, None], 0, dec_state.h),
        c=jnp.where(mask[:, None, None], 0, dec_state.c),
        prev_token=jnp.where(mask, blank_token, dec_state.prev_token),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _reset_beam_slots(beam_state, mask, blank_token):
    """Reset every masked slot's beam to the fresh-stream state (hypothesis
    0 live at score 0, the rest empty) in one device call. Works on both
    RNN-T BeamState and TDT TdtBeamState (the extra t/sym carries reset to
    0 like any other per-slot field)."""
    import dataclasses

    from ..models.beam import NEG_INF

    K = beam_state.scores.shape[1]
    fresh_scores = jnp.full((K,), NEG_INF, jnp.float32).at[0].set(0.0)
    m2 = mask[:, None]
    fields = dict(
        h=jnp.where(mask[:, None, None, None], 0, beam_state.h),
        c=jnp.where(mask[:, None, None, None], 0, beam_state.c),
        prev_token=jnp.where(m2, blank_token, beam_state.prev_token),
        scores=jnp.where(m2, fresh_scores[None], beam_state.scores),
        lm_h=(None if beam_state.lm_h is None else
              jnp.where(mask[:, None, None, None], 0, beam_state.lm_h)),
        lm_c=(None if beam_state.lm_c is None else
              jnp.where(mask[:, None, None, None], 0, beam_state.lm_c)),
        tokens=jnp.where(mask[:, None, None], blank_token,
                         beam_state.tokens),
        lengths=jnp.where(m2, 0, beam_state.lengths))
    if hasattr(beam_state, "t"):                  # TdtBeamState extras
        fields["t"] = jnp.where(m2, 0, beam_state.t)
        fields["sym"] = jnp.where(m2, 0, beam_state.sym)
    return dataclasses.replace(beam_state, **fields)


class _PcmBuffer:
    """Per-slot raw-PCM FIFO (device-DSP mode): O(1) appends, compacted
    only when a full DSP quantum is consumed."""

    __slots__ = ("parts", "count")

    def __init__(self):
        self.parts: list[np.ndarray] = []
        self.count = 0

    def append(self, pcm: np.ndarray) -> None:
        self.parts.append(pcm)
        self.count += pcm.shape[0]

    def take(self, k: int) -> np.ndarray:
        if len(self.parts) > 1:
            self.parts = [np.concatenate(self.parts)]
        buf = self.parts[0] if self.parts else np.zeros(0, np.int16)
        out, self.parts = buf[:k], [buf[k:]]
        self.count -= k
        return out


def _device_dsp_front(cc: CacheConfig, pcfg, pcm_i16, front_res, front_last,
                      mel_buf, window, filterbank, dsp_mask, fresh_mask):
    """Shared front half of the fused ragged device-DSP tick:
    scale/pre-emph/frame/rFFT/mel for every DSP-advancing slot and the
    two-offset masked mel-buffer insert. Frozen slots' DSP state and mel
    buffer pass through unchanged. Returns (front_res, front_last,
    mel_buf)."""
    from ..frontend.device_frontend import FrontendState, mel_frontend_step

    chunk = cc.chunk_mel_frames
    dtype = mel_buf.dtype

    state = FrontendState(last_sample=front_last, residue=front_res)
    mel, new_state = mel_frontend_step(pcm_i16, state, window, filterbank,
                                       pcfg)
    front_res = jnp.where(dsp_mask[:, None], new_state.residue, front_res)
    front_last = jnp.where(dsp_mask, new_state.last_sample, front_last)

    mel = mel.astype(dtype)
    fresh_off = cc.pre_encode_cache_size          # 9-frame zero seed
    steady_off = chunk - 1                        # invariant: see _RCAP
    buf_fresh = jax.lax.dynamic_update_slice_in_dim(
        mel_buf, mel[:, 1:], fresh_off, axis=1)
    buf_steady = jax.lax.dynamic_update_slice_in_dim(
        mel_buf, mel, steady_off, axis=1)
    m3 = (dsp_mask & fresh_mask)[:, None, None]
    s3 = (dsp_mask & ~fresh_mask)[:, None, None]
    mel_buf = jnp.where(m3, buf_fresh, jnp.where(s3, buf_steady, mel_buf))
    return front_res, front_last, mel_buf


def _mel_buf_shift(cc: CacheConfig, mel_buf, consume_mask):
    S, _, M = mel_buf.shape
    shifted = jnp.concatenate(
        [mel_buf[:, cc.shift_mel_frames:],
         jnp.zeros((S, cc.shift_mel_frames, M), mel_buf.dtype)], axis=1)
    return jnp.where(consume_mask[:, None, None], shifted, mel_buf)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 16),
                   donate_argnums=(5, 6, 7, 8, 9))
def _device_dsp_tick(params, cfg: ModelConfig, cc: CacheConfig, pcfg,
                     pcm_i16, front_res, front_last, mel_buf, enc_state,
                     dec_state, pos_heads, window, filterbank,
                     dsp_mask, fresh_mask, consume_mask,
                     confidence: bool = False):
    """One fused ragged tick with ON-DEVICE DSP (the ServingEngine analogue
    of the lockstep fused tick): scale/pre-emph/frame/rFFT/mel for every
    DSP-advancing slot, two-offset mel-buffer insert, then ONE masked
    encoder+decode chunk step for the consuming slots.

    Per-slot raggedness is carried by three masks with STATIC program
    shape: `dsp_mask` (slot consumes one PCM quantum), `fresh_mask` (first
    quantum after admission: residue is zero-padded to the steady length,
    producing one leading artifact frame that is dropped by writing
    frames[1:] at the fresh offset -- see ServingEngine._RCAP math), and
    `consume_mask` (slot has a full chunk buffered after the insert).
    Frozen slots' DSP state, mel buffer, caches and decoder state all pass
    through unchanged."""
    front_res, front_last, mel_buf = _device_dsp_front(
        cc, pcfg, pcm_i16, front_res, front_last, mel_buf, window,
        filterbank, dsp_mask, fresh_mask)
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_buf[:, :cc.chunk_mel_frames], enc_state,
        pos_heads, step_mask=consume_mask)
    confs = None
    if confidence:
        tokens, dec_state, confs = dec_mod.greedy_decode(
            params, cfg, enc_out, dec_state, step_mask=consume_mask,
            with_confidence=True)
    else:
        tokens, dec_state = dec_mod.greedy_decode(params, cfg, enc_out,
                                                  dec_state,
                                                  step_mask=consume_mask)
    mel_buf = _mel_buf_shift(cc, mel_buf, consume_mask)
    return tokens, confs, front_res, front_last, mel_buf, enc_state, dec_state


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 14, 15),
                   donate_argnums=(5, 6, 7, 8, 9))
def _device_dsp_tick_beam(params, cfg: ModelConfig, cc: CacheConfig, pcfg,
                          pcm_i16, front_res, front_last, mel_buf,
                          enc_state, beam_state, pos_heads, window,
                          filterbank, masks, beam_size: int,
                          expansions: int, lm=None, lm_weight=0.3,
                          lm_bonus=0.0):
    """_device_dsp_tick with the on-device batched BEAM search as the
    decode back half: frozen slots keep their entire beam untouched
    (beam_decode's enc_lengths mechanism with a 0 frame limit). `masks` is
    the (dsp, fresh, consume) triple."""
    from ..models import beam as beam_mod

    dsp_mask, fresh_mask, consume_mask = masks
    front_res, front_last, mel_buf = _device_dsp_front(
        cc, pcfg, pcm_i16, front_res, front_last, mel_buf, window,
        filterbank, dsp_mask, fresh_mask)
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_buf[:, :cc.chunk_mel_frames], enc_state,
        pos_heads, step_mask=consume_mask)
    t_lim = jnp.where(consume_mask, enc_out.shape[1], 0).astype(jnp.int32)
    beam_state = beam_mod.beam_decode(params, cfg, enc_out, beam_state,
                                      beam_size, expansions,
                                      enc_lengths=t_lim, lm=lm,
                                      lm_weight=lm_weight,
                                      lm_bonus=lm_bonus)
    mel_buf = _mel_buf_shift(cc, mel_buf, consume_mask)
    return front_res, front_last, mel_buf, enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(1, 2),
                   static_argnames=("with_confidence",),
                   donate_argnums=(4, 5, 8))
def _chunk_step_masked_tdt_jit(params, cfg: ModelConfig, cc: CacheConfig,
                               mel_chunk, enc_state, dec_state, pos_heads,
                               step_mask, skip, with_confidence=False):
    """Masked fused tick for TDT checkpoints: frozen slots keep caches,
    decoder state AND their cross-chunk duration-jump carry (`skip`).
    with_confidence additionally returns per-emission token-head
    log-posteriors [S, T, MAX] (confs slot in the return tuple is None
    otherwise, keeping the default program unchanged)."""
    from ..models.tdt import tdt_greedy_decode

    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_chunk, enc_state, pos_heads,
        step_mask=step_mask)
    confs = None
    if with_confidence:
        tokens, confs, dec_state, skip = tdt_greedy_decode(
            params, cfg, enc_out, dec_state, skip_in=skip,
            step_mask=step_mask, with_confidence=True)
    else:
        tokens, dec_state, skip = tdt_greedy_decode(
            params, cfg, enc_out, dec_state, skip_in=skip,
            step_mask=step_mask)
    return tokens, confs, enc_state, dec_state, skip


@functools.partial(jax.jit, static_argnums=(1, 2, 8, 10, 11),
                   donate_argnums=(4, 5))
def _chunk_step_masked_tdt_beam(params, cfg: ModelConfig, cc: CacheConfig,
                                mel_chunk, enc_state, beam_state, pos_heads,
                                step_mask, beam_size: int,
                                lm=None, lm_weight=0.3, lm_bonus=0.0):
    """Masked fused tick with the duration-aware TDT beam search
    (models/tdt.py tdt_beam_decode): frozen slots keep caches and their
    entire beam, incl. per-hypothesis time-pointer carries."""
    from ..models.tdt import tdt_beam_decode

    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_chunk, enc_state, pos_heads,
        step_mask=step_mask)
    beam_state = tdt_beam_decode(params, cfg, enc_out, beam_state,
                                 beam_size, step_mask=step_mask, lm=lm,
                                 lm_weight=lm_weight, lm_bonus=lm_bonus)
    return enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(1, 2),
                   static_argnames=("with_confidence",),
                   donate_argnums=(4,))
def _chunk_step_masked_ctc_jit(params, cfg: ModelConfig, cc: CacheConfig,
                               mel_chunk, enc_state, pos_heads, step_mask,
                               with_confidence=False):
    """Masked fused tick decoding with the hybrid checkpoint's auxiliary
    CTC head: per-frame argmax ids [S, valid_out]; the host collapses only
    the advancing slots (frozen slots' rows are ignored). with_confidence
    additionally returns the argmax's log-posterior per frame (else the
    logp slot is None)."""
    from ..models import ctc as ctc_mod

    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_chunk, enc_state, pos_heads,
        step_mask=step_mask)
    if with_confidence:
        ids, logp = ctc_mod.frame_log_posteriors(params, enc_out)
        return ids, logp, enc_state
    ids = jnp.argmax(ctc_mod.ctc_logits(params, enc_out),
                     axis=-1).astype(jnp.int32)
    return ids, None, enc_state


@functools.partial(jax.jit, static_argnums=(1, 2, 3),
                   static_argnames=("with_confidence",),
                   donate_argnums=(5, 6, 7, 8, 9, 16))
def _device_dsp_tick_tdt(params, cfg: ModelConfig, cc: CacheConfig, pcfg,
                         pcm_i16, front_res, front_last, mel_buf, enc_state,
                         dec_state, pos_heads, window, filterbank,
                         dsp_mask, fresh_mask, consume_mask, skip,
                         with_confidence=False):
    """_device_dsp_tick with the TDT duration-aware walk as the decode back
    half (skip = cross-chunk jump carry, frozen slots pass theirs through).
    with_confidence adds per-emission log-posteriors (confs None
    otherwise)."""
    from ..models.tdt import tdt_greedy_decode

    front_res, front_last, mel_buf = _device_dsp_front(
        cc, pcfg, pcm_i16, front_res, front_last, mel_buf, window,
        filterbank, dsp_mask, fresh_mask)
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_buf[:, :cc.chunk_mel_frames], enc_state,
        pos_heads, step_mask=consume_mask)
    confs = None
    if with_confidence:
        tokens, confs, dec_state, skip = tdt_greedy_decode(
            params, cfg, enc_out, dec_state, skip_in=skip,
            step_mask=consume_mask, with_confidence=True)
    else:
        tokens, dec_state, skip = tdt_greedy_decode(
            params, cfg, enc_out, dec_state, skip_in=skip,
            step_mask=consume_mask)
    mel_buf = _mel_buf_shift(cc, mel_buf, consume_mask)
    return (tokens, confs, front_res, front_last, mel_buf, enc_state,
            dec_state, skip)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 14, 16, 17),
                   donate_argnums=(5, 6, 7, 8))
def _device_dsp_tick_tdt_beam(params, cfg: ModelConfig, cc: CacheConfig,
                              pcfg, pcm_i16, front_res, front_last, mel_buf,
                              enc_state, beam_state, pos_heads, window,
                              filterbank, masks, beam_size: int,
                              lm=None, lm_weight=0.3, lm_bonus=0.0):
    """_device_dsp_tick with the duration-aware TDT beam search as the
    decode back half; frozen slots keep their entire beam (incl.
    per-hypothesis time-pointer carries). `masks` is the (dsp, fresh,
    consume) triple."""
    from ..models.tdt import tdt_beam_decode

    dsp_mask, fresh_mask, consume_mask = masks
    front_res, front_last, mel_buf = _device_dsp_front(
        cc, pcfg, pcm_i16, front_res, front_last, mel_buf, window,
        filterbank, dsp_mask, fresh_mask)
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_buf[:, :cc.chunk_mel_frames], enc_state,
        pos_heads, step_mask=consume_mask)
    beam_state = tdt_beam_decode(params, cfg, enc_out, beam_state,
                                 beam_size, step_mask=consume_mask, lm=lm,
                                 lm_weight=lm_weight, lm_bonus=lm_bonus)
    mel_buf = _mel_buf_shift(cc, mel_buf, consume_mask)
    return front_res, front_last, mel_buf, enc_state, beam_state


@functools.partial(jax.jit, static_argnums=(1, 2, 3),
                   static_argnames=("with_confidence",),
                   donate_argnums=(5, 6, 7, 8))
def _device_dsp_tick_ctc(params, cfg: ModelConfig, cc: CacheConfig, pcfg,
                         pcm_i16, front_res, front_last, mel_buf, enc_state,
                         pos_heads, window, filterbank,
                         dsp_mask, fresh_mask, consume_mask,
                         with_confidence=False):
    """_device_dsp_tick with the auxiliary CTC head as the decode back half
    (stateless over frames; the collapse carry lives on the host).
    with_confidence adds the per-frame argmax log-posterior (else None)."""
    from ..models import ctc as ctc_mod

    front_res, front_last, mel_buf = _device_dsp_front(
        cc, pcfg, pcm_i16, front_res, front_last, mel_buf, window,
        filterbank, dsp_mask, fresh_mask)
    enc_out, enc_state = enc_mod.encode_chunk(
        params, cfg, cc, mel_buf[:, :cc.chunk_mel_frames], enc_state,
        pos_heads, step_mask=consume_mask)
    if with_confidence:
        ids, logp = ctc_mod.frame_log_posteriors(params, enc_out)
    else:
        ids = jnp.argmax(ctc_mod.ctc_logits(params, enc_out),
                         axis=-1).astype(jnp.int32)
        logp = None
    mel_buf = _mel_buf_shift(cc, mel_buf, consume_mask)
    return ids, logp, front_res, front_last, mel_buf, enc_state


class ServingEngine:
    def __init__(self, params: ModelParams, cfg: ModelConfig,
                 vocab: list[str] | None = None,
                 cache_config: CacheConfig | None = None,
                 n_slots: int = 64, mesh=None,
                 compute_dtype=jnp.bfloat16, dsp: str = "auto",
                 beam_size: int = 1, beam_expansions: int | None = None,
                 max_beam_tokens: int = 4096,
                 confidence: bool = False,
                 endpoint_silence_s: float | None = None,
                 endpoint_reset: bool = False,
                 ctc: bool = False,
                 lm=None, lm_weight: float = 0.3,
                 lm_bonus: float = 0.0,
                 keep_segment_audio: bool = False,
                 max_segment_s: float = 120.0):
        """beam_size > 1 switches every tick's decode to the fused
        on-device beam search (chunk_step_masked_beam): frozen slots keep
        their entire beam untouched, so raggedness works exactly as in
        greedy mode. Beam transcripts are REVISABLE (the best hypothesis
        may change between ticks): step() returns {} and transcripts are
        fetched lazily via refresh_transcripts() / finalize_stream()."""
        from ..config import MAX_SYMBOLS_PER_STEP

        self.cfg = cfg
        self.cc = cache_config or CacheConfig(n_mels=cfg.n_mels)
        self.vocab = vocab or []
        self.n_slots = n_slots
        self.dtype = compute_dtype
        self.mesh = mesh
        self.beam_size = beam_size
        self.beam_expansions = (beam_expansions
                                if beam_expansions is not None
                                else MAX_SYMBOLS_PER_STEP)
        # per-emission log-posteriors: slot tokens become (id, frame, conf)
        # triples; +[S,valid_out,MAX] f32 per tick of download
        self.confidence = confidence
        if confidence and beam_size > 1:
            raise ValueError("confidence requires greedy decode")
        # LM shallow fusion (models/lm.py): engine parity with
        # StreamSession -- the per-hypothesis LM state lives in the
        # BeamState slab and resets with the slot
        if lm is not None and beam_size <= 1:
            raise ValueError("LM shallow fusion requires beam_size > 1")
        self.lm = (None if lm is None
                   else jax.tree_util.tree_map(jnp.asarray, lm))
        self.lm_weight = float(lm_weight)
        self.lm_bonus = float(lm_bonus)
        # ctc=True: decode every tick with the hybrid checkpoint's
        # auxiliary CTC head (stateless over frames; the per-slot collapse
        # carry lives on the host). TDT checkpoints (cfg.tdt_durations)
        # auto-switch the tick's decode to the duration-aware walk with a
        # per-slot cross-chunk skip carry -- engine parity with
        # StreamSession's decode modes.
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
        # Utterance endpointing (greedy only): a slot that has emitted at
        # least one token and then stays silent for endpoint_silence_s of
        # audio fires an endpoint event (poll_endpoints) and gets a fresh
        # prediction-network state. Silence is measured in encoder output
        # frames (1 frame = subsampling * hop = 80 ms of audio by default,
        # the reference's timed_token unit, src/nemo-ggml.h:343-355).
        self._ep_frames = None
        # endpoint_reset=True additionally gives the fired slot a fresh
        # prediction network. Both settings have MEASURED model-level
        # trade-offs on the tones fixture: with reset, the utterance's
        # last tokens are still inside the encoder's 70-frame window and
        # it was the decoder history suppressing their re-emission -- a
        # mid-silence reset can re-emit them as a phantom utterance;
        # without reset, carried decoder state can miss an utterance's
        # LEADING tokens after silences longer than training exposed
        # (3 s vs the 2 s max long-gap augmentation). Default OFF
        # (precision: never invent tokens); turn on for models whose
        # post-silence recall benefits from a fresh state.
        self._ep_reset = bool(endpoint_reset)
        if endpoint_silence_s is not None:
            if beam_size > 1:
                raise ValueError("endpointing requires greedy decode")
            frame_s = (self.cc.subsampling_factor * self.cc.hop_length
                       / self.cc.sample_rate)
            self._ep_frames = max(1, round(endpoint_silence_s / frame_s))
        # keep_segment_audio=True retains each slot's raw PCM for the
        # CURRENT utterance so endpoint events can carry the segment's
        # audio (poll_endpoints(with_audio=True)) — the input to two-pass
        # refinement (streaming/refine.py): online greedy segments, then
        # each finished utterance is re-decoded offline with beam(+LM).
        self.keep_segment_audio = bool(keep_segment_audio)
        if self.keep_segment_audio:
            if self._ep_frames is None:
                raise ValueError("keep_segment_audio needs endpointing "
                                 "(endpoint_silence_s) to bound segments")
            self._seg_cap = int(max_segment_s * self.cc.sample_rate)
            self.seg_buffers = [_SegmentBuffer(self._seg_cap)
                                for _ in range(n_slots)]
            # samples of one encoder output frame (the endpointer's unit)
            self._seg_spf = (self.cc.subsampling_factor
                             * self.cc.hop_length)

        from ..params import cast_params

        self.params = cast_params(params, compute_dtype)
        self.pos_heads = enc_mod.precompute_pos_heads(
            params, cfg, self.cc, dtype=compute_dtype)
        self.enc_state = enc_mod.init_encoder_state(cfg, self.cc, n_slots,
                                                    compute_dtype)
        self.dec_state = dec_mod.init_decoder_state(cfg, n_slots,
                                                    compute_dtype)
        # TDT cross-chunk duration-jump carry / CTC collapse carry
        self.tdt_skip = (jnp.zeros((n_slots,), jnp.int32)
                         if self.tdt else None)
        self.ctc_prev = np.full(n_slots, -1, np.int64) if ctc else None
        self.beam_state = None
        self._beam_dirty = False
        if beam_size > 1:
            if self.tdt:
                from ..models import tdt as tdt_mod

                self.beam_state = tdt_mod.init_tdt_beam_state(
                    cfg, n_slots, beam_size, max_beam_tokens,
                    compute_dtype, lm=self.lm)
            else:
                from ..models import beam as beam_mod

                self.beam_state = beam_mod.init_beam_state(
                    cfg, n_slots, beam_size, max_beam_tokens, compute_dtype,
                    lm=self.lm)
        if mesh is not None:
            from ..parallel.mesh import (param_shardings, shard_params,
                                         shard_state, shard_stream_major)

            self.params = shard_params(self.params, mesh)
            self.pos_heads = jax.device_put(
                self.pos_heads,
                param_shardings(self.pos_heads, mesh))
            self.enc_state = shard_state(self.enc_state, mesh)
            self.dec_state = shard_state(self.dec_state, mesh)
            if self.beam_state is not None:
                self.beam_state = shard_stream_major(self.beam_state, mesh)

        fb = np.asarray(params.preprocessor.filterbank)
        win = np.asarray(params.preprocessor.window)
        # Host DSP backend for the ragged path (slots at independent rates):
        #   native -- ONE C++ frontend over all slots with a ragged batched
        #             entry point (native/frontend.cpp
        #             nemo_frontend_process_ragged): per-tick framing + FFT +
        #             mel in one call, per-slot residue state in C++;
        #   numpy  -- per-slot framing, FFT/mel FLOPs batched across fed
        #             slots into one scipy/BLAS spectral call per tick.
        # auto = 'device' on an accelerator backend (measured: the ragged
        # tick is real-time at 768 slots with on-device DSP while a host
        # core doing hundreds of FFT streams is the bottleneck --
        # docs/PERFORMANCE.md round-3 engine table), else 'native' when the
        # shared library builds/loads (falling back to numpy).
        self.native_fe = None
        self.preprocs: list[StreamingPreprocessor] = []
        self.dsp_mode = None
        pcfg = PreprocessorConfig(n_mels=cfg.n_mels)
        self._pcfg = pcfg
        if dsp == "auto" and jax.default_backend() != "cpu":
            dsp = "device"
        if dsp == "device":
            # ON-DEVICE DSP (the lockstep fused tick, masked for ragged
            # rates): host stages raw i16 PCM per slot and the whole
            # scale/pre-emph/frame/rFFT/mel chain runs inside the same
            # program as the encoder+decode step. Per-slot advance is
            # quantized to one chunk shift of samples; the residue length
            # is then a CONSTANT (_RCAP) for every slot after its first
            # quantum, which is what makes the ragged DSP batchable with
            # static shapes. A fresh slot starts with _RCAP zeros instead
            # of the n_fft/2 center-pad; its first quantum then yields one
            # extra leading artifact frame, dropped in _device_dsp_tick --
            # after that drop, frames and residue are sample-exact with a
            # solo stream (see test_serving_device_dsp).
            from ..frontend.device_frontend import (frames_after,
                                                    residue_after)
            from ..frontend.preprocessor import pad_window

            self.dsp_mode = "device"
            self._quantum = self.cc.shift_samples
            r1 = residue_after(pcfg.initial_pad, self._quantum, pcfg)
            self._RCAP = residue_after(r1, self._quantum, pcfg)
            assert residue_after(self._RCAP, self._quantum, pcfg) \
                == self._RCAP, "quantum has no steady-state residue length"
            self._F = frames_after(self._RCAP, self._quantum, pcfg)
            assert self._F == self.cc.shift_mel_frames
            self._drop = self._F - frames_after(pcfg.initial_pad,
                                                self._quantum, pcfg)
            assert self._drop == 1, (
                "fresh-slot artifact-frame count changed; _device_dsp_tick "
                "writes mel[:, 1:] at the fresh offset")
            self._window = jnp.asarray(
                pad_window(win.astype(np.float32), pcfg.n_fft), jnp.float32)
            self._filterbank = jnp.asarray(fb, jnp.float32)
        elif dsp in ("auto", "native"):
            try:
                from ..frontend.native import NativeFrontend
                from ..frontend.preprocessor import pad_window

                self.native_fe = NativeFrontend(
                    fb.astype(np.float32),
                    pad_window(win.astype(np.float32), pcfg.n_fft),
                    n_streams=n_slots, n_fft=pcfg.n_fft,
                    hop=pcfg.n_window_stride, n_mels=cfg.n_mels,
                    preemph=pcfg.preemph,
                    log_zero_guard=pcfg.log_zero_guard)
            except Exception:
                if dsp == "native":
                    raise
        if self.native_fe is None and self.dsp_mode != "device":
            self.preprocs = [
                StreamingPreprocessor(fb, win, n_streams=1, cfg=pcfg,
                                      backend="numpy")
                for _ in range(n_slots)]
        if self.dsp_mode is None:  # resolved host-DSP label (observability)
            self.dsp_mode = "native" if self.native_fe is not None \
                else "numpy"

        if self.dsp_mode == "device":
            cap = self.cc.chunk_mel_frames + self.cc.shift_mel_frames - 1
            self.front_res = jnp.zeros((n_slots, self._RCAP), jnp.float32)
            self.front_last = jnp.zeros((n_slots,), jnp.float32)
            self.mel_buf_dev = jnp.zeros((n_slots, cap, cfg.n_mels),
                                         compute_dtype)
            if mesh is not None:
                for name in ("front_res", "front_last", "mel_buf_dev"):
                    arr = getattr(self, name)
                    setattr(self, name, jax.device_put(
                        arr, jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec(
                                "data", *(None,) * (arr.ndim - 1)))))
            # host-side bookkeeping: per-slot raw-PCM FIFOs, mel fill
            # levels, and the first-quantum (bootstrap) flag
            self.pcm_fifos = [_PcmBuffer() for _ in range(n_slots)]
            self.mel_fill = np.full(n_slots, self.cc.pre_encode_cache_size,
                                    np.int64)
            self.fresh = np.ones(n_slots, bool)

        self.active = np.zeros(n_slots, bool)
        self.mel_buffers = [self._fresh_mel_buffer() for _ in range(n_slots)]
        self.tokens: list[list[tuple[int, int]]] = [[] for _ in range(n_slots)]
        self.transcripts = [""] * n_slots
        self.frame_offsets = np.zeros(n_slots, np.int64)
        self.step_times: list[float] = []
        # endpoint bookkeeping (all host-side; device work is one masked
        # decoder reset per tick that fired any endpoint)
        self.ep_silence = np.zeros(n_slots, np.int64)   # frames since emit
        self.ep_emitted = np.zeros(n_slots, bool)       # tokens this utt?
        self.ep_utt_start = np.zeros(n_slots, np.int64)  # idx into tokens[s]
        # (slot, end_idx) pairs; end_idx = len(tokens[slot]) AT FIRE TIME,
        # so tokens the next utterance emits between the fire and the
        # poll are never attributed to the finished utterance
        self._ep_pending: list[tuple[int, int]] = []
        # lifetime counters: evicted slots' work stays in stats()
        self.frames_retired = 0
        self.tokens_retired = 0
        self.utterances_retired = 0
        # ring lockstep bookkeeping: all advancing slots write at the same
        # global ring phase; a slot that skipped ticks is realigned (ring
        # roll) on resume so its semantics stay exact (encoder.realign_ring)
        self.n_seg = self.cc.kv_len // self.cc.chunk_enc_len
        self.phase_counter = 0
        self.slot_phase = np.zeros(n_slots, np.int64)

    def _fresh_mel_buffer(self) -> _MelBuffer:
        # 9-frame zero-seeded overlap (reference src/nemo-stream.cpp:58-60)
        return _MelBuffer(np.zeros(
            (self.cc.pre_encode_cache_size, self.cfg.n_mels), np.float32))

    # -- host DSP backend dispatch -------------------------------------------

    def _dsp_reset(self, slot: int) -> None:
        if self.dsp_mode == "device":
            self.front_res = self.front_res.at[slot].set(0.0)
            self.front_last = self.front_last.at[slot].set(0.0)
            self.mel_buf_dev = self.mel_buf_dev.at[slot].set(0)
            self.pcm_fifos[slot] = _PcmBuffer()
            self.mel_fill[slot] = self.cc.pre_encode_cache_size
            self.fresh[slot] = True
        elif self.native_fe is not None:
            self.native_fe.reset_fresh(slot)
        else:
            self.preprocs[slot].reset()

    def _dsp_state(self, slot: int) -> dict:
        if self.dsp_mode == "device":
            return {"last_sample": np.asarray(self.front_last[slot])[None],
                    "residue": np.asarray(self.front_res[slot])[None]}
        if self.native_fe is not None:
            return self.native_fe.slot_state_dict(slot)
        return self.preprocs[slot].state_dict()

    def _dsp_load_state(self, slot: int, st: dict) -> None:
        if self.dsp_mode == "device":
            self.front_res = self.front_res.at[slot].set(
                jnp.asarray(np.asarray(st["residue"], np.float32).ravel()))
            self.front_last = self.front_last.at[slot].set(
                float(np.asarray(st["last_sample"]).ravel()[0]))
        elif self.native_fe is not None:
            self.native_fe.load_slot_state_dict(slot, st)
        else:
            self.preprocs[slot].load_state_dict(st)

    # -- admission / eviction -------------------------------------------------

    def add_stream(self) -> int:
        free = np.flatnonzero(~self.active)
        if free.size == 0:
            raise RuntimeError("no free stream slots")
        slot = int(free[0])
        self.active[slot] = True
        self._clear_slot(slot)
        return slot

    def add_streams(self, count: int) -> list[int]:
        """Bulk admission: claim `count` free slots with ONE device reset
        call (per-slot add_stream costs a device dispatch each, which
        dominates startup at hundreds of slots)."""
        free = np.flatnonzero(~self.active)
        if free.size < count:
            raise RuntimeError(
                f"need {count} free slots, have {free.size}")
        slots = free[:count]
        mask = np.zeros(self.n_slots, bool)
        mask[slots] = True
        self.enc_state, self.dec_state = _reset_slots(
            self.enc_state, self.dec_state, jnp.asarray(mask),
            jnp.int32(self.cfg.blank_token))
        if self.beam_state is not None:
            self.beam_state = _reset_beam_slots(
                self.beam_state, jnp.asarray(mask),
                jnp.int32(self.cfg.blank_token))
        if self.tdt_skip is not None:
            self.tdt_skip = jnp.where(jnp.asarray(mask), 0, self.tdt_skip)
        if self.ctc_prev is not None:
            self.ctc_prev[mask] = -1
        for s in slots:
            s = int(s)
            self.active[s] = True
            self._dsp_reset(s)
            self.mel_buffers[s] = self._fresh_mel_buffer()
            self.tokens[s] = []
            self.transcripts[s] = ""
            self.frame_offsets[s] = 0
            self.slot_phase[s] = 0
        return [int(s) for s in slots]

    def remove_stream(self, slot: int, return_tokens: bool = False):
        """Evict the slot and return its transcript. return_tokens=True
        returns (text, tokens) instead -- tokens are (id, frame[, logp])
        tuples, captured before the slot is cleared (the network server
        ships them in its FINAL event)."""
        if self.beam_state is not None:
            self.refresh_transcripts()
        text = self.transcripts[slot]
        toks = list(self.tokens[slot])
        self.active[slot] = False
        self._clear_slot(slot)
        return (text, toks) if return_tokens else text

    def finalize_stream(self, slot: int, return_tokens: bool = False):
        """Flush the slot's pending audio: drain any fully buffered chunks
        first, then zero-pad the trailing partial chunk (the
        session-finalize semantics), then evict and return the final
        transcript."""
        assert self.active[slot], f"slot {slot} inactive"
        if self.dsp_mode == "device":
            # lockstep finalize semantics (silence-PCM pad, not zero-mel):
            # drain whole quanta, then pad the FIFO with enough silence for
            # the tail chunk to complete -- 2 quanta if the slot never got
            # its bootstrap quantum, else 1 (the device path runs one chunk
            # behind real time by construction: the bootstrap quantum is
            # one frame short of a chunk, and that deficit persists).
            self.step()
            fifo = self.pcm_fifos[slot]
            if fifo.count > 0 or not self.fresh[slot]:
                need = ((2 if self.fresh[slot] else 1) * self._quantum
                        - fifo.count)
                if need > 0:
                    fifo.append(np.zeros(need, np.int16))
                self.step()
            return self.remove_stream(slot, return_tokens)
        if self.mel_buffers[slot].count >= self.cc.chunk_mel_frames:
            self.step()  # drain full chunks before padding the tail
        pending = self.mel_buffers[slot].count - self.cc.pre_encode_cache_size
        if pending > 0:
            pad = self.cc.chunk_mel_frames - self.mel_buffers[slot].count
            if pad > 0:
                self.mel_buffers[slot].append(
                    np.zeros((pad, self.cfg.n_mels), np.float32))
            self.step()
        return self.remove_stream(slot, return_tokens)

    def _clear_slot(self, slot: int) -> None:
        self.enc_state, self.dec_state = _reset_slot(
            self.enc_state, self.dec_state, jnp.int32(slot),
            jnp.int32(self.cfg.blank_token))
        if self.beam_state is not None:
            mask = np.zeros(self.n_slots, bool)
            mask[slot] = True
            self.beam_state = _reset_beam_slots(
                self.beam_state, jnp.asarray(mask),
                jnp.int32(self.cfg.blank_token))
        if self.tdt_skip is not None:
            self.tdt_skip = self.tdt_skip.at[slot].set(0)
        if self.ctc_prev is not None:
            self.ctc_prev[slot] = -1
        self._dsp_reset(slot)
        self.mel_buffers[slot] = self._fresh_mel_buffer()
        self.frames_retired += int(self.frame_offsets[slot])
        self.tokens_retired += len(self.tokens[slot])
        self.tokens[slot] = []
        self.transcripts[slot] = ""
        self.frame_offsets[slot] = 0
        self.ep_silence[slot] = 0
        self.ep_emitted[slot] = False
        self.ep_utt_start[slot] = 0
        self._ep_pending = [p for p in self._ep_pending if p[0] != slot]
        if self.keep_segment_audio:
            self.seg_buffers[slot] = _SegmentBuffer(self._seg_cap)
        self.slot_phase[slot] = 0  # device phase reset to 0; realigned on
        # the slot's first step to the engine's global phase

    # -- the engine tick -------------------------------------------------------

    def feed_audio(self, audio_by_slot: dict[int, np.ndarray]) -> None:
        """Stage PCM per slot; slots advance at independent rates (true
        continuous batching -- a slot that falls behind simply skips engine
        ticks, its device state frozen via the step mask)."""
        for slot in audio_by_slot:
            assert self.active[slot], f"slot {slot} inactive"
        if self.keep_segment_audio:
            for slot, audio in audio_by_slot.items():
                self.seg_buffers[slot].append(
                    np.asarray(audio, np.int16).ravel())
        if self.dsp_mode == "device":
            # stage raw PCM only; all DSP happens inside the fused step
            for slot, audio in audio_by_slot.items():
                self.pcm_fifos[slot].append(
                    np.asarray(audio, np.int16).ravel())
            return
        if self.native_fe is not None:
            # ONE ragged C++ call: per-slot framing + FFT + mel for every
            # fed slot (native/frontend.cpp nemo_frontend_process_ragged)
            mels = self.native_fe.process_ragged(audio_by_slot)
            for slot, mel in mels.items():
                if mel.shape[0]:
                    self.mel_buffers[slot].append(mel)
            return
        slots, frames_list = [], []
        for slot, audio in audio_by_slot.items():
            frames = self.preprocs[slot].frame_only(
                np.asarray(audio, np.int16)[None])[0]
            if frames.shape[0]:
                slots.append(slot)
                frames_list.append(frames)
        if not slots:
            return
        # ONE spectral pass (vectorized rFFT + BLAS mel matmul) over every
        # fed slot's frames (ragged-safe: concatenated on the frame axis),
        # then split back per slot
        mel_all = self.preprocs[0].spectral(np.concatenate(frames_list))
        ofs = 0
        for slot, frames in zip(slots, frames_list):
            c = frames.shape[0]
            self.mel_buffers[slot].append(mel_all[ofs:ofs + c])
            ofs += c

    def _ready(self) -> np.ndarray:
        need = self.cc.chunk_mel_frames
        return np.array(
            [self.active[s] and self.mel_buffers[s].count >= need
             for s in range(self.n_slots)], bool)

    def _ctc_extract(self, ids: np.ndarray, ready_slots: np.ndarray,
                     frame_lp: np.ndarray | None = None) -> dict[int, list]:
        """CTC greedy collapse for the advancing slots: collapse repeats
        (including across the chunk boundary via the per-slot carry), drop
        blanks. Returns {slot: [(id, abs_frame), ...]} -- or, with
        frame_lp (confidence mode), (id, abs_frame, logp) triples carrying
        the argmax log-posterior at each emitting frame."""
        blank = self.cfg.blank_token
        emitted: dict[int, list] = {}
        for s in ready_slots:
            s = int(s)
            prev, toks = int(self.ctc_prev[s]), []
            base = int(self.frame_offsets[s])
            for t in range(ids.shape[1]):
                i = int(ids[s, t])
                if i != prev and i != blank:
                    if frame_lp is None:
                        toks.append((i, base + t))
                    else:
                        toks.append((i, base + t, float(frame_lp[s, t])))
                prev = i
            self.ctc_prev[s] = prev
            if toks:
                emitted[s] = toks
        return emitted

    # -- utterance endpointing --------------------------------------------------

    def _ep_update(self, emitted: dict, advanced: np.ndarray,
                   frames_advanced: int) -> None:
        """Called once per sub-step AFTER frame_offsets advanced: track
        per-slot silence (encoder frames since the last emitted token),
        queue endpoint events, and batch-reset fired slots' decoder state."""
        if self._ep_frames is None or advanced.size == 0:
            return
        self.ep_silence[advanced] += frames_advanced
        for slot, toks in emitted.items():
            # silence restarts after the LAST token's frame, which can sit
            # mid-chunk: offsets are post-advance, frames are absolute
            last_frame = toks[-1][1]
            self.ep_silence[slot] = max(
                0, int(self.frame_offsets[slot]) - (last_frame + 1))
            self.ep_emitted[slot] = True
        fired = [int(s) for s in advanced
                 if self.ep_emitted[s]
                 and self.ep_silence[s] >= self._ep_frames]
        if not fired:
            return
        for s in fired:
            seg = None
            if self.keep_segment_audio:
                if self.seg_buffers[s].truncated:
                    import sys

                    print(f"warning: slot {s} utterance exceeded the "
                          f"{self._seg_cap / self.cc.sample_rate:.0f} s "
                          "retention cap; its refinement segment is "
                          "missing its oldest audio", file=sys.stderr)
                # cut at the PROCESSED-frame boundary: buffered audio past
                # it (possibly the next utterance's onset) stays put
                seg = self.seg_buffers[s].cut(
                    int(self.frame_offsets[s]) * self._seg_spf)
            self._ep_pending.append((s, len(self.tokens[s]), seg))
            self.ep_emitted[s] = False
            self.ep_silence[s] = 0
        if self._ep_reset:
            mask = np.zeros(self.n_slots, bool)
            mask[fired] = True
            self.dec_state = _reset_decoder_slots(
                self.dec_state, jnp.asarray(mask),
                jnp.int32(self.cfg.blank_token))

    def poll_endpoints(self, with_audio: bool = False):
        """Drain utterance-endpoint events (greedy engines constructed with
        endpoint_silence_s): one (slot, text, tokens) per utterance that
        ended since the last poll — the slot emitted tokens, then stayed
        silent for the configured span (with endpoint_reset=True its
        prediction network was also restarted at the fire). The utterance
        boundary was snapshotted AT FIRE TIME, and the slot's cumulative
        transcript is untouched (segmentation is layered on top of it).

        with_audio=True (engines built with keep_segment_audio) appends
        the segment's raw PCM as a 4th element (slot, text, tokens, pcm)
        — the two-pass refinement input (streaming/refine.py)."""
        if with_audio and not self.keep_segment_audio:
            raise ValueError("with_audio needs keep_segment_audio=True")
        out = []
        for s, end, seg in self._ep_pending:
            start = int(self.ep_utt_start[s])
            toks = self.tokens[s][start:end]
            text = tokens_to_text(toks, self.vocab)
            out.append((s, text, toks, seg) if with_audio
                       else (s, text, toks))
            self.ep_utt_start[s] = end
            self.utterances_retired += 1
        self._ep_pending = []
        return out

    def step(self) -> dict[int, str]:
        """Run fused chunk steps while any slot has a full chunk buffered;
        returns new text per slot. Slots without enough mel are masked out
        of the step (state frozen), not fed padding."""
        if self.dsp_mode == "device":
            return self._step_device()
        cc = self.cc
        out: dict[int, str] = {}
        ready = self._ready()
        while ready.any():
            chunk_np = np.zeros(
                (self.n_slots, cc.chunk_mel_frames, self.cfg.n_mels),
                np.float32)
            for s in np.flatnonzero(ready):
                chunk_np[s] = self.mel_buffers[s].compact()[
                    : cc.chunk_mel_frames]
                if self.slot_phase[s] != self.phase_counter:
                    delta = int((self.phase_counter - self.slot_phase[s])
                                % self.n_seg)
                    self.enc_state = enc_mod.realign_ring(
                        self.enc_state, jnp.int32(s), jnp.int32(delta),
                        cc.chunk_enc_len)
                    self.slot_phase[s] = self.phase_counter
            # convert to the compute dtype on the HOST so the upload ships
            # 2 bytes/element for bf16 (mel upload is the step's dominant
            # host->device transfer at serving batch sizes)
            chunk = jnp.asarray(chunk_np.astype(np.dtype(self.dtype)))
            mask = jnp.asarray(ready)
            t0 = time.perf_counter()
            if self.beam_state is not None:
                if self.tdt:
                    self.enc_state, self.beam_state = (
                        _chunk_step_masked_tdt_beam(
                            self.params, self.cfg, cc, chunk,
                            self.enc_state, self.beam_state,
                            self.pos_heads, mask, self.beam_size, self.lm,
                            self.lm_weight, self.lm_bonus))
                else:
                    self.enc_state, self.beam_state = chunk_step_masked_beam(
                        self.params, self.cfg, cc, chunk, self.enc_state,
                        self.beam_state, self.pos_heads, mask,
                        self.beam_size, self.beam_expansions, self.lm,
                        self.lm_weight, self.lm_bonus)
                self._beam_dirty = True
                tokens = confs = ctc_ids = None
            elif self.ctc:
                ids, frame_lp, self.enc_state = _chunk_step_masked_ctc_jit(
                    self.params, self.cfg, cc, chunk, self.enc_state,
                    self.pos_heads, mask,
                    with_confidence=self.confidence)
                ctc_ids = np.asarray(ids, np.int64)
                ctc_lp = (np.asarray(frame_lp) if frame_lp is not None
                          else None)
                tokens = confs = None
            elif self.tdt:
                (tokens, confs, self.enc_state, self.dec_state,
                 self.tdt_skip) = _chunk_step_masked_tdt_jit(
                    self.params, self.cfg, cc, chunk, self.enc_state,
                    self.dec_state, self.pos_heads, mask, self.tdt_skip,
                    with_confidence=self.confidence)
                tokens = np.asarray(tokens)
                confs = np.asarray(confs) if confs is not None else None
                ctc_ids = None
            elif self.confidence:
                tokens, confs, self.enc_state, self.dec_state = (
                    _chunk_step_masked_conf_jit(
                        self.params, self.cfg, cc, chunk, self.enc_state,
                        self.dec_state, self.pos_heads, mask))
                tokens, confs = np.asarray(tokens), np.asarray(confs)
                ctc_ids = None
            else:
                confs = ctc_ids = None
                tokens, self.enc_state, self.dec_state = chunk_step_masked(
                    self.params, self.cfg, cc, chunk, self.enc_state,
                    self.dec_state, self.pos_heads, mask)
                tokens = np.asarray(tokens)
            self.step_times.append(time.perf_counter() - t0)

            ready_slots = np.flatnonzero(ready)
            for slot in ready_slots:
                self.mel_buffers[slot].drop(cc.shift_mel_frames)
            if tokens is None and ctc_ids is None:
                # beam mode: transcripts fetched lazily
                # (refresh_transcripts); frame_offsets advance for stats
                self.frame_offsets[ready_slots] += cc.valid_out_len
            else:
                if ctc_ids is not None:
                    emitted = self._ctc_extract(ctc_ids, ready_slots,
                                                frame_lp=ctc_lp)
                    frames_adv = ctc_ids.shape[1]
                else:
                    # masked slots emit only blanks, so extracting over the
                    # whole [S, T, MAX] array is safe (and one vectorized
                    # pass instead of an S*T*MAX Python loop)
                    emitted = dec_mod.extract_emitted(
                        tokens, self.cfg.blank_token, self.frame_offsets,
                        confs=confs)
                    frames_adv = tokens.shape[1]
                for slot, toks in emitted.items():
                    self.tokens[slot].extend(toks)
                    text = tokens_to_text(toks, self.vocab)
                    self.transcripts[slot] += text
                    out[slot] = out.get(slot, "") + text
                self.frame_offsets[ready_slots] += frames_adv
                self._ep_update(emitted, ready_slots, int(frames_adv))
            self.phase_counter = (self.phase_counter + 1) % self.n_seg
            self.slot_phase[ready] = self.phase_counter
            ready = self._ready()
        return out

    def refresh_transcripts(self) -> list[str]:
        """Beam mode: rewrite every ACTIVE slot's transcript/tokens from
        the CURRENT best hypothesis (length-normalized selection,
        models/beam.py best_hypothesis); ONE device call + one [S, U]
        download, only when a beam advanced since the last refresh.
        Greedy mode: transcripts are already incremental; no-op."""
        if self.beam_state is not None and self._beam_dirty:
            from ..models import beam as beam_mod

            btok, blen, _ = beam_mod.best_hypothesis(self.beam_state,
                                                     length_norm=True)
            btok, blen = np.asarray(btok), np.asarray(blen)
            for s in np.flatnonzero(self.active):
                toks = [(int(t), 0) for t in btok[s, : blen[s]]]
                self.tokens[s] = toks
                self.transcripts[s] = tokens_to_text(toks, self.vocab)
            self._beam_dirty = False
        return list(self.transcripts)

    def _step_device(self) -> dict[int, str]:
        """Device-DSP engine tick(s): each call of the fused program gives
        every eligible slot ONE PCM quantum (= cc.shift_samples) of DSP and
        runs ONE masked chunk step for slots whose buffer then holds a full
        chunk; loops until no slot has a full quantum staged. Host work is
        FIFO bookkeeping and one [S, quantum] int16 stack -- the DSP FLOPs
        all run on device inside the same program as the encoder."""
        cc = self.cc
        S = self.n_slots
        out: dict[int, str] = {}
        while True:
            dsp = np.array([self.active[s]
                            and self.pcm_fifos[s].count >= self._quantum
                            for s in range(S)], bool)
            if not dsp.any():
                break
            fresh = self.fresh & dsp
            gain = np.where(dsp,
                            np.where(fresh, self._F - self._drop, self._F),
                            0)
            post_fill = self.mel_fill + gain
            consume = post_fill >= cc.chunk_mel_frames
            # invariant that pins the program's two static write offsets
            steady_off = cc.chunk_mel_frames - 1
            for s in np.flatnonzero(dsp):
                want = (cc.pre_encode_cache_size if self.fresh[s]
                        else steady_off)
                assert self.mel_fill[s] == want, (
                    f"slot {s} fill {self.mel_fill[s]} != {want}")
            # ring-phase realign for slots resuming after skipped ticks
            # (same semantics as the host-DSP path)
            for s in np.flatnonzero(consume):
                if self.slot_phase[s] != self.phase_counter:
                    delta = int((self.phase_counter - self.slot_phase[s])
                                % self.n_seg)
                    self.enc_state = enc_mod.realign_ring(
                        self.enc_state, jnp.int32(s), jnp.int32(delta),
                        cc.chunk_enc_len)
                    self.slot_phase[s] = self.phase_counter

            pcm = np.zeros((S, self._quantum), np.int16)
            for s in np.flatnonzero(dsp):
                pcm[s] = self.pcm_fifos[s].take(self._quantum)
            t0 = time.perf_counter()
            if self.beam_state is not None:
                masks = (jnp.asarray(dsp), jnp.asarray(fresh),
                         jnp.asarray(consume))
                if self.tdt:
                    (self.front_res, self.front_last, self.mel_buf_dev,
                     self.enc_state,
                     self.beam_state) = _device_dsp_tick_tdt_beam(
                        self.params, self.cfg, cc, self._pcfg,
                        jnp.asarray(pcm), self.front_res, self.front_last,
                        self.mel_buf_dev, self.enc_state, self.beam_state,
                        self.pos_heads, self._window, self._filterbank,
                        masks, self.beam_size, self.lm,
                        self.lm_weight, self.lm_bonus)
                else:
                    (self.front_res, self.front_last, self.mel_buf_dev,
                     self.enc_state,
                     self.beam_state) = _device_dsp_tick_beam(
                        self.params, self.cfg, cc, self._pcfg,
                        jnp.asarray(pcm), self.front_res, self.front_last,
                        self.mel_buf_dev, self.enc_state, self.beam_state,
                        self.pos_heads, self._window, self._filterbank,
                        masks, self.beam_size, self.beam_expansions,
                        self.lm, self.lm_weight, self.lm_bonus)
                self._beam_dirty = True
                tokens = confs = ctc_ids = None
            elif self.ctc:
                (ids, frame_lp, self.front_res, self.front_last,
                 self.mel_buf_dev, self.enc_state) = _device_dsp_tick_ctc(
                    self.params, self.cfg, cc, self._pcfg, jnp.asarray(pcm),
                    self.front_res, self.front_last, self.mel_buf_dev,
                    self.enc_state, self.pos_heads, self._window,
                    self._filterbank, jnp.asarray(dsp), jnp.asarray(fresh),
                    jnp.asarray(consume),
                    with_confidence=self.confidence)
                ctc_ids = np.asarray(ids, np.int64)
                ctc_lp = (np.asarray(frame_lp) if frame_lp is not None
                          else None)
                tokens = confs = None
            elif self.tdt:
                (tokens, confs, self.front_res, self.front_last,
                 self.mel_buf_dev, self.enc_state, self.dec_state,
                 self.tdt_skip) = _device_dsp_tick_tdt(
                    self.params, self.cfg, cc, self._pcfg, jnp.asarray(pcm),
                    self.front_res, self.front_last, self.mel_buf_dev,
                    self.enc_state, self.dec_state, self.pos_heads,
                    self._window, self._filterbank, jnp.asarray(dsp),
                    jnp.asarray(fresh), jnp.asarray(consume), self.tdt_skip,
                    with_confidence=self.confidence)
                tokens = np.asarray(tokens)
                confs = np.asarray(confs) if confs is not None else None
                ctc_ids = None
            else:
                (tokens, confs, self.front_res, self.front_last,
                 self.mel_buf_dev, self.enc_state,
                 self.dec_state) = _device_dsp_tick(
                    self.params, self.cfg, cc, self._pcfg, jnp.asarray(pcm),
                    self.front_res, self.front_last, self.mel_buf_dev,
                    self.enc_state, self.dec_state, self.pos_heads,
                    self._window, self._filterbank, jnp.asarray(dsp),
                    jnp.asarray(fresh), jnp.asarray(consume),
                    self.confidence)
                tokens = np.asarray(tokens)
                ctc_ids = None
                if confs is not None:
                    confs = np.asarray(confs)
            self.step_times.append(time.perf_counter() - t0)

            self.mel_fill = np.where(consume,
                                     post_fill - cc.shift_mel_frames,
                                     post_fill)
            self.fresh = self.fresh & ~dsp
            emitted = None
            if ctc_ids is not None:
                emitted = self._ctc_extract(ctc_ids, np.flatnonzero(consume),
                                            frame_lp=ctc_lp)
            elif tokens is not None:
                emitted = dec_mod.extract_emitted(
                    tokens, self.cfg.blank_token, self.frame_offsets,
                    confs=confs)
            if emitted is not None:
                for slot, toks in emitted.items():
                    self.tokens[slot].extend(toks)
                    text = tokens_to_text(toks, self.vocab)
                    self.transcripts[slot] += text
                    out[slot] = out.get(slot, "") + text
            if consume.any():
                self.frame_offsets[np.flatnonzero(consume)] += \
                    cc.valid_out_len
                if emitted is not None:
                    self._ep_update(emitted, np.flatnonzero(consume),
                                    cc.valid_out_len)
                self.phase_counter = (self.phase_counter + 1) % self.n_seg
                self.slot_phase[consume] = self.phase_counter
        return out

    # -- checkpoint / resume ---------------------------------------------------

    def save(self, path: str) -> None:
        """Snapshot the whole engine: all slots' device state, DSP state,
        admission map, transcripts. Restoring into a fresh engine with the
        same n_slots resumes every active stream exactly."""
        if self.beam_state is not None:
            self.refresh_transcripts()
        flat = {
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
            "active": self.active,
            "frame_offsets": self.frame_offsets,
            "transcripts": np.asarray(self.transcripts, dtype=object),
            "phase_counter": np.int64(self.phase_counter),
            "slot_phase": self.slot_phase,
        }
        if self._ep_frames is not None:
            flat["ep/silence"] = self.ep_silence
            flat["ep/emitted"] = self.ep_emitted
            flat["ep/utt_start"] = self.ep_utt_start
            flat["ep/pending"] = np.asarray(
                [(s, e) for s, e, _seg in self._ep_pending],
                np.int64).reshape(-1, 2)
            for i, (_s, _e, seg) in enumerate(self._ep_pending):
                if seg is not None:
                    flat[f"ep/pending_seg/{i}"] = seg
        if self.keep_segment_audio:
            for s in range(self.n_slots):
                sb = self.seg_buffers[s]
                flat[f"seg/pcm/{s}"] = sb.compact()
                flat[f"seg/meta/{s}"] = np.asarray(
                    [sb.abs0, int(sb.truncated)], np.int64)
        if self.beam_state is not None:
            keys = ("h", "c", "prev_token", "scores", "tokens", "lengths")
            if hasattr(self.beam_state, "t"):    # TdtBeamState extras
                keys += ("t", "sym")
            if self.beam_state.lm_h is not None:
                keys += ("lm_h", "lm_c")
            for k in keys:
                flat[f"beam/{k}"] = np.asarray(getattr(self.beam_state, k))
        if self.tdt_skip is not None:
            flat["tdt_skip"] = np.asarray(self.tdt_skip)
        if self.ctc_prev is not None:
            flat["ctc_prev"] = self.ctc_prev
        for s in range(self.n_slots):
            pp = self._dsp_state(s)
            flat[f"preproc/last_sample/{s}"] = pp["last_sample"]
            flat[f"preproc/residue/{s}"] = pp["residue"]
            flat[f"mel_buffer/{s}"] = self.mel_buffers[s].compact()
            if self.confidence:   # (id, frame, log-posterior) triples
                flat[f"tokens/{s}"] = np.asarray(
                    self.tokens[s], np.float64).reshape(-1, 3)
            else:
                flat[f"tokens/{s}"] = np.asarray(
                    self.tokens[s], np.int64).reshape(-1, 2)
        if self.dsp_mode == "device":
            flat["devdsp/mel_buf"] = np.asarray(self.mel_buf_dev, np.float32)
            flat["devdsp/mel_fill"] = self.mel_fill
            flat["devdsp/fresh"] = self.fresh
            for s in range(self.n_slots):
                fifo = self.pcm_fifos[s]
                flat[f"devdsp/fifo/{s}"] = (
                    np.concatenate(fifo.parts) if fifo.parts
                    else np.zeros(0, np.int16))
        from ..utils.npz import savez_bf16_safe

        savez_bf16_safe(path, flat)

    def load(self, path: str) -> None:
        import jax.numpy as jnp

        from ..models.decoder import DecoderState
        from ..models.encoder import EncoderState

        from ..utils.npz import NpzView

        z = NpzView(np.load(path, allow_pickle=True))
        assert z["active"].shape == (self.n_slots,), "n_slots mismatch"
        ring_dtype = (jnp.int8 if self.cc.kv_quant_max is not None
                      else self.dtype)
        self.enc_state = EncoderState(
            k_cache=jnp.asarray(z["enc/k_cache"], ring_dtype),
            v_cache=jnp.asarray(z["enc/v_cache"], ring_dtype),
            k_scale=jnp.asarray(z["enc/k_scale"], jnp.float32),
            v_scale=jnp.asarray(z["enc/v_scale"], jnp.float32),
            conv_cache=jnp.asarray(z["enc/conv_cache"], self.dtype),
            valid_len=jnp.asarray(z["enc/valid_len"], jnp.int32),
            phase=jnp.asarray(z["enc/phase"], jnp.int32))
        self.dec_state = DecoderState(
            h=jnp.asarray(z["dec/h"], self.dtype),
            c=jnp.asarray(z["dec/c"], self.dtype),
            prev_token=jnp.asarray(z["dec/prev_token"], jnp.int32))
        if self.tdt != ("tdt_skip" in z.files):
            raise ValueError("snapshot/engine TDT-mode mismatch")
        if self.tdt:
            self.tdt_skip = jnp.asarray(z["tdt_skip"], jnp.int32)
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
                h=jnp.asarray(z["beam/h"], self.dtype),
                c=jnp.asarray(z["beam/c"], self.dtype),
                prev_token=jnp.asarray(z["beam/prev_token"], jnp.int32),
                scores=jnp.asarray(z["beam/scores"], jnp.float32),
                tokens=jnp.asarray(z["beam/tokens"], jnp.int32),
                lengths=jnp.asarray(z["beam/lengths"], jnp.int32),
                lm_h=(jnp.asarray(z["beam/lm_h"], self.dtype)
                      if has_lm else None),
                lm_c=(jnp.asarray(z["beam/lm_c"], self.dtype)
                      if has_lm else None))
            if self.tdt:
                from ..models import tdt as tdt_mod

                self.beam_state = tdt_mod.TdtBeamState(
                    t=jnp.asarray(z["beam/t"], jnp.int32),
                    sym=jnp.asarray(z["beam/sym"], jnp.int32), **common)
            else:
                from ..models import beam as beam_mod

                self.beam_state = beam_mod.BeamState(**common)
            self._beam_dirty = True
        if self.mesh is not None:
            from ..parallel.mesh import shard_state, shard_stream_major

            self.enc_state = shard_state(self.enc_state, self.mesh)
            self.dec_state = shard_state(self.dec_state, self.mesh)
            if self.beam_state is not None:
                self.beam_state = shard_stream_major(self.beam_state,
                                                     self.mesh)
        self.active = z["active"].astype(bool)
        self.phase_counter = int(z["phase_counter"])
        self.slot_phase = z["slot_phase"].astype(np.int64)
        self.frame_offsets = z["frame_offsets"].astype(np.int64)
        if self._ep_frames is not None and "ep/silence" in z.files:
            self.ep_silence = z["ep/silence"].astype(np.int64)
            self.ep_emitted = z["ep/emitted"].astype(bool)
            self.ep_utt_start = z["ep/utt_start"].astype(np.int64)
            self._ep_pending = [
                (int(s), int(e),
                 z[f"ep/pending_seg/{i}"].astype(np.int16)
                 if f"ep/pending_seg/{i}" in z.files else None)
                for i, (s, e) in enumerate(z["ep/pending"].reshape(-1, 2))]
        if self.keep_segment_audio:
            for s in range(self.n_slots):
                sb = _SegmentBuffer(self._seg_cap)
                if f"seg/pcm/{s}" in z.files:
                    pcm = z[f"seg/pcm/{s}"].astype(np.int16)
                    meta = z[f"seg/meta/{s}"]
                    if pcm.size:
                        sb.parts = [pcm]
                        sb.total = pcm.size
                    sb.abs0 = int(meta[0])
                    sb.truncated = bool(meta[1])
                self.seg_buffers[s] = sb
        self.transcripts = [str(t) for t in z["transcripts"]]
        self.tokens = [
            [(int(row[0]), int(row[1]), float(row[2])) if len(row) == 3
             else (int(row[0]), int(row[1])) for row in z[f"tokens/{s}"]]
            for s in range(self.n_slots)]
        self.mel_buffers = [
            _MelBuffer(np.asarray(z[f"mel_buffer/{s}"], np.float32).copy())
            for s in range(self.n_slots)]
        for s in range(self.n_slots):
            self._dsp_load_state(
                s, {"last_sample": z[f"preproc/last_sample/{s}"],
                    "residue": z[f"preproc/residue/{s}"]})
        if self.dsp_mode == "device":
            assert "devdsp/mel_buf" in z.files, (
                "snapshot was saved by a host-DSP engine; device-DSP "
                "resume needs the device mel buffer/fill state")
            self.mel_buf_dev = jnp.asarray(z["devdsp/mel_buf"], self.dtype)
            self.mel_fill = z["devdsp/mel_fill"].astype(np.int64)
            self.fresh = z["devdsp/fresh"].astype(bool)
            self.pcm_fifos = [_PcmBuffer() for _ in range(self.n_slots)]
            for s in range(self.n_slots):
                blk = z[f"devdsp/fifo/{s}"].astype(np.int16)
                if blk.size:
                    self.pcm_fifos[s].append(blk)
            if self.mesh is not None:
                self.mel_buf_dev = jax.device_put(
                    self.mel_buf_dev, jax.sharding.NamedSharding(
                        self.mesh,
                        jax.sharding.PartitionSpec("data", None, None)))

    # -- stats -----------------------------------------------------------------

    def latency_percentiles(self) -> dict[str, float]:
        if not self.step_times:
            return {}
        t = np.asarray(self.step_times)
        return {"p50": float(np.percentile(t, 50)),
                "p90": float(np.percentile(t, 90)),
                "p99": float(np.percentile(t, 99)),
                "mean": float(t.mean())}

    def stats(self) -> dict:
        """Engine observability snapshot (the reference's stats block,
        src/transcribe_stream.cpp:184-191, generalized to many streams)."""
        # per-encoder-frame audio duration from the configured geometry
        # (subsampling * hop / rate), not hardcoded defaults
        frame_s = (self.cc.subsampling_factor * self.cc.hop_length
                   / self.cc.sample_rate)
        audio_s = (float(self.frame_offsets.sum())
                   + self.frames_retired) * frame_s
        compute_s = float(np.sum(self.step_times))
        return {
            "active_slots": int(self.active.sum()),
            "n_slots": self.n_slots,
            "engine_steps": len(self.step_times),
            "audio_seconds_decoded": audio_s,
            "compute_seconds": compute_s,
            "aggregate_rtf": compute_s / audio_s if audio_s else 0.0,
            "latency": self.latency_percentiles(),
            "tokens_emitted": (int(sum(len(t) for t in self.tokens))
                               + self.tokens_retired),
            "utterances_finalized": self.utterances_retired,
        }
