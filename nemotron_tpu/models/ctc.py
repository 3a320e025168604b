"""CTC decoding for hybrid RNNT-CTC checkpoints (model-family widening).

The reference engine decodes RNN-T only (src/nemo-ggml.cpp:1109-1429), but
NeMo's cache-aware FastConformer checkpoints frequently ship a hybrid
auxiliary CTC head (`ctc_decoder.decoder_layers.0`, a 1x1 conv = Linear
d_model -> vocab incl. blank). CTC decoding is stateless over frames —
no prediction network, no label loop — so it is both a faster offline
decode and a diagnostic second opinion on the encoder.

Greedy CTC: per-frame argmax -> collapse consecutive repeats -> drop
blanks. The collapse runs on host (a trivial O(B*T) pass over an int32
argmax download); the logits/argmax run on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..params import ModelParams


def ctc_logits(params: ModelParams, enc):
    """Encoder output [B, T, D] -> CTC logits [B, T, V] (f32 accumulator,
    like the joint's vocab projection)."""
    if params.ctc is None:
        raise ValueError("model has no CTC head (ctc_decoder.* tensors)")
    w = params.ctc.out_w
    logits = jax.lax.dot_general(
        enc, jnp.asarray(w, enc.dtype),
        dimension_numbers=(((enc.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return logits + jnp.asarray(params.ctc.out_b, jnp.float32)


def frame_log_posteriors(params: ModelParams, enc):
    """Per-frame (argmax ids [B, T] int32, log-posterior of the argmax
    [B, T] f32) -- the device half of confident CTC decoding. The
    log-softmax runs over the full vocab in f32 (one logsumexp per frame,
    negligible next to the encoder)."""
    logits = ctc_logits(params, enc)                       # [B, T, V] f32
    best = jnp.argmax(logits, axis=-1)
    logp = (jnp.take_along_axis(logits, best[..., None], axis=-1)[..., 0]
            - jax.scipy.special.logsumexp(logits, axis=-1))
    return best.astype(jnp.int32), logp


def collapse(frame_ids: np.ndarray, blank: int,
             length: int | None = None) -> list[int]:
    """The CTC greedy rule for ONE stream: collapse consecutive repeats,
    then remove blanks. frame_ids: [T] int per-frame argmax."""
    t_end = frame_ids.shape[0] if length is None else int(length)
    ids = frame_ids[:t_end]
    if ids.size == 0:
        return []
    keep = np.ones(ids.shape, bool)
    keep[1:] = ids[1:] != ids[:-1]          # collapse repeats
    ids = ids[keep]
    return [int(i) for i in ids[ids != blank]]


def collapse_with_confidence(frame_ids: np.ndarray, frame_logp: np.ndarray,
                             blank: int, length: int | None = None,
                             frame_offset: int = 0
                             ) -> list[tuple[int, int, float]]:
    """collapse() additionally reporting emission frames and per-token
    confidence: the argmax log-posterior at the token's EMITTING frame (the
    first frame of its run) -- the same "log softmax at the emission point"
    quantity RNN-T / TDT confidence reports, so thresholds transfer across
    decode modes. Returns [(token_id, frame, logp), ...] triples matching
    the RNN-T confidence token format."""
    t_end = frame_ids.shape[0] if length is None else int(length)
    ids, lps = frame_ids[:t_end], frame_logp[:t_end]
    if ids.size == 0:
        return []
    keep = np.ones(ids.shape, bool)
    keep[1:] = ids[1:] != ids[:-1]
    frames = np.nonzero(keep)[0]
    ids, lps = ids[keep], lps[keep]
    nb = ids != blank
    return [(int(i), frame_offset + int(f), float(lp))
            for i, f, lp in zip(ids[nb], frames[nb], lps[nb])]


def ctc_greedy_decode(params: ModelParams, cfg: ModelConfig, enc,
                      enc_lengths=None) -> list[list[int]]:
    """Greedy CTC over encoder outputs: returns per-stream token lists.

    enc_lengths [B] (optional): frames past a stream's valid length are
    ignored (padded multi-utterance batches)."""
    best = jnp.argmax(ctc_logits(params, enc), axis=-1)
    best = np.asarray(best, np.int64)               # [B, T]
    if enc_lengths is None:
        return [collapse(best[b], cfg.blank_token)
                for b in range(best.shape[0])]
    lens = np.asarray(enc_lengths, np.int64)
    return [collapse(best[b], cfg.blank_token, int(lens[b]))
            for b in range(best.shape[0])]
