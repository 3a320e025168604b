"""RNN-T prediction network + joint + on-device batched greedy decode.

This is the part the TPU rebuild does fundamentally differently from the
reference: the reference runs the label loop on the HOST with 5 device
transfers + 1 graph launch per symbol (reference src/nemo-stream.cpp:813-875,
profiled there as the dominant "transfer_seconds"). Here the whole loop --
embedding gather, 2-layer LSTM, joint, argmax, blank-freeze state update --
runs inside jit as `lax.scan` over frames with an inner `lax.while_loop` over
symbols, batched over all streams at once. Zero host round-trips per chunk.

Semantics preserved exactly (the two behaviors SURVEY calls out as
transcription-breaking):
  - blank emission freezes the LSTM state and prev_token and advances to the
    next frame (reference src/nemo-ggml.cpp:1234-1245);
  - up to MAX_SYMBOLS_PER_STEP=10 non-blank symbols per frame
    (reference src/nemo-ggml.cpp:1134).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import MAX_SYMBOLS_PER_STEP, ModelConfig
from ..params import DecoderParams, JointParams, ModelParams
from ..ops.lstm import lstm_step


def _pytree_dataclass(cls):
    import dataclasses

    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class DecoderState:
    """Serializable per-stream decode state (the reference's
    nemo_decoder_state POD, src/nemo-ggml.h:358-398)."""

    h: Any            # [B, L, H]
    c: Any            # [B, L, H]
    prev_token: Any   # [B] int32


def init_decoder_state(cfg: ModelConfig, batch: int,
                       dtype=jnp.float32) -> DecoderState:
    L, H = cfg.decoder_layers, cfg.decoder_dim
    return DecoderState(
        h=jnp.zeros((batch, L, H), dtype),
        c=jnp.zeros((batch, L, H), dtype),
        prev_token=jnp.full((batch,), cfg.blank_token, jnp.int32),
    )


def joint_project_enc(jp: JointParams, enc):
    """Encoder-side joint projection [.., D] -> [.., joint_dim]. Hoisted out
    of the symbol loop: the reference recomputes it every symbol
    (src/nemo-ggml.cpp:1080-1083)."""
    return enc @ jp.enc_w.astype(enc.dtype) + jp.enc_b.astype(enc.dtype)


def joint_logits(jp: JointParams, enc_proj, dec_out):
    """relu(enc_proj + dec_proj) @ out (reference src/nemo-ggml.cpp:1062-1100).
    Returns f32 logits for a numerically stable argmax."""
    dt = dec_out.dtype
    d = dec_out @ jp.dec_w.astype(dt) + jp.dec_b.astype(dt)
    h = jax.nn.relu(enc_proj + d)
    return (h @ jp.out_w.astype(dt)).astype(jnp.float32) + jp.out_b.astype(
        jnp.float32)


def decode_frame(params: ModelParams, cfg: ModelConfig, state: DecoderState,
                 enc_proj_t):
    """Greedy label loop for ONE encoder frame across all B streams.

    enc_proj_t: [B, joint_dim] (already through the joint enc projection).
    Returns (new state, tokens [MAX_SYMBOLS_PER_STEP, B] int32 blank-padded).

    Uses a while_loop so the whole batch exits as soon as every stream has
    emitted blank (typical: 1-2 iterations, not 10)."""
    dp: DecoderParams = params.decoder
    blank = cfg.blank_token
    B = enc_proj_t.shape[0]

    tokens0 = jnp.full((MAX_SYMBOLS_PER_STEP, B), blank, jnp.int32)
    active0 = jnp.ones((B,), bool)

    def cond(carry):
        sym, _state, active, _tokens = carry
        return jnp.logical_and(sym < MAX_SYMBOLS_PER_STEP, jnp.any(active))

    def body(carry):
        sym, st, active, tokens = carry
        emb = dp.embedding.astype(enc_proj_t.dtype)[st.prev_token]  # [B, H]
        dec_out, h2, c2 = lstm_step(dp, emb, st.h, st.c)
        logits = joint_logits(params.joint, enc_proj_t, dec_out)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)         # [B]
        emit = jnp.logical_and(active, tok != blank)

        h = jnp.where(emit[:, None, None], h2, st.h)
        c = jnp.where(emit[:, None, None], c2, st.c)
        prev = jnp.where(emit, tok, st.prev_token)
        tokens = tokens.at[sym].set(jnp.where(emit, tok, blank))
        return (sym + 1, DecoderState(h, c, prev), emit, tokens)

    _, st, _, tokens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, active0, tokens0))
    return st, tokens


def greedy_decode(params: ModelParams, cfg: ModelConfig, enc,
                  state: DecoderState):
    """Greedy RNN-T over encoder frames, fully on-device.

    enc: [B, T, d_model]. Returns (tokens [B, T, MAX_SYMBOLS_PER_STEP] int32
    blank-padded, new DecoderState). Flatten + filter != blank on the host to
    recover the reference's (token, frame) stream in order."""
    enc_proj = joint_project_enc(params.joint, enc)  # [B, T, J]

    def frame(st, ep_t):
        st, toks = decode_frame(params, cfg, st, ep_t)
        return st, toks

    state, tokens = jax.lax.scan(frame, state, jnp.swapaxes(enc_proj, 0, 1))
    # tokens: [T, MAX, B] -> [B, T, MAX]
    return jnp.transpose(tokens, (2, 0, 1)), state


def tokens_to_list(tokens, blank: int):
    """Host-side: [T, MAX] or [B, T, MAX] int32 -> list of (token, frame)."""
    import numpy as np

    arr = np.asarray(tokens)
    if arr.ndim == 3:
        return [tokens_to_list(a, blank) for a in arr]
    out = []
    for t in range(arr.shape[0]):
        for s in range(arr.shape[1]):
            if arr[t, s] != blank:
                out.append((int(arr[t, s]), t))
    return out
