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
    The vocab projection keeps its f32 MXU accumulator (no bf16 downcast
    before argmax -- ties would flip vs the reference's f32 logits)."""
    dt = dec_out.dtype
    d = dec_out @ jp.dec_w.astype(dt) + jp.dec_b.astype(dt)
    h = jax.nn.relu(enc_proj + d)
    logits = jax.lax.dot_general(
        h, jp.out_w.astype(dt),
        dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return logits + jp.out_b.astype(jnp.float32)


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
        emb = jnp.asarray(dp.embedding, enc_proj_t.dtype)[st.prev_token]
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


def greedy_decode_by_frame(params: ModelParams, cfg: ModelConfig, enc,
                           state: DecoderState):
    """Greedy RNN-T as a scan over frames (the direct transliteration of the
    reference loop, src/nemo-ggml.cpp:1138-1246). Kept as the semantics
    oracle for greedy_decode; O(T) sequential iterations."""
    enc_proj = joint_project_enc(params.joint, enc)  # [B, T, J]

    def frame(st, ep_t):
        st, toks = decode_frame(params, cfg, st, ep_t)
        return st, toks

    state, tokens = jax.lax.scan(frame, state, jnp.swapaxes(enc_proj, 0, 1))
    # tokens: [T, MAX, B] -> [B, T, MAX]
    return jnp.transpose(tokens, (2, 0, 1)), state


def greedy_decode(params: ModelParams, cfg: ModelConfig, enc,
                  state: DecoderState, step_mask=None, enc_lengths=None,
                  with_iters: bool = False, with_confidence: bool = False):
    """Frame-skipping batched greedy RNN-T, fully on-device.

    step_mask [B] bool (optional): streams marked False are skipped entirely
    this call -- no tokens, frozen state (continuous-batching support).
    enc_lengths [B] (optional): per-stream valid frame counts for padded
    multi-utterance batches; frames beyond a stream's length emit nothing.
    with_confidence (static): additionally return per-emission log-posteriors
    confs [B, T, MAX] f32 -- log softmax(joint logits)[emitted token] at the
    emitting frame, 0.0 at blank-padded slots (a capability the reference
    lacks; its label loop discards the logits after argmax,
    src/nemo-stream.cpp:843-874). Adds one [B,T,V]x[B,T] row-select matmul +
    logsumexp per emission iteration; the default path is unchanged.

    Semantically identical to the reference's per-frame label loop
    (src/nemo-ggml.cpp:1138-1246: blank freezes the LSTM state and advances
    the frame; at most MAX_SYMBOLS_PER_STEP non-blanks per frame) but
    restructured for TPU: the LSTM state only changes on non-blank
    emissions, so for a FIXED state the joint can be evaluated against ALL
    remaining frames in one batched matmul, and each stream jumps directly
    to its first non-blank frame. The while_loop then runs
    O(total emitted tokens) iterations instead of O(T) -- for real speech at
    ~1 token/frame-chunk this is a ~5x cut in sequential steps, each of
    which is a large MXU matmul instead of a chain of tiny ones.

    enc: [B, T, d_model]. Returns (tokens [B, T, MAX_SYMBOLS_PER_STEP]
    int32 blank-padded, new DecoderState)."""
    dp: DecoderParams = params.decoder
    blank = cfg.blank_token
    B, T, _ = enc.shape
    MAX = MAX_SYMBOLS_PER_STEP

    enc_proj = joint_project_enc(params.joint, enc)       # [B, T, J]
    tokens0 = jnp.full((B, T * MAX), blank, jnp.int32)
    ptr0 = jnp.zeros((B,), jnp.int32)                     # current frame
    if step_mask is not None:
        ptr0 = jnp.where(step_mask, ptr0, T)              # skip masked streams
    t_limit = jnp.full((B,), T, jnp.int32)
    if enc_lengths is not None:
        t_limit = jnp.minimum(enc_lengths.astype(jnp.int32), T)
    sym0 = jnp.zeros((B,), jnp.int32)                     # symbols this frame
    bidx = jnp.arange(B)
    confs0 = (jnp.zeros((B, T * MAX), jnp.float32)
              if with_confidence else None)

    def cond(carry):
        it, _st, ptr = carry[:3]
        # a stream is done once ptr reaches ITS OWN valid length (t_limit),
        # not the padded T -- otherwise ragged batches spin to the safety
        # bound re-evaluating the joint every iteration
        return jnp.logical_and(jnp.any(ptr < t_limit), it < T * MAX + T)

    def body(carry):
        it, st, ptr, sym, tokens = carry[:5]
        emb = jnp.asarray(dp.embedding, enc_proj.dtype)[st.prev_token]
        dec_out, h2, c2 = lstm_step(dp, emb, st.h, st.c)   # [B, H]
        logits = joint_logits(params.joint, enc_proj, dec_out[:, None, :])
        best = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B, T]

        # first valid frame >= ptr whose argmax is non-blank (current state)
        t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        cand = jnp.logical_and(best != blank, t_idx >= ptr[:, None])
        cand = jnp.logical_and(cand, t_idx < t_limit[:, None])
        has = jnp.any(cand, axis=1)                            # [B]
        first = jnp.argmax(cand, axis=1).astype(jnp.int32)     # [B]

        active = ptr < t_limit
        emit = jnp.logical_and(active, has)
        # streams with no remaining non-blank frame are done with this chunk
        new_ptr = jnp.where(jnp.logical_and(active, ~has), t_limit, ptr)
        # emitting streams: jump to the emitting frame
        jumped = first != ptr
        new_ptr = jnp.where(emit, first, new_ptr)
        new_sym = jnp.where(emit, jnp.where(jumped, 0, sym), sym)

        tok = best[bidx, first]                                # [B]
        slot = new_ptr * MAX + new_sym
        cslot = jnp.clip(slot, 0, T * MAX - 1)
        tokens = tokens.at[bidx, cslot].set(
            jnp.where(emit, tok, tokens[bidx, cslot]))
        extra = ()
        if with_confidence:
            confs = carry[5]
            # log-posterior of the emitted token: the argmax logit IS the
            # row max, so conf = max(row) - logsumexp(row). The row at the
            # emitting frame is selected with a one-hot matmul over T (a
            # take_along_axis gather here lowers to per-element VPU work,
            # the measured anti-pattern).
            onehot = (t_idx == first[:, None]).astype(logits.dtype)  # [B,T]
            row = jnp.einsum("btv,bt->bv", logits, onehot)           # f32
            m = jnp.max(row, axis=-1)
            conf = -jnp.log(jnp.sum(jnp.exp(row - m[:, None]), axis=-1))
            extra = (confs.at[bidx, cslot].set(
                jnp.where(emit, conf, confs[bidx, cslot])),)

        h = jnp.where(emit[:, None, None], h2, st.h)
        c = jnp.where(emit[:, None, None], c2, st.c)
        prev = jnp.where(emit, tok, st.prev_token)

        new_sym = jnp.where(emit, new_sym + 1, new_sym)
        # MAX symbols reached on this frame: force-advance (reference bound)
        hit_max = new_sym >= MAX
        new_ptr = jnp.where(hit_max, new_ptr + 1, new_ptr)
        new_sym = jnp.where(hit_max, 0, new_sym)

        return (it + 1, DecoderState(h, c, prev), new_ptr, new_sym,
                tokens) + extra

    carry0 = (jnp.int32(0), state, ptr0, sym0, tokens0)
    if with_confidence:
        carry0 = carry0 + (confs0,)
    out = jax.lax.while_loop(cond, body, carry0)
    iters, state, _, _, tokens = out[:5]
    res: tuple = (tokens.reshape(B, T, MAX), state)
    if with_iters:
        res = res + (iters,)
    if with_confidence:
        res = res + (out[5].reshape(B, T, MAX),)
    return res


def extract_emitted(tokens, blank: int, frame_offsets=None, confs=None):
    """Vectorized host-side token extraction for serving: [B, T, MAX] int32
    -> {stream: [(token, abs_frame), ...]} in emission order.

    Replaces a per-(stream, frame, symbol) Python loop (~B*T*MAX iterations
    per engine tick) with one np.argwhere over the whole batch; only streams
    that actually emitted appear in the result. `frame_offsets` [B] offsets
    each stream's frame indices (cross-chunk timestamps, the reference's
    frame_offset carry, src/nemo-ggml.cpp:1260-1429). With `confs`
    [B, T, MAX] f32 (greedy_decode's with_confidence output) entries become
    (token, abs_frame, log_posterior) triples."""
    import numpy as np

    arr = np.asarray(tokens)
    nz = np.argwhere(arr != blank)
    out: dict[int, list[tuple]] = {}
    if nz.size == 0:
        return out
    vals = arr[nz[:, 0], nz[:, 1], nz[:, 2]]
    cvals = (np.asarray(confs)[nz[:, 0], nz[:, 1], nz[:, 2]]
             if confs is not None else None)
    b = nz[:, 0]
    # argwhere is lexicographic in (stream, frame, symbol) == emission order
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    ends = np.r_[starts[1:], len(b)]
    for s0, e0 in zip(starts, ends):
        stream = int(b[s0])
        off = int(frame_offsets[stream]) if frame_offsets is not None else 0
        if cvals is None:
            out[stream] = [(int(v), off + int(t))
                           for v, t in zip(vals[s0:e0], nz[s0:e0, 1])]
        else:
            out[stream] = [(int(v), off + int(t), float(cf))
                           for v, t, cf in zip(vals[s0:e0], nz[s0:e0, 1],
                                               cvals[s0:e0])]
    return out


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
