"""TDT (Token-and-Duration Transducer) greedy decode, batched on device.

Model-family widening beyond the reference engine (RNN-T-only, reference
src/nemo-ggml.cpp:1109-1429): a TDT joint (losses/tdt.py has the lattice
spec) emits a token AND a duration each step; blanks jump `duration` frames
at once instead of always 1, so decoding visits far fewer frames on
sparse-speech audio -- the family's selling point.

Greedy semantics (one stream):

    t = 0
    while t < T:
        tok, d = argmax token / duration heads of joint(enc[t], pred_state)
        if tok == blank:  t += max(d, 1)          # blank d=0 would stall
        else:             emit tok; update state; t += d
                          (>= MAX_SYMBOLS_PER_STEP emissions at one frame
                           force t += 1, the RNN-T safety bound carried over)

TPU shape, same insight as models/decoder.py's greedy_decode: the
prediction-network state only changes on non-blank emissions, so for a
FIXED state the joint is evaluated against ALL frames in one batched
matmul; the blank-jump chain through those precomputed argmaxes is then a
pure [B]-integer pointer chase (an inner while_loop with no matmuls), and
the outer loop runs O(total emitted tokens) iterations. Per-stream time
pointers may overshoot the chunk end (a jump can cross the boundary);
the overshoot is returned as `skip` so streaming sessions carry it into
the next chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MAX_SYMBOLS_PER_STEP, ModelConfig
from ..params import ModelParams
from .decoder import DecoderState, joint_logits, joint_project_enc
from ..ops.lstm import lstm_step


def tdt_greedy_decode(params: ModelParams, cfg: ModelConfig, enc,
                      state: DecoderState, skip_in=None, step_mask=None,
                      enc_lengths=None, with_iters: bool = False):
    """Batched greedy TDT decode, fully on-device.

    enc: [B, T, d_model]; state: DecoderState (same carry as RNN-T -- TDT
    changes the time axis walk, not the prediction network).
    skip_in [B] int32 (optional): frames to skip at the start of this chunk
    (a previous chunk's jump overshoot; streaming carry).
    step_mask [B] bool (optional): False streams are untouched this call
    (their skip_in is passed through unchanged).
    enc_lengths [B] (optional): per-stream valid frame counts.

    Returns (tokens [B, T, MAX_SYMBOLS_PER_STEP] int32 blank-padded,
    new DecoderState, skip_out [B] int32).
    """
    if not cfg.tdt_durations:
        raise ValueError("model has no TDT duration head "
                         "(cfg.tdt_durations is unset)")
    durations = tuple(int(d) for d in cfg.tdt_durations)
    D = len(durations)
    dur_tab = jnp.asarray(durations, jnp.int32)
    blank = cfg.blank_token
    dp = params.decoder
    B, T, _ = enc.shape
    MAX = MAX_SYMBOLS_PER_STEP

    enc_proj = joint_project_enc(params.joint, enc)          # [B, T, J]
    tokens0 = jnp.full((B, T * MAX), blank, jnp.int32)
    t_limit = jnp.full((B,), T, jnp.int32)
    if enc_lengths is not None:
        t_limit = jnp.minimum(enc_lengths.astype(jnp.int32), T)
    ptr0 = (jnp.zeros((B,), jnp.int32) if skip_in is None
            else skip_in.astype(jnp.int32))
    if step_mask is not None:
        # masked streams: park the pointer at t_limit (no frames visited);
        # their skip carry is restored after the loop
        ptr0 = jnp.where(step_mask, ptr0, t_limit)
    sym0 = jnp.zeros((B,), jnp.int32)
    bidx = jnp.arange(B)

    def cond(carry):
        it, _st, ptr = carry[:3]
        return jnp.logical_and(jnp.any(ptr < t_limit), it < T * MAX + T)

    def body(carry):
        it, st, ptr, sym, tokens = carry
        emb = jnp.asarray(dp.embedding, enc_proj.dtype)[st.prev_token]
        dec_out, h2, c2 = lstm_step(dp, emb, st.h, st.c)     # [B, H]
        logits = joint_logits(params.joint, enc_proj,
                              dec_out[:, None, :])           # [B, T, V+D]
        best = jnp.argmax(logits[..., :-D], axis=-1).astype(jnp.int32)
        djump = dur_tab[jnp.argmax(logits[..., -D:], axis=-1)]  # [B, T]

        # blank-jump chain: pure pointer chase over the precomputed argmaxes
        # (the state is frozen across blanks, so best/djump stay valid)
        def chain_cond(c):
            p, _ = c
            cp = jnp.clip(p, 0, T - 1)
            return jnp.any(jnp.logical_and(p < t_limit,
                                           best[bidx, cp] == blank))

        def chain_body(c):
            p, moved = c
            cp = jnp.clip(p, 0, T - 1)
            is_blank = jnp.logical_and(p < t_limit, best[bidx, cp] == blank)
            step = jnp.maximum(djump[bidx, cp], 1)       # blank d=0 -> 1
            p2 = jnp.where(is_blank, p + step, p)
            return p2, jnp.logical_or(moved, is_blank)

        ptr2, moved = jax.lax.while_loop(
            chain_cond, chain_body, (ptr, jnp.zeros((B,), bool)))
        # a blank ends the frame's symbol run
        sym2 = jnp.where(moved, 0, sym)

        emit = ptr2 < t_limit                              # non-blank here
        cp = jnp.clip(ptr2, 0, T - 1)
        tok = best[bidx, cp]
        d_emit = djump[bidx, cp]

        slot = jnp.clip(ptr2 * MAX + sym2, 0, T * MAX - 1)
        tokens = tokens.at[bidx, slot].set(
            jnp.where(emit, tok, tokens[bidx, slot]))

        h = jnp.where(emit[:, None, None], h2, st.h)
        c = jnp.where(emit[:, None, None], c2, st.c)
        prev = jnp.where(emit, tok, st.prev_token)

        stay = d_emit == 0
        new_sym = jnp.where(stay, sym2 + 1, 0)
        hit_max = new_sym >= MAX
        advance = jnp.where(stay, jnp.where(hit_max, 1, 0), d_emit)
        new_sym = jnp.where(hit_max, 0, new_sym)
        new_ptr = jnp.where(emit, ptr2 + advance, ptr2)
        new_sym = jnp.where(emit, new_sym, sym2)

        return (it + 1, DecoderState(h, c, prev), new_ptr, new_sym, tokens)

    out = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, ptr0, sym0, tokens0))
    iters, state, ptr, _, tokens = out
    skip_out = jnp.maximum(ptr - t_limit, 0)
    if step_mask is not None and skip_in is not None:
        skip_out = jnp.where(step_mask, skip_out, skip_in.astype(jnp.int32))
    res: tuple = (tokens.reshape(B, T, MAX), state, skip_out)
    if with_iters:
        res = res + (iters,)
    return res
