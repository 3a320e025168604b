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

from typing import Any

import jax
import jax.numpy as jnp

from ..config import MAX_SYMBOLS_PER_STEP, ModelConfig
from ..params import ModelParams
from .decoder import DecoderState, joint_logits, joint_project_enc
from ..ops.lstm import lstm_step

# Python float, NOT a jnp scalar: a module-level device Array captured by a
# traced function becomes a jaxpr const hoisted into the executable's
# parameter list, and the jit fast path was observed dropping it on the
# SECOND dispatch ("supplied 66 buffers but compiled program expected 67").
# A float folds into the HLO as a literal.
NEG_INF = -1e30


def tdt_greedy_decode(params: ModelParams, cfg: ModelConfig, enc,
                      state: DecoderState, skip_in=None, step_mask=None,
                      enc_lengths=None, with_iters: bool = False,
                      with_confidence: bool = False):
    """Batched greedy TDT decode, fully on-device.

    enc: [B, T, d_model]; state: DecoderState (same carry as RNN-T -- TDT
    changes the time axis walk, not the prediction network).
    skip_in [B] int32 (optional): frames to skip at the start of this chunk
    (a previous chunk's jump overshoot; streaming carry).
    step_mask [B] bool (optional): False streams are untouched this call
    (their skip_in is passed through unchanged).
    enc_lengths [B] (optional): per-stream valid frame counts.
    with_confidence (static): additionally return per-emission
    log-posteriors confs [B, T, MAX] f32 -- log softmax over the TOKEN head
    (durations excluded: confidence answers "how sure was the label", the
    same quantity RNN-T confidence reports, models/decoder.py) at the
    emitting frame; 0.0 at blank-padded slots.

    Returns (tokens [B, T, MAX_SYMBOLS_PER_STEP] int32 blank-padded,
    [confs,] new DecoderState, skip_out [B] int32).
    """
    if not cfg.tdt_durations:
        raise ValueError("model has no TDT duration head "
                         "(cfg.tdt_durations is unset)")
    durations = tuple(int(d) for d in cfg.tdt_durations)
    D = len(durations)
    # NOTE on constants: dur_tab/index vectors are built from OPS (stacked
    # scalar literals, lax.iota) rather than trace-time jnp arrays. Trace-time
    # device constants are deduplicated across executables by value in JAX's
    # constant cache, and a shared 16-byte const was observed corrupted after
    # another TDT executable ran ("Executable expected parameter 0 of size 16
    # but got buffer with incompatible size ..."); op-built values are owned
    # by each executable and immune.
    dur_tab = jnp.stack([jnp.full((), d, jnp.int32) for d in durations])
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
    confs0 = jnp.zeros((B, T * MAX), jnp.float32)
    bidx = jax.lax.iota(jnp.int32, B)

    def cond(carry):
        it, _st, ptr = carry[:3]
        return jnp.logical_and(jnp.any(ptr < t_limit), it < T * MAX + T)

    def body(carry):
        it, st, ptr, sym, tokens, confs = carry
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
        if with_confidence:
            rows = logits[bidx, cp, :-D].astype(jnp.float32)     # [B, V]
            logp = (rows[bidx, tok]
                    - jax.scipy.special.logsumexp(rows, axis=-1))
            confs = confs.at[bidx, slot].set(
                jnp.where(emit, logp, confs[bidx, slot]))

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

        return (it + 1, DecoderState(h, c, prev), new_ptr, new_sym, tokens,
                confs)

    out = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, ptr0, sym0, tokens0, confs0))
    iters, state, ptr, _, tokens, confs = out
    skip_out = jnp.maximum(ptr - t_limit, 0)
    if step_mask is not None and skip_in is not None:
        skip_out = jnp.where(step_mask, skip_out, skip_in.astype(jnp.int32))
    res: tuple = (tokens.reshape(B, T, MAX),)
    if with_confidence:
        res = res + (confs.reshape(B, T, MAX),)
    res = res + (state, skip_out)
    if with_iters:
        res = res + (iters,)
    return res


# ---------------------------------------------------------------------------
# Duration-aware beam search (the mAES analogue for TDT; NeMo's TDT beam
# keeps per-hypothesis timestamps for exactly the reason below)
# ---------------------------------------------------------------------------

def _pytree_dataclass(cls):
    import dataclasses

    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class TdtBeamState:
    """Per-stream beam of K TDT hypotheses, carryable across chunks.

    Field names h/c/prev_token/scores/tokens/lengths deliberately match
    models/beam.py BeamState so `best_hypothesis` / `n_best` work on either.
    The TDT-specific extras: `t` is each hypothesis's own time pointer --
    unlike RNN-T, where every hypothesis sits at the same frame and the
    search scans frame-synchronously, TDT duration jumps advance hypotheses
    UNEQUALLY, so the frame loop becomes a round loop over live hypotheses
    at per-hypothesis frames. Between chunks `t` holds the jump overshoot
    past the previous chunk's last valid frame (the beam generalization of
    the greedy path's scalar `skip` carry). `sym` is the per-hypothesis
    symbols-emitted-at-current-frame counter backing the
    MAX_SYMBOLS_PER_STEP forced advance.

    lm_h/lm_c: optional shallow-fusion LM state per hypothesis, advanced on
    non-blank emissions exactly like the RNN-T beam's (models/beam.py)."""

    h: Any           # [B, K, L, H]
    c: Any           # [B, K, L, H]
    prev_token: Any  # [B, K] int32
    scores: Any      # [B, K] f32 total log-prob (NEG_INF = empty slot)
    tokens: Any      # [B, K, U] int32 emitted labels (blank-padded)
    lengths: Any     # [B, K] int32
    t: Any           # [B, K] int32 per-hypothesis time pointer / overshoot
    sym: Any         # [B, K] int32 symbols emitted at current frame
    lm_h: Any = None
    lm_c: Any = None


def init_tdt_beam_state(cfg: ModelConfig, batch: int, beam_size: int,
                        max_tokens: int, dtype=jnp.float32,
                        lm=None) -> TdtBeamState:
    L, H = cfg.decoder_layers, cfg.decoder_dim
    scores = jnp.full((batch, beam_size), NEG_INF, jnp.float32)
    scores = scores.at[:, 0].set(0.0)
    lm_h = lm_c = None
    if lm is not None:
        from .lm import init_lm_state

        lm_h, lm_c = init_lm_state(lm, (batch, beam_size), dtype)
    return TdtBeamState(
        h=jnp.zeros((batch, beam_size, L, H), dtype),
        c=jnp.zeros((batch, beam_size, L, H), dtype),
        prev_token=jnp.full((batch, beam_size), cfg.blank_token, jnp.int32),
        scores=scores,
        tokens=jnp.full((batch, beam_size, max_tokens), cfg.blank_token,
                        jnp.int32),
        lengths=jnp.zeros((batch, beam_size), jnp.int32),
        t=jnp.zeros((batch, beam_size), jnp.int32),
        sym=jnp.zeros((batch, beam_size), jnp.int32),
        lm_h=lm_h, lm_c=lm_c,
    )


def tdt_beam_decode(params: ModelParams, cfg: ModelConfig, enc,
                    state: TdtBeamState, beam_size: int,
                    enc_lengths=None, step_mask=None,
                    lm=None, lm_weight: float = 0.3, lm_bonus: float = 0.0):
    """On-device batched TDT beam search over one chunk of encoder frames.

    Candidates are (token, duration) PAIRS scored
    log P(token) + log P(duration) (+ LM fusion terms on labels), the joint
    factorization the TDT loss trains (losses/tdt.py). Each round expands
    every live hypothesis (t < t_limit) at its own frame and keeps the best
    K of {expansions} U {hypotheses already past the chunk end}; the loop
    ends when all K hypotheses have crossed the chunk boundary, with the
    overshoot left in state.t as the next chunk's skip carry.

    With beam_size=1 the search reduces exactly to tdt_greedy_decode's
    walk: log P(tok)+log P(dur) is separable, so the top-1 pair is
    (argmax token, argmax duration), the same pointer/state updates follow,
    and the blank d=0 stall guard (t += max(d,1)) and MAX_SYMBOLS forced
    advance are carried over unchanged -- the differential gate in
    tests/test_tdt.py.

    step_mask [B] bool (optional): False streams keep their entire beam
    (incl. t carries) untouched. enc_lengths [B] (optional): per-stream
    valid frame counts (defaults to T).

    Returns the new TdtBeamState (call models/beam.py best_hypothesis /
    n_best on it)."""
    if not cfg.tdt_durations:
        raise ValueError("model has no TDT duration head")
    durations = tuple(int(d) for d in cfg.tdt_durations)
    D = len(durations)
    # NOTE on constants: dur_tab/index vectors are built from OPS (stacked
    # scalar literals, lax.iota) rather than trace-time jnp arrays. Trace-time
    # device constants are deduplicated across executables by value in JAX's
    # constant cache, and a shared 16-byte const was observed corrupted after
    # another TDT executable ran ("Executable expected parameter 0 of size 16
    # but got buffer with incompatible size ..."); op-built values are owned
    # by each executable and immune.
    dur_tab = jnp.stack([jnp.full((), d, jnp.int32) for d in durations])
    blank = cfg.blank_token
    dp = params.decoder
    B, T, _ = enc.shape
    K = beam_size
    U = state.tokens.shape[-1]
    V = cfg.vocab_size
    MAX = MAX_SYMBOLS_PER_STEP

    enc_proj = joint_project_enc(params.joint, enc)          # [B, T, J]
    t_limit = (jnp.full((B,), T, jnp.int32) if enc_lengths is None
               else jnp.minimum(enc_lengths.astype(jnp.int32), T))
    if step_mask is not None:
        # frozen streams: no live hypotheses this call
        t_limit = jnp.where(step_mask, t_limit, 0)
    bidx = jax.lax.iota(jnp.int32, B)[:, None]               # [B, 1]
    kidx = jax.lax.iota(jnp.int32, K)[None, :]

    def cond(carry):
        it, st = carry
        return jnp.logical_and(jnp.any(st.t < t_limit[:, None]),
                               it < T * (MAX + 1) + 8)

    def body(carry):
        it, st = carry
        live = st.t < t_limit[:, None]                       # [B, K]
        # Frontier synchronization: only hypotheses at the per-stream
        # MINIMUM live frame expand this round; hypotheses that jumped
        # ahead wait (compete via keep-candidates). Without this, "stayer"
        # hypotheses (fewer frames covered = fewer <=0 log-prob factors)
        # crowd jumpers out of the beam and the search degrades below
        # greedy; with it, expansion order is a function of the frame
        # sequence alone, which also makes chunked decoding exactly equal
        # to one-shot decoding (the chunk boundary is just another frame
        # barrier).
        frontier = jnp.min(jnp.where(live, st.t, jnp.int32(1 << 30)),
                           axis=1)                           # [B]
        expand = jnp.logical_and(live, st.t == frontier[:, None])
        cp = jnp.clip(st.t, 0, T - 1)                        # [B, K]
        ep = enc_proj[bidx, cp]                              # [B, K, J]

        dt = ep.dtype
        emb = jnp.asarray(dp.embedding, dt)[st.prev_token]   # [B, K, H]
        flat = lambda x: x.reshape((B * K,) + x.shape[2:])
        dec_out, h2, c2 = lstm_step(dp, flat(emb), flat(st.h), flat(st.c))
        dec_out = dec_out.reshape(B, K, -1)
        h2 = h2.reshape(B, K, *st.h.shape[2:])
        c2 = c2.reshape(B, K, *st.c.shape[2:])
        logits = joint_logits(params.joint, ep, dec_out)     # [B, K, V+D]
        logp_tok = jax.nn.log_softmax(
            logits[..., :-D].astype(jnp.float32), axis=-1)   # [B, K, V]
        logp_dur = jax.nn.log_softmax(
            logits[..., -D:].astype(jnp.float32), axis=-1)   # [B, K, D]

        lmh2 = lmc2 = None
        if lm is not None:
            from .lm import lm_logp

            lm_lp, lmh2, lmc2 = lm_logp(
                lm, flat(st.prev_token), flat(st.lm_h), flat(st.lm_c), blank)
            unflat = lambda x: x.reshape((B, K) + x.shape[1:])
            lm_lp, lmh2, lmc2 = map(unflat, (lm_lp, lmh2, lmc2))
            # labels get the fusion terms; blank keeps the pure TDT score
            # (blank is never LM-scored, same as models/beam.py)
            fuse = jnp.float32(lm_weight) * lm_lp + jnp.float32(lm_bonus)
            logp_tok = logp_tok + fuse.at[..., blank].set(0.0)

        # ---- candidate scores [B, K, V, D] + K keep-candidates ----
        cand = (st.scores[:, :, None, None] + logp_tok[..., None]
                + logp_dur[:, :, None, :])
        # only frontier hypotheses expand; everyone else (jumped ahead or
        # past the chunk end) competes via its keep-candidate
        cand = jnp.where(expand[:, :, None, None], cand, NEG_INF)
        # a full token buffer cannot take any more labels (blank still ok)
        full = st.lengths >= U                               # [B, K]
        nb_mask = jax.lax.iota(jnp.int32, V) != blank
        cand = jnp.where((full[:, :, None] & nb_mask[None, None, :])[..., None],
                         NEG_INF, cand)
        keep_scores = jnp.where(expand, NEG_INF, st.scores)  # [B, K]

        flatc = jnp.concatenate(
            [cand.reshape(B, K * V * D), keep_scores], axis=1)
        top_scores, top_idx = jax.lax.top_k(flatc, K)        # [B, K]
        is_keep = top_idx >= K * V * D
        keep_parent = jnp.clip(top_idx - K * V * D, 0, K - 1)
        parent = jnp.where(is_keep, keep_parent,
                           top_idx // (V * D)).astype(jnp.int32)
        vd = jnp.clip(top_idx, 0, K * V * D - 1) % (V * D)
        v = (vd // D).astype(jnp.int32)
        d_sel = dur_tab[vd % D]                              # [B, K] frames

        g = lambda leaf: jnp.take_along_axis(
            leaf, parent.reshape(parent.shape + (1,) * (leaf.ndim - 2)),
            axis=1)
        is_label = jnp.logical_and(~is_keep, v != blank)
        is_blank = jnp.logical_and(~is_keep, v == blank)

        # time pointer: blank jumps max(d,1); label jumps d (0 = stay, with
        # the MAX_SYMBOLS forced advance); keep stays put
        pt = g(st.t[..., None])[..., 0]
        psym = g(st.sym[..., None])[..., 0]
        new_sym = jnp.where(is_label & (d_sel == 0), psym + 1, 0)
        hit_max = new_sym >= MAX
        adv = jnp.where(is_blank, jnp.maximum(d_sel, 1),
                        jnp.where(is_label,
                                  jnp.where(d_sel == 0,
                                            jnp.where(hit_max, 1, 0), d_sel),
                                  0))
        new_t = pt + adv
        new_sym = jnp.where(hit_max, 0, new_sym)

        # labels advance the prediction network; blank/keep freeze it
        sel_h = jnp.where(is_label[..., None, None], g(h2), g(st.h))
        sel_c = jnp.where(is_label[..., None, None], g(c2), g(st.c))
        sel_prev = jnp.where(is_label, v, g(st.prev_token[..., None])[..., 0])
        plen = g(st.lengths[..., None])[..., 0]
        new_len = jnp.where(is_label, jnp.minimum(plen + 1, U), plen)
        new_tokens = g(st.tokens)
        new_tokens = new_tokens.at[
            bidx, kidx, jnp.clip(new_len - 1, 0, U - 1)].set(
            jnp.where(is_label, v,
                      new_tokens[bidx, kidx, jnp.clip(new_len - 1, 0, U - 1)]))

        new_lm_h = new_lm_c = None
        if lm is not None:
            new_lm_h = jnp.where(is_label[..., None, None], g(lmh2), g(st.lm_h))
            new_lm_c = jnp.where(is_label[..., None, None], g(lmc2), g(st.lm_c))

        return it + 1, TdtBeamState(
            h=sel_h, c=sel_c, prev_token=sel_prev, scores=top_scores,
            tokens=new_tokens, lengths=new_len, t=new_t, sym=new_sym,
            lm_h=new_lm_h, lm_c=new_lm_c)

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    # overshoot carry for the next chunk
    import dataclasses

    out = dataclasses.replace(
        out, t=jnp.maximum(out.t - t_limit[:, None], 0))
    if step_mask is not None:
        # frozen streams keep their ENTIRE incoming beam (incl. t carries)
        frozen = ~step_mask
        keep = lambda new, old: (
            old if new is None
            else jnp.where(frozen.reshape((B,) + (1,) * (new.ndim - 1)),
                           old, new))
        out = TdtBeamState(*(keep(getattr(out, f.name),
                                  getattr(state, f.name))
                             for f in dataclasses.fields(TdtBeamState)))
    return out
