"""On-device batched RNN-T beam search (capability beyond the reference,
which is greedy-only -- reference src/nemo-ggml.cpp:1109-1429; NeMo offers
beam variants for accuracy-sensitive offline use, most practically mAES).

Algorithm: per encoder frame, up to `expansions` label-expansion rounds
(the mAES bound). Each round evaluates the joint for every live hypothesis
(one batched [B, K] LSTM step + joint -- MXU-friendly), splits candidates
into blank (hypothesis finishes the frame, prediction-network state frozen
-- the RNN-T invariant the reference encodes at src/nemo-ggml.cpp:1234-1245)
and non-blank (hypothesis extends, state advances), and keeps the best K
of (finished ∪ extended) by total log-probability. After the last round
the still-live hypotheses are force-finished with their blank log-prob.
Identical prefixes arising through different expansion orders are NOT
merged (NeMo's mAES merges opportunistically; with log-sum-exp merging off,
scores are exact path probabilities).

Everything runs inside jit as a lax.scan over frames with fixed [B, K]
shapes: no host round-trips, batched over streams AND hypotheses.

With beam_size=1 the search degenerates to exactly the greedy path
(argmax over {best non-blank, blank} by total score == argmax over logits),
which is the differential gate in tests/test_beam.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import MAX_SYMBOLS_PER_STEP, ModelConfig
from ..params import DecoderParams, ModelParams
from ..ops.lstm import lstm_step
from .decoder import joint_logits, joint_project_enc

# Python float, NOT a jnp scalar: a module-level device Array captured by a
# traced function becomes a jaxpr const hoisted into the executable's
# parameter list, and the jit fast path was observed dropping such a const
# on the SECOND dispatch of models/tdt.py's beam ("supplied 66 buffers but
# compiled program expected 67"). A float folds into the HLO as a literal.
NEG_INF = -1e30


def _pytree_dataclass(cls):
    import dataclasses

    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class BeamState:
    """Per-stream beam of K hypotheses (carryable across chunks).

    lm_h/lm_c are present (non-None) only when decoding with LM shallow
    fusion (models/lm.py): each hypothesis then also carries its language
    model state, advanced on non-blank emissions exactly like the
    prediction network's."""

    h: Any           # [B, K, L, H]
    c: Any           # [B, K, L, H]
    prev_token: Any  # [B, K] int32
    scores: Any      # [B, K] f32 total log-prob (NEG_INF = empty slot)
    tokens: Any      # [B, K, U] int32 emitted labels (blank-padded)
    lengths: Any     # [B, K] int32
    lm_h: Any = None  # [B, K, L_lm, H_lm] | None
    lm_c: Any = None


def init_beam_state(cfg: ModelConfig, batch: int, beam_size: int,
                    max_tokens: int, dtype=jnp.float32,
                    lm=None) -> BeamState:
    L, H = cfg.decoder_layers, cfg.decoder_dim
    scores = jnp.full((batch, beam_size), NEG_INF, jnp.float32)
    scores = scores.at[:, 0].set(0.0)
    lm_h = lm_c = None
    if lm is not None:
        from .lm import init_lm_state

        lm_h, lm_c = init_lm_state(lm, (batch, beam_size), dtype)
    return BeamState(
        h=jnp.zeros((batch, beam_size, L, H), dtype),
        c=jnp.zeros((batch, beam_size, L, H), dtype),
        prev_token=jnp.full((batch, beam_size), cfg.blank_token, jnp.int32),
        scores=scores,
        tokens=jnp.full((batch, beam_size, max_tokens), cfg.blank_token,
                        jnp.int32),
        lengths=jnp.zeros((batch, beam_size), jnp.int32),
        lm_h=lm_h, lm_c=lm_c,
    )


def _gather_k(tree_leaf, idx):
    """Select hypotheses: leaf [B, K, ...] reindexed by idx [B, Knew]."""
    return jnp.take_along_axis(
        tree_leaf,
        idx.reshape(idx.shape + (1,) * (tree_leaf.ndim - 2)).astype(jnp.int32),
        axis=1)


def beam_decode(params: ModelParams, cfg: ModelConfig, enc,
                state: BeamState, beam_size: int,
                expansions: int = MAX_SYMBOLS_PER_STEP,
                enc_lengths=None, lm=None, lm_weight: float = 0.3,
                lm_bonus: float = 0.0):
    """enc [B, T, D] -> (new BeamState, per-frame nothing); call
    `best_hypothesis` on the returned state for tokens.

    enc_lengths [B] (optional): frames >= a stream's length are skipped
    (hypotheses pass through unchanged), so ragged batches decode exactly
    like solo runs.

    lm (LMParams, optional): shallow fusion — label candidates score
    log P_rnnt + lm_weight * log P_lm(label | emitted history) + lm_bonus;
    blank keeps the pure transducer score (models/lm.py). The state must
    have been created with the same lm (init_beam_state(..., lm=lm)).

    lm_bonus: per-label insertion bonus countering shallow fusion's
    deletion bias (lm_weight * log P_lm is always <= 0, so labels are
    taxed relative to blank, which is never LM-scored; the standard fix
    is a flat bonus per emission — set it near lm_weight * H_lm, the
    LM's per-token entropy, to zero-mean the tax on in-grammar labels
    while out-of-grammar labels stay penalized)."""
    dp: DecoderParams = params.decoder
    blank = cfg.blank_token
    B, T, _ = enc.shape
    K = beam_size
    U = state.tokens.shape[-1]
    V = cfg.vocab_size

    enc_proj = joint_project_enc(params.joint, enc)   # [B, T, J]
    t_limit = (jnp.full((B,), T, jnp.int32) if enc_lengths is None
               else jnp.minimum(enc_lengths.astype(jnp.int32), T))

    def joint_for_beam(st, ep_t):
        """One prediction+joint evaluation for all B*K hypotheses.
        ep_t [B, J] -> log-probs [B, K, V], plus advanced LSTM states."""
        dt = ep_t.dtype
        emb = jnp.asarray(dp.embedding, dt)[st.prev_token]     # [B, K, H]
        flat = lambda x: x.reshape((B * K,) + x.shape[2:])
        dec_out, h2, c2 = lstm_step(dp, flat(emb), flat(st.h), flat(st.c))
        dec_out = dec_out.reshape(B, K, -1)
        logits = joint_logits(params.joint, ep_t[:, None, :], dec_out)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logp, h2.reshape(B, K, *st.h.shape[2:]), \
            c2.reshape(B, K, *st.c.shape[2:])

    def frame(st, xs):
        ep_t, t = xs
        active_frame = t < t_limit                             # [B]

        # finished pool: starts empty; live pool: the incoming beam
        fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)
        fin = BeamState(h=st.h, c=st.c, prev_token=st.prev_token,
                        scores=fin_scores, tokens=st.tokens,
                        lengths=st.lengths, lm_h=st.lm_h, lm_c=st.lm_c)
        live = st

        def expand(carry, _):
            live, fin = carry
            logp, h2, c2 = joint_for_beam(live, ep_t)          # [B, K, V]
            cand = live.scores[..., None] + logp               # [B, K, V]

            # --- blank: hypothesis finishes the frame, state frozen ---
            # (pure transducer score: blank is never LM-scored)
            blank_scores = cand[..., blank]                    # [B, K]
            # merge (fin ∪ newly-finished): top-K of 2K by score
            cat = lambda a, b: jnp.concatenate([a, b], axis=1)
            m_scores = cat(fin.scores, blank_scores)           # [B, 2K]
            m_idx = jnp.argsort(-m_scores, axis=1)[:, :K]      # [B, K]
            take2 = lambda fl, ll: _gather_k(cat(fl, ll), m_idx)
            new_fin = BeamState(
                h=take2(fin.h, live.h), c=take2(fin.c, live.c),
                prev_token=take2(fin.prev_token, live.prev_token),
                scores=jnp.take_along_axis(m_scores, m_idx, axis=1),
                tokens=take2(fin.tokens, live.tokens),
                lengths=take2(fin.lengths, live.lengths),
                lm_h=(take2(fin.lm_h, live.lm_h) if lm is not None
                      else None),
                lm_c=(take2(fin.lm_c, live.lm_c) if lm is not None
                      else None))

            # --- non-blank: extend; top-K over K*V candidates ---
            lmh2 = lmc2 = None
            if lm is not None:
                from .lm import lm_logp

                flat = lambda x: x.reshape((B * K,) + x.shape[2:])
                lm_lp, lmh2, lmc2 = lm_logp(
                    lm, flat(live.prev_token), flat(live.lm_h),
                    flat(live.lm_c), blank)
                unflat = lambda x: x.reshape((B, K) + x.shape[1:])
                lm_lp, lmh2, lmc2 = map(unflat, (lm_lp, lmh2, lmc2))
                cand = (cand + jnp.float32(lm_weight) * lm_lp
                        + jnp.float32(lm_bonus))
            nb = cand.at[..., blank].set(NEG_INF)
            # a full hypothesis buffer cannot extend further
            nb = jnp.where((live.lengths >= U)[..., None], NEG_INF, nb)
            flatc = nb.reshape(B, K * V)
            top_scores, top_flat = jax.lax.top_k(flatc, K)     # [B, K]
            parent = (top_flat // V).astype(jnp.int32)
            label = (top_flat % V).astype(jnp.int32)
            g = lambda leaf: _gather_k(leaf, parent)
            new_len = jnp.minimum(g(live.lengths) + 1, U)
            new_tokens = g(live.tokens)
            bidx = jnp.arange(B)[:, None]
            kidx = jnp.arange(K)[None, :]
            new_tokens = new_tokens.at[
                bidx, kidx, jnp.clip(new_len - 1, 0, U - 1)].set(label)
            new_live = BeamState(
                h=_gather_k(h2, parent), c=_gather_k(c2, parent),
                prev_token=label, scores=top_scores,
                tokens=new_tokens, lengths=new_len,
                lm_h=_gather_k(lmh2, parent) if lm is not None else None,
                lm_c=_gather_k(lmc2, parent) if lm is not None else None)
            return (new_live, new_fin), None

        (live, fin), _ = jax.lax.scan(expand, (live, fin), None,
                                      length=expansions)

        # force-finish surviving live hypotheses with their blank log-prob
        logp, _h2, _c2 = joint_for_beam(live, ep_t)
        forced = live.scores + logp[..., blank]
        cat = lambda a, b: jnp.concatenate([a, b], axis=1)
        m_scores = cat(fin.scores, forced)
        m_idx = jnp.argsort(-m_scores, axis=1)[:, :K]
        take2 = lambda fl, ll: _gather_k(cat(fl, ll), m_idx)
        out = BeamState(
            h=take2(fin.h, live.h), c=take2(fin.c, live.c),
            prev_token=take2(fin.prev_token, live.prev_token),
            scores=jnp.take_along_axis(m_scores, m_idx, axis=1),
            tokens=take2(fin.tokens, live.tokens),
            lengths=take2(fin.lengths, live.lengths),
            lm_h=take2(fin.lm_h, live.lm_h) if lm is not None else None,
            lm_c=take2(fin.lm_c, live.lm_c) if lm is not None else None)

        # frames past a stream's enc_length leave its beam untouched
        keep = lambda new, old: jnp.where(
            active_frame.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        out = BeamState(*(keep(n, o) for n, o in
                          zip(jax.tree_util.tree_leaves(out),
                              jax.tree_util.tree_leaves(st))))
        return out, None

    ts = jnp.arange(T, dtype=jnp.int32)
    state, _ = jax.lax.scan(frame, state,
                            (jnp.swapaxes(enc_proj, 0, 1), ts))
    return state


def best_hypothesis(state: BeamState, length_norm: bool = False):
    """(tokens [B, U] int32 blank-padded, lengths [B], score [B]) of the
    best hypothesis per stream.

    length_norm=True selects by score / max(len, 1) (NeMo's score_norm):
    raw sum-of-log-probs penalizes every emitted symbol, which on weakly
    peaked distributions collapses the beam to near-silence; normalized
    selection is the standard serving default. The returned score is
    always the RAW total log-prob of the selected hypothesis."""
    sel = state.scores
    if length_norm:
        sel = sel / jnp.maximum(state.lengths, 1).astype(sel.dtype)
    k = jnp.argmax(sel, axis=1)                                # [B]
    take = lambda leaf: jnp.squeeze(_gather_k(leaf, k[:, None]), axis=1)
    return take(state.tokens), take(state.lengths), \
        jnp.take_along_axis(state.scores, k[:, None], axis=1)[:, 0]


def n_best(state: BeamState, n: int | None = None,
           length_norm: bool = False):
    """Sorted top-n hypotheses per stream, best first: (tokens [B, N, U]
    blank-padded, lengths [B, N], scores [B, N] raw total log-prob).

    The n-best list is the standard consumer of a beam search (rescoring,
    confidence from hypothesis spread, alternatives in a UI); the reference
    cannot produce one (greedy only). `length_norm` orders by
    score / max(len, 1) like `best_hypothesis`; returned scores stay raw.
    Ranking gather is a once-per-utterance epilogue, so take_along_axis is
    fine here (the hot-path ban in docs/PERFORMANCE.md is per-step code)."""
    k_total = state.scores.shape[1]
    n = k_total if n is None else min(n, k_total)
    sel = state.scores
    if length_norm:
        sel = sel / jnp.maximum(state.lengths, 1).astype(sel.dtype)
    order = jnp.argsort(-sel, axis=1)[:, :n].astype(jnp.int32)   # [B, N]
    return (_gather_k(state.tokens, order), _gather_k(state.lengths, order),
            jnp.take_along_axis(state.scores, order, axis=1))
