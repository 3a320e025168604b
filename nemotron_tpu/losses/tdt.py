"""TDT (Token-and-Duration Transducer) loss: the duration-aware lattice
forward recursion, jit/grad-friendly.

Model-family widening beyond the reference engine (which is RNN-T-only,
reference src/nemo-ggml.cpp:1109-1429): NeMo's TDT checkpoints (Xu et al.,
"Efficient Sequence Transduction by Jointly Predicting Tokens and
Durations", ICML 2023 -- e.g. parakeet-tdt) extend the transducer joint to
predict a *duration* alongside every token. The joint output is
[vocab + n_durations]: the first V logits are token logits (blank = V-1,
this model family's convention), the trailing D logits are a categorical
distribution over a small static duration set (e.g. (0, 1, 2, 3, 4)).

Lattice semantics (generalizes Graves 2012; reduces the number of joint
evaluations at inference because blanks jump multiple frames):

  - a TOKEN transition at node (t, u) emits label u+1 and advances time by
    any d in durations:      (t, u) -> (t + d, u + 1)
    weight = lp_tok(y_{u+1} | t, u) + lp_dur(d | t, u)
  - a BLANK transition advances time by d >= 1 (d = 0 would self-loop):
                             (t, u) -> (t + d, u)
    weight = lp_tok(blank | t, u) + lp_dur(d | t, u)
  - every prediction is conditioned on a real frame: t <= T_b - 1.
  - a path is complete when it reaches (T_b, U_b): all frames consumed,
    all labels emitted. Unlike RNN-T the final transition need not be a
    blank -- tokens also advance time.

  loss_b = -alpha(T_b, U_b)

TPU shape: `lax.scan` over the time axis carrying a rolling window of the
last max(durations) alpha rows [B, U+1] (a duration-d transition reads row
t-d); the d = 0 token moves are the same in-row prefix recursion as
losses/rnnt.py. All duration handling is static Python over the (small)
duration set, so the compiled program is a fixed chain of adds/logaddexps.

`sigma` is the paper's "logit under-normalization": subtract sigma from
every token log-prob during training (sec 3.3; NeMo default 0.05) -- a
per-transition constant that regularizes the token head toward confident
predictions without changing the argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def split_tdt_logits(logits, n_durations: int):
    """[..., V + D] joint outputs -> (token logits [..., V],
    duration logits [..., D])."""
    return logits[..., :-n_durations], logits[..., -n_durations:]


def tdt_loss(logits, labels, logit_lengths, label_lengths,
             durations, blank: int | None = None, sigma: float = 0.0):
    """Negative log-likelihood of the TDT lattice, per sequence.

    logits: [B, T, U+1, V + D] joint outputs (unnormalized); the trailing
        D = len(durations) slots are the duration head.
    labels: [B, U] int32 (padding past label_lengths is ignored).
    logit_lengths: [B] valid encoder frames (<= T).
    label_lengths: [B] valid labels (<= U).
    durations: static tuple/list of the duration set, e.g. (0, 1, 2, 3, 4).
        Must be sorted, unique, non-negative.
    blank: blank token id within the V token logits (default V-1).
    sigma: logit under-normalization (subtracted from every token log-prob).

    Returns loss [B].
    """
    durations = tuple(int(d) for d in durations)
    if sorted(set(durations)) != list(durations) or durations[0] < 0:
        raise ValueError(f"durations must be sorted unique >= 0: {durations}")
    D = len(durations)
    B, T, U1, VD = logits.shape
    U = U1 - 1
    V = VD - D
    if blank is None:
        blank = V - 1
    has_zero = durations[0] == 0
    pos_durs = [d for d in durations if d >= 1]
    if not pos_durs:
        raise ValueError("durations must contain at least one d >= 1")
    m = max(pos_durs)
    dur_index = {d: i for i, d in enumerate(durations)}

    tok_logits, dur_logits = split_tdt_logits(
        logits.astype(jnp.float32), D)
    lp_tok = jax.nn.log_softmax(tok_logits, axis=-1) - jnp.float32(sigma)
    lp_dur = jax.nn.log_softmax(dur_logits, axis=-1)     # [B, T, U+1, D]

    lp_blank = lp_tok[..., blank]                        # [B, T, U+1]
    lab = jnp.clip(labels[:, None, :], 0, V - 1)
    lp_emit = jnp.take_along_axis(
        lp_tok[:, :, :U, :], lab[..., None].astype(jnp.int32),
        axis=-1)[..., 0]                                 # [B, T, U]

    # Per-sequence frame validity: a prediction conditioned on frame
    # t >= T_b must contribute nothing to any path (paths are read off at
    # (T_b, U_b), and d=0 in-row moves at t = T_b would otherwise leak in).
    t_valid = (jnp.arange(T)[None, :]
               < logit_lengths[:, None]).astype(jnp.float32)  # [B, T]
    frame_mask = jnp.where(t_valid > 0, 0.0, NEG_INF)
    lp_blank = lp_blank + frame_mask[:, :, None]
    lp_emit = lp_emit + frame_mask[:, :, None]

    # Label validity: emitting label u (0-based) requires u < U_b.
    u_ok = (jnp.arange(U)[None, :]
            < label_lengths[:, None]).astype(jnp.float32)     # [B, U]
    lp_emit = lp_emit + jnp.where(u_ok > 0, 0.0, NEG_INF)[:, None, :]

    def vert_scan(base_row, lpe_row, lpd0_row):
        """In-row d=0 token recursion: alpha[u] = logaddexp(base[u],
        alpha[u-1] + emit0[u-1]). base_row [B, U+1]; lpe_row [B, U];
        lpd0_row [B, U+1] (duration-0 log-prob at each node)."""
        e0 = lpe_row + lpd0_row[:, :U]                   # [B, U]

        def step(prev_u, xs_u):
            b_u, e_u = xs_u
            cur = jnp.logaddexp(b_u, prev_u + e_u)
            return cur, cur

        first = base_row[:, 0]
        _, rest = jax.lax.scan(step, first, (base_row[:, 1:].T, e0.T))
        return jnp.concatenate([first[:, None], rest.T], axis=-1)

    # time-major lp rows, padded with one masked row at t = T so the scan
    # over t = 1..T always has an xs row (the pad can never contribute:
    # frame_mask above already kills t >= T_b <= T).
    pad_b = jnp.full((1, B, U1), NEG_INF, jnp.float32)
    pad_e = jnp.full((1, B, U), NEG_INF, jnp.float32)
    pad_d = jnp.zeros((1, B, U1, D), jnp.float32)
    lpb_t = jnp.concatenate([jnp.moveaxis(lp_blank, 1, 0), pad_b], axis=0)
    lpe_t = jnp.concatenate([jnp.moveaxis(lp_emit, 1, 0), pad_e], axis=0)
    lpd_t = jnp.concatenate([jnp.moveaxis(lp_dur, 1, 0), pad_d], axis=0)

    # alpha row 0
    base0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.full((B, U), NEG_INF, jnp.float32)], axis=-1)
    if has_zero:
        alpha0 = vert_scan(base0, lpe_t[0], lpd_t[0][..., dur_index[0]])
    else:
        alpha0 = base0

    # rolling windows over the last m times: index j holds time t - (m - j)
    def roll(win, new_row):
        return jnp.concatenate([win[1:], new_row[None]], axis=0)

    W0 = jnp.concatenate(
        [jnp.full((m - 1, B, U1), NEG_INF, jnp.float32), alpha0[None]],
        axis=0)
    LPB0 = jnp.concatenate(
        [jnp.full((m - 1, B, U1), NEG_INF, jnp.float32), lpb_t[0][None]],
        axis=0)
    LPE0 = jnp.concatenate(
        [jnp.full((m - 1, B, U), NEG_INF, jnp.float32), lpe_t[0][None]],
        axis=0)
    LPD0 = jnp.concatenate(
        [jnp.zeros((m - 1, B, U1, D), jnp.float32), lpd_t[0][None]], axis=0)

    def time_step(carry, xs):
        W, LPB, LPE, LPD = carry
        lpb_now, lpe_now, lpd_now = xs               # rows at time t

        base = jnp.full((B, U1), NEG_INF, jnp.float32)
        for d in pos_durs:
            j = m - d                                 # window slot of t - d
            ld = LPD[j][..., dur_index[d]]            # [B, U+1]
            # blank: (t-d, u) -> (t, u)
            base = jnp.logaddexp(base, W[j] + LPB[j] + ld)
            # token: (t-d, u-1) -> (t, u)
            tok = W[j][:, :U] + LPE[j] + ld[:, :U]    # contributions to u>=1
            base = jnp.logaddexp(
                base,
                jnp.concatenate(
                    [jnp.full((B, 1), NEG_INF, jnp.float32), tok], axis=-1))
        if has_zero:
            alpha_t = vert_scan(base, lpe_now, lpd_now[..., dur_index[0]])
        else:
            alpha_t = base

        carry = (roll(W, alpha_t), roll(LPB, lpb_now),
                 roll(LPE, lpe_now), roll(LPD, lpd_now))
        return carry, alpha_t

    _, alphas = jax.lax.scan(
        time_step, (W0, LPB0, LPE0, LPD0),
        (lpb_t[1:], lpe_t[1:], lpd_t[1:]))
    all_alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T+1,B,U1]

    bidx = jnp.arange(B)
    t_term = jnp.clip(logit_lengths, 0, T)
    u_term = jnp.clip(label_lengths, 0, U)
    return -all_alphas[t_term, bidx, u_term]
