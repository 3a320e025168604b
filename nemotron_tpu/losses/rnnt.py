"""RNN-T (transducer) loss: the forward-variable recursion on the (T, U)
lattice, jit/grad-friendly.

The reference engine is inference-only (SURVEY.md §5: "No training");
this module is NEW capability so the framework can also fine-tune/train the
models it serves. Formulation follows Graves 2012 ("Sequence Transduction
with RNNs"): for each (t, u) lattice node,

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + emit[t, u-1])
    loss = -(alpha[T-1, U] + blank[T-1, U])

TPU shape: `lax.scan` over the time axis carrying one alpha row [B, U+1];
the in-row emit recursion is an inner scan over U (labels are short for
streaming-chunk training). All padding handled by masking with -inf and
gathering the per-sequence terminal node.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def rnnt_loss(logits, labels, logit_lengths, label_lengths,
              blank: int | None = None, delay_penalty: float = 0.0):
    """Negative log-likelihood of the RNN-T lattice, per sequence.

    logits: [B, T, U+1, V] joint outputs (unnormalized).
    labels: [B, U] int32 (padded with anything past label_lengths).
    logit_lengths: [B] valid encoder frames (<= T).
    label_lengths: [B] valid labels (<= U).
    blank: blank token id (default V-1, this model's convention).
    delay_penalty: lambda > 0 subtracts lambda*t from every label-emission
        transition inside the lattice DP (the k2 "delay-penalized
        transducer", near-equivalent to FastEmit): alignment mass is pushed
        toward the earliest feasible frames, which both cuts streaming
        emission latency and sharpens greedy decode (a diffusely-aligned
        model scores blank above every label pointwise and emits nothing).
        Training-only knob; the returned value is the PENALIZED objective,
        so report an unpenalized eval loss separately if needed.

    Returns loss [B] (mean over batch is the training objective).
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    if blank is None:
        blank = V - 1

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # blank transition log-probs at every node: [B, T, U+1]
    lp_blank = logp[..., blank]
    # emit transition at (t, u) consumes labels[u]: [B, T, U]
    lab = jnp.clip(labels[:, None, :], 0, V - 1)
    lp_emit = jnp.take_along_axis(
        logp[:, :, :U, :], lab[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if delay_penalty:
        lp_emit = lp_emit - (
            jnp.float32(delay_penalty)
            * jnp.arange(T, dtype=jnp.float32)[None, :, None])

    u_idx = jnp.arange(U1)
    valid_u = u_idx[None, :] <= label_lengths[:, None]       # [B, U+1]

    # alpha row at t=0: alpha[0,0]=0; alpha[0,u]=sum emits along u
    emit0 = jnp.where(u_idx[None, 1:] <= label_lengths[:, None],
                      lp_emit[:, 0, :], NEG_INF)
    alpha0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.cumsum(emit0, axis=-1)], axis=-1)
    alpha0 = jnp.where(valid_u, alpha0, NEG_INF)

    def time_step(alpha, xs):
        lpb_prev, lpe_t = xs        # blank probs at t-1 [B,U+1], emits at t [B,U]

        # horizontal (blank) move from the previous time row
        from_blank = alpha + lpb_prev                        # [B, U+1]

        # vertical (emit) moves within row t: prefix recursion over u
        def emit_step(prev_u, xs_u):
            fb_u, lpe_u, ok = xs_u                           # [B] each
            cur = jnp.logaddexp(fb_u, prev_u + lpe_u)
            cur = jnp.where(ok, cur, NEG_INF)
            return cur, cur

        first = from_blank[:, 0]
        _, rest = jax.lax.scan(
            emit_step, first,
            (from_blank[:, 1:].T, lpe_t.T, valid_u[:, 1:].T))
        alpha_t = jnp.concatenate([first[:, None], rest.T], axis=-1)
        return alpha_t, alpha_t

    # xs over t = 1..T-1
    _, alphas = jax.lax.scan(
        time_step, alpha0,
        (jnp.moveaxis(lp_blank, 1, 0)[:-1], jnp.moveaxis(lp_emit, 1, 0)[1:]))
    all_alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, U+1]

    # terminal: alpha[T_b - 1, U_b] + blank(T_b - 1, U_b)
    bidx = jnp.arange(B)
    t_last = jnp.clip(logit_lengths - 1, 0, T - 1)
    u_last = jnp.clip(label_lengths, 0, U)
    alpha_term = all_alphas[t_last, bidx, u_last]
    lp_term = lp_blank[bidx, t_last, u_last]
    return -(alpha_term + lp_term)
