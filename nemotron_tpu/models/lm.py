"""External label language model for shallow-fusion beam decoding.

A capability beyond the reference (greedy-only, no LM anywhere): an
LSTM LM over the SentencePiece label vocabulary whose log-probabilities
are added to the transducer's label scores during beam expansion,

    score(y != blank) = log P_rnnt(y) + lm_weight * log P_lm(y | history)
    score(blank)      = log P_rnnt(blank)            (never LM-scored)

the standard shallow-fusion rule for transducers (blank is a lattice
artifact, not a language event, so the LM distribution is renormalized
over real labels only). The LM state advances exactly like the
prediction network's: on non-blank emissions (reference RNN-T invariant,
src/nemo-ggml.cpp:1234-1245).

Architecture mirrors the prediction network (Embedding + n-layer LSTM +
output projection), so `ops/lstm.py`'s batched step is reused verbatim —
LMParams duck-types DecoderParams' LSTM fields. The LM ships as its own
small GGUF artifact (`lm.*` tensors, `nemo-lm` architecture) so one LM
can serve any acoustic checkpoint over the same vocabulary.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..params import _linear, _pytree_dataclass
from ..ops.lstm import lstm_step

NEG_INF = jnp.float32(-1e30)


@_pytree_dataclass
class LMParams:
    """Embedding + stacked LSTM + output head. embed_dim == hidden (the
    prediction-network convention) so layers stack into one [L, H, 4H]."""

    embedding: Any   # [V, H]
    w_ih: Any        # [L, H, 4H]  gate order [i, f, g, o]
    w_hh: Any        # [L, H, 4H]
    b_ih: Any        # [L, 4H]
    b_hh: Any        # [L, 4H]
    out_w: Any       # [H, V]
    out_b: Any       # [V]


def init_lm_state(lm: LMParams, batch_shape: tuple[int, ...],
                  dtype=jnp.float32):
    """Zero (h, c), each [*batch_shape, L, H]."""
    L, H = lm.w_hh.shape[0], lm.w_hh.shape[1]
    shape = tuple(batch_shape) + (L, H)
    # two distinct buffers: h and c flow through donating jits (an aliased
    # pair trips XLA's double-donation check)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def lm_logp(lm: LMParams, prev_token, h, c, blank: int):
    """One LM step: label log-probs given the history.

    prev_token [B] int32 (blank = start-of-sequence: its embedding row is
    the <bos> the prediction network also uses); h, c [B, L, H].
    Returns (logp [B, V] f32 with logp[blank] = -inf — the distribution is
    renormalized over real labels — , h', c')."""
    dt = h.dtype
    emb = jnp.asarray(lm.embedding, dt)[prev_token]
    out, h2, c2 = lstm_step(lm, emb, h, c)
    logits = (out @ jnp.asarray(lm.out_w, dt)
              + jnp.asarray(lm.out_b, dt)).astype(jnp.float32)
    logits = logits.at[..., blank].set(NEG_INF)
    return jax.nn.log_softmax(logits, axis=-1), h2, c2


def lm_sequence_nll(lm: LMParams, labels, lengths, blank: int,
                    inputs=None):
    """Mean next-label negative log-likelihood over a batch of sequences
    (the LM training objective, scripts/train_lm.py).

    labels [B, U] int32 (positions >= lengths are ignored); the input at
    step 0 is blank (<bos>, the prediction-network convention) and at
    step t>0 the previous label — teacher forcing with exactly the
    distribution lm_logp serves at decode time (blank renormalized out).
    `inputs` [B, U] (optional) overrides the teacher-forced history —
    pass a CORRUPTED copy of the shifted labels to train the LM to stay
    calibrated on the error-containing hypotheses it conditions on
    during beam fusion (scripts/train_lm.py --input-noise).
    Differentiable; runs as one lax.scan over U."""
    B, U = labels.shape
    h, c = init_lm_state(lm, (B,), jnp.float32)
    if inputs is None:
        inputs = jnp.concatenate(
            [jnp.full((B, 1), blank, labels.dtype), labels[:, :-1]],
            axis=1)

    def step(carry, xs):
        h, c = carry
        inp, tgt, t = xs
        logp, h, c = lm_logp(lm, inp, h, c, blank)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        valid = (t < lengths).astype(jnp.float32)
        return (h, c), (nll * valid, valid)

    ts = jnp.arange(U, dtype=jnp.int32)
    (_, _), (nlls, valids) = jax.lax.scan(
        step, (h, c), (inputs.T, labels.T, ts))
    return jnp.sum(nlls) / jnp.maximum(jnp.sum(valids), 1.0)


def lm_sequence_logp(lm: LMParams, labels, lengths, blank: int):
    """Total label log-likelihood per sequence, [B] f32.

    Teacher-forced over labels [B, U] int32 (positions >= lengths are
    ignored; step-0 input is blank = <bos>), scoring with exactly the
    distribution shallow fusion serves at decode time (lm_logp: blank
    renormalized out). This is the second-pass rescoring score —
    rescore_nbest combines it with the transducer's raw hypothesis
    scores. One lax.scan over U; B folds every (stream, hypothesis)
    pair so a whole n-best list scores in one program."""
    B, U = labels.shape
    h, c = init_lm_state(lm, (B,), jnp.float32)
    inputs = jnp.concatenate(
        [jnp.full((B, 1), blank, labels.dtype), labels[:, :-1]], axis=1)

    def step(carry, xs):
        h, c = carry
        inp, tgt, t = xs
        logp, h, c = lm_logp(lm, inp, h, c, blank)
        lp = jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        # where, not multiply: padded targets are blank, whose logp is
        # -inf, and -inf * 0 would poison the sum with NaN
        return (h, c), jnp.where(t < lengths, lp, 0.0)

    ts = jnp.arange(U, dtype=jnp.int32)
    (_, _), lps = jax.lax.scan(step, (h, c), (inputs.T, labels.T, ts))
    return jnp.sum(lps, axis=0)


def rescore_nbest(lm: LMParams, tokens, lengths, scores, blank: int,
                  lm_weight: float, lm_bonus: float = 0.0,
                  length_norm: bool = True):
    """Second-pass LM rescoring of a beam n-best list (models/beam.py
    n_best output): rerank the N hypotheses of each stream by

        combined = raw_transducer_score
                   + lm_weight * lm_sequence_logp + lm_bonus * length

    Returns (order [B, N] int32, best first by the — optionally
    length-normalized — combined score; combined [B, N] f32 raw).

    vs shallow fusion (lm= in beam_decode): fusion steers the SEARCH
    (candidates the acoustic model alone would prune survive) but pays
    the LM on the conditioning hypothesis every step; rescoring only
    reranks what the acoustic beam already found — weaker when the truth
    fell out of the beam, immune to in-search LM noise, and one LM pass
    per utterance instead of one per expansion. Both are gated in
    scripts/lm_quality.py. The reference has no LM anywhere."""
    B, N, U = tokens.shape
    lm_lp = lm_sequence_logp(
        lm, tokens.reshape(B * N, U),
        lengths.reshape(B * N).astype(jnp.int32), blank).reshape(B, N)
    lengths_f = lengths.astype(jnp.float32)
    combined = (scores.astype(jnp.float32)
                + jnp.float32(lm_weight) * lm_lp
                + jnp.float32(lm_bonus) * lengths_f)
    sel = combined / jnp.maximum(lengths_f, 1.0) if length_norm else combined
    order = jnp.argsort(-sel, axis=1).astype(jnp.int32)
    return order, combined


# ---------------------------------------------------------------------------
# GGUF artifact (standalone; `nemo-lm` architecture)
# ---------------------------------------------------------------------------

def random_lm_arrays(vocab_size: int, hidden: int = 32, n_layers: int = 1,
                     seed: int = 0, scale: float = 0.3
                     ) -> dict[str, np.ndarray]:
    """Raw LM weights in PyTorch naming/shape convention (the on-disk
    layout; `lm_params_from_arrays` transposes for row-vector matmuls)."""
    rng = np.random.default_rng(seed)
    w = lambda *s: (rng.standard_normal(s) * scale).astype(np.float32)
    t = {"lm.embedding.weight": w(vocab_size, hidden),
         "lm.output.weight": w(vocab_size, hidden),
         "lm.output.bias": w(vocab_size)}
    for i in range(n_layers):
        t[f"lm.lstm.weight_ih_l{i}"] = w(4 * hidden, hidden)
        t[f"lm.lstm.weight_hh_l{i}"] = w(4 * hidden, hidden)
        t[f"lm.lstm.bias_ih_l{i}"] = w(4 * hidden)
        t[f"lm.lstm.bias_hh_l{i}"] = w(4 * hidden)
    return t


def lm_params_from_arrays(t: dict[str, np.ndarray]) -> LMParams:
    n_layers = sum(1 for k in t if k.startswith("lm.lstm.weight_ih_l"))
    ls = range(n_layers)
    return LMParams(
        embedding=t["lm.embedding.weight"],
        w_ih=np.stack([_linear(t[f"lm.lstm.weight_ih_l{i}"]) for i in ls]),
        w_hh=np.stack([_linear(t[f"lm.lstm.weight_hh_l{i}"]) for i in ls]),
        b_ih=np.stack([t[f"lm.lstm.bias_ih_l{i}"] for i in ls]),
        b_hh=np.stack([t[f"lm.lstm.bias_hh_l{i}"] for i in ls]),
        out_w=_linear(t["lm.output.weight"]),
        out_b=t["lm.output.bias"],
    )


def lm_arrays_from_params(lm: LMParams) -> dict[str, np.ndarray]:
    """Inverse of lm_params_from_arrays (for saving trained LMs)."""
    t = {"lm.embedding.weight": np.asarray(lm.embedding, np.float32),
         "lm.output.weight": np.ascontiguousarray(
             np.asarray(lm.out_w, np.float32).T),
         "lm.output.bias": np.asarray(lm.out_b, np.float32)}
    for i in range(np.asarray(lm.w_ih).shape[0]):
        t[f"lm.lstm.weight_ih_l{i}"] = np.ascontiguousarray(
            np.asarray(lm.w_ih, np.float32)[i].T)
        t[f"lm.lstm.weight_hh_l{i}"] = np.ascontiguousarray(
            np.asarray(lm.w_hh, np.float32)[i].T)
        t[f"lm.lstm.bias_ih_l{i}"] = np.asarray(lm.b_ih, np.float32)[i]
        t[f"lm.lstm.bias_hh_l{i}"] = np.asarray(lm.b_hh, np.float32)[i]
    return t


def save_lm(path: str, arrays: dict[str, np.ndarray]) -> None:
    from .. import gguf

    hidden = arrays["lm.embedding.weight"].shape[1]
    n_layers = sum(1 for k in arrays
                   if k.startswith("lm.lstm.weight_ih_l"))
    meta = {"general.architecture": "nemo-lm",
            "lm.vocab_size": arrays["lm.embedding.weight"].shape[0],
            "lm.hidden": hidden, "lm.n_layers": n_layers}
    gguf.write_gguf(path, meta, arrays)


def load_lm(path: str) -> LMParams:
    from .. import gguf

    g = gguf.read_gguf(path)
    arch = g.metadata.get("general.architecture")
    if isinstance(arch, bytes):
        arch = arch.decode()
    if arch != "nemo-lm":
        raise ValueError(f"{path}: not an LM GGUF "
                         f"(architecture={arch!r}, want 'nemo-lm')")
    return lm_params_from_arrays(
        {k: v.to_numpy() for k, v in g.tensors.items()})
