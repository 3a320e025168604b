"""Training step for the transducer model (NEW capability -- the reference
engine is inference-only, SURVEY.md §5).

Pieces: full-lattice joint logits (batch encoder + prediction network over
label prefixes), RNN-T loss (losses/rnnt.py), and an optax-based jitted
train step that shards over the same (data, model) mesh as serving
(parallel/mesh.py) -- batch and activations over 'data', FFN/head-sharded
params over 'model', with GSPMD inserting the gradient all-reduces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .losses.rnnt import rnnt_loss
from .models.decoder import joint_project_enc
from .models.encoder import encode_batch
from .ops.lstm import lstm_step
from .params import ModelParams


def prediction_network(params: ModelParams, cfg: ModelConfig, labels,
                       history=None):
    """Run the LSTM prediction network over label prefixes.

    labels: [B, U] int32. Returns dec_out [B, U+1, H] where row u is the
    network's output after consuming labels[:u] (row 0 = start state fed
    the blank token, matching greedy decode's init).

    history [B, R] int32 (optional): WARM-UP labels consumed before the
    utterance -- the returned rows condition on [blank, history, :u].
    Why: a streaming decoder's LSTM state arrives mid-stream with an
    arbitrary emission count, but vanilla teacher forcing always starts
    from count 0, so the prediction network can learn the absolute token
    count as a feature ("after U_max tokens, always blank") -- measured on
    the tones task as PERFECT transcription for the first U_max tokens of
    a continuous stream, then total silence. Varying R across steps makes
    the count uninformative over the whole serving range. R is static
    per call (one compiled program per distinct R)."""
    B, U = labels.shape
    dp = params.decoder
    start = jnp.full((B, 1), cfg.blank_token, jnp.int32)
    parts = [start]
    R = 0
    if history is not None and history.shape[1]:
        R = history.shape[1]
        parts.append(history.astype(jnp.int32))
    parts.append(labels.astype(jnp.int32))
    tokens = jnp.concatenate(parts, axis=1)                 # [B, 1+R+U]
    emb = jnp.asarray(dp.embedding)[tokens]

    h = jnp.zeros((B, cfg.decoder_layers, cfg.decoder_dim), emb.dtype)
    c = jnp.zeros_like(h)

    def step(carry, x_u):
        h, c = carry
        out, h, c = lstm_step(dp, x_u, h, c)
        return (h, c), out

    _, outs = jax.lax.scan(step, (h, c), jnp.swapaxes(emb, 0, 1))
    outs = jnp.swapaxes(outs, 0, 1)                         # [B, 1+R+U, H]
    # row R = state after [blank, history] = conditioning for label 0
    return outs[:, R:, :]                                   # [B, U+1, H]


def transducer_logits(params: ModelParams, cfg: ModelConfig, mel, labels,
                      remat: bool = False, enc_lengths=None,
                      att_chunk: int | None = None, history=None):
    """Full-lattice joint logits [B, T, U+1, V] for training.

    enc_lengths [B] (encoder frames): masks attention beyond each
    utterance's valid length so padded frames cannot contaminate real ones
    (batch-mode attention is bidirectional; without the mask, loss and
    gradients silently depend on how much padding the batch carries).

    att_chunk: streaming-equivalent chunked attention (encoder frames) --
    train with the visibility pattern the cache-aware streaming step will
    give at inference (see encode_batch); pass cc.chunk_enc_len."""
    enc = encode_batch(params, cfg, mel, remat=remat,
                       enc_lengths=enc_lengths,
                       att_chunk=att_chunk)                  # [B, T, D]
    return transducer_logits_from_enc(params, cfg, enc, labels,
                                      history=history)


def transducer_logits_from_enc(params: ModelParams, cfg: ModelConfig, enc,
                               labels, history=None):
    """Joint lattice logits from precomputed encoder outputs (shared with
    the hybrid CTC loss so the encoder runs once)."""
    dec = prediction_network(params, cfg, labels,
                             history=history)               # [B, U+1, H]
    jp = params.joint
    enc_p = joint_project_enc(jp, enc)                      # [B, T, J]
    dec_p = dec @ jp.dec_w.astype(dec.dtype) + jp.dec_b.astype(dec.dtype)
    h = jax.nn.relu(enc_p[:, :, None, :] + dec_p[:, None, :, :])
    return jax.lax.dot_general(
        h, jp.out_w.astype(h.dtype),
        dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + jp.out_b.astype(jnp.float32)


def loss_fn(params: ModelParams, cfg: ModelConfig, batch,
            remat: bool = False, att_chunk: int | None = None,
            delay_penalty: float = 0.0, ctc_weight: float = 0.0,
            tdt_sigma: float = 0.05):
    """Mean transducer loss over a batch dict with keys
    mel [B, Tm, n_mels], labels [B, U], mel_lengths [B] (in encoder
    frames), label_lengths [B], and optionally history [B, R] decoder
    warm-up labels (see prediction_network: breaks the absolute-count
    shortcut so the model keeps transcribing on unbounded streams).
    delay_penalty: see losses/rnnt.py.

    TDT checkpoints (cfg.tdt_durations set) train with the duration-aware
    lattice (losses/tdt.py, under-normalization tdt_sigma) instead of the
    RNN-T loss; the objective already pulls alignments toward confident
    long jumps, so delay_penalty does not apply.

    ctc_weight > 0 (requires params.ctc, the hybrid auxiliary head):
    total = rnnt + w * ctc, NeMo's hybrid RNNT-CTC training objective --
    the encoder runs ONCE and feeds both lattices."""
    enc = encode_batch(params, cfg, batch["mel"], remat=remat,
                       enc_lengths=batch["mel_lengths"],
                       att_chunk=att_chunk)
    logits = transducer_logits_from_enc(params, cfg, enc, batch["labels"],
                                        history=batch.get("history"))
    if cfg.tdt_durations:
        if delay_penalty:
            raise ValueError("delay_penalty applies to the RNN-T lattice "
                             "only (TDT trains duration-aware)")
        from .losses.tdt import tdt_loss

        losses = tdt_loss(logits, batch["labels"], batch["mel_lengths"],
                          batch["label_lengths"], cfg.tdt_durations,
                          blank=cfg.blank_token, sigma=tdt_sigma)
    else:
        losses = rnnt_loss(logits, batch["labels"], batch["mel_lengths"],
                           batch["label_lengths"], blank=cfg.blank_token,
                           delay_penalty=delay_penalty)
    total = jnp.mean(losses)
    if ctc_weight > 0.0:
        import optax

        from .models.ctc import ctc_logits

        cl = ctc_logits(params, enc)                         # [B, T, V] f32
        T = cl.shape[1]
        t_idx = jnp.arange(T)[None, :]
        logit_pad = (t_idx >= batch["mel_lengths"][:, None]).astype(
            jnp.float32)
        U = batch["labels"].shape[1]
        label_pad = (jnp.arange(U)[None, :]
                     >= batch["label_lengths"][:, None]).astype(jnp.float32)
        ctc = optax.ctc_loss(cl, logit_pad, batch["labels"], label_pad,
                             blank_id=cfg.blank_token)
        total = total + ctc_weight * jnp.mean(ctc)
    return total


def save_train_state(path: str, params, opt_state, step: int = 0) -> None:
    """Checkpoint params + optimizer state + step counter to one .npz
    (flat leaf list; resume requires the same optimizer/model structure --
    asserted on load)."""
    import numpy as np

    from .utils.npz import npz_encode

    leaves, treedef = jax.tree_util.tree_flatten((params, opt_state))
    flat = {f"leaf_{i}": npz_encode(x) for i, x in enumerate(leaves)}
    flat["__step"] = np.int64(step)
    flat["__treedef"] = np.asarray(str(treedef))
    np.savez(path, **flat)


def load_train_state(path: str, params_like, opt_state_like):
    """Restore (params, opt_state, step) saved by save_train_state into the
    structure of the given templates."""
    import numpy as np

    from .utils.npz import npz_decode

    z = np.load(path, allow_pickle=True)
    leaves_like, treedef = jax.tree_util.tree_flatten(
        (params_like, opt_state_like))
    assert str(treedef) == str(z["__treedef"]), (
        "checkpoint structure does not match the model/optimizer")
    # cast to the template leaf's dtype: bf16 leaves were upcast-encoded
    leaves = [jnp.asarray(npz_decode(z[f"leaf_{i}"]),
                          jnp.asarray(leaves_like[i]).dtype)
              for i in range(len(leaves_like))]
    params, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, int(z["__step"])


def make_train_step(cfg: ModelConfig, optimizer, remat: bool = False,
                    att_chunk: int | None = None,
                    delay_penalty: float = 0.0,
                    ctc_weight: float = 0.0,
                    tdt_sigma: float = 0.05):
    """Returns jitted (params, opt_state, batch) -> (params', opt_state',
    loss). Differentiates through the full encoder/prediction/joint; works
    under a mesh via sharded inputs (GSPMD handles the collectives).
    remat=True checkpoints conformer layers (O(1) activation memory);
    att_chunk trains with streaming-equivalent chunked attention;
    delay_penalty regularizes for early/sharp streaming emission."""

    import optax

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch, remat=remat,
                              att_chunk=att_chunk,
                              delay_penalty=delay_penalty,
                              ctc_weight=ctc_weight,
                              tdt_sigma=tdt_sigma))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
