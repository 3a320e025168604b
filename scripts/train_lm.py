#!/usr/bin/env python3
"""Train the shallow-fusion LSTM label LM (models/lm.py) on a Markov
tone grammar — the structured label source for LM-fusion accuracy
evidence (scripts/lm_quality.py).

The grammar (utils/tones.grammar_transitions): each of the T tone labels
has `branch` fixed legal successors, so its per-token entropy is
log(branch) nats — the LM's training floor. The acoustic fixtures were
trained on UNIFORM labels, so any decode-time gain from this LM is
attributable to shallow fusion, not the acoustic model.

Usage:
  train_lm.py [asr.gguf] [--tones 16] [--branch 3] [--grammar-seed 17]
              [--steps 600] [--batch 64] [--seq-len 40] [--hidden 48]
              [--layers 1] [--lr 3e-3] [--save lm.gguf] [--cpu]

The asr.gguf argument only supplies vocab_size/blank (the LM must score
the acoustic model's label space); it is not trained.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gguf", nargs="?",
                    default=REPO + "/weights/tones_tiny.gguf")
    ap.add_argument("--tones", type=int, default=16)
    ap.add_argument("--branch", type=int, default=3)
    ap.add_argument("--grammar-seed", type=int, default=17)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--input-noise", type=float, default=0.15,
                    help="fraction of TEACHER-FORCED input labels replaced "
                         "by random ones (targets unchanged). At decode "
                         "time the LM conditions on the BEAM's hypothesis, "
                         "which contains recognition errors; an LM trained "
                         "only on clean histories mis-scores every token "
                         "after an error (the grammar makes the true "
                         "successor look illegal), compounding instead of "
                         "correcting. Noisy histories keep it calibrated.")
    ap.add_argument("--hidden", type=int, default=48)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from nemotron_tpu.models import lm as lm_mod
    from nemotron_tpu.params import load_model
    from nemotron_tpu.utils.tones import grammar_transitions, markov_labels

    _params, cfg, _vocab = load_model(args.gguf, keep_quantized=False)
    blank = cfg.blank_token
    trans = grammar_transitions(args.tones, args.branch, args.grammar_seed)
    print(f"grammar: {args.tones} tones, branch {args.branch} "
          f"(entropy floor {np.log(args.branch):.3f} nats/token); "
          f"LM vocab {cfg.vocab_size}, blank {blank}", file=sys.stderr)

    lm = jax.tree_util.tree_map(
        jnp.asarray,
        lm_mod.lm_params_from_arrays(lm_mod.random_lm_arrays(
            cfg.vocab_size, hidden=args.hidden, n_layers=args.layers,
            seed=args.seed, scale=0.08)))
    opt = optax.adam(args.lr)
    opt_state = opt.init(lm)

    @jax.jit
    def train_step(lm, opt_state, labels, lengths, inputs):
        loss, grads = jax.value_and_grad(lm_mod.lm_sequence_nll)(
            lm, labels, lengths, blank, inputs)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(lm, updates), opt_state, loss

    def batch(rng, input_noise):
        labs = np.stack([markov_labels(rng, args.seq_len, trans)
                         for _ in range(args.batch)]).astype(np.int32)
        lens = np.full(args.batch, args.seq_len, np.int32)
        inputs = np.concatenate(
            [np.full((args.batch, 1), blank, np.int32), labs[:, :-1]],
            axis=1)
        if input_noise > 0:
            flip = rng.random(inputs.shape) < input_noise
            flip[:, 0] = False   # keep <bos>
            inputs = np.where(
                flip, rng.integers(0, args.tones, inputs.shape), inputs
            ).astype(np.int32)
        return jnp.asarray(labs), jnp.asarray(lens), jnp.asarray(inputs)

    rng = np.random.default_rng(args.seed)
    for step in range(args.steps):
        labels, lengths, inputs = batch(rng, args.input_noise)
        lm, opt_state, loss = train_step(lm, opt_state, labels, lengths,
                                         inputs)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: nll {float(loss):.4f}", file=sys.stderr)

    # held-out eval: fresh grammar sequences, plus the uniform baseline
    eval_rng = np.random.default_rng(args.seed + 999)
    labels, lengths, _ = batch(eval_rng, 0.0)
    nll = float(lm_mod.lm_sequence_nll(lm, labels, lengths, blank))
    uniform = float(np.log(args.tones))
    floor = float(np.log(args.branch))
    print(f"held-out nll {nll:.4f} nats/token "
          f"(uniform {uniform:.3f}, grammar floor ~{floor:.3f})",
          file=sys.stderr)
    if args.save:
        lm_mod.save_lm(args.save, lm_mod.lm_arrays_from_params(lm))
        print(f"saved {args.save}", file=sys.stderr)
    print({"heldout_nll": round(nll, 4), "uniform_nll": round(uniform, 4),
           "floor_nll": round(floor, 4)})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
