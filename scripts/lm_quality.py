#!/usr/bin/env python3
"""LM shallow fusion quality: true TER of greedy vs beam vs beam+LM on
grammar-constrained tone streams (models/lm.py; the reference has no LM).

Setup: eval streams whose labels follow a sparse Markov grammar
(utils/tones.grammar_transitions) and whose noise floor is RAISED above
the training condition, creating acoustic ambiguity; the acoustic fixture
was trained on uniform labels (no sequence prior), the LM on the grammar
(scripts/train_lm.py). Whatever beam+LM gains over plain beam is the
fusion's contribution.

Two regimes, both measured and recorded:
  --utterances N  per-utterance batch decoding (the classic fusion
                  setting: the LM history resets with each utterance) --
                  this is where shallow fusion earns its keep;
  default         continuous unsegmented streams (--seconds/--streams):
                  past ~15 s the LM conditions on minutes of
                  error-containing history and fusion measured WORSE than
                  plain beam (see docs/lm_quality.json) -- the honest
                  negative; segment with endpointing (docs/SERVING.md)
                  before fusing on long streams.

Usage: lm_quality.py [asr.gguf] [lm.gguf] [--beam K] [--lm-weight W]
                     [--lm-bonus B] [--noise X] [--utterances N]
                     [--utt-tones U] [--seconds S] [--streams N]
                     [--seeds M] [--modes 0,13] [--tones T] [--branch B]
                     [--grammar-seed 17] [--json out.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from beam_quality import levenshtein  # noqa: E402  (same-dir harness util)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gguf", nargs="?",
                    default=REPO + "/weights/tones_tiny.gguf")
    ap.add_argument("lm_gguf", nargs="?",
                    default=REPO + "/weights/tones_tiny_lm.gguf")
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--lm-weight", type=float, default=0.5)
    ap.add_argument("--lm-bonus", type=float, default=None,
                    help="per-label insertion bonus; default "
                         "lm_weight*log(branch) (zero-means the LM tax "
                         "on in-grammar labels)")
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--utterances", type=int, default=0,
                    help="per-utterance batch mode: decode N independent "
                         "grammar utterances instead of continuous streams")
    ap.add_argument("--utt-tones", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--modes", default="0,13")
    ap.add_argument("--tones", type=int, default=16)
    ap.add_argument("--branch", type=int, default=3)
    ap.add_argument("--grammar-seed", type=int, default=17)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("JAX_PLATFORMS") != "cpu" and not args.cpu:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models.lm import load_lm
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, vocab = load_model(args.gguf, keep_quantized=False)
    lm = load_lm(args.lm_gguf)
    if args.lm_bonus is None:
        args.lm_bonus = args.lm_weight * float(np.log(args.branch))
    trans = tones_mod.grammar_transitions(args.tones, args.branch,
                                          args.grammar_seed)
    sampler = lambda rng, n: tones_mod.markov_labels(rng, n, trans)

    configs = [("greedy", 1, None, False),
               (f"beam{args.beam}", args.beam, None, False),
               (f"beam{args.beam}+lm", args.beam, lm, False)]
    if args.utterances:
        # second-pass n-best rescoring (models/lm.py rescore_nbest) is a
        # batch-decode capability; streaming sessions fuse in-search only
        configs.append((f"beam{args.beam}+rescore", args.beam, lm, True))
    results = {}
    if args.utterances:
        from nemotron_tpu.streaming.session import transcribe_batch
        from nemotron_tpu.utils.tones import GAP_RANGE, render_tones

        for seed in range(args.seeds):
            rng = np.random.default_rng(3000 + seed)
            utts, truths = [], []
            for _ in range(args.utterances):
                labs = tones_mod.markov_labels(rng, args.utt_tones, trans)
                durs = rng.uniform(0.20, 0.32, args.utt_tones)
                gaps = rng.uniform(*GAP_RANGE, args.utt_tones)
                n = int((durs + gaps).sum() * 16000) + 3200
                utts.append(render_tones(labs, durs, rng, args.tones, n,
                                         noise=args.noise, gaps=gaps))
                truths.append([int(x) for x in labs])
            row = {}
            for name, k, use_lm, rescore in configs:
                kw = dict(beam_size=k) if k > 1 else {}
                if use_lm is not None:
                    kw.update(lm=use_lm, lm_weight=args.lm_weight,
                              lm_bonus=args.lm_bonus, lm_rescore=rescore)
                texts = transcribe_batch(params, cfg, vocab, utts, **kw)
                got = [[int(w[1:]) for w in t.split()
                        if w[1:].isdigit()] for t in texts]
                total = sum(len(t) for t in truths)
                dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
                row[name] = round(dist / max(total, 1), 4)
            results[f"utt/seed{seed}"] = row
            print(f"utterances seed={seed} noise={args.noise}: " + "  ".join(
                f"{n} TER {v*100:.2f}%" for n, v in row.items()),
                file=sys.stderr)
    for mode in ([] if args.utterances else
                 [int(m) for m in args.modes.split(",")]):
        cc = CacheConfig(att_right_context=mode, n_mels=cfg.n_mels)
        for seed in range(args.seeds):
            audio, truths = tones_mod.make_eval_streams(
                args.streams, args.seconds, args.tones, seed=2000 + seed,
                noise=args.noise, label_sampler=sampler)
            row = {}
            for name, k, use_lm, _rescore in configs:
                sess = StreamSession(params, cfg, None, cc,
                                     n_streams=audio.shape[0],
                                     compute_dtype=jnp.float32,
                                     beam_size=k, lm=use_lm,
                                     lm_weight=args.lm_weight,
                                     lm_bonus=(args.lm_bonus
                                               if use_lm is not None
                                               else 0.0))
                sess.process(audio)
                sess.finalize()
                got = [[t for t, *_ in sess.get_tokens(s)]
                       for s in range(audio.shape[0])]
                total = sum(len(t) for t in truths)
                dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
                row[name] = round(dist / max(total, 1), 4)
            results[f"R{mode}/seed{seed}"] = row
            print(f"R={mode} seed={seed} noise={args.noise}: " + "  ".join(
                f"{n} TER {v*100:.2f}%" for n, v in row.items()),
                file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"config": {"noise": args.noise, "beam": args.beam,
                                  "lm_weight": args.lm_weight,
                                  "lm_bonus": round(args.lm_bonus, 4),
                                  "branch": args.branch,
                                  "seconds": args.seconds,
                                  "streams": args.streams},
                       "results": results}, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
