#!/usr/bin/env python3
"""LM shallow fusion quality: true TER of greedy vs beam vs beam+LM on
grammar-constrained tone streams (models/lm.py; the reference has no LM).

Setup: eval streams whose labels follow a sparse Markov grammar
(utils/tones.grammar_transitions) and whose noise floor is RAISED above
the training condition, creating acoustic ambiguity; the acoustic fixture
was trained on uniform labels (no sequence prior), the LM on the grammar
(scripts/train_lm.py). Whatever beam+LM gains over plain beam is the
fusion's contribution.

Usage: lm_quality.py [asr.gguf] [lm.gguf] [--beam K] [--lm-weight W]
                     [--noise X] [--seconds S] [--streams N] [--seeds M]
                     [--modes 0,13] [--tones T] [--branch B]
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

    params, cfg, _ = load_model(args.gguf, keep_quantized=False)
    lm = load_lm(args.lm_gguf)
    if args.lm_bonus is None:
        args.lm_bonus = args.lm_weight * float(np.log(args.branch))
    trans = tones_mod.grammar_transitions(args.tones, args.branch,
                                          args.grammar_seed)
    sampler = lambda rng, n: tones_mod.markov_labels(rng, n, trans)

    configs = [("greedy", 1, None), (f"beam{args.beam}", args.beam, None),
               (f"beam{args.beam}+lm", args.beam, lm)]
    results = {}
    for mode in (int(m) for m in args.modes.split(",")):
        cc = CacheConfig(att_right_context=mode, n_mels=cfg.n_mels)
        for seed in range(args.seeds):
            audio, truths = tones_mod.make_eval_streams(
                args.streams, args.seconds, args.tones, seed=2000 + seed,
                noise=args.noise, label_sampler=sampler)
            row = {}
            for name, k, use_lm in configs:
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
