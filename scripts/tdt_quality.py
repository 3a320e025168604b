#!/usr/bin/env python3
"""TDT-vs-RNNT quality and decode-work comparison on the tones task.

    tdt_quality.py [tdt.gguf] [--rnnt rnnt.gguf] [--seconds 60]
                   [--streams 4] [--seeds 2] [--tones 16] [--json F] [--cpu]

Evaluates a trained TDT fixture against the trained RNN-T fixture on the
same continuous eval streams: token error rate vs the tone truth, plus the
number of sequential decode iterations each label search needed (the
while_loop trip count, `with_iters`) -- the TDT family's selling point is
that duration jumps skip frames, cutting sequential decode work. The two
models are separately trained (the joint differs structurally), so this is
a family comparison on a shared task, not a same-encoder ablation like
scripts/hybrid_quality.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def lev(a, b):
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gguf", nargs="?",
                    default=os.path.join(REPO, "weights",
                                         "tones_tiny_tdt.gguf"))
    ap.add_argument("--rnnt",
                    default=os.path.join(REPO, "weights", "tones_tiny.gguf"))
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--tones", type=int, default=16)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nemotron_tpu.config import PreprocessorConfig
    from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.models.tdt import tdt_greedy_decode
    from nemotron_tpu.params import load_model
    from nemotron_tpu.utils import tones as tones_mod

    models = {}
    for name, path in (("tdt", args.gguf), ("rnnt", args.rnnt)):
        params, cfg, vocab = load_model(path, keep_quantized=False)
        if name == "tdt" and not cfg.tdt_durations:
            print(f"error: {path} has no nemo.tdt_durations metadata",
                  file=sys.stderr)
            return 1
        models[name] = (params, cfg, vocab)

    def label_of(vocab, tok_id: int) -> int:
        try:
            return int(vocab[tok_id].replace("▁T", ""))
        except ValueError:
            return -1

    stats = {n: [0, 0, 0, 0] for n in models}  # edits, truth, iters, frames
    for seed in range(args.seeds):
        audio, truths = tones_mod.make_eval_streams(
            args.streams, args.seconds, args.tones, seed=100 + seed)
        for name, (params, cfg, vocab) in models.items():
            pre = StreamingPreprocessor(
                np.asarray(params.preprocessor.filterbank),
                np.asarray(params.preprocessor.window),
                n_streams=args.streams,
                cfg=PreprocessorConfig(n_mels=cfg.n_mels))
            mel = pre.process(audio)
            enc = enc_mod.encode_batch(params, cfg,
                                       jnp.asarray(mel, jnp.float32))
            dec_state = dec_mod.init_decoder_state(cfg, args.streams,
                                                   jnp.float32)
            if name == "tdt":
                tokens, _, _, iters = jax.jit(
                    tdt_greedy_decode,
                    static_argnums=(1, 7))(params, cfg, enc, dec_state,
                                           None, None, None, True)
            else:
                tokens, _, iters = jax.jit(
                    dec_mod.greedy_decode,
                    static_argnums=(1, 6))(params, cfg, enc, dec_state,
                                           None, None, True)
            tokens = np.asarray(tokens)
            for b in range(args.streams):
                ids = [t for t, _f in dec_mod.tokens_to_list(
                    tokens[b], cfg.blank_token)]
                hyp = [label_of(vocab, i) for i in ids]
                stats[name][0] += lev(hyp, truths[b])
                stats[name][1] += len(truths[b])
            stats[name][2] += int(iters)
            stats[name][3] += int(enc.shape[1])
            print(f"seed {seed} {name}: iters {int(iters)} over "
                  f"{enc.shape[1]} frames", file=sys.stderr)

    out = {"audio": f"{args.seconds:.0f}s x {args.streams} streams "
                    f"x {args.seeds} seeds"}
    for name in models:
        e, t, it, fr = stats[name]
        out[f"{name}_ter_pct"] = round(100 * e / max(t, 1), 2)
        out[f"{name}_decode_iters"] = it
        out[f"{name}_enc_frames"] = fr
    out["iters_ratio_tdt_over_rnnt"] = round(
        stats["tdt"][2] / max(stats["rnnt"][2], 1), 3)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
