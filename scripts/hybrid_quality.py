#!/usr/bin/env python3
"""RNNT-vs-CTC head comparison on a hybrid checkpoint.

    hybrid_quality.py [gguf] [--seconds 60] [--streams 4] [--seeds 2]
                      [--tones 16] [--json F] [--cpu]

Decodes the SAME encoder outputs (one encode_batch pass per stream set)
with both heads — the RNN-T label loop and the auxiliary CTC head's
greedy collapse — and reports token error rate against the tone truth.
The standard hybrid-checkpoint question: how much accuracy does the
stateless (faster, streaming-trivial) CTC decode give up vs the
autoregressive RNN-T decode on the same acoustic model?
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
                                         "tones_tiny_hybrid.gguf"))
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

    from nemotron_tpu.models import ctc as ctc_mod
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.params import load_model
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, vocab = load_model(args.gguf, keep_quantized=False)
    if params.ctc is None:
        print("error: model has no CTC head (ctc_decoder.* tensors)",
              file=sys.stderr)
        return 1

    def label_of(tok_id: int) -> int:
        try:
            return int(vocab[tok_id].replace("▁T", ""))
        except ValueError:
            return -1

    stats = {"rnnt": [0, 0], "ctc": [0, 0]}   # [edits, truth tokens]
    for seed in range(args.seeds):
        audio, truths = tones_mod.make_eval_streams(
            args.streams, args.seconds, args.tones, seed=100 + seed)
        from nemotron_tpu.config import PreprocessorConfig
        from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor

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
        tokens, _ = jax.jit(dec_mod.greedy_decode, static_argnums=1)(
            params, cfg, enc, dec_state)
        tokens = np.asarray(tokens)
        rnnt_ids = [
            [t for t, _f in dec_mod.tokens_to_list(tokens[b],
                                                   cfg.blank_token)]
            for b in range(args.streams)]
        ctc_ids = ctc_mod.ctc_greedy_decode(params, cfg, enc)

        for b in range(args.streams):
            truth = truths[b]
            for name, ids in (("rnnt", rnnt_ids[b]), ("ctc", ctc_ids[b])):
                hyp = [label_of(i) for i in ids]
                stats[name][0] += lev(hyp, truth)
                stats[name][1] += len(truth)
            print(f"seed {seed} stream {b}: truth {len(truth)} "
                  f"rnnt {len(rnnt_ids[b])} ctc {len(ctc_ids[b])}",
                  file=sys.stderr)

    out = {
        "gguf": os.path.basename(args.gguf),
        "audio": f"{args.seconds:.0f}s x {args.streams} streams "
                 f"x {args.seeds} seeds",
        "rnnt_ter_pct": round(100 * stats["rnnt"][0]
                              / max(stats["rnnt"][1], 1), 2),
        "ctc_ter_pct": round(100 * stats["ctc"][0]
                             / max(stats["ctc"][1], 1), 2),
        "truth_tokens": stats["rnnt"][1],
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
