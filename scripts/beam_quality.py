#!/usr/bin/env python3
"""Beam-vs-greedy quality on a trained tones model (true TER).

The reference decodes greedily only; this framework's on-device batched
beam search (models/beam.py) is oracle-parity-tested, and THIS harness
measures what the beam buys in accuracy: ground-truth token error rate of
greedy vs beam-K streaming decodes over continuous tone streams.

Measured on the committed fixture (weights/tones_tiny.gguf, 60 s x
4 streams x 2 seeds x R in {0,13}): beam K=4 improves or matches greedy
in every run, mean TER 0.79% -> 0.62% (README "Beam decoding").

Usage: python scripts/beam_quality.py [gguf] [--beam K] [--seconds S]
                                      [--streams N] [--seeds M]
                                      [--modes 0,13] [--tones T] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))
sys.path.insert(0, REPO)


def levenshtein(a, b):
    if len(a) < len(b):
        a, b = b, a
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
                    default=REPO + "/weights/tones_tiny.gguf")
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--modes", default="0,13")
    ap.add_argument("--tones", type=int, default=16)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent cache is for the TPU's slow compiles only (CPU AOT
    # entries are machine-feature stamped; mismatch risks SIGILL).
    # Decided without initializing the backend (would defeat the
    # hermetic env-var CPU pin).
    if os.environ.get("JAX_PLATFORMS") != "cpu" and not args.cpu:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, _ = load_model(args.gguf, keep_quantized=False)
    results = {}
    for mode in (int(m) for m in args.modes.split(",")):
        cc = CacheConfig(att_right_context=mode, n_mels=cfg.n_mels)
        for seed in range(args.seeds):
            audio, truths = tones_mod.make_eval_streams(
                args.streams, args.seconds, args.tones, seed=1000 + seed)
            row = {}
            for name, k in (("greedy", 1), (f"beam{args.beam}", args.beam)):
                sess = StreamSession(params, cfg, None, cc,
                                     n_streams=audio.shape[0],
                                     compute_dtype=jnp.float32, beam_size=k)
                sess.process(audio)
                sess.finalize()
                got = [[t for t, _ in sess.get_tokens(s)]
                       for s in range(audio.shape[0])]
                total = sum(len(t) for t in truths)
                dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
                row[name] = round(dist / max(total, 1), 4)
            results[f"R{mode}/seed{seed}"] = row
            print(f"R={mode} seed={seed}: " + "  ".join(
                f"{n} TER {v*100:.2f}%" for n, v in row.items()),
                file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
