#!/usr/bin/env python3
"""Two-pass serving quality: online greedy (+endpointing) vs the offline
per-utterance beam(+LM) refinement of the captured segments
(nemotron_tpu/streaming/refine.py).

This closes the loop the fusion harness opened (docs/lm_quality.json):
shallow fusion WINS per-utterance but LOSES on long unsegmented streams,
so the prescription was "segment with endpointing, then fuse" — here
that exact pipeline is measured end to end: continuous multi-utterance
streams with real silence gaps, ONLINE greedy segmentation, and a
refined re-decode of each finished utterance.

Per-utterance TER is computed by aligning endpoint events to truth
utterances in order; missed/spurious endpoints are reported.

Usage: refine_quality.py [asr.gguf] [lm.gguf] [--beam K] [--lm-weight W]
                         [--lm-bonus B] [--noise X] [--streams N]
                         [--utts-per-stream U] [--utt-tones T]
                         [--gap-s G] [--seeds M] [--tones 16]
                         [--branch 3] [--no-lm] [--json out.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from beam_quality import levenshtein  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gguf", nargs="?",
                    default=REPO + "/weights/tones_tiny_sil.gguf")
    ap.add_argument("lm_gguf", nargs="?",
                    default=REPO + "/weights/tones_tiny_lm.gguf")
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--lm-weight", type=float, default=0.5)
    ap.add_argument("--lm-bonus", type=float, default=None)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--utts-per-stream", type=int, default=6)
    ap.add_argument("--utt-tones", type=int, default=8)
    ap.add_argument("--gap-s", type=float, default=1.8,
                    help="inter-utterance silence (> endpoint threshold)")
    ap.add_argument("--endpoint-silence", type=float, default=1.0)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--tones", type=int, default=16)
    ap.add_argument("--branch", type=int, default=3)
    ap.add_argument("--grammar-seed", type=int, default=17)
    ap.add_argument("--no-lm", action="store_true",
                    help="refine with plain beam (no fusion)")
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
    from nemotron_tpu.streaming.refine import SegmentRefiner
    from nemotron_tpu.streaming.serving import ServingEngine
    from nemotron_tpu.utils import tones as tones_mod
    from nemotron_tpu.utils.tones import SAMPLE_RATE, render_tones

    params, cfg, vocab = load_model(args.gguf, keep_quantized=False)
    lm = None if args.no_lm else load_lm(args.lm_gguf)
    if args.lm_bonus is None:
        args.lm_bonus = args.lm_weight * float(np.log(args.branch))
    trans = tones_mod.grammar_transitions(args.tones, args.branch,
                                          args.grammar_seed)
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)

    def labels_of(toks_or_text):
        if isinstance(toks_or_text, str):
            return [int(w[1:]) for w in
                    toks_or_text.replace("▁", " ").split()
                    if w[1:].isdigit()]
        return [int(vocab[t].replace("▁T", "")) for t, *_ in toks_or_text]

    results = {}
    for seed in range(args.seeds):
        rng = np.random.default_rng(5000 + seed)
        # streams of grammar utterances separated by real silences
        streams, truths = [], []     # truths[s] = list of utterances
        for _s in range(args.streams):
            parts, utts = [], []
            for _u in range(args.utts_per_stream):
                labs = tones_mod.markov_labels(rng, args.utt_tones, trans)
                durs = rng.uniform(0.20, 0.32, args.utt_tones)
                gaps = rng.uniform(*tones_mod.GAP_RANGE, args.utt_tones)
                n = int((durs + gaps).sum() * SAMPLE_RATE) \
                    + int(args.gap_s * SAMPLE_RATE)
                parts.append(render_tones(labs, durs, rng, args.tones, n,
                                          noise=args.noise, gaps=gaps))
                utts.append([int(x) for x in labs])
            streams.append(np.concatenate(parts))
            truths.append(utts)
        # ragged stream lengths: right-pad with silence (the endpointer
        # treats it like any inter-utterance gap)
        n_max = max(s.size for s in streams)
        audio = np.stack([np.pad(s, (0, n_max - s.size)) for s in streams])

        eng = ServingEngine(params, cfg, vocab, cc,
                            n_slots=args.streams,
                            compute_dtype=jnp.float32,
                            endpoint_silence_s=args.endpoint_silence,
                            endpoint_reset=True,
                            keep_segment_audio=True)
        refiner = SegmentRefiner(params, cfg, vocab, beam_size=args.beam,
                                 lm=lm, lm_weight=args.lm_weight,
                                 lm_bonus=args.lm_bonus,
                                 compute_dtype=jnp.float32)
        slots = eng.add_streams(args.streams)
        n = cc.shift_samples
        events = {s: [] for s in slots}   # slot -> [(online, refined)]
        for t in range(audio.shape[1] // n):
            eng.feed_audio({s: audio[i, t * n:(t + 1) * n]
                            for i, s in enumerate(slots)})
            eng.step()
            for s, online, refined, _toks in refiner.drain(eng):
                events[s].append((online, refined))

        # two metrics: per-utterance (order-aligned; inflated when an
        # endpoint is missed/spurious, since every later pairing shifts)
        # and stream-level (concatenate all events per stream — robust to
        # segmentation mistakes, measures pure transcription quality)
        tot = dist_on = dist_re = 0
        stot = sdist_on = sdist_re = 0
        missed = spurious = 0
        for i, s in enumerate(slots):
            evs = events[s]
            utts = truths[i]
            missed += max(0, len(utts) - len(evs))
            spurious += max(0, len(evs) - len(utts))
            for (online, refined), truth in zip(evs, utts):
                tot += len(truth)
                dist_on += levenshtein(labels_of(online), truth)
                dist_re += levenshtein(labels_of(refined), truth)
            flat_truth = [t for u in utts for t in u]
            flat_on = [t for online, _r in evs for t in labels_of(online)]
            flat_re = [t for _o, refined in evs
                       for t in labels_of(refined)]
            stot += len(flat_truth)
            sdist_on += levenshtein(flat_on, flat_truth)
            sdist_re += levenshtein(flat_re, flat_truth)
        row = {"online_greedy": round(dist_on / max(tot, 1), 4),
               "refined": round(dist_re / max(tot, 1), 4),
               "stream_online": round(sdist_on / max(stot, 1), 4),
               "stream_refined": round(sdist_re / max(stot, 1), 4),
               "utterances": sum(len(events[s]) for s in slots),
               "missed_endpoints": missed,
               "spurious_endpoints": spurious}
        results[f"seed{seed}"] = row
        print(f"seed={seed} noise={args.noise}: per-utt TER "
              f"{row['online_greedy']*100:.2f}% -> "
              f"{row['refined']*100:.2f}%  stream TER "
              f"{row['stream_online']*100:.2f}% -> "
              f"{row['stream_refined']*100:.2f}%  (events "
              f"{row['utterances']}, missed {missed}, "
              f"spurious {spurious})", file=sys.stderr)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"config": vars(args), "results": results}, f,
                      indent=1, default=str)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
