#!/usr/bin/env python3
"""Per-token emission delay across the four latency modes.

The latency-mode table (BASELINE.md; reference src/nemo-stream.h:15-20)
states each mode's STRUCTURAL latency (chunk audio span). This harness
measures what a stream consumer actually experiences: for every correctly
transcribed tone, the gap between the tone's ground-truth onset and the
moment the streaming pipeline could have emitted its token -- the end of
the chunk whose step produced it (audio-timeline accounting, so the
number is hardware-independent; add the device step time, ~O(100 ms) at
full batch, for wall-clock).

    emission_delay.py [--gguf weights/tones_tiny.gguf] [--tones 16]
                      [--modes 0,1,6,13] [--seconds 30] [--streams 2]
                      [--seed 0] [--json out.json]

Emitted tokens are aligned to the truth with an edit-distance backtrace
(only MATCHED tokens contribute a delay; substitutions/drops are counted
separately), so a model with ~1% TER still yields a clean delay
distribution. The reference has no equivalent measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def align_matches(got: list[int], truth: list[int]) -> list[tuple[int, int]]:
    """Minimal-edit alignment; returns (got_idx, truth_idx) for every
    MATCH (equal labels aligned together)."""
    n, m = len(got), len(truth)
    # DP over (n+1, m+1); backtrace on ops
    D = np.zeros((n + 1, m + 1), np.int32)
    D[:, 0] = np.arange(n + 1)
    D[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = D[i - 1, j - 1] + (got[i - 1] != truth[j - 1])
            D[i, j] = min(sub, D[i - 1, j] + 1, D[i, j - 1] + 1)
    out = []
    i, j = n, m
    while i > 0 and j > 0:
        if (got[i - 1] == truth[j - 1]
                and D[i, j] == D[i - 1, j - 1]):
            out.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif D[i, j] == D[i - 1, j - 1] + 1:
            i, j = i - 1, j - 1
        elif D[i, j] == D[i - 1, j] + 1:
            i -= 1
        else:
            j -= 1
    out.reverse()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", default=os.path.join(
        os.path.dirname(__file__), "..", "weights", "tones_tiny.gguf"))
    ap.add_argument("--tones", type=int, default=16)
    ap.add_argument("--modes", default="0,1,6,13")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--streams", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, vocab = load_model(args.gguf, keep_quantized=False)
    audio, truths, onsets = tones_mod.make_eval_streams(
        args.streams, args.seconds, args.tones, seed=args.seed,
        return_onsets=True)

    def label_of(tok_id: int) -> int:
        try:
            return int(vocab[tok_id].replace("▁T", ""))
        except ValueError:
            return -1

    results = {}
    for R in (int(r) for r in args.modes.split(",")):
        cc = CacheConfig(att_right_context=R, n_mels=cfg.n_mels)
        sess = StreamSession(params, cfg, vocab, cc,
                             n_streams=args.streams,
                             compute_dtype=jnp.float32)
        sess.process(audio)
        sess.finalize()
        frame_s = (cc.subsampling_factor * cc.hop_length / cc.sample_rate)
        delays = []
        matched = total_got = 0
        for s in range(args.streams):
            toks = sess.get_tokens(s)
            got_labels = [label_of(t) for t, _f in toks]
            pairs = align_matches(got_labels, truths[s])
            matched += len(pairs)
            total_got += len(toks)
            for gi, ti in pairs:
                frame = toks[gi][1]
                # the chunk step that produced frame f ran once the audio
                # for its whole chunk window had arrived
                k = frame // cc.valid_out_len
                emit_t = (k * cc.shift_mel_frames
                          + cc.chunk_mel_frames) * cc.hop_length \
                    / cc.sample_rate
                delays.append(emit_t - onsets[s][ti])
        d = np.asarray(delays)
        total_truth = sum(len(t) for t in truths)
        entry = {
            "right_context": R,
            "structural_latency_ms": cc.chunk_mel_frames * 10,
            "matched_tokens": matched,
            "match_rate_vs_truth": round(matched / total_truth, 4),
            # a model that matches nothing still reports (delays null)
            "delay_p50_ms": round(float(np.percentile(d, 50)) * 1e3, 1)
            if d.size else None,
            "delay_p90_ms": round(float(np.percentile(d, 90)) * 1e3, 1)
            if d.size else None,
            "delay_max_ms": round(float(d.max()) * 1e3, 1)
            if d.size else None,
            "frame_ms": frame_s * 1e3,
        }
        results[f"R{R}"] = entry
        print(json.dumps(entry), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
