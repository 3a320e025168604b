#!/usr/bin/env python3
"""Transcript-level output comparison (the reference's scripts/compare_outputs.py
role: the tolerance tool its BASELINE quality gate names).

    compare_outputs.py <model.gguf> <audio.pcm> [--right-context R]
                       [--expect transcript.txt] [--cpu]

Runs BOTH inference paths of this framework on the same audio -- offline
batch (full-utterance encoder) and cache-aware streaming -- prints both
transcripts, their word-level diff stats, and optionally diffs against an
expected transcript (e.g. produced by the reference C++ binary or NeMo).
Streaming-vs-batch divergence on filler words is expected RNN-T behavior
(reference docs/STREAMING-v2.md:306-308); identical transcripts are not
required, but high word overlap is.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def word_stats(a: str, b: str) -> dict:
    """Word-level Levenshtein (the WER building block)."""
    aw, bw = a.split(), b.split()
    n, m = len(aw), len(bw)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (aw[i - 1] != bw[j - 1]))
    dist = int(d[n, m])
    return {"words_a": n, "words_b": m, "edit_distance": dist,
            "wer": dist / max(n, 1)}


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    R = 13
    if "--right-context" in argv:
        R = int(argv[argv.index("--right-context") + 1])

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession, transcribe_batch

    params, cfg, vocab = load_model(args[0])
    audio = np.fromfile(args[1], dtype="<i2")

    batch_text = transcribe_batch(params, cfg, vocab, audio)
    print(f"[batch]     {batch_text}")

    cc = CacheConfig(att_right_context=R, n_mels=cfg.n_mels)
    sess = StreamSession(params, cfg, vocab, cc)
    sess.process(audio)
    stream_text = sess.finalize()
    print(f"[streaming] {stream_text}")

    s = word_stats(batch_text, stream_text)
    print(f"batch-vs-streaming: {s['edit_distance']} word edits over "
          f"{s['words_a']}/{s['words_b']} words (WER-style {s['wer']:.3f})")

    rc = 0
    if "--expect" in argv:
        expect = open(argv[argv.index("--expect") + 1]).read().strip()
        for name, text in (("batch", batch_text), ("streaming", stream_text)):
            e = word_stats(expect, text)
            print(f"{name}-vs-expected: {e['edit_distance']} word edits "
                  f"(WER-style {e['wer']:.3f})")
            if e["wer"] > 0.1:
                rc = 2
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
