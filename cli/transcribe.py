#!/usr/bin/env python3
"""Batch (whole-file) transcription CLI (reference src/transcribe.cpp):

    transcribe.py <model.gguf> <audio.pcm|.wav> [more audio files...]
                  [--cpu] [--timestamps] [--confidence] [--beam=K]
                  [--nbest=N] [--boost=piece:weight,...] [--ctc]
                  [--lm=lm.gguf] [--lm-weight=W] [--lm-bonus=B]
                  [--lm-rescore] [--srt[=FILE]] [--vtt[=FILE]]

Multiple audio files are transcribed in ONE batched encoder/decode pass
(length-masked; the reference is batch=1). --beam=K decodes with the
on-device batched RNN-T beam search (greedy when omitted; the reference
is greedy-only). --nbest=N prints the N best beam hypotheses per file
with their total log-probs, best first (implies --beam=N when --beam is
omitted; N must be <= K). --ctc decodes with a hybrid checkpoint's
auxiliary CTC head (stateless greedy; requires ctc_decoder.* tensors).
--lm=lm.gguf enables LM shallow fusion inside the beam search (labels
score log P_rnnt + W * log P_lm, default W=0.3; requires --beam>1;
models/lm.py) -- the reference has no LM anywhere. --lm-rescore switches
the LM to second-pass n-best rescoring instead: the beam runs
acoustic-only and the finished K-hypothesis list is reranked by
raw_score + W * LM_sequence_logp + B * length (one LM pass per
utterance; models/lm.py rescore_nbest). --srt / --vtt write subtitle
files (utils/subtitles.py: words grouped into cues split at silence
gaps / max duration / max line length) next to each audio file, or to
FILE when given with a single input; greedy only (cues need the greedy
loop's per-token frame alignment, like --timestamps).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    flags = set(a for a in argv[1:] if a.startswith("--"))
    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 1

    if "--cpu" in flags:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import transcribe_batch
    from nemotron_tpu.utils.audio import read_audio_file

    if not os.path.exists(args[0]):
        print(f"error: model file not found: {args[0]}", file=sys.stderr)
        return 1
    try:
        params, cfg, vocab = load_model(args[0])
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    beam = 1
    nbest = None
    lm_path, lm_weight, lm_bonus = None, 0.3, 0.0
    try:
        for f in flags:
            if f.startswith("--beam="):
                beam = int(f.split("=", 1)[1])
            elif f.startswith("--nbest="):
                nbest = int(f.split("=", 1)[1])
            elif f.startswith("--lm="):
                lm_path = f.split("=", 1)[1]
            elif f.startswith("--lm-weight="):
                lm_weight = float(f.split("=", 1)[1])
            elif f.startswith("--lm-bonus="):
                lm_bonus = float(f.split("=", 1)[1])
    except ValueError:
        print("error: --beam/--nbest take an integer, --lm-weight a float",
              file=sys.stderr)
        return 1
    if nbest is not None and beam == 1:
        beam = nbest
    sub_fmt, sub_out = None, None
    for f in flags:
        for fmt in ("srt", "vtt"):
            if f == f"--{fmt}" or f.startswith(f"--{fmt}="):
                if sub_fmt is not None and sub_fmt != fmt:
                    print("error: --srt and --vtt are mutually exclusive "
                          "(one subtitle format per run)", file=sys.stderr)
                    return 1
                sub_fmt = fmt
                sub_out = f.split("=", 1)[1] if "=" in f else None
    if sub_fmt is not None:
        if beam != 1 or nbest is not None or "--ctc" in flags:
            print("error: --srt/--vtt require greedy decode (no --beam/"
                  "--nbest/--ctc): cues need per-token frame alignment",
                  file=sys.stderr)
            return 1
        if sub_out is not None and len(args) > 2:
            print("error: --srt=FILE/--vtt=FILE take one audio file; "
                  "omit =FILE to write one subtitle file per input",
                  file=sys.stderr)
            return 1
    lm = None
    if lm_path is not None:
        from nemotron_tpu.models.lm import load_lm

        try:
            lm = load_lm(lm_path)
        except (OSError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    for f in flags:
        if f.startswith("--boost="):
            # contextual biasing folded into the joint bias
            from nemotron_tpu.params import apply_logit_bias, parse_boost_spec

            try:
                params = apply_logit_bias(
                    params, parse_boost_spec(f.split("=", 1)[1]), vocab)
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
    audios = [read_audio_file(a) for a in args[1:]]
    t0 = time.perf_counter()
    try:
        if nbest is not None:
            nbests = transcribe_batch(
                params, cfg, vocab, audios if len(audios) > 1 else audios[0],
                beam_size=beam, return_nbest=nbest, lm=lm,
                lm_weight=lm_weight, lm_bonus=lm_bonus,
                lm_rescore="--lm-rescore" in flags)
            if len(audios) == 1:
                nbests = [nbests]
            for path, hyps in zip(args[1:], nbests):
                for rank, (text, score) in enumerate(hyps):
                    prefix = f"{path}\t" if len(audios) > 1 else ""
                    print(f"{prefix}[{rank}] score={score:.3f}\t{text}")
            elapsed = time.perf_counter() - t0
            audio_s = sum(a.size for a in audios) / 16000.0
            print(f"{audio_s:.2f}s audio in {elapsed:.2f}s "
                  f"(RTF {elapsed / max(audio_s, 1e-9):.4f})",
                  file=sys.stderr)
            return 0
        if "--confidence" in flags or sub_fmt is not None:
            # word-posterior annotations ({p=...}) from the greedy label
            # loop's per-emission log softmax, and/or subtitle export --
            # both need the per-token (id, frame) lists (greedy only)
            from nemotron_tpu.utils.text import tokens_to_text

            _, tls = transcribe_batch(
                params, cfg, vocab,
                audios if len(audios) > 1 else audios[0],
                beam_size=beam, return_confidence=True)
            if len(audios) == 1:
                tls = [tls]
            if sub_fmt is not None:
                from nemotron_tpu.utils.subtitles import write_subtitles

                for path, tl in zip(args[1:], tls):
                    out = sub_out or os.path.splitext(path)[0] + "." + sub_fmt
                    n = write_subtitles(out, tl, vocab, sub_fmt)
                    print(f"wrote {n} cues to {out}", file=sys.stderr)
            texts = [tokens_to_text(tl, vocab,
                                    timestamp_words="--timestamps" in flags,
                                    confidence_words="--confidence" in flags)
                     for tl in tls]
            if len(audios) == 1:
                texts = texts[0]
        else:
            texts = transcribe_batch(params, cfg, vocab,
                                     audios if len(audios) > 1 else audios[0],
                                     timestamp_words="--timestamps" in flags,
                                     beam_size=beam, ctc="--ctc" in flags,
                                     lm=lm, lm_weight=lm_weight,
                                     lm_bonus=lm_bonus,
                                     lm_rescore="--lm-rescore" in flags)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    elapsed = time.perf_counter() - t0
    if len(audios) == 1:
        print(texts)
    else:
        for path, text in zip(args[1:], texts):
            print(f"{path}\t{text}")
    audio_s = sum(a.size for a in audios) / 16000.0
    print(f"{audio_s:.2f}s audio in {elapsed:.2f}s "
          f"(RTF {elapsed / max(audio_s, 1e-9):.4f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))


def entry() -> None:
    raise SystemExit(main(sys.argv))
