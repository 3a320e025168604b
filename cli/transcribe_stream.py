#!/usr/bin/env python3
"""Streaming transcription CLI.

Preserves the reference binary's contract (reference
src/transcribe_stream.cpp:27-36):

    transcribe_stream.py <model.gguf> <audio.pcm|.wav|-|--stdin> [chunk_ms]
                         [right_context] [--cpu|--tpu] [--timestamps]
                         [--confidence] [--profile=DIR] [--trace=DIR]
                         [--quantize=q8_0|w8a8|w8a8-sq|w8a8-sq-static]
                         [--calib=FILE]
                         [--kv-int8|--kv-int4] [--shared-cache]
                         [--rc-by-layer=13,6,1,0]
                         [--beam=K] [--boost=piece:weight,...] [--ctc]
                         [--lm=lm.gguf] [--lm-weight=W] [--lm-bonus=B]
                         [--srt=FILE|--vtt=FILE]

  - input: raw s16le 16 kHz mono PCM file, or '-' / '--stdin' for stdin;
    .wav files decode directly (PCM16 or float32, any sample rate --
    polyphase-resampled, stereo downmixed)
  - chunk_ms is advisory (>=10 warning); the actual read size comes from the
    cache config, same as the reference (src/transcribe_stream.cpp:119,143-146)
  - right_context in {0, 1, 6, 13} selects the latency mode
  - incremental text on stdout; config + stats on stderr
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    # --stdin is positional (it IS the audio argument, reference
    # src/transcribe_stream.cpp:27-36); map it to '-' keeping its position.
    argv_t = ["-" if a == "--stdin" else a for a in argv[1:]]
    args = [a for a in argv_t if not a.startswith("--")]
    flags = [a for a in argv_t if a.startswith("--")]

    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 1

    model_path, audio_path = args[0], args[1]
    chunk_ms = int(args[2]) if len(args) > 2 else 0
    right_context = int(args[3]) if len(args) > 3 else 13

    if chunk_ms and chunk_ms < 10:
        print(f"warning: chunk_ms {chunk_ms} < 10, ignoring", file=sys.stderr)
    if right_context not in (0, 1, 6, 13):
        print(f"warning: right_context {right_context} is non-standard "
              "(expected 0, 1, 6 or 13)", file=sys.stderr)

    if "--cpu" in flags:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for f in flags:
        if f in ("--cuda", "--metal"):
            print(f"warning: {f} is not a TPU backend; using default device",
                  file=sys.stderr)
    profile_dir = None
    trace_dir = None
    quant_mode = None
    sub_fmt, sub_out = None, None
    for f in flags:
        if f.startswith("--profile="):
            profile_dir = f.split("=", 1)[1]
        elif f.startswith("--trace="):
            trace_dir = f.split("=", 1)[1]
        elif f.startswith("--quantize="):
            quant_mode = f.split("=", 1)[1]  # q8_0 | w8a8
        elif f.startswith("--srt=") or f.startswith("--vtt="):
            # subtitle export from the session's timed tokens at finalize
            # (utils/subtitles.py; =FILE is required here -- stdout already
            # carries the incremental transcript)
            if sub_fmt is not None and sub_fmt != f[2:5]:
                print("error: --srt and --vtt are mutually exclusive "
                      "(one subtitle format per run)", file=sys.stderr)
                return 1
            sub_fmt = f[2:5]
            sub_out = f.split("=", 1)[1]
        elif f in ("--srt", "--vtt"):
            print(f"error: streaming {f} requires {f}=FILE (stdout carries "
                  "the incremental transcript)", file=sys.stderr)
            return 1

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession

    if not os.path.exists(model_path):
        print(f"error: model file not found: {model_path}", file=sys.stderr)
        return 1
    sq_modes = ("w8a8-sq", "w8a8-sq-static")
    try:
        # SmoothQuant needs the DENSE weights to fold scales into
        params, cfg, vocab = load_model(
            model_path, keep_quantized=quant_mode not in sq_modes)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if quant_mode and quant_mode not in sq_modes:
        from nemotron_tpu.params import quantize_model_params

        try:
            params = quantize_model_params(params, mode=quant_mode)
        except KeyError:
            print(f"error: unknown --quantize mode '{quant_mode}' "
                  "(expected q8_0, w8a8, w8a8-sq or w8a8-sq-static)",
                  file=sys.stderr)
            return 1
        print(f"runtime quantization: {quant_mode}", file=sys.stderr)
    for f in flags:
        if f.startswith("--boost="):
            # contextual biasing: fold a per-token logit boost into the
            # joint bias (params.apply_logit_bias)
            try:
                params = parse_boost(f.split("=", 1)[1], params, vocab)
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
            print(f"logit boost applied: {f.split('=', 1)[1]}",
                  file=sys.stderr)
    cc = CacheConfig(att_right_context=right_context, n_mels=cfg.n_mels)
    if "--kv-int8" in flags:
        import dataclasses

        cc = dataclasses.replace(cc, kv_cache_int8=True)
        print("int8 K/V cache rings enabled", file=sys.stderr)
    if "--kv-int4" in flags:
        import dataclasses

        cc = dataclasses.replace(cc, kv_cache_int8=False, kv_cache_int4=True)
        print("int4 K/V cache rings enabled", file=sys.stderr)
    if "--shared-cache" in flags:
        # shared x-ring: half the attention cache state, K/V recomputed
        # per chunk (config.CacheConfig.shared_cache)
        import dataclasses

        cc = dataclasses.replace(cc, shared_cache=True)
        print("shared channel cache (x-ring) enabled", file=sys.stderr)
    for f in flags:
        # NeMo per-layer-group right context (e.g. --rc-by-layer=13,6,1,0;
        # the reference's acknowledged limitation #2)
        if f.startswith("--rc-by-layer="):
            import dataclasses

            pat = tuple(int(v) for v in f.split("=", 1)[1].split(","))
            cc = dataclasses.replace(cc, att_right_context_by_layer=pat)
            try:
                cc.rc_schedule(cfg.n_layers)
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
            print(f"per-layer right context: {pat}", file=sys.stderr)
    if quant_mode in sq_modes:
        # SmoothQuant: per-channel activation->weight migration folded into
        # the LN affine params (exact in f32; ops/smoothquant.py), calibrated
        # on audio, then W8A8-quantized. Calibrates on the input file's head
        # unless --calib=FILE names a separate clip (required for stdin).
        # The -static variant additionally freezes the fold-site activation
        # scales from the same calibration (no per-token abs-max at runtime).
        calib_path = None
        for f in flags:
            if f.startswith("--calib="):
                calib_path = f.split("=", 1)[1]
        if calib_path is None and audio_path not in ("-", "--stdin"):
            calib_path = audio_path
        if calib_path is None:
            print(f"error: --quantize={quant_mode} with stdin input needs "
                  "--calib=FILE (a representative audio clip)",
                  file=sys.stderr)
            return 1
        import numpy as np

        from nemotron_tpu.config import PreprocessorConfig
        from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
        from nemotron_tpu.ops.smoothquant import smooth_quantize
        from nemotron_tpu.utils.audio import read_audio_file

        calib_audio = read_audio_file(calib_path)[: 20 * 16000]
        pre = StreamingPreprocessor(
            np.asarray(params.preprocessor.filterbank),
            np.asarray(params.preprocessor.window), n_streams=1,
            cfg=PreprocessorConfig(n_mels=cfg.n_mels))
        mel = pre.process(calib_audio)
        if mel.shape[1] == 0:
            print(f"error: calibration clip {calib_path} too short",
                  file=sys.stderr)
            return 1
        params = smooth_quantize(params, cfg, mel,
                                 att_chunk=cc.chunk_enc_len,
                                 static_act=quant_mode.endswith("-static"))
        print(f"runtime quantization: {quant_mode} (calibrated on "
              f"{mel.shape[1]} mel frames of {calib_path})", file=sys.stderr)
    print(f"config: chunk={cc.chunk_mel_frames} mel frames "
          f"({cc.latency_ms} ms), shift={cc.shift_mel_frames}, "
          f"valid_out={cc.valid_out_len}, left_context={cc.att_left_context}",
          file=sys.stderr)

    beam = 1
    lm_path, lm_weight, lm_bonus = None, 0.3, 0.0
    try:
        for f in flags:
            if f.startswith("--beam="):
                beam = int(f.split("=", 1)[1])
            elif f.startswith("--lm="):
                lm_path = f.split("=", 1)[1]
            elif f.startswith("--lm-weight="):
                lm_weight = float(f.split("=", 1)[1])
            elif f.startswith("--lm-bonus="):
                lm_bonus = float(f.split("=", 1)[1])
    except ValueError:
        print("error: --beam takes an integer, --lm-weight a float",
              file=sys.stderr)
        return 1
    if beam > 1:
        print(f"beam search: K={beam} (incremental output disabled; "
              "the best hypothesis may rewrite as chunks arrive)",
              file=sys.stderr)
        if sub_fmt is not None:
            print("error: --srt/--vtt require greedy decode: cues need "
                  "per-token frame alignment", file=sys.stderr)
            return 1
    lm = None
    if lm_path is not None:
        # LM shallow fusion inside the beam (models/lm.py; needs --beam>1)
        from nemotron_tpu.models.lm import load_lm

        try:
            lm = load_lm(lm_path)
        except (OSError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(f"LM shallow fusion: {lm_path} (weight {lm_weight})",
              file=sys.stderr)
    try:
        # --confidence: annotate each word with {p=...}, its posterior from
        # the on-device greedy label loop (exp of the min per-piece log
        # softmax) -- a serving capability the reference lacks
        # --ctc: stream-decode with the hybrid checkpoint's auxiliary CTC
        # head (stateless greedy collapse) instead of the RNN-T label loop
        sess = StreamSession(params, cfg, vocab, cc, trace_dir=trace_dir,
                             timestamp_words="--timestamps" in flags,
                             confidence_words="--confidence" in flags,
                             beam_size=beam, ctc="--ctc" in flags,
                             lm=lm, lm_weight=lm_weight,
                             lm_bonus=lm_bonus)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    import numpy as np

    import io

    if audio_path in ("-", "--stdin"):
        src = sys.stdin.buffer
    else:
        src = open(audio_path, "rb")
        head = src.read(12)
        if head[:4] == b"RIFF":  # WAV: decode fully, replay as raw PCM
            from nemotron_tpu.utils.audio import read_audio_bytes

            data = head + src.read()
            src.close()
            src = io.BytesIO(read_audio_bytes(data).tobytes())
        else:
            src.seek(0)
    chunk_bytes = cc.chunk_samples * 2

    t_start = time.perf_counter()
    n_samples = 0
    try:
        while True:
            buf = src.read(chunk_bytes)
            if not buf:
                break
            audio = np.frombuffer(buf, dtype="<i2")
            n_samples += audio.size
            text = sess.process(audio)
            if text:
                sys.stdout.write(text)
                sys.stdout.flush()
    finally:
        if src is not sys.stdin.buffer:
            src.close()

    before = len(sess.get_transcript(0))
    final = sess.finalize()
    if beam > 1:
        # beam transcripts may rewrite earlier text; nothing was printed
        # incrementally, so emit the whole final best hypothesis here
        sys.stdout.write(final)
    elif len(final) > before:  # text emitted by the flush chunk
        sys.stdout.write(final[before:])
    sys.stdout.write("\n")
    sys.stdout.flush()

    if sub_fmt is not None:
        from nemotron_tpu.utils.subtitles import write_subtitles

        n = write_subtitles(sub_out, sess.get_tokens(0), vocab, sub_fmt)
        print(f"wrote {n} cues to {sub_out}", file=sys.stderr)

    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}", file=sys.stderr)

    elapsed = time.perf_counter() - t_start
    audio_s = n_samples / 16000.0
    print(f"\nprocessed {sess.total_chunks} chunks, {audio_s:.2f}s audio "
          f"in {elapsed:.2f}s (RTF {elapsed / max(audio_s, 1e-9):.4f})",
          file=sys.stderr)
    print(f"frontend {sess.frontend_seconds:.3f}s, "
          f"chunk-step {sess.chunk_seconds:.3f}s", file=sys.stderr)
    return 0


def parse_boost(spec: str, params, vocab):
    """--boost=piece:weight,... -> apply_logit_bias'd params (shared
    parser: nemotron_tpu.params.parse_boost_spec)."""
    from nemotron_tpu.params import apply_logit_bias, parse_boost_spec

    return apply_logit_bias(params, parse_boost_spec(spec), vocab)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))


def entry() -> None:
    raise SystemExit(main(sys.argv))
