#!/usr/bin/env python3
"""One-command full parity ladder for a real GGUF (VERDICT r1 item 6).

    run_parity.py <model.gguf> [audio.pcm] [--expect transcript.txt]
                  [--reference-dir DIR] [--trace-dir DIR] [--cpu] [--quick]

Runs, in order, and prints a docs/STATUS.md-style PASS/FAIL table
(reference docs/STATUS.md:241-260):

  1. load        -- GGUF parses, hparams sane, tensor census
  2. stages      -- per-stage JAX-vs-numpy-oracle diff on the real weights
                    (compare_layers.py: subsampling, full encoder,
                    decoder step, joint, streaming chunks)
  3. greedy      -- EXACT token match, JAX on-device greedy vs oracle
                    greedy, on the real weights (the reference's 121/121
                    bar)
  4. streaming   -- all four latency modes: streaming-vs-oracle chunk
                    outputs + batch-vs-streaming transcript stats
                    (compare_outputs.py per mode)
  5. quant       -- if the GGUF is f32: quantize in memory (q8_0, w8a8)
                    and report token agreement vs the f32 transcript
  6. expected    -- optional: WER-style diff against a transcript produced
                    by the reference C++ binary or NeMo (--expect)
  7. reference   -- optional (--reference-dir /path/to/nemotron-speech.cpp):
                    build the reference C++ binary via its Makefile if
                    needed, run `nemotron-asr.cpp <gguf> <pcm> 1120 13` on
                    the SAME audio, and diff transcripts with
                    compare_outputs --expect. Skips (PASS with a note) when
                    the binary can't be built here (ggml clone + toolchain
                    required) so the ladder stays usable everywhere.
  8. ref oracle  -- optional (--reference-oracle): compile and RUN the
                    reference's own ggml-FREE C++ oracle + preprocessor
                    (scripts/ref_oracle_parity.py) -- cross-implementation
                    mel/encoder/decoder/greedy gates that work offline with
                    no real GGUF (full-size random weights). Skips (PASS
                    with a note) only when g++ or the checkout is missing.

The moment real weights exist, the entire gate is this single invocation:
reference-vs-repo AND oracle-vs-repo in one command.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SCRIPTS = os.path.dirname(os.path.abspath(__file__))

RESULTS: list[tuple[str, bool, str]] = []


def record(stage: str, ok: bool, detail: str) -> None:
    RESULTS.append((stage, ok, detail))
    print(f"[{'PASS' if ok else 'FAIL'}] {stage}: {detail}", file=sys.stderr)


def run_script(name: str, args: list[str]) -> tuple[int, str]:
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, name), *args],
        capture_output=True, text=True, timeout=3600)
    out = proc.stdout + proc.stderr
    sys.stderr.write(out)
    return proc.returncode, out


VALUE_FLAGS = ("--expect", "--trace-dir", "--reference-dir")


def main(argv: list[str]) -> int:
    # positionals = argv minus flags minus the values of value-taking flags
    skip = {argv.index(f) + 1 for f in VALUE_FLAGS if f in argv}
    args = [a for i, a in enumerate(argv) if i > 0 and i not in skip
            and not a.startswith("--")]
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    gguf_path = args[0]
    cpu = ["--cpu"] if "--cpu" in argv else []
    quick = "--quick" in argv
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from nemotron_tpu import gguf
    from nemotron_tpu import params as P
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.oracle.model import OracleModel
    from nemotron_tpu.params import load_model

    # ---- 1. load ----
    try:
        params, cfg, vocab = load_model(gguf_path, keep_quantized=False)
        g = gguf.read_gguf(gguf_path)
        n_q = sum(1 for t in g.tensors.values()
                  if t.ggml_type != gguf.GGML_F32)
        record("load", True,
               f"{len(g.tensors)} tensors ({n_q} quantized), "
               f"{cfg.n_layers} layers, d_model={cfg.d_model}, "
               f"vocab={len(vocab)}")
    except Exception as e:
        record("load", False, f"{type(e).__name__}: {e}")
        return finish()

    # audio fixture
    if len(args) > 1:
        audio = np.fromfile(args[1], dtype="<i2")
        audio_path = args[1]
    else:
        rng = np.random.default_rng(0)
        t = np.arange(16000 * 4) / 16000.0
        audio = ((0.3 * np.sin(2 * np.pi * 440 * t)
                  + 0.05 * rng.standard_normal(t.size)) * 16000
                 ).astype(np.int16)
        audio_path = "/tmp/run_parity_audio.pcm"
        audio.tofile(audio_path)
        print("note: no audio given; using synthetic 4 s fixture "
              "(supply real speech for a meaningful transcript gate)",
              file=sys.stderr)

    # ---- 2. per-stage oracle diff ----
    rc, _ = run_script("compare_layers.py", [gguf_path, *cpu])
    record("stages", rc == 0, "per-stage JAX vs numpy oracle "
           f"(compare_layers rc={rc}, gate max_abs < 1e-2)")

    # ---- 3. exact greedy token match vs oracle ----
    arrays = {n: t.to_numpy() for n, t in g.tensors.items()}
    oracle = OracleModel(arrays, cfg)
    rng = np.random.default_rng(1)
    T = 12 if quick else 40
    enc = (rng.standard_normal((T, cfg.d_model)) * 2).astype(np.float32)
    want, _ = oracle.greedy_decode(enc)
    st = dec_mod.init_decoder_state(cfg, 1)
    toks, _ = dec_mod.greedy_decode(params, cfg, jnp.asarray(enc)[None], st)
    got = dec_mod.tokens_to_list(np.asarray(toks)[0], cfg.blank_token)
    match = got == [(t_, f) for t_, f in want]
    record("greedy", match,
           f"{len(got)}/{len(want)} tokens exact" if match else
           f"MISMATCH: got {len(got)} want {len(want)} tokens")

    # ---- 4. streaming, all four latency modes ----
    modes = [13] if quick else [0, 1, 6, 13]
    for R in modes:
        rc, out = run_script("compare_outputs.py",
                             [gguf_path, audio_path,
                              "--right-context", str(R), *cpu])
        record(f"streaming R={R}", rc == 0,
               f"batch vs streaming transcripts (rc={rc})")

    # ---- 5. quantized token agreement (f32 models only) ----
    if not any(t.ggml_type != gguf.GGML_F32 for t in g.tensors.values()):
        from nemotron_tpu.streaming.session import StreamSession

        cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)

        def run_one(p, ccx, dtype):
            s = StreamSession(p, cfg, vocab, ccx, compute_dtype=dtype)
            s.process(audio)
            s.finalize()
            return [t_ for t_, _f in s.get_tokens(0)]

        ref = run_one(params, cc, jnp.float32)
        import dataclasses

        for name, p, ccx in (
                ("q8_0", P.quantize_model_params(params, "q8_0"), cc),
                ("w8a8", P.quantize_model_params(params, "w8a8"), cc),
                ("w8a8+int8kv", P.quantize_model_params(params, "w8a8"),
                 dataclasses.replace(cc, kv_cache_int8=True)),
                ("w8a8+int4kv", P.quantize_model_params(params, "w8a8"),
                 dataclasses.replace(cc, kv_cache_int4=True))):
            got = run_one(p, ccx, jnp.bfloat16)
            from token_agreement import levenshtein

            dist = levenshtein(got, ref)
            agr = 1 - dist / max(len(ref), len(got), 1)
            record(f"quant {name}", agr >= 0.95,
                   f"token agreement {agr*100:.1f}% "
                   f"({dist} edits / {len(ref)} ref tokens)")

    # ---- 6. expected transcript ----
    if "--expect" in argv:
        exp = argv[argv.index("--expect") + 1]
        rc, _ = run_script("compare_outputs.py",
                           [gguf_path, audio_path, "--expect", exp, *cpu])
        record("expected transcript", rc == 0,
               f"WER-style gate vs {exp} (rc={rc}, bar 0.10)")

    # ---- 7. reference C++ binary (when a checkout + toolchain exist) ----
    if "--reference-dir" in argv:
        ref_dir = argv[argv.index("--reference-dir") + 1]
        ref_transcript = reference_transcript(ref_dir, gguf_path, audio_path)
        if ref_transcript is None:
            record("reference binary", True,
                   "skipped: nemotron-asr.cpp absent and not buildable "
                   "here (needs the ggml clone + toolchain); ladder "
                   "remains oracle-gated")
        else:
            exp_path = "/tmp/run_parity_reference_transcript.txt"
            with open(exp_path, "w") as f:
                f.write(ref_transcript)
            rc, _ = run_script("compare_outputs.py",
                               [gguf_path, audio_path, "--expect", exp_path,
                                *cpu])
            record("reference binary", rc == 0,
                   f"transcript diff vs {ref_dir}/nemotron-asr.cpp "
                   f"(rc={rc}, WER bar 0.10)")

    # ---- 8. reference C++ ORACLE (ggml-free; runnable offline) ----
    # Unlike stage 7 (the ggml main binary, which needs the external ggml
    # clone), the reference's test oracle compiles with a bare g++ and runs
    # against full-size random weights: mel / encoder / decoder / greedy
    # gates against the ACTUAL reference implementation, no real GGUF
    # needed. See scripts/ref_oracle_parity.py.
    if "--reference-oracle" in argv:
        rc, _ = run_script("ref_oracle_parity.py", [])
        if rc == 3:
            record("reference oracle", True,
                   "skipped: g++ or reference checkout unavailable")
        else:
            record("reference oracle", rc == 0,
                   "reference src/reference C++ vs JAX on shared fixtures "
                   f"(ref_oracle_parity rc={rc})")

    return finish()


def reference_transcript(ref_dir: str, gguf_path: str,
                         audio_path: str) -> str | None:
    """Run the reference streaming binary (building it first if needed) on
    the same GGUF + PCM; returns its stdout transcript, or None when the
    binary is unavailable (no checkout / no ggml / build failure).

    Reference argv contract: `nemotron-asr.cpp <model.gguf> <audio.pcm>
    [chunk_ms] [right_context]` (reference src/transcribe_stream.cpp:27-36),
    transcript on stdout, stats on stderr."""
    bin_path = os.path.join(ref_dir, "nemotron-asr.cpp")
    if not os.path.isdir(ref_dir):
        print(f"reference dir {ref_dir} does not exist", file=sys.stderr)
        return None
    if not os.path.exists(bin_path):
        print(f"building reference binary in {ref_dir} ...", file=sys.stderr)
        try:
            b = subprocess.run(["make", "-C", ref_dir, "nemotron-asr.cpp"],
                               capture_output=True, text=True, timeout=1800)
        except (OSError, subprocess.TimeoutExpired) as e:
            print(f"reference build failed to run: {e}", file=sys.stderr)
            return None
        if b.returncode != 0 or not os.path.exists(bin_path):
            sys.stderr.write(b.stderr[-2000:])
            return None
    try:
        proc = subprocess.run([bin_path, gguf_path, audio_path,
                               "1120", "13", "--cpu"],
                              capture_output=True, text=True, timeout=3600)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"reference binary failed to run: {e}", file=sys.stderr)
        return None
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        return None
    return proc.stdout.strip()


def finish() -> int:
    print("\n==== parity ladder ====")
    width = max(len(s) for s, _, _ in RESULTS)
    ok_all = True
    for stage, ok, detail in RESULTS:
        ok_all &= ok
        print(f"  {stage:{width}s}  {'PASS' if ok else 'FAIL'}  {detail}")
    print(f"==== {'ALL PASS' if ok_all else 'FAILURES PRESENT'} ====")
    return 0 if ok_all else 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
