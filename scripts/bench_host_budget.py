#!/usr/bin/env python3
"""Host-side budget at cohort scale (VERDICT r4 item 1b).

The 2400-stream headline is DEVICE capacity; the only end-to-end cohort
measurement ran through the ~113 MB/s dev tunnel and was upload-bound
(docs/capacity_r4.json e2e_tunnel). A co-located production host pays
PCIe (~100x the tunnel) instead, so the open question is whether the
HOST side -- PCM handling, the native DSP, mel staging, emission
extraction, transcript bookkeeping -- fits inside the 1120 ms chunk
period at 2400 slots. This script times each host stage standalone on
real-shaped data, then reports the per-tick sum and the number of such
cores a co-located host would need.

Stages measured per tick of ONE cohort of B streams (C cohorts run C
ticks per period, so the period budget per tick is period / C):

  pcm_copy        [B, shift] i16 ingest copy (the feed_audio path's
                  per-stream buffering collapses to this slab copy)
  frontend_mel    native C++ PCM -> log-mel for B streams (the engine's
                  dsp='host' path; dsp='device' removes this entirely)
  mel_stage       f32 mel slab -> the contiguous staging layout
  extract_emitted [B, T, MAX] token slab -> per-stream emissions
  transcript      per-emission detokenize + append

Run on an otherwise idle host for clean numbers:

    python scripts/bench_host_budget.py [--batch 800] [--cohorts 3]
        [--rounds 20] [--emit-rate 2.5] [--json docs/host_budget.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def opt(argv, name, default, cast):
    if name not in argv:
        return default
    return cast(argv[argv.index(name) + 1])


def timeit(fn, rounds):
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    a = np.asarray(ts)
    return {"p50_ms": float(np.percentile(a, 50)) * 1e3,
            "p90_ms": float(np.percentile(a, 90)) * 1e3}


def main(argv):
    from nemotron_tpu.config import CacheConfig, ModelConfig
    from nemotron_tpu.frontend import native as nat
    from nemotron_tpu.frontend.preprocessor import (hann_window,
                                                    mel_filterbank_slaney,
                                                    pad_window)
    from nemotron_tpu.models.decoder import extract_emitted
    from nemotron_tpu.utils.text import tokens_to_text

    B = opt(argv, "--batch", 800, int)
    C = opt(argv, "--cohorts", 3, int)
    rounds = opt(argv, "--rounds", 20, int)
    emit_rate = opt(argv, "--emit-rate", 2.5, float)  # tokens/s/stream
    cfg = ModelConfig()
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
    period_s = cc.shift_samples / cc.sample_rate
    n = cc.shift_samples
    rng = np.random.default_rng(0)

    res: dict = {"batch": B, "cohorts": C, "streams_total": B * C,
                 "chunk_period_ms": period_s * 1e3,
                 "tick_budget_ms": period_s * 1e3 / C,
                 "host_cores": os.cpu_count()}

    # --- pcm ingest copy -------------------------------------------------
    pcm = (rng.standard_normal((B, n)) * 6000).astype(np.int16)
    dst = np.empty_like(pcm)

    def pcm_copy():
        np.copyto(dst, pcm)

    res["pcm_copy"] = timeit(pcm_copy, rounds)
    res["pcm_mb_per_tick"] = pcm.nbytes / 1e6

    # --- native frontend -------------------------------------------------
    if nat.available():
        fb = mel_filterbank_slaney(cc.n_mels, 512, cc.sample_rate)
        win = pad_window(hann_window(400), 512)
        fe = nat.NativeFrontend(fb, win, n_streams=B, n_mels=cc.n_mels)
        fe.process(pcm)                      # warm the residue path

        def frontend():
            fe.process(pcm)

        res["frontend_mel"] = timeit(frontend, rounds)
        mb_s = pcm.nbytes / (res["frontend_mel"]["p50_ms"] / 1e3) / 1e6
        res["frontend_mb_per_s_per_core"] = round(mb_s, 1)
    else:
        res["frontend_mel"] = None

    # --- mel staging (f32 slab relayout) --------------------------------
    frames = cc.chunk_mel_frames
    mel = rng.standard_normal((B, frames, cc.n_mels)).astype(np.float32)

    def stage():
        np.ascontiguousarray(mel).copy()

    res["mel_stage"] = timeit(stage, rounds)

    # --- emission extraction at a speech-like rate ----------------------
    T, MAX = cc.valid_out_len, 10
    blank = cfg.vocab_size - 1
    toks = np.full((B, T, MAX), blank, np.int32)
    n_emit = int(B * emit_rate * period_s)   # emissions per tick
    bs = rng.integers(0, B, n_emit)
    ts_ = rng.integers(0, T, n_emit)
    toks[bs, ts_, 0] = rng.integers(0, blank, n_emit)
    offsets = np.zeros(B, np.int64)

    def extract():
        return extract_emitted(toks, blank, offsets)

    res["extract_emitted"] = timeit(extract, rounds)
    res["emissions_per_tick"] = n_emit

    # --- transcript append ----------------------------------------------
    vocab = [f"▁w{i}" for i in range(cfg.vocab_size)]
    emitted = extract_emitted(toks, blank, offsets)
    transcripts = [""] * B

    def transcribe():
        for s, pairs in emitted.items():
            transcripts[s] += tokens_to_text(pairs, vocab)

    res["transcript"] = timeit(transcribe, rounds)

    host_ms = sum(res[k]["p50_ms"] for k in
                  ("pcm_copy", "frontend_mel", "mel_stage",
                   "extract_emitted", "transcript") if res.get(k))
    res["host_ms_per_tick_1core"] = round(host_ms, 2)
    res["host_ms_per_period_all_cohorts_1core"] = round(host_ms * C, 2)
    # the frontend parallelizes trivially per stream; everything else is
    # already one slab op. cores needed if ticks must not eat >50% of the
    # period (leaving the rest for the engine loop + jitter):
    res["cores_for_half_period"] = max(1, int(np.ceil(
        host_ms * C / (period_s * 1e3 * 0.5))))
    res["verdict_realtime_1core"] = host_ms * C < period_s * 1e3

    line = json.dumps(res)
    print(line)
    out = opt(argv, "--json", None, str)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv)
