#!/usr/bin/env python3
"""Token-agreement harness for the quantized serving configs (VERDICT r1
item 3): puts an accuracy number on every speed mode by comparing decoded
token sequences against the dense-f32 reference pipeline over long
multi-chunk streams.

The reference's quality gate is transcript-level output match
(reference scripts/compare_outputs.py:1-136); without real weights the
closest honest measurement is this: same audio, same model (random weights
but identical across configs), token-level agreement

    agreement = 1 - Levenshtein(tokens_cfg, tokens_f32) / max(len)

per latency mode, per serving config, over several seeds. A config that
perturbs decode decisions (bf16 rounding, int8 weights, int8 K/V) shows up
directly as token flips. Random weights are a HARSH case: logit margins are
smaller than for trained weights, so real-weight agreement should only be
better.

Round 3: `--gguf trained.gguf --tones N` runs the same harness on TRAINED
weights (scripts/train.py --task tones) over in-distribution tone streams,
and -- because the tone ground truth is known -- additionally reports true
token-error-rate (TER, the WER analogue: one token == one word) per
config. This is the measurement that settles whether the w8a8 headline's
low agreement on random weights was a zero-margin artifact or a real
accuracy loss.

Usage:
  python scripts/token_agreement.py [--full] [--seconds 60] [--seeds 2]
                                    [--modes 0,13] [--streams 4] [--json F]
                                    [--gguf trained.gguf] [--tones N]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def levenshtein(a: list[int], b: list[int]) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def synth_audio(n: int, seed: int) -> np.ndarray:
    """Speech-band synthetic signal: drifting tone mixture + noise bursts."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f0 = 120 + 80 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6))
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / 16000.0)
    for k in (3, 5, 8):
        sig += (0.15 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / 16000.0
                                   + rng.uniform(0, 6))
    env = np.clip(np.sin(2 * np.pi * 1.3 * t + rng.uniform(0, 6)), 0, 1)
    sig = sig * env + 0.05 * rng.standard_normal(n)
    return (sig * 12000).astype(np.int16)


def run_config(params, cfg, cc, dtype, audio, chunk_samples) -> list[list[int]]:
    """Decode all streams; returns per-stream token-id sequences."""
    from nemotron_tpu.streaming.session import StreamSession

    S = audio.shape[0]
    sess = StreamSession(params, cfg, None, cc, n_streams=S,
                         compute_dtype=dtype)
    n = audio.shape[1]
    for ofs in range(0, n, chunk_samples):
        sess.process(audio[:, ofs:ofs + chunk_samples])
    sess.finalize()
    return [[t for t, _f in sess.get_tokens(s)] for s in range(S)]


def make_w8a8_sq(host_base, cfg, calib_audio, att_chunk=None,
                 static_act=False):
    """SmoothQuant-folded W8A8 params (ops/smoothquant.py), calibrated on a
    held-out audio clip run through the real mel frontend. static_act=True
    additionally freezes the fold-site activation scales (w8a8-sq-static)."""
    import jax.numpy as jnp

    from nemotron_tpu import params as P
    from nemotron_tpu.config import PreprocessorConfig
    from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
    from nemotron_tpu.ops.smoothquant import smooth_quantize

    pre = StreamingPreprocessor(
        np.asarray(host_base.preprocessor.filterbank),
        np.asarray(host_base.preprocessor.window),
        n_streams=calib_audio.shape[0],
        cfg=PreprocessorConfig(n_mels=cfg.n_mels))
    mel = pre.process(calib_audio)
    return P.cast_params(
        smooth_quantize(P.cast_params(host_base, jnp.float32), cfg, mel,
                        att_chunk=att_chunk, static_act=static_act),
        jnp.bfloat16)


def run_seed(args, cfg, results, seed, audio, truths, base, base_bf16,
             w8a8, w8a8_sq=None, w8a8_sq_static=None) -> None:
    """Evaluate every (latency mode x serving config) on one seed's audio.

    Agreement is vs the dense-f32 decode; when `truths` (ground-truth label
    sequences, tones eval) is given, each config additionally gets a true
    token-error-rate  TER = sum(edit) / sum(len(truth))  -- the WER
    analogue (token == word for the tones task)."""
    import dataclasses
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig

    def ter_of(got):
        dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
        return dist / max(sum(len(t) for t in truths), 1)

    for mode in (int(m) for m in args.modes.split(",")):
        cc = CacheConfig(att_right_context=mode, n_mels=cfg.n_mels)
        cc8 = dataclasses.replace(cc, kv_cache_int8=True)
        cc4 = dataclasses.replace(cc, kv_cache_int4=True)
        chunk = cc.chunk_samples

        ref = run_config(base, cfg, cc, jnp.float32, audio, chunk)
        n_ref = sum(len(r) for r in ref)
        if n_ref == 0:
            print(f"seed {seed} R={mode}: reference emitted 0 tokens; "
                  "skipping (vacuous)", file=sys.stderr)
            continue
        if truths is not None:
            rt = ter_of(ref)
            results.setdefault(f"R{mode}/f32-ref", []).append(
                {"agreement": 1.0, "ref_tokens": n_ref, "flips": 0,
                 "ter": round(rt, 4), "seed": seed})
            print(f"seed {seed} R={mode:2d} {'f32-ref':18s} "
                  f"TER {rt*100:6.2f}%  ({n_ref} tokens / "
                  f"{sum(len(t) for t in truths)} truth)", file=sys.stderr)
        ccs = dataclasses.replace(cc, shared_cache=True)
        ccs8 = dataclasses.replace(cc8, shared_cache=True)
        configs = {
            "dense-bf16": (base_bf16, cc, jnp.bfloat16),
            "w8a8-bf16": (w8a8, cc, jnp.bfloat16),
            "w8a8-int8kv-bf16": (w8a8, cc8, jnp.bfloat16),
            "w8a8-int4kv-bf16": (w8a8, cc4, jnp.bfloat16),
            # shared x-ring layout (cc.shared_cache): same math with an
            # activation ring, so dense-shared gates layout correctness
            # and w8a8-shared-int8kv gates the capacity headline config
            "shared-bf16": (base_bf16, ccs, jnp.bfloat16),
            "w8a8-shared-int8kv-bf16": (w8a8, ccs8, jnp.bfloat16),
        }
        if w8a8_sq is not None:
            configs["w8a8-sq-bf16"] = (w8a8_sq, cc, jnp.bfloat16)
            configs["w8a8-sq-int8kv-bf16"] = (w8a8_sq, cc8, jnp.bfloat16)
        if w8a8_sq_static is not None:
            configs["w8a8-sq-static-bf16"] = (w8a8_sq_static, cc,
                                              jnp.bfloat16)
            configs["w8a8-sq-static-int8kv-bf16"] = (w8a8_sq_static, cc8,
                                                     jnp.bfloat16)
        if args.configs:
            keep = set(args.configs.split(","))
            configs = {k: v for k, v in configs.items() if k in keep}
        for name, (p, ccx, dt) in configs.items():
            got = run_config(p, cfg, ccx, dt, audio, chunk)
            dist = sum(levenshtein(g, r) for g, r in zip(got, ref))
            denom = sum(max(len(g), len(r), 1)
                        for g, r in zip(got, ref))
            agr = 1.0 - dist / denom
            key = f"R{mode}/{name}"
            rec = {"agreement": round(agr, 4), "ref_tokens": n_ref,
                   "flips": dist, "seed": seed}
            extra = ""
            if truths is not None:
                rec["ter"] = round(ter_of(got), 4)
                extra = f"  TER {rec['ter']*100:6.2f}%"
            results.setdefault(key, []).append(rec)
            print(f"seed {seed} R={mode:2d} {name:18s} "
                  f"agreement {agr*100:6.2f}%  "
                  f"({dist} edits / {n_ref} ref tokens){extra}",
                  file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full-size 0.6B model (TPU recommended)")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--modes", default="0,13",
                    help="latency modes (att_right_context values)")
    ap.add_argument("--blank-bias", type=float, default=3.0,
                    help="joint blank bias steering emission density")
    ap.add_argument("--saturate", action="store_true",
                    help="accept saturated emission (worst-case stress: "
                         "every frame emits to the MAX_SYMBOLS ceiling)")
    ap.add_argument("--configs", default=None,
                    help="comma list to limit configs (default: all)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gguf", default=None,
                    help="TRAINED weights (train.py --task tones --save); "
                         "skips blank-bias calibration")
    ap.add_argument("--tones", type=int, default=None,
                    help="evaluate on tone streams with N tones (must match "
                         "training); adds ground-truth TER per config")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache: for the TPU's slow compiles
    # only. CPU AOT cache entries are machine-feature stamped
    # and a loader mismatch warns of SIGILL (observed with
    # +prefer-no-scatter); CPU compiles are fast uncached.
    # Decided WITHOUT touching the backend: initializing it
    # here would defeat the env-var CPU pin (hermetic tests).
    if os.environ.get("JAX_PLATFORMS") != "cpu" \
            and "--cpu" not in sys.argv:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)

    from nemotron_tpu import params as P
    from nemotron_tpu.config import CacheConfig, ModelConfig

    trained_host = None
    if args.gguf:
        trained_host, cfg, _v = P.load_model(args.gguf, keep_quantized=False)
    elif args.full:
        cfg = ModelConfig()
    else:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=4, vocab_size=64,
                          decoder_dim=64, joint_dim=64,
                          subsampling_channels=16)

    results = {}
    n = int(args.seconds * 16000)
    for seed in range(args.seeds):
        truths = None
        if args.tones is not None:
            from nemotron_tpu.utils import tones as tones_mod

            audio, truths = tones_mod.make_eval_streams(
                args.streams, args.seconds, args.tones, seed=1000 + seed)
        else:
            audio = np.stack([synth_audio(n, 100 * seed + s)
                              for s in range(args.streams)])
        if trained_host is not None:
            # trained weights: natural emission, no blank-bias calibration;
            # seeds vary the evaluation audio only
            host_base = trained_host
            base = P.cast_params(host_base, jnp.float32)
            base_bf16 = P.cast_params(host_base, jnp.bfloat16)
            w8a8 = P.cast_params(
                P.quantize_model_params(host_base, mode="w8a8"),
                jnp.bfloat16)
            if args.tones is not None:
                cal_audio, _ = tones_mod.make_eval_streams(
                    2, min(args.seconds, 20.0), args.tones, seed=999)
            else:
                cal_audio = np.stack([synth_audio(min(n, 320000), 990 + s)
                                      for s in range(2)])
            w8a8_sq = make_w8a8_sq(host_base, cfg, cal_audio)
            w8a8_sq_static = make_w8a8_sq(host_base, cfg, cal_audio,
                                          static_act=True)
            run_seed(args, cfg, results, seed, audio, truths, base,
                     base_bf16, w8a8, w8a8_sq, w8a8_sq_static)
            continue
        arrays = P.random_weight_arrays(cfg, seed=seed)

        # Calibrate the blank bias to a speech-like emission rate: a bias
        # that silences the model entirely makes every config trivially
        # agree (0 tokens vs 0 tokens) — a vacuous run, not a measurement.
        # The bias retries patch ONE device leaf (joint out_b) instead of
        # rebuilding the pytree: a full rebuild re-uploads GBs per retry
        # on a slow host<->TPU link.
        def with_blank_bias(p, b):
            out_b = np.asarray(p.joint.out_b).copy()
            out_b[cfg.vocab_size - 1] = b
            return dataclasses.replace(
                p, joint=dataclasses.replace(
                    p.joint, out_b=jnp.asarray(out_b, p.joint.out_b.dtype)))

        cc0 = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
        base = P.cast_params(P.params_from_arrays(arrays, cfg), jnp.float32)
        # Bracketed search for a SPEECH-LIKE emission rate (~2-20 tok/s per
        # stream). Both failure modes make the measurement misleading:
        # zero emissions agree vacuously, and saturated emission (the
        # MAX_SYMBOLS ceiling, ~125 tok/s) flips on every argmax tie --
        # a worst case no trained model resembles.
        probe_secs = 4 * cc0.chunk_samples / 16000.0 * args.streams
        lo = hi = None   # lo: bias known too low (rate high); hi: too high
        bias = args.blank_bias
        applied = bias   # the bias actually baked into `base` (and probed)
        rate = None
        for _try in range(10):
            applied = bias
            base = with_blank_bias(base, bias)
            probe = run_config(base, cfg, cc0, jnp.float32,
                               audio[:, : 4 * cc0.chunk_samples],
                               cc0.chunk_samples)
            rate = sum(len(p) for p in probe) / probe_secs
            hi_rate = float("inf") if args.saturate else 25.0
            if 1.0 <= rate <= hi_rate:
                break
            if rate > hi_rate:
                lo = bias
            else:
                hi = bias
            if lo is None:
                bias -= 2.5
            elif hi is None:
                bias += 2.5
            else:
                bias = (lo + hi) / 2.0
            print(f"seed {seed}: emission rate {rate:.1f} tok/s/stream; "
                  f"retrying blank bias {bias:.2f}", file=sys.stderr)
        # If the search exhausted its tries, `bias` was updated once more
        # after the last probe but never applied to `base`; fall back to the
        # bias that actually produced the probed rate so the f32 reference
        # and every quantized config share the SAME blank bias.
        bias = applied
        if rate == 0:
            print(f"seed {seed}: model never emits; skipping", file=sys.stderr)
            continue
        print(f"seed {seed}: blank bias {bias:.2f} -> "
              f"{rate:.1f} tok/s/stream", file=sys.stderr)
        # one device copy per weight set, reused across modes/configs
        # (StreamSession's cast_params is idempotent on device pytrees);
        # quantization runs on the HOST pytree (numpy), then uploads once
        arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = bias
        host_base = P.params_from_arrays(arrays, cfg)
        base_bf16 = P.cast_params(host_base, jnp.bfloat16)
        w8a8 = P.cast_params(P.quantize_model_params(host_base, mode="w8a8"),
                             jnp.bfloat16)
        cal_audio = np.stack([synth_audio(min(n, 320000), 990 + s)
                              for s in range(2)])
        w8a8_sq = make_w8a8_sq(host_base, cfg, cal_audio)

        run_seed(args, cfg, results, seed, audio, truths, base, base_bf16,
                 w8a8, w8a8_sq)

    summary = {}
    for k, v in results.items():
        summary[k] = {"agreement_pct": round(
                          100 * float(np.mean([r["agreement"] for r in v])), 2),
                      "min_pct": round(
                          100 * min(r["agreement"] for r in v), 2),
                      "ref_tokens": sum(r["ref_tokens"] for r in v),
                      "runs": v}
        if any("ter" in r for r in v):
            summary[k]["ter_pct"] = round(
                100 * float(np.mean([r["ter"] for r in v if "ter" in r])), 2)
    out = json.dumps(summary, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
