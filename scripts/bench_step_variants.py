#!/usr/bin/env python3
"""Device-step microbenchmarks for optimization decisions: measures the raw
fused chunk_step (bench.py protocol: state-threaded chains, RTT-cancelled)
across batch sizes and implementation variants.

    bench_step_variants.py [--batches 768,896] [--unroll 1,4,24]
                           [--modes w8a8-int8kv] [--chains 4] [--len 10]

Variants are selected via the NEMOTRON_TPU_* env knobs, applied before each
compile (the scan-unroll knob is read at trace time).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="768,896")
    ap.add_argument("--unroll", default="1,24")
    ap.add_argument("--attn", default="xla",
                    help="comma list: xla,pallas (NEMOTRON_TPU_ATTN)")
    ap.add_argument("--attn-block", default="8")
    ap.add_argument("--modes", default="w8a8-int8kv")
    ap.add_argument("--rc", default="13",
                    help="comma list of right-context latency modes "
                         "(0,1,6,13): per-step real-time budget is the "
                         "mode's shift span (80/160/560/1120 ms)")
    ap.add_argument("--fuse", default="1",
                    help="comma list of K: trace K chained chunk steps in ONE "
                         "jitted program (amortizes the per-call K/V ring "
                         "parameter relayout across K chunks; reported "
                         "ms/step is per CHUNK)")
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--len", type=int, default=10, dest="chain_len")
    ap.add_argument("--beam", type=int, default=1,
                    help="beam width K: bench the fused encoder+BEAM step "
                         "(chunk_step_beam) instead of greedy -- the "
                         "streams-per-chip cost of beam quality "
                         "(VERDICT r3 item 7)")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

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
    import dataclasses

    import jax.numpy as jnp

    from nemotron_tpu import params as P
    from nemotron_tpu.config import CacheConfig, ModelConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming import session as sess_mod

    if args.quick:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=2, vocab_size=64, decoder_dim=64,
                          joint_dim=64, subsampling_channels=16)
        batches = [4]
    else:
        cfg = ModelConfig()
        batches = [int(b) for b in args.batches.split(",")]
    dtype = jnp.float32 if args.quick else jnp.bfloat16
    rcs = [int(r) for r in args.rc.split(",")]

    arrays = P.random_weight_arrays(cfg, seed=0)
    arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = 12.0
    base = P.params_from_arrays(arrays, cfg)
    params_by_mode = {}
    cc = CacheConfig(att_right_context=rcs[0], n_mels=cfg.n_mels)
    for m in args.modes.split(","):
        if m == "bf16":
            params_by_mode[m] = (P.cast_params(base, dtype), cc)
        elif m == "w8a8":
            params_by_mode[m] = (
                P.cast_params(P.quantize_model_params(base, "w8a8"), dtype),
                cc)
        elif m == "bf16-int8kv":
            params_by_mode[m] = (
                P.cast_params(base, dtype),
                dataclasses.replace(cc, kv_cache_int8=True))
        elif m == "w8a8-int8kv":
            params_by_mode[m] = (
                P.cast_params(P.quantize_model_params(base, "w8a8"), dtype),
                dataclasses.replace(cc, kv_cache_int8=True))
        elif m == "w8a8-int4kv":
            params_by_mode[m] = (
                P.cast_params(P.quantize_model_params(base, "w8a8"), dtype),
                dataclasses.replace(cc, kv_cache_int4=True))
        elif m in ("w8a8-static", "w8a8-static-int8kv"):
            # static calibrated activation scales (no per-token abs-max):
            # calibrate on synthetic audio through the real frontend
            from nemotron_tpu.config import PreprocessorConfig
            from nemotron_tpu.frontend.preprocessor import (
                StreamingPreprocessor)
            from nemotron_tpu.ops.smoothquant import smooth_quantize

            pre = StreamingPreprocessor(
                np.asarray(base.preprocessor.filterbank),
                np.asarray(base.preprocessor.window), n_streams=2,
                cfg=PreprocessorConfig(n_mels=cfg.n_mels))
            calib = (np.random.default_rng(7)
                     .standard_normal((2, 10 * 16000)) * 6000
                     ).astype(np.int16)
            mel = pre.process(calib)
            sp = smooth_quantize(P.cast_params(base, jnp.float32), cfg, mel,
                                 att_chunk=cc.chunk_enc_len,
                                 static_act=True)
            params_by_mode[m] = (
                P.cast_params(sp, dtype),
                dataclasses.replace(cc, kv_cache_int8="int8kv" in m))
        else:
            raise SystemExit(f"unknown mode {m}")

    def sync(x):
        return jax.device_get(jnp.sum(x))

    results = {}
    rng = np.random.default_rng(0)
    os.environ["NEMOTRON_TPU_ATTN_BLOCK"] = args.attn_block
    for variant in [(u, a) for u in args.unroll.split(",")
                    for a in args.attn.split(",")]:
        unroll, attn = int(variant[0]), variant[1]
        os.environ["NEMOTRON_TPU_SCAN_UNROLL"] = str(unroll)
        os.environ["NEMOTRON_TPU_ATTN"] = attn
        for mode, (params, cc_mode) in params_by_mode.items():
          for rc in rcs:
            cc_run = dataclasses.replace(cc_mode, att_right_context=rc)
            pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc_run,
                                                     dtype=dtype)
            for fuse in [int(k) for k in args.fuse.split(",")]:
              for B in batches:
                # fresh jit cache per variant (env knob is trace-time)
                if args.beam > 1:
                    from nemotron_tpu.models import beam as beam_mod

                    def fused(p, mels, es, ds, ph, _cc=cc_run, _k=fuse):
                        for i in range(_k):
                            es, ds = sess_mod.chunk_step_beam.__wrapped__(
                                p, cfg, _cc, mels[i], es, ds, ph,
                                args.beam, 10)
                        return ds.scores, es, ds
                else:
                    def fused(p, mels, es, ds, ph, _cc=cc_run, _k=fuse):
                        # K chained chunk steps traced into ONE program: the
                        # K/V ring parameter relayout (the dominant
                        # data-formatting tax, PERFORMANCE.md floor analysis)
                        # happens once per CALL, not once per chunk.
                        out = []
                        for i in range(_k):
                            toks, es, ds = \
                                sess_mod._chunk_step_jit.__wrapped__(
                                    p, cfg, _cc, mels[i], es, ds, ph)
                            out.append(toks)
                        return jnp.stack(out), es, ds
                step = jax.jit(fused, donate_argnums=(2, 3))
                try:
                    # state init is itself a device allocation: an OOM at
                    # a too-big batch must skip the point, not kill the
                    # whole ladder
                    es = enc_mod.init_encoder_state(cfg, cc_run, B, dtype)
                    if args.beam > 1:
                        # steady-state beam serving: the K-hypothesis slab;
                        # tokens buffer sized for ~5 min of emissions
                        ds = beam_mod.init_beam_state(
                            cfg, B, args.beam, 4096, dtype)
                    else:
                        ds = dec_mod.init_decoder_state(cfg, B, dtype)
                    mel = jnp.asarray(rng.standard_normal(
                        (fuse, B, cc_run.chunk_mel_frames, cfg.n_mels)),
                        dtype)
                    toks, es, ds = step(params, mel, es, ds, pos_heads)
                    sync(toks)
                except Exception as e:
                    print(f"unroll={unroll} {mode} fuse={fuse} B={B}: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
                    continue
                rtts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    sync(toks)
                    rtts.append(time.perf_counter() - t0)
                rtt = float(np.median(rtts))
                est = []
                for _ in range(args.chains):
                    t0 = time.perf_counter()
                    for _ in range(args.chain_len):
                        toks, es, ds = step(params, mel, es, ds, pos_heads)
                    sync(toks)
                    est.append(max(time.perf_counter() - t0 - rtt, 0)
                               / (args.chain_len * fuse))
                key = f"unroll{unroll}-{attn}/{mode}/B{B}" + (
                    f"/fuse{fuse}" if fuse != 1 else "") + (
                    f"/R{rc}" if rc != 13 else "") + (
                    f"/beam{args.beam}" if args.beam > 1 else "")
                ms = sorted(x * 1e3 for x in est)
                results[key] = {"p50_ms": round(ms[len(ms) // 2], 2),
                                "min_ms": round(ms[0], 2),
                                "max_ms": round(ms[-1], 2)}
                print(f"{key}: {results[key]}", file=sys.stderr)

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
