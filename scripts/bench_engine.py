#!/usr/bin/env python3
"""End-to-end serving-engine benchmark (VERDICT r1 item 2).

Measures what a serving operator actually pays per tick, not just the raw
device step:

  lockstep  -- LockstepEngine.tick(): i16 PCM upload + ONE fused device
               program (on-device DSP + mel ring + encoder + greedy decode)
               + token download + vectorized detok.
  engine    -- ServingEngine feed_audio()+step(): per-slot host DSP, host
               mel buffering, masked fused step, vectorized detok (the
               continuous-batching path, slots at independent rates).

Per-tick wall-clock distribution over >=20 ticks (real per-tick p50/p90,
not chain averages). The sync RTT through the axon tunnel is measured and
reported separately; `p50_adj_ms` subtracts it (a co-located host pays ~none
of it).

Usage: python scripts/bench_engine.py [--quick] [--modes lockstep,engine]
                                      [--slots 512,768] [--ticks 24]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

REPO = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))
sys.path.insert(0, REPO)

LATENCY_BUDGET_MS = 120.0


def build(quick: bool):
    import jax.numpy as jnp

    from nemotron_tpu import params as P
    from nemotron_tpu.config import CacheConfig, ModelConfig

    if quick:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=2, vocab_size=64, decoder_dim=64,
                          joint_dim=64, subsampling_channels=16)
    else:
        cfg = ModelConfig()
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)

    arrays = P.random_weight_arrays(cfg, seed=0)
    # blank-biased joint: realistic speech-like emission rate (see bench.py)
    arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = 12.0
    base = P.params_from_arrays(arrays, cfg)
    return cfg, cc, base


def percentiles(ts):
    t = np.asarray(ts) * 1e3
    return {"p50_ms": round(float(np.percentile(t, 50)), 2),
            "p90_ms": round(float(np.percentile(t, 90)), 2),
            "mean_ms": round(float(t.mean()), 2),
            "n": len(ts)}


def measure_rtt():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1)(jnp.zeros((8,)))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_bandwidth(nbytes=16 << 20):
    """Host->device upload bandwidth (the axon tunnel is the bottleneck for
    end-to-end ticks; a co-located PCIe host is ~100x faster)."""
    import jax
    import jax.numpy as jnp

    x = np.zeros(nbytes // 2, np.int16)
    f = jax.jit(lambda a: jnp.sum(a.astype(jnp.int32)))
    jax.device_get(f(jnp.asarray(x)))  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(jnp.asarray(x)))
        ts.append(time.perf_counter() - t0)
    return nbytes / float(np.median(ts))


def bench_lockstep(cfg, cc, params, n_streams, ticks, dtype, kv_int8,
                   rng, pipelined=False) -> dict:
    import dataclasses

    from nemotron_tpu.streaming.lockstep import LockstepEngine

    cc_run = dataclasses.replace(cc, kv_cache_int8=kv_int8)
    eng = LockstepEngine(params, cfg, None, cc_run, n_streams=n_streams,
                         compute_dtype=dtype)
    n = cc.shift_samples
    audio = (rng.standard_normal((n_streams, n)) * 6000).astype(np.int16)

    step = eng.tick_pipelined if pipelined else eng.tick
    step(audio)       # compile tick-1 signature (residue 256)
    step(audio)       # compile steady-state signature
    step(audio)
    ts = []
    for _ in range(ticks):
        t0 = time.perf_counter()
        step(audio)
        ts.append(time.perf_counter() - t0)
    eng.flush_pipeline()
    stats = percentiles(ts)
    stats["tokens"] = sum(len(t) for t in eng.tokens)
    return stats


def bench_lockstep_pipelined(cfg, cc, params, n_streams, ticks, dtype,
                             kv_int8, rng) -> dict:
    return bench_lockstep(cfg, cc, params, n_streams, ticks, dtype, kv_int8,
                          rng, pipelined=True)


def bench_engine(cfg, cc, params, n_slots, ticks, dtype, kv_int8,
                 rng, dsp="auto") -> dict:
    import dataclasses

    from nemotron_tpu.streaming.serving import ServingEngine

    cc_run = dataclasses.replace(cc, kv_cache_int8=kv_int8)
    eng = ServingEngine(params, cfg, None, cc_run, n_slots=n_slots,
                        compute_dtype=dtype, dsp=dsp)
    eng.add_streams(n_slots)
    n = cc.shift_samples
    audio = (rng.standard_normal((n_slots, n)) * 6000).astype(np.int16)
    feed = {s: audio[s] for s in range(n_slots)}

    for _ in range(3):   # warm: fill buffers + compile masked step
        eng.feed_audio(feed)
        eng.step()
    ts, feed_ts, step_ts = [], [], []
    for _ in range(ticks):
        t0 = time.perf_counter()
        eng.feed_audio(feed)
        t1 = time.perf_counter()
        eng.step()
        t2 = time.perf_counter()
        ts.append(t2 - t0)
        feed_ts.append(t1 - t0)
        step_ts.append(t2 - t1)
    stats = percentiles(ts)
    stats["frontend_ms"] = round(float(np.median(feed_ts)) * 1e3, 2)
    stats["step_ms"] = round(float(np.median(step_ts)) * 1e3, 2)
    stats["tokens"] = sum(len(t) for t in eng.tokens)
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--modes", default="lockstep,lockstep-pipe,engine")
    ap.add_argument("--slots", default=None,
                    help="comma list of stream counts")
    ap.add_argument("--ticks", type=int, default=24)
    ap.add_argument("--dense", action="store_true",
                    help="dense bf16 instead of w8a8+int8kv")
    args = ap.parse_args()

    import jax

    # Persistent compile cache: for the TPU's slow compiles
    # only. CPU AOT cache entries are machine-feature stamped
    # and a loader mismatch warns of SIGILL (observed with
    # +prefer-no-scatter); CPU compiles are fast uncached.
    # Decided WITHOUT touching the backend: initializing it
    # here would defeat the env-var CPU pin (hermetic tests).
    import os as _os
    if _os.environ.get("JAX_PLATFORMS") != "cpu" \
            and "--cpu" not in sys.argv:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nemotron_tpu import params as P

    cfg, cc, base = build(args.quick)
    if args.quick:
        slot_list = [4]
        dtype = jnp.float32
        plans = [("bf16", base, False)]
    else:
        slot_list = [512, 768]
        dtype = jnp.bfloat16
        if args.dense:
            plans = [("bf16", base, False)]
        else:
            plans = [("w8a8-int8kv",
                      P.quantize_model_params(base, mode="w8a8"), True)]
    if args.slots:
        slot_list = [int(s) for s in args.slots.split(",")]

    rtt = measure_rtt()
    bw = measure_bandwidth()
    print(f"sync RTT {rtt*1e3:.1f} ms  upload ~{bw/1e6:.0f} MB/s  "
          f"device {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    results = {}
    for mode in args.modes.split(","):
        fn = {"lockstep": bench_lockstep,
              "lockstep-pipe": bench_lockstep_pipelined,
              "engine": bench_engine,
              "engine-native": functools.partial(bench_engine,
                                                 dsp="native"),
              "engine-numpy": functools.partial(bench_engine, dsp="numpy"),
              "engine-device": functools.partial(bench_engine,
                                                 dsp="device")}[mode]
        for (qname, params, kv8) in plans:
            for S in slot_list:
                key = f"{mode}/{qname}/{S}"
                try:
                    st = fn(cfg, cc, params, S, args.ticks, dtype, kv8, rng)
                except Exception as e:
                    print(f"{key}: {type(e).__name__}: {e}", file=sys.stderr)
                    continue
                st["p50_adj_ms"] = round(st["p50_ms"] - rtt * 1e3, 2)
                st["rtt_ms"] = round(rtt * 1e3, 2)
                results[key] = st
                print(f"{key}: p50 {st['p50_ms']} ms (adj "
                      f"{st['p50_adj_ms']}) p90 {st['p90_ms']} ms "
                      f"{st}", file=sys.stderr)

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
