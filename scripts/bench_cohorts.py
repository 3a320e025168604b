#!/usr/bin/env python3
"""Phase-staggered cohort capacity bench (see streaming/cohorts.py).

At the single-slab headline the chip idles ~90% of each 1.12 s chunk
period (the <120 ms latency bar binds, not throughput). C staggered
cohorts of B streams reclaim that idle time: capacity C*B at unchanged
per-chunk latency, bounded by

    compute:  C <= floor(chunk_period / step_time)
    memory:   C*B state sets + weights + activations <= HBM

Two measurement modes:

  default (device capacity): allocate C cohorts' encoder/decoder state
      on one chip and run staggered fused chunk steps round-robin over
      them, chained between syncs (bench.py protocol, RTT-cancelled).
      Proves the memory fits AND the step time does not degrade with C
      state sets resident. The real-time check is C * per-step p50 <
      chunk period.

  --e2e: CohortScheduler end-to-end (LockstepEngine ticks, on-device
      DSP, pipelined): wall-clock per staggered round of C ticks
      including PCM staging and the dev tunnel. Through a ~113 MB/s
      tunnel the upload dominates; co-located hosts pay PCIe instead
      (docs/PERFORMANCE.md).

    bench_cohorts.py [--cohorts C] [--batch B] [--mode bf16|w8a8-int8kv]
                     [--rounds N] [--e2e] [--kv-int4] [--quick] [--json F]
                     [--rc R] [--shared] [--beam K] [--serving]

Round-5 additions (VERDICT r4 items 3+4):
  --rc R      latency mode (att_right_context; default 13). The real-time
              budget scales with the mode's chunk period (R0: 80 ms, R1:
              160 ms, R6: 560 ms, R13: 1120 ms).
  --shared    shared channel cache (x-ring): half the attention state
              bytes per stream, K/V recomputed per step on the MXU.
  --beam K    fused beam-K step instead of greedy (beam cohort capacity).
  --serving   cohorts of RAGGED ServingEngines (ServingCohorts) instead
              of the device-capacity slab: end-to-end engine ticks with
              per-slot bookkeeping, all slots active.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chunk period (the real-time budget) is derived from the latency mode:
# cc.shift_samples / cc.sample_rate (R13 = 1.120 s)


def opt(argv, name, default, cast):
    if name not in argv:
        return default
    raw = argv[argv.index(name) + 1]
    try:
        return cast(raw)
    except ValueError:
        print(f"error: invalid value for {name}: {raw!r}", file=sys.stderr)
        raise SystemExit(1)


def build(argv, quick):
    import jax.numpy as jnp

    from nemotron_tpu import params as P
    from nemotron_tpu.config import CacheConfig, ModelConfig

    if quick:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=2, vocab_size=64,
                          decoder_dim=64, joint_dim=64,
                          subsampling_channels=16)
    else:
        cfg = ModelConfig()
    rc = opt(argv, "--rc", 13, int)
    cc = CacheConfig(att_right_context=rc, n_mels=cfg.n_mels)
    if "--shared" in argv:
        cc = dataclasses.replace(cc, shared_cache=True)
    mode = opt(argv, "--mode", "bf16" if quick else "w8a8-int8kv", str)
    if mode not in ("bf16", "w8a8-int8kv"):
        print(f"error: unknown --mode {mode!r}", file=sys.stderr)
        raise SystemExit(1)
    if mode.endswith("int8kv"):
        cc = dataclasses.replace(cc, kv_cache_int8=True)
    if "--kv-int4" in argv:
        cc = dataclasses.replace(cc, kv_cache_int8=False, kv_cache_int4=True)

    arrays = P.random_weight_arrays(cfg, seed=0)
    # blank-biased joint = speech-like emission rate (bench.py rationale)
    arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = 12.0
    base = P.params_from_arrays(arrays, cfg)
    if mode.startswith("w8a8"):
        base = P.quantize_model_params(base, mode="w8a8")
    params = P.cast_params(base, jnp.bfloat16)
    return params, cfg, cc, mode


def bench_device(params, cfg, cc, C, B, rounds, quick, period_s, beam=1):
    """C cohorts' states resident; staggered chunk steps round-robin."""
    import jax.numpy as jnp

    from bench import _sync  # noqa: E402  (repo-root bench.py helpers)
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import chunk_step, chunk_step_beam

    dtype = jnp.bfloat16
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc, dtype=dtype)
    if beam > 1:
        from nemotron_tpu.models import beam as beam_mod

        states = [(enc_mod.init_encoder_state(cfg, cc, B, dtype),
                   beam_mod.init_beam_state(cfg, B, beam, 4096, dtype))
                  for _ in range(C)]

        def step(enc, dec, mel):
            enc, dec = chunk_step_beam(params, cfg, cc, mel, enc, dec,
                                       pos_heads, beam, 10)
            return dec.scores, enc, dec
    else:
        states = [(enc_mod.init_encoder_state(cfg, cc, B, dtype),
                   dec_mod.init_decoder_state(cfg, B, dtype))
                  for _ in range(C)]

        def step(enc, dec, mel):
            return chunk_step(params, cfg, cc, mel, enc, dec, pos_heads)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (B, cc.chunk_mel_frames, cfg.n_mels), dtype=np.float32), dtype)

    # compile once (the executable is shared across cohorts: same shapes)
    t0 = time.perf_counter()
    for c in range(C):
        enc, dec = states[c]
        tokens, enc, dec = step(enc, dec, mel)
        states[c] = (enc, dec)
    _sync(tokens)
    print(f"warmup (compile + {C} cohort first-steps): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)

    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tokens)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    # each chain = one staggered round: C steps, one per cohort
    per_round = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for c in range(C):
            enc, dec = states[c]
            tokens, enc, dec = step(enc, dec, mel)
            states[c] = (enc, dec)
        _sync(tokens)
        per_round.append(max(time.perf_counter() - t0 - rtt, 0.0))
    r = np.asarray(per_round)
    step_p50 = float(np.percentile(r, 50)) / C
    return {
        "round_p50_ms": float(np.percentile(r, 50)) * 1e3,
        "round_p90_ms": float(np.percentile(r, 90)) * 1e3,
        "step_p50_ms": step_p50 * 1e3,
        "rtt_ms": rtt * 1e3,
        "rounds": rounds,
        "realtime": float(np.percentile(r, 50)) < period_s,
        "compute_headroom_cohorts": int(period_s // step_p50)
        if step_p50 > 0 else None,
    }


def bench_e2e(params, cfg, cc, C, B, rounds, quick, period_s, beam=1):
    """CohortScheduler end-to-end: staggered pipelined LockstepEngine
    ticks including PCM staging + tunnel transfer."""
    from nemotron_tpu.streaming.cohorts import CohortScheduler

    sched = CohortScheduler(params, cfg, None, cc, n_streams=B,
                            n_cohorts=C)
    rng = np.random.default_rng(0)
    n = cc.shift_samples

    def block():
        return (rng.standard_normal((B, n)) * 6000).astype(np.int16)

    # warmup: two full rounds -- the pipelined path's steady-state program
    # shape differs from the bootstrap tick, so round 1 alone leaves a
    # compile inside the measurement
    for _ in range(2):
        for c in range(C):
            sched.tick(c, block(), pipelined=True)

    per_tick, per_round = [], []
    for _ in range(rounds):
        r0 = time.perf_counter()
        for c in range(C):
            t0 = time.perf_counter()
            sched.tick(c, block(), pipelined=True)
            per_tick.append(time.perf_counter() - t0)
        per_round.append(time.perf_counter() - r0)
    t, r = np.asarray(per_tick), np.asarray(per_round)
    return {
        "tick_p50_ms": float(np.percentile(t, 50)) * 1e3,
        "tick_p90_ms": float(np.percentile(t, 90)) * 1e3,
        "round_p50_ms": float(np.percentile(r, 50)) * 1e3,
        "round_p90_ms": float(np.percentile(r, 90)) * 1e3,
        "rounds": rounds,
        "realtime": float(np.percentile(r, 50)) < period_s,
        "note": "pipelined ticks (+1 tick text latency); includes host "
                "PCM staging and the dev-tunnel transfer",
    }


def bench_serving(params, cfg, cc, C, B, rounds, quick, period_s, beam=1):
    """ServingCohorts: C cohorts of RAGGED ServingEngines, every slot
    active and fed one chunk per tick -- the engine's full per-slot
    bookkeeping (buffering, masking, emission extraction) included. The
    ragged engine's worst case is all-slots-advance, which is what this
    measures; real arrival patterns only lighten each tick."""
    from nemotron_tpu.streaming.cohorts import ServingCohorts

    dsp = opt(sys.argv, "--dsp", "auto", str)
    sched = ServingCohorts(params, cfg, None, cc, n_slots=B, n_cohorts=C,
                           beam_size=beam if beam > 1 else 1, dsp=dsp)
    ids = [[sched.add_stream(cohort=c) for _ in range(B)]
           for c in range(C)]
    rng = np.random.default_rng(0)
    n = cc.shift_samples

    def feed(c):
        block = (rng.standard_normal((B, n)) * 6000).astype(np.int16)
        sched.feed_audio({gid: block[i] for i, gid in enumerate(ids[c])})

    for _ in range(2):                       # warmup: compile + steady state
        for c in range(C):
            feed(c)
            sched.step(c)

    per_tick, per_round = [], []
    for _ in range(rounds):
        r0 = time.perf_counter()
        for c in range(C):
            t0 = time.perf_counter()
            feed(c)
            sched.step(c)
            per_tick.append(time.perf_counter() - t0)
        per_round.append(time.perf_counter() - r0)
    t, r = np.asarray(per_tick), np.asarray(per_round)
    return {
        "tick_p50_ms": float(np.percentile(t, 50)) * 1e3,
        "tick_p90_ms": float(np.percentile(t, 90)) * 1e3,
        "round_p50_ms": float(np.percentile(r, 50)) * 1e3,
        "round_p90_ms": float(np.percentile(r, 90)) * 1e3,
        "rounds": rounds,
        "realtime": float(np.percentile(r, 50)) < period_s,
        "note": "ragged ServingEngine cohorts, all slots advancing "
                "(worst case); includes host PCM staging + per-slot "
                "bookkeeping + the dev-tunnel transfer",
    }


def main(argv):
    quick = "--quick" in argv
    if quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
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

    C = opt(argv, "--cohorts", 2, int)
    B = opt(argv, "--batch", 4 if quick else 800, int)
    rounds = opt(argv, "--rounds", 3 if quick else 20, int)
    beam = opt(argv, "--beam", 1, int)

    params, cfg, cc, mode = build(argv, quick)
    period_s = cc.shift_samples / cc.sample_rate
    fn = (bench_serving if "--serving" in argv
          else bench_e2e if "--e2e" in argv else bench_device)
    res = fn(params, cfg, cc, C, B, rounds, quick, period_s, beam=beam)
    res.update({
        "bench": ("serving" if "--serving" in argv
                  else "e2e" if "--e2e" in argv else "device"),
        "mode": mode + ("-int4kv" if "--kv-int4" in argv else "")
        + ("-shared" if "--shared" in argv else "")
        + (f"-beam{beam}" if beam > 1 else ""),
        "rc": cc.att_right_context,
        "cohorts": C, "batch": B,
        "streams_total": C * B,
        "chunk_period_ms": period_s * 1e3,
    })
    line = json.dumps(res)
    print(line)
    out = opt(argv, "--json", None, str)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
