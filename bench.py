#!/usr/bin/env python3
"""Headline benchmark: concurrent real-time streams per chip.

Target metric (BASELINE.json): >=256 concurrent real-time streams per TPU
v5e chip at <120 ms p50 per-chunk latency, 1.12 s chunks (R=13 latency mode:
each fused chunk step advances every stream by 1.12 s of audio, so any step
time <= 1120 ms is real-time; the latency bar is the stricter <120 ms p50).

Protocol: full-size 0.6B model, bf16, random weights (no GGUF ships with the
repo; compute cost is weight-value-independent). The joint's blank bias is
raised so greedy decode emits blank-dominated frames like real speech
(~1 label-loop iteration per frame); random logits would otherwise always
run the 10-symbol worst case, which no real audio exhibits.

Prints ONE JSON line:
  {"metric": "realtime_streams_per_chip", "value": S, "unit": "streams",
   "vs_baseline": S/256, ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

LATENCY_BUDGET_S = 0.120   # p50 per-chunk latency bar
BASELINE_STREAMS = 256


def build_state(cfg, cc, params, batch, dtype):
    import jax.numpy as jnp

    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod

    enc_state = enc_mod.init_encoder_state(cfg, cc, batch, dtype)
    dec_state = dec_mod.init_decoder_state(cfg, batch, dtype)
    return enc_state, dec_state


def _sync(x):
    """Force completion of everything `x` depends on.

    On the tunneled `axon` TPU platform jax.block_until_ready does NOT
    actually block (verified: 0.03 ms reported for a 5.6 ms matmul), so the
    only reliable sync is a device->host transfer of a small dependent
    value."""
    import jax
    import jax.numpy as jnp

    return jax.device_get(jnp.sum(x))


def measure(step, params, cfg, cc, pos_heads, batch, dtype,
            chain_len=10, reps=20):
    """Per-chunk-step time, amortized over `chain_len` state-threaded steps
    per sync to cancel the host<->device round trip (~30-40 ms through the
    axon tunnel), which would otherwise dominate and is not intrinsic to the
    chip.

    Statistics are over `reps` independent chains (>= 20): each sample is a
    chain-mean of `chain_len` steps, so the reported p50/p90 are percentiles
    of CHAIN MEANS (keys say so) -- per-step tails tighter than the chain
    length cannot be observed through the tunnel, but with 20 samples the
    chain-to-chain spread (compilation jitter, tunnel noise) is real."""
    enc_state, dec_state = build_state(cfg, cc, params, batch, dtype)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    mel_np = rng.standard_normal(
        (batch, cc.chunk_mel_frames, cfg.n_mels), dtype=np.float32)
    mel = jnp.asarray(mel_np, dtype)

    # warmup / compile
    tokens, enc_state, dec_state = step(params, cfg, cc, mel, enc_state,
                                        dec_state, pos_heads)
    _sync(tokens)

    # round-trip baseline: sync on an already-computed array
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tokens)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    estimates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain_len):
            tokens, enc_state, dec_state = step(
                params, cfg, cc, mel, enc_state, dec_state, pos_heads)
        _sync(tokens)
        total = time.perf_counter() - t0
        estimates.append(max(total - rtt, 0.0) / chain_len)
    t = np.asarray(estimates)
    return {"p50": float(np.percentile(t, 50)),
            "p90": float(np.percentile(t, 90)),
            "mean": float(t.mean()),
            "n_chains": int(t.size),
            "chain_len": chain_len,
            "rtt": rtt}


def measure_device(step, params, cfg, cc, pos_heads, batch, dtype,
                   n_steps=110):
    """TRUE per-step latency percentiles from the device trace (VERDICT r2
    item 3): trace `n_steps` state-threaded steps and read each XLA module
    execution's duration off the TensorCore's own timeline
    (utils/xplane.py). Unlike the host chain-means, these are per-STEP
    times with real tails, immune to the ~30 ms tunnel RTT."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from nemotron_tpu.utils import xplane

    enc_state, dec_state = build_state(cfg, cc, params, batch, dtype)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal(
        (batch, cc.chunk_mel_frames, cfg.n_mels), dtype=np.float32), dtype)
    tokens, enc_state, dec_state = step(params, cfg, cc, mel, enc_state,
                                        dec_state, pos_heads)
    _sync(tokens)   # compile outside the trace
    with tempfile.TemporaryDirectory(prefix="bench_xplane_") as d:
        jax.profiler.start_trace(d)
        for _ in range(n_steps):
            tokens, enc_state, dec_state = step(
                params, cfg, cc, mel, enc_state, dec_state, pos_heads)
        _sync(tokens)
        jax.profiler.stop_trace()
        return xplane.step_percentiles(d, match="chunk_step")


def main() -> int:
    quick = "--quick" in sys.argv

    if not quick:
        # Fail fast (not hang) if the tunneled TPU is unreachable: a wedged
        # axon relay blocks PJRT init forever inside a C call, which no
        # in-process timeout can interrupt -- probe from a bounded
        # subprocess first. Observed once after an uncleanly killed client:
        # the pool-side lease wedged for >1 h and every new client slept in
        # the claim loop.
        import subprocess

        ok = False
        for attempt in range(3):
            try:
                r = subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=300, capture_output=True)
                ok = r.returncode == 0
            except subprocess.TimeoutExpired:
                ok = False
            if ok:
                break
            print(f"bench: device probe attempt {attempt + 1}/3 failed; "
                  "retrying in 120 s", file=sys.stderr, flush=True)
            time.sleep(120)
        if not ok:
            print("bench: device backend unreachable (probe timed out) -- "
                  "the axon relay/TPU lease is wedged; not a model "
                  "regression. Retry once the tunnel recovers.",
                  file=sys.stderr)
            return 3

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
    from nemotron_tpu.config import CacheConfig, ModelConfig
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import chunk_step

    dtype = jnp.bfloat16
    if quick:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=2, vocab_size=64, decoder_dim=64,
                          joint_dim=64, subsampling_channels=16)
        candidates = [4, 8]
    else:
        cfg = ModelConfig()
        # measured ladder (ring cache + gather-free pos bias, realistic
        # emission rate): 384 -> ~81 ms, 512 -> ~105 ms, vs the 120 ms bar.
        # Start at 512; 384 is the rescue size.
        candidates = [512, 640]
    import dataclasses

    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)  # 1.12 s chunks
    cc8 = dataclasses.replace(cc, kv_cache_int8=True)

    arrays = P.random_weight_arrays(cfg, seed=0)
    # Blank-biased joint so greedy decode emits at a realistic speech-like
    # rate (a handful of tokens per 1.12 s chunk across the whole batch).
    # Unbiased random logits would emit up to 10 symbols on every frame of
    # every stream -- a workload no real audio produces (the decode loop is
    # O(max tokens per chunk over the batch)).
    arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = 12.0
    base = P.params_from_arrays(arrays, cfg)
    params_bf16 = P.cast_params(base, dtype)
    pos_heads = enc_mod.precompute_pos_heads(params_bf16, cfg, cc,
                                             dtype=dtype)

    # Plan: dense-bf16 baseline, then W8A8 int8-MXU weights + int8 K/V
    # cache rings at larger batches. Measured ladder (head-major ring,
    # full layer unroll): bf16 640 -> ~116 ms (704 = 144); w8a8+int8kv
    # 768 -> ~112, 800 -> ~118, 832 -> ~128 vs the 120 ms bar. int8 dot
    # = ~390 TOPS on v5e.
    if quick:
        plan = [("bf16", params_bf16, b, cc) for b in candidates]
    else:
        params_w8a8 = P.cast_params(
            P.quantize_model_params(base, mode="w8a8"), dtype)
        plan = [("bf16", params_bf16, 640, cc),
                ("w8a8-int8kv", params_w8a8, 768, cc8),
                ("w8a8-int8kv", params_w8a8, 800, cc8)]

    results = {}
    best = 0
    best_stats = None
    best_mode = None
    for mode_name, p, batch, cc_run in plan:
        try:
            stats = measure(chunk_step, p, cfg, cc_run, pos_heads, batch,
                            dtype, chain_len=5 if quick else 10,
                            reps=2 if quick else 20)
        except Exception as e:  # OOM etc.
            print(f"{mode_name} batch {batch}: {type(e).__name__}",
                  file=sys.stderr)
            continue
        results[(mode_name, batch)] = stats
        print(f"{mode_name} batch {batch}: p50 {stats['p50']*1e3:.1f} ms "
              f"p90 {stats['p90']*1e3:.1f} ms", file=sys.stderr)
        if stats["p50"] <= LATENCY_BUDGET_S and batch > best:
            best, best_stats, best_mode = batch, stats, mode_name

    if best == 0 and not quick:
        # rescue: smaller dense batch
        try:
            stats = measure(chunk_step, params_bf16, cfg, cc, pos_heads, 384,
                            dtype)
            results[("bf16", 384)] = stats
            if stats["p50"] <= LATENCY_BUDGET_S:
                best, best_stats, best_mode = 384, stats, "bf16"
        except Exception as e:
            print(f"rescue batch 384: {type(e).__name__}", file=sys.stderr)

    if best == 0 and results:
        # nothing met the bar; report the smallest batch's real-time capacity
        (best_mode, best), best_stats = min(results.items(),
                                            key=lambda kv: kv[0][1])

    # device-derived per-step percentiles for the winning config (real
    # tails; the host stats above are chain-means through the tunnel)
    dev = None
    if best_stats is not None:
        dev_params = {"bf16": params_bf16}.get(
            best_mode, None if quick else params_w8a8)
        dev_cc = cc if best_mode == "bf16" else cc8
        try:
            dev = measure_device(chunk_step, dev_params or params_bf16, cfg,
                                 dev_cc, pos_heads, best, dtype,
                                 n_steps=10 if quick else 110)
            print(f"device trace: {dev['n_steps']} steps, "
                  f"p50 {dev['p50_ms']:.1f} p90 {dev['p90_ms']:.1f} "
                  f"p99 {dev['p99_ms']:.1f} ms", file=sys.stderr)
        except Exception as e:
            print(f"device trace failed ({type(e).__name__}: {e}); "
                  "host stats only", file=sys.stderr)

    # --- cohort stacking: the round-4 headline multiplier ----------------
    # At the single-slab winner the chip idles ~(1120-118)/1120 = 90% of
    # every chunk period; C phase-staggered cohorts reclaim it at UNCHANGED
    # per-chunk latency (each stream's chunk still computes in one ~118 ms
    # step; cohorts simply interleave in time). Measured r4: per-step p50
    # does not degrade with extra resident cohorts (118.3 ms at C=2,
    # 118.8 at C=3); HBM binds at ~2560-2688 total streams
    # (docs/bench_cohorts_r4*.json). Qualify C*B as the headline iff the
    # per-step p50 still meets the latency bar AND the staggered round
    # fits the chunk period.
    cohort = None
    if not quick and best > 0 and best_mode == "w8a8-int8kv":
        # Run in a SUBPROCESS (scripts/bench_cohorts.py, the measured r4
        # harness): C cohorts' states need a clean HBM arena -- after this
        # process's dense/w8a8 ladder churn the BFC arena is fragmented
        # enough that even C=2 x 800 ResourceExhausts in-process, while a
        # fresh backend fits C=3 x 800 with room (docs/bench_cohorts_r4*).
        #
        # Attempt ladder (round 5): the SHARED x-ring layout first -- half
        # the attention state per stream buys C=9 cohorts (measured r5:
        # 9 x 608 = 5472 streams, per-step p50 106.5 ms, round 959 ms;
        # 9 x 624 = 5616 fits but leaves only 5% period headroom) -- then
        # the split-ring r4 ladder as fallback.
        import os
        import subprocess
        import tempfile

        chunk_period_s = cc.shift_mel_frames * 0.010
        for C, B, extra in ((9, 608, ["--shared"]),
                            (8, 640, ["--shared"]),
                            (7, 640, ["--shared"]),
                            (3, best, []),
                            (2, best, [])):
            out_json = tempfile.mktemp(suffix=".json")
            try:
                r = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "scripts", "bench_cohorts.py"),
                     "--cohorts", str(C), "--batch", str(B),
                     "--rounds", "12", "--json", out_json] + extra,
                    capture_output=True, text=True, timeout=1800)
                res = (json.load(open(out_json))
                       if r.returncode == 0 and os.path.exists(out_json)
                       else None)
            except (subprocess.TimeoutExpired, OSError,
                    json.JSONDecodeError):
                res = None
            finally:
                if os.path.exists(out_json):
                    os.remove(out_json)
            if res is None:
                print(f"cohorts C={C} x B={B}{extra}: failed (likely OOM)",
                      file=sys.stderr)
                continue
            r50 = res["round_p50_ms"] / 1e3
            step50 = res["step_p50_ms"] / 1e3
            print(f"cohorts C={C} x B={B}{extra}: round p50 "
                  f"{r50*1e3:.1f} ms, per-step p50 {step50*1e3:.1f} ms",
                  file=sys.stderr)
            if step50 <= LATENCY_BUDGET_S and r50 <= chunk_period_s:
                cohort = {"cohorts": C, "batch": B,
                          "round_p50_ms": round(r50 * 1e3, 1),
                          "step_p50_ms": round(step50 * 1e3, 1),
                          "layout": ("shared-x-ring" if extra
                                     else "split-kv-ring")}
                break

    value = cohort["cohorts"] * cohort["batch"] if cohort else best
    out = {
        "metric": "realtime_streams_per_chip",
        "value": value,
        "unit": "streams",
        "vs_baseline": value / BASELINE_STREAMS,
        "cohorts": cohort,
        "p50_chunk_latency_ms": round(best_stats["p50"] * 1e3, 2) if best_stats else None,
        "p90_chunk_latency_ms": round(best_stats["p90"] * 1e3, 2) if best_stats else None,
        "latency_stat": ("p50/p90 over %d chain-means (%d steps/chain), "
                         "RTT-cancelled" % (best_stats["n_chains"],
                                            best_stats["chain_len"])
                         ) if best_stats else None,
        "sync_rtt_ms": round(best_stats["rtt"] * 1e3, 2) if best_stats else None,
        "device_p50_ms": round(dev["p50_ms"], 2) if dev else None,
        "device_p90_ms": round(dev["p90_ms"], 2) if dev else None,
        "device_p99_ms": round(dev["p99_ms"], 2) if dev else None,
        "device_trace_steps": dev["n_steps"] if dev else None,
        "latency_budget_ms": LATENCY_BUDGET_S * 1e3,
        "chunk_audio_ms": cc.shift_mel_frames * 10,
        "mode": f"R=13 {best_mode} fused chunk step "
                "(encoder + on-device greedy decode)"
                + (f", {cohort['cohorts']} phase-staggered cohorts x "
                   f"{cohort['batch']} streams, {cohort['layout']} "
                   "(per-chunk latency = the cohort step p50; see "
                   "docs/capacity_r5.json)"
                   if cohort else ""),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
