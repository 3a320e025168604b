#!/usr/bin/env python3
"""Capture + summarize an xplane profile of the fused chunk step.

    profile_step.py [--batch 800] [--mode w8a8-int8kv|bf16] [--steps 3]
                    [--dir /tmp/xplane_step] [--top 25] [--quick]

Writes the raw trace (viewable in XProf/TensorBoard) and prints a
self-time-ranked HLO op table via the in-process xprof converter -- the
methodology behind docs/PERFORMANCE.md's "where a step goes" section.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=800)
    ap.add_argument("--mode", default="w8a8-int8kv")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/xplane_step")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rc", type=int, default=13,
                    help="latency mode (att_right_context)")
    ap.add_argument("--shared", action="store_true",
                    help="shared x-ring cache layout")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

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

    from nemotron_tpu import params as P
    from nemotron_tpu.config import CacheConfig, ModelConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming import session as sess_mod

    if args.quick:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=2, vocab_size=64, decoder_dim=64,
                          joint_dim=64, subsampling_channels=16)
        args.batch = min(args.batch, 8)
    else:
        cfg = ModelConfig()
    dtype = jnp.bfloat16
    cc = CacheConfig(att_right_context=args.rc, n_mels=cfg.n_mels)
    if args.mode.endswith("int8kv"):
        cc = dataclasses.replace(cc, kv_cache_int8=True)
    if args.shared:
        cc = dataclasses.replace(cc, shared_cache=True)

    arrays = P.random_weight_arrays(cfg, seed=0)
    arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = 12.0
    base = P.params_from_arrays(arrays, cfg)
    if args.mode.startswith("w8a8"):
        base = P.quantize_model_params(base, mode="w8a8")
    params = P.cast_params(base, dtype)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc, dtype=dtype)

    B = args.batch
    enc_state = enc_mod.init_encoder_state(cfg, cc, B, dtype)
    dec_state = dec_mod.init_decoder_state(cfg, B, dtype)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (B, cc.chunk_mel_frames, cfg.n_mels)), dtype)

    step = sess_mod.chunk_step
    # warmup/compile outside the trace
    tok, enc_state, dec_state = step(params, cfg, cc, mel, enc_state,
                                     dec_state, pos_heads)
    jax.device_get(jnp.sum(tok))

    os.makedirs(args.dir, exist_ok=True)
    jax.profiler.start_trace(args.dir)
    for _ in range(args.steps):
        tok, enc_state, dec_state = step(params, cfg, cc, mel, enc_state,
                                         dec_state, pos_heads)
    jax.device_get(jnp.sum(tok))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(args.dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print(f"no xplane.pb under {args.dir}", file=sys.stderr)
        return 1
    print(f"trace: {paths[-1]}", file=sys.stderr)

    try:
        from xprof.convert import raw_to_tool_data as r2t

        data, _ = r2t.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="replace")
        table = json.loads(data)
        # gviz-ish: {cols: [...], rows: [{c: [{v:...}...]}]}
        cols = [c.get("label") or c.get("id") for c in table["cols"]]
        rows = [[cell.get("v") if isinstance(cell, dict) else cell
                 for cell in r["c"]] for r in table["rows"]]

        def col(name_part):
            for i, c in enumerate(cols):
                if c and name_part.lower() in str(c).lower():
                    return i
            return None

        i_cat = col("category")
        i_expr = col("expression") or col("name")
        i_self = col("total self time (us)") or col("self time")
        i_pct = col("self time (%)")
        rows.sort(key=lambda r: -(r[i_self] or 0))
        total = sum(r[i_self] or 0 for r in rows)
        print(f"\ntotal device self time: {total / 1e3:.2f} ms over "
              f"{args.steps} steps "
              f"({total / 1e3 / args.steps:.2f} ms/step)")
        print(f"{'self ms/step':>12s}  {'%':>5s}  op")
        by_cat: dict[str, float] = {}
        for r in rows:
            by_cat[r[i_cat] or "?"] = (by_cat.get(r[i_cat] or "?", 0)
                                       + (r[i_self] or 0))
        for r in rows[: args.top]:
            expr = str(r[i_expr])[:90]
            print(f"{(r[i_self] or 0) / 1e3 / args.steps:12.3f}  "
                  f"{(r[i_pct] or 0):5.1f}  {expr}")
        print("\nby category (ms/step):")
        for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {v / 1e3 / args.steps:8.3f}  {k}")

        # model-stage buckets (VERDICT r4 item 8: name where the non-MXU
        # time goes). Substring classification over the fused-op
        # expressions -- rough, but the fusion names carry the source
        # op names and misclassification lands in 'other'.
        stage_pats = [
            ("attention", ("attn", "softmax", "rel_pos", "einsum")),
            ("ffn", ("ffn",)),
            ("conv_module", ("conv_module", "glu", "dwconv", "conformer_conv")),
            ("subsampling", ("subsampl", "pre_encode")),
            ("decoder_joint", ("lstm", "joint", "decoder", "greedy",
                               "argmax")),
            ("ring/cache", ("dynamic-update", "dynamic_update", "cache",
                            "ring", "scatter")),
            ("quant/dequant", ("quant", "convert", "clamp", "round")),
            ("data-format", ("transpose", "copy", "reshape", "bitcast",
                             "concatenate", "pad", "slice", "gather")),
        ]
        by_stage: dict[str, float] = {}
        for r in rows:
            expr = str(r[i_expr]).lower()
            for name, pats in stage_pats:
                if any(p in expr for p in pats):
                    by_stage[name] = by_stage.get(name, 0) + (r[i_self] or 0)
                    break
            else:
                by_stage["other"] = by_stage.get("other", 0) + (r[i_self] or 0)
        print("\nby model stage (ms/step, substring-bucketed):")
        for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1]):
            print(f"  {v / 1e3 / args.steps:8.3f}  {k}")
    except Exception as e:  # parser drift: leave the raw trace usable
        print(f"xprof parse failed ({type(e).__name__}: {e}); "
              f"open the trace dir in XProf instead", file=sys.stderr)
        return 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
