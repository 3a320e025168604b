#!/usr/bin/env python3
"""Greedy-decode joint trace (the reference's debug_joint_trace.py role,
reference scripts/debug_joint_trace.py:1-104): steps the RNN-T label loop
frame by frame through BOTH the JAX model and the numpy oracle on the same
encoder output, printing per symbol-step the decoder norms, top logits and
the emitted token, and stopping at the first divergence -- the tool for
localizing a greedy mismatch to decoder vs joint vs argmax tie.

    debug_joint_trace.py <model.gguf> [--frames N] [--seed S] [--cpu]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    frames = 8
    if "--frames" in argv:
        frames = int(argv[argv.index("--frames") + 1])
    seed = 1
    if "--seed" in argv:
        seed = int(argv[argv.index("--seed") + 1])

    import jax
    import jax.numpy as jnp

    from nemotron_tpu import gguf
    from nemotron_tpu.config import MAX_SYMBOLS_PER_STEP
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.oracle.model import OracleModel
    from nemotron_tpu.ops.lstm import lstm_step
    from nemotron_tpu.params import load_model

    params, cfg, _ = load_model(args[0], keep_quantized=False)
    g = gguf.read_gguf(args[0])
    oracle = OracleModel({n: t.to_numpy() for n, t in g.tensors.items()}, cfg)

    rng = np.random.default_rng(seed)
    enc = (rng.standard_normal((frames, cfg.d_model)) * 2).astype(np.float32)
    blank = cfg.blank_token

    # oracle state
    oh = np.zeros((cfg.decoder_layers, cfg.decoder_dim), np.float32)
    oc = np.zeros_like(oh)
    oprev = blank
    # jax state
    jst = dec_mod.init_decoder_state(cfg, 1)
    enc_proj = dec_mod.joint_project_enc(params.joint, jnp.asarray(enc))

    divergence = None
    for t in range(frames):
        for sym in range(MAX_SYMBOLS_PER_STEP):
            odec, oh2, oc2 = oracle.decoder_step(oprev, oh, oc)
            ologits = oracle.joint(enc[t], odec)
            otok = int(np.argmax(ologits))

            emb = jnp.asarray(params.decoder.embedding)[jst.prev_token]
            jdec, jh2, jc2 = lstm_step(params.decoder, emb, jst.h, jst.c)
            jlogits = dec_mod.joint_logits(params.joint, enc_proj[t][None],
                                           jdec)
            jtok = int(np.argmax(np.asarray(jlogits)[0]))

            jl = np.asarray(jlogits)[0]
            top = np.argsort(jl)[-3:][::-1]
            dec_diff = float(np.abs(np.asarray(jdec)[0] - odec).max())
            log_diff = float(np.abs(jl - ologits).max())
            mark = "" if jtok == otok else "   <-- TOKEN DIVERGES"
            print(f"frame {t:3d} sym {sym}: tok jax={jtok} oracle={otok} "
                  f"|dec diff {dec_diff:.2e} logit diff {log_diff:.2e} "
                  f"top3 {[(int(i), round(float(jl[i]), 3)) for i in top]}"
                  f"{mark}")
            if jtok != otok and divergence is None:
                divergence = (t, sym)

            if otok == blank or jtok == blank:
                # blank: state frozen, next frame
                # (reference src/nemo-ggml.cpp:1234-1245)
                break
            oprev, oh, oc = otok, oh2, oc2
            jst = dec_mod.DecoderState(
                h=jh2, c=jc2, prev_token=jnp.asarray([jtok], jnp.int32))
        if divergence:
            break

    if divergence:
        print(f"FIRST DIVERGENCE at frame {divergence[0]} "
              f"symbol {divergence[1]}")
        return 2
    print(f"no divergence over {frames} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
