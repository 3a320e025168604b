#!/usr/bin/env python3
"""Per-stage differential diff: JAX model vs numpy oracle on real weights
(the role of the reference's compare_layers.py / compare_subsampling.py /
debug_conv_layers.py / debug_joint_trace.py, folded into one tool).

    compare_layers.py <model.gguf> [mel.bin] [--chunks N] [--cpu]

Runs the batch encoder, per-layer streaming chunks, decoder step and joint
through BOTH implementations on the same input (a mel dump from gen_mel.py,
or synthetic mel if omitted) and prints max-abs/corr per stage.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stat(name, a, b):
    from nemotron_tpu.utils.dump import compare

    s = compare(np.asarray(a), np.asarray(b))
    flag = "OK " if s["max_abs"] < 1e-3 else "DIFF"
    print(f"  [{flag}] {name:28s} max_abs {s['max_abs']:.3e}  "
          f"mean_abs {s['mean_abs']:.3e}  corr {s['corr']:.6f}")
    return s["max_abs"]


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    n_chunks = 3
    if "--chunks" in argv:
        n_chunks = int(argv[argv.index("--chunks") + 1])

    import jax.numpy as jnp

    from nemotron_tpu import gguf
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.oracle.model import OracleModel, OracleStream
    from nemotron_tpu.params import load_model
    from nemotron_tpu.utils.dump import read_dump

    params, cfg, _vocab = load_model(args[0], keep_quantized=False)
    g = gguf.read_gguf(args[0])
    arrays = {n: t.to_numpy() for n, t in g.tensors.items()}
    oracle = OracleModel(arrays, cfg)

    if len(args) > 1:
        mel = read_dump(args[1]).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((200, cfg.n_mels)).astype(np.float32) * 2 - 8

    print(f"model {args[0]}: {cfg.n_layers} layers d_model={cfg.d_model}; "
          f"mel {mel.shape}")

    # batch path
    print("batch encoder:")
    want_sub = oracle.conv_subsampling(mel)
    from nemotron_tpu.ops.conv import conv_subsampling

    got_sub = conv_subsampling(params.subsampling, jnp.asarray(mel)[None])[0]
    stat("conv_subsampling", got_sub, want_sub)
    want_enc = oracle.encoder(mel)
    got_enc = enc_mod.encode_batch(params, cfg, jnp.asarray(mel)[None])[0]
    stat("encoder (all layers)", got_enc, want_enc)

    # decoder + joint on a few frames
    print("decoder/joint:")
    h = np.zeros((cfg.decoder_layers, cfg.decoder_dim), np.float32)
    c = np.zeros_like(h)
    dec_out, h, c = oracle.decoder_step(cfg.blank_token, h, c)
    st = dec_mod.init_decoder_state(cfg, 1)
    from nemotron_tpu.ops.lstm import lstm_step

    emb = jnp.asarray(params.decoder.embedding)[st.prev_token]
    got_dec, _, _ = lstm_step(params.decoder, emb, st.h, st.c)
    stat("decoder step", got_dec[0], dec_out)
    want_logits = oracle.joint(want_enc[0], dec_out)
    ep = dec_mod.joint_project_enc(params.joint, jnp.asarray(want_enc[:1]))
    got_logits = dec_mod.joint_logits(params.joint, ep[0], got_dec)
    stat("joint logits", got_logits[0], want_logits)

    # streaming chunks
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
    print(f"streaming chunks (R=13, {n_chunks} chunks):")
    ostream = OracleStream(oracle, cc)
    jstate = enc_mod.init_encoder_state(cfg, cc, 1)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    worst = 0.0
    for i in range(n_chunks):
        chunk = mel[i * cc.shift_mel_frames:][: cc.chunk_mel_frames]
        if chunk.shape[0] < cc.chunk_mel_frames:
            break
        want = ostream.encode_chunk(chunk)
        got, jstate = enc_mod.encode_chunk(params, cfg, cc,
                                           jnp.asarray(chunk)[None], jstate,
                                           pos_heads)
        worst = max(worst, stat(f"chunk {i} encoder out", got[0], want))
    return 0 if worst < 1e-2 else 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
