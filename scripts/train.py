#!/usr/bin/env python3
"""Fine-tuning driver: RNN-T training over a mesh (NEW capability; the
reference engine is inference-only).

    train.py <model.gguf | --random> [--steps N] [--batch B] [--lr LR]
             [--model-parallel M] [--remat] [--save out.gguf]
             [--checkpoint ck.npz] [--resume ck.npz] [--cpu]
             [--task memorize|tones] [--tones N] [--utt-tones U]
             [--utt-tones-min M] [--history-max R] [--pool N]
             [--long-gap-prob P] [--ctc-weight W]
             [--tdt-durations 0,1,2,3] [--tdt-sigma S]
             [--val N] [--prefetch K]
             [--att-chunks 14,1] [--eval-every N] [--seed S]

Two built-in data plumbings:
  --task memorize   (default) fixed random batch -- exercises the full
                    pipeline (encoder, prediction net, joint, lattice loss,
                    adamw) without a dataset.
  --task tones      the synthetic tone-transcription dataset
                    (nemotron_tpu/utils/tones.py): REAL learnable audio ->
                    labels, used to produce weights with genuine decision
                    margins for the quantized-config accuracy harness
                    (scripts/token_agreement.py --gguf ...). FRESH audio is
                    rendered every step (prefetched host-side); --pool N
                    switches to a fixed pre-rendered pool, which is only
                    for overfit/debug -- a reused pool collapses into
                    prediction-network memorization (see TonesSampler).
                    Trains with streaming-equivalent chunked attention,
                    alternating over the --att-chunks list (NeMo-style
                    multi-latency training), and reports held-out
                    token-error-rate.

Wire a real (mel, labels) iterator in place of these for actual fine-tuning.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batch(cfg, batch, mel_frames=57, n_labels=5, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    t = mel_frames
    enc_frames = t
    for _ in range(3):
        enc_frames = enc_frames // 2 + 1
    return {
        "mel": jnp.asarray(rng.standard_normal((batch, t, cfg.n_mels)),
                           jnp.float32),
        "labels": jnp.asarray(
            rng.integers(0, cfg.vocab_size - 1, (batch, n_labels)),
            jnp.int32),
        "mel_lengths": jnp.full((batch,), enc_frames, jnp.int32),
        "label_lengths": jnp.full((batch,), n_labels, jnp.int32),
    }


def ter_on_batch(params, cfg, batch, att_chunk=None) -> float:
    """Greedy-decode a (device) batch and return token-error-rate vs its
    labels: sum(edit distance) / sum(label lengths) -- the WER analogue
    for the tones task (token == word)."""
    import jax

    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.utils.text import edit_distance

    enc = enc_mod.encode_batch(params, cfg, batch["mel"],
                               enc_lengths=batch["mel_lengths"],
                               att_chunk=att_chunk)
    B = enc.shape[0]
    dec_state = dec_mod.init_decoder_state(cfg, B, enc.dtype)
    if cfg.tdt_durations:
        from nemotron_tpu.models.tdt import tdt_greedy_decode

        tokens, _, _ = jax.jit(tdt_greedy_decode, static_argnums=1)(
            params, cfg, enc, dec_state, enc_lengths=batch["mel_lengths"])
    else:
        tokens, _ = jax.jit(dec_mod.greedy_decode, static_argnums=1)(
            params, cfg, enc, dec_state, enc_lengths=batch["mel_lengths"])
    tokens = np.asarray(tokens)
    labels = np.asarray(batch["labels"])
    lens = np.asarray(batch["label_lengths"])
    dist = tot = 0
    for i in range(B):
        hyp = [t for t, _f in dec_mod.tokens_to_list(tokens[i],
                                                     cfg.blank_token)]
        ref = labels[i, : lens[i]].tolist()
        dist += edit_distance(hyp, ref)
        tot += len(ref)
    return dist / max(tot, 1)


def main(argv: list[str]) -> int:
    def opt_val(name, default, cast):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    steps = opt_val("--steps", 20, int)
    batch = opt_val("--batch", 8, int)
    lr = opt_val("--lr", 1e-4, float)
    mp = opt_val("--model-parallel", 1, int)
    task = opt_val("--task", "memorize", str)
    seed = opt_val("--seed", 0, int)

    import jax
    import jax.numpy as jnp
    import optax

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
    from nemotron_tpu.parallel.mesh import (make_mesh, mel_sharding,
                                            param_shardings)
    from nemotron_tpu.training import make_train_step

    size = opt_val("--config", "full", str)
    if argv[1:] and argv[1] == "--random":
        if size == "tiny":
            cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                              d_ff=256, n_layers=4, vocab_size=64,
                              decoder_dim=64, joint_dim=64,
                              subsampling_channels=16)
        elif size == "small":
            cfg = ModelConfig(n_mels=64, d_model=192, n_heads=8, d_head=24,
                              d_ff=512, n_layers=6, vocab_size=64,
                              decoder_dim=128, joint_dim=128,
                              subsampling_channels=32)
        elif size == "mid":
            cfg = ModelConfig(n_mels=80, d_model=512, n_heads=8, d_head=64,
                              d_ff=2048, n_layers=8, vocab_size=256,
                              decoder_dim=320, joint_dim=320,
                              subsampling_channels=64)
        else:
            cfg = ModelConfig()
        # TDT family (--tdt-durations 0,1,2,3): widen the joint output by
        # the duration head; the lattice/decode switch keys off the config
        if "--tdt-durations" in argv:
            import dataclasses

            durs = tuple(int(d) for d in
                         opt_val("--tdt-durations", "", str).split(","))
            cfg = dataclasses.replace(cfg, tdt_durations=durs)
        arrays = P.random_weight_arrays(
            cfg, seed=seed,
            init="glorot" if task == "tones" else "bench",
            ctc_head=opt_val("--ctc-weight", 0.0, float) > 0)
    elif argv[1:] and not argv[1].startswith("--"):
        params, cfg, _ = P.load_model(argv[1], keep_quantized=False)
        arrays = None
    else:
        print(__doc__, file=sys.stderr)
        return 1

    pool = val = None
    att_chunks = [None]
    if task == "tones":
        from nemotron_tpu.frontend.preprocessor import mel_filterbank_slaney
        from nemotron_tpu.utils import tones

        n_tones = opt_val("--tones", 16, int)
        utt_tones = opt_val("--utt-tones", 10, int)
        # variable utterance length (default [max(1, U//3), U]): a fixed
        # count teaches the decoder to stop after exactly U tokens, which
        # silences it on continuous serving streams (utils/tones.py)
        utt_tones_min = opt_val("--utt-tones-min",
                                max(1, utt_tones // 3), int)
        # decoder warm-up history (utils/tones.py TonesSampler.history_max):
        # without it the prediction network learns the absolute emission
        # count and falls silent after U_max tokens on continuous streams
        hist_max = opt_val("--history-max", 192, int)
        # silence augmentation (utils/tones.py): probability that up to 2
        # random post-tone gaps per utterance are drawn long (0.5-2.0 s),
        # teaching "silence -> blank" -- required for a model that feeds
        # utterance endpointing (a gap-only model degenerates on silence)
        long_gap_prob = opt_val("--long-gap-prob", 0.0, float)
        # --pool 0 (default) = FRESH audio every step. A fixed pool is kept
        # only for overfit/debug runs: the lattice teacher-forces label
        # prefixes, so a reused pool lets the prediction network identify
        # and recall utterances while the encoder collapses to an
        # input-independent function (see utils/tones.py TonesSampler).
        pool_n = opt_val("--pool", 0, int)
        if n_tones >= cfg.vocab_size - 1:
            print(f"error: --tones {n_tones} must be < vocab-1", file=sys.stderr)
            return 1
        # a REAL mel filterbank (not the random-weights placeholder): the
        # tones are only separable through a frequency-sensitive frontend,
        # and the same filterbank ships in the saved GGUF so the accuracy
        # harness decodes with exactly the trained features
        fb = mel_filterbank_slaney(cfg.n_mels).astype(np.float32)
        win = np.hanning(400).astype(np.float32)
        if arrays is not None:
            arrays["preprocessor.featurizer.fb"] = fb
            arrays["preprocessor.featurizer.window"] = win
        val_n = opt_val("--val", 64, int)
        val = tones.make_dataset(val_n, utt_tones, n_tones, fb, win,
                                 cfg.n_mels, seed=seed + 999983)
        if pool_n:
            # disk-cache the rendered pool (deterministic in its params)
            cache = (f"/tmp/tones_pool_{pool_n}x{utt_tones}of{n_tones}"
                     f"_m{cfg.n_mels}_s{seed}.npz")
            if os.path.exists(cache):
                z = np.load(cache)
                pool = {k: z[k] for k in z.files}
                print(f"tones pool from cache: {cache}", file=sys.stderr)
            else:
                print(f"rendering tones pool: {pool_n} utts x {utt_tones} "
                      f"tones of {n_tones}", file=sys.stderr)
                pool = tones.make_dataset(pool_n, utt_tones, n_tones, fb,
                                          win, cfg.n_mels, seed=seed)
                np.savez(cache, **pool)
        # streaming-equivalent chunked attention sizes (enc frames/chunk):
        # default alternates the R=13 and R=0 chunk geometries
        cc13 = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
        cc0 = CacheConfig(att_right_context=0, n_mels=cfg.n_mels)
        default_chunks = f"{cc13.chunk_enc_len},{cc0.chunk_enc_len}"
        att_chunks = [None if c in ("none", "full") else int(c) for c in
                      opt_val("--att-chunks", default_chunks, str).split(",")]

    if arrays is not None:
        params = P.params_from_arrays(arrays, cfg)

    n_dev = len(jax.devices())
    mesh = make_mesh(model_parallel=mp if n_dev % max(mp, 1) == 0 else 1)
    params = jax.device_put(params, param_shardings(params, mesh))
    print(f"devices: {n_dev}, mesh {dict(mesh.shape)}, batch {batch}, "
          f"task {task}, att_chunks {att_chunks}", file=sys.stderr)

    warmup = min(100, max(steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup, decay_steps=max(steps, warmup + 1),
        end_value=lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)
    # Default 0: measured on the tones task, lambda=0.05 stalls training at
    # TER ~57% (the cumulative penalty over ~90 encoder frames, up to
    # ~4.5 nats, exceeds a tone's log(n_tones)=2.8-nat information content,
    # so emitting early random guesses beats waiting for audio); the same
    # run with lambda=0 reaches TER 0%. Use small values (<=0.01) when
    # trading latency for accuracy on real data.
    delay_pen = opt_val("--delay-penalty", 0.0, float)
    # hybrid RNNT-CTC: total = rnnt + W * ctc over the shared encoder
    # (requires a ctc head; --random adds one when W > 0)
    ctc_w = opt_val("--ctc-weight", 0.0, float)
    if ctc_w > 0 and params.ctc is None:
        print("error: --ctc-weight needs a model with a CTC head "
              "(ctc_decoder.* tensors; --random adds one)", file=sys.stderr)
        return 1
    if cfg.tdt_durations and delay_pen:
        print("error: --delay-penalty applies to the RNN-T lattice only "
              "(TDT trains duration-aware)", file=sys.stderr)
        return 1
    step_fns = {c: make_train_step(cfg, opt, remat="--remat" in argv,
                                   att_chunk=c, delay_penalty=delay_pen,
                                   ctc_weight=ctc_w,
                                   tdt_sigma=opt_val("--tdt-sigma", 0.05,
                                                     float))
                for c in att_chunks}

    if task == "tones" and not pool_n:
        # FRESH regime: double-buffered host prefetch; K workers each own
        # one (stateful) sampler, worker j%K renders step j. Data is
        # deterministic in (seed, step) regardless of worker, so --resume
        # reproduces the exact stream.
        import concurrent.futures

        val_dev = {k: jax.device_put(v) for k, v in val.items()}
        K = opt_val("--prefetch", 3, int)
        execs = [concurrent.futures.ThreadPoolExecutor(1) for _ in range(K)]
        samplers = [tones.TonesSampler(fb, win, cfg.n_mels, n_tones,
                                       utt_tones, batch, seed=seed + 1,
                                       tones_per_utt_min=utt_tones_min,
                                       history_max=hist_max,
                                       long_gap_prob=long_gap_prob)
                    for _ in range(K)]
        pending: dict = {}

        def _ensure(i):
            for j in range(i, min(i + K, steps)):
                if j not in pending:
                    pending[j] = execs[j % K].submit(
                        samplers[j % K].sample, j)

        def next_batch(i):
            _ensure(i)
            b = pending.pop(i).result()
            _ensure(i + 1)
            return b
    elif task == "tones":
        pool_dev = {k: jax.device_put(v) for k, v in pool.items()}
        val_dev = {k: jax.device_put(v) for k, v in val.items()}
        gather = jax.jit(lambda p, i: {k: v[i] for k, v in p.items()})
        data_rng = np.random.default_rng(seed + 1)
        pool_size = pool["labels"].shape[0]

        def next_batch(i):
            idx = jnp.asarray(
                data_rng.integers(0, pool_size, batch), jnp.int32)
            return gather(pool_dev, idx)
    else:
        bt = synthetic_batch(cfg, batch)
        bt = {k: (jax.device_put(v, mel_sharding(mesh)) if v.ndim == 3
                  else v) for k, v in bt.items()}

        def next_batch(i):
            return bt

    from nemotron_tpu.training import load_train_state, save_train_state

    start = 0
    if "--resume" in argv:
        ck = argv[argv.index("--resume") + 1]
        params, opt_state, start = load_train_state(ck, params, opt_state)
        print(f"resumed from {ck} at step {start}", file=sys.stderr)

    import time as _time

    ck = argv[argv.index("--checkpoint") + 1] if "--checkpoint" in argv \
        else None
    eval_every = opt_val("--eval-every", max(steps // 10, 1), int)
    t0 = _time.perf_counter()
    for i in range(start, steps):
        fn = step_fns[att_chunks[i % len(att_chunks)]]
        params, opt_state, loss = fn(params, opt_state, next_batch(i))
        if i % eval_every == 0 or i == steps - 1:
            msg = (f"step {i:5d}  loss {float(loss):.4f}"
                   f"  [{_time.perf_counter() - t0:.0f}s]")
            if val is not None:
                ter = ter_on_batch(params, cfg, val_dev,
                                   att_chunk=att_chunks[0])
                msg += f"  val TER {ter*100:.2f}%"
            print(msg, file=sys.stderr, flush=True)
            if ck is not None and i > start:
                # periodic snapshot so an hours-long run survives a crash;
                # write-then-rename keeps the previous snapshot loadable
                save_train_state(ck + ".tmp.npz", params, opt_state,
                                 step=i + 1)
                os.replace(ck + ".tmp.npz", ck)

    if ck is not None:
        save_train_state(ck, params, opt_state, step=steps)
        print(f"checkpointed to {ck}", file=sys.stderr)

    if "--save" in argv:
        out = argv[argv.index("--save") + 1]
        vocab = None
        if task == "tones":
            # readable vocab so demos/CLIs render transcripts, not bare ids
            # 7-byte GGUF entries: keep unused names short ("▁u17")
            vocab = ([f"▁T{i}" for i in range(n_tones)]
                     + [f"▁u{i}" for i in range(n_tones,
                                                cfg.vocab_size - 1)]
                     + ["<blank>"])
        P.save_model(out, jax.device_get(params), cfg, vocab=vocab)
        print(f"saved trained weights to {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
