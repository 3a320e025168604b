#!/usr/bin/env python3
"""Fine-tuning driver: RNN-T training over a mesh (NEW capability; the
reference engine is inference-only).

    train.py <model.gguf | --random> [--steps N] [--batch B] [--lr LR]
             [--model-parallel M] [--remat] [--save out.gguf]
             [--checkpoint ck.npz] [--resume ck.npz] [--cpu]

Data plumbing is intentionally minimal: without a dataset this runs a
synthetic memorization task (fixed random batch) to exercise the full
pipeline -- encoder, prediction network, joint, RNN-T lattice loss, adamw
update -- sharded over all visible devices. Wire a real (mel, labels)
iterator in place of `synthetic_batch` for actual fine-tuning.
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

    import jax
    import optax

    from nemotron_tpu import params as P
    from nemotron_tpu.config import ModelConfig
    from nemotron_tpu.parallel.mesh import (make_mesh, mel_sharding,
                                            param_shardings)
    from nemotron_tpu.training import make_train_step

    if argv[1:] and argv[1] == "--random":
        cfg = ModelConfig()
        params = P.params_from_arrays(P.random_weight_arrays(cfg), cfg)
    elif argv[1:] and not argv[1].startswith("--"):
        params, cfg, _ = P.load_model(argv[1], keep_quantized=False)
    else:
        print(__doc__, file=sys.stderr)
        return 1

    n_dev = len(jax.devices())
    mesh = make_mesh(model_parallel=mp if n_dev % max(mp, 1) == 0 else 1)
    params = jax.device_put(params, param_shardings(params, mesh))
    print(f"devices: {n_dev}, mesh {dict(mesh.shape)}, batch {batch}",
          file=sys.stderr)

    opt = optax.adamw(lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, remat="--remat" in argv)
    bt = synthetic_batch(cfg, batch)
    bt = {k: (jax.device_put(v, mel_sharding(mesh)) if v.ndim == 3 else v)
          for k, v in bt.items()}

    from nemotron_tpu.training import load_train_state, save_train_state

    start = 0
    if "--resume" in argv:
        ck = argv[argv.index("--resume") + 1]
        params, opt_state, start = load_train_state(ck, params, opt_state)
        print(f"resumed from {ck} at step {start}", file=sys.stderr)

    for i in range(start, steps):
        params, opt_state, loss = step(params, opt_state, bt)
        if i % max(steps // 10, 1) == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}", file=sys.stderr)

    if "--checkpoint" in argv:
        ck = argv[argv.index("--checkpoint") + 1]
        save_train_state(ck, params, opt_state, step=steps)
        print(f"checkpointed to {ck}", file=sys.stderr)

    if "--save" in argv:
        out = argv[argv.index("--save") + 1]
        P.save_model(out, jax.device_get(params), cfg)
        print(f"saved trained weights to {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
