#!/usr/bin/env python3
"""Export per-layer streaming activations as .npy files (the reference's
scripts/export_layer_data.py role): runs a traced StreamSession over audio
and converts the dump captures to .npy for notebook analysis.

    export_layer_data.py <model.gguf> <audio.pcm> <out_dir>
                         [--right-context R] [--cpu]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    if len(args) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    R = 13
    if "--right-context" in argv:
        R = int(argv[argv.index("--right-context") + 1])

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils.dump import read_dump

    out_dir = args[2]
    dump_dir = os.path.join(out_dir, "dumps")
    os.makedirs(out_dir, exist_ok=True)

    params, cfg, vocab = load_model(args[0])
    cc = CacheConfig(att_right_context=R, n_mels=cfg.n_mels)
    sess = StreamSession(params, cfg, vocab, cc, trace_dir=dump_dir)
    audio = np.fromfile(args[1], dtype="<i2")
    sess.process(audio)
    text = sess.finalize()

    n = 0
    for f in sorted(os.listdir(dump_dir)):
        if f.endswith(".bin"):
            arr = read_dump(os.path.join(dump_dir, f))
            np.save(os.path.join(out_dir, f[:-4] + ".npy"), arr)
            n += 1
    print(f"exported {n} arrays to {out_dir}/ "
          f"({sess.total_chunks} chunks); transcript: {text[:80]!r}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
