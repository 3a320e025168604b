#!/usr/bin/env python3
"""Print the streaming cache geometry and per-stream memory budget for every
latency mode (the documentation role of the reference's
scripts/analyze_streaming.py, computed from this framework's config instead
of by instrumenting NeMo).

    analyze_streaming.py [model.gguf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nemotron_tpu.config import CacheConfig, LatencyMode, ModelConfig  # noqa: E402


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TB"


def main(argv: list[str]) -> int:
    if len(argv) > 1:
        from nemotron_tpu.params import load_model

        _, cfg, _ = load_model(argv[1])
    else:
        cfg = ModelConfig()

    print(f"model: d_model={cfg.d_model} layers={cfg.n_layers} "
          f"heads={cfg.n_heads} d_ff={cfg.d_ff} "
          f"decoder={cfg.decoder_layers}x{cfg.decoder_dim} "
          f"vocab={cfg.vocab_size}")
    print()
    hdr = (f"{'mode':>12} {'R':>3} {'alg.lat':>9} {'chunk_ms':>9} "
           f"{'chunk_mel':>9} {'shift_mel':>9} {'enc/chunk':>9} "
           f"{'kv_len':>7} {'pos_len':>8}")
    print(hdr)
    for mode in LatencyMode:
        cc = CacheConfig.with_latency(mode)
        print(f"{mode.name:>12} {int(mode):>3} "
              f"{cc.algorithmic_latency_ms:>7}ms {cc.latency_ms:>9} "
              f"{cc.chunk_mel_frames:>9} {cc.shift_mel_frames:>9} "
              f"{cc.valid_out_len:>9} {cc.kv_len:>7} {cc.pos_len:>8}")

    cc = CacheConfig()
    L, D, C = cfg.n_layers, cfg.d_model, cc.att_left_context
    for name, itemsize in (("f32", 4), ("bf16", 2)):
        kv = 2 * L * C * D * itemsize
        conv = L * cc.conv_cache_size * D * itemsize
        lstm = 2 * cfg.decoder_layers * cfg.decoder_dim * itemsize
        total = kv + conv + lstm
        print(f"\nper-stream state ({name}): "
              f"K/V {fmt_bytes(kv)} + conv {fmt_bytes(conv)} + "
              f"LSTM {fmt_bytes(lstm)} = {fmt_bytes(total)}")
        for streams in (256, 512, 1024):
            print(f"  {streams:>5} streams: {fmt_bytes(total * streams)}"
                  f"  (+ weights {fmt_bytes(0.6e9 * itemsize)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
