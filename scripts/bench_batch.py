#!/usr/bin/env python3
"""Offline batch-mode throughput benchmark — the reference's own scenario.

The reference's headline batch numbers (BASELINE.md; its docs/STATUS.md:15-19)
are PCM->text on a single 20 s utterance: 5.8 s on CPU (RTF 0.29) and 2.0 s
on an RTX 4080 (RTF 0.10), batch size 1 always (src/nemo-ggml.cpp:1477).
This measures the same full-utterance pipeline (host DSP + batch encoder +
on-device greedy decode, nemotron_tpu.streaming.session.transcribe_batch's
compute path) at full 0.6B model size on the attached TPU — single utterance
for a like-for-like RTF, then batched (the capability the reference lacks)
for aggregate throughput, and one 300 s utterance to exercise the removed
164 s pos-emb cap (reference: src/nemo-ggml.cpp:193-196) at full size.

Device timings subtract the measured sync RTT (the tunneled axon backend's
~30 ms round trip; jax.block_until_ready does not block there — see
bench.py). The mel upload is reported separately: through the dev tunnel it
rides a ~113 MB/s link that a co-located PCIe host beats ~100x, so
"device_s" (compute) and "upload_s" are split and end_to_end_s sums
dsp+upload+compute honestly for THIS host.

Prints one JSON line per scenario.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def _sync(x):
    import jax
    import jax.numpy as jnp

    return jax.device_get(jnp.sum(x))


def synth_audio(seconds: float, seed: int) -> np.ndarray:
    """Sine + noise i16, the reference's synthetic fixture recipe
    (tests/test_streaming.cpp:745-755)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    x = 0.3 * np.sin(2 * np.pi * 440.0 * t) + 0.05 * rng.standard_normal(
        t.size)
    return (np.clip(x, -1, 1) * 32767).astype(np.int16)


def main() -> int:
    quick = "--quick" in sys.argv

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
    from nemotron_tpu.config import ModelConfig, PreprocessorConfig
    from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod

    dtype = jnp.bfloat16
    if quick:
        cfg = ModelConfig(n_mels=32, d_model=128, n_heads=8, d_head=16,
                          d_ff=256, n_layers=2, vocab_size=64, decoder_dim=64,
                          joint_dim=64, subsampling_channels=16)
        scenarios = [(1, 5.0), (4, 5.0)]
        reps = 2
    else:
        cfg = ModelConfig()
        # (batch, seconds-per-utterance). 20 s matches the reference's
        # headline fixture; 300 s exceeds its 164 s batch-mode cap.
        scenarios = [(1, 20.0), (32, 20.0), (64, 20.0), (1, 300.0)]
        reps = 5

    arrays = P.random_weight_arrays(cfg, seed=0)
    # Speech-like emission rate (see bench.py): blank-dominated frames.
    arrays["joint.joint_net.2.bias"][cfg.vocab_size - 1] = 12.0
    params = P.cast_params(P.params_from_arrays(arrays, cfg), dtype)
    fb = np.asarray(params.preprocessor.filterbank, np.float32)
    win = np.asarray(params.preprocessor.window, np.float32)

    def e2e(p, mel):
        enc = enc_mod.encode_batch(p, cfg, mel)
        state = dec_mod.init_decoder_state(cfg, mel.shape[0], dtype)
        tokens, _ = dec_mod.greedy_decode(p, cfg, enc, state)
        return tokens

    step = jax.jit(e2e)

    for batch, seconds in scenarios:
        audio = [synth_audio(seconds, seed=i) for i in range(batch)]
        # Host DSP (the numpy/scipy frontend; timed as part of end-to-end).
        t0 = time.perf_counter()
        mels = []
        for a in audio:
            pre = StreamingPreprocessor(
                fb, win, cfg=PreprocessorConfig(n_mels=cfg.n_mels))
            mels.append(pre.process(a.reshape(1, -1))[0])
        mel_np = np.stack(mels).astype(np.float32)
        dsp_s = time.perf_counter() - t0

        # Upload, timed separately (tunnel-dominated on this dev box).
        t0 = time.perf_counter()
        mel = jnp.asarray(mel_np, dtype)
        _sync(mel)
        upload_s = time.perf_counter() - t0

        # Compile outside the measurement.
        tokens = step(params, mel)
        _sync(tokens)
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(tokens)
            rtts.append(time.perf_counter() - t0)
        rtt = float(np.median(rtts))

        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tokens = step(params, mel)
            _sync(tokens)
            times.append(max(time.perf_counter() - t0 - rtt, 0.0))
        device_s = float(np.percentile(times, 50))

        audio_s = batch * seconds
        end_to_end = dsp_s + upload_s + device_s
        out = {
            "metric": "batch_transcribe",
            "batch": batch,
            "utterance_s": seconds,
            "audio_s": audio_s,
            "device_s": round(device_s, 4),
            "dsp_s": round(dsp_s, 4),
            "upload_s": round(upload_s, 4),
            "end_to_end_s": round(end_to_end, 4),
            "rtf_device": round(device_s / audio_s, 6),
            "rtf_end_to_end": round(end_to_end / audio_s, 6),
            "audio_s_per_compute_s": round(audio_s / device_s, 1),
            "ref_rtf_cuda_4080": 0.10,
            "ref_rtf_cpu": 0.29,
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
