#!/usr/bin/env python3
"""Many-stream serving demo: drive the continuous-batching engine with N
concurrent streams replaying one or more PCM/WAV files, and report
aggregate throughput and latency percentiles.

    serve.py <model.gguf> <audio.pcm|.wav> [--streams N] [--slots S]
             [--right-context R] [--quantize w8a8] [--kv-int8|--kv-int4]
             [--rc-by-layer 13,6,1,0] [--seconds T] [--cpu]
             [--mesh N]            # shard slots over N (virtual) devices
             [--lockstep]          # fused PCM->tokens LockstepEngine path
             [--dsp auto|native|numpy|device]   # engine DSP backend
                                   # (device = DSP fused into the step;
                                   # auto = device on TPU, native on CPU)
             [--beam K]            # on-device beam search per tick
             [--lm lm.gguf --lm-weight W]   # LM shallow fusion in the
                                   # beam (models/lm.py; needs --beam>1)
             [--confidence]        # per-token log-posteriors (greedy)
             [--ctc]               # decode with the hybrid CTC head
                                   # (TDT checkpoints auto-switch decode)
                                   # (greedy-only in the reference)
             [--endpoint-silence S]  # utterance segmentation: endpoint
                                   # after S s of post-emission silence
             [--endpoint-reset]    # also reset the prediction network at
                                   # each endpoint (see docs/SERVING.md)
             [--coordinator H:P --num-processes N --process-id I]
                                   # multihost: join a jax.distributed
                                   # cluster; ONE lockstep slab spans all
                                   # processes' devices (requires
                                   # --lockstep; every process runs this
                                   # same command with its own
                                   # --process-id and feeds its local
                                   # stream rows). With --cpu this uses
                                   # gloo collectives (testing).

Streams are staggered (each starts at a different offset into the audio,
wrapping around) so the engine exercises admission at different phases.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 1

    def opt(name, default, cast):
        if name not in argv:
            return default
        raw = argv[argv.index(name) + 1]
        try:
            return cast(raw)
        except ValueError:
            print(f"error: invalid value for {name}: {raw!r}",
                  file=sys.stderr)
            raise SystemExit(1)

    mesh_n = opt("--mesh", 0, int)
    if mesh_n > 1:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={mesh_n}")
    coordinator = opt("--coordinator", None, str)
    if coordinator:
        if "--lockstep" not in argv:
            print("error: multihost serving requires --lockstep (the "
                  "ragged ServingEngine's admission calls are per-process "
                  "data-dependent)", file=sys.stderr)
            return 1
        from nemotron_tpu.parallel.multihost import init_multihost

        init_multihost(coordinator, opt("--num-processes", 2, int),
                       opt("--process-id", 0, int),
                       cpu_gloo="--cpu" in argv or mesh_n > 1)
    if "--cpu" in argv or mesh_n > 1:
        import jax

        jax.config.update("jax_platforms", "cpu")
    n_streams = opt("--streams", 8, int)
    n_slots = opt("--slots", max(8, n_streams), int)
    R = opt("--right-context", 13, int)
    seconds = opt("--seconds", 10.0, float)
    quant_mode = opt("--quantize", None, str)
    beam_k = opt("--beam", 1, int)
    lm_path = opt("--lm", None, str)
    lm_weight = opt("--lm-weight", 0.3, float)
    lm_bonus = opt("--lm-bonus", 0.0, float)
    ep_s = opt("--endpoint-silence", 0.0, float)
    ep_reset = "--endpoint-reset" in argv

    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model, quantize_model_params
    from nemotron_tpu.streaming.serving import ServingEngine
    from nemotron_tpu.utils.audio import read_audio_file

    sq_modes = ("w8a8-sq", "w8a8-sq-static")
    params, cfg, vocab = load_model(
        args[0], keep_quantized=quant_mode not in sq_modes)
    lm = None
    if lm_path:
        from nemotron_tpu.models.lm import load_lm

        try:
            lm = load_lm(lm_path)
        except (OSError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    cc = CacheConfig(att_right_context=R, n_mels=cfg.n_mels)
    if quant_mode in sq_modes:
        # SmoothQuant: calibrate on the serving audio itself (exact fold in
        # f32 + W8A8; ops/smoothquant.py). -static also freezes the
        # fold-site activation scales (no per-token abs-max at runtime).
        from nemotron_tpu.config import PreprocessorConfig
        from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
        from nemotron_tpu.ops.smoothquant import smooth_quantize

        pre = StreamingPreprocessor(
            np.asarray(params.preprocessor.filterbank),
            np.asarray(params.preprocessor.window), n_streams=1,
            cfg=PreprocessorConfig(n_mels=cfg.n_mels))
        mel = pre.process(read_audio_file(args[1])[: 20 * 16000])
        params = smooth_quantize(params, cfg, mel,
                                 att_chunk=cc.chunk_enc_len,
                                 static_act=quant_mode.endswith("-static"))
        print(f"{quant_mode}: calibrated on {mel.shape[1]} mel frames",
              file=sys.stderr)
    elif quant_mode:
        try:
            params = quantize_model_params(params, mode=quant_mode)
        except KeyError:
            print(f"error: unknown --quantize mode '{quant_mode}'",
                  file=sys.stderr)
            return 1
    if "--kv-int8" in argv:
        import dataclasses

        cc = dataclasses.replace(cc, kv_cache_int8=True)
    if "--kv-int4" in argv:
        import dataclasses

        cc = dataclasses.replace(cc, kv_cache_int8=False, kv_cache_int4=True)
    rc_pat = opt("--rc-by-layer", None, str)
    if rc_pat:
        import dataclasses

        try:
            cc = dataclasses.replace(
                cc, att_right_context_by_layer=tuple(
                    int(v) for v in rc_pat.split(",")))
            cc.rc_schedule(cfg.n_layers)  # validate early
        except ValueError as e:
            print(f"error: bad --rc-by-layer pattern {rc_pat!r}: {e}",
                  file=sys.stderr)
            return 1
    audio = read_audio_file(args[1])

    mesh = None
    if mesh_n > 1:
        from nemotron_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(mesh_n)

    offsets = [(i * len(audio)) // max(n_streams, 1) for i in range(n_streams)]
    tick = cc.shift_samples  # one chunk of audio per engine tick per stream
    n_ticks = int(seconds * 16000 / tick)

    def block_for(i):
        start = offsets[i] % len(audio)
        blk = np.resize(np.roll(audio, -start)[:tick], tick)
        offsets[i] += tick
        return blk

    if "--lockstep" in argv:
        # fused PCM->tokens path: every stream advances every tick
        from nemotron_tpu.streaming.lockstep import LockstepEngine

        kw = dict(n_streams=n_streams, compute_dtype=jnp.bfloat16,
                  beam_size=beam_k, confidence="--confidence" in argv,
                  ctc="--ctc" in argv, lm=lm, lm_weight=lm_weight,
                  lm_bonus=lm_bonus,
                  endpoint_silence_s=ep_s if ep_s > 0 else None,
                  endpoint_reset=ep_reset)
        try:
            if coordinator:
                # one slab over every process's devices; this process
                # feeds/reads only its own rows (global row indices)
                from nemotron_tpu.parallel.multihost import MultihostLockstep

                eng = MultihostLockstep(params, cfg, vocab, cc, **kw)
                rows = [int(r) for r in eng.local_rows]
            else:
                eng = LockstepEngine(params, cfg, vocab, cc, mesh=mesh, **kw)
                rows = list(range(n_streams))
        except (ValueError, RuntimeError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        slots = list(range(len(rows)))  # engine-local indices
        tick_times = []
        n_utts = 0
        t0 = time.perf_counter()
        for _ in range(n_ticks):
            pcm = np.stack([block_for(r) for r in rows])
            tt = time.perf_counter()
            eng.tick_pipelined(pcm)
            tick_times.append(time.perf_counter() - tt)
            for slot, text, _toks in eng.poll_endpoints():
                n_utts += 1
                if n_utts <= 5:
                    print(f"[utterance slot {slot}] {text.strip()}",
                          file=sys.stderr)
        eng.flush_pipeline()
        for slot, text, _toks in eng.poll_endpoints():
            n_utts += 1
        wall = time.perf_counter() - t0
        if ep_s > 0:
            print(f"utterances finalized: {n_utts}", file=sys.stderr)
        audio_s = eng.total_chunks * n_streams * cc.valid_out_len \
            * cc.subsampling_factor * cc.hop_length / cc.sample_rate
        t = np.asarray(tick_times)
        st = {"audio_seconds_decoded": audio_s,
              "aggregate_rtf": wall / max(audio_s, 1e-9),
              "latency": {"p50": float(np.percentile(t, 50)),
                          "p90": float(np.percentile(t, 90)),
                          "p99": float(np.percentile(t, 99))}}
    else:
        try:
            eng = ServingEngine(params, cfg, vocab, cc, n_slots=n_slots,
                                mesh=mesh, compute_dtype=jnp.bfloat16,
                                dsp=opt("--dsp", "auto", str),
                                beam_size=beam_k, lm=lm,
                                lm_weight=lm_weight, lm_bonus=lm_bonus,
                                confidence="--confidence" in argv,
                                ctc="--ctc" in argv,
                                endpoint_silence_s=ep_s if ep_s > 0
                                else None, endpoint_reset=ep_reset)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        slots = eng.add_streams(n_streams)
        t0 = time.perf_counter()
        n_utts = 0
        for _ in range(n_ticks):
            feed = {s: block_for(i) for i, s in enumerate(slots)}
            eng.feed_audio(feed)
            eng.step()
            for slot, text, _toks in eng.poll_endpoints():
                n_utts += 1
                if n_utts <= 5:
                    print(f"[utterance slot {slot}] {text.strip()}",
                          file=sys.stderr)
        wall = time.perf_counter() - t0
        st = eng.stats()
        if ep_s > 0:
            print(f"utterances finalized: {st['utterances_finalized']}",
                  file=sys.stderr)
    print(f"streams={n_streams} slots={n_slots} mode=R{R}"
          f"{' ' + quant_mode if quant_mode else ''}", file=sys.stderr)
    print(f"decoded {st['audio_seconds_decoded']:.1f}s of audio in "
          f"{wall:.2f}s wall ({st['audio_seconds_decoded']/max(wall,1e-9):.1f}x "
          f"aggregate real-time); engine aggregate RTF "
          f"{st['aggregate_rtf']:.5f}", file=sys.stderr)
    lat = st["latency"]
    if lat:
        print(f"per-tick latency p50 {lat['p50']*1e3:.1f} ms  "
              f"p90 {lat['p90']*1e3:.1f} ms  p99 {lat['p99']*1e3:.1f} ms",
              file=sys.stderr)
    if beam_k > 1:
        eng.refresh_transcripts()
    for s in slots[:3]:
        print(f"[slot {s}] {eng.transcripts[s][:70]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
