#!/usr/bin/env python3
"""Streaming ASR TCP server: many network clients, one ServingEngine slab.

    asr_server.py <model.gguf> [--host H] [--port P] [--slots S]
                  [--right-context R] [--rc-by-layer 13,6,1,0]
                  [--quantize q8_0|w8a8] [--kv-int8|--kv-int4]
                  [--dsp auto|native|numpy|device] [--beam K]
                  [--lm lm.gguf --lm-weight W]
                  [--confidence] [--endpoint-silence S] [--endpoint-reset]
                  [--ctc]           # hybrid CTC-head decode (TDT is
                                    # auto-detected from the GGUF)
                  [--tick-ms T] [--http-stats PORT] [--ws-port PORT]
                                    # --http-stats also serves
                                    # POST /transcribe (one-shot REST)
                  [--refine] [--refine-beam K]   # two-pass: refined
                                    # per-utterance beam(+--lm) re-decode
                  [--cpu]
                  [--stats-every SECONDS]

Protocol: see nemotron_tpu/server.py (length-prefixed frames; s16le 16 kHz
mono PCM in, JSON transcript events out). Drive it with
scripts/asr_client.py or nemotron_tpu.client.ASRClient.

stdout stays quiet (transcripts belong to the clients); configuration and
periodic stats go to stderr, mirroring the reference CLI's stream
discipline (src/transcribe_stream.cpp:93-98).
"""

import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    args = [a for a in argv[1:] if not a.startswith("--")]
    if len(args) < 1:
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

    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    host = opt("--host", "127.0.0.1", str)
    port = opt("--port", 8765, int)
    n_slots = opt("--slots", 64, int)
    R = opt("--right-context", 13, int)
    beam_k = opt("--beam", 1, int)
    lm_path = opt("--lm", None, str)
    lm_weight = opt("--lm-weight", 0.3, float)
    lm_bonus = opt("--lm-bonus", 0.0, float)
    dsp = opt("--dsp", "auto", str)
    tick_ms = opt("--tick-ms", 0.0, float)
    stats_every = opt("--stats-every", 30.0, float)
    # utterance endpointing: after S seconds of post-emission silence a
    # slot fires an UTTERANCE event and its prediction network restarts
    ep_s = opt("--endpoint-silence", 0.0, float)
    http_stats = opt("--http-stats", -1, int)   # GET /metrics + /stats
    ws_port = opt("--ws-port", -1, int)         # WebSocket transport
    # two-pass serving: --refine re-decodes each endpointed utterance
    # offline with a beam (+ the --lm, if given) and adds a "refined"
    # field to UTTERANCE events; requires --endpoint-silence
    refine = "--refine" in argv
    refine_beam = opt("--refine-beam", 4, int)
    quant_mode = opt("--quantize", None, str)

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model, quantize_model_params
    from nemotron_tpu.server import ASRServer
    from nemotron_tpu.streaming.serving import ServingEngine

    params, cfg, vocab = load_model(args[0])
    lm = None
    if lm_path:
        # LM shallow fusion in the beam decode (needs --beam > 1)
        from nemotron_tpu.models.lm import load_lm

        try:
            lm = load_lm(lm_path)
        except (OSError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    if quant_mode:
        try:
            params = quantize_model_params(params, mode=quant_mode)
        except KeyError:
            print(f"error: unknown --quantize mode '{quant_mode}'",
                  file=sys.stderr)
            return 1
    cc = CacheConfig(att_right_context=R, n_mels=cfg.n_mels)
    import dataclasses

    if "--kv-int8" in argv:
        cc = dataclasses.replace(cc, kv_cache_int8=True)
    if "--kv-int4" in argv:
        cc = dataclasses.replace(cc, kv_cache_int8=False, kv_cache_int4=True)
    rc_pat = opt("--rc-by-layer", None, str)
    if rc_pat:
        try:
            cc = dataclasses.replace(
                cc, att_right_context_by_layer=tuple(
                    int(v) for v in rc_pat.split(",")))
            cc.rc_schedule(cfg.n_layers)  # validate early
        except ValueError as e:
            print(f"error: bad --rc-by-layer pattern {rc_pat!r}: {e}",
                  file=sys.stderr)
            return 1

    try:
        engine = ServingEngine(params, cfg, vocab, cc, n_slots=n_slots,
                               dsp=dsp, beam_size=beam_k, lm=None if refine
                               else lm,
                               lm_weight=lm_weight, lm_bonus=lm_bonus,
                               confidence="--confidence" in argv,
                               ctc="--ctc" in argv,
                               endpoint_silence_s=ep_s if ep_s > 0 else None,
                               endpoint_reset="--endpoint-reset" in argv,
                               keep_segment_audio=refine)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    refiner = None
    if refine:
        from nemotron_tpu.streaming.refine import SegmentRefiner

        try:
            refiner = SegmentRefiner(params, cfg, vocab,
                                     beam_size=refine_beam, lm=lm,
                                     lm_weight=lm_weight,
                                     lm_bonus=lm_bonus)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    server = ASRServer(engine, host=host, port=port,
                       tick_interval=tick_ms / 1000.0 if tick_ms else None,
                       http_stats_port=http_stats if http_stats >= 0
                       else None,
                       ws_port=ws_port if ws_port >= 0 else None,
                       refiner=refiner)

    async def run():
        await server.start()
        print(f"listening on {server.host}:{server.port}  "
              f"slots={n_slots} R={R} dsp={engine.dsp_mode} "
              f"beam={beam_k} tick={server.tick_interval * 1000:.0f}ms",
              file=sys.stderr, flush=True)
        if server.http_stats_port is not None:
            print(f"http on {server.host}:{server.http_stats_port} "
                  "(GET /metrics, GET /stats, POST /transcribe)",
                  file=sys.stderr, flush=True)
        if server.ws_port is not None:
            print(f"websocket on ws://{server.host}:{server.ws_port}/",
                  file=sys.stderr, flush=True)
        last = time.time()
        try:
            while True:
                await asyncio.sleep(1.0)
                if stats_every and time.time() - last >= stats_every:
                    last = time.time()
                    st = server.stats()
                    print(f"stats: conns={st['connections']} "
                          f"total={st['connections_total']} "
                          f"active_slots={st['active_slots']} "
                          f"steps={st['engine_steps']} "
                          f"rtf={st['aggregate_rtf']:.4f}",
                          file=sys.stderr, flush=True)
        finally:
            await server.stop()

    try:
        asyncio.run(run())
    except KeyboardInterrupt:
        print("shutting down", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
