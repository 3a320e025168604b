"""Network ASR server tests: ASRServer + ASRClient over loopback TCP on
the CPU tiny model (hermetic: ephemeral ports, in-process asyncio loop).

The gate is server-path == direct-engine-path: the same audio through the
wire protocol must produce the exact transcript/tokens the ServingEngine
produces when driven in-process (engine == solo session is already gated
by tests/test_serving.py)."""

import asyncio
import threading
import time

import numpy as np
import pytest

from nemotron_tpu.client import ASRClient, ASRServerError
from nemotron_tpu.config import CacheConfig
from nemotron_tpu.server import ASRServer
from nemotron_tpu.streaming.serving import ServingEngine


@pytest.fixture()
def cc(model_setup):
    _, _, cfg = model_setup
    return CacheConfig(att_right_context=1, att_left_context=12,
                       n_mels=cfg.n_mels)


def make_engine(model_setup, cc, n_slots=4, **kw):
    import jax.numpy as jnp

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    return ServingEngine(params, cfg, vocab, cc, n_slots=n_slots,
                         compute_dtype=jnp.float32, **kw)


def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)


class _Server:
    """Run an ASRServer on its own event loop in a daemon thread."""

    def __init__(self, engine, tick_interval=0.02, **srv_kw):
        self.loop = asyncio.new_event_loop()
        self.srv = ASRServer(engine, port=0, tick_interval=tick_interval,
                             **srv_kw)
        started = threading.Event()

        def run():
            asyncio.set_event_loop(self.loop)
            self.loop.run_until_complete(self.srv.start())
            started.set()
            self.loop.run_forever()

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()
        assert started.wait(60), "server failed to start"

    @property
    def addr(self):
        return "127.0.0.1", self.srv.port

    def stop(self):
        asyncio.run_coroutine_threadsafe(self.srv.stop(),
                                         self.loop).result(60)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(30)


@pytest.fixture()
def server_factory(model_setup, cc):
    servers = []

    def make(_srv_kw=None, **engine_kw):
        eng = make_engine(model_setup, cc, **engine_kw)
        s = _Server(eng, **(_srv_kw or {}))
        servers.append(s)
        return s

    yield make
    for s in servers:
        s.stop()


def _reference_final(model_setup, cc, audio, chunk, **engine_kw):
    """The same audio through a directly-driven engine."""
    eng = make_engine(model_setup, cc, **engine_kw)
    slot = eng.add_stream()
    for i in range(0, len(audio), chunk):
        eng.feed_audio({slot: audio[i:i + chunk]})
        eng.step()
    return eng.finalize_stream(slot, return_tokens=True)


def test_roundtrip_matches_engine(model_setup, cc, server_factory):
    s = server_factory()
    n = cc.chunk_samples
    audio = np.concatenate([synth(n, 1), synth(n, 2), synth(n // 3, 3)])

    with ASRClient(*s.addr) as client:
        info = client.start()
        assert info["sample_rate"] == 16000
        assert info["chunk_samples"] == n
        # stream in blocks unrelated to the chunk size
        blk = 1000
        for i in range(0, len(audio), blk):
            client.send_audio(audio[i:i + blk])
        final = client.end()

    want_text, want_toks = _reference_final(model_setup, cc, audio, n)
    assert final["text"] == want_text
    assert [tuple(t) for t in final["tokens"]] == want_toks
    # incremental partials accumulated to the same transcript
    assert client.transcript == want_text
    # FINAL word timings == server-side detokenization of the same tokens
    from nemotron_tpu.utils.subtitles import tokens_to_words

    want_words = [list(w) for w in
                  tokens_to_words(want_toks, s.srv.engine.vocab)]
    assert final["words"] == want_words


def test_concurrent_clients_isolated(model_setup, cc, server_factory):
    s = server_factory()
    n = cc.chunk_samples
    audios = {k: np.concatenate([synth(n, 10 + k), synth(n, 20 + k)])
              for k in range(3)}

    clients = {k: ASRClient(*s.addr) for k in audios}
    for c in clients.values():
        c.start()
    # interleave uploads so ticks see multiple slots at once
    for i in range(0, 2 * n, n // 2):
        for k, c in clients.items():
            c.send_audio(audios[k][i:i + n // 2])
    finals = {k: c.end() for k, c in clients.items()}
    for c in clients.values():
        c.close()

    for k, audio in audios.items():
        want_text, _ = _reference_final(model_setup, cc, audio, n)
        assert finals[k]["text"] == want_text, f"client {k} diverged"


def test_server_full_and_reuse(model_setup, cc, server_factory):
    s = server_factory(n_slots=2)
    a = ASRClient(*s.addr)
    b = ASRClient(*s.addr)
    a.start()
    b.start()
    c = ASRClient(*s.addr)
    with pytest.raises(ASRServerError, match="free"):
        c.start()
    # finishing a stream frees its slot for the waiting client
    a.send_audio(synth(cc.chunk_samples, 0))
    a.end()
    c.start()
    for cl in (a, b, c):
        cl.close()


def test_protocol_errors(model_setup, cc, server_factory):
    s = server_factory()
    with ASRClient(*s.addr) as c:
        c._send(2, b"\x00\x01")  # AUDIO before START
        with pytest.raises(ASRServerError, match="before START"):
            c._wait_for(0x82)
    with ASRClient(*s.addr) as c:
        c.start()
        c._send(2, b"\x00")  # odd-length PCM
        with pytest.raises(ASRServerError, match="odd-length"):
            c._wait_for(0x82)


def test_pending_cap_recovers(model_setup, cc, server_factory, monkeypatch):
    """A burst over the staging cap is REJECTED, not counted: the slot
    keeps accepting normally-paced audio afterwards (regression: the
    counter used to include the rejected burst and never reset, refusing
    all audio forever)."""
    import nemotron_tpu.server as server_mod

    # cap ~= half a chunk so one chunk-sized burst trips it
    monkeypatch.setattr(server_mod, "MAX_PENDING_SECONDS",
                        cc.chunk_samples / 2 / 16000.0)
    s = server_factory()
    with ASRClient(*s.addr) as c:
        c.start()
        c._send(2, synth(cc.chunk_samples, 11).tobytes())  # over the cap
        with pytest.raises(ASRServerError, match="slow down"):
            c._wait_for(0x82)
        # small pieces under the cap still flow -- polling the server's
        # staged_samples stat until the ticker has drained before each
        # send, so two undrained pieces can never stack up to the cap
        # (the first tick JIT-compiles and can outlast any fixed sleep;
        # this was flaky with time.sleep(0.1), ADVICE r3)
        for i in range(8):
            for _ in range(400):
                if c.stats().get("staged_samples", 0) == 0:
                    break
                time.sleep(0.05)
            else:
                raise AssertionError("ticker never drained staged audio")
            c.send_audio(synth(cc.chunk_samples // 4, 20 + i))
        final = c.end()
        assert "text" in final  # session completed normally


def test_stats_roundtrip(model_setup, cc, server_factory):
    s = server_factory()
    with ASRClient(*s.addr) as c:
        c.start()
        c.send_audio(synth(cc.chunk_samples, 5))
        st = c.stats()
        assert st["n_slots"] == 4
        assert st["active_slots"] >= 1
        c.end()


def test_disconnect_frees_slot(model_setup, cc, server_factory):
    s = server_factory(n_slots=2)
    c = ASRClient(*s.addr)
    c.start()
    c.send_audio(synth(cc.chunk_samples // 2, 7))
    c.close()  # vanish mid-stream, no END
    deadline = time.time() + 30
    while time.time() < deadline:
        if s.srv.engine.active.sum() == 0:
            break
        time.sleep(0.05)
    assert s.srv.engine.active.sum() == 0, "slot not reclaimed"


def test_confidence_final_tokens(model_setup, cc, server_factory):
    s = server_factory(confidence=True)
    n = cc.chunk_samples
    audio = np.concatenate([synth(n, 30), synth(n, 31)])
    with ASRClient(*s.addr) as c:
        info = c.start()
        assert info["confidence"] is True
        c.send_audio(audio)
        final = c.end()
    want_text, want_toks = _reference_final(
        model_setup, cc, audio, n, confidence=True)
    assert final["text"] == want_text
    got = [tuple(t) for t in final["tokens"]]
    assert len(got) == len(want_toks)
    for g, w in zip(got, want_toks):
        assert g[:2] == w[:2]
        assert g[2] == pytest.approx(w[2])  # log-posterior survives JSON
        assert g[2] <= 0.0


def test_beam_replace_events(model_setup, cc, server_factory):
    s = server_factory(beam_size=2)
    n = cc.chunk_samples
    audio = np.concatenate([synth(n, 40), synth(n, 41)])
    with ASRClient(*s.addr) as c:
        info = c.start()
        assert info["beam"] == 2
        c.send_audio(audio)
        final = c.end()
        partials = [obj for t, obj in c.events if t == 0x81]
    want_text, _ = _reference_final(model_setup, cc, audio, n, beam_size=2)
    assert final["text"] == want_text
    assert all(p["replace"] for p in partials)  # beam text is revisable
    assert c.transcript == want_text
    # beam hypotheses carry frame 0 on every token (refresh_transcripts),
    # so the server must OMIT word timings rather than emit one garbage
    # [0, 80ms] cue per word (ADVICE r3)
    assert "words" not in final


def test_utterance_endpoint_events(model_setup, cc, server_factory):
    """Endpoint relay: an engine endpoint becomes a T_UTTERANCE (0x85)
    event on the owning connection, with the utterance's text/tokens and
    a per-connection index. The endpoint itself is injected directly
    (the state machine and its silence detection are gated in
    tests/test_serving.py; the model's silence behavior needs the trained
    fixture); this gates the server plumbing."""
    import time as _time

    s = server_factory(endpoint_silence_s=1.0)
    n = cc.chunk_samples
    with ASRClient(*s.addr) as c:
        info = c.start()
        assert info["endpointing"] is True
        c.send_audio(synth(n, 60))
        # wait until the slot has emitted tokens
        deadline = _time.time() + 60
        while _time.time() < deadline:
            c.pump()
            if c.transcript:
                break
            _time.sleep(0.05)
        assert c.transcript, "tiny model emitted nothing"
        eng = s.srv.engine
        slot = info["slot"]
        # inject the endpoint (as _ep_update would on silence expiry:
        # the utterance boundary is snapshotted at fire time)
        s.loop.call_soon_threadsafe(
            eng._ep_pending.append, (slot, len(eng.tokens[slot]), None))
        deadline = _time.time() + 60
        while _time.time() < deadline and not c.utterances:
            c.pump()
            _time.sleep(0.05)
        assert c.utterances, "no UTTERANCE event arrived"
        utt = c.utterances[0]
        assert utt["index"] == 0
        assert utt["text"] and isinstance(utt["tokens"], list)
        assert utt["tokens"] == [list(t) for t in
                                 eng.tokens[slot][: len(utt["tokens"])]]
        assert len(utt["tokens"]) > 0
        # word timings ride UTTERANCE events too (client-side captions)
        from nemotron_tpu.utils.subtitles import tokens_to_words

        assert utt["words"] == [list(w) for w in tokens_to_words(
            [tuple(t) for t in utt["tokens"]], eng.vocab)]
        c.end()


def test_http_stats_endpoint(model_setup, cc):
    """GET /metrics returns Prometheus text exposition of engine stats,
    GET /stats returns the same data as JSON, anything else is 404."""
    import json as _json
    import urllib.request

    eng = make_engine(model_setup, cc, n_slots=2)

    class _HServer(_Server):
        def __init__(self, engine):
            self.loop = asyncio.new_event_loop()
            self.srv = ASRServer(engine, port=0, tick_interval=0.02,
                                 http_stats_port=0)
            started = threading.Event()

            def run():
                asyncio.set_event_loop(self.loop)
                self.loop.run_until_complete(self.srv.start())
                started.set()
                self.loop.run_forever()

            self.thread = threading.Thread(target=run, daemon=True)
            self.thread.start()
            assert started.wait(60)

    s = _HServer(eng)
    try:
        base = f"http://127.0.0.1:{s.srv.http_stats_port}"
        body = urllib.request.urlopen(f"{base}/metrics", timeout=30) \
            .read().decode()
        assert "nemotron_asr_n_slots 2" in body
        assert "nemotron_asr_active_slots 0" in body
        assert "nemotron_asr_connections " in body
        for ln in body.strip().splitlines():
            name, val = ln.rsplit(" ", 1)
            float(val)   # every line is metric + numeric value

        st = _json.loads(urllib.request.urlopen(f"{base}/stats",
                                                timeout=30).read())
        assert st["n_slots"] == 2

        import urllib.error
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/nope", timeout=30)
    finally:
        s.stop()


def _http_server(engine):
    """An ASRServer with the HTTP sidecar enabled, on its own loop."""
    class _HServer(_Server):
        def __init__(self, eng):
            self.loop = asyncio.new_event_loop()
            self.srv = ASRServer(eng, port=0, tick_interval=0.02,
                                 http_stats_port=0)
            started = threading.Event()

            def run():
                asyncio.set_event_loop(self.loop)
                self.loop.run_until_complete(self.srv.start())
                started.set()
                self.loop.run_forever()

            self.thread = threading.Thread(target=run, daemon=True)
            self.thread.start()
            assert started.wait(60)

    return _HServer(engine)


def _wav_bytes(samples, channels=1, rate=16000):
    import struct

    data = samples.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    rate * 2 * channels, 2 * channels, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_http_transcribe_roundtrip(model_setup, cc):
    """POST /transcribe (raw PCM and the same audio as WAV) returns the
    exact text+tokens a directly-driven engine produces for that audio."""
    import json as _json
    import urllib.request

    audio = synth(cc.chunk_samples * 3, seed=7)
    want_text, want_toks = _reference_final(model_setup, cc, audio,
                                            cc.chunk_samples)

    s = _http_server(make_engine(model_setup, cc, n_slots=2))
    try:
        base = f"http://127.0.0.1:{s.srv.http_stats_port}"
        for body in (audio.tobytes(), _wav_bytes(audio)):
            req = urllib.request.Request(f"{base}/transcribe", data=body,
                                         method="POST")
            resp = _json.loads(urllib.request.urlopen(req, timeout=120)
                               .read())
            assert resp["text"] == want_text
            assert [tuple(t) for t in resp["tokens"]] == \
                [tuple(t) for t in want_toks]
            assert resp["decode"] == "greedy"
            assert abs(resp["audio_s"] - audio.size / 16000.0) < 1e-6
            # token frames -> seconds scale from the engine's geometry
            assert resp["frame_seconds"] == pytest.approx(
                cc.subsampling_factor * cc.hop_length / cc.sample_rate)
        # the one-shot stream freed its slot both times
        assert int(np.sum(s.srv.engine.active)) == 0
    finally:
        s.stop()


def test_http_transcribe_errors(model_setup, cc):
    """Bad REST requests get clean HTTP errors and never leak slots:
    empty body 400, malformed WAV 400, oversized Content-Length 413,
    slab full 503."""
    import json as _json
    import urllib.error
    import urllib.request

    s = _http_server(make_engine(model_setup, cc, n_slots=1))
    try:
        base = f"http://127.0.0.1:{s.srv.http_stats_port}"

        def post(body, headers=None):
            req = urllib.request.Request(f"{base}/transcribe", data=body,
                                         headers=headers or {},
                                         method="POST")
            return urllib.request.urlopen(req, timeout=60)

        with pytest.raises(urllib.error.HTTPError) as e:
            post(b"")
        assert e.value.code in (400, 411)

        bad_wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"junkjunk"
        with pytest.raises(urllib.error.HTTPError) as e:
            post(bad_wav)
        assert e.value.code == 400
        assert "malformed WAV" in _json.loads(e.value.read())["error"]

        # oversized Content-Length is rejected on the header alone
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1",
                                          s.srv.http_stats_port, timeout=60)
        conn.putrequest("POST", "/transcribe")
        conn.putheader("Content-Length",
                       str(ASRServer.MAX_HTTP_BODY + 1))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()

        # slab full: occupy the single slot via the streaming protocol
        cl = ASRClient("127.0.0.1", s.srv.port)
        cl.start()
        with pytest.raises(urllib.error.HTTPError) as e:
            post(synth(cc.chunk_samples, seed=1).tobytes())
        assert e.value.code == 503
        cl.close()
        assert int(np.sum(s.srv.engine.active)) <= 1

        # an engine exception answers 500 (not a dropped connection),
        # and the slot is reclaimed
        deadline = __import__("time").time() + 30
        while __import__("time").time() < deadline \
                and int(np.sum(s.srv.engine.active)):
            __import__("time").sleep(0.05)   # cleanup frees the TCP slot
        orig = s.srv.engine.feed_audio
        s.srv.engine.feed_audio = \
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                post(synth(cc.chunk_samples, seed=2).tobytes())
            assert e.value.code == 500
            assert "boom" in _json.loads(e.value.read())["error"]
        finally:
            s.srv.engine.feed_audio = orig
        assert int(np.sum(s.srv.engine.active)) == 0
    finally:
        s.stop()


# -- WebSocket transport ------------------------------------------------------

def test_ws_roundtrip_matches_tcp(model_setup, cc, server_factory):
    """The same audio over the WebSocket transport and the TCP transport
    (same server, same slab) must produce identical FINALs, and both must
    match the directly-driven engine."""
    from nemotron_tpu.client import WSASRClient

    s = server_factory(_srv_kw={"ws_port": 0})
    n = cc.chunk_samples
    audio = np.concatenate([synth(n, 41), synth(n, 42), synth(n // 2, 43)])

    with WSASRClient("127.0.0.1", s.srv.ws_port) as wclient:
        info = wclient.start()
        assert info["sample_rate"] == 16000
        for i in range(0, len(audio), 777):
            wclient.send_audio(audio[i:i + 777])
        ws_final = wclient.end()
        ws_stats = wclient.stats()
    assert ws_stats["connections_total"] >= 1

    with ASRClient(*s.addr) as tclient:
        tclient.start()
        for i in range(0, len(audio), 1000):
            tclient.send_audio(audio[i:i + 1000])
        tcp_final = tclient.end()

    want_text, want_toks = _reference_final(model_setup, cc, audio, n)
    assert ws_final["text"] == want_text
    assert [tuple(t) for t in ws_final["tokens"]] == want_toks
    assert tcp_final["text"] == want_text
    assert wclient.transcript == want_text  # partials accumulated over WS


def test_ws_protocol_errors_and_ping(model_setup, cc, server_factory):
    """Control errors arrive as WS "error" events; ping is answered with
    pong carrying the same payload; close is echoed."""
    import json as _json
    import socket as _socket

    from nemotron_tpu import websocket as ws
    from nemotron_tpu.client import ASRServerError, WSASRClient

    s = server_factory(_srv_kw={"ws_port": 0})

    c = WSASRClient("127.0.0.1", s.srv.ws_port)
    # audio before start -> error event. Send WITHOUT pump() (send_audio
    # pumps, and pump() records-but-does-not-raise an ERROR that has
    # already arrived, which would leave _wait_for hanging).
    with pytest.raises(ASRServerError, match="AUDIO before START"):
        c._send(0x02, synth(100, 1).tobytes())
        c._wait_for(0x7F)  # no such type; first ERROR raises
    c.close()

    # raw socket: handshake, then ping and a bogus control type
    sock = _socket.create_connection(("127.0.0.1", s.srv.ws_port), timeout=30)
    req, expect = ws.client_handshake_request("x")
    sock.sendall(req)
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += sock.recv(1 << 16)
    head, _, buf = buf.partition(b"\r\n\r\n")
    assert b" 101 " in head.split(b"\r\n")[0]
    assert expect.encode() in head

    def read_one():
        nonlocal buf
        while True:
            res = ws.parse_frame(buf)
            if res is not None:
                fin, opcode, _m, payload, consumed = res
                buf = buf[consumed:]
                return opcode, payload
            data = sock.recv(1 << 16)
            if not data:
                raise ConnectionError("eof")
            buf += data

    sock.sendall(ws.encode_frame(ws.OP_PING, b"hb-17", mask=True))
    opcode, payload = read_one()
    assert (opcode, payload) == (ws.OP_PONG, b"hb-17")

    sock.sendall(ws.encode_frame(
        ws.OP_TEXT, _json.dumps({"type": "bogus"}).encode(), mask=True))
    opcode, payload = read_one()
    assert opcode == ws.OP_TEXT
    assert "unknown control type" in _json.loads(payload)["error"]

    # unmasked client frame violates RFC 6455 5.1 -> protocol error event
    sock.sendall(ws.encode_frame(ws.OP_BINARY, b"\0\0", mask=False))
    opcode, payload = read_one()
    assert "unmasked" in _json.loads(payload)["error"]

    sock.close()


def test_ws_disconnect_frees_slot(model_setup, cc, server_factory):
    """A WS client that vanishes mid-stream releases its engine slot."""
    from nemotron_tpu.client import WSASRClient

    s = server_factory(_srv_kw={"ws_port": 0}, n_slots=1)
    c = WSASRClient("127.0.0.1", s.srv.ws_port)
    c.start()
    c.send_audio(synth(cc.chunk_samples, 5))
    c.sock.close()  # vanish without END / Close frame

    deadline = time.time() + 30
    while time.time() < deadline:
        with WSASRClient("127.0.0.1", s.srv.ws_port) as c2:
            try:
                c2.start()
                break
            except Exception:
                time.sleep(0.1)
    else:
        pytest.fail("slot was never reclaimed after WS disconnect")


def test_refined_utterance_events(model_setup, cc, server_factory):
    """Two-pass serving plumbing: with a SegmentRefiner attached, each
    UTTERANCE event carries a \"refined\" field equal to the refiner's
    batched beam re-decode of the captured segment audio."""
    import time as _time

    from nemotron_tpu.streaming.refine import SegmentRefiner

    arrays, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    refiner = SegmentRefiner(params, cfg, vocab, beam_size=2,
                             compute_dtype=np.float32)
    s = server_factory(_srv_kw={"refiner": refiner},
                       endpoint_silence_s=1.0, keep_segment_audio=True)
    n = cc.chunk_samples
    audio = synth(2 * n, 60)
    with ASRClient(*s.addr) as c:
        info = c.start()
        assert info["refined"] is True
        c.send_audio(audio)
        deadline = _time.time() + 60
        while _time.time() < deadline:
            c.pump()
            if c.transcript:
                break
            _time.sleep(0.05)
        assert c.transcript, "tiny model emitted nothing"
        eng = s.srv.engine
        slot = info["slot"]
        # wait until every buffered chunk is consumed so frame_offsets is
        # final (otherwise the expected-value computation below races the
        # still-draining ticker)
        deadline = _time.time() + 60
        while (_time.time() < deadline
               and eng.mel_buffers[slot].count >= cc.chunk_mel_frames):
            _time.sleep(0.05)
        cut_samples = int(eng.frame_offsets[slot]) * eng._seg_spf

        # inject the endpoint WITH its captured segment (as _ep_update
        # would at silence expiry)
        def fire():
            seg = eng.seg_buffers[slot].cut(cut_samples)
            eng._ep_pending.append((slot, len(eng.tokens[slot]), seg))

        s.loop.call_soon_threadsafe(fire)
        deadline = _time.time() + 120
        while _time.time() < deadline and not c.utterances:
            c.pump()
            _time.sleep(0.05)
        assert c.utterances, "no UTTERANCE event arrived"
        utt = c.utterances[0]
        assert "refined" in utt and isinstance(utt["refined"], str)
        # equality gate: refine() of the same segment reproduces it
        want = refiner.refine([audio[:cut_samples]])[0]
        assert utt["refined"] == want
        c.end()


def test_refiner_failure_still_delivers_online_text(model_setup, cc,
                                                    server_factory):
    """A refiner exception must not lose the utterance: the UTTERANCE
    event still arrives with the online greedy text/tokens, just without
    the \"refined\" field (poll_endpoints drains the engine queue before
    refinement runs, so dropping the event would be unrecoverable)."""
    import time as _time

    from nemotron_tpu.streaming.refine import SegmentRefiner

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]

    class _Boom(SegmentRefiner):
        def refine(self, segments):
            raise RuntimeError("synthetic refiner failure")

    refiner = _Boom(params, cfg, vocab, beam_size=2,
                    compute_dtype=np.float32)
    s = server_factory(_srv_kw={"refiner": refiner},
                       endpoint_silence_s=1.0, keep_segment_audio=True)
    n = cc.chunk_samples
    audio = synth(2 * n, 60)
    with ASRClient(*s.addr) as c:
        info = c.start()
        c.send_audio(audio)
        deadline = _time.time() + 60
        while _time.time() < deadline and not c.transcript:
            c.pump()
            _time.sleep(0.05)
        assert c.transcript, "tiny model emitted nothing"
        eng = s.srv.engine
        slot = info["slot"]
        deadline = _time.time() + 60
        while (_time.time() < deadline
               and eng.mel_buffers[slot].count >= cc.chunk_mel_frames):
            _time.sleep(0.05)
        cut_samples = int(eng.frame_offsets[slot]) * eng._seg_spf

        def fire():
            seg = eng.seg_buffers[slot].cut(cut_samples)
            eng._ep_pending.append((slot, len(eng.tokens[slot]), seg))

        s.loop.call_soon_threadsafe(fire)
        deadline = _time.time() + 120
        while _time.time() < deadline and not c.utterances:
            c.pump()
            _time.sleep(0.05)
        assert c.utterances, \
            "UTTERANCE event was lost when the refiner failed"
        utt = c.utterances[0]
        assert "refined" not in utt
        assert utt["text"]          # the online greedy text survived
        c.end()


def test_refiner_requires_segment_audio(model_setup, cc):
    from nemotron_tpu.streaming.refine import SegmentRefiner

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = make_engine(model_setup, cc)
    refiner = SegmentRefiner(params, cfg, vocab, beam_size=2)
    with pytest.raises(ValueError, match="keep_segment_audio"):
        ASRServer(eng, refiner=refiner)
