"""Streaming TDT decode in StreamSession.

The duration-aware walk crosses chunk boundaries (a jump can overshoot the
chunk's valid frames), so the session carries a per-stream skip count.
Gate: the chunked session's emissions (ids AND frame indices) equal a
one-shot TDT decode over the concatenated per-chunk encoder outputs --
the same full-vs-chunked contract the RNN-T and CTC streaming paths gate.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from nemotron_tpu import params as params_mod
from nemotron_tpu.config import CacheConfig
from nemotron_tpu.frontend.preprocessor import (hann_window,
                                                mel_filterbank_slaney)
from nemotron_tpu.models import decoder as dec_mod
from nemotron_tpu.models import encoder as enc_mod
from nemotron_tpu.models.tdt import tdt_greedy_decode
from nemotron_tpu.streaming.session import StreamSession
from nemotron_tpu.training import make_train_step


@pytest.fixture(scope="module")
def tdt_setup():
    cfg = dataclasses.replace(tiny_config(), tdt_durations=(0, 1, 2, 3))
    arrays = params_mod.random_weight_arrays(cfg, seed=3)
    params = params_mod.params_from_arrays(arrays, cfg)
    return params, cfg


def make_session(params, cfg, cc, n_streams=1, **kw):
    fb = mel_filterbank_slaney(n_mels=cfg.n_mels)
    win = hann_window(400)
    vocab = [f"x{i}" for i in range(cfg.vocab_size)]
    return StreamSession(params, cfg, vocab, cc, n_streams=n_streams,
                         filterbank=fb, window=win, **kw)


def session_enc_outs(params, cfg, cc, mel, n_streams):
    """Independent re-derivation of the session's chunked encoder outputs
    (concatenated valid frames)."""
    buf = np.concatenate(
        [np.zeros((n_streams, cc.pre_encode_cache_size, cfg.n_mels),
                  np.float32), mel], axis=1)
    enc_state = enc_mod.init_encoder_state(cfg, cc, n_streams, jnp.float32)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    out = []
    while buf.shape[1] >= cc.chunk_mel_frames:
        chunk = jnp.asarray(buf[:, : cc.chunk_mel_frames], jnp.float32)
        enc_out, enc_state = enc_mod.encode_chunk(params, cfg, cc, chunk,
                                                  enc_state, pos_heads)
        out.append(np.asarray(enc_out))
        buf = buf[:, cc.shift_mel_frames:]
    return np.concatenate(out, axis=1)


@pytest.mark.parametrize("right_context", [0, 13])
def test_streaming_tdt_equals_full_decode(tdt_setup, right_context):
    params, cfg = tdt_setup
    cc = CacheConfig(att_right_context=right_context, att_left_context=14,
                     n_mels=cfg.n_mels)
    S = 2
    rng = np.random.default_rng(7)
    total = cc.chunk_mel_frames * 3 + 5
    mel = (rng.standard_normal((S, total, cfg.n_mels)) * 2).astype(np.float32)

    sess = make_session(params, cfg, cc, n_streams=S)
    assert sess.tdt
    sess.process_mel(mel)

    enc = session_enc_outs(params, cfg, cc, mel, S)
    st = dec_mod.init_decoder_state(cfg, batch=S)
    tokens, _, _ = tdt_greedy_decode(params, cfg, jnp.asarray(enc), st)
    want = dec_mod.tokens_to_list(np.asarray(tokens), cfg.blank_token)
    for s in range(S):
        assert sess.get_tokens(s) == want[s], f"stream {s}"


def test_tdt_session_snapshot_roundtrip(tdt_setup, tmp_path):
    params, cfg = tdt_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    rng = np.random.default_rng(3)
    mel = (rng.standard_normal((1, cc.chunk_mel_frames * 4, cfg.n_mels)) * 2
           ).astype(np.float32)

    sess = make_session(params, cfg, cc)
    sess.process_mel(mel[:, : cc.chunk_mel_frames + 2])
    path = str(tmp_path / "tdt_sess.npz")
    sess.save(path)

    sess2 = make_session(params, cfg, cc)
    sess2.load(path)
    assert np.array_equal(np.asarray(sess2.tdt_skip),
                          np.asarray(sess.tdt_skip))
    sess.process_mel(mel[:, cc.chunk_mel_frames + 2:])
    sess2.process_mel(mel[:, cc.chunk_mel_frames + 2:])
    assert sess.get_tokens(0) == sess2.get_tokens(0)
    assert sess.get_transcript(0) == sess2.get_transcript(0)

    # mode mismatch: an RNN-T session must reject a TDT snapshot
    rnnt_cfg = tiny_config()
    rnnt_params = params_mod.params_from_arrays(
        params_mod.random_weight_arrays(rnnt_cfg, seed=0), rnnt_cfg)
    sess3 = make_session(rnnt_params, rnnt_cfg, cc)
    with pytest.raises(ValueError, match="TDT"):
        sess3.load(path)


def test_tdt_mode_exclusions(tdt_setup, tmp_path):
    """Tracing stays greedy-RNN-T-only; beam+confidence stay mutually
    exclusive (whole-sequence scores vs per-emission posteriors)."""
    params, cfg = tdt_setup
    cc = CacheConfig(att_right_context=0, att_left_context=14,
                     n_mels=cfg.n_mels)
    with pytest.raises(ValueError, match="greedy"):
        make_session(params, cfg, cc, trace_dir=str(tmp_path / "tr"))
    with pytest.raises(ValueError, match="greedy"):
        make_session(params, cfg, cc, beam_size=2, confidence=True)


def test_tdt_session_confidence(tdt_setup):
    """confidence=True on a TDT session: (id, frame) pairs identical to the
    plain greedy session, plus per-emission token-head log-posteriors that
    match a one-shot with_confidence decode over the same encoder outputs
    (VERDICT r3 item 5: the decode-feature matrix closed for TDT)."""
    params, cfg = tdt_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    S = 2
    rng = np.random.default_rng(11)
    total = cc.chunk_mel_frames * 3 + 4
    mel = (rng.standard_normal((S, total, cfg.n_mels)) * 2).astype(np.float32)

    sess = make_session(params, cfg, cc, n_streams=S, confidence=True)
    assert sess.tdt and sess.confidence
    sess.process_mel(mel)

    enc = session_enc_outs(params, cfg, cc, mel, S)
    st = dec_mod.init_decoder_state(cfg, batch=S)
    tokens, confs, _, _ = tdt_greedy_decode(params, cfg, jnp.asarray(enc),
                                            st, with_confidence=True)
    emitted = dec_mod.extract_emitted(np.asarray(tokens), cfg.blank_token,
                                      confs=np.asarray(confs))
    for s in range(S):
        got = sess.get_tokens(s)
        want = emitted.get(s, [])
        assert [(t, f) for t, f, _c in got] == [(t, f) for t, f, _c in want]
        for (_, _, cg), (_, _, cw) in zip(got, want):
            assert cg == pytest.approx(cw, abs=1e-5)
            assert cg <= 0.0


def test_tdt_session_beam(tdt_setup):
    """beam_size>1 on a TDT session: the chunked session's final best
    hypothesis equals a one-shot tdt_beam_decode over the same encoder
    outputs (exact, via the frontier-synchronized search's chunk-carry
    invariance)."""
    from nemotron_tpu.models.beam import best_hypothesis
    from nemotron_tpu.models.tdt import init_tdt_beam_state, tdt_beam_decode

    params, cfg = tdt_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    S, K = 2, 3
    rng = np.random.default_rng(13)
    total = cc.chunk_mel_frames * 3 + 4
    mel = (rng.standard_normal((S, total, cfg.n_mels)) * 2).astype(np.float32)

    sess = make_session(params, cfg, cc, n_streams=S, beam_size=K)
    assert sess.tdt and sess.beam_state is not None
    sess.process_mel(mel)   # no finalize: the one-shot reference below
    # sees exactly the session's full chunks (finalize pads a partial one)

    enc = session_enc_outs(params, cfg, cc, mel, S)
    bst = init_tdt_beam_state(cfg, S, K, max_tokens=sess.max_beam_tokens)
    bst = tdt_beam_decode(params, cfg, jnp.asarray(enc), bst, K)
    btok, blen, _ = best_hypothesis(bst, length_norm=True)
    btok, blen = np.asarray(btok), np.asarray(blen)
    for s in range(S):
        want = [int(t) for t in btok[s, : blen[s]]]
        assert [t for t, _f in sess.get_tokens(s)] == want, f"stream {s}"


def test_tdt_beam_session_snapshot(tdt_setup, tmp_path):
    """TDT beam session snapshot/resume: exact continuation, and the
    beam-family mismatch is rejected."""
    params, cfg = tdt_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    rng = np.random.default_rng(5)
    mel = (rng.standard_normal((1, cc.chunk_mel_frames * 4, cfg.n_mels)) * 2
           ).astype(np.float32)

    sess = make_session(params, cfg, cc, beam_size=2)
    sess.process_mel(mel[:, : cc.chunk_mel_frames + 2])
    path = str(tmp_path / "tdt_beam_sess.npz")
    sess.save(path)

    sess2 = make_session(params, cfg, cc, beam_size=2)
    sess2.load(path)
    sess.process_mel(mel[:, cc.chunk_mel_frames + 2:])
    sess2.process_mel(mel[:, cc.chunk_mel_frames + 2:])
    assert sess.get_tokens(0) == sess2.get_tokens(0)
    assert sess.get_transcript(0) == sess2.get_transcript(0)

    # an RNN-T beam session must reject the TDT beam snapshot
    rnnt_cfg = tiny_config()
    rnnt_params = params_mod.params_from_arrays(
        params_mod.random_weight_arrays(rnnt_cfg, seed=0), rnnt_cfg)
    fb = mel_filterbank_slaney(n_mels=rnnt_cfg.n_mels)
    sess3 = StreamSession(rnnt_params, rnnt_cfg,
                          [f"x{i}" for i in range(rnnt_cfg.vocab_size)],
                          cc, filterbank=fb, window=hann_window(400),
                          beam_size=2)
    with pytest.raises(ValueError, match="TDT"):
        sess3.load(path)


def test_tdt_train_step_runs(tdt_setup):
    """One optimizer step through the TDT lattice: finite loss, params
    actually move, and a second step's loss is finite too."""
    import jax
    import optax

    params, cfg = tdt_setup
    # the train step donates params/opt_state; work on a copy so the
    # module-scoped fixture survives
    params = jax.tree.map(jnp.array, params)
    opt = optax.adamw(1e-3)
    step = make_train_step(cfg, opt, tdt_sigma=0.05)
    rng = np.random.default_rng(0)
    B, Tm, U = 2, 17, 3
    ef = Tm
    for _ in range(3):
        ef = ef // 2 + 1
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, Tm, cfg.n_mels)),
                           jnp.float32),
        "labels": jnp.asarray(rng.integers(0, cfg.vocab_size - 1, (B, U)),
                              jnp.int32),
        "mel_lengths": jnp.full((B,), ef, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    opt_state = opt.init(params)
    before = np.asarray(params.joint.out_b).copy()
    params2, opt_state, loss1 = step(params, opt_state, batch)
    after = np.asarray(params2.joint.out_b).copy()
    _, _, loss2 = step(params2, opt_state, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert not np.array_equal(before, after)
