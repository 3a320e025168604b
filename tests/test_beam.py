"""On-device batched RNN-T beam search vs the plain-Python beam oracle
(and internal consistency gates). Reference has greedy only
(src/nemo-ggml.cpp:1109-1429); beam is a capability beyond it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.models import beam as beam_mod
from nemotron_tpu.models import decoder as dec_mod
from nemotron_tpu.oracle.beam import OracleBeam


@pytest.fixture(scope="module")
def enc_batch(model_setup):
    _arrays, _params, cfg = model_setup
    rng = np.random.default_rng(42)
    B, T = 2, 4
    return rng.standard_normal((B, T, cfg.d_model)).astype(np.float32) * 0.5


@pytest.mark.parametrize("K,expansions", [(1, 3), (2, 3), (4, 2)])
def test_beam_matches_oracle(model_setup, enc_batch, K, expansions):
    arrays, params, cfg = model_setup
    B, T, _ = enc_batch.shape
    U = 32

    st = beam_mod.init_beam_state(cfg, B, K, U)
    run = jax.jit(beam_mod.beam_decode,
                  static_argnums=(1, 4, 5))
    st = run(params, cfg, jnp.asarray(enc_batch), st, K, expansions)
    tokens, lengths, scores = beam_mod.best_hypothesis(st)
    tokens, lengths, scores = (np.asarray(tokens), np.asarray(lengths),
                               np.asarray(scores))

    oracle = OracleBeam(arrays, cfg)
    for b in range(B):
        want = oracle.decode(enc_batch[b], K, expansions, max_tokens=U)
        got = tokens[b, : lengths[b]].tolist()
        assert got == want.tokens, (
            f"stream {b} K={K}: {got} vs oracle {want.tokens}")
        np.testing.assert_allclose(scores[b], want.score, rtol=2e-4,
                                   err_msg=f"stream {b} K={K}")


def test_beam_score_monotone(model_setup, enc_batch):
    _arrays, params, cfg = model_setup
    B = enc_batch.shape[0]
    run = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))
    scores = {}
    for K in (1, 4):
        st = beam_mod.init_beam_state(cfg, B, K, 32)
        st = run(params, cfg, jnp.asarray(enc_batch), st, K, 3)
        _t, _l, s = beam_mod.best_hypothesis(st)
        scores[K] = np.asarray(s)
    assert np.all(scores[4] >= scores[1] - 1e-5)


def test_beam_ragged_matches_solo(model_setup, enc_batch):
    """enc_lengths-padded batch decodes exactly like each stream alone."""
    _arrays, params, cfg = model_setup
    B, T, D = enc_batch.shape
    K = 2
    run = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))

    lens = np.array([T, T - 2], np.int32)
    st = beam_mod.init_beam_state(cfg, B, K, 32)
    st = run(params, cfg, jnp.asarray(enc_batch), st, K, 3,
             jnp.asarray(lens))
    tok_b, len_b, _ = (np.asarray(x) for x in beam_mod.best_hypothesis(st))

    for b in range(B):
        solo = beam_mod.init_beam_state(cfg, 1, K, 32)
        solo = run(params, cfg, jnp.asarray(enc_batch[b : b + 1, : lens[b]]),
                   solo, K, 3)
        ts, ls, _ = (np.asarray(x) for x in beam_mod.best_hypothesis(solo))
        assert tok_b[b, : len_b[b]].tolist() == ts[0, : ls[0]].tolist()


def test_beam_chunk_carry(model_setup, enc_batch):
    """Beam state carried across two calls == one call over the
    concatenated frames (the streaming-chunk invariant)."""
    _arrays, params, cfg = model_setup
    B, T, _ = enc_batch.shape
    K = 2
    run = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))

    st_once = beam_mod.init_beam_state(cfg, B, K, 32)
    st_once = run(params, cfg, jnp.asarray(enc_batch), st_once, K, 3)

    st = beam_mod.init_beam_state(cfg, B, K, 32)
    st = run(params, cfg, jnp.asarray(enc_batch[:, : 2]), st, K, 3)
    st = run(params, cfg, jnp.asarray(enc_batch[:, 2:]), st, K, 3)

    for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(st_once),
                              jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   atol=1e-5)


def test_beam_greedy_score_floor(model_setup, enc_batch):
    """The beam-1 best path's probability is >= the greedy path's
    probability (beam can only improve on greedy's frame-local commits)."""
    arrays, params, cfg = model_setup
    B = enc_batch.shape[0]
    blank = cfg.blank_token

    # greedy path + its score via the oracle's scoring machinery
    gstate = dec_mod.init_decoder_state(cfg, B)
    gtok, _ = jax.jit(dec_mod.greedy_decode, static_argnums=(1,))(
        params, cfg, jnp.asarray(enc_batch), gstate)
    gtok = np.asarray(gtok)                                # [B, T, MAX]

    ob = OracleBeam(arrays, cfg)
    run = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))
    for b in range(B):
        # score greedy's label sequence frame by frame
        L, H = cfg.decoder_layers, cfg.decoder_dim
        h = np.zeros((L, H), np.float32)
        c = np.zeros((L, H), np.float32)
        prev, score = blank, 0.0
        for t in range(enc_batch.shape[1]):
            for v in gtok[b, t]:
                dec_out, h2, c2 = ob._dec_step(prev, h, c)
                logp = ob._joint_logp(enc_batch[b, t], dec_out)
                if v == blank:
                    score += logp[blank]
                    break
                score += logp[v]
                h, c, prev = h2, c2, int(v)
            else:
                dec_out, _h, _c = ob._dec_step(prev, h, c)
                score += ob._joint_logp(enc_batch[b, t], dec_out)[blank]

        st = beam_mod.init_beam_state(cfg, 1, 1, 64)
        st = run(params, cfg, jnp.asarray(enc_batch[b : b + 1]), st, 1, 10)
        _t, _l, s = beam_mod.best_hypothesis(st)
        assert float(np.asarray(s)[0]) >= score - 1e-4


def test_transcribe_batch_beam_wiring(model_setup):
    """transcribe_batch(beam_size>1) runs the full pipeline and returns
    per-utterance strings (the --beam CLI path)."""
    arrays, params, cfg = model_setup
    rng = np.random.default_rng(0)
    from nemotron_tpu.streaming.session import transcribe_batch

    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    audio = (rng.standard_normal(8000) * 3000).astype(np.int16)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    texts = transcribe_batch(params, cfg, vocab, [audio, audio],
                             filterbank=fb, window=win, beam_size=2)
    assert isinstance(texts, list) and len(texts) == 2
    assert texts[0] == texts[1]  # identical inputs decode identically
    with pytest.raises(ValueError, match="timestamps"):
        transcribe_batch(params, cfg, vocab, audio, filterbank=fb,
                         window=win, beam_size=2, timestamp_words=True)


def test_n_best(model_setup, enc_batch):
    """n_best: rank 0 == best_hypothesis under the same ranking; the
    ranking key (length-normalized score) is non-increasing down the list;
    clamping n > K returns K rows."""
    _arrays, params, cfg = model_setup
    B, T, _ = enc_batch.shape
    K, U = 4, 32
    st = beam_mod.init_beam_state(cfg, B, K, U)
    st = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))(
        params, cfg, jnp.asarray(enc_batch), st, K, 3)

    btok, blen, bsc = (np.asarray(x) for x in
                       beam_mod.best_hypothesis(st, length_norm=True))
    ntok, nlen, nsc = (np.asarray(x) for x in
                       beam_mod.n_best(st, length_norm=True))
    assert ntok.shape[:2] == (B, K) and nlen.shape == (B, K)
    for b in range(B):
        assert nlen[b, 0] == blen[b]
        assert ntok[b, 0, : nlen[b, 0]].tolist() == \
            btok[b, : blen[b]].tolist()
        assert nsc[b, 0] == pytest.approx(bsc[b])
        key = nsc[b] / np.maximum(nlen[b], 1)
        assert (np.diff(key) <= 1e-6).all()

    ntok2, _, _ = beam_mod.n_best(st, n=K + 3, length_norm=True)
    assert ntok2.shape[1] == K
    ntok1, _, _ = beam_mod.n_best(st, n=2, length_norm=True)
    assert ntok1.shape[1] == 2


def test_transcribe_batch_nbest(model_setup):
    """transcribe_batch(return_nbest=N): rank-0 text == the plain beam
    text; N hypotheses with raw scores; greedy rejects the flag."""
    arrays, params, cfg = model_setup
    rng = np.random.default_rng(0)
    from nemotron_tpu.streaming.session import transcribe_batch

    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    audio = (rng.standard_normal(8000) * 3000).astype(np.int16)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    best = transcribe_batch(params, cfg, vocab, audio,
                            filterbank=fb, window=win, beam_size=3)
    hyps = transcribe_batch(params, cfg, vocab, audio, filterbank=fb,
                            window=win, beam_size=3, return_nbest=3)
    assert len(hyps) == 3
    assert hyps[0][0] == best
    assert all(isinstance(t, str) and isinstance(s, float)
               for t, s in hyps)
    with pytest.raises(ValueError, match="beam"):
        transcribe_batch(params, cfg, vocab, audio, filterbank=fb,
                         window=win, return_nbest=2)


def test_stream_session_beam(model_setup):
    """StreamSession(beam_size=K) over chunks == encode_chunk frames fed
    through beam_decode with carried state; snapshot/resume preserves the
    beam exactly."""
    arrays, params, cfg = model_setup
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils.text import tokens_to_text

    rng = np.random.default_rng(5)
    K = 2
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)

    sess = StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win,
                         beam_size=K, max_beam_tokens=64)
    n = 3 * cc.chunk_samples
    audio = (rng.standard_normal((1, n)) * 8000).astype(np.int16)
    inc = sess.process(audio)
    assert inc == [""]  # beam mode emits no incremental text

    # manual pipeline: same mel -> streaming encoder -> beam_decode
    from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
    from nemotron_tpu.config import PreprocessorConfig

    pre = StreamingPreprocessor(fb, win,
                                cfg=PreprocessorConfig(n_mels=cfg.n_mels))
    mel = pre.process(audio)
    st = enc_mod.init_encoder_state(cfg, cc, 1)
    ph = enc_mod.precompute_pos_heads(params, cfg, cc)
    bstate = beam_mod.init_beam_state(cfg, 1, K, 64)
    ofs = 0
    from nemotron_tpu.config import MAX_SYMBOLS_PER_STEP
    while mel.shape[1] - ofs >= cc.chunk_mel_frames:
        chunk = jnp.asarray(mel[:, ofs : ofs + cc.chunk_mel_frames])
        enc_out, st = enc_mod.encode_chunk(params, cfg, cc, chunk, st, ph)
        bstate = beam_mod.beam_decode(params, cfg, enc_out, bstate, K,
                                      MAX_SYMBOLS_PER_STEP)
        ofs += cc.shift_mel_frames
    btok, blen, _ = beam_mod.best_hypothesis(bstate, length_norm=True)
    want = tokens_to_text(
        [(int(t), 0) for t in np.asarray(btok)[0, : np.asarray(blen)[0]]],
        vocab)
    assert sess.get_transcript(0) == want

    # snapshot -> new session -> resume -> identical beam state
    sd = sess.state_dict()
    assert "beam/h" in sd
    sess2 = StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win,
                          beam_size=K, max_beam_tokens=64)
    sess2.load_state_dict(sd)
    more = (rng.standard_normal((1, cc.chunk_samples)) * 8000).astype(np.int16)
    sess.process(more)
    sess2.process(more)
    assert sess.get_transcript(0) == sess2.get_transcript(0)
    np.testing.assert_allclose(np.asarray(sess.beam_state.scores),
                               np.asarray(sess2.beam_state.scores),
                               atol=1e-6)


def test_session_snapshot_beam_compat(model_setup):
    """Snapshot/session beam-width mismatches raise instead of producing an
    inconsistent resume (greedy session + beam snapshot, beam session +
    greedy snapshot, K mismatch)."""
    _arrays, params, cfg = model_setup
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.session import StreamSession

    rng = np.random.default_rng(7)
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels)
    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)

    def make(k):
        return StreamSession(params, cfg, None, cc, filterbank=fb,
                             window=win, beam_size=k, max_beam_tokens=32)

    greedy_sd = make(1).state_dict()
    beam_sd = make(2).state_dict()

    with pytest.raises(ValueError, match="no beam state"):
        make(2).load_state_dict(greedy_sd)
    with pytest.raises(ValueError, match="greedily"):
        make(1).load_state_dict(beam_sd)
    with pytest.raises(ValueError, match="beam_size=3"):
        make(3).load_state_dict(beam_sd)
    # matching widths still round-trip
    make(2).load_state_dict(beam_sd)
    make(1).load_state_dict(greedy_sd)
