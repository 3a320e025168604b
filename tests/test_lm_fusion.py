"""LM shallow fusion in beam decode (capability beyond the reference,
which has no LM anywhere): on-device fused search vs the plain-Python
oracle with the same LM, plus artifact round-trip and semantics gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.models import beam as beam_mod
from nemotron_tpu.models import lm as lm_mod
from nemotron_tpu.oracle.beam import OracleBeam


@pytest.fixture(scope="module")
def lm_setup(model_setup):
    _, _, cfg = model_setup
    arrays = lm_mod.random_lm_arrays(cfg.vocab_size, hidden=24, n_layers=2,
                                     seed=7)
    return arrays, lm_mod.lm_params_from_arrays(arrays)


@pytest.fixture(scope="module")
def enc_batch(model_setup):
    _arrays, _params, cfg = model_setup
    rng = np.random.default_rng(42)
    return rng.standard_normal((2, 4, cfg.d_model)).astype(np.float32) * 0.5


def _run(params, cfg, enc, K, expansions, lm=None, lm_weight=0.3, U=32,
         lm_bonus=0.0):
    st = beam_mod.init_beam_state(cfg, enc.shape[0], K, U, lm=lm)
    run = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5, 8))
    st = run(params, cfg, jnp.asarray(enc), st, K, expansions, None, lm,
             lm_weight, lm_bonus)
    t, l, s = beam_mod.best_hypothesis(st)
    return np.asarray(t), np.asarray(l), np.asarray(s)


def test_lm_gguf_roundtrip(lm_setup, tmp_path):
    arrays, lm = lm_setup
    path = str(tmp_path / "lm.gguf")
    lm_mod.save_lm(path, arrays)
    lm2 = lm_mod.load_lm(path)
    for a, b in zip(jax.tree_util.tree_leaves(lm),
                    jax.tree_util.tree_leaves(lm2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_logp_is_label_distribution(model_setup, lm_setup):
    """Blank is renormalized out: probs over real labels sum to 1."""
    _, _, cfg = model_setup
    _, lm = lm_setup
    h, c = lm_mod.init_lm_state(lm, (3,))
    lp, h2, c2 = lm_mod.lm_logp(lm, jnp.array([cfg.blank_token, 0, 5]),
                                h, c, cfg.blank_token)
    p = np.exp(np.asarray(lp))
    assert p[:, cfg.blank_token].max() == 0.0
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)
    assert not np.allclose(np.asarray(h2), 0.0)


@pytest.mark.parametrize("K,expansions", [(2, 3), (4, 2)])
def test_fusion_matches_oracle(model_setup, lm_setup, enc_batch, K,
                               expansions):
    arrays, params, cfg = model_setup
    lm_arrays, lm = lm_setup
    U = 32
    tokens, lengths, scores = _run(params, cfg, enc_batch, K, expansions,
                                   lm=lm, lm_weight=0.4, U=U, lm_bonus=0.35)
    oracle = OracleBeam(arrays, cfg, lm=lm_arrays, lm_weight=0.4,
                        lm_bonus=0.35)
    for b in range(enc_batch.shape[0]):
        want = oracle.decode(enc_batch[b], K, expansions, max_tokens=U)
        got = tokens[b, : lengths[b]].tolist()
        assert got == want.tokens, (
            f"stream {b} K={K}: {got} vs oracle {want.tokens}")
        np.testing.assert_allclose(scores[b], want.score, rtol=2e-4)


def test_zero_weight_matches_no_lm(model_setup, lm_setup, enc_batch):
    """lm_weight=0 runs the LM but must decode exactly like no LM."""
    _arrays, params, cfg = model_setup
    _, lm = lm_setup
    t0, l0, s0 = _run(params, cfg, enc_batch, 3, 3)
    t1, l1, s1 = _run(params, cfg, enc_batch, 3, 3, lm=lm, lm_weight=0.0)
    np.testing.assert_array_equal(l0, l1)
    for b in range(enc_batch.shape[0]):
        assert t0[b, : l0[b]].tolist() == t1[b, : l1[b]].tolist()
    np.testing.assert_allclose(s0, s1, rtol=1e-5)


def test_strong_lm_biases_labels(model_setup, lm_setup, enc_batch):
    """An LM that loves one label pulls the beam toward it."""
    _arrays, params, cfg = model_setup
    fav = 7
    arrays = lm_mod.random_lm_arrays(cfg.vocab_size, hidden=24, n_layers=1,
                                     seed=1, scale=0.0)
    arrays["lm.output.bias"][fav] = 25.0   # ~all LM mass on one label
    lm = lm_mod.lm_params_from_arrays(arrays)
    t0, l0, _ = _run(params, cfg, enc_batch, 4, 3)
    t1, l1, _ = _run(params, cfg, enc_batch, 4, 3, lm=lm, lm_weight=5.0)
    base = sum(int((t0[b, : l0[b]] == fav).sum()) for b in range(2))
    fused = sum(int((t1[b, : l1[b]] == fav).sum()) for b in range(2))
    assert fused >= base
    assert fused == sum(int(l) for l in l1)   # every emission is fav


def test_stream_session_lm_fusion(model_setup, lm_setup):
    """StreamSession(beam, lm): chunked streaming == the same mel fed
    through the manual encode_chunk + fused beam_decode pipeline;
    snapshot/resume carries the LM state exactly; LM-mode mismatches on
    load raise."""
    import jax.numpy as jnp
    from nemotron_tpu.config import (MAX_SYMBOLS_PER_STEP, CacheConfig,
                                     PreprocessorConfig)
    from nemotron_tpu.frontend.preprocessor import StreamingPreprocessor
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils.text import tokens_to_text

    _arrays, params, cfg = model_setup
    _, lm = lm_setup
    rng = np.random.default_rng(5)
    K = 2
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)

    sess = StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win,
                         beam_size=K, max_beam_tokens=64, lm=lm,
                         lm_weight=0.5)
    n = 3 * cc.chunk_samples
    audio = (rng.standard_normal((1, n)) * 8000).astype(np.int16)
    sess.process(audio)

    pre = StreamingPreprocessor(fb, win,
                                cfg=PreprocessorConfig(n_mels=cfg.n_mels))
    mel = pre.process(audio)
    st = enc_mod.init_encoder_state(cfg, cc, 1)
    ph = enc_mod.precompute_pos_heads(params, cfg, cc)
    bstate = beam_mod.init_beam_state(cfg, 1, K, 64, lm=lm)
    ofs = 0
    while mel.shape[1] - ofs >= cc.chunk_mel_frames:
        chunk = jnp.asarray(mel[:, ofs : ofs + cc.chunk_mel_frames])
        enc_out, st = enc_mod.encode_chunk(params, cfg, cc, chunk, st, ph)
        bstate = beam_mod.beam_decode(params, cfg, enc_out, bstate, K,
                                      MAX_SYMBOLS_PER_STEP, lm=lm,
                                      lm_weight=0.5)
        ofs += cc.shift_mel_frames
    btok, blen, _ = beam_mod.best_hypothesis(bstate, length_norm=True)
    want = tokens_to_text(
        [(int(t), 0) for t in np.asarray(btok)[0, : np.asarray(blen)[0]]],
        vocab)
    assert sess.get_transcript(0) == want

    # snapshot/resume: LM state must survive exactly
    sd = sess.state_dict()
    assert "beam/lm_h" in sd
    sess2 = StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win,
                          beam_size=K, max_beam_tokens=64, lm=lm,
                          lm_weight=0.5)
    sess2.load_state_dict(sd)
    more = (rng.standard_normal((1, cc.chunk_samples)) * 8000).astype(
        np.int16)
    sess.process(more)
    sess2.process(more)
    assert sess.get_transcript(0) == sess2.get_transcript(0)
    np.testing.assert_allclose(np.asarray(sess.beam_state.lm_h),
                               np.asarray(sess2.beam_state.lm_h), atol=1e-6)

    # mode mismatches raise
    no_lm = StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win,
                          beam_size=K, max_beam_tokens=64)
    with pytest.raises(ValueError, match="LM"):
        no_lm.load_state_dict(sd)
    with pytest.raises(ValueError, match="LM"):
        sess2.load_state_dict(no_lm.state_dict())
    with pytest.raises(ValueError, match="beam_size"):
        StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win,
                      lm=lm)


def test_transcribe_batch_lm(model_setup, lm_setup):
    """transcribe_batch(beam, lm) == direct fused beam_decode over the
    batch encoder output; lm without beam raises."""
    from nemotron_tpu.streaming.session import transcribe_batch

    _arrays, params, cfg = model_setup
    _, lm = lm_setup
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    audio = (rng.standard_normal(16000) * 8000).astype(np.int16)

    t_lm = transcribe_batch(params, cfg, vocab, audio, filterbank=fb,
                            window=win, beam_size=3, lm=lm, lm_weight=0.6)
    t_no = transcribe_batch(params, cfg, vocab, audio, filterbank=fb,
                            window=win, beam_size=3)
    assert isinstance(t_lm, str)   # decodes end to end
    # (with a random LM the outputs may or may not differ; the exactness
    # gate is test_fusion_matches_oracle -- here we gate the plumbing)
    assert isinstance(t_no, str)
    with pytest.raises(ValueError, match="beam_size"):
        transcribe_batch(params, cfg, vocab, audio, filterbank=fb,
                         window=win, lm=lm)


def test_engines_lm_fusion_match_session(model_setup, lm_setup):
    """Engine parity: LockstepEngine and ServingEngine with LM fusion
    equal a StreamSession with the same LM (state and transcripts);
    engine snapshot/resume carries the LM state; lm without beam raises."""
    from test_serving import assert_beams_equal, biased_params

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.lockstep import LockstepEngine
    from nemotron_tpu.streaming.serving import ServingEngine
    from nemotron_tpu.streaming.session import StreamSession

    _, _, cfg = model_setup
    _, lm = lm_setup
    params = biased_params(model_setup)
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=cfg.n_mels)
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(31)
    audio = (rng.standard_normal((S, 4 * n)) * 8000).astype(np.int16)

    sess = StreamSession(params, cfg, vocab, cc, n_streams=S, beam_size=2,
                         max_beam_tokens=64, lm=lm, lm_weight=0.5)
    sess.process(audio)

    lock = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                          compute_dtype=jnp.float32, beam_size=2,
                          max_beam_tokens=64, lm=lm, lm_weight=0.5)
    for t in range(4):
        lock.tick(audio[:, t * n:(t + 1) * n])
    assert_beams_equal(lock.beam_state, sess.beam_state)
    assert lock.refresh_transcripts() == list(sess.transcripts)
    np.testing.assert_allclose(np.asarray(lock.beam_state.lm_h),
                               np.asarray(sess.beam_state.lm_h), atol=1e-4)

    serv = ServingEngine(params, cfg, vocab, cc, n_slots=S,
                         compute_dtype=jnp.float32, beam_size=2,
                         max_beam_tokens=64, lm=lm, lm_weight=0.5)
    slots = serv.add_streams(S)
    for t in range(4):
        serv.feed_audio({s: audio[i, t * n:(t + 1) * n]
                         for i, s in enumerate(slots)})
        serv.step()
    assert_beams_equal(serv.beam_state, sess.beam_state)
    assert serv.refresh_transcripts() == list(sess.transcripts)

    with pytest.raises(ValueError, match="beam_size"):
        LockstepEngine(params, cfg, vocab, cc, n_streams=S, lm=lm)
    with pytest.raises(ValueError, match="beam_size"):
        ServingEngine(params, cfg, vocab, cc, n_slots=S, lm=lm)


# -- second-pass n-best rescoring (models/lm.py rescore_nbest) ----------------

def test_sequence_logp_matches_oracle_walk(model_setup, lm_setup):
    """lm_sequence_logp == summing the oracle's per-step _lm_step logps
    over each sequence (independent numpy LSTM walk)."""
    arrays, params, cfg = model_setup
    lm_arrays, lm = lm_setup
    blank = cfg.blank_token
    rng = np.random.default_rng(3)
    B, U = 3, 7
    labels = rng.integers(0, cfg.vocab_size - 1, (B, U)).astype(np.int32)
    lengths = np.array([7, 4, 0], np.int32)
    labels[1, 4:] = blank   # padding positions must be ignored

    got = np.asarray(lm_mod.lm_sequence_logp(
        lm, jnp.asarray(labels), jnp.asarray(lengths), blank))

    oracle = OracleBeam(arrays, cfg, lm=lm_arrays)
    for b in range(B):
        h = np.zeros((oracle.lm_layers, oracle.lm_hidden), np.float32)
        c = np.zeros_like(h)
        prev, total = blank, 0.0
        for u in range(int(lengths[b])):
            logp, h, c = oracle._lm_step(prev, h, c)
            total += logp[labels[b, u]]
            prev = int(labels[b, u])
        assert got[b] == pytest.approx(total, abs=1e-4), f"seq {b}"


def test_rescore_zero_weight_keeps_ranking(model_setup, lm_setup,
                                           enc_batch):
    """lm_weight=0, lm_bonus=0: rescoring must reproduce n_best's own
    length-normalized ranking and raw scores."""
    _, params, cfg = model_setup
    _, lm = lm_setup
    st = beam_mod.init_beam_state(cfg, enc_batch.shape[0], 4, 32)
    st = jax.jit(beam_mod.beam_decode, static_argnums=(1, 4, 5))(
        params, cfg, jnp.asarray(enc_batch), st, 4, 3, None)
    ntok, nlen, nsc = beam_mod.n_best(st, None, length_norm=False)
    order, comb = lm_mod.rescore_nbest(lm, ntok, nlen, nsc,
                                       cfg.blank_token, lm_weight=0.0)
    np.testing.assert_allclose(np.asarray(comb), np.asarray(nsc),
                               rtol=1e-6)
    want_sel = np.asarray(nsc) / np.maximum(np.asarray(nlen), 1)
    for b in range(want_sel.shape[0]):
        got_rank = np.asarray(order)[b]
        want_rank = np.argsort(-want_sel[b], kind="stable")
        # ties (identical normalized scores) may order arbitrarily;
        # compare the score sequence, not the indices
        np.testing.assert_allclose(want_sel[b][got_rank],
                                   want_sel[b][want_rank], rtol=1e-6)


def test_rescore_biased_lm_reranks(model_setup, lm_setup):
    """An LM with ~all mass on one label must promote the hypothesis
    made of that label over a higher-acoustic-score alternative."""
    _, params, cfg = model_setup
    blank = cfg.blank_token
    fav = 3
    arrays = lm_mod.random_lm_arrays(cfg.vocab_size, hidden=16, n_layers=1,
                                     seed=11)
    arrays["lm.output.bias"][fav] = 25.0
    lm = lm_mod.lm_params_from_arrays(arrays)

    # hand-built n-best: hyp 0 = [1, 2] (acoustically better),
    # hyp 1 = [fav, fav]
    tokens = jnp.asarray([[[1, 2], [fav, fav]]], jnp.int32)   # [1, 2, 2]
    lengths = jnp.asarray([[2, 2]], jnp.int32)
    scores = jnp.asarray([[-1.0, -2.0]], jnp.float32)
    order0, _ = lm_mod.rescore_nbest(lm, tokens, lengths, scores, blank,
                                     lm_weight=0.0)
    assert np.asarray(order0)[0, 0] == 0          # acoustics alone: hyp 0
    order1, comb1 = lm_mod.rescore_nbest(lm, tokens, lengths, scores,
                                         blank, lm_weight=1.0)
    assert np.asarray(order1)[0, 0] == 1          # LM flips the ranking
    assert np.asarray(comb1)[0, 1] > np.asarray(comb1)[0, 0]


def test_transcribe_batch_lm_rescore(model_setup, lm_setup):
    """End-to-end: lm_rescore with weight 0 returns exactly the plain
    beam transcript; the n-best variant returns combined scores sorted
    by the reranked order."""
    from nemotron_tpu.streaming.session import transcribe_batch

    arrays, params, cfg = model_setup
    _, lm = lm_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 8000).astype(np.int16)

    plain = transcribe_batch(params, cfg, vocab, audio, beam_size=3)
    res0 = transcribe_batch(params, cfg, vocab, audio, beam_size=3,
                            lm=lm, lm_weight=0.0, lm_rescore=True)
    assert res0 == plain

    nb = transcribe_batch(params, cfg, vocab, audio, beam_size=3,
                          return_nbest=3, lm=lm, lm_weight=0.4,
                          lm_rescore=True)
    assert len(nb) == 3
    # sorted best-first by length-normalized combined score is not
    # directly assertable from text alone, but scores must be finite
    # and the top text must be a real hypothesis string
    assert all(np.isfinite(s) for _t, s in nb)

    with pytest.raises(ValueError, match="lm_rescore needs"):
        transcribe_batch(params, cfg, vocab, audio, beam_size=3,
                         lm_rescore=True)


# ---------------------------------------------------------------------------
# round 4: LM fusion inside the TDT duration-aware beam
# ---------------------------------------------------------------------------

def _tdt_fixture():
    import dataclasses

    from conftest import tiny_config
    from nemotron_tpu import params as params_mod

    cfg = dataclasses.replace(tiny_config(), tdt_durations=(0, 1, 2, 3))
    arrays = params_mod.random_weight_arrays(cfg, seed=3)
    return params_mod.params_from_arrays(arrays, cfg), cfg


def _tdt_run(params, cfg, enc, K, lm=None, lm_weight=0.3, lm_bonus=0.0,
             U=256):
    from nemotron_tpu.models.tdt import init_tdt_beam_state, tdt_beam_decode

    st = init_tdt_beam_state(cfg, enc.shape[0], K, U, lm=lm)
    run = jax.jit(tdt_beam_decode, static_argnums=(1, 4))
    st = run(params, cfg, jnp.asarray(enc), st, K, None, None, lm,
             lm_weight, lm_bonus)
    t, l, s = beam_mod.best_hypothesis(st)
    return np.asarray(t), np.asarray(l), np.asarray(s)


def test_tdt_beam_lm_zero_weight_matches_no_lm(lm_setup):
    """lm_weight=0 with lm state threaded == no LM at all: the fusion
    term vanishes but the state carry machinery still runs -- the standard
    plumbing-isolation gate (mirrors test_zero_weight_matches_no_lm)."""
    params, cfg = _tdt_fixture()
    _, lm = lm_setup
    rng = np.random.default_rng(6)
    enc = (rng.standard_normal((2, 8, cfg.d_model)) * 3).astype(np.float32)
    t0, l0, s0 = _tdt_run(params, cfg, enc, K=3)
    t1, l1, s1 = _tdt_run(params, cfg, enc, K=3, lm=lm, lm_weight=0.0)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_allclose(s0, s1, atol=1e-4)


def test_tdt_beam_strong_lm_biases_labels(lm_setup):
    """A strongly-weighted LM changes the emitted labels toward its
    preferences (mirrors test_strong_lm_biases_labels for RNN-T)."""
    params, cfg = _tdt_fixture()
    _, lm = lm_setup
    rng = np.random.default_rng(8)
    enc = (rng.standard_normal((2, 8, cfg.d_model)) * 3).astype(np.float32)
    t0, l0, _ = _tdt_run(params, cfg, enc, K=3)
    t1, l1, _ = _tdt_run(params, cfg, enc, K=3, lm=lm, lm_weight=5.0)
    seq0 = [t0[b, :l0[b]].tolist() for b in range(2)]
    seq1 = [t1[b, :l1[b]].tolist() for b in range(2)]
    assert seq0 != seq1, "a 5.0-weight LM must change some label"


def test_tdt_session_beam_lm_runs(lm_setup):
    """StreamSession TDT + beam + LM fusion end-to-end: runs, carries the
    per-hypothesis LM state across chunks, snapshot round-trips."""
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.frontend.preprocessor import (hann_window,
                                                    mel_filterbank_slaney)
    from nemotron_tpu.streaming.session import StreamSession

    params, cfg = _tdt_fixture()
    _, lm = lm_setup
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=cfg.n_mels)
    fb = mel_filterbank_slaney(n_mels=cfg.n_mels)
    sess = StreamSession(params, cfg, None, cc, filterbank=fb,
                         window=hann_window(400), beam_size=2, lm=lm,
                         lm_weight=0.5)
    rng = np.random.default_rng(3)
    mel = (rng.standard_normal((1, cc.chunk_mel_frames * 3, cfg.n_mels)) * 2
           ).astype(np.float32)
    sess.process_mel(mel)
    st = sess.state_dict()
    sess2 = StreamSession(params, cfg, None, cc, filterbank=fb,
                          window=hann_window(400), beam_size=2, lm=lm,
                          lm_weight=0.5)
    sess2.load_state_dict(st)
    sess.process_mel(mel)
    sess2.process_mel(mel)
    assert sess.get_tokens(0) == sess2.get_tokens(0)
