"""Decode-mode widening in the serving engines: TDT (duration-aware walk,
cross-chunk skip carry) and CTC (auxiliary-head collapse carry) must match
their solo StreamSession counterparts exactly, across host-DSP continuous
batching, on-device DSP, and the lockstep fused tick -- the same
engine-vs-solo contract the greedy/beam/confidence modes gate."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from nemotron_tpu import params as params_mod
from nemotron_tpu.config import CacheConfig
from nemotron_tpu.streaming.serving import ServingEngine
from nemotron_tpu.streaming.session import StreamSession


@pytest.fixture(scope="module")
def tdt_setup():
    cfg = dataclasses.replace(tiny_config(), tdt_durations=(0, 1, 2, 3))
    arrays = params_mod.random_weight_arrays(cfg, seed=3)
    return params_mod.params_from_arrays(arrays, cfg), cfg


@pytest.fixture(scope="module")
def hybrid_setup():
    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0, ctc_head=True)
    return params_mod.params_from_arrays(arrays, cfg), cfg


@pytest.fixture()
def cc(tdt_setup):
    _, cfg = tdt_setup
    return CacheConfig(att_right_context=1, att_left_context=12,
                       n_mels=cfg.n_mels)


def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)


def vocab_for(cfg):
    return [f"w{i}" for i in range(cfg.vocab_size)]


def _ragged_vs_solo(params, cfg, cc, dsp, **mode):
    """Shared harness: 3 slots at independent rates (one half-rate, one
    admitted late) must each equal their solo session; exact for host DSP,
    prefix for the device path (its finalize pads one extra chunk)."""
    vocab = vocab_for(cfg)
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=4,
                        compute_dtype=jnp.float32, dsp=dsp, **mode)
    s_full, s_half = eng.add_streams(2)
    n = (cc.shift_samples if dsp == "device" else cc.chunk_samples)
    full_audio = np.concatenate([synth(n, 60) for _ in range(6)])
    half_audio = np.concatenate([synth(n, 70) for _ in range(3)])
    late_audio = np.concatenate([synth(n, 80) for _ in range(3)])
    s_late = None
    for tick in range(6):
        feed = {s_full: full_audio[tick * n:(tick + 1) * n]}
        if tick % 2 == 0:
            feed[s_half] = half_audio[(tick // 2) * n:(tick // 2 + 1) * n]
        if tick == 3:
            s_late = eng.add_stream()
        if s_late is not None and tick >= 3:
            feed[s_late] = late_audio[(tick - 3) * n:(tick - 2) * n]
        eng.feed_audio(feed)
        eng.step()
    finals = {s: eng.finalize_stream(s)
              for s in (s_full, s_half, s_late)}

    for s, audio in ((s_full, full_audio), (s_half, half_audio),
                     (s_late, late_audio)):
        sess = StreamSession(params, cfg, vocab, cc, **mode)
        sess.process(audio)
        sess.finalize()
        want = sess.get_transcript(0)
        if dsp == "device":
            assert finals[s].startswith(want), (s, finals[s], want)
        else:
            assert finals[s] == want, (s, finals[s], want)
        assert want or not finals[s]


def test_serving_tdt_matches_solo(tdt_setup, cc):
    params, cfg = tdt_setup
    _ragged_vs_solo(params, cfg, cc, dsp="numpy")


def test_serving_tdt_device_dsp(tdt_setup, cc):
    params, cfg = tdt_setup
    _ragged_vs_solo(params, cfg, cc, dsp="device")


def test_serving_ctc_matches_solo(hybrid_setup, cc):
    params, cfg = hybrid_setup
    _ragged_vs_solo(params, cfg, cc, dsp="numpy", ctc=True)


def test_serving_ctc_device_dsp(hybrid_setup, cc):
    params, cfg = hybrid_setup
    _ragged_vs_solo(params, cfg, cc, dsp="device", ctc=True)


def test_serving_tdt_snapshot_resume(tdt_setup, cc, tmp_path):
    params, cfg = tdt_setup
    vocab = vocab_for(cfg)

    def make():
        return ServingEngine(params, cfg, vocab, cc, n_slots=2,
                             compute_dtype=jnp.float32, dsp="numpy")

    eng = make()
    s0, s1 = eng.add_streams(2)
    n = cc.chunk_samples
    audio = {s: np.concatenate([synth(n, 90 + s) for _ in range(4)])
             for s in (s0, s1)}
    eng.feed_audio({s: audio[s][:2 * n] for s in (s0, s1)})
    eng.step()
    path = str(tmp_path / "eng_tdt.npz")
    eng.save(path)

    eng2 = make()
    eng2.load(path)
    for e in (eng, eng2):
        e.feed_audio({s: audio[s][2 * n:] for s in (s0, s1)})
        e.step()
    assert eng.transcripts == eng2.transcripts
    assert [eng.tokens[s] for s in (s0, s1)] == \
        [eng2.tokens[s] for s in (s0, s1)]

    # mode mismatch: a greedy engine must reject the TDT snapshot
    rnnt_cfg = tiny_config()
    rnnt_params = params_mod.params_from_arrays(
        params_mod.random_weight_arrays(rnnt_cfg, seed=0), rnnt_cfg)
    eng3 = ServingEngine(rnnt_params, rnnt_cfg, vocab_for(rnnt_cfg),
                         CacheConfig(att_right_context=1,
                                     att_left_context=12,
                                     n_mels=rnnt_cfg.n_mels),
                         n_slots=2, compute_dtype=jnp.float32, dsp="numpy")
    with pytest.raises(ValueError, match="TDT"):
        eng3.load(path)


def test_lockstep_tdt_and_ctc_match_session(tdt_setup, hybrid_setup, cc):
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    for (params, cfg), mode in ((tdt_setup, {}),
                                (hybrid_setup, {"ctc": True})):
        vocab = vocab_for(cfg)
        S, n = 2, cc.shift_samples
        rng = np.random.default_rng(11)
        audio = (rng.standard_normal((S, 4 * n)) * 8000).astype(np.int16)

        eng = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                             compute_dtype=jnp.float32, **mode)
        for t in range(4):
            eng.tick(audio[:, t * n:(t + 1) * n])
        final_eng = eng.finalize()

        sess = StreamSession(params, cfg, vocab, cc, n_streams=S, **mode)
        sess.process(audio)
        final_sess = sess.finalize()
        assert final_eng == final_sess, mode
        for s in range(S):
            assert eng.tokens[s] == sess.get_tokens(s), (mode, s)


def test_engine_mode_exclusions(tdt_setup, hybrid_setup, cc):
    params, cfg = tdt_setup
    with pytest.raises(ValueError, match="confidence requires greedy"):
        ServingEngine(params, cfg, None, cc, n_slots=2, dsp="numpy",
                      beam_size=2, confidence=True)
    hp, hcfg = hybrid_setup
    with pytest.raises(ValueError, match="prefix search"):
        ServingEngine(hp, hcfg, None, cc, n_slots=2, dsp="numpy", ctc=True,
                      beam_size=2)
    with pytest.raises(ValueError, match="prediction network"):
        ServingEngine(hp, hcfg, None, cc, n_slots=2, dsp="numpy", ctc=True,
                      endpoint_silence_s=1.0, endpoint_reset=True)


# ---------------------------------------------------------------------------
# round 4: decode-feature matrix closed -- TDT beam/confidence and CTC
# confidence through both engines (VERDICT r3 item 5)
# ---------------------------------------------------------------------------

def test_serving_tdt_confidence_matches_solo(tdt_setup, cc):
    params, cfg = tdt_setup
    _ragged_vs_solo(params, cfg, cc, dsp="numpy", confidence=True)


def test_serving_tdt_beam_matches_solo(tdt_setup, cc):
    params, cfg = tdt_setup
    _ragged_vs_solo(params, cfg, cc, dsp="numpy", beam_size=2)


def test_serving_tdt_beam_device_dsp(tdt_setup, cc):
    params, cfg = tdt_setup
    _ragged_vs_solo(params, cfg, cc, dsp="device", beam_size=2)


def test_serving_ctc_confidence_matches_solo(hybrid_setup, cc):
    params, cfg = hybrid_setup
    _ragged_vs_solo(params, cfg, cc, dsp="numpy", ctc=True, confidence=True)


def test_serving_ctc_confidence_device_dsp(hybrid_setup, cc):
    params, cfg = hybrid_setup
    _ragged_vs_solo(params, cfg, cc, dsp="device", ctc=True, confidence=True)


def test_lockstep_new_modes_match_session(tdt_setup, hybrid_setup, cc):
    """TDT confidence / TDT beam / CTC confidence through the lockstep
    fused tick: transcripts AND token tuples (incl. confidence triples)
    equal the solo StreamSession."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    for (params, cfg), mode in ((tdt_setup, {"confidence": True}),
                                (tdt_setup, {"beam_size": 2}),
                                (hybrid_setup, {"ctc": True,
                                                "confidence": True})):
        vocab = vocab_for(cfg)
        S, n = 2, cc.shift_samples
        rng = np.random.default_rng(23)
        audio = (rng.standard_normal((S, 4 * n)) * 8000).astype(np.int16)

        eng = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                             compute_dtype=jnp.float32, **mode)
        for t in range(4):
            eng.tick(audio[:, t * n:(t + 1) * n])
        final_eng = eng.finalize()

        sess = StreamSession(params, cfg, vocab, cc, n_streams=S, **mode)
        sess.process(audio)
        final_sess = sess.finalize()
        assert final_eng == final_sess, mode
        if "beam_size" not in mode:
            for s in range(S):
                got, want = eng.tokens[s], sess.get_tokens(s)
                assert [(t_, f) for t_, f, *_ in got] == \
                    [(t_, f) for t_, f, *_ in want], (mode, s)
                for g, w in zip(got, want):
                    # f32 logsumexp in differently-fused programs: ~1e-5
                    assert g[2] == pytest.approx(w[2], abs=1e-4), (mode, s)


def test_serving_tdt_beam_snapshot_resume(tdt_setup, cc, tmp_path):
    """TDT-beam engine snapshot: exact resume + family-mismatch rejection."""
    params, cfg = tdt_setup
    vocab = vocab_for(cfg)

    def make():
        return ServingEngine(params, cfg, vocab, cc, n_slots=2,
                             compute_dtype=jnp.float32, dsp="numpy",
                             beam_size=2)

    eng = make()
    s0 = eng.add_stream()
    n = cc.chunk_samples
    audio = np.concatenate([synth(n, 33) for _ in range(4)])
    eng.feed_audio({s0: audio[:2 * n]})
    eng.step()
    path = str(tmp_path / "eng_tdt_beam.npz")
    eng.save(path)

    eng2 = make()
    eng2.load(path)
    for e in (eng, eng2):
        e.feed_audio({s0: audio[2 * n:]})
        e.step()
        e.refresh_transcripts()
    assert eng.transcripts == eng2.transcripts

    # an RNN-T beam engine must reject the TDT beam snapshot
    rnnt_cfg = tiny_config()
    rnnt_params = params_mod.params_from_arrays(
        params_mod.random_weight_arrays(rnnt_cfg, seed=0), rnnt_cfg)
    eng3 = ServingEngine(rnnt_params, rnnt_cfg, vocab_for(rnnt_cfg),
                         CacheConfig(att_right_context=1,
                                     att_left_context=12,
                                     n_mels=rnnt_cfg.n_mels),
                         n_slots=2, compute_dtype=jnp.float32, dsp="numpy",
                         beam_size=2)
    # the tdt_skip presence check fires before the beam-family one; either
    # rejection is correct
    with pytest.raises(ValueError, match="TDT"):
        eng3.load(path)
