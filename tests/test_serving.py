"""Serving-engine tests: continuous batching (admission/eviction, slot
isolation) and mesh-sharded execution on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.streaming.serving import ServingEngine


@pytest.fixture()
def cc(model_setup):
    _, _, cfg = model_setup
    return CacheConfig(att_right_context=1, att_left_context=12,
                       n_mels=cfg.n_mels)


def make_engine(model_setup, cc, n_slots=4, mesh=None):
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    return ServingEngine(params, cfg, vocab, cc, n_slots=n_slots, mesh=mesh,
                         compute_dtype=jnp.float32)


def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)


def test_admission_eviction_isolation(model_setup, cc):
    eng = make_engine(model_setup, cc)
    s0 = eng.add_stream()
    s1 = eng.add_stream()
    assert s0 != s1

    n = cc.chunk_samples
    a0, a1 = synth(n, 0), synth(n, 1)
    eng.feed_audio({s0: a0, s1: a1})
    eng.step()

    # evict s1, admit a new stream into the same slot: must start clean
    text1 = eng.remove_stream(s1)
    s2 = eng.add_stream()
    assert s2 == s1
    assert eng.transcripts[s2] == ""
    assert int(eng.enc_state.valid_len[s2]) == 0
    assert int(eng.dec_state.prev_token[s2]) == eng.cfg.blank_token
    assert np.all(np.asarray(eng.enc_state.k_cache)[:, s2] == 0)
    # s0 survives eviction of its neighbor
    assert int(eng.enc_state.valid_len[s0]) > 0


def test_engine_matches_solo_session(model_setup, cc):
    """A stream served in a busy slab == the same audio in a solo session."""
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = make_engine(model_setup, cc)
    slots = [eng.add_stream() for _ in range(3)]

    n = cc.chunk_samples
    audio = {s: np.concatenate([synth(n, 10 + s), synth(n, 20 + s)])
             for s in slots}
    for tick in range(2):
        eng.feed_audio({s: audio[s][tick * n : (tick + 1) * n] for s in slots})
        eng.step()

    target = slots[1]
    sess = StreamSession(params, cfg, vocab, cc)
    sess.process(audio[target][:n])
    sess.process(audio[target][n:])
    assert eng.transcripts[target] == sess.get_transcript(0)
    assert eng.tokens[target] == sess.get_tokens(0)


def test_engine_on_mesh(model_setup, cc):
    """Sharded slab over the 8-device CPU mesh: same results as unsharded."""
    from nemotron_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh(8, model_parallel=2)
    eng_m = make_engine(model_setup, cc, n_slots=8, mesh=mesh)
    eng_1 = make_engine(model_setup, cc, n_slots=8, mesh=None)

    slots = [eng_m.add_stream() for _ in range(5)]
    for s in slots:
        assert eng_1.add_stream() == s

    n = cc.chunk_samples
    feeds = {s: synth(n, 100 + s) for s in slots}
    eng_m.feed_audio(feeds)
    eng_1.feed_audio(feeds)
    out_m = eng_m.step()
    out_1 = eng_1.step()
    assert out_m == out_1
    for s in slots:
        assert eng_m.tokens[s] == eng_1.tokens[s]
    np.testing.assert_allclose(np.asarray(eng_m.enc_state.k_cache),
                               np.asarray(eng_1.enc_state.k_cache),
                               atol=2e-4)


def test_latency_stats(model_setup, cc):
    eng = make_engine(model_setup, cc, n_slots=2)
    s = eng.add_stream()
    eng.feed_audio({s: synth(cc.chunk_samples, 7)})
    eng.step()
    stats = eng.latency_percentiles()
    assert stats and stats["p50"] > 0 and stats["p99"] >= stats["p50"]


def test_quantized_params_shard_and_run(model_setup, rng):
    """Quantized (QTensor) weights shard over the mesh and the fused step
    still runs: int8 values and block scales follow the dense weight's TP
    rule."""
    import jax
    import jax.numpy as jnp

    from nemotron_tpu import params as params_mod
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.parallel.mesh import (make_mesh, param_shardings,
                                            shard_state, mel_sharding)
    from nemotron_tpu.streaming.session import chunk_step

    _, params, cfg = model_setup
    qparams = params_mod.quantize_model_params(params)
    mesh = make_mesh(8, model_parallel=2)
    qparams = jax.device_put(qparams, param_shardings(qparams, mesh))

    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    pos_heads = jax.device_put(
        enc_mod.precompute_pos_heads(qparams, cfg, cc),
        param_shardings(enc_mod.precompute_pos_heads(qparams, cfg, cc), mesh))
    B = 8
    enc_state = shard_state(enc_mod.init_encoder_state(cfg, cc, B), mesh)
    dec_state = shard_state(dec_mod.init_decoder_state(cfg, B), mesh)
    mel = jax.device_put(
        jnp.asarray(rng.standard_normal((B, cc.chunk_mel_frames, cfg.n_mels),
                                        dtype=np.float32)),
        mel_sharding(mesh))
    tokens, enc_state, dec_state = chunk_step(
        qparams, cfg, cc, mel, enc_state, dec_state, pos_heads)
    assert np.asarray(tokens).shape[0] == B

    # sharded quantized == unsharded quantized
    qp2 = params_mod.quantize_model_params(params)
    ph2 = enc_mod.precompute_pos_heads(qp2, cfg, cc)
    es2 = enc_mod.init_encoder_state(cfg, cc, B)
    ds2 = dec_mod.init_decoder_state(cfg, B)
    tokens2, es2, _ = chunk_step(qp2, cfg, cc, jnp.asarray(mel), es2, ds2, ph2)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))
    np.testing.assert_allclose(np.asarray(enc_state.k_cache),
                               np.asarray(es2.k_cache), atol=2e-5)


def test_engine_snapshot_resume(model_setup, tmp_path):
    """Engine save/load resumes all active streams exactly."""
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    # patch the preprocessor weights in (random fb from fixture is fine too)
    rng = np.random.default_rng(5)

    def audio(seed, n=4000):
        r = np.random.default_rng(seed)
        return (r.standard_normal(n) * 8000).astype(np.int16)

    def make_engine():
        return ServingEngine(params, cfg, vocab, cc, n_slots=4,
                             compute_dtype=jnp.float32)

    eng = make_engine()
    s0, s1 = eng.add_stream(), eng.add_stream()
    eng.feed_audio({s0: audio(1), s1: audio(2)})
    eng.step()
    snap = str(tmp_path / "engine.npz")
    eng.save(snap)
    eng.feed_audio({s0: audio(3), s1: audio(4)})
    eng.step()
    want = [eng.transcripts[s0], eng.transcripts[s1]]
    want_tokens = [list(eng.tokens[s0]), list(eng.tokens[s1])]

    eng2 = make_engine()
    eng2.load(snap)
    assert eng2.active[s0] and eng2.active[s1] and not eng2.active[2]
    eng2.feed_audio({s0: audio(3), s1: audio(4)})
    eng2.step()
    assert [eng2.transcripts[s0], eng2.transcripts[s1]] == want
    assert [list(eng2.tokens[s0]), list(eng2.tokens[s1])] == want_tokens


def test_continuous_batching_independent_rates(model_setup):
    """Slots fed at different rates: a starved slot's state is frozen (not
    polluted by padding) and its transcript matches a solo engine fed the
    same audio."""
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    def audio(seed, n):
        r = np.random.default_rng(seed)
        return (r.standard_normal(n) * 8000).astype(np.int16)

    eng = ServingEngine(params, cfg, vocab, cc, n_slots=3,
                        compute_dtype=jnp.float32)
    fast, slow = eng.add_stream(), eng.add_stream()
    # fast gets 3x the audio of slow, interleaved with engine steps
    for i in range(3):
        eng.feed_audio({fast: audio(10 + i, 6000), slow: audio(20 + i, 2000)})
        eng.step()
    fast_text = eng.transcripts[fast]
    slow_text = eng.transcripts[slow]

    # solo engines fed identical audio must match exactly
    for seeds, n, want in ((range(10, 13), 6000, fast_text),
                           (range(20, 23), 2000, slow_text)):
        solo = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                             compute_dtype=jnp.float32)
        s = solo.add_stream()
        for seed in seeds:
            solo.feed_audio({s: audio(seed, n)})
            solo.step()
        assert solo.transcripts[s] == want


def test_stream_resume_after_long_gap(model_setup):
    """A slot that skips more engine ticks than the ring has segments must
    still match a solo engine exactly after resuming (realign_ring wrap)."""
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    # R=1, left=14 -> chunk_enc 2, kv 16, n_seg 8
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    def audio(seed, n=4000):
        r = np.random.default_rng(seed)
        return (r.standard_normal(n) * 8000).astype(np.int16)

    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32)
    busy, lazy = eng.add_stream(), eng.add_stream()
    # lazy gets 2 early chunks, then sits out 12+ ticks, then resumes
    eng.feed_audio({busy: audio(0), lazy: audio(100)})
    eng.step()
    eng.feed_audio({busy: audio(1), lazy: audio(101)})
    eng.step()
    for i in range(12):
        eng.feed_audio({busy: audio(2 + i)})
        eng.step()
    eng.feed_audio({busy: audio(50), lazy: audio(102)})
    eng.step()
    eng.feed_audio({lazy: audio(103)})
    eng.step()

    solo = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                         compute_dtype=jnp.float32)
    s = solo.add_stream()
    for seed in (100, 101, 102, 103):
        solo.feed_audio({s: audio(seed)})
        solo.step()
    assert eng.transcripts[lazy] == solo.transcripts[s]
    assert eng.tokens[lazy] == solo.tokens[s]


def test_engine_stats(model_setup):
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    eng = ServingEngine(params, cfg, [f"t{i}" for i in range(cfg.vocab_size)],
                        cc, n_slots=2, compute_dtype=jnp.float32)
    s = eng.add_stream()
    rng = np.random.default_rng(0)
    eng.feed_audio({s: (rng.standard_normal(6000) * 8000).astype(np.int16)})
    eng.step()
    st = eng.stats()
    assert st["active_slots"] == 1 and st["engine_steps"] >= 1
    assert st["audio_seconds_decoded"] > 0 and st["aggregate_rtf"] > 0


def test_slot_evict_and_reuse(model_setup):
    """remove_stream returns the transcript, clears the slot, and a new
    stream admitted into the same slot starts cold (no state leakage)."""
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    def audio(seed, n=6000):
        r = np.random.default_rng(seed)
        return (r.standard_normal(n) * 8000).astype(np.int16)

    eng = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                        compute_dtype=jnp.float32)
    s0 = eng.add_stream()
    eng.feed_audio({s0: audio(1)})
    eng.step()
    text0 = eng.remove_stream(s0)
    assert eng.active.sum() == 0

    s1 = eng.add_stream()
    assert s1 == s0  # slot reused
    eng.feed_audio({s1: audio(2)})
    eng.step()
    got = eng.transcripts[s1]

    # a fresh engine fed the same audio must match exactly (no leakage)
    eng2 = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                         compute_dtype=jnp.float32)
    s2 = eng2.add_stream()
    eng2.feed_audio({s2: audio(2)})
    eng2.step()
    assert got == eng2.transcripts[s2]
    assert isinstance(text0, str)


@pytest.mark.parametrize("seed", [42, 1337])
def test_serving_fuzz_random_schedule(model_setup, seed):
    """Randomized admission/eviction/feed schedule: every stream's final
    transcript must equal a solo engine fed the same audio sequence. This is
    the strongest continuous-batching invariant (covers masking, ring
    realignment, slot reuse, uneven rates, mid-stream eviction)."""
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    rng = np.random.default_rng(seed)

    def make_engine(n):
        return ServingEngine(params, cfg, vocab, cc, n_slots=n,
                             compute_dtype=jnp.float32)

    eng = make_engine(3)
    live = {}          # slot -> list of audio blocks fed
    finished = []      # (blocks, transcript)
    next_id = 0
    for step_i in range(14):
        # random admission
        if rng.random() < 0.4 and len(live) < 3:
            slot = eng.add_stream()
            live[slot] = []
            next_id += 1
        # random eviction
        if live and rng.random() < 0.15:
            slot = list(live)[int(rng.integers(len(live)))]
            finished.append((live.pop(slot), eng.remove_stream(slot)))
        # random feeding at random rates
        feed = {}
        for slot in live:
            if rng.random() < 0.8:
                n = int(rng.integers(1, 4)) * 2000
                audio = (rng.standard_normal(n) * 8000).astype(np.int16)
                live[slot].append(audio)
                feed[slot] = audio
        if feed:
            eng.feed_audio(feed)
        eng.step()
    for slot in list(live):
        finished.append((live.pop(slot), eng.remove_stream(slot)))

    # replay each stream solo and require exact transcripts
    checked = 0
    for blocks, want in finished:
        if not blocks:
            assert want == ""
            continue
        solo = make_engine(1)
        s = solo.add_stream()
        for audio in blocks:
            solo.feed_audio({s: audio})
            solo.step()
        assert solo.transcripts[s] == want, (len(blocks), want[:30])
        checked += 1
    assert checked >= 2  # schedule actually exercised streams


def test_w8a8_params_shard_and_run(model_setup, rng):
    """W8A8 weights (incl. rank-2 col_scale leaves) shard over the mesh and
    the fused step runs, matching the unsharded result exactly."""
    import jax
    import jax.numpy as jnp

    from nemotron_tpu import params as params_mod
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.parallel.mesh import (make_mesh, mel_sharding,
                                            param_shardings, shard_state)
    from nemotron_tpu.streaming.session import chunk_step

    _, params, cfg = model_setup
    wp = params_mod.quantize_model_params(params, mode="w8a8")
    mesh = make_mesh(8, model_parallel=2)
    wp_sh = jax.device_put(wp, param_shardings(wp, mesh))

    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    B = 8
    mel_np = rng.standard_normal((B, cc.chunk_mel_frames, cfg.n_mels),
                                 ).astype(np.float32)

    outs = []
    for p, sharded in ((wp, False), (wp_sh, True)):
        ph = enc_mod.precompute_pos_heads(p, cfg, cc)
        es = enc_mod.init_encoder_state(cfg, cc, B)
        ds = dec_mod.init_decoder_state(cfg, B)
        mel = jnp.asarray(mel_np)
        if sharded:
            ph = jax.device_put(ph, param_shardings(ph, mesh))
            es, ds = shard_state(es, mesh), shard_state(ds, mesh)
            mel = jax.device_put(mel, mel_sharding(mesh))
        toks, es, _ = chunk_step(p, cfg, cc, mel, es, ds, ph)
        outs.append((np.asarray(toks), np.asarray(es.k_cache)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=2e-5)


def test_finalize_stream_matches_session_finalize(model_setup):
    """Engine finalize_stream (zero-pad the trailing partial chunk) produces
    the same transcript as StreamSession.process + finalize on identical
    audio."""
    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.frontend.preprocessor import (hann_window,
                                                    mel_filterbank_slaney)
    from nemotron_tpu.streaming.serving import ServingEngine
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    fb, win = mel_filterbank_slaney(n_mels=cfg.n_mels), hann_window(400)
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(7300) * 9000).astype(np.int16)

    sess = StreamSession(params, cfg, vocab, cc, filterbank=fb, window=win)
    sess.process(audio)
    want = sess.finalize()

    # engine uses the model's own (random) filterbank unless given one;
    # construct it with matching preprocessor weights via params override
    import dataclasses

    from nemotron_tpu.params import PreprocessorParams

    p2 = dataclasses.replace(
        params, preprocessor=PreprocessorParams(filterbank=fb, window=win))
    eng = ServingEngine(p2, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32)
    s = eng.add_stream()
    eng.feed_audio({s: audio})
    eng.step()
    got = eng.finalize_stream(s)
    assert got == want


def test_continuous_batching_int8_kv(model_setup):
    """Mixed-rate engine with the int8 K/V ring: masked scale freeze and
    realign scale roll must keep slow streams exactly equal to solo int8
    runs."""
    import dataclasses

    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = dataclasses.replace(
        CacheConfig(att_right_context=1, att_left_context=14,
                    n_mels=cfg.n_mels), kv_cache_int8=True)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    def audio(seed, n):
        r = np.random.default_rng(seed)
        return (r.standard_normal(n) * 8000).astype(np.int16)

    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32)
    fast, slow = eng.add_stream(), eng.add_stream()
    for i in range(3):
        eng.feed_audio({fast: audio(30 + i, 6000), slow: audio(40 + i, 2000)})
        eng.step()

    for seeds, n, slot in ((range(30, 33), 6000, fast),
                           (range(40, 43), 2000, slow)):
        solo = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                             compute_dtype=jnp.float32)
        s = solo.add_stream()
        for seed in seeds:
            solo.feed_audio({s: audio(seed, n)})
            solo.step()
        assert solo.transcripts[s] == eng.transcripts[slot]


def test_finalize_drains_backlog_then_tail(model_setup, cc):
    """Regression (round-1 advice): finalize_stream on a slot holding MORE
    than one full buffered chunk plus a partial tail must drain the full
    chunks and then flush the padded tail -- previously the tail was
    silently discarded whenever >1 chunk was buffered."""
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    n = cc.chunk_samples
    audio = synth(3 * n + n // 2, 77)

    eng = make_engine(model_setup, cc)
    slot = eng.add_stream()
    eng.feed_audio({slot: audio})      # stage everything, no step()
    text_eng = eng.finalize_stream(slot)

    sess = StreamSession(params, cfg, vocab, cc)
    sess.process(audio)
    text_solo = sess.finalize()

    assert text_eng == text_solo
    assert text_eng != ""


def test_stats_geometry_from_cache_config(model_setup):
    """aggregate_rtf derives audio seconds from the configured geometry, not
    hardcoded subsampling*hop/rate defaults."""
    import dataclasses

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=cfg.n_mels, hop_length=80, sample_rate=8000)
    eng = ServingEngine(params, cfg, [f"w{i}" for i in range(cfg.vocab_size)],
                        cc, n_slots=2, compute_dtype=jnp.float32)
    eng.frame_offsets[:] = [10, 0]
    s = eng.stats()
    assert s["audio_seconds_decoded"] == pytest.approx(
        10 * cc.subsampling_factor * cc.hop_length / cc.sample_rate)


def test_bulk_add_streams_matches_individual(model_setup, cc):
    """add_streams(k) == k sequential add_stream calls (one device reset)."""
    eng_a = make_engine(model_setup, cc)
    eng_b = make_engine(model_setup, cc)
    slots_a = eng_a.add_streams(3)
    slots_b = [eng_b.add_stream() for _ in range(3)]
    assert slots_a == slots_b

    n = cc.chunk_samples
    feed = {s: synth(n, 5 + s) for s in slots_a}
    out_a = (eng_a.feed_audio(feed), eng_a.step())[1]
    out_b = (eng_b.feed_audio(feed), eng_b.step())[1]
    assert out_a == out_b
    assert [eng_a.transcripts[s] for s in slots_a] == \
        [eng_b.transcripts[s] for s in slots_b]


def test_lockstep_engine_matches_session(model_setup, cc):
    """The fully fused PCM->tokens lockstep tick (on-device DSP + mel ring +
    encoder + decode in ONE program) reproduces the host-frontend
    StreamSession transcripts exactly, including finalize semantics."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S = 3
    n = cc.shift_samples
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((S, 4 * n + n // 3)) * 8000).astype(np.int16)

    eng = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                         compute_dtype=jnp.float32)
    for t in range(4):
        eng.tick(audio[:, t * n:(t + 1) * n])
    eng.tick(audio[:, 4 * n:])
    final_eng = eng.finalize()

    sess = StreamSession(params, cfg, vocab, cc, n_streams=S)
    sess.process(audio)
    final_sess = sess.finalize()

    assert final_eng == final_sess
    assert any(final_eng)
    for s in range(S):
        assert eng.tokens[s] == sess.get_tokens(s)


def test_lockstep_engine_on_mesh(model_setup, cc):
    """Lockstep engine sharded over the 8-device CPU mesh == unsharded."""
    from jax.sharding import Mesh
    from nemotron_tpu.parallel.mesh import make_mesh
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 8, cc.shift_samples
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((S, 3 * n)) * 8000).astype(np.int16)

    mesh = make_mesh(8, model_parallel=2)
    a = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    b = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32, mesh=mesh)
    for t in range(3):
        a.tick(audio[:, t * n:(t + 1) * n])
        b.tick(audio[:, t * n:(t + 1) * n])
    assert a.transcripts == b.transcripts


def test_lockstep_pipelined_matches_tick(model_setup, cc):
    """tick_pipelined produces identical transcripts/tokens as tick(), just
    one call later (depth-1 pipeline for transfer/compute overlap)."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal((S, 5 * n)) * 8000).astype(np.int16)

    a = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    b = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    outs_a, outs_b = [], []
    for t in range(5):
        blk = audio[:, t * n:(t + 1) * n]
        outs_a.append(a.tick(blk))
        outs_b.append(b.tick_pipelined(blk))
    outs_b.append(b.flush_pipeline())
    assert a.transcripts == b.transcripts
    assert a.tokens == b.tokens
    # pipelined output is the same stream of per-tick dicts, shifted by one
    assert outs_b[0] == {}
    assert outs_a == outs_b[1:]
    assert a.finalize() == b.finalize()


def test_lockstep_ragged_tick(model_setup, cc):
    """Ragged tick() inputs (VERDICT r2 item 10): after the first tick
    fixes the canonical size, an OVERSIZE block is split into canonical
    sub-ticks plus an exact remainder (never overflowing the mel ring)
    and a SHORT tail block runs at its exact size -- both sample-exact
    vs feeding the same audio in canonical pieces."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(21)
    total = 6 * n + n // 4            # ends on a ragged tail
    audio = (rng.standard_normal((S, total)) * 8000).astype(np.int16)

    a = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    a.tick(audio[:, :n])              # canonical size := n
    a.tick(audio[:, n:4 * n + n // 2])   # oversize: 3.5 canonical ticks
    a.tick(audio[:, 4 * n + n // 2:])    # ragged short tail
    final_a = a.finalize()

    b = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    for t in range(6):
        b.tick(audio[:, t * n:(t + 1) * n])
    b.tick(audio[:, 6 * n:])
    final_b = b.finalize()

    assert final_a == final_b
    assert a.transcripts == b.transcripts
    assert a.tokens == b.tokens


def test_lockstep_snapshot_resume(model_setup, cc, tmp_path):
    """LockstepEngine save/load: a resumed engine continues exactly."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal((S, 5 * n)) * 8000).astype(np.int16)

    a = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    for t in range(3):
        a.tick(audio[:, t * n:(t + 1) * n])
    ck = str(tmp_path / "lockstep.npz")
    a.save(ck)
    for t in range(3, 5):
        a.tick(audio[:, t * n:(t + 1) * n])

    b = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                       compute_dtype=jnp.float32)
    b.load(ck)
    for t in range(3, 5):
        b.tick(audio[:, t * n:(t + 1) * n])
    assert a.transcripts == b.transcripts
    assert a.tokens == b.tokens
    assert a.finalize() == b.finalize()


def test_serve_demo_lockstep(model_setup, tmp_path):
    import subprocess
    import sys as _sys

    from conftest import tiny_config, write_tiny_gguf
    from nemotron_tpu import params as P

    cfg = tiny_config()
    arrays = P.random_weight_arrays(cfg, seed=0)
    arrays["joint.joint_net.2.bias"][5] = 2.0
    gguf_path = str(tmp_path / "t.gguf")
    write_tiny_gguf(gguf_path, arrays, cfg)
    pcm = (np.random.default_rng(0).standard_normal(24000) * 8000
           ).astype("<i2")
    audio = str(tmp_path / "s.pcm")
    pcm.tofile(audio)
    scripts = __import__("os").path.join(
        __import__("os").path.dirname(__file__), "..", "scripts")
    _os = __import__("os")
    r = subprocess.run(
        [_sys.executable, _os.path.join(scripts, "serve.py"),
         gguf_path, audio, "--streams", "2", "--right-context", "1",
         "--seconds", "2", "--cpu", "--lockstep"],
        capture_output=True, text=True, timeout=400,
        env=dict(_os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "aggregate real-time" in r.stderr


# -- device-DSP mode (fused on-device frontend, ragged rates) ----------------


def make_device_engine(model_setup, cc, n_slots=4, mesh=None):
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    return ServingEngine(params, cfg, vocab, cc, n_slots=n_slots, mesh=mesh,
                         compute_dtype=jnp.float32, dsp="device")


def test_device_dsp_matches_session(model_setup, cc):
    """dsp='device' (DSP fused into the masked chunk step, PCM in) produces
    the same final transcripts as the host-frontend solo session, including
    the finalize flush. The device path intentionally runs one chunk behind
    real time (its bootstrap quantum is one mel frame short of a chunk), so
    equality is asserted after finalize, not per tick."""
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = make_device_engine(model_setup, cc, n_slots=3)
    slots = eng.add_streams(3)
    n = eng.cc.shift_samples
    audio = {s: np.concatenate([synth(n, 40 + s) for _ in range(5)])
             for s in slots}
    for tick in range(5):
        eng.feed_audio({s: audio[s][tick * n:(tick + 1) * n]
                        for s in slots})
        eng.step()
    finals = {s: eng.finalize_stream(s) for s in slots}

    for s in slots:
        sess = StreamSession(params, cfg, vocab, cc)
        sess.process(audio[s])
        sess.finalize()
        assert finals[s].startswith(sess.get_transcript(0)), (
            s, finals[s], sess.get_transcript(0))
        # the device finalize decodes one extra silence-padded chunk
        # (lockstep semantics); the real-audio prefix must match exactly


def test_device_dsp_ragged_rates(model_setup, cc):
    """Slots advancing at different rates (one at half rate, one admitted
    late) keep exact per-slot semantics: each equals its solo run."""
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = make_device_engine(model_setup, cc, n_slots=4)
    s_full, s_half = eng.add_streams(2)
    n = eng.cc.shift_samples
    full_audio = np.concatenate([synth(n, 60) for _ in range(6)])
    half_audio = np.concatenate([synth(n, 70) for _ in range(3)])
    late_audio = np.concatenate([synth(n, 80) for _ in range(3)])
    s_late = None
    for tick in range(6):
        feed = {s_full: full_audio[tick * n:(tick + 1) * n]}
        if tick % 2 == 0:  # half-rate slot gets audio every other tick
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
        sess = StreamSession(params, cfg, vocab, cc)
        sess.process(audio)
        sess.finalize()
        assert finals[s].startswith(sess.get_transcript(0)), (
            s, finals[s], sess.get_transcript(0))
        assert len(sess.get_transcript(0)) > 0 or len(finals[s]) == 0


def test_device_dsp_snapshot_resume(model_setup, cc, tmp_path):
    """save/load of a device-DSP engine resumes exactly (device frontend
    state, mel buffer, fills, PCM FIFOs)."""
    eng = make_device_engine(model_setup, cc, n_slots=3)
    slots = eng.add_streams(2)
    n = eng.cc.shift_samples
    audio = {s: np.concatenate([synth(n, 90 + s) for _ in range(4)])
             for s in slots}
    for tick in range(2):
        eng.feed_audio({s: audio[s][tick * n:(tick + 1) * n]
                        for s in slots})
        eng.step()
    # stage un-processed PCM too (FIFO contents must survive the snapshot)
    eng.feed_audio({slots[0]: audio[slots[0]][2 * n:2 * n + n // 2]})
    path = str(tmp_path / "eng.npz")
    eng.save(path)

    eng2 = make_device_engine(model_setup, cc, n_slots=3)
    eng2.load(path)
    for e in (eng, eng2):
        e.feed_audio({slots[0]: audio[slots[0]][2 * n + n // 2:3 * n],
                      slots[1]: audio[slots[1]][2 * n:3 * n]})
        e.step()
    assert eng.transcripts == eng2.transcripts
    assert eng.tokens == eng2.tokens
    np.testing.assert_array_equal(np.asarray(eng.front_res),
                                  np.asarray(eng2.front_res))
    np.testing.assert_array_equal(np.asarray(eng.mel_fill), eng2.mel_fill)


def test_device_dsp_on_mesh(model_setup, cc):
    """Device-DSP engine sharded over the 8-device CPU mesh == unsharded."""
    from nemotron_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh(8)
    eng_m = make_device_engine(model_setup, cc, n_slots=8, mesh=mesh)
    eng_1 = make_device_engine(model_setup, cc, n_slots=8, mesh=None)
    slots = eng_m.add_streams(8)
    assert eng_1.add_streams(8) == slots
    n = eng_m.cc.shift_samples
    for tick in range(3):
        feed = {s: synth(n, 200 + 10 * tick + s) for s in slots}
        eng_m.feed_audio(feed)
        eng_1.feed_audio(feed)
        out_m = eng_m.step()
        out_1 = eng_1.step()
        assert out_m == out_1
    for s in slots:
        assert eng_m.tokens[s] == eng_1.tokens[s]


# -- beam decode in the serving engines (beyond-reference capability) --------


def biased_params(model_setup):
    """Params with one non-blank logit biased up so the beam keeps
    non-empty hypotheses in play. NOTE: on random weights the RAW-best path
    is always near-empty (every emission costs log-prob and the decoder
    state barely moves the logits, so emitting never pays off the way it
    does on trained weights) -- beam tests therefore assert full BEAM-STATE
    equality (scores/tokens/lengths), which is non-vacuous regardless of
    what the best hypothesis happens to be."""
    from nemotron_tpu import params as P

    arrays, _, cfg = model_setup
    a2 = {k: np.array(v, copy=True) for k, v in arrays.items()}
    a2["joint.joint_net.2.bias"][5] = 2.0
    return P.params_from_arrays(a2, cfg)


def assert_beams_equal(a, b, rows_a=None, rows_b=None, atol=1e-4):
    """Full beam-state equivalence for (optionally) selected stream rows."""
    sel = lambda x, rows: (np.asarray(x) if rows is None
                           else np.asarray(x)[rows])
    np.testing.assert_allclose(sel(a.scores, rows_a), sel(b.scores, rows_b),
                               atol=atol)
    np.testing.assert_array_equal(sel(a.lengths, rows_a),
                                  sel(b.lengths, rows_b))
    np.testing.assert_array_equal(sel(a.prev_token, rows_a),
                                  sel(b.prev_token, rows_b))
    U = min(np.asarray(a.tokens).shape[-1], np.asarray(b.tokens).shape[-1])
    np.testing.assert_array_equal(sel(a.tokens, rows_a)[..., :U],
                                  sel(b.tokens, rows_b)[..., :U])
    # non-vacuous: the beam explored non-empty hypotheses
    assert sel(a.lengths, rows_a).max() > 0


def test_lockstep_beam_matches_session(model_setup, cc):
    """LockstepEngine(beam_size=K): the fused DSP+encoder+BEAM tick equals
    a host-frontend StreamSession with the same beam, including finalize."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine
    from nemotron_tpu.streaming.session import StreamSession

    _, _, cfg = model_setup
    params = biased_params(model_setup)
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(21)
    audio = (rng.standard_normal((S, 4 * n + n // 3)) * 8000).astype(np.int16)

    eng = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                         compute_dtype=jnp.float32, beam_size=2,
                         max_beam_tokens=64)
    for t in range(4):
        assert eng.tick(audio[:, t * n:(t + 1) * n]) == {}  # lazy text
    eng.tick(audio[:, 4 * n:])

    sess = StreamSession(params, cfg, vocab, cc, n_streams=S,
                         beam_size=2, max_beam_tokens=64)
    sess.process(audio)
    # pre-finalize: the fused tick advanced every stream's K-hypothesis
    # beam identically to the host-frontend session
    assert_beams_equal(eng.beam_state, sess.beam_state)
    assert eng.refresh_transcripts() == list(sess.transcripts)

    final_eng = eng.finalize()
    final_sess = sess.finalize()
    assert final_eng == final_sess
    for s in range(S):
        assert eng.tokens[s] == sess.get_tokens(s)


def test_lockstep_beam_snapshot_resume(model_setup, cc, tmp_path):
    """Beam-mode lockstep save/load resumes the beam exactly; beam/greedy
    snapshot-engine mismatches raise."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, _, cfg = model_setup
    params = biased_params(model_setup)
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(23)
    audio = (rng.standard_normal((S, 5 * n)) * 8000).astype(np.int16)

    def make(k):
        return LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                              compute_dtype=jnp.float32, beam_size=k,
                              max_beam_tokens=64)

    a = make(2)
    for t in range(3):
        a.tick(audio[:, t * n:(t + 1) * n])
    ck = str(tmp_path / "beam.npz")
    a.save(ck)

    with pytest.raises(ValueError, match="mismatch"):
        make(1).load(ck)
    with pytest.raises(ValueError, match="beam_size=3"):
        make(3).load(ck)

    b = make(2)
    b.load(ck)
    for e in (a, b):
        for t in range(3, 5):
            e.tick(audio[:, t * n:(t + 1) * n])
    assert a.finalize() == b.finalize()
    assert a.tokens == b.tokens


def test_serving_beam_matches_solo(model_setup, cc):
    """ServingEngine(beam_size=K) host-DSP path: a slot served ragged in a
    busy slab (late admission, skipped ticks) finalizes to exactly the solo
    beam session's transcript; eviction/readmission leaves the beam clean."""
    from nemotron_tpu.streaming.session import StreamSession

    _, _, cfg = model_setup
    params = biased_params(model_setup)
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=4,
                        compute_dtype=jnp.float32, beam_size=2,
                        max_beam_tokens=64)
    n = cc.chunk_samples
    s_a, s_b = eng.add_streams(2)
    audio_a = np.concatenate([synth(n, 30 + t) for t in range(3)])
    audio_b = np.concatenate([synth(n, 50 + t) for t in range(2)])
    late = np.concatenate([synth(n, 70 + t) for t in range(2)])

    s_late = None
    for t in range(3):
        feed = {s_a: audio_a[t * n:(t + 1) * n]}
        if t < 2:
            feed[s_b] = audio_b[t * n:(t + 1) * n]
        if t == 1:
            s_late = eng.add_stream()
        if s_late is not None and t >= 1:
            feed[s_late] = late[(t - 1) * n:t * n]
        eng.feed_audio(feed)
        assert eng.step() == {}  # beam text is fetched lazily

    # pre-finalize: each ragged slot's K-hypothesis beam equals its solo
    # session's beam (full-state equality -- non-vacuous even when the
    # best hypothesis is empty on random weights)
    sessions = {}
    for s, audio in ((s_a, audio_a), (s_b, audio_b), (s_late, late)):
        sess = StreamSession(params, cfg, vocab, cc, beam_size=2,
                             max_beam_tokens=64)
        sess.process(audio)
        sessions[s] = sess
        assert_beams_equal(eng.beam_state, sess.beam_state,
                           rows_a=[s], rows_b=[0])

    finals = {s: eng.finalize_stream(s) for s in (s_a, s_b, s_late)}
    for s, sess in sessions.items():
        want = sess.finalize()
        assert finals[s] == want, (s, finals[s], want)

    # a re-admitted slot starts from a fresh beam
    s_new = eng.add_stream()
    assert eng.transcripts[s_new] == ""
    eng.feed_audio({s_new: audio_a[:n]})
    eng.step()
    sess = StreamSession(params, cfg, vocab, cc, beam_size=2,
                         max_beam_tokens=64)
    sess.process(audio_a[:n])
    assert eng.refresh_transcripts()[s_new] == sess.get_transcript(0)


def test_serving_beam_snapshot_resume(model_setup, cc, tmp_path):
    """Beam-mode ServingEngine save/load resumes every slot's beam exactly;
    beam/greedy snapshot mismatches raise."""
    _, _, cfg = model_setup
    params = biased_params(model_setup)
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]

    def make(k):
        return ServingEngine(params, cfg, vocab, cc, n_slots=3,
                             compute_dtype=jnp.float32, beam_size=k,
                             max_beam_tokens=64)

    eng = make(2)
    slots = eng.add_streams(2)
    n = cc.chunk_samples
    audio = {s: np.concatenate([synth(n, 80 + s + 10 * t)
                                for t in range(4)]) for s in slots}
    for t in range(2):
        eng.feed_audio({s: audio[s][t * n:(t + 1) * n] for s in slots})
        eng.step()
    path = str(tmp_path / "beameng.npz")
    eng.save(path)

    with pytest.raises(ValueError, match="mismatch"):
        make(1).load(path)

    eng2 = make(2)
    eng2.load(path)
    for e in (eng, eng2):
        for t in range(2, 4):
            e.feed_audio({s: audio[s][t * n:(t + 1) * n] for s in slots})
            e.step()
    assert eng.refresh_transcripts() == eng2.refresh_transcripts()
    assert eng.tokens == eng2.tokens


def test_device_dsp_beam_matches_host_beam(model_setup, cc):
    """dsp='device' beam mode == host-DSP beam mode chunk for chunk: fed
    the same PCM schedule, both paths decode identical chunk sequences
    (the device frontend is sample-exact with the host one) and must hold
    identical beams. (Beam transcripts are revisable, so prefix comparison
    -- the greedy device test's startswith -- would be meaningless here;
    finalize differs by design: silence-PCM vs zero-mel padding.)"""
    _, _, cfg = model_setup
    params = biased_params(model_setup)
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]

    def make(dsp):
        return ServingEngine(params, cfg, vocab, cc, n_slots=2,
                             compute_dtype=jnp.float32, dsp=dsp,
                             beam_size=2, max_beam_tokens=64)

    dev, host = make("device"), make("numpy")
    n = dev.cc.shift_samples
    audio = np.concatenate([synth(n, 33 + t) for t in range(5)])
    s_d = dev.add_stream()
    s_h = host.add_stream()
    for t in range(5):
        dev.feed_audio({s_d: audio[t * n:(t + 1) * n]})
        dev.step()
        host.feed_audio({s_h: audio[t * n:(t + 1) * n]})
        host.step()
    assert dev.frame_offsets[s_d] == host.frame_offsets[s_h]
    assert dev.frame_offsets[s_d] > 0
    assert_beams_equal(dev.beam_state, host.beam_state,
                       rows_a=[s_d], rows_b=[s_h])
    t_dev = dev.refresh_transcripts()[s_d]
    t_host = host.refresh_transcripts()[s_h]
    assert t_dev == t_host


def test_dsp_auto_resolution(model_setup, cc, monkeypatch):
    """auto -> 'device' on accelerator backends, host DSP on CPU (the
    measured round-3 default: docs/PERFORMANCE.md engine table)."""
    # on the CPU test backend auto must stay a host-DSP mode
    eng = make_engine(model_setup, cc)
    assert eng.dsp_mode != "device"

    # pretend we're on an accelerator: auto must pick the device path
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, params, cfg = model_setup
    eng2 = ServingEngine(params, cfg, None, cc, n_slots=2,
                         compute_dtype=jnp.float32)
    assert eng2.dsp_mode == "device"


def test_static_act_scale_shards_and_runs(model_setup, rng):
    """W8A8 weights with STATIC act_scale leaves shard over the mesh (the
    [L] scale replicates) and the fused step matches the unsharded run."""
    import jax.numpy as jnp

    from nemotron_tpu import params as params_mod
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.ops.smoothquant import smooth_quantize
    from nemotron_tpu.parallel.mesh import (make_mesh, mel_sharding,
                                            param_shardings, shard_state)
    from nemotron_tpu.streaming.session import chunk_step

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    mel_cal = rng.standard_normal((2, 40, cfg.n_mels)).astype(np.float32)
    sp = smooth_quantize(params, cfg, mel_cal, att_chunk=cc.chunk_enc_len,
                         static_act=True)
    assert sp.layers.ffn1_w1.act_scale is not None

    mesh = make_mesh(8, model_parallel=2)
    sp_sh = jax.device_put(sp, param_shardings(sp, mesh))
    B = 8
    ph = enc_mod.precompute_pos_heads(sp, cfg, cc)
    ph_sh = jax.device_put(ph, param_shardings(ph, mesh))
    mel = jnp.asarray(rng.standard_normal(
        (B, cc.chunk_mel_frames, cfg.n_mels), dtype=np.float32))
    t_sh, es_sh, _ = chunk_step(
        sp_sh, cfg, cc, jax.device_put(mel, mel_sharding(mesh)),
        shard_state(enc_mod.init_encoder_state(cfg, cc, B), mesh),
        shard_state(dec_mod.init_decoder_state(cfg, B), mesh), ph_sh)
    t, es, _ = chunk_step(sp, cfg, cc, mel,
                          enc_mod.init_encoder_state(cfg, cc, B),
                          dec_mod.init_decoder_state(cfg, B), ph)
    np.testing.assert_array_equal(np.asarray(t_sh), np.asarray(t))
    np.testing.assert_allclose(np.asarray(es_sh.k_cache),
                               np.asarray(es.k_cache), atol=2e-5)


def test_lockstep_confidence_matches_session(model_setup, cc):
    """LockstepEngine(confidence=True): identical (id, frame) stream to the
    plain engine, triples matching StreamSession(confidence=True) exactly,
    log-posteriors <= 0."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    S, n = 2, cc.shift_samples
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal((S, 3 * n)) * 8000).astype(np.int16)

    eng = LockstepEngine(params, cfg, vocab, cc, n_streams=S,
                         compute_dtype=jnp.float32, confidence=True)
    for t in range(3):
        eng.tick(audio[:, t * n:(t + 1) * n])

    sess = StreamSession(params, cfg, vocab, cc, n_streams=S,
                         confidence=True)
    sess.process(audio)
    assert any(eng.tokens[s] for s in range(S))
    for s in range(S):
        got = eng.tokens[s]
        want = sess.get_tokens(s)
        assert [(t, f) for t, f, _c in got] == [(t, f) for t, f, _c in want]
        assert all(c <= 1e-6 for _t, _f, c in got)
        np.testing.assert_allclose([c for *_x, c in got],
                                   [c for *_x, c in want], atol=1e-5)
    assert eng.transcripts == sess.transcripts

    with pytest.raises(ValueError):
        LockstepEngine(params, cfg, vocab, cc, n_streams=S, beam_size=2,
                       confidence=True)


def test_engine_confidence_matches_session(model_setup, cc):
    """ServingEngine(confidence=True), host DSP: triples equal the solo
    confidence session even with a busy neighbor slot."""
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=3,
                        compute_dtype=jnp.float32, confidence=True)
    slots = [eng.add_stream() for _ in range(2)]
    n = cc.chunk_samples
    audio = {s: np.concatenate([synth(n, 60 + s), synth(n, 70 + s)])
             for s in slots}
    for tick in range(2):
        eng.feed_audio({s: audio[s][tick * n:(tick + 1) * n]
                        for s in slots})
        eng.step()

    for s in slots:
        sess = StreamSession(params, cfg, vocab, cc, confidence=True)
        sess.process(audio[s])
        got, want = eng.tokens[s], sess.get_tokens(0)
        # (id, frame) exact; confs to float tolerance (the engine's masked
        # program and the solo program fuse the f32 logsumexp differently)
        assert [(t, f) for t, f, _c in got] == [(t, f) for t, f, _c in want]
        np.testing.assert_allclose([c for *_x, c in got],
                                   [c for *_x, c in want], atol=1e-5)
        assert all(c <= 1e-6 for _t, _f, c in got)
    assert any(eng.tokens[s] for s in slots)

    with pytest.raises(ValueError):
        ServingEngine(params, cfg, vocab, cc, beam_size=2, confidence=True)


def test_device_dsp_confidence(model_setup, cc, tmp_path):
    """dsp='device' with confidence: same (id, frame) stream as the plain
    device-DSP engine, valid log-posteriors, and snapshot/resume keeps the
    triples."""
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    n = cc.shift_samples
    audio = np.concatenate([synth(n, 90 + i) for i in range(4)])

    def run(confidence):
        eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                            compute_dtype=jnp.float32, dsp="device",
                            confidence=confidence)
        s = eng.add_stream()
        for t in range(4):
            eng.feed_audio({s: audio[t * n:(t + 1) * n]})
            eng.step()
        return eng, s

    plain, sp = run(False)
    conf, sc = run(True)
    assert plain.tokens[sp] == [(t, f) for t, f, _c in conf.tokens[sc]]
    assert all(c <= 1e-6 for _t, _f, c in conf.tokens[sc])
    assert len(conf.tokens[sc]) > 0

    p = str(tmp_path / "devconf.npz")
    conf.save(p)
    eng2 = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                         compute_dtype=jnp.float32, dsp="device",
                         confidence=True)
    eng2.load(p)
    assert eng2.tokens[sc] == conf.tokens[sc]


# -- utterance endpointing ----------------------------------------------------

SIL_GGUF = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "weights",
    "tones_tiny_sil.gguf")


def test_endpoint_state_machine(model_setup, cc):
    """The endpoint state machine, driven directly (deterministic, no
    model behavior in the loop): silence accrues from the LAST token's
    frame, fires at the threshold only after an emission, the fired
    slot's prediction network is batch-reset (other slots untouched),
    and events partition the token stream into utterances."""
    from nemotron_tpu.models import decoder as dec_mod

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32, endpoint_silence_s=0.8,
                        endpoint_reset=True)
    assert eng._ep_frames == 10    # 0.8 s / (8 * 160 / 16000)
    s = eng.add_stream()
    other = eng.add_stream()

    # no emission yet: silence never fires
    eng.frame_offsets[s] = 14
    eng._ep_update({}, np.array([s]), 14)
    assert eng.poll_endpoints() == []

    # dirty the decoder state so the reset is observable
    eng.dec_state = dec_mod.DecoderState(
        h=jnp.ones_like(eng.dec_state.h),
        c=jnp.ones_like(eng.dec_state.c),
        prev_token=jnp.full_like(eng.dec_state.prev_token, 3))

    # tokens at frames 2 and 5; offsets now 14 -> silence = 14-6 = 8 < 10
    eng.tokens[s] = [(7, 2), (9, 5)]
    eng.ep_silence[s] = 0
    eng._ep_update({s: [(7, 2), (9, 5)]}, np.array([s]), 14)
    assert eng.poll_endpoints() == []

    # one more silent step crosses the threshold
    eng.frame_offsets[s] += 14
    eng._ep_update({}, np.array([s]), 14)
    evs = eng.poll_endpoints()
    assert len(evs) == 1
    slot, text, toks = evs[0]
    assert slot == s and toks == [(7, 2), (9, 5)] and isinstance(text, str)
    # prediction network restarted for s, untouched for the other slot
    assert np.asarray(eng.dec_state.h)[s].max() == 0
    assert int(np.asarray(eng.dec_state.prev_token)[s]) == cfg.blank_token
    assert np.asarray(eng.dec_state.h)[other].min() == 1
    assert int(np.asarray(eng.dec_state.prev_token)[other]) == 3

    # second utterance: events partition the cumulative token stream
    eng.tokens[s].append((3, 38))
    eng.frame_offsets[s] += 14
    eng._ep_update({s: [(3, 38)]}, np.array([s]), 14)
    assert eng.poll_endpoints() == []      # fresh utterance, recent token
    eng.frame_offsets[s] += 28
    eng._ep_update({}, np.array([s]), 28)
    evs = eng.poll_endpoints()
    assert len(evs) == 1 and evs[0][2] == [(3, 38)]
    assert eng.stats()["utterances_finalized"] == 2
    # the cumulative transcript stream is untouched by segmentation
    assert eng.tokens[s] == [(7, 2), (9, 5), (3, 38)]

    # eviction clears endpoint bookkeeping
    eng.ep_emitted[s] = True
    eng._ep_pending.append((s, len(eng.tokens[s]), None))
    eng.remove_stream(s)
    assert eng.poll_endpoints() == []
    assert not eng.ep_emitted[s] and eng.ep_silence[s] == 0


def test_endpointing_segments_utterances():
    """End-to-end endpointing on the silence-robust trained fixture
    (weights/tones_tiny_sil.gguf, trained WITH long-gap augmentation so
    silence decodes to blanks): one endpoint per tone utterance followed
    by >= the configured silence, each event reproducing its utterance."""
    import os

    if not os.path.exists(SIL_GGUF):
        pytest.skip("silence-robust trained fixture not present")
    from nemotron_tpu.params import load_model
    from nemotron_tpu.utils.tones import SAMPLE_RATE, render_tones

    params, cfg, vocab = load_model(SIL_GGUF, keep_quantized=False)
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
    rng = np.random.default_rng(7)

    def utt(labels, tail_s):
        durs = np.full(len(labels), 0.25)
        gaps = np.full(len(labels), 0.05)
        n = int(0.30 * len(labels) * SAMPLE_RATE) + \
            int(tail_s * SAMPLE_RATE)
        return render_tones(np.asarray(labels), durs, rng, 16, n,
                            gaps=gaps)

    truth1, truth2 = [3, 11, 6, 0, 14, 9], [8, 2, 15]
    audio = np.concatenate([utt(truth1, 3.0), utt(truth2, 3.0)])

    # endpoint_reset=True: this fixture recovers an utterance's leading
    # tokens after a longer-than-trained silence only with a fresh
    # prediction network (both trade-offs measured; serving.py __init__)
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32, endpoint_silence_s=1.0,
                        endpoint_reset=True)
    s = eng.add_stream()
    n = cc.shift_samples
    events = []
    for t in range(len(audio) // n):
        eng.feed_audio({s: audio[t * n:(t + 1) * n]})
        eng.step()
        events.extend(eng.poll_endpoints())

    assert len(events) == 2, (events, eng.transcripts[s])
    got1 = [t for t, _f in events[0][2]]
    got2 = [t for t, _f in events[1][2]]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    def labels_of(ids):
        return [int(vocab[i].replace("▁T", "")) for i in ids]

    assert lev(labels_of(got1), truth1) <= 1, (labels_of(got1), truth1)
    assert lev(labels_of(got2), truth2) <= 1, (labels_of(got2), truth2)
    assert eng.stats()["utterances_finalized"] == 2


def test_endpointing_validation_and_snapshot(model_setup, cc, tmp_path):
    """Beam engines reject endpointing; snapshot/resume carries the
    endpoint state machine."""
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    with pytest.raises(ValueError, match="greedy"):
        ServingEngine(params, cfg, vocab, cc, n_slots=2, beam_size=2,
                      endpoint_silence_s=0.5)

    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32, endpoint_silence_s=0.5)
    s = eng.add_stream()
    for t in range(3):
        eng.feed_audio({s: synth(cc.shift_samples, 40 + t)})
        eng.step()
    p = str(tmp_path / "ep.npz")
    eng.save(p)
    eng2 = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                         compute_dtype=jnp.float32, endpoint_silence_s=0.5)
    eng2.load(p)
    assert (eng2.ep_silence == eng.ep_silence).all()
    assert (eng2.ep_emitted == eng.ep_emitted).all()
    assert (eng2.ep_utt_start == eng.ep_utt_start).all()


def test_lockstep_endpoint_state_machine(model_setup, cc):
    """LockstepEngine endpointing: same contract as ServingEngine's
    (silence from the last token's frame, fire -> decoder reset for the
    fired stream only, events partition tokens); driven directly."""
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    with pytest.raises(ValueError, match="greedy"):
        LockstepEngine(params, cfg, vocab, cc, n_streams=2, beam_size=2,
                       endpoint_silence_s=0.5)
    eng = LockstepEngine(params, cfg, vocab, cc, n_streams=2,
                         compute_dtype=jnp.float32,
                         endpoint_silence_s=0.8, endpoint_reset=True)
    assert eng._ep_frames == 10
    eng.dec_state = dec_mod.DecoderState(
        h=jnp.ones_like(eng.dec_state.h),
        c=jnp.ones_like(eng.dec_state.c),
        prev_token=jnp.full_like(eng.dec_state.prev_token, 3))

    # stream 0 emits at frames 2, 5; stream 1 stays silent (never fires).
    # Each _ep_update models one processed chunk of valid_out_len frames
    # (2 for this cc), exactly as _collect calls it.
    V = cc.valid_out_len
    assert V == 2
    off = 8
    eng.tokens[0] = [(7, 2), (9, 5)]
    eng._ep_update({0: [(7, 2), (9, 5)]}, current_offset=off)  # sil = 2
    assert eng.poll_endpoints() == []
    for _ in range(4):                     # sil: 4, 6, 8, 10 -> fires
        off += V
        eng._ep_update({}, current_offset=off)
    evs = eng.poll_endpoints()
    assert len(evs) == 1 and evs[0][0] == 0
    assert evs[0][2] == [(7, 2), (9, 5)]
    assert np.asarray(eng.dec_state.h)[0].max() == 0
    assert np.asarray(eng.dec_state.h)[1].min() == 1   # untouched
    assert int(np.asarray(eng.dec_state.prev_token)[0]) == cfg.blank_token

    # next utterance partitions correctly
    off += V
    eng.tokens[0].append((3, off - 2))
    eng._ep_update({0: [(3, off - 2)]}, current_offset=off)  # sil = 1
    assert eng.poll_endpoints() == []
    for _ in range(5):                     # sil: 3, 5, 7, 9, 11 -> fires
        off += V
        eng._ep_update({}, current_offset=off)
    evs = eng.poll_endpoints()
    assert len(evs) == 1 and evs[0][2] == [(3, off - 12)]
    assert eng.utterances_retired == 2


def test_lockstep_endpoint_snapshot(model_setup, cc, tmp_path):
    """Lockstep endpoint state survives save/load."""
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = LockstepEngine(params, cfg, vocab, cc, n_streams=2,
                         compute_dtype=jnp.float32,
                         endpoint_silence_s=0.8)
    pcm = np.stack([synth(cc.shift_samples, 70),
                    synth(cc.shift_samples, 71)])
    for _ in range(2):
        eng.tick(pcm)
    p = str(tmp_path / "lk_ep.npz")
    eng.save(p)
    eng2 = LockstepEngine(params, cfg, vocab, cc, n_streams=2,
                          compute_dtype=jnp.float32,
                          endpoint_silence_s=0.8)
    eng2.load(p)
    assert (eng2.ep_silence == eng.ep_silence).all()
    assert (eng2.ep_emitted == eng.ep_emitted).all()
    assert (eng2.ep_utt_start == eng.ep_utt_start).all()


def test_endpoint_reset_on_mesh(model_setup, cc):
    """The endpoint decoder reset runs on a sharded slab: fired slot
    zeroed, neighbors untouched, sharding preserved."""
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.parallel.mesh import make_mesh

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    mesh = make_mesh(8)
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=8, mesh=mesh,
                        compute_dtype=jnp.float32, endpoint_silence_s=0.8,
                        endpoint_reset=True)
    for _ in range(2):
        eng.add_stream()
    eng.dec_state = dec_mod.DecoderState(
        h=jnp.ones_like(eng.dec_state.h),
        c=jnp.ones_like(eng.dec_state.c),
        prev_token=jnp.full_like(eng.dec_state.prev_token, 3))
    shard_before = eng.dec_state.h.sharding
    eng.tokens[0] = [(7, 2)]
    eng.frame_offsets[0] = 30
    eng._ep_update({0: [(7, 2)]}, np.array([0]), 30)   # sil 27 >= 10: fires
    evs = eng.poll_endpoints()
    assert len(evs) == 1 and evs[0][0] == 0
    h = np.asarray(eng.dec_state.h)
    assert h[0].max() == 0 and h[1].min() == 1
    assert eng.dec_state.h.sharding.is_equivalent_to(shard_before,
                                                     eng.dec_state.h.ndim)


def test_endpoint_boundary_snapshotted_at_fire(model_setup, cc):
    """Tokens emitted AFTER an endpoint fires but BEFORE the host polls
    (fast clients stage several chunks per tick) belong to the NEXT
    utterance: the event boundary is snapshotted at fire time."""
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                        compute_dtype=jnp.float32, endpoint_silence_s=0.8)
    s = eng.add_stream()
    eng.tokens[s] = [(7, 2)]
    eng.frame_offsets[s] = 4
    eng._ep_update({s: [(7, 2)]}, np.array([s]), 4)        # sil 1
    eng.frame_offsets[s] += 14
    eng._ep_update({}, np.array([s]), 14)                  # fires (sil 15)
    # next utterance's tokens land before the poll
    eng.tokens[s].append((9, 20))
    eng._ep_update({s: [(9, 20)]}, np.array([s]), 0)
    evs = eng.poll_endpoints()
    assert len(evs) == 1 and evs[0][2] == [(7, 2)]         # 9 excluded
    # second fire delivers the next utterance alone
    eng.frame_offsets[s] += 28
    eng._ep_update({}, np.array([s]), 28)
    evs = eng.poll_endpoints()
    assert len(evs) == 1 and evs[0][2] == [(9, 20)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_endpoint_state_machine_fuzz(model_setup, cc, seed):
    """Property gate: the engine's endpoint bookkeeping over a random
    schedule of (advance, emissions) events matches an independent
    pure-Python simulation of the silence state machine (fire at
    threshold, boundary at fire time, events partition the stream)."""
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                        compute_dtype=jnp.float32, endpoint_silence_s=0.8)
    s = eng.add_stream()
    thresh = eng._ep_frames

    rng = np.random.default_rng(seed)
    # reference simulation state
    sim_sil = 0
    sim_emitted = False
    sim_start = 0
    sim_events: list[list[int]] = []
    eng_events: list[list[int]] = []
    all_tokens: list[tuple[int, int]] = []

    frame = 0
    for _ in range(200):
        adv = int(rng.integers(1, 6))
        frame += adv
        # tokens emitted this step land at random frames inside the step
        n_tok = int(rng.integers(0, 3)) if rng.random() < 0.4 else 0
        toks = sorted(int(rng.integers(frame - adv, frame))
                      for _ in range(n_tok))
        step_toks = [(int(rng.integers(0, cfg.vocab_size - 1)), f)
                     for f in toks]
        all_tokens.extend(step_toks)
        eng.tokens[s] = list(all_tokens)
        eng.frame_offsets[s] = frame
        eng._ep_update({s: step_toks} if step_toks else {},
                       np.array([s]), adv)
        for _slot, _text, ev_toks in eng.poll_endpoints():
            eng_events.append([t for t, _f in ev_toks])

        # reference simulation (same semantics, written independently)
        sim_sil += adv
        if step_toks:
            sim_sil = max(0, frame - (step_toks[-1][1] + 1))
            sim_emitted = True
        if sim_emitted and sim_sil >= thresh:
            sim_events.append([t for t, _f in all_tokens[sim_start:]])
            sim_start = len(all_tokens)
            sim_emitted = False
            sim_sil = 0

    assert eng_events == sim_events
    assert len(sim_events) > 2   # the schedule actually exercised fires
