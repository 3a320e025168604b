"""Differential tests: JAX cache-aware streaming encoder vs the numpy
streaming oracle, across latency modes and multiple chunks (validity-mask
cold start, K/V sliding window, conv cache carry-over)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.models import encoder as enc_mod
from nemotron_tpu.oracle import OracleModel
from nemotron_tpu.oracle.model import OracleStream


@pytest.fixture(scope="module")
def oracle(model_setup):
    arrays, _params, cfg = model_setup
    return OracleModel(arrays, cfg)


@pytest.mark.parametrize("right_context,n_chunks", [(0, 6), (1, 4), (6, 3), (13, 3)])
def test_streaming_chunks_match_oracle(model_setup, oracle, rng,
                                       right_context, n_chunks):
    _, params, cfg = model_setup
    # small left context so the window actually slides in-test; 14 divides
    # every standard chunk length (1, 2, 7, 14) as the ring cache requires
    cc = CacheConfig(att_right_context=right_context, att_left_context=14,
                     n_mels=cfg.n_mels)

    ostream = OracleStream(oracle, cc)
    state = enc_mod.init_encoder_state(cfg, cc, batch=1)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)

    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))

    for ci in range(n_chunks):
        mel = rng.standard_normal(
            (cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
        want = ostream.encode_chunk(mel)
        got, state = step(params, cfg, cc, jnp.asarray(mel)[None], state,
                          pos_heads)
        got = np.asarray(got)[0]
        assert got.shape == want.shape == (cc.valid_out_len, cfg.d_model)
        np.testing.assert_allclose(got, want, atol=5e-5,
                                   err_msg=f"chunk {ci} R={right_context}")
        # caches must track the oracle too (ring -> chronological reorder)
        chron_k = enc_mod.ring_to_chronological(
            state.k_cache, state.phase, cc.chunk_enc_len)
        np.testing.assert_allclose(chron_k[:, 0], ostream.k_cache, atol=5e-5)
        np.testing.assert_allclose(np.asarray(state.conv_cache)[:, 0],
                                   ostream.conv_cache, atol=5e-5)
        assert int(state.valid_len[0]) == ostream.cache_valid_len


def test_chunk_geometry():
    """Latency-mode table from the reference
    (docs/STREAMING_ANALYSIS.md:19-24, src/nemo-stream.h:65-100)."""
    for r, chunk, shift, valid, ms in [(0, 17, 8, 1, 170), (1, 25, 16, 2, 250),
                                       (6, 65, 56, 7, 650), (13, 121, 112, 14, 1210)]:
        cc = CacheConfig.with_latency(r)
        assert cc.chunk_mel_frames == chunk
        assert cc.shift_mel_frames == shift
        assert cc.valid_out_len == valid
        assert cc.chunk_enc_len == valid
        assert cc.latency_ms == ms
        assert cc.chunk_samples == chunk * 160


def test_streaming_batched_consistency(model_setup, rng):
    """Streams batched along the stream axis behave exactly like streams
    processed alone (the serving-path invariant)."""
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=8, n_mels=cfg.n_mels)
    B = 3
    mel = rng.standard_normal(
        (B, 2, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)

    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)

    state = enc_mod.init_encoder_state(cfg, cc, batch=B)
    outs_b = []
    for ci in range(2):
        out, state = step(params, cfg, cc, jnp.asarray(mel[:, ci]), state,
                          pos_heads)
        outs_b.append(np.asarray(out))

    for b in range(B):
        st1 = enc_mod.init_encoder_state(cfg, cc, batch=1)
        for ci in range(2):
            out, st1 = step(params, cfg, cc, jnp.asarray(mel[b : b + 1, ci]),
                            st1, pos_heads)
            np.testing.assert_allclose(outs_b[ci][b], np.asarray(out)[0],
                                       atol=1e-5)


def test_strict_right_context_vacuous_for_standard_chunks(model_setup, rng):
    """For the standard geometry chunk_enc_len == 1+R, the intra-chunk
    future mask never binds: query i may see i+R ahead and the chunk only
    extends to frame R <= i+R. (This is why the reference could leave its
    right-context mask TODO -- src/nemo-stream.cpp:446 -- unimplemented
    without breaking the standard latency modes.) strict_right_context must
    therefore be a numerical no-op here; it exists for custom geometries
    with cache_drop_size or oversized chunks."""
    import dataclasses

    import jax.numpy as jnp

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import encoder as enc_mod

    _, params, cfg = model_setup
    for R in (1, 6):
        cc = CacheConfig(att_right_context=R, n_mels=cfg.n_mels)
        cc_strict = dataclasses.replace(cc, strict_right_context=True)
        assert cc.chunk_enc_len == 1 + R
        mel = jnp.asarray(rng.standard_normal(
            (2, cc.chunk_mel_frames, cfg.n_mels), dtype=np.float32))
        outs = []
        for c in (cc, cc_strict):
            ph = enc_mod.precompute_pos_heads(params, cfg, c)
            st = enc_mod.init_encoder_state(cfg, c, 2)
            # run two chunks so the cache is warm for the second
            out1, st = enc_mod.encode_chunk(params, cfg, c, mel, st, ph)
            out2, st = enc_mod.encode_chunk(params, cfg, c, mel, st, ph)
            outs.append((np.asarray(out1), np.asarray(out2)))
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
        np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)


def test_ring_extreme_geometry_pure_causal(model_setup, oracle, rng):
    """R=0 with the full 70-frame left context: chunk_enc_len=1 -> a ring of
    71 one-frame segments (the most segment-heavy standard mode). Must still
    match the streaming oracle."""
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=0, n_mels=cfg.n_mels)
    assert cc.kv_len == 71 and cc.chunk_enc_len == 1

    ostream = OracleStream(oracle, cc)
    state = enc_mod.init_encoder_state(cfg, cc, batch=1)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))
    for ci in range(4):
        mel = rng.standard_normal(
            (cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
        want = ostream.encode_chunk(mel)
        got, state = step(params, cfg, cc, jnp.asarray(mel)[None], state,
                          pos_heads)
        np.testing.assert_allclose(np.asarray(got)[0], want, atol=5e-5,
                                   err_msg=f"chunk {ci}")


def test_int8_kv_ring_accuracy(model_setup, oracle, rng):
    """cc.kv_cache_int8: outputs stay within ~2% of the exact ring across
    multiple chunks (the ring is int8 with per-segment scales; the current
    chunk attends at full precision)."""
    import dataclasses

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels)
    cc8 = dataclasses.replace(cc, kv_cache_int8=True)

    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))
    st = enc_mod.init_encoder_state(cfg, cc, 1)
    st8 = enc_mod.init_encoder_state(cfg, cc8, 1)
    assert st8.k_cache.dtype == jnp.int8

    for ci in range(4):
        mel = rng.standard_normal(
            (1, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
        out, st = step(params, cfg, cc, jnp.asarray(mel), st, pos_heads)
        out8, st8 = step(params, cfg, cc8, jnp.asarray(mel), st8, pos_heads)
        a, b = np.asarray(out), np.asarray(out8)
        denom = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / denom < 0.02, ci


def test_int4_kv_ring_accuracy(model_setup, oracle, rng):
    """cc.kv_cache_int4 (VERDICT r3 perf lever): nibble-packed rings stay
    within ~10% of the exact ring across multiple chunks on the tiny gate
    -- the intrinsic int4 rounding floor (qmax 7: up to ~1/14 of segment
    amax per element; per-slot scales were measured identical because K/V
    are LayerNorm'd) for half the bytes. End-task accuracy is gated by
    scripts/token_agreement.py on trained weights, not this bound."""
    import dataclasses

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels)
    cc4 = dataclasses.replace(cc, kv_cache_int4=True)

    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))
    st = enc_mod.init_encoder_state(cfg, cc, 1)
    st4 = enc_mod.init_encoder_state(cfg, cc4, 1)
    assert st4.k_cache.dtype == jnp.int8
    assert st4.k_cache.shape[-1] == cfg.d_head // 2      # packed

    for ci in range(4):
        mel = rng.standard_normal(
            (1, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
        out, st = step(params, cfg, cc, jnp.asarray(mel), st, pos_heads)
        out4, st4 = step(params, cfg, cc4, jnp.asarray(mel), st4, pos_heads)
        a, b = np.asarray(out), np.asarray(out4)
        denom = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / denom < 0.10, ci


def test_int4_pack_unpack_roundtrip(rng):
    """The encoder's pack (bitcast s4 pairs -> s8) and the attention
    unpack are exact mirror images for every representable value."""
    from nemotron_tpu.ops.rel_attention import unpack_int4

    q = jnp.asarray(rng.integers(-7, 8, (3, 2, 5, 16)), jnp.int8)
    packed = jax.jit(lambda q: jax.lax.bitcast_convert_type(
        q.reshape(*q.shape[:-1], q.shape[-1] // 2, 2).astype(jnp.int4),
        jnp.int8))(q)
    assert packed.shape == (3, 2, 5, 8) and packed.dtype == jnp.int8
    back = jax.jit(lambda p: unpack_int4(p, jnp.float32))(packed)
    np.testing.assert_array_equal(np.asarray(back),
                                  np.asarray(q, np.float32))


def test_int8_int4_mutually_exclusive():
    import dataclasses

    with pytest.raises(ValueError):
        CacheConfig(kv_cache_int8=True, kv_cache_int4=True)
    cc = CacheConfig(kv_cache_int8=True)
    with pytest.raises(ValueError):
        dataclasses.replace(cc, kv_cache_int4=True)


def test_mixed_ring_phase_poisons_output(model_setup):
    """encode_chunk's lockstep-phase invariant: a direct caller passing
    non-uniform ring phases gets NaN-poisoned output (loud), not silently
    wrong attention windows; uniform phases stay finite."""
    import dataclasses

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=cfg.n_mels)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    st = enc_mod.init_encoder_state(cfg, cc, batch=2)
    mel = jnp.zeros((2, cc.chunk_mel_frames, cfg.n_mels), jnp.float32)

    out_ok, st2 = enc_mod.encode_chunk(params, cfg, cc, mel, st, pos_heads)
    assert np.isfinite(np.asarray(out_ok)).all()

    bad = dataclasses.replace(st2, phase=jnp.asarray([0, 1], jnp.int32))
    out_bad, _ = enc_mod.encode_chunk(params, cfg, cc, mel, bad, pos_heads)
    assert np.isnan(np.asarray(out_bad)).all()

    # masked path: non-uniform phases among ADVANCING streams also poison
    out_m, _ = enc_mod.encode_chunk(params, cfg, cc, mel, bad, pos_heads,
                                    step_mask=jnp.asarray([True, True]))
    assert np.isnan(np.asarray(out_m)).all()
    # ...but a lagging MASKED-OUT stream with a stale phase is legal
    out_l, _ = enc_mod.encode_chunk(params, cfg, cc, mel, bad, pos_heads,
                                    step_mask=jnp.asarray([False, True]))
    assert np.isfinite(np.asarray(out_l)).all()


@pytest.mark.parametrize("int8kv", [False, True])
def test_pallas_fused_attention_matches_xla(model_setup, rng, int8kv,
                                            monkeypatch):
    """The Pallas fused ring-attention path (NEMOTRON_TPU_ATTN=pallas)
    produces the same streaming outputs and cache writes as the einsum
    path, dense and int8-KV, over multiple chunks (interpret mode)."""
    import dataclasses

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=cfg.n_mels, kv_cache_int8=int8kv)
    B = 8
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)

    def run(impl):
        monkeypatch.setenv("NEMOTRON_TPU_ATTN", impl)
        monkeypatch.setenv("NEMOTRON_TPU_ATTN_BLOCK", "4")
        st = enc_mod.init_encoder_state(cfg, cc, B)
        outs = []
        r = np.random.default_rng(7)
        for _ in range(4):
            mel = jnp.asarray(
                r.standard_normal((B, cc.chunk_mel_frames, cfg.n_mels)),
                jnp.float32)
            out, st = enc_mod.encode_chunk(params, cfg, cc, mel, st,
                                           pos_heads)
            outs.append(np.asarray(out))
        return np.stack(outs), st

    want, st_x = run("xla")
    got, st_p = run("pallas-interpret")
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(st_p.k_cache, np.float32),
        np.asarray(st_x.k_cache, np.float32), atol=2e-5)


def test_per_layer_right_context_matches_oracle(model_setup, oracle, rng):
    """NeMo per-layer-group lookahead (att_right_context_by_layer; the
    reference's acknowledged limitation #2, its docs/STREAMING.md:540-548):
    the TPU streaming encoder must track the numpy oracle chunk by chunk
    with a binding per-layer pattern."""
    import dataclasses

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels,
                     att_right_context_by_layer=(6, 1, 0))
    assert cc.rc_schedule(cfg.n_layers) == [6, 1, 0]

    ostream = OracleStream(oracle, cc)
    state = enc_mod.init_encoder_state(cfg, cc, batch=1)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))

    uniform = dataclasses.replace(cc, att_right_context_by_layer=None)
    ostream_u = OracleStream(oracle, uniform)
    state_u = enc_mod.init_encoder_state(cfg, uniform, batch=1)

    bound = False
    for ci in range(3):
        mel = rng.standard_normal(
            (cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
        want = ostream.encode_chunk(mel)
        got, state = step(params, cfg, cc, jnp.asarray(mel)[None], state,
                          pos_heads)
        np.testing.assert_allclose(np.asarray(got)[0], want, atol=5e-5,
                                   err_msg=f"chunk {ci}")
        # the pattern must actually bind: outputs differ from uniform R=6
        want_u = ostream_u.encode_chunk(mel)
        got_u, state_u = step(params, cfg, uniform, jnp.asarray(mel)[None],
                              state_u, pos_heads)
        if np.max(np.abs(want_u - want)) > 1e-3:
            bound = True
    assert bound, "per-layer pattern never changed the output"

    # a vacuous pattern (every group at the full R) is a numerical no-op
    vac = dataclasses.replace(cc, att_right_context_by_layer=(6, 6, 6))
    ostream_v = OracleStream(oracle, vac)
    state_v = enc_mod.init_encoder_state(cfg, vac, batch=1)
    rng2 = np.random.default_rng(7)
    for _ in range(2):
        mel = rng2.standard_normal(
            (cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
        want_v = ostream_v.encode_chunk(mel)
        got_v, state_v = step(params, cfg, vac, jnp.asarray(mel)[None],
                              state_v, pos_heads)
        np.testing.assert_allclose(np.asarray(got_v)[0], want_v, atol=5e-5)


def test_rc_schedule_validation():
    import pytest as _pytest

    cc = CacheConfig(att_right_context=6,
                     att_right_context_by_layer=(6, 1))
    with _pytest.raises(ValueError, match="equal groups"):
        cc.rc_schedule(3)
    cc2 = CacheConfig(att_right_context=1,
                      att_right_context_by_layer=(6, 1, 0))
    with _pytest.raises(ValueError, match="exceeds"):
        cc2.rc_schedule(3)
    assert CacheConfig(att_right_context=13).rc_schedule(24) is None
    cc3 = CacheConfig(att_right_context=13,
                      att_right_context_by_layer=(13, 6, 1, 0))
    assert cc3.rc_schedule(24) == [13] * 6 + [6] * 6 + [1] * 6 + [0] * 6


def test_fuzz_random_geometries_vs_oracle(model_setup, oracle):
    """Property fuzz: random non-standard cache geometries (R, left context
    multiple, optional per-layer lookahead pattern) all track the streaming
    oracle chunk by chunk. Guards the ring index math off the four standard
    presets."""
    import dataclasses

    _, params, cfg = model_setup
    rng = np.random.default_rng(2024)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))

    for case in range(6):
        R = int(rng.integers(0, 8))
        chunk_enc = 1 + R
        left = chunk_enc * int(rng.integers(2, 5))
        cc = CacheConfig(att_right_context=R, att_left_context=left,
                         n_mels=cfg.n_mels)
        if case >= 4:
            # random binding per-layer pattern (3 layers in the tiny model)
            pat = tuple(int(rng.integers(0, R + 1)) for _ in range(3))
            cc = dataclasses.replace(cc, att_right_context_by_layer=pat)
        label = (f"case {case}: R={R} left={left} "
                 f"pat={cc.att_right_context_by_layer}")

        ostream = OracleStream(oracle, cc)
        state = enc_mod.init_encoder_state(cfg, cc, batch=1)
        pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
        n_chunks = int(rng.integers(2, 4))
        for ci in range(n_chunks):
            mel = rng.standard_normal(
                (cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32)
            want = ostream.encode_chunk(mel)
            got, state = step(params, cfg, cc, jnp.asarray(mel)[None],
                              state, pos_heads)
            np.testing.assert_allclose(
                np.asarray(got)[0], want, atol=5e-5,
                err_msg=f"{label} chunk {ci}")
