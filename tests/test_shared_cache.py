"""Shared channel cache (cc.shared_cache): the x-ring layout that caches
post-norm pre-projection activations once per layer and recomputes K/V per
step, instead of separate K and V rings -- half the attention state bytes
(NeMo's layout; reference docs/STREAMING.md:446-456 documents it as the
cheaper alternative its own ggml build does not take).

Correctness bar: with an UNQUANTIZED ring the layout is the same math in a
different order (K = LN'd-x @ Wk either cached or recomputed), so outputs
must match the split-ring path to float tolerance; the int8 x-ring must
track the exact path about as well as the int8 K/V ring does. The serving
tests drive the layout through the realign/step_mask/evict machinery,
which is rank-generic and must work unchanged on [L, B, 1, KV, D]."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.models import encoder as enc_mod


@pytest.mark.parametrize("right_context,n_chunks", [(1, 6), (6, 4)])
def test_shared_matches_split_ring(model_setup, rng, right_context,
                                   n_chunks):
    """f32, no quantization: shared x-ring == split K/V ring to float
    tolerance, across enough chunks to wrap the ring."""
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=right_context, att_left_context=14,
                     n_mels=cfg.n_mels)
    ccs = dataclasses.replace(cc, shared_cache=True)

    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))
    st = enc_mod.init_encoder_state(cfg, cc, 2)
    sts = enc_mod.init_encoder_state(cfg, ccs, 2)
    assert sts.k_cache.shape == (cfg.n_layers, 2, 1, cc.kv_len, cfg.d_model)
    assert sts.v_cache.shape[-1] == 0

    for ci in range(n_chunks):
        mel = jnp.asarray(rng.standard_normal(
            (2, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32))
        out, st = step(params, cfg, cc, mel, st, pos_heads)
        outs, sts = step(params, cfg, ccs, mel, sts, pos_heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(outs),
                                   atol=2e-4, err_msg=f"chunk {ci}")


def test_shared_int8_accuracy(model_setup, rng):
    """int8 x-ring (per-(L,B,seg) scales) tracks the exact f32 path within
    the same band the int8 K/V ring does. The x-ring is LayerNorm output,
    so a per-segment scalar scale loses little vs the K/V ring's per-head
    scales."""
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=6, att_left_context=14,
                     n_mels=cfg.n_mels)
    cc8 = dataclasses.replace(cc, shared_cache=True, kv_cache_int8=True)

    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))
    st = enc_mod.init_encoder_state(cfg, cc, 1)
    st8 = enc_mod.init_encoder_state(cfg, cc8, 1)
    assert st8.k_cache.dtype == jnp.int8
    assert st8.k_scale.shape == (cfg.n_layers, 1, 1, cc.kv_len // cc.chunk_enc_len)

    for ci in range(4):
        mel = jnp.asarray(rng.standard_normal(
            (1, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32))
        out, st = step(params, cfg, cc, mel, st, pos_heads)
        out8, st8 = step(params, cfg, cc8, mel, st8, pos_heads)
        a, b = np.asarray(out), np.asarray(out8)
        denom = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / denom < 0.03, ci


def test_shared_int4_rejected():
    with pytest.raises(ValueError):
        CacheConfig(shared_cache=True, kv_cache_int4=True)


def test_shared_step_mask(model_setup, rng):
    """Continuous-batching semantics on the x-ring: a masked stream's state
    is bit-identical to before the step; advancing streams match a run
    without masking."""
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels, shared_cache=True)
    pos_heads = enc_mod.precompute_pos_heads(params, cfg, cc)
    step = jax.jit(enc_mod.encode_chunk, static_argnums=(1, 2))

    st = enc_mod.init_encoder_state(cfg, cc, 2)
    mel0 = jnp.asarray(rng.standard_normal(
        (2, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32))
    # both advance once so phases agree
    _, st = step(params, cfg, cc, mel0, st, pos_heads)
    before = jax.tree.map(np.asarray, st)

    mel1 = jnp.asarray(rng.standard_normal(
        (2, cc.chunk_mel_frames, cfg.n_mels)).astype(np.float32))
    _, st_masked = step(params, cfg, cc, mel1, st, pos_heads,
                        step_mask=jnp.asarray([False, True]))
    after = jax.tree.map(np.asarray, st_masked)
    # stream 0 untouched
    np.testing.assert_array_equal(after.k_cache[:, 0], before.k_cache[:, 0])
    np.testing.assert_array_equal(after.conv_cache[:, 0],
                                  before.conv_cache[:, 0])
    assert after.valid_len[0] == before.valid_len[0]
    # stream 1 advanced exactly as without the mask
    _, st_all = step(params, cfg, cc, mel1, st, pos_heads)
    all_ = jax.tree.map(np.asarray, st_all)
    np.testing.assert_array_equal(after.k_cache[:, 1], all_.k_cache[:, 1])
    assert after.valid_len[1] == all_.valid_len[1]


def test_shared_serving_resume_after_long_gap(model_setup):
    """The full continuous-batching machinery (realign_ring wrap, slot
    masking) on the shared layout: a slot that skips more ticks than the
    ring has segments still matches a solo engine exactly on resume."""
    from nemotron_tpu.streaming.serving import ServingEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels, shared_cache=True)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    def audio(seed, n=4000):
        r = np.random.default_rng(seed)
        return (r.standard_normal(n) * 8000).astype(np.int16)

    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32)
    busy, lazy = eng.add_stream(), eng.add_stream()
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


def test_shared_session_snapshot_roundtrip(model_setup, tmp_path):
    """StreamSession save/load with the x-ring: resumed session produces
    identical output to the uninterrupted one."""
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels, shared_cache=True,
                     kv_cache_int8=True)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    r = np.random.default_rng(7)

    def chunk(n=4000):
        return (r.standard_normal(n) * 8000).astype(np.int16)

    chunks = [chunk() for _ in range(4)]
    sess = StreamSession(params, cfg, vocab, cc, compute_dtype=jnp.float32)
    for c in chunks[:2]:
        sess.process(c)
    path = str(tmp_path / "snap.npz")
    sess.save(path)
    mid_text = sess.transcripts[0]

    resumed = StreamSession(params, cfg, vocab, cc,
                            compute_dtype=jnp.float32)
    resumed.load(path)
    assert resumed.transcripts[0] == mid_text
    for c in chunks[2:]:
        sess.process(c)
        resumed.process(c)
    assert resumed.transcripts[0] == sess.transcripts[0]
