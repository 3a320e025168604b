"""Differential tests: JAX encoder vs numpy oracle.

Counterpart of reference tests/test_compute.cpp (same real-weights-plus-
fixture idiom, with random weights standing in since no GGUF ships with the
repo). Tolerances follow the reference's recorded gates
(docs/STATUS.md:241-260: encoder 4.5e-05 max diff at full size)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.models import encoder as enc_mod
from nemotron_tpu.oracle import OracleModel
from nemotron_tpu.ops import conv as conv_ops
from nemotron_tpu.ops import rel_attention as rel_ops


@pytest.fixture(scope="module")
def oracle(model_setup):
    arrays, _params, cfg = model_setup
    return OracleModel(arrays, cfg)


def test_pos_emb_matches_oracle(model_setup):
    from nemotron_tpu.oracle import ops as oops

    _, _, cfg = model_setup
    a = rel_ops.pos_emb_descending(12, cfg.d_model)
    b = oops.pos_emb_descending(12, cfg.d_model)
    np.testing.assert_allclose(a, b, atol=1e-6)
    # descending: row 0 is the most positive position
    assert a.shape == (23, cfg.d_model)
    np.testing.assert_allclose(a[11], b[11], atol=0)  # center = position 0
    np.testing.assert_allclose(a[11, 0::2], 0.0, atol=1e-6)  # sin(0)


def test_rel_shift_matches_oracle(rng):
    from nemotron_tpu.oracle import ops as oops

    H, Q = 3, 7
    x = rng.standard_normal((H, Q, 2 * Q - 1)).astype(np.float32)
    want = oops.rel_shift(x)
    got = np.asarray(rel_ops.rel_shift(jnp.asarray(x)[None], klen=Q))[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rel_shift_cached_matches_oracle(rng):
    from nemotron_tpu.oracle import ops as oops

    H, Q, cache = 2, 4, 10
    P = 2 * (cache + Q) - 1
    x = rng.standard_normal((H, Q, P)).astype(np.float32)
    want = oops.rel_shift_cached(x, cache + Q)
    got = np.asarray(rel_ops.rel_shift(jnp.asarray(x)[None], klen=cache + Q))[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv_subsampling(model_setup, oracle, rng):
    _, params, cfg = model_setup
    T = 37
    mel = rng.standard_normal((T, cfg.n_mels)).astype(np.float32)
    want = oracle.conv_subsampling(mel)
    got = np.asarray(conv_ops.conv_subsampling(params.subsampling,
                                               jnp.asarray(mel)[None]))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_depthwise_conv1d_cached_vs_full(model_setup, rng):
    """Cached chunked depthwise conv == full-sequence conv (the reference's
    tier-3 self-consistency test, tests/test_streaming.cpp:302-516, but with
    an exact gate instead of 1e-3)."""
    _, params, cfg = model_setup
    w = np.asarray(params.layers.conv_dw_w[0])  # [K, D]
    K, D = w.shape
    T, n_chunks = 5, 4
    x = rng.standard_normal((1, T * n_chunks, D)).astype(np.float32)
    full, _ = conv_ops.depthwise_conv1d(jnp.asarray(x), jnp.asarray(w))
    cache = None
    outs = []
    for i in range(n_chunks):
        chunk = jnp.asarray(x[:, i * T : (i + 1) * T])
        out, cache = conv_ops.depthwise_conv1d(chunk, jnp.asarray(w), cache)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(full),
                               atol=1e-5)


def test_conformer_layer(model_setup, oracle, rng):
    _, params, cfg = model_setup
    import jax

    T = 11
    x = rng.standard_normal((T, cfg.d_model)).astype(np.float32)
    from nemotron_tpu.oracle import ops as oops

    pos = oops.pos_emb_descending(T, cfg.d_model)
    want = oracle.conformer_layer(x, pos, 0)

    lp = jax.tree_util.tree_map(lambda a: a[0], params.layers)
    pos_heads = rel_ops.project_pos(jnp.asarray(lp.attn_pos_w),
                                    jnp.asarray(pos), cfg.n_heads, cfg.d_head)
    got, _, _, _ = enc_mod.conformer_layer(
        lp, jnp.asarray(x)[None], pos_heads,
        n_heads=cfg.n_heads, d_head=cfg.d_head)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=3e-5)


def test_full_encoder(model_setup, oracle, rng):
    _, params, cfg = model_setup
    T = 25
    mel = rng.standard_normal((T, cfg.n_mels)).astype(np.float32)
    want = oracle.encoder(mel)
    got = np.asarray(enc_mod.encode_batch(params, cfg, jnp.asarray(mel)[None]))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)
