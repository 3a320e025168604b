"""SmoothQuant activation->weight migration (ops/smoothquant.py).

Gates:
  1. The fold is EXACT in f32 (pure rescale commutation) -- batch encoder
     outputs match the unfolded model to float rounding.
  2. Calibration statistics have the right shape and are positive.
  3. On a model with an injected activation-outlier channel (the failure
     mode SmoothQuant exists for), the smoothed W8A8 encoder tracks the
     dense f32 encoder strictly better than plain W8A8.
  4. The smoothed+quantized model runs the real streaming session.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu import params as P
from nemotron_tpu.models.encoder import encode_batch
from nemotron_tpu.ops.smoothquant import (FOLD_SITES, calibrate_ln_amax,
                                          smooth_params, smooth_quantize)


def _mel(rng, cfg, B=2, T=40):
    return rng.standard_normal((B, T, cfg.n_mels)).astype(np.float32)


def test_calibration_shapes(model_setup, rng):
    _, params, cfg = model_setup
    amax = calibrate_ln_amax(params, cfg, _mel(rng, cfg))
    assert set(amax) == {s for s, _ in FOLD_SITES}
    for site, a in amax.items():
        assert a.shape == (cfg.n_layers, cfg.d_model)
        assert np.all(a > 0), site


@pytest.mark.parametrize("alpha", [0.5, 0.8])
def test_fold_is_exact_in_f32(model_setup, rng, alpha):
    _, params, cfg = model_setup
    mel = _mel(rng, cfg)
    amax = calibrate_ln_amax(params, cfg, mel)
    smoothed = smooth_params(params, amax, alpha=alpha)
    ref = np.asarray(encode_batch(params, cfg, jnp.asarray(mel)))
    got = np.asarray(encode_batch(smoothed, cfg, jnp.asarray(mel)))
    # pure per-channel rescale commutation: only fp rounding differs
    assert np.max(np.abs(got - ref)) < 5e-5


def _with_outlier(params, cfg, ch=0, gain=64.0):
    """Inject an activation outlier: channel `ch` of every norm_ff1 output
    is scaled by `gain`, compensated exactly in ffn1_w1 -- the f32 function
    is unchanged, but per-token abs-max activation quantization now wastes
    ~log2(gain) bits on every other channel."""
    layers = params.layers
    g = np.asarray(layers.norm_ff1_w, np.float32).copy()
    b = np.asarray(layers.norm_ff1_b, np.float32).copy()
    w = np.asarray(layers.ffn1_w1, np.float32).copy()
    g[:, ch] *= gain
    b[:, ch] *= gain
    w[:, ch, :] /= gain
    return dataclasses.replace(
        params, layers=dataclasses.replace(
            layers, norm_ff1_w=g, norm_ff1_b=b, ffn1_w1=w))


def test_outlier_recovery(model_setup, rng):
    _, params, cfg = model_setup
    mel = _mel(rng, cfg)
    outlier = _with_outlier(params, cfg)
    ref = np.asarray(encode_batch(outlier, cfg, jnp.asarray(mel)))

    plain = P.quantize_model_params(outlier, mode="w8a8")
    amax = calibrate_ln_amax(outlier, cfg, mel)
    sq = P.quantize_model_params(smooth_params(outlier, amax), mode="w8a8")

    err_plain = np.max(np.abs(np.asarray(
        encode_batch(plain, cfg, jnp.asarray(mel))) - ref))
    err_sq = np.max(np.abs(np.asarray(
        encode_batch(sq, cfg, jnp.asarray(mel))) - ref))
    # the migration must recover most of the outlier-induced quant error
    assert err_sq < 0.5 * err_plain, (err_sq, err_plain)


def test_smooth_quantize_streaming_session(model_setup, rng):
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    mel = _mel(rng, cfg)
    sq = smooth_quantize(params, cfg, mel, att_chunk=cc.chunk_enc_len)

    audio = (rng.standard_normal((2, 4 * cc.chunk_samples))
             * 8000).astype(np.int16)
    sess = StreamSession(sq, cfg, None, cc, n_streams=2,
                         compute_dtype=jnp.bfloat16)
    sess.process(audio)
    sess.finalize()  # runs; decode path accepts the folded pytree


def test_static_act_scales_semantics(model_setup, rng):
    """qmm with a static act_scale computes exactly round(x/s)@q * s*col."""
    from nemotron_tpu.ops.quant import (QTensorW8A8, qmm_w8a8,
                                        quantize_tensor_w8a8)

    w = rng.standard_normal((16, 8)).astype(np.float32)
    qt = quantize_tensor_w8a8(w)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    s = np.float32(np.max(np.abs(x)) / 127.0)
    st = QTensorW8A8(q=qt.q, col_scale=qt.col_scale, act_scale=s)

    got = np.asarray(qmm_w8a8(jnp.asarray(x), st))
    xq = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    want = (xq.astype(np.int32) @ qt.q.astype(np.int32)).astype(np.float32)
    want = want * (s * qt.col_scale[None, :])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # saturating beyond calibration: no overflow, finite output
    big = np.asarray(qmm_w8a8(jnp.asarray(x * 1000.0), st))
    assert np.all(np.isfinite(big))


def test_static_matches_dynamic_closely(model_setup, rng):
    """Static calibrated scales track the dynamic-per-token path: both are
    int8 roundings of the same f32 function; on the calibration data the
    static encoder must stay within a few dynamic-quant error units."""
    from nemotron_tpu.ops.smoothquant import attach_static_act_scales

    _, params, cfg = model_setup
    mel = _mel(rng, cfg)
    ref = np.asarray(encode_batch(params, cfg, jnp.asarray(mel)))

    amax = calibrate_ln_amax(params, cfg, mel)
    smoothed, s = smooth_params(params, amax, return_scales=True)
    dyn = P.quantize_model_params(smoothed, mode="w8a8")
    stat = attach_static_act_scales(dyn, amax, s)
    for site, names in FOLD_SITES:
        for n in names:
            leaf = getattr(stat.layers, n)
            assert leaf.act_scale is not None
            assert leaf.act_scale.shape == (cfg.n_layers,)

    err_dyn = np.max(np.abs(np.asarray(
        encode_batch(dyn, cfg, jnp.asarray(mel))) - ref))
    err_stat = np.max(np.abs(np.asarray(
        encode_batch(stat, cfg, jnp.asarray(mel))) - ref))
    assert np.isfinite(err_stat)
    assert err_stat < 4.0 * max(err_dyn, 1e-6), (err_stat, err_dyn)


def test_static_streaming_session_and_cast(model_setup, rng):
    """smooth_quantize(static_act=True) survives cast_params and runs the
    real streaming session end to end."""
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.session import StreamSession

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    mel = _mel(rng, cfg)
    sq = smooth_quantize(params, cfg, mel, att_chunk=cc.chunk_enc_len,
                         static_act=True)
    sq = P.cast_params(sq, jnp.bfloat16)   # act_scale survives the cast
    leaf = sq.layers.ffn1_w1
    assert leaf.act_scale is not None

    audio = (rng.standard_normal((2, 4 * cc.chunk_samples))
             * 8000).astype(np.int16)
    sess = StreamSession(sq, cfg, None, cc, n_streams=2,
                         compute_dtype=jnp.bfloat16)
    sess.process(audio)
    sess.finalize()
