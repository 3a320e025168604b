"""Quantized-path tests (SURVEY.md §7 stage 7).

Gates, mirroring the reference's quant guarantees:
  - QTensor quantization is bit-identical to the GGUF Q8_0 writer
    (reference scripts/convert_to_gguf.py:93-139).
  - qmm on QTensor == matmul on the dequantized weight (exact).
  - The Pallas int8 kernel (interpret mode on CPU) matches the dequant path.
  - A Q8_0 GGUF round-trips into QTensor leaves and the full pipeline still
    matches the f32 model within quantization tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nemotron_tpu import gguf
from nemotron_tpu import params as params_mod
from nemotron_tpu.ops import quant
from nemotron_tpu.ops.quant_kernel import q8_matmul

from conftest import write_tiny_gguf


def test_quantize_matches_gguf_q8_0(rng):
    """quantize_tensor on the transposed ([in, out]) weight produces exactly
    the GGUF writer's Q8_0 blocks (which run along the contiguous `in` dim of
    the PyTorch [out, in] layout)."""
    w = rng.standard_normal((96, 64), dtype=np.float32)  # [out, in]
    qt = quant.quantize_tensor(w.T)                       # [in, out]

    blocks = np.frombuffer(
        gguf.quantize_q8_0(w),
        dtype=np.dtype([("scale", np.float16), ("q", np.int8, 32)]))
    ref_q = blocks["q"].reshape(96, 64)                   # [out, in]
    ref_s = blocks["scale"].astype(np.float32).reshape(96, 64 // 32)
    np.testing.assert_array_equal(np.asarray(qt.q).T, ref_q)
    np.testing.assert_array_equal(np.asarray(qt.scale).T, ref_s)


def test_qmm_equals_dequant_matmul(rng):
    w = rng.standard_normal((64, 96), dtype=np.float32)
    x = jnp.asarray(rng.standard_normal((5, 64), dtype=np.float32))
    qt = quant.quantize_tensor(w)
    ref = x @ quant.dequantize(qt, jnp.float32)
    out = quant.qmm(x, qt, prefer_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_qmm_plain_array_passthrough(rng):
    w = rng.standard_normal((8, 4), dtype=np.float32)
    x = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(quant.qmm(x, jnp.asarray(w))),
                               np.asarray(x @ w), rtol=1e-6)


@pytest.mark.parametrize("M", [8, 37, 300])
def test_pallas_q8_matmul_interpret(rng, M):
    K, N = 512, 256
    w = rng.standard_normal((K, N), dtype=np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
    qt = quant.quantize_tensor(w)
    ref = np.asarray(x @ quant.dequantize(qt, jnp.float32))
    out = np.asarray(q8_matmul(x, jnp.asarray(qt.q), jnp.asarray(qt.scale),
                               interpret=True))
    assert out.shape == (M, N)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_quantize_model_params_pipeline(model_setup, rng):
    """Full streaming chunk step with quantized encoder weights stays close
    to the f32 model."""
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import chunk_step

    _, params, cfg = model_setup
    qparams = params_mod.quantize_model_params(params)
    assert isinstance(qparams.layers.ffn1_w1, quant.QTensor)
    assert qparams.layers.ffn1_w1.q.dtype == np.int8
    assert not isinstance(qparams.decoder.embedding, quant.QTensor)

    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    mel = jnp.asarray(
        rng.standard_normal((2, cc.chunk_mel_frames, cfg.n_mels),
                            dtype=np.float32))

    outs = {}
    for name, p in [("f32", params), ("q8", qparams)]:
        enc_state = enc_mod.init_encoder_state(cfg, cc, 2)
        dec_state = dec_mod.init_decoder_state(cfg, 2)
        pos_heads = enc_mod.precompute_pos_heads(p, cfg, cc)
        toks, enc_state, _ = chunk_step(p, cfg, cc, mel, enc_state,
                                        dec_state, pos_heads)
        outs[name] = np.asarray(enc_state.k_cache)

    # encoder activations should agree to ~1% of scale with int8 weights
    diff = np.abs(outs["f32"] - outs["q8"]).max()
    scale = np.abs(outs["f32"]).max() + 1e-9
    assert diff / scale < 0.05, (diff, scale)


def test_gguf_q8_roundtrip_to_qtensor(model_setup, tmp_path):
    arrays, params, cfg = model_setup
    qnames = {n: gguf.GGML_Q8_0 for n in arrays
              if quant.should_quantize(
                  n, arrays[n] if arrays[n].ndim != 3 else arrays[n].squeeze())}
    assert qnames
    path = str(tmp_path / "q8.gguf")
    write_tiny_gguf(path, arrays, cfg, quantize=qnames)

    qp, qcfg, vocab = params_mod.load_model(path, keep_quantized=True)
    assert isinstance(qp.layers.ffn1_w1, quant.QTensor)
    assert qcfg.d_model == cfg.d_model

    dp, _, _ = params_mod.load_model(path, keep_quantized=False)
    # QTensor dequantizes to exactly the f32 the dense loader produced
    np.testing.assert_allclose(
        np.asarray(quant.dequantize(qp.layers.ffn1_w1)),
        np.asarray(dp.layers.ffn1_w1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(quant.dequantize(qp.layers.conv_pw1_w)),
        np.asarray(dp.layers.conv_pw1_w), rtol=1e-6, atol=1e-7)


def test_cast_params_preserves_qtensor(model_setup):
    _, params, cfg = model_setup
    qparams = params_mod.quantize_model_params(params)
    cast = params_mod.cast_params(qparams, jnp.bfloat16)
    assert cast.layers.ffn1_w1.q.dtype == jnp.int8
    assert cast.layers.ffn1_w1.scale.dtype == jnp.float32
    assert cast.decoder.embedding.dtype == jnp.bfloat16


def test_gguf_q4_roundtrip_to_qtensor(model_setup, tmp_path):
    """Q4_0 tensors load as int8 QTensors with exact Q4_0 dequant numerics."""
    arrays, params, cfg = model_setup
    qnames = {n: gguf.GGML_Q4_0 for n in arrays
              if quant.should_quantize(
                  n, arrays[n] if arrays[n].ndim != 3 else arrays[n].squeeze())}
    path = str(tmp_path / "q4.gguf")
    write_tiny_gguf(path, arrays, cfg, quantize=qnames)

    qp, _, _ = params_mod.load_model(path, keep_quantized=True)
    assert isinstance(qp.layers.ffn1_w1, quant.QTensor)
    assert np.asarray(qp.layers.ffn1_w1.q).min() >= -8
    assert np.asarray(qp.layers.ffn1_w1.q).max() <= 7

    dp, _, _ = params_mod.load_model(path, keep_quantized=False)
    np.testing.assert_allclose(
        np.asarray(quant.dequantize(qp.layers.ffn1_w1)),
        np.asarray(dp.layers.ffn1_w1), rtol=1e-6, atol=1e-7)


def test_w8a8_matmul_accuracy(rng):
    w = rng.standard_normal((128, 96), dtype=np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((7, 128), dtype=np.float32))
    qt = quant.quantize_tensor_w8a8(w)
    assert qt.q.dtype == np.int8 and qt.col_scale.shape == (96,)
    ref = np.asarray(x @ w)
    out = np.asarray(quant.qmm_w8a8(x, qt))
    # int8 weights + int8 dynamic activations: ~1% relative error budget
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.02


def test_w8a8_pipeline(model_setup, rng):
    """Full chunk step with W8A8 encoder matmuls stays close to f32."""
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import chunk_step

    _, params, cfg = model_setup
    qparams = params_mod.quantize_model_params(params, mode="w8a8")
    assert isinstance(qparams.layers.ffn1_w1, quant.QTensorW8A8)

    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    mel = jnp.asarray(rng.standard_normal(
        (2, cc.chunk_mel_frames, cfg.n_mels), dtype=np.float32))

    outs = {}
    for name, p in [("f32", params), ("w8a8", qparams)]:
        es = enc_mod.init_encoder_state(cfg, cc, 2)
        ds = dec_mod.init_decoder_state(cfg, 2)
        ph = enc_mod.precompute_pos_heads(p, cfg, cc)
        _, es, _ = chunk_step(p, cfg, cc, mel, es, ds, ph)
        outs[name] = np.asarray(es.k_cache)
    diff = np.abs(outs["f32"] - outs["w8a8"]).max()
    scale = np.abs(outs["f32"]).max() + 1e-9
    assert diff / scale < 0.08, (diff, scale)


@pytest.mark.parametrize("M,K,N", [(37, 512, 256), (300, 1024, 512)])
def test_pallas_w8a8_matmul_interpret(rng, M, K, N):
    """Fused W8A8 kernel (interpret mode): per-(row, k-tile) activation
    scales must be at least as accurate as the XLA per-row path."""
    from nemotron_tpu.ops.w8a8_kernel import w8a8_matmul

    w = rng.standard_normal((K, N), dtype=np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
    qt = quant.quantize_tensor_w8a8(w)
    ref = np.asarray(x @ jnp.asarray(
        qt.q, jnp.float32) * jnp.asarray(qt.col_scale))
    xla = np.asarray(quant.qmm_w8a8(x, qt))
    got = np.asarray(w8a8_matmul(x, jnp.asarray(qt.q),
                                 jnp.asarray(qt.col_scale), interpret=True))
    assert got.shape == (M, N)
    denom = np.abs(ref).max()
    err_kernel = np.abs(got - ref).max() / denom
    err_xla = np.abs(xla - ref).max() / denom
    assert err_kernel < max(2 * err_xla, 0.02), (err_kernel, err_xla)


def test_q8_gguf_to_w8a8_conversion(model_setup, tmp_path):
    """A Q8_0 GGUF can be re-quantized into the fast W8A8 serving mode;
    numerics stay close to dense."""
    arrays, _, cfg = model_setup
    qnames = {n: gguf.GGML_Q8_0 for n in arrays
              if quant.should_quantize(
                  n, arrays[n] if arrays[n].ndim != 3 else arrays[n].squeeze())}
    path = str(tmp_path / "c.gguf")
    write_tiny_gguf(path, arrays, cfg, quantize=qnames)

    qp, qcfg, _ = params_mod.load_model(path, keep_quantized=True)
    wp = params_mod.quantize_model_params(qp, mode="w8a8")
    assert isinstance(wp.layers.ffn1_w1, quant.QTensorW8A8)

    dense = params_mod.load_model(path, keep_quantized=False)[0]
    w_dense = np.asarray(dense.layers.ffn1_w1)
    w_back = (np.asarray(wp.layers.ffn1_w1.q, np.float32)
              * np.asarray(wp.layers.ffn1_w1.col_scale)[:, None, :])
    assert np.abs(w_back - w_dense).max() / np.abs(w_dense).max() < 0.02


def test_w8a8_to_q8_0_conversion(model_setup):
    """Round-trip the other way: W8A8 params re-quantized to Q8_0 blocks."""
    _, params, cfg = model_setup
    wp = params_mod.quantize_model_params(params, mode="w8a8")
    qp = params_mod.quantize_model_params(wp, mode="q8_0")
    assert isinstance(qp.layers.ffn1_w1, quant.QTensor)
    dense = np.asarray(params.layers.ffn1_w1)
    back = np.asarray(quant.dequantize(qp.layers.ffn1_w1))
    assert np.abs(back - dense).max() / np.abs(dense).max() < 0.03


def test_w8a8_plus_int8kv_pipeline(model_setup, rng):
    """The headline serving config (W8A8 weights + int8 K/V rings) stays
    within tolerance of f32 over multiple streaming chunks."""
    import dataclasses

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models import decoder as dec_mod
    from nemotron_tpu.models import encoder as enc_mod
    from nemotron_tpu.streaming.session import chunk_step

    _, params, cfg = model_setup
    qparams = params_mod.quantize_model_params(params, mode="w8a8")
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    cc8 = dataclasses.replace(cc, kv_cache_int8=True)

    outs = {}
    for name, p, c in [("f32", params, cc), ("w8a8+int8kv", qparams, cc8)]:
        es = enc_mod.init_encoder_state(cfg, c, 2)
        ph = enc_mod.precompute_pos_heads(p, cfg, c)
        acc = []
        r2 = np.random.default_rng(5)
        for _ in range(3):
            mel = jnp.asarray(r2.standard_normal(
                (2, c.chunk_mel_frames, cfg.n_mels)), jnp.float32)
            enc_out, es = enc_mod.encode_chunk(p, cfg, c, mel, es, ph)
            acc.append(np.asarray(enc_out))
        outs[name] = np.concatenate(acc, axis=1)
    a, b = outs["f32"], outs["w8a8+int8kv"]
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.08
