"""GGUF reader/writer round-trip and quantization tests.

Counterpart of reference tests/test_weights.cpp (tensor-exactness gate 1e-5)
plus quantizer checks against the reference Q8_0/Q4_0 block layouts
(reference scripts/convert_to_gguf.py:93-179)."""

import numpy as np
import pytest
import struct

from nemotron_tpu import gguf


def test_roundtrip_f32(tmp_path, rng):
    tensors = {
        "a.weight": rng.standard_normal((16, 8)).astype(np.float32),
        "b.bias": rng.standard_normal((37,)).astype(np.float32),
        "c.w3": rng.standard_normal((4, 5, 6)).astype(np.float32),
    }
    meta = {"nemo.d_model": 1024, "general.architecture": "nemo",
            "x.f": 0.5, "tokenizer.vocab": b"\x61\x00" * 8}
    path = str(tmp_path / "m.gguf")
    gguf.write_gguf(path, meta, tensors)
    g = gguf.read_gguf(path)
    assert g.metadata["nemo.d_model"] == 1024
    assert g.metadata["general.architecture"] == "nemo"
    assert abs(g.metadata["x.f"] - 0.5) < 1e-9
    for name, arr in tensors.items():
        out = g.tensors[name].to_numpy()
        assert out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


def test_q8_0_roundtrip_error(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    raw = gguf.quantize_q8_0(x)
    assert len(raw) == 1024 // 32 * 34  # 34 B per 32 elements
    y = gguf.dequantize_q8_0(raw, 1024)
    # max error bounded by half a quantization step per block
    scale = np.abs(x).reshape(-1, 32).max(axis=1) / 127.0
    bound = np.repeat(scale, 32) * 0.5 + 1e-6
    assert np.all(np.abs(x - y) <= bound + np.abs(x) * 1e-2)


def test_q4_0_roundtrip_error(rng):
    x = rng.standard_normal(640).astype(np.float32)
    raw = gguf.quantize_q4_0(x)
    assert len(raw) == 640 // 32 * 18  # 18 B per 32 elements
    y = gguf.dequantize_q4_0(raw, 640)
    scale = np.abs(x).reshape(-1, 32).max(axis=1) / 7.0
    bound = np.repeat(scale, 32) * 0.5 + 1e-6
    assert np.all(np.abs(x - y) <= bound)


def test_q8_int8_view(rng):
    x = rng.standard_normal(256).astype(np.float32)
    raw = gguf.quantize_q8_0(x)
    q, s = gguf.q8_0_to_int8(raw, 256)
    assert q.dtype == np.int8 and s.dtype == np.float32
    y = q.astype(np.float32).reshape(-1, 32) * s[:, None]
    np.testing.assert_allclose(y.reshape(-1), gguf.dequantize_q8_0(raw, 256),
                               rtol=0, atol=1e-6)


def test_quantized_model_roundtrip(tmp_path, rng):
    tensors = {
        "enc.weight": rng.standard_normal((64, 64)).astype(np.float32),
        "enc.bias": rng.standard_normal((64,)).astype(np.float32),
    }
    path = str(tmp_path / "q.gguf")
    gguf.write_gguf(path, {"n": 1}, tensors,
                    quantize={"enc.weight": gguf.GGML_Q8_0})
    g = gguf.read_gguf(path)
    assert g.tensors["enc.weight"].ggml_type == gguf.GGML_Q8_0
    w = g.tensors["enc.weight"].to_numpy()
    assert np.max(np.abs(w - tensors["enc.weight"])) < 0.02
    np.testing.assert_array_equal(g.tensors["enc.bias"].to_numpy(),
                                  tensors["enc.bias"])


def test_vocab_blob():
    vocab = ["<unk>", "▁the", "a", "xyz"]
    blob = gguf.encode_vocab(vocab)
    assert len(blob) == 4 * 8
    assert gguf.decode_vocab(blob, 4) == vocab


def test_full_model_gguf_load(tmp_path, model_setup):
    """Write a full random model as GGUF, load via load_model, compare a few
    mapped tensors (incl. transposition conventions)."""
    from nemotron_tpu import params as P

    arrays, params, cfg = model_setup
    meta = {
        "general.architecture": "nemo",
        "tokenizer.vocab": gguf.encode_vocab(
            [f"t{i}"[:7] for i in range(cfg.vocab_size)]),
        "nemo.n_mels": cfg.n_mels, "nemo.d_model": cfg.d_model,
        "nemo.n_heads": cfg.n_heads, "nemo.d_head": cfg.d_head,
        "nemo.d_ff": cfg.d_ff, "nemo.n_layers": cfg.n_layers,
        "nemo.kernel_size": 31,  # stale on purpose, like the reference
        "nemo.vocab_size": cfg.vocab_size,
    }
    # convert conv weights the way the reference converter does
    conv_arrays = {}
    for name, a in arrays.items():
        if name.endswith(".conv.depthwise_conv.weight"):
            a = a.squeeze(1).T  # (D,1,K) -> (K,D)
        elif name.endswith((".conv.pointwise_conv1.weight",
                            ".conv.pointwise_conv2.weight")):
            a = a.squeeze(2)
        conv_arrays[name] = a
    path = str(tmp_path / "model.gguf")
    gguf.write_gguf(path, meta, conv_arrays)

    loaded, lcfg, vocab = P.load_model(path)
    assert lcfg.kernel_size == cfg.kernel_size  # inferred from weights, not metadata
    assert vocab[1] == "t1"
    np.testing.assert_array_equal(
        np.asarray(loaded.joint.enc_w), arrays["joint.enc.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(loaded.layers.conv_dw_w[1]),
        arrays["encoder.layers.1.conv.depthwise_conv.weight"].squeeze(1).T)
    np.testing.assert_array_equal(
        np.asarray(loaded.subsampling.conv0_w),
        arrays["encoder.pre_encode.conv.0.weight"].transpose(2, 3, 1, 0))


def test_params_roundtrip_through_save_model(model_setup, tmp_path):
    """params -> save_model -> load_model reproduces every leaf exactly
    (the export half of a train->deploy loop)."""
    import jax

    from nemotron_tpu import params as params_mod

    _, params, cfg = model_setup
    path = str(tmp_path / "rt.gguf")
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    params_mod.save_model(path, params, cfg, vocab=vocab)

    loaded, lcfg, lvocab = params_mod.load_model(path)
    assert lcfg == cfg and lvocab[:3] == ["t0", "t1", "t2"]
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=str(pa))


def test_native_mmap_loader_matches_python(model_setup, tmp_path):
    """Zero-copy native loader returns byte-identical tensors to the pure
    Python reader (f32 and quantized payloads)."""
    from nemotron_tpu import gguf, gguf_native
    from conftest import write_tiny_gguf
    from nemotron_tpu.ops import quant

    if not gguf_native.available():
        pytest.skip("native gguf loader not built")

    arrays, _, cfg = model_setup
    qnames = {n: gguf.GGML_Q8_0 for n in arrays
              if quant.should_quantize(
                  n, arrays[n] if arrays[n].ndim != 3 else arrays[n].squeeze())}
    path = str(tmp_path / "n.gguf")
    write_tiny_gguf(path, arrays, cfg, quantize=qnames)

    gp = gguf.read_gguf(path, use_native=False)
    gn = gguf.read_gguf(path, use_native=True)
    assert gn._native is not None and gp._native is None
    assert set(gp.tensors) == set(gn.tensors)
    assert gp.metadata["nemo.d_model"] == gn.metadata["nemo.d_model"]
    for name in gp.tensors:
        a, b = gp.tensors[name], gn.tensors[name]
        assert a.shape == b.shape and a.ggml_type == b.ggml_type
        assert bytes(a.raw) == bytes(np.asarray(b.raw).tobytes())
        np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


@pytest.mark.parametrize("corruption", ["magic", "counts", "truncated"])
def test_malformed_gguf_rejected(model_setup, tmp_path, corruption):
    """Malformed model files raise clean ValueErrors instead of hanging or
    allocating absurd amounts (the loaders parse untrusted files)."""
    from nemotron_tpu import gguf
    from conftest import write_tiny_gguf

    arrays, _, cfg = model_setup
    path = str(tmp_path / "bad.gguf")
    write_tiny_gguf(path, arrays, cfg)
    data = bytearray(open(path, "rb").read())
    if corruption == "magic":
        data[:4] = b"JUNK"
    elif corruption == "counts":
        data[8:16] = (2 ** 40).to_bytes(8, "little")
    elif corruption == "truncated":
        data = data[: len(data) // 2]
    open(path, "wb").write(bytes(data))
    with pytest.raises((ValueError, struct.error)):
        gguf.read_gguf(path, use_native=False)


def test_save_model_vocab_byte_truncation(model_setup, tmp_path):
    """Over-long vocab tokens are truncated by UTF-8 byte length (never
    mid-codepoint) with a warning, instead of corrupting multibyte tokens or
    crashing in encode_vocab."""
    from nemotron_tpu import params as P

    _, params, cfg = model_setup
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    vocab[1] = "verylongtoken"          # 13 ascii bytes -> 7
    vocab[2] = "日本語語"  # 4 CJK chars = 12 bytes -> 2 chars
    path = str(tmp_path / "trunc.gguf")
    with pytest.warns(UserWarning):
        P.save_model(path, params, cfg, vocab=vocab)

    gf = gguf.read_gguf(path)
    got = gguf.decode_vocab(gf.metadata["tokenizer.vocab"], cfg.vocab_size)
    assert got[1] == "verylon"
    assert got[2] == "日本"
    assert got[3] == vocab[3]
