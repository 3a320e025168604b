"""Dump-format tracing + session checkpoint/resume tests (SURVEY.md §5)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.streaming.session import StreamSession
from nemotron_tpu.utils.dump import append_dump, compare, read_dump


def synth(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return (x * 32767).astype(np.int16)


def test_dump_roundtrip(tmp_path, rng):
    p = str(tmp_path / "x.bin")
    a = rng.standard_normal((3, 4, 5)).astype(np.float32)
    append_dump(p, a)
    got = read_dump(p)
    np.testing.assert_array_equal(got, a)
    # append grows the leading axis
    b = rng.standard_normal((2, 4, 5)).astype(np.float32)
    append_dump(p, b)
    got = read_dump(p)
    assert got.shape == (5, 4, 5)
    np.testing.assert_array_equal(got, np.concatenate([a, b]))
    # incompatible trailing shape rejected
    with pytest.raises(ValueError):
        append_dump(p, rng.standard_normal((2, 4, 6)).astype(np.float32))


def test_dump_header_is_reference_format(tmp_path, rng):
    """32-byte header of 4 little-endian int64 = reversed shape padded with
    1s (reference scripts/compare_tensors.py:20-30)."""
    import struct

    p = str(tmp_path / "h.bin")
    a = rng.standard_normal((7, 128)).astype(np.float32)
    append_dump(p, a)
    raw = open(p, "rb").read()
    assert struct.unpack("<4q", raw[:32]) == (128, 7, 1, 1)
    np.testing.assert_array_equal(
        np.frombuffer(raw[32:], np.float32).reshape(7, 128), a)


def test_compare_stats():
    a = np.zeros(100, np.float32)
    b = a.copy()
    b[0] = 1e-3
    s = compare(a, b)
    assert s["max_abs"] == pytest.approx(1e-3)
    assert s["exact_frac"] == pytest.approx(0.99)


def _make_session(cfg, params, n_streams=1, trace_dir=None):
    from nemotron_tpu.frontend.preprocessor import (hann_window,
                                                    mel_filterbank_slaney)

    fb = mel_filterbank_slaney(n_mels=cfg.n_mels)
    win = hann_window(400)
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    return StreamSession(params, cfg, vocab, cc, n_streams=n_streams,
                         filterbank=fb, window=win, trace_dir=trace_dir)


def test_session_snapshot_resume(model_setup, tmp_path):
    """Save mid-stream, keep going; a fresh session restored from the
    snapshot and fed the same remaining audio must produce the identical
    transcript and token timing."""
    _, params, cfg = model_setup
    audio = synth(16000, seed=7)
    a1, a2 = audio[:9000], audio[9000:]

    sess = _make_session(cfg, params)
    sess.process(a1)
    snap = str(tmp_path / "snap.npz")
    sess.save(snap)
    sess.process(a2)
    want_tokens = sess.get_tokens(0)
    want_text = sess.get_transcript(0)

    sess2 = _make_session(cfg, params)
    sess2.load(snap)
    sess2.process(a2)
    assert sess2.get_tokens(0) == want_tokens
    assert sess2.get_transcript(0) == want_text


def test_engine_snapshot_bf16(model_setup, tmp_path):
    """Snapshots taken at the TPU serving dtype (bf16) must load.

    numpy writes ml_dtypes.bfloat16 into .npz as raw '|V2' void bytes
    (dtype metadata lost), so snapshot leaves are upcast-encoded to f32 on
    save (exact: bf16 values are a subset of f32) and cast back on load
    (utils/npz.py). Regression: pre-fix, loading any bf16 snapshot raised
    'No cast function available' — the exact-resume tests all ran f32 and
    missed it."""
    import jax.numpy as jnp

    from nemotron_tpu.streaming.lockstep import LockstepEngine

    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    def make():
        return LockstepEngine(params, cfg, vocab, cc, n_streams=2,
                              compute_dtype=jnp.bfloat16)

    N = cc.shift_samples
    audio = np.stack([synth(N * 4, seed=3), synth(N * 4, seed=4)])
    eng = make()
    for t in range(2):
        eng.tick(audio[:, t * N:(t + 1) * N])
    snap = str(tmp_path / "bf16.npz")
    eng.save(snap)
    eng2 = make()
    eng2.load(snap)
    for t in range(2, 4):
        eng.tick(audio[:, t * N:(t + 1) * N])
        eng2.tick(audio[:, t * N:(t + 1) * N])
    eng.finalize()
    eng2.finalize()
    assert eng2.transcripts == eng.transcripts
    assert eng2.tokens == eng.tokens


def test_traced_session_dumps(model_setup, tmp_path):
    _, params, cfg = model_setup
    d1 = str(tmp_path / "run1")
    sess = _make_session(cfg, params, trace_dir=d1)
    sess.process(synth(8000, seed=3))
    files = sorted(os.listdir(d1))
    assert "mel.bin" in files and "encoder_out.bin" in files
    assert f"layer_{cfg.n_layers - 1:02d}_out.bin" in files

    mel = read_dump(os.path.join(d1, "mel.bin"))
    assert mel.shape[-1] == cfg.n_mels

    # identical second run -> differ reports exact match
    d2 = str(tmp_path / "run2")
    sess2 = _make_session(cfg, params, trace_dir=d2)
    sess2.process(synth(8000, seed=3))
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "compare_tensors.py"),
         d1, d2],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stderr
    assert "exact 100.0%" in out.stdout
