"""Mel-frontend tests: streaming-vs-oracle parity, chunked-vs-whole
consistency, residue/carry-over semantics (counterpart of reference
tests/test_preprocessor.cpp)."""

import numpy as np
import pytest

from nemotron_tpu.config import PreprocessorConfig
from nemotron_tpu.frontend.preprocessor import (
    StreamingPreprocessor,
    hann_window,
    mel_filterbank_slaney,
)
from nemotron_tpu.oracle import OraclePreprocessor


@pytest.fixture(scope="module")
def fb_win():
    fb = mel_filterbank_slaney()
    win = hann_window(400)
    return fb, win


def synth_audio(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return (x * 32767).astype(np.int16)


def test_matches_oracle_single_shot(fb_win):
    fb, win = fb_win
    audio = synth_audio(16000)
    want = OraclePreprocessor(fb, win).process(audio)
    got = StreamingPreprocessor(fb, win).process(audio)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_matches_oracle_chunked(fb_win):
    """Chunked streaming must equal one-shot processing exactly (same framing
    decisions, same residue math as reference src/preprocessor.cpp:388-394)."""
    fb, win = fb_win
    audio = synth_audio(16000 * 2, seed=1)
    oracle = OraclePreprocessor(fb, win)
    sp = StreamingPreprocessor(fb, win)

    chunks = [audio[i : i + 2720] for i in range(0, len(audio), 2720)]
    got_parts, want_parts = [], []
    for ch in chunks:
        want_parts.append(oracle.process(ch))
        got_parts.append(sp.process(ch)[0])
    got = np.concatenate(got_parts)
    want = np.concatenate(want_parts)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)

    # chunked == one-shot for the streaming implementation itself
    sp2 = StreamingPreprocessor(fb, win)
    whole = sp2.process(audio)[0]
    np.testing.assert_allclose(got, whole, atol=1e-5)


def test_frame_count_formula(fb_win):
    """First call: (256 + N - 512)//160 + 1 frames; steady state N//160."""
    fb, win = fb_win
    cfg = PreprocessorConfig()
    sp = StreamingPreprocessor(fb, win, cfg=cfg)
    N = 17 * 160
    m1 = sp.process(synth_audio(N))
    assert m1.shape[1] == (cfg.initial_pad + N - cfg.n_fft) // 160 + 1 == 16
    m2 = sp.process(synth_audio(N, seed=2))
    assert m2.shape[1] == 17


def test_small_input_buffers(fb_win):
    fb, win = fb_win
    sp = StreamingPreprocessor(fb, win)
    out = sp.process(synth_audio(100))
    assert out.shape[1] == 0
    out = sp.process(synth_audio(400))
    assert out.shape[1] >= 1  # 256 + 500 samples available


def test_multistream_batched(fb_win):
    fb, win = fb_win
    a = np.stack([synth_audio(4800, seed=s) for s in range(3)])
    sp = StreamingPreprocessor(fb, win, n_streams=3)
    batched = sp.process(a)
    for s in range(3):
        solo = StreamingPreprocessor(fb, win).process(a[s])[0]
        np.testing.assert_allclose(batched[s], solo, atol=1e-6)


def test_preemphasis_carry(fb_win):
    """Splitting audio mid-sample must not change pre-emphasis (last_sample
    carry, reference src/preprocessor.cpp:349-356)."""
    fb, win = fb_win
    audio = synth_audio(8000, seed=3)
    one = StreamingPreprocessor(fb, win).process(audio)[0]
    sp = StreamingPreprocessor(fb, win)
    parts = [sp.process(audio[:3333])[0], sp.process(audio[3333:])[0]]
    np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)


def test_device_spectral_path(fb_win):
    """The jitted rFFT+matmul mel path (used when the native frontend is not
    built) matches the oracle too."""
    fb, win = fb_win
    audio = synth_audio(8000, seed=9)
    want = OraclePreprocessor(fb, win).process(audio)
    sp = StreamingPreprocessor(fb, win, backend="numpy", device=True)
    assert sp._native is None
    got = sp.process(audio)[0]
    np.testing.assert_allclose(got, want, atol=2e-4)
