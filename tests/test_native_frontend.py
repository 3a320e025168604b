"""Native (C++) frontend differential tests against the numpy oracle.

The native path reimplements the reference's radix-2 f32 FFT DSP
(reference src/preprocessor.cpp); gate vs the f64 numpy oracle is loose
(2e-4 on log-mel, same as the python streaming path's gate)."""

import numpy as np
import pytest

from nemotron_tpu.frontend.preprocessor import (
    StreamingPreprocessor, hann_window, mel_filterbank_slaney)
from nemotron_tpu.frontend import native
from nemotron_tpu.oracle import OraclePreprocessor

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native frontend not built")


@pytest.fixture(scope="module")
def fb_win():
    return mel_filterbank_slaney(), hann_window(400)


def synth(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return (x * 32767).astype(np.int16)


def make_native(fb, win, n_streams=1):
    from nemotron_tpu.frontend.preprocessor import pad_window

    return native.NativeFrontend(fb, pad_window(win, 512),
                                 n_streams=n_streams)


def test_matches_oracle(fb_win):
    fb, win = fb_win
    audio = synth(16000)
    want = OraclePreprocessor(fb, win).process(audio)
    got = make_native(fb, win).process(audio)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_chunked_equals_oneshot(fb_win):
    fb, win = fb_win
    audio = synth(32000, seed=1)
    whole = make_native(fb, win).process(audio)[0]
    nf = make_native(fb, win)
    parts = [nf.process(audio[i:i + 2720])[0]
             for i in range(0, len(audio), 2720)]
    np.testing.assert_allclose(np.concatenate(parts), whole, atol=0)


def test_frame_count_and_reset(fb_win):
    fb, win = fb_win
    nf = make_native(fb, win)
    N = 17 * 160
    m1 = nf.process(synth(N))
    assert m1.shape[1] == (256 + N - 512) // 160 + 1 == 16
    m2 = nf.process(synth(N, seed=2))
    assert m2.shape[1] == 17
    nf.reset()
    m3 = nf.process(synth(N))
    np.testing.assert_array_equal(m1, m3)


def test_multistream_per_stream_reset(fb_win):
    """Resetting one stream mid-session == that stream having heard silence,
    while the other streams' state is untouched."""
    fb, win = fb_win
    a = np.stack([synth(4800, seed=s) for s in range(3)])
    nf = make_native(fb, win, n_streams=3)
    first = nf.process(a)
    nf.reset(1)
    second = nf.process(a)

    # reference: a frontend that heard silence in round 1, then a[1]
    ref = make_native(fb, win, n_streams=3)
    ref.process(np.zeros_like(a))
    ref_second = ref.process(a)
    np.testing.assert_array_equal(second[1], ref_second[1])
    # streams 0 and 2 were not disturbed by the reset: same as a frontend
    # that never reset
    undisturbed = make_native(fb, win, n_streams=3)
    undisturbed.process(a)
    expect = undisturbed.process(a)
    np.testing.assert_array_equal(second[0], expect[0])
    np.testing.assert_array_equal(second[2], expect[2])
    assert not np.array_equal(second[1], first[1])


def test_streaming_preprocessor_uses_native(fb_win):
    fb, win = fb_win
    sp = StreamingPreprocessor(fb, win, backend="native")
    assert sp._native is not None
    audio = synth(8000, seed=3)
    got = sp.process(audio)[0]
    want = OraclePreprocessor(fb, win).process(audio)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_numpy_backend_forced(fb_win):
    fb, win = fb_win
    sp = StreamingPreprocessor(fb, win, backend="numpy", device=False)
    assert sp._native is None
    audio = synth(8000, seed=4)
    got = sp.process(audio)[0]
    want = OraclePreprocessor(fb, win).process(audio)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ragged_matches_per_slot(fb_win):
    """One multi-slot ragged frontend == independent 1-stream frontends fed
    the same per-slot schedules (arbitrary rates, mid-session resets,
    per-slot state snapshot round-trip)."""
    fb, win = fb_win
    S = 5
    rng = np.random.default_rng(3)
    ragged = make_native(fb, win, n_streams=S)
    solos = [make_native(fb, win, n_streams=1) for _ in range(S)]
    for s in range(S):
        ragged.reset_fresh(s)

    got = [[] for _ in range(S)]
    want = [[] for _ in range(S)]
    for tick in range(12):
        fed = {}
        for s in range(S):
            if rng.random() < 0.3:
                continue  # slot skips this tick (ragged rates)
            n = int(rng.integers(40, 2000))
            fed[s] = synth(n, seed=100 * tick + s)
        mels = ragged.process_ragged(fed)
        for s, audio in fed.items():
            want_mel = solos[s].process(audio[None])[0]
            got_mel = mels[s]
            assert got_mel.shape == want_mel.shape
            np.testing.assert_array_equal(got_mel, want_mel)
            got[s].append(got_mel)
            want[s].append(want_mel)
        if tick == 5:
            # mid-session fresh reset of one slot mirrors a new solo
            ragged.reset_fresh(2)
            solos[2] = make_native(fb, win, n_streams=1)

    # per-slot state snapshot round-trips bit-exactly
    for s in range(S):
        st = ragged.slot_state_dict(s)
        ragged.load_slot_state_dict(s, st)
        st2 = ragged.slot_state_dict(s)
        np.testing.assert_array_equal(st["residue"], st2["residue"])
        np.testing.assert_array_equal(st["last_sample"], st2["last_sample"])
    # and transplanting a solo's state into the ragged slot keeps outputs
    # identical on the next feed
    ragged.load_slot_state_dict(1, solos[1].state_dict())
    audio = synth(1777, seed=999)
    np.testing.assert_array_equal(
        ragged.process_ragged({1: audio})[1],
        solos[1].process(audio[None])[0])


def test_global_reset_equals_fresh(fb_win):
    """Regression: a global reset() mid-session must restore CONSTRUCTION
    state. The per-stream reset keeps the shared steady-state residue
    length (lockstep invariant), but the old global path routed through it
    and inherited that length from not-yet-reset peers -- 2 extra frames
    on the next process() vs a fresh frontend."""
    fb, win = fb_win
    audio = np.stack([synth(11600, seed=3), synth(11600, seed=4)])

    fe = make_native(fb, win, n_streams=2)
    first = fe.process(audio)
    fe.reset()
    again = fe.process(audio)
    assert again.shape == first.shape
    np.testing.assert_allclose(again, first, atol=0, rtol=0)
