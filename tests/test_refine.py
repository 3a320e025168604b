"""Two-pass serving: segment-audio capture in the ServingEngine and the
offline per-utterance beam refiner (streaming/refine.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.streaming.refine import SegmentRefiner
from nemotron_tpu.streaming.serving import ServingEngine, _SegmentBuffer

SIL_GGUF = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "tones_tiny_sil.gguf")


@pytest.fixture()
def cc(model_setup):
    _, _, cfg = model_setup
    return CacheConfig(att_right_context=1, att_left_context=12,
                       n_mels=cfg.n_mels)


def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)


def test_segment_buffer_unit():
    sb = _SegmentBuffer(cap=1000)
    a, b = synth(300, 1), synth(400, 2)
    sb.append(a)
    sb.append(b)
    assert sb.total == 700 and sb.abs0 == 0
    seg = sb.cut(500)     # absolute cut mid-buffer
    np.testing.assert_array_equal(seg, np.concatenate([a, b])[:500])
    assert sb.abs0 == 500 and sb.total == 200
    # cap overflow drops the OLDEST audio and marks truncation
    sb.append(synth(2000, 3))
    assert sb.total == 1000 and sb.truncated
    assert sb.abs0 == 500 + 200 + 2000 - 1000
    # cut before abs0 returns empty (already-dropped audio)
    assert sb.cut(sb.abs0 - 10).size == 0
    assert not sb.truncated   # cut() starts a fresh segment


def test_segment_capture_cut_exact(model_setup, cc):
    """Driven directly (no model behavior in the loop): the segment cut
    lands exactly at the endpointer's processed-frame boundary, and
    buffered-but-unprocessed audio stays for the next utterance."""
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=2,
                        compute_dtype=jnp.float32,
                        endpoint_silence_s=0.8, keep_segment_audio=True)
    s = eng.add_stream()
    spf = eng._seg_spf   # samples per encoder frame (1280 at defaults)

    audio = synth(40 * spf, 9)
    eng.feed_audio({s: audio})

    # utterance 1: token at frame 2, then 28 processed frames of silence
    eng.tokens[s] = [(7, 2)]
    eng.frame_offsets[s] = 30
    eng._ep_update({s: [(7, 2)]}, np.array([s]), 30)
    eng.frame_offsets[s] = 30   # already advanced above
    evs = eng.poll_endpoints(with_audio=True)
    assert len(evs) == 1
    slot, text, toks, seg = evs[0]
    assert slot == s and toks == [(7, 2)]
    np.testing.assert_array_equal(seg, audio[: 30 * spf])

    # utterance 2 fires later: its segment starts EXACTLY at the cut
    eng.tokens[s].append((5, 33))
    eng.frame_offsets[s] = 40
    eng._ep_update({s: [(5, 33)]}, np.array([s]), 10)
    eng.frame_offsets[s] = 52
    eng._ep_update({}, np.array([s]), 12)
    evs = eng.poll_endpoints(with_audio=True)
    assert len(evs) == 1
    _s2, _t2, toks2, seg2 = evs[0]
    assert toks2 == [(5, 33)]
    # only 40*spf samples were ever fed; the cut at frame 52 clips
    np.testing.assert_array_equal(seg2, audio[30 * spf:])

    # eviction resets the retention buffer
    eng.remove_stream(s)
    assert eng.seg_buffers[s].total == 0 and eng.seg_buffers[s].abs0 == 0


def test_validation(model_setup, cc):
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    with pytest.raises(ValueError, match="endpointing"):
        ServingEngine(params, cfg, vocab, cc, n_slots=1,
                      keep_segment_audio=True)
    eng = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                        compute_dtype=jnp.float32, endpoint_silence_s=0.5)
    with pytest.raises(ValueError, match="keep_segment_audio"):
        eng.poll_endpoints(with_audio=True)
    with pytest.raises(ValueError, match="beam_size"):
        SegmentRefiner(params, cfg, vocab, beam_size=1)


def test_segment_snapshot_roundtrip(model_setup, cc, tmp_path):
    """save/load preserves the per-slot retention buffers and pending
    segment audio."""
    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]

    def make():
        return ServingEngine(params, cfg, vocab, cc, n_slots=2,
                             compute_dtype=jnp.float32,
                             endpoint_silence_s=0.8,
                             keep_segment_audio=True)

    eng = make()
    s = eng.add_stream()
    audio = synth(20 * eng._seg_spf, 4)
    eng.feed_audio({s: audio})
    # leave one FIRED-but-unpolled event carrying segment audio
    eng.tokens[s] = [(3, 1)]
    eng.frame_offsets[s] = 15
    eng._ep_update({s: [(3, 1)]}, np.array([s]), 15)
    eng.frame_offsets[s] = 30
    eng._ep_update({}, np.array([s]), 15)
    assert len(eng._ep_pending) == 1 and eng._ep_pending[0][2] is not None

    p = str(tmp_path / "seg.npz")
    eng.save(p)
    eng2 = make()
    eng2.load(p)
    np.testing.assert_array_equal(eng2.seg_buffers[s].compact(),
                                  eng.seg_buffers[s].compact())
    assert eng2.seg_buffers[s].abs0 == eng.seg_buffers[s].abs0
    evs, evs2 = eng.poll_endpoints(True), eng2.poll_endpoints(True)
    assert evs[0][:3] == evs2[0][:3]
    np.testing.assert_array_equal(evs[0][3], evs2[0][3])


def test_refine_bucketing_exact(model_setup):
    """Shape bucketing (batch padded to a power of two with silence rows,
    mel time padded via min_mel_frames) must be output-EXACT: refining a
    ragged batch equals refining each segment alone (batch rows never
    interact; time padding is masked via enc_lengths)."""
    from nemotron_tpu.streaming.refine import SegmentRefiner

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    refiner = SegmentRefiner(params, cfg, vocab, beam_size=2,
                             compute_dtype=np.float32)
    segs = [synth(4000, 1), synth(9000, 2), synth(21000, 3)]
    batched = refiner.refine(segs)          # 3 -> batch bucket 4
    assert len(batched) == 3
    solo = [refiner.refine([s])[0] for s in segs]
    assert batched == solo


def test_refiner_end_to_end():
    """Online greedy + endpointing segments two tone utterances; the
    refiner's batched beam re-decode of the captured segments reproduces
    each utterance (trained silence-robust fixture)."""
    if not os.path.exists(SIL_GGUF):
        pytest.skip("silence-robust trained fixture not present")
    from nemotron_tpu.params import load_model
    from nemotron_tpu.utils.tones import SAMPLE_RATE, render_tones

    params, cfg, vocab = load_model(SIL_GGUF, keep_quantized=False)
    cc13 = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
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

    eng = ServingEngine(params, cfg, vocab, cc13, n_slots=2,
                        compute_dtype=jnp.float32, endpoint_silence_s=1.0,
                        endpoint_reset=True, keep_segment_audio=True)
    refiner = SegmentRefiner(params, cfg, vocab, beam_size=2,
                             compute_dtype=jnp.float32)
    s = eng.add_stream()
    n = cc13.shift_samples
    refined = []
    for t in range(len(audio) // n):
        eng.feed_audio({s: audio[t * n:(t + 1) * n]})
        eng.step()
        refined.extend(refiner.drain(eng))

    assert len(refined) == 2, refined

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    def labels_of(text):
        return [int(w[1:]) for w in text.replace("▁", " ").split()
                if w[1:].isdigit()]

    for (slot, online, rtext, _toks), truth in zip(refined,
                                                   [truth1, truth2]):
        assert slot == s
        assert lev(labels_of(rtext), truth) <= 1, (rtext, truth)
        # the refined text re-decodes the SEGMENT only: it must not leak
        # the other utterance's tokens
        assert len(labels_of(rtext)) <= len(truth) + 1
