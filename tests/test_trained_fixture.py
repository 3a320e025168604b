"""Quality gate over the committed trained model (weights/tones_tiny.gguf).

This is the serving-grade tones model behind the trained-weights accuracy
evidence (docs/PERFORMANCE.md, docs/agree_trained.json): trained with
`scripts/train.py --random --config tiny --task tones --tones 16
--utt-tones 16 --utt-tones-min 4 --history-max 192 --steps 3000` to val
TER 0.2%. Committing it makes the accuracy claims reproducible without an
hour of TPU retraining: `scripts/token_agreement.py --gguf
weights/tones_tiny.gguf --tones 16 ...` re-derives the table.

The gates here are cheap CI versions: the model must actually transcribe
a continuous tone stream (real TER, not just run), and the quantized
serving configs must track f32 on it.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GGUF = os.path.join(os.path.dirname(__file__), "..", "weights",
                    "tones_tiny.gguf")


def levenshtein(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def trained():
    if not os.path.exists(GGUF):
        pytest.skip("trained fixture not present")
    from nemotron_tpu.params import load_model

    return load_model(GGUF, keep_quantized=False)


def _decode(params, cfg, audio, dtype=jnp.float32, kv_int8=False):
    import dataclasses

    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import cast_params
    from nemotron_tpu.streaming.session import StreamSession

    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
    if kv_int8:
        cc = dataclasses.replace(cc, kv_cache_int8=True)
    sess = StreamSession(cast_params(params, dtype), cfg, None, cc,
                         n_streams=audio.shape[0], compute_dtype=dtype)
    sess.process(audio)
    sess.finalize()
    return [[t for t, _ in sess.get_tokens(s)]
            for s in range(audio.shape[0])]


def test_trained_model_transcribes(trained):
    """Real TER on a continuous 15 s tone stream must be < 10% (the full
    60 s x 8-run harness measured 0.75-0.90%; this is the cheap CI gate)."""
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, _ = trained
    audio, truths = tones_mod.make_eval_streams(2, 15.0, 16, seed=123)
    got = _decode(params, cfg, audio)
    total = sum(len(t) for t in truths)
    dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
    assert total > 10
    assert dist / total < 0.10, (dist, total, got, truths)


def test_trained_model_quantized_configs_agree(trained):
    """w8a8 (+int8 KV) must track the f32 decode on trained weights --
    the in-CI version of the trained-weights agreement table."""
    from nemotron_tpu.params import quantize_model_params
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, _ = trained
    audio, _ = tones_mod.make_eval_streams(2, 15.0, 16, seed=321)
    ref = _decode(params, cfg, audio)
    n_ref = sum(len(r) for r in ref)
    assert n_ref > 10
    w8a8 = quantize_model_params(params, mode="w8a8")
    for kv8 in (False, True):
        got = _decode(w8a8, cfg, audio, dtype=jnp.bfloat16, kv_int8=kv8)
        dist = sum(levenshtein(g, r) for g, r in zip(got, ref))
        assert dist / n_ref < 0.05, (kv8, dist, n_ref)


SIL_GGUF = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "tones_tiny_sil.gguf")


@pytest.fixture(scope="module")
def trained_sil():
    if not os.path.exists(SIL_GGUF):
        pytest.skip("silence-robust fixture not present")
    from nemotron_tpu.params import load_model

    return load_model(SIL_GGUF, keep_quantized=False)


def test_sil_model_transcribes(trained_sil):
    """The silence-augmented fixture (tiny recipe + --long-gap-prob 0.3)
    still transcribes continuous tone streams at serving grade."""
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, _ = trained_sil
    audio, truths = tones_mod.make_eval_streams(2, 15.0, 16, seed=123)
    got = _decode(params, cfg, audio)
    total = sum(len(t) for t in truths)
    dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
    assert total > 10
    assert dist / total < 0.10, (dist, total)


def test_sil_model_silence_stays_silent(trained_sil):
    """The property the base fixture lacks (it degenerates into a token
    loop on quiet): 5 s of noise-floor silence emits NOTHING, before and
    after a tone utterance."""
    import numpy as np

    from nemotron_tpu.utils.tones import SAMPLE_RATE, render_tones

    params, cfg, _ = trained_sil
    rng = np.random.default_rng(3)
    utt = render_tones(np.array([4, 9, 1]), np.full(3, 0.25), rng, 16,
                       int(0.9 * SAMPLE_RATE), gaps=np.full(3, 0.05))
    silence = render_tones(np.array([], np.int64), np.zeros(0), rng, 16,
                           int(5.0 * SAMPLE_RATE))
    audio = np.concatenate([silence, utt, silence])[None]
    got = _decode(params, cfg, audio)[0]
    # everything emitted must belong to the single 3-tone utterance
    assert 1 <= len(got) <= 4, got


HYBRID_GGUF = os.path.join(os.path.dirname(__file__), "..", "weights",
                           "tones_tiny_hybrid.gguf")


@pytest.fixture(scope="module")
def trained_hybrid():
    if not os.path.exists(HYBRID_GGUF):
        pytest.skip("hybrid fixture not present")
    from nemotron_tpu.params import load_model

    return load_model(HYBRID_GGUF, keep_quantized=False)


TDT_GGUF = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "tones_tiny_tdt.gguf")


def test_tdt_model_streaming_transcribes():
    """Streaming decode of the committed TDT fixture (tiny recipe +
    --tdt-durations 0,1,2,3,4): TER < 10% on continuous tone streams.
    The full 60 s x 8-run harness measured 0.21% TER
    (docs/tdt_quality.json); this is the cheap CI gate, and the only
    in-CI exercise of the TDT decode path on trained weights."""
    if not os.path.exists(TDT_GGUF):
        pytest.skip("TDT fixture not present")
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.params import load_model
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, _ = load_model(TDT_GGUF, keep_quantized=False)
    assert cfg.tdt_durations, "fixture must carry nemo.tdt_durations"
    audio, truths = tones_mod.make_eval_streams(2, 15.0, 16, seed=123)
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
    sess = StreamSession(params, cfg, None, cc, n_streams=audio.shape[0])
    sess.process(audio)
    sess.finalize()
    got = [[t for t, _ in sess.get_tokens(s)]
           for s in range(audio.shape[0])]
    total = sum(len(t) for t in truths)
    dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
    assert total > 10
    assert dist / total < 0.10, (dist, total, got, truths)


def test_hybrid_model_streaming_ctc_transcribes(trained_hybrid):
    """Streaming CTC decode of the committed dual-head fixture (tiny
    recipe + --ctc-weight 0.3): TER < 10% on continuous tone streams.
    The full 60 s x 8-run harness measured the CTC head at 0.27% TER
    (docs/hybrid_quality.json); this is the cheap CI gate, and the only
    in-CI exercise of ctc=True on trained (non-random) weights."""
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils import tones as tones_mod

    params, cfg, _ = trained_hybrid
    audio, truths = tones_mod.make_eval_streams(2, 15.0, 16, seed=123)
    cc = CacheConfig(att_right_context=13, n_mels=cfg.n_mels)
    sess = StreamSession(params, cfg, None, cc, n_streams=audio.shape[0],
                         ctc=True)
    sess.process(audio)
    sess.finalize()
    got = [[t for t, _ in sess.get_tokens(s)]
           for s in range(audio.shape[0])]
    total = sum(len(t) for t in truths)
    dist = sum(levenshtein(g, t) for g, t in zip(got, truths))
    assert total > 10
    assert dist / total < 0.10, (dist, total, got, truths)
