"""Hybrid RNNT-CTC auxiliary head (model-family widening; the reference
decodes RNN-T only, src/nemo-ggml.cpp:1109-1429, while NeMo cache-aware
checkpoints frequently ship hybrid heads)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from nemotron_tpu import params as params_mod
from nemotron_tpu.models import ctc as ctc_mod


@pytest.fixture(scope="module")
def hybrid_setup():
    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0, ctc_head=True)
    params = params_mod.params_from_arrays(arrays, cfg)
    return arrays, params, cfg


def test_collapse_oracle():
    """collapse() == an independently written per-step simulation of the
    CTC greedy rule on random frame sequences (repeats, blanks, edges)."""
    rng = np.random.default_rng(0)
    blank = 7
    for _ in range(50):
        T = int(rng.integers(0, 20))
        ids = rng.integers(0, 8, T)

        want, prev = [], None
        for x in ids:
            if x != prev and x != blank:
                want.append(int(x))
            prev = x
        assert ctc_mod.collapse(ids, blank) == want

    # length masking
    ids = np.array([1, 1, 7, 2, 3, 3])
    assert ctc_mod.collapse(ids, 7, length=4) == [1, 2]
    assert ctc_mod.collapse(np.zeros(0, np.int64), 7) == []


def test_ctc_greedy_decode_functional(hybrid_setup):
    """A crafted head (per-frame bias schedule) decodes to the exactly
    predictable collapsed sequence."""
    import dataclasses

    _, params, cfg = hybrid_setup
    B, T, D = 2, 6, cfg.d_model
    enc = jnp.zeros((B, T, D), jnp.float32)   # zero enc: bias decides
    # bias favors token 3 -> argmax 3 on every frame -> collapses to [3]
    bias = np.zeros(cfg.vocab_size, np.float32)
    bias[3] = 5.0
    p = dataclasses.replace(
        params, ctc=dataclasses.replace(
            params.ctc, out_b=jnp.asarray(bias)))
    got = ctc_mod.ctc_greedy_decode(p, cfg, enc)
    assert got == [[3], [3]]
    # blank-dominant bias -> empty
    bias2 = np.zeros(cfg.vocab_size, np.float32)
    bias2[cfg.blank_token] = 5.0
    p2 = dataclasses.replace(
        params, ctc=dataclasses.replace(
            params.ctc, out_b=jnp.asarray(bias2)))
    assert ctc_mod.ctc_greedy_decode(p2, cfg, enc) == [[], []]
    # enc_lengths masking: second stream sees 0 frames
    got = ctc_mod.ctc_greedy_decode(p, cfg, enc,
                                    enc_lengths=np.array([6, 0]))
    assert got == [[3], []]


def test_ctc_head_gguf_roundtrip(hybrid_setup, tmp_path):
    """save_model/load_model round-trips the hybrid head exactly; models
    without the head load with ctc=None."""
    _, params, cfg = hybrid_setup
    path = str(tmp_path / "hybrid.gguf")
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    params_mod.save_model(path, params, cfg, vocab=vocab)
    loaded, lcfg, _ = params_mod.load_model(path, keep_quantized=False)
    assert loaded.ctc is not None
    np.testing.assert_allclose(np.asarray(loaded.ctc.out_w),
                               np.asarray(params.ctc.out_w), atol=0)
    np.testing.assert_allclose(np.asarray(loaded.ctc.out_b),
                               np.asarray(params.ctc.out_b), atol=0)

    plain = params_mod.random_weight_arrays(cfg, seed=1)
    p2 = params_mod.params_from_arrays(plain, cfg)
    assert p2.ctc is None


def test_hybrid_train_step_decreases_loss(hybrid_setup):
    """make_train_step(ctc_weight=0.3): the combined rnnt+ctc loss
    decreases on the synthetic memorization batch, and the ctc head
    actually receives gradient (weights move)."""
    import optax

    from nemotron_tpu.training import make_train_step
    from scripts.train import synthetic_batch

    _, params, cfg = hybrid_setup
    batch = synthetic_batch(cfg, 4)
    opt = optax.adamw(3e-3)
    step = make_train_step(cfg, opt, ctc_weight=0.3)
    opt_state = opt.init(params)
    head0 = np.asarray(params.ctc.out_w).copy()
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.abs(np.asarray(params.ctc.out_w) - head0).max() > 0


def test_transcribe_batch_ctc(hybrid_setup, tmp_path):
    """transcribe_batch(ctc=True) end-to-end (audio -> CTC text), and the
    validation paths (no head; incompatible flags) raise cleanly."""
    import dataclasses

    from nemotron_tpu.streaming.session import transcribe_batch

    _, params, cfg = hybrid_setup
    rng = np.random.default_rng(0)
    fb = np.abs(rng.standard_normal((cfg.n_mels, 257))).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    audio = (rng.standard_normal(8000) * 3000).astype(np.int16)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    bias = np.zeros(cfg.vocab_size, np.float32)
    bias[5] = 50.0                       # every frame argmax 5 -> "t5"
    p = dataclasses.replace(
        params, ctc=dataclasses.replace(
            params.ctc, out_b=jnp.asarray(bias)))
    text = transcribe_batch(p, cfg, vocab, audio, filterbank=fb,
                            window=win, ctc=True)
    assert text == "t5"
    texts = transcribe_batch(p, cfg, vocab, [audio, audio], filterbank=fb,
                             window=win, ctc=True)
    assert texts == ["t5", "t5"]

    no_head = dataclasses.replace(params, ctc=None)
    with pytest.raises(ValueError, match="no CTC head"):
        transcribe_batch(no_head, cfg, vocab, audio, filterbank=fb,
                         window=win, ctc=True)
    with pytest.raises(ValueError, match="plain greedy"):
        transcribe_batch(p, cfg, vocab, audio, filterbank=fb,
                         window=win, ctc=True, beam_size=2)
