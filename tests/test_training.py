"""RNN-T loss + train step tests (new capability; no reference counterpart).

The loss is validated against a brute-force numpy lattice DP, and the train
step must reduce the loss on a toy memorization task."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nemotron_tpu.losses.rnnt import rnnt_loss


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    """Drop every compiled executable accumulated by the ~230 preceding
    tests before this module's train-step compiles (the largest programs
    in the suite). Without this, the full suite segfaults inside XLA:CPU's
    backend_compile on this module deterministically (observed twice at
    test_train_state_checkpoint_resume after the round-3 test additions;
    the same tests pass standalone and in any sub-suite) -- a cumulative
    native-resource condition in the compiler, not a model bug. Clearing
    the caches costs this module a few recompiles and removes the
    accumulation."""
    jax.clear_caches()
    yield


def numpy_rnnt_loss(logits, labels, T, U, blank):
    """Brute-force forward DP, one sequence."""
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t == 0 and u == 0:
                continue
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + logp[T - 1, U, blank])


@pytest.mark.parametrize("seed,T,U", [(0, 5, 3), (1, 8, 1), (2, 4, 0),
                                      (3, 6, 6)])
def test_rnnt_loss_matches_numpy_dp(rng, seed, T, U):
    r = np.random.default_rng(seed)
    V, blank = 11, 10
    Tmax, Umax = T + 2, max(U + 2, 1)
    logits = r.standard_normal((1, Tmax, Umax + 1, V)).astype(np.float32)
    labels = r.integers(0, V - 1, size=(1, Umax)).astype(np.int32)

    got = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray([T]), jnp.asarray([U]), blank=blank)
    want = numpy_rnnt_loss(logits[0], labels[0], T, U, blank)
    np.testing.assert_allclose(float(got[0]), want, rtol=1e-5, atol=1e-5)


def test_rnnt_loss_batch_padding_independence(rng):
    """Padding beyond the valid lengths must not change the loss."""
    r = np.random.default_rng(7)
    V, blank = 9, 8
    logits = r.standard_normal((2, 7, 5, V)).astype(np.float32)
    labels = r.integers(0, V - 1, size=(2, 4)).astype(np.int32)
    base = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                     jnp.asarray([5, 7]), jnp.asarray([2, 4]), blank=blank)
    # corrupt padding regions
    logits2 = logits.copy()
    logits2[0, 5:] += 100.0
    labels2 = labels.copy()
    labels2[0, 2:] = 0
    pert = rnnt_loss(jnp.asarray(logits2), jnp.asarray(labels2),
                     jnp.asarray([5, 7]), jnp.asarray([2, 4]), blank=blank)
    np.testing.assert_allclose(np.asarray(base), np.asarray(pert),
                               rtol=1e-5, atol=1e-4)


def test_train_step_reduces_loss(model_setup, rng):
    """A few optimizer steps on one fixed batch must reduce the RNN-T loss
    (end-to-end gradients through subsampling, conformer layers, LSTM,
    joint, and the lattice)."""
    optax = pytest.importorskip("optax")

    from nemotron_tpu.training import loss_fn, make_train_step

    _, params, cfg = model_setup
    r = np.random.default_rng(0)
    B, Tm, U = 2, 41, 3
    batch = {
        "mel": jnp.asarray(r.standard_normal((B, Tm, cfg.n_mels)),
                           jnp.float32),
        "labels": jnp.asarray(r.integers(0, cfg.vocab_size - 1, (B, U)),
                              jnp.int32),
        # 41 mel frames -> (41//2+1)//2+1)//2+1 = 6 encoder frames
        "mel_lengths": jnp.asarray([6, 6], jnp.int32),
        "label_lengths": jnp.asarray([U, U - 1], jnp.int32),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    loss0 = float(loss_fn(params, cfg, batch))
    assert np.isfinite(loss0)

    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    loss = None
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
    assert float(loss) < loss0, (float(loss), loss0)
    assert np.isfinite(float(loss))


def test_remat_gradients_match(model_setup):
    """jax.checkpoint on the conformer layers must not change the loss or
    gradients (recompute-in-backward is numerically identical)."""
    from nemotron_tpu.training import loss_fn

    _, params, cfg = model_setup
    r = np.random.default_rng(3)
    batch = {
        "mel": jnp.asarray(r.standard_normal((2, 33, cfg.n_mels)),
                           jnp.float32),
        "labels": jnp.asarray(r.integers(0, cfg.vocab_size - 1, (2, 2)),
                              jnp.int32),
        "mel_lengths": jnp.asarray([5, 5], jnp.int32),
        "label_lengths": jnp.asarray([2, 2], jnp.int32),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, cfg, batch))(params)
    l1, g1 = jax.value_and_grad(
        lambda p: loss_fn(p, cfg, batch, remat=True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                               jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6, err_msg=str(pa))


def test_train_state_checkpoint_resume(model_setup, tmp_path):
    """Interrupt training, checkpoint, resume in a fresh step fn: the
    resumed run must produce the exact losses of an uninterrupted run."""
    optax = pytest.importorskip("optax")

    from nemotron_tpu.training import (load_train_state, make_train_step,
                                       save_train_state)

    _, params, cfg = model_setup
    r = np.random.default_rng(1)
    batch = {
        "mel": jnp.asarray(r.standard_normal((2, 33, cfg.n_mels)),
                           jnp.float32),
        "labels": jnp.asarray(r.integers(0, cfg.vocab_size - 1, (2, 2)),
                              jnp.int32),
        "mel_lengths": jnp.asarray([5, 5], jnp.int32),
        "label_lengths": jnp.asarray([2, 2], jnp.int32),
    }
    opt = optax.adamw(3e-4)

    def fresh():  # train_step donates; each run needs its own buffers
        pr = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)),
                                    params)
        return pr, opt.init(pr)

    # uninterrupted: 4 steps
    p, s = fresh()
    step = make_train_step(cfg, opt)
    losses = []
    for _ in range(4):
        p, s, loss = step(p, s, batch)
        losses.append(float(loss))

    # interrupted at 2, checkpointed, resumed
    p2, s2 = fresh()
    for _ in range(2):
        p2, s2, _ = step(p2, s2, batch)
    ck = str(tmp_path / "train.npz")
    save_train_state(ck, p2, s2, step=2)
    tmpl_p, tmpl_s = fresh()
    p3, s3, n = load_train_state(ck, tmpl_p, tmpl_s)
    assert n == 2
    resumed = []
    step2 = make_train_step(cfg, opt)
    for _ in range(2):
        p3, s3, loss = step2(p3, s3, batch)
        resumed.append(float(loss))
    np.testing.assert_allclose(resumed, losses[2:], rtol=1e-6)


def test_loss_invariant_to_mel_padding(model_setup, rng):
    """Regression (round-1 advice): transducer_logits must thread
    mel_lengths into encode_batch; otherwise batch-mode (bidirectional)
    attention lets valid frames attend to padding and the loss silently
    depends on how much padding the batch carries.

    mel_lengths is chosen conservatively (3 frames for a 25-frame mel) so
    every counted encoder frame is fully determined by valid audio: the
    causal subsampling has a 1-frame lookahead per stage, so the last
    ~2 encoder frames are boundary-affected by construction and excluded."""
    from nemotron_tpu.models.encoder import encode_batch
    from nemotron_tpu.training import loss_fn

    _, params, cfg = model_setup
    B, U, Tm, Tpad = 2, 3, 25, 41
    mel1 = rng.standard_normal((B, Tm, cfg.n_mels)).astype(np.float32)
    mel2 = np.zeros((B, Tpad, cfg.n_mels), np.float32)
    mel2[:, :Tm] = mel1
    labels = rng.integers(0, cfg.vocab_size - 1, (B, U)).astype(np.int32)
    lens = np.full(B, 3, np.int32)

    enc1 = encode_batch(params, cfg, jnp.asarray(mel1),
                        enc_lengths=jnp.asarray(lens))
    enc2 = encode_batch(params, cfg, jnp.asarray(mel2),
                        enc_lengths=jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(enc1)[:, :3],
                               np.asarray(enc2)[:, :3], atol=2e-5)

    def batch(mel):
        return {"mel": jnp.asarray(mel), "labels": jnp.asarray(labels),
                "mel_lengths": jnp.asarray(lens),
                "label_lengths": jnp.full((B,), U, jnp.int32)}

    l1 = float(loss_fn(params, cfg, batch(mel1)))
    l2 = float(loss_fn(params, cfg, batch(mel2)))
    np.testing.assert_allclose(l1, l2, rtol=2e-5)


def test_tones_sampler_fresh_and_deterministic():
    """TonesSampler (the anti-memorization training regime): static shapes
    across steps (jit signature stability), deterministic in (seed, step),
    and actually FRESH -- different steps yield different labels/audio.
    Background: training on a fixed pool collapses into prediction-network
    memorization (the lattice teacher-forces label prefixes), leaving the
    encoder input-independent; fresh data makes the unconditional label
    entropy a floor for any audio-ignoring model."""
    from nemotron_tpu.frontend.preprocessor import mel_filterbank_slaney
    from nemotron_tpu.utils.tones import TonesSampler

    fb = mel_filterbank_slaney(32).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    s1 = TonesSampler(fb, win, n_mels=32, n_tones=8, tones_per_utt=3,
                      batch=2, seed=7, dur_range=(0.10, 0.14))
    s2 = TonesSampler(fb, win, n_mels=32, n_tones=8, tones_per_utt=3,
                      batch=2, seed=7, dur_range=(0.10, 0.14))

    b0, b1 = s1.sample(0), s1.sample(1)
    assert b0["mel"].shape == b1["mel"].shape
    assert b0["labels"].shape == (2, 3)
    assert not np.array_equal(b0["mel"], b1["mel"])

    # deterministic across instances and across repeated calls (the
    # stateful preprocessor must be reset per sample): --resume replays
    # the identical data stream
    b0b = s2.sample(0)
    np.testing.assert_array_equal(b0["labels"], b0b["labels"])
    np.testing.assert_allclose(b0["mel"], b0b["mel"], atol=1e-6)
    b0c = s1.sample(0)
    np.testing.assert_allclose(b0["mel"], b0c["mel"], atol=1e-6)
    np.testing.assert_array_equal(b0["mel_lengths"], b0b["mel_lengths"])


def test_prediction_network_history_warmup(model_setup):
    """Decoder-history warm-up (training.prediction_network history=):
    row u of the output must equal running the plain network over
    [history ++ labels] and reading row R+u -- i.e. the warm-up is exactly
    'the decoder already consumed R labels', nothing else. R=0 / None are
    identical. Why it exists: without it the prediction network learns
    absolute emission count and goes silent after U_max tokens on
    continuous serving streams (measured; see utils/tones.py)."""
    from nemotron_tpu import training as T

    _, params, cfg = model_setup
    rng = np.random.default_rng(3)
    B, U, R = 2, 4, 6
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size - 1, (B, U)),
                         jnp.int32)
    hist = jnp.asarray(rng.integers(0, cfg.vocab_size - 1, (B, R)),
                       jnp.int32)

    out = T.prediction_network(params, cfg, labels, history=hist)
    assert out.shape[1] == U + 1

    # reference: run WITHOUT history over the concatenated sequence
    full = T.prediction_network(params, cfg,
                                jnp.concatenate([hist, labels], axis=1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, R:, :]),
                               atol=1e-6)

    # None == zero-width history
    out0 = T.prediction_network(params, cfg, labels, history=None)
    outz = T.prediction_network(params, cfg, labels,
                                history=jnp.zeros((B, 0), jnp.int32))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(outz))


def test_tones_sampler_history():
    """history_max: R is a multiple of 64 in [0, max], constant within a
    step, deterministic in (seed, step), and hits several distinct values
    across steps (the variability is the point)."""
    from nemotron_tpu.frontend.preprocessor import mel_filterbank_slaney
    from nemotron_tpu.utils.tones import TonesSampler

    fb = mel_filterbank_slaney(32).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    s1 = TonesSampler(fb, win, n_mels=32, n_tones=8, tones_per_utt=3,
                      batch=2, seed=11, dur_range=(0.10, 0.14),
                      history_max=192)
    s2 = TonesSampler(fb, win, n_mels=32, n_tones=8, tones_per_utt=3,
                      batch=2, seed=11, dur_range=(0.10, 0.14),
                      history_max=192)
    widths = set()
    for i in range(12):
        b1, b2 = s1.sample(i), s2.sample(i)
        w = b1.get("history", np.zeros((2, 0))).shape[1]
        assert w % 64 == 0 and w <= 192
        widths.add(w)
        if w:
            np.testing.assert_array_equal(b1["history"], b2["history"])
            assert b1["history"].min() >= 0 and b1["history"].max() < 8
    assert len(widths) >= 3


def test_tones_sampler_long_gaps():
    """Silence augmentation: long_gap_prob draws up to max_long_gaps gaps
    from long_gap_range (audio/mel_lengths grow; labels unchanged),
    stays deterministic in (seed, step), and 0.0 reproduces the base
    sampler exactly."""
    from nemotron_tpu.frontend.preprocessor import mel_filterbank_slaney
    from nemotron_tpu.utils.tones import TonesSampler

    fb = mel_filterbank_slaney(32).astype(np.float32)
    win = np.hanning(400).astype(np.float32)
    kw = dict(n_mels=32, n_tones=8, tones_per_utt=3, batch=4, seed=5,
              dur_range=(0.10, 0.14))
    base = TonesSampler(fb, win, **kw)
    aug1 = TonesSampler(fb, win, long_gap_prob=0.9, **kw)
    aug2 = TonesSampler(fb, win, long_gap_prob=0.9, **kw)
    off = TonesSampler(fb, win, long_gap_prob=0.0, **kw)

    assert aug1.n_samples > base.n_samples
    assert off.n_samples == base.n_samples
    grew = False
    for i in range(4):
        bb, b1, b2 = base.sample(i), aug1.sample(i), aug2.sample(i)
        bo = off.sample(i)
        np.testing.assert_array_equal(b1["labels"], b2["labels"])
        np.testing.assert_array_equal(b1["mel"], b2["mel"])
        np.testing.assert_array_equal(bb["labels"], bo["labels"])
        np.testing.assert_array_equal(bb["mel"], bo["mel"])
        # same (seed, step) label stream as the base sampler; only the
        # gap layout differs
        np.testing.assert_array_equal(bb["labels"], b1["labels"])
        if (b1["mel_lengths"] > bb["mel_lengths"]).any():
            grew = True
    assert grew  # prob 0.9 over 4 steps x 4 utts: long gaps must appear
