"""TDT (token-and-duration transducer) gates: the lattice loss against an
independent numpy DP AND a brute-force path enumeration; the batched
on-device greedy decode against a plain-Python reference loop (exact token
match, the repo's greedy bar); GGUF round-trip of the duration metadata."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemotron_tpu import params as params_mod
from nemotron_tpu.config import MAX_SYMBOLS_PER_STEP, ModelConfig
from nemotron_tpu.losses.tdt import tdt_loss
from nemotron_tpu.models import decoder as dec_mod
from nemotron_tpu.models.tdt import tdt_greedy_decode

from conftest import tiny_config


# ---------------------------------------------------------------------------
# loss oracles
# ---------------------------------------------------------------------------

def _log_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = x - m
    return e - np.log(np.exp(e).sum(axis=axis, keepdims=True))


def np_tdt_loss(logits, labels, T_b, U_b, durations, blank, sigma=0.0):
    """Independent forward DP for ONE sequence (plain loops)."""
    D = len(durations)
    V = logits.shape[-1] - D
    lp_tok = _log_softmax(logits[..., :V].astype(np.float64)) - sigma
    lp_dur = _log_softmax(logits[..., V:].astype(np.float64))
    alpha = np.full((T_b + 1, U_b + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T_b + 1):
        for u in range(U_b + 1):
            a = alpha[t, u]
            if not np.isfinite(a) or t >= T_b:
                continue  # predictions condition on a real frame t < T_b
            for di, d in enumerate(durations):
                if t + d > T_b:
                    continue
                w = lp_dur[t, u, di]
                if d >= 1:  # blank advances time
                    alpha[t + d, u] = np.logaddexp(
                        alpha[t + d, u], a + lp_tok[t, u, blank] + w)
                if u < U_b:  # token emission (any d incl. 0)
                    alpha[t + d, u + 1] = np.logaddexp(
                        alpha[t + d, u + 1],
                        a + lp_tok[t, u, labels[u]] + w)
    return -alpha[T_b, U_b]


def brute_tdt_loss(logits, labels, T, U, durations, blank, sigma=0.0):
    """Exhaustive path enumeration (memoized suffix sums) -- the ground
    truth both the numpy DP and the JAX scan must match."""
    import functools

    D = len(durations)
    V = logits.shape[-1] - D
    lp_tok = _log_softmax(logits[..., :V].astype(np.float64)) - sigma
    lp_dur = _log_softmax(logits[..., V:].astype(np.float64))

    @functools.lru_cache(maxsize=None)
    def f(t, u):  # log-sum over paths (t, u) -> (T, U)
        if t == T:
            return 0.0 if u == U else -np.inf
        if t > T:
            return -np.inf
        acc = -np.inf
        for di, d in enumerate(durations):
            w = lp_dur[t, u, di]
            if d >= 1:
                acc = np.logaddexp(acc, lp_tok[t, u, blank] + w + f(t + d, u))
            if u < U:
                acc = np.logaddexp(
                    acc, lp_tok[t, u, labels[u]] + w + f(t + d, u + 1))
        return acc

    return -f(0, 0)


@pytest.mark.parametrize("durations", [(0, 1, 2, 3), (0, 1, 2, 3, 4), (1, 2)])
def test_tdt_loss_matches_oracles(durations, rng):
    B, T, U, V = 3, 7, 4, 11
    D = len(durations)
    logits = rng.standard_normal((B, T, U + 1, V + D)).astype(np.float32)
    labels = rng.integers(0, V - 1, size=(B, U)).astype(np.int32)
    t_lens = np.array([T, 5, 6], np.int32)
    u_lens = np.array([U, 2, 0], np.int32)
    blank = V - 1

    got = np.asarray(jax.jit(
        lambda lg: tdt_loss(lg, jnp.asarray(labels), jnp.asarray(t_lens),
                            jnp.asarray(u_lens), durations, blank=blank,
                            sigma=0.05))(jnp.asarray(logits)))
    for b in range(B):
        want = np_tdt_loss(logits[b], labels[b], int(t_lens[b]),
                           int(u_lens[b]), durations, blank, sigma=0.05)
        brute = brute_tdt_loss(logits[b, :t_lens[b]], labels[b],
                               int(t_lens[b]), int(u_lens[b]), durations,
                               blank, sigma=0.05)
        assert np.isfinite(want)
        np.testing.assert_allclose(want, brute, rtol=1e-6)
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_tdt_loss_grad_finite(rng):
    durations = (0, 1, 2)
    B, T, U, V = 2, 5, 3, 7
    logits = jnp.asarray(
        rng.standard_normal((B, T, U + 1, V + len(durations))), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V - 1, size=(B, U)), jnp.int32)
    g = jax.grad(lambda lg: jnp.mean(tdt_loss(
        lg, labels, jnp.array([T, 4]), jnp.array([U, 2]), durations)))(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    # padded frames/labels must get zero gradient (no silent padding leak)
    gb = np.asarray(g)[1]
    assert np.abs(gb[4:]).max() == 0.0


# ---------------------------------------------------------------------------
# greedy decode
# ---------------------------------------------------------------------------

def tdt_cfg():
    return dataclasses.replace(tiny_config(), tdt_durations=(0, 1, 2, 3))


@pytest.fixture(scope="module")
def tdt_setup():
    cfg = tdt_cfg()
    arrays = params_mod.random_weight_arrays(cfg, seed=3)
    params = params_mod.params_from_arrays(arrays, cfg)
    return params, cfg


def oracle_tdt_decode(params, cfg, enc, h, c, prev, skip=0):
    """Plain-Python single-stream TDT greedy loop (the semantics spec)."""
    durations = cfg.tdt_durations
    D = len(durations)
    blank = cfg.blank_token
    T = enc.shape[0]
    out = []
    t, sym = skip, 0
    while t < T:
        ep = dec_mod.joint_project_enc(params.joint,
                                       jnp.asarray(enc[t])[None])
        emb = jnp.asarray(params.decoder.embedding)[jnp.asarray([prev])]
        from nemotron_tpu.ops.lstm import lstm_step
        dec_out, h2, c2 = lstm_step(params.decoder, emb, h, c)
        logits = np.asarray(
            dec_mod.joint_logits(params.joint, ep, dec_out))[0]
        tok = int(np.argmax(logits[:-D]))
        d = durations[int(np.argmax(logits[-D:]))]
        if tok == blank:
            t += max(d, 1)
            sym = 0
            continue
        out.append((tok, t))
        h, c, prev = h2, c2, tok
        if d == 0:
            sym += 1
            if sym >= MAX_SYMBOLS_PER_STEP:
                t += 1
                sym = 0
        else:
            t += d
            sym = 0
    return out, h, c, prev, t - T


def test_tdt_greedy_matches_oracle(tdt_setup, rng):
    params, cfg = tdt_setup
    B, T = 4, 12
    enc = (rng.standard_normal((B, T, cfg.d_model)) * 3).astype(np.float32)

    st = dec_mod.init_decoder_state(cfg, batch=B)
    toks, st2, skip = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc), st)
    got = dec_mod.tokens_to_list(np.asarray(toks), cfg.blank_token)

    for b in range(B):
        h = jnp.zeros((1, cfg.decoder_layers, cfg.decoder_dim))
        c = jnp.zeros_like(h)
        want, h, c, prev, over = oracle_tdt_decode(
            params, cfg, enc[b], h, c, cfg.blank_token)
        assert got[b] == want, f"stream {b}"
        assert int(skip[b]) == over
        np.testing.assert_allclose(np.asarray(st2.h)[b], np.asarray(h)[0],
                                   atol=1e-5)
        assert int(st2.prev_token[b]) == prev


def test_tdt_skip_carry_across_chunks(tdt_setup, rng):
    """Decoding one [T] chunk == decoding [T1] + [T2] with the jump
    overshoot carried as skip_in (the streaming contract)."""
    params, cfg = tdt_setup
    B, T1, T2 = 3, 7, 9
    enc = (rng.standard_normal((B, T1 + T2, cfg.d_model)) * 3
           ).astype(np.float32)

    st = dec_mod.init_decoder_state(cfg, batch=B)
    full, _, _ = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc), st)
    want = dec_mod.tokens_to_list(np.asarray(full), cfg.blank_token)

    st = dec_mod.init_decoder_state(cfg, batch=B)
    t1, st, skip = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc[:, :T1]), st)
    t2, st, skip = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc[:, T1:]), st, skip_in=skip)
    got1 = dec_mod.tokens_to_list(np.asarray(t1), cfg.blank_token)
    got2 = dec_mod.tokens_to_list(np.asarray(t2), cfg.blank_token)
    got = [g1 + [(tok, t + T1) for tok, t in g2]
           for g1, g2 in zip(got1, got2)]
    assert got == want


def test_tdt_step_mask_and_lengths(tdt_setup, rng):
    params, cfg = tdt_setup
    B, T = 4, 10
    enc = (rng.standard_normal((B, T, cfg.d_model)) * 3).astype(np.float32)
    lens = jnp.asarray([T, 6, 0, 8], jnp.int32)
    mask = jnp.asarray([True, True, True, False])
    skip_in = jnp.asarray([0, 1, 0, 5], jnp.int32)

    st = dec_mod.init_decoder_state(cfg, batch=B)
    toks, st2, skip = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc), st, skip_in=skip_in,
        step_mask=mask, enc_lengths=lens)
    got = dec_mod.tokens_to_list(np.asarray(toks), cfg.blank_token)

    # masked stream: untouched, skip passthrough
    assert got[3] == []
    assert int(skip[3]) == 5
    assert np.asarray(st2.h)[3].max() == 0.0
    # active streams match the oracle run over their valid prefix
    for b, (L, s0) in enumerate([(T, 0), (6, 1), (0, 0)]):
        h = jnp.zeros((1, cfg.decoder_layers, cfg.decoder_dim))
        c = jnp.zeros_like(h)
        want, _, _, _, over = oracle_tdt_decode(
            params, cfg, enc[b, :L], h, c, cfg.blank_token, skip=s0)
        assert got[b] == want, f"stream {b}"
        assert int(skip[b]) == over


# ---------------------------------------------------------------------------
# GGUF round-trip
# ---------------------------------------------------------------------------

def test_tdt_gguf_roundtrip(tdt_setup, tmp_path, rng):
    params, cfg = tdt_setup
    path = str(tmp_path / "tdt.gguf")
    params_mod.save_model(path, params, cfg,
                          vocab=[f"t{i}"[:7] for i in range(cfg.vocab_size)])
    p2, cfg2, vocab = params_mod.load_model(path)
    assert cfg2.tdt_durations == cfg.tdt_durations
    assert cfg2.vocab_size == cfg.vocab_size
    assert np.asarray(p2.joint.out_w).shape[-1] == (
        cfg.vocab_size + len(cfg.tdt_durations))

    enc = (rng.standard_normal((2, 8, cfg.d_model)) * 3).astype(np.float32)
    st = dec_mod.init_decoder_state(cfg, batch=2)
    a, _, _ = tdt_greedy_decode(params, cfg, jnp.asarray(enc), st)
    b, _, _ = tdt_greedy_decode(p2, cfg2, jnp.asarray(enc), st)
    assert dec_mod.tokens_to_list(np.asarray(a), cfg.blank_token) == \
        dec_mod.tokens_to_list(np.asarray(b), cfg.blank_token)


# ---------------------------------------------------------------------------
# duration-aware beam search + greedy confidence
# ---------------------------------------------------------------------------

def test_tdt_beam1_equals_greedy(tdt_setup, rng):
    """beam_size=1 degenerates EXACTLY to the greedy walk: the (token,
    duration) pair score is separable, so top-1 = (argmax tok, argmax dur)
    with identical pointer/state updates -- the same differential gate the
    RNN-T beam has in tests/test_beam.py."""
    from nemotron_tpu.models.beam import best_hypothesis
    from nemotron_tpu.models.tdt import init_tdt_beam_state, tdt_beam_decode

    params, cfg = tdt_setup
    B, T = 4, 12
    enc = (rng.standard_normal((B, T, cfg.d_model)) * 3).astype(np.float32)

    st = dec_mod.init_decoder_state(cfg, batch=B)
    toks, _, skip = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc), st)
    greedy = [[t for t, _f in g]
              for g in dec_mod.tokens_to_list(np.asarray(toks),
                                              cfg.blank_token)]

    bst = init_tdt_beam_state(cfg, B, 1, max_tokens=256)
    bst = jax.jit(tdt_beam_decode, static_argnums=(1, 4))(
        params, cfg, jnp.asarray(enc), bst, 1)
    btok, blen, _ = best_hypothesis(bst)
    btok, blen = np.asarray(btok), np.asarray(blen)
    got = [[int(t) for t in btok[b, : blen[b]]] for b in range(B)]
    assert got == greedy
    # overshoot carry matches greedy's skip
    np.testing.assert_array_equal(np.asarray(bst.t)[:, 0], np.asarray(skip))


def test_tdt_beam_improves_score_and_chunk_invariance(tdt_setup, rng):
    """(a) K=4's best total log-prob >= K=1's on every stream (holds under
    frontier-synchronized expansion: all live hypotheses are compared at
    the same frame, so jumpers are not crowded out by stayers); (b) chunked
    decoding with the carried TdtBeamState equals one-shot decoding
    EXACTLY (the chunk boundary is just another frame barrier)."""
    from nemotron_tpu.models.beam import best_hypothesis
    from nemotron_tpu.models.tdt import init_tdt_beam_state, tdt_beam_decode

    params, cfg = tdt_setup
    B, T = 4, 12
    enc = (rng.standard_normal((B, T, cfg.d_model)) * 3).astype(np.float32)
    jbd = jax.jit(tdt_beam_decode, static_argnums=(1, 4))

    bst1 = jbd(params, cfg, jnp.asarray(enc),
               init_tdt_beam_state(cfg, B, 1, 256), 1)
    _, _, s1 = best_hypothesis(bst1)
    bst4 = jbd(params, cfg, jnp.asarray(enc),
               init_tdt_beam_state(cfg, B, 4, 256), 4)
    _, _, s4 = best_hypothesis(bst4)
    assert np.all(np.asarray(s4) >= np.asarray(s1) - 1e-3)

    chunked = jbd(params, cfg, jnp.asarray(enc[:, :7]),
                  init_tdt_beam_state(cfg, B, 4, 256), 4)
    chunked = jbd(params, cfg, jnp.asarray(enc[:, 7:]), chunked, 4)
    for f in ("scores", "tokens", "lengths", "t", "prev_token", "sym"):
        np.testing.assert_allclose(np.asarray(getattr(chunked, f)),
                                   np.asarray(getattr(bst4, f)), atol=1e-4)


def test_tdt_beam_step_mask(tdt_setup, rng):
    """Frozen streams keep their ENTIRE beam (scores, tokens, t carries)."""
    from nemotron_tpu.models.tdt import init_tdt_beam_state, tdt_beam_decode

    params, cfg = tdt_setup
    B, T = 3, 8
    enc = (rng.standard_normal((B, T, cfg.d_model)) * 3).astype(np.float32)
    jbd = jax.jit(tdt_beam_decode, static_argnums=(1, 4))

    bst = jbd(params, cfg, jnp.asarray(enc),
              init_tdt_beam_state(cfg, B, 2, 128), 2)
    mask = jnp.asarray([True, False, True])
    bst2 = jax.jit(tdt_beam_decode, static_argnums=(1, 4))(
        params, cfg, jnp.asarray(enc), bst, 2, None, mask)
    for f in ("scores", "tokens", "lengths", "t", "prev_token", "h", "c"):
        np.testing.assert_array_equal(np.asarray(getattr(bst2, f))[1],
                                      np.asarray(getattr(bst, f))[1])
    # unmasked streams actually advanced (scores strictly decreased)
    assert np.asarray(bst2.scores)[0, 0] < np.asarray(bst.scores)[0, 0]


def test_tdt_greedy_confidence(tdt_setup, rng):
    """with_confidence: same tokens as the plain walk; each confidence is
    the token-head log-softmax at the emitting frame, recomputed
    independently via the oracle loop's logits."""
    params, cfg = tdt_setup
    B, T = 3, 10
    D = len(cfg.tdt_durations)
    enc = (rng.standard_normal((B, T, cfg.d_model)) * 3).astype(np.float32)

    st = dec_mod.init_decoder_state(cfg, batch=B)
    toks_p, st_p, _ = jax.jit(tdt_greedy_decode, static_argnums=1)(
        params, cfg, jnp.asarray(enc), st)
    st = dec_mod.init_decoder_state(cfg, batch=B)
    toks_c, confs, st_c, _ = jax.jit(
        tdt_greedy_decode, static_argnums=(1,),
        static_argnames=("with_confidence",))(
        params, cfg, jnp.asarray(enc), st, with_confidence=True)
    np.testing.assert_array_equal(np.asarray(toks_p), np.asarray(toks_c))

    emitted = dec_mod.extract_emitted(np.asarray(toks_c), cfg.blank_token,
                                      confs=np.asarray(confs))
    for b in range(B):
        # oracle replay collecting per-emission log-softmax
        h = jnp.zeros((1, cfg.decoder_layers, cfg.decoder_dim))
        c = jnp.zeros_like(h)
        prev, t, sym = cfg.blank_token, 0, 0
        want = []
        from nemotron_tpu.ops.lstm import lstm_step
        while t < T:
            ep = dec_mod.joint_project_enc(params.joint,
                                           jnp.asarray(enc[b, t])[None])
            emb = jnp.asarray(params.decoder.embedding)[jnp.asarray([prev])]
            dec_out, h2, c2 = lstm_step(params.decoder, emb, h, c)
            logits = np.asarray(
                dec_mod.joint_logits(params.joint, ep, dec_out))[0]
            tok = int(np.argmax(logits[:-D]))
            d = cfg.tdt_durations[int(np.argmax(logits[-D:]))]
            if tok == cfg.blank_token:
                t += max(d, 1)
                sym = 0
                continue
            row = logits[:-D].astype(np.float64)
            want.append((tok, row[tok] - np.log(np.exp(row - row.max()).sum())
                         - row.max()))
            h, c, prev = h2, c2, tok
            if d == 0:
                sym += 1
                if sym >= MAX_SYMBOLS_PER_STEP:
                    t += 1
                    sym = 0
            else:
                t += d
                sym = 0
        got = emitted.get(b, [])
        assert [tk for tk, _f, _c in got] == [tk for tk, _lp in want]
        for (_tk, _f, cg), (_tk2, lp) in zip(got, want):
            assert cg == pytest.approx(lp, abs=1e-4)
