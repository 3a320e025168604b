"""Cohort-scheduler gates: weight sharing is zero-copy, each cohort's
transcripts are exactly a solo LockstepEngine's, phase assignment lands
every arrival in the cohort that ticks next."""

import jax
import numpy as np
import pytest

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.streaming.cohorts import CohortScheduler
from nemotron_tpu.streaming.lockstep import LockstepEngine


@pytest.fixture()
def cc(model_setup):
    _, _, cfg = model_setup
    return CacheConfig(att_right_context=1, att_left_context=12,
                       n_mels=cfg.n_mels)


def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)


def make(model_setup, cc, n_streams=2, n_cohorts=2, **kw):
    import jax.numpy as jnp

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    return CohortScheduler(params, cfg, vocab, cc, n_streams=n_streams,
                           n_cohorts=n_cohorts,
                           compute_dtype=jnp.float32, **kw)


def test_weights_shared_across_cohorts(model_setup, cc):
    sched = make(model_setup, cc, n_cohorts=3)
    leaves0 = jax.tree_util.tree_leaves(sched.engines[0].params)
    for eng in sched.engines[1:]:
        leaves = jax.tree_util.tree_leaves(eng.params)
        assert all(a is b for a, b in zip(leaves0, leaves)), \
            "cohort engines must share the same device weight buffers"
        assert all(a is b for a, b in zip(
            jax.tree_util.tree_leaves(sched.engines[0].pos_heads),
            jax.tree_util.tree_leaves(eng.pos_heads)))


def test_cohorts_match_solo_engines(model_setup, cc):
    """Interleaved cohort ticks == each cohort run alone (state isolation
    across cohorts is by construction, but the tick interleaving and the
    global-id mapping are the scheduler's own logic)."""
    import jax.numpy as jnp

    _, params, cfg = model_setup
    vocab = [f"w{i}" for i in range(cfg.vocab_size)]
    B, C, T = 2, 2, 3
    n = cc.shift_samples
    audio = {c: np.stack([np.concatenate([synth(n, 100 * c + 10 * t + s)
                                          for t in range(T)])
                          for s in range(B)])
             for c in range(C)}

    sched = make(model_setup, cc, n_streams=B, n_cohorts=C)
    texts: dict[int, str] = {}
    for t in range(T):          # staggered: cohort 0 ticks, then cohort 1
        for c in range(C):
            out = sched.tick(c, audio[c][:, t * n:(t + 1) * n])
            for sid, txt in out.items():
                texts[sid] = texts.get(sid, "") + txt
    finals = sched.finalize()

    for c in range(C):
        solo = LockstepEngine(params, cfg, vocab, cc, n_streams=B,
                              compute_dtype=jnp.float32)
        for t in range(T):
            solo.tick(audio[c][:, t * n:(t + 1) * n])
        want = solo.finalize()
        for s in range(B):
            sid = sched.stream_id(c, s)
            assert finals[sid] == want[s], (c, s)
            assert sched.locate(sid) == (c, s)


def test_assign_phase(model_setup, cc):
    sched = make(model_setup, cc, n_streams=1, n_cohorts=4)
    period = cc.chunk_samples / cc.sample_rate
    for frac, want in [(0.0, 0), (0.05, 1), (0.26, 2), (0.74, 3),
                       (0.76, 0), (0.99, 0)]:
        got = sched.assign(frac * period)
        assert got == want, (frac, got, want)
        # the assigned cohort ticks within period/C after the arrival's
        # phase (never before it)
        wait = (got / 4 - frac) % 1.0
        assert wait < 1 / 4 + 1e-9


def test_cohort_snapshot_roundtrip(model_setup, cc, tmp_path):
    sched = make(model_setup, cc)
    n = cc.shift_samples
    for c in range(2):
        sched.tick(c, np.stack([synth(n, c * 7 + s) for s in range(2)]))
    sched.save(str(tmp_path / "snap"))

    fresh = make(model_setup, cc)
    fresh.load(str(tmp_path / "snap"))
    for c in range(2):
        blk = np.stack([synth(n, 50 + c * 7 + s) for s in range(2)])
        a = sched.tick(c, blk)
        b = fresh.tick(c, blk)
        assert a == b
    assert sched.transcripts == fresh.transcripts
