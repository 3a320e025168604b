"""ServingCohorts: phase-staggered cohorts of ragged ServingEngines
(VERDICT r4 item 4). The exactness bar mirrors test_serving.py: every
stream served through the cohort scheduler must match a solo engine fed
the same audio, regardless of cohort, rate raggedness, or eviction."""

import jax.numpy as jnp
import numpy as np

from nemotron_tpu.config import CacheConfig
from nemotron_tpu.streaming.cohorts import ServingCohorts
from nemotron_tpu.streaming.serving import ServingEngine


def _audio(seed, n=4000):
    r = np.random.default_rng(seed)
    return (r.standard_normal(n) * 8000).astype(np.int16)


def test_cohorted_streams_match_solo(model_setup):
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, att_left_context=14,
                     n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]

    sched = ServingCohorts(params, cfg, vocab, cc, n_slots=2, n_cohorts=2,
                           compute_dtype=jnp.float32)
    # weights genuinely shared: later engines hold the SAME device buffers
    p0 = sched.engines[0].params
    for eng in sched.engines[1:]:
        assert eng.params.subsampling.conv0_w is p0.subsampling.conv0_w
        assert eng.pos_heads is sched.engines[0].pos_heads

    # two streams per cohort, fed at different rates over staggered ticks
    a = sched.add_stream(cohort=0)
    b = sched.add_stream(cohort=0)
    c = sched.add_stream(cohort=1)
    feeds = {a: [_audio(s) for s in range(10, 14)],
             b: [_audio(s) for s in range(20, 22)],
             c: [_audio(s) for s in range(30, 33)]}

    # staggered rounds: cohort 0 ticks, then cohort 1; b feeds every
    # other round (ragged rate)
    rounds = 4
    fed = {k: 0 for k in feeds}
    for r in range(rounds):
        batch = {}
        for gid in (a, b):
            if fed[gid] < len(feeds[gid]) and (gid != b or r % 2 == 0):
                batch[gid] = feeds[gid][fed[gid]]
                fed[gid] += 1
        sched.feed_audio(batch)
        sched.step(0)
        if fed[c] < len(feeds[c]):
            sched.feed_audio({c: feeds[c][fed[c]]})
            fed[c] += 1
        sched.step(1)
    assert all(fed[k] == len(v) for k, v in feeds.items())

    # solo reference for each stream
    for gid in (a, b, c):
        solo = ServingEngine(params, cfg, vocab, cc, n_slots=1,
                             compute_dtype=jnp.float32)
        s = solo.add_stream()
        for chunk in feeds[gid]:
            solo.feed_audio({s: chunk})
            solo.step()
        assert sched.transcripts[gid] == solo.transcripts[s], gid
        assert sched.tokens[gid] == solo.tokens[s], gid

    st = sched.stats()
    assert st["active_slots"] == 3 and st["n_cohorts"] == 2


def test_assign_phases_cover_all_cohorts(model_setup):
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    sched = ServingCohorts(params, cfg, None, cc, n_slots=1, n_cohorts=3,
                           compute_dtype=jnp.float32)
    period = cc.chunk_samples / cc.sample_rate
    got = {sched.assign(f * period) for f in (0.01, 0.34, 0.67)}
    assert got == {0, 1, 2}

    # arrival just after a cohort's phase lands on the NEXT cohort
    assert sched.assign(0.0) == 0


def test_remove_and_reuse_across_cohorts(model_setup):
    _, params, cfg = model_setup
    cc = CacheConfig(att_right_context=1, n_mels=cfg.n_mels)
    vocab = [f"t{i}" for i in range(cfg.vocab_size)]
    sched = ServingCohorts(params, cfg, vocab, cc, n_slots=1, n_cohorts=2,
                           compute_dtype=jnp.float32)
    x = sched.add_stream(cohort=1)
    sched.feed_audio({x: _audio(5, 6000)})
    sched.step(1)
    text = sched.remove_stream(x)
    assert isinstance(text, str)
    assert sched.stats()["active_slots"] == 0
    # least-loaded admission reuses the freed slot in some cohort
    y = sched.add_stream()
    assert y in (0, sched.n_slots)  # slot 0 of either cohort
