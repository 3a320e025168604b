"""Multi-process (DCN-tier) serving: a LockstepEngine slab spanning two
JAX processes must produce exactly what one process produces.

The cluster is hermetic: 2 subprocesses on the CPU backend with gloo
collectives, each contributing 4 virtual devices (the multi-process
analogue of the suite's single-process 8-device virtual mesh). The
differential gate is the project's standard tier-3 idiom: sharded ==
unsharded, here across the process boundary (SURVEY.md §4)."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from nemotron_tpu.parallel.multihost import (fetch_stream_rows,
                                             local_row_spans)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, sys
repo, addr, pid, gguf, out, mode = sys.argv[1:7]
sys.path.insert(0, repo)
from nemotron_tpu.parallel.multihost import MultihostLockstep, init_multihost
init_multihost(addr, 2, int(pid), cpu_gloo=True)

import jax.numpy as jnp
import numpy as np
from nemotron_tpu import params as params_mod
from nemotron_tpu.config import CacheConfig

params, cfg, vocab = params_mod.load_model(gguf)
cc = CacheConfig(att_right_context=1, att_left_context=12, n_mels=cfg.n_mels)
eng = MultihostLockstep(params, cfg, vocab, cc, n_streams=8,
                        compute_dtype=jnp.float32)

def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)

N = cc.shift_samples
rows = [int(r) for r in eng.local_rows]
audio = {r: synth(N * 4, 1000 + r) for r in rows}

def block(t):
    return np.stack([audio[r][t * N:(t + 1) * N] for r in rows])

if mode == "resume":
    # 2 ticks -> collective shard snapshot -> FRESH engine -> load ->
    # 2 more ticks: must equal 4 uninterrupted ticks exactly
    for t in range(2):
        eng.tick(block(t))
    snap = out + ".snap"
    eng.save(snap)
    eng = MultihostLockstep(params, cfg, vocab, cc, n_streams=8,
                            compute_dtype=jnp.float32)
    eng.load(snap)
    for t in range(2, 4):
        eng.tick(block(t))
else:
    for t in range(4):
        eng.tick(block(t))
eng.finalize()
res = {str(r): {"text": eng.transcripts[i],
                "tokens": [[int(t), int(f)] for t, f in eng.tokens[i]]}
       for i, r in enumerate(rows)}
json.dump(res, open(out, "w"))
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_local_row_spans_single_process():
    """Single process owns every row, in order, regardless of mesh TP."""
    from nemotron_tpu.parallel.mesh import make_mesh

    for mp in (1, 2):
        spans, rows = local_row_spans(make_mesh(8, model_parallel=mp), 16)
        assert rows.tolist() == list(range(16))
        assert sum(b - a for a, b in spans) == 16


def test_fetch_stream_rows_addressable():
    x = jax.numpy.arange(24.0).reshape(2, 6, 2)
    got = fetch_stream_rows(x, 1, np.array([1, 4]))
    np.testing.assert_array_equal(got, np.asarray(x)[:, [1, 4]])


def test_multihost_requires_cluster(model_setup):
    from nemotron_tpu.parallel.multihost import MultihostLockstep

    _, params, cfg = model_setup
    with pytest.raises(RuntimeError, match="jax.distributed"):
        MultihostLockstep(params, cfg)


def _run_two_process(tmp_path, gguf, mode: str) -> dict:
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    outs = [str(tmp_path / f"out-{mode}{p}.json") for p in (0, 1)]
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, REPO, addr, str(p), gguf, outs[p],
         mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in (0, 1)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    multi = {}
    for o in outs:
        multi.update(json.load(open(o)))
    return multi


def test_two_process_lockstep_matches_single(model_setup, tmp_path):
    """2-process global slab (gloo) == single-process engine, exactly."""
    from conftest import write_tiny_gguf

    import jax.numpy as jnp
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu import params as params_mod
    from nemotron_tpu.streaming.lockstep import LockstepEngine

    arrays, _, cfg = model_setup
    gguf = str(tmp_path / "tiny.gguf")
    write_tiny_gguf(gguf, arrays, cfg)

    multi = _run_two_process(tmp_path, gguf, "straight")
    assert sorted(map(int, multi)) == list(range(8))

    # single-process reference on the same audio (same GGUF load path)
    params, lcfg, vocab = params_mod.load_model(gguf)
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=lcfg.n_mels)
    eng = LockstepEngine(params, lcfg, vocab, cc, n_streams=8,
                         compute_dtype=jnp.float32)

    def synth(n, seed):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal(n) * 8000).astype(np.int16)

    N = cc.shift_samples
    audio = {r: synth(N * 4, 1000 + r) for r in range(8)}
    for t in range(4):
        eng.tick(np.stack([audio[r][t * N:(t + 1) * N] for r in range(8)]))
    eng.finalize()
    for r in range(8):
        assert multi[str(r)]["text"] == eng.transcripts[r], f"row {r}"
        assert multi[str(r)]["tokens"] == [[t, f] for t, f in
                                           eng.tokens[r]], f"row {r}"

    # per-process shard snapshot/resume: 2 ticks -> save -> fresh engines
    # -> load -> 2 ticks must equal the 4 uninterrupted ticks exactly
    resumed = _run_two_process(tmp_path, gguf, "resume")
    assert sorted(map(int, resumed)) == list(range(8))
    for r in range(8):
        assert resumed[str(r)] == multi[str(r)], f"row {r} (resume)"


# ---------------------------------------------------------------------------
# round 4: the ragged ServingEngine multihost (VERDICT r3 item 6)
# ---------------------------------------------------------------------------

SERVING_WORKER = r'''
import json, sys
repo, addr, pid, gguf, out = sys.argv[1:6]
sys.path.insert(0, repo)
from nemotron_tpu.parallel.multihost import MultihostServing, init_multihost
init_multihost(addr, 2, int(pid), cpu_gloo=True)

import jax.numpy as jnp
import numpy as np
from nemotron_tpu import params as params_mod
from nemotron_tpu.config import CacheConfig

params, cfg, vocab = params_mod.load_model(gguf)
cc = CacheConfig(att_right_context=1, att_left_context=12, n_mels=cfg.n_mels)
eng = MultihostServing(params, cfg, vocab, cc, n_slots=8,
                       compute_dtype=jnp.float32,
                       endpoint_silence_s=2.0, endpoint_reset=True)

def synth(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 8000).astype(np.int16)

rows = [int(r) for r in eng.local_rows]
# steady real-time cadence: shift_samples per tick = exactly one chunk per
# collective step (the one-pass-per-step contract; chunk-sized feeds would
# need the single-process engine's data-dependent drain loop)
n = cc.shift_samples
# ragged pattern per process: rows[0] full rate, rows[1] half rate,
# rows[2] admitted at step 2; rows[3] never admitted
s_full = eng.add_stream()
s_half = eng.add_stream()
s_late = None
audio = {r: synth(n * 6, 5000 + r) for r in rows}
for tick in range(6):
    feed = {s_full: audio[s_full][tick * n:(tick + 1) * n]}
    if tick % 2 == 0:
        feed[s_half] = audio[s_half][(tick // 2) * n:(tick // 2 + 1) * n]
    if tick == 2:
        s_late = eng.add_stream()
    if s_late is not None and tick >= 2:
        feed[s_late] = audio[s_late][(tick - 2) * n:(tick - 1) * n]
    eng.feed_audio(feed)
    eng.step()           # collective: BOTH processes step every tick
res = {str(s): {"text": eng.transcripts[s],
                "tokens": [[int(t), int(f)] for t, f in eng.tokens[s]]}
       for s in (s_full, s_half, s_late)}
json.dump(res, open(out, "w"))
'''


def test_two_process_serving_matches_single(model_setup, tmp_path):
    """Ragged MultihostServing (2-process gloo, staggered admissions and
    rates, staged resets, always-issued batched realign) == the
    single-process ServingEngine, exactly, slot for slot."""
    from conftest import write_tiny_gguf

    import jax.numpy as jnp
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu import params as params_mod
    from nemotron_tpu.streaming.serving import ServingEngine

    arrays, _, cfg = model_setup
    gguf = str(tmp_path / "tiny_srv.gguf")
    write_tiny_gguf(gguf, arrays, cfg)

    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    outs = [str(tmp_path / f"srv-out{p}.json") for p in (0, 1)]
    procs = [subprocess.Popen(
        [sys.executable, "-c", SERVING_WORKER, REPO, addr, str(p), gguf,
         outs[p]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in (0, 1)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    multi = {}
    for o in outs:
        multi.update(json.load(open(o)))

    # single-process reference: same global slots, same ragged cadence.
    # Process p owns rows [4p, 4p+4); its add_stream order is
    # full=4p, half=4p+1, late=4p+2.
    params, lcfg, vocab = params_mod.load_model(gguf)
    cc = CacheConfig(att_right_context=1, att_left_context=12,
                     n_mels=lcfg.n_mels)
    eng = ServingEngine(params, lcfg, vocab, cc, n_slots=8,
                        compute_dtype=jnp.float32, dsp="numpy",
                        endpoint_silence_s=2.0, endpoint_reset=True)

    def synth(n, seed):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal(n) * 8000).astype(np.int16)

    n = cc.shift_samples
    audio = {r: synth(n * 6, 5000 + r) for r in range(8)}

    def claim(r):
        # the worker on process p admits from ITS rows [4p, 4p+4); the
        # single-process API has no admit-this-slot call, so mimic
        # add_stream's body for the chosen global row
        assert not eng.active[r]
        eng.active[r] = True
        eng._clear_slot(r)
        return r

    slots = {(p, k): claim(r) for p in (0, 1)
             for k, r in (("full", 4 * p), ("half", 4 * p + 1))}
    late = {}
    for tick in range(6):
        feed = {}
        for p in (0, 1):
            feed[slots[(p, "full")]] = audio[slots[(p, "full")]][
                tick * n:(tick + 1) * n]
            if tick % 2 == 0:
                s = slots[(p, "half")]
                feed[s] = audio[s][(tick // 2) * n:(tick // 2 + 1) * n]
        if tick == 2:
            for p in (0, 1):
                late[p] = claim(4 * p + 2)
        if late:
            for p in (0, 1):
                s = late[p]
                feed[s] = audio[s][(tick - 2) * n:(tick - 1) * n]
        eng.feed_audio(feed)
        eng.step()

    assert sorted(map(int, multi)) == [0, 1, 2, 4, 5, 6]
    for s in map(int, multi):
        assert multi[str(s)]["text"] == eng.transcripts[s], f"slot {s}"
        assert multi[str(s)]["tokens"] == \
            [[t, f] for t, f in eng.tokens[s]], f"slot {s}"
