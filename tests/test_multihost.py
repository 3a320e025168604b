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
