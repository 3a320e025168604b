"""utils/xplane.py: per-step device durations from profiler traces.

The TPU "XLA Modules" line only exists in device traces, which CI (CPU
backend) cannot produce -- so the parser is gated against a synthetic
XSpace proto with the exact plane/line/event structure the TPU profiler
emits (verified against a real axon trace), plus a smoke test that a real
CPU-backend trace parses without error (and yields no device modules).
"""

import numpy as np
import pytest

from nemotron_tpu.utils import xplane


def _fake_trace(tmp_path, durations_ps, module="jit_chunk_step(123)",
                shuffle=False):
    pb2 = xplane._load_pb2()
    xs = pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = module
    line = plane.lines.add()
    line.name = "XLA Modules"
    line.timestamp_ns = 1000
    order = list(range(len(durations_ps)))
    if shuffle:
        order = order[::-1]
    t = 0
    offsets = []
    for d in durations_ps:
        offsets.append(t)
        t += d + 50_000_000           # 50 us gap between steps
    for i in order:
        ev = line.events.add()
        ev.metadata_id = 1
        ev.offset_ps = offsets[i]
        ev.duration_ps = durations_ps[i]
    # a host plane that must be ignored
    host = xs.planes.add()
    host.name = "/host:CPU"
    hline = host.lines.add()
    hline.name = "XLA Modules"
    hev = hline.events.add()
    hev.metadata_id = 1
    hev.duration_ps = 10**12

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(xs.SerializeToString())
    return str(tmp_path)


def test_module_durations_and_percentiles(tmp_path):
    # 11 steps: one slow warmup + ten 100-120 ms steps (ps units)
    durs = [500, 100, 105, 110, 115, 120, 100, 105, 110, 115, 120]
    durs_ps = [int(d * 1e9) for d in durs]
    root = _fake_trace(tmp_path, durs_ps)

    got = xplane.module_durations_ms(xplane.latest_trace(root))
    assert list(got) == ["jit_chunk_step(123)"]
    np.testing.assert_allclose(got["jit_chunk_step(123)"], durs, rtol=1e-6)

    stats = xplane.step_percentiles(root, match="chunk_step")
    assert stats["module"] == "jit_chunk_step"
    assert stats["n_steps"] == 10           # warmup dropped
    assert 100 <= stats["p50_ms"] <= 120
    assert stats["p99_ms"] <= 120 + 1e-6    # warmup NOT in the tail
    assert stats["max_ms"] == pytest.approx(120.0)

    with pytest.raises(ValueError):
        xplane.step_percentiles(root, match="no_such_module")


def test_durations_sorted_by_start(tmp_path):
    """Events arriving out of order in the proto come back start-ordered."""
    durs_ps = [int(d * 1e9) for d in (10, 20, 30, 40)]
    root = _fake_trace(tmp_path, durs_ps, shuffle=True)
    got = xplane.module_durations_ms(xplane.latest_trace(root))
    assert got["jit_chunk_step(123)"] == [10, 20, 30, 40]


def test_cpu_trace_parses_clean(tmp_path):
    """A real CPU-backend trace has no device plane: the parser returns {}
    rather than crashing, and latest_trace finds the file."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    f(x).block_until_ready()
    jax.profiler.start_trace(str(tmp_path))
    r = f(x)
    r.block_until_ready()
    jax.profiler.stop_trace()
    got = xplane.module_durations_ms(xplane.latest_trace(str(tmp_path)))
    assert got == {}
