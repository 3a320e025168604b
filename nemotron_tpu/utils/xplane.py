"""Per-step DEVICE durations from an xplane profiler trace.

Why this exists (VERDICT r2 item 3): host-side timing through the axon
TPU tunnel cannot observe per-step tails -- `jax.block_until_ready` does
not block on that platform, so bench.py's host statistics are percentiles
of RTT-cancelled chain MEANS (p50 == p90 by construction). The device
trace has the truth: the profiler's "XLA Modules" line carries one event
per module EXECUTION with picosecond offsets/durations measured on the
TensorCore itself, immune to tunnel jitter.

The reference has no analogue (it times CUDA events on the host,
reference src/nemo-stream.cpp); on TPU the xplane trace is the native
equivalent of cudaEventElapsedTime.

No tensorflow import: the XSpace proto's generated module is loaded
standalone from the installed tensorflow wheel (importing tensorflow
itself would drag in a second copy of XLA and ~2 GB of RAM).
"""

from __future__ import annotations

import glob
import os

_XPLANE_PB2 = None

_PB2_CANDIDATES = (
    "tensorflow/tsl/profiler/protobuf/xplane_pb2.py",
    "tsl/profiler/protobuf/xplane_pb2.py",
)


def _load_pb2():
    """Load the generated xplane_pb2 module without importing tensorflow."""
    global _XPLANE_PB2
    if _XPLANE_PB2 is not None:
        return _XPLANE_PB2
    import importlib.util
    import site
    import sys

    roots = list(sys.path) + site.getsitepackages()
    for root in roots:
        for rel in _PB2_CANDIDATES:
            path = os.path.join(root, rel)
            if os.path.exists(path):
                spec = importlib.util.spec_from_file_location(
                    "nemotron_xplane_pb2", path)
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                _XPLANE_PB2 = mod
                return mod
    raise ImportError(
        "xplane_pb2 not found in site-packages (looked for "
        f"{_PB2_CANDIDATES}); install tensorflow or xprof with protos")


def latest_trace(trace_dir: str) -> str:
    """Newest *.xplane.pb under a jax.profiler trace directory."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    return paths[-1]


def module_durations_ms(xplane_path: str) -> dict[str, list[float]]:
    """Device-side duration (ms) of every XLA module execution, in start
    order, keyed by module name (the profiler's name, e.g.
    "jit_chunk_step(123...)").

    One list entry per execution: these ARE per-step device times when the
    traced region ran one module per step. Only device planes are read
    (plane name contains "/device:"); the host plane's python/runtime
    lines are ignored.
    """
    pb2 = _load_pb2()
    xs = pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())

    out: dict[str, list[tuple[int, float]]] = {}
    for plane in xs.planes:
        if "/device:" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                out.setdefault(name, []).append(
                    (line.timestamp_ns * 1000 + ev.offset_ps,
                     ev.duration_ps / 1e9))
    return {name: [d for _t, d in sorted(v)] for name, v in out.items()}


def step_percentiles(trace_dir: str, match: str = "",
                     drop_first: int = 1) -> dict:
    """Percentile summary of per-execution device times for the module
    whose name contains `match` (default: the module with the most
    executions). `drop_first` leading executions are discarded (first
    traced step often carries one-time work).

    Returns {module, n_steps, p50_ms, p90_ms, p99_ms, mean_ms, max_ms}.
    """
    import numpy as np

    durs = module_durations_ms(latest_trace(trace_dir))
    if match:
        durs = {k: v for k, v in durs.items() if match in k}
    if not durs:
        raise ValueError(f"no XLA Modules events matching {match!r}")
    name = max(durs, key=lambda k: len(durs[k]))
    t = np.asarray(durs[name][drop_first:] or durs[name])
    return {
        "module": name.split("(")[0],
        "n_steps": int(t.size),
        "p50_ms": float(np.percentile(t, 50)),
        "p90_ms": float(np.percentile(t, 90)),
        "p99_ms": float(np.percentile(t, 99)),
        "mean_ms": float(t.mean()),
        "max_ms": float(t.max()),
    }
