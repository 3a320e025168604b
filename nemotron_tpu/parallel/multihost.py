"""Multi-process (multi-host) serving over a global mesh — the DCN tier.

The reference is strictly single-process (SURVEY.md §2.4: no collectives,
no multi-process anything). The single-process TPU engines already scale
over every chip one process can address (`parallel/mesh.py`, ICI tier);
this module adds the remaining scale axis: ONE serving slab spanning
multiple JAX processes (multi-host TPU pods, or multi-node CPU clusters
for testing), coordinated by `jax.distributed`.

Design (the scaling-book recipe, unchanged):
  - a single global `Mesh` over `jax.devices()` (all processes' devices);
  - stream state sharded over the 'data' axis exactly as single-process
    (state_shardings / shard_params are sharding-spec-driven, so they work
    unchanged on a multi-process mesh — GSPMD lays out the same program);
  - every process executes the SAME jitted tick collectively; in steady
    state there are ZERO cross-process collectives (pure DP over streams,
    each process's devices compute their own stream rows), so DCN only
    carries the compile-time handshakes;
  - the host boundary becomes per-process: each process feeds PCM for, and
    reads tokens of, only the stream rows its own devices hold. The two
    hooks `LockstepEngine._put_pcm` / `_fetch_block` are the entire
    surface; everything else (DSP, encoder, decode modes, endpointing
    accounting, detok) is inherited.

Tested without real multi-host hardware via 2 CPU processes with gloo
collectives and virtual devices (tests/test_multihost.py), the same way
the single-process mesh is tested on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import numpy as np

from ..streaming.lockstep import LockstepEngine
from .mesh import make_mesh


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, *, cpu_gloo: bool = False) -> None:
    """Join (or create, for process 0) the jax.distributed cluster.

    Must run before any other JAX call. `cpu_gloo=True` forces the CPU
    backend with gloo cross-process collectives — the hermetic test
    configuration (each process contributes
    --xla_force_host_platform_device_count virtual devices); on real
    multi-host TPU leave it False and let the TPU runtime provide the
    topology.
    """
    import jax

    if cpu_gloo:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def local_row_spans(mesh, n_streams: int):
    """The stream rows THIS process's devices own under P('data').

    Returns (spans, rows): `spans` is a sorted list of (start, stop)
    half-open global-row ranges, `rows` the corresponding flat global row
    indices. Derived from the sharding's own index map rather than assumed
    contiguous, so any device order (TPU coords, multi-slice) works.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    mine = set()
    for d, idx in sh.devices_indices_map((n_streams,)).items():
        if d.process_index != jax.process_index():
            continue
        sl = idx[0]
        mine.add((sl.start or 0,
                  n_streams if sl.stop is None else sl.stop))
    spans = sorted(mine)
    rows = (np.concatenate([np.arange(a, b) for a, b in spans])
            if spans else np.zeros(0, np.int64))
    return spans, rows


def put_stream_rows(mesh, local_block: np.ndarray, n_streams: int, spans):
    """Assemble a global [n_streams, ...] array sharded P('data', None...)
    from this process's local rows ([n_local, ...], ordered as
    `local_row_spans`). Each process contributes its own rows — together
    they form the global array without any host ever holding it whole."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    gshape = (n_streams,) + local_block.shape[1:]
    spec = P("data", *([None] * (local_block.ndim - 1)))
    sh = NamedSharding(mesh, spec)
    offsets, off = {}, 0
    for a, b in spans:
        offsets[a] = off
        off += b - a
    arrays = []
    imap = sh.devices_indices_map(gshape)
    for d in sh.addressable_devices:
        sl = imap[d][0]
        a = sl.start or 0
        b = n_streams if sl.stop is None else sl.stop
        lo = offsets[a]
        arrays.append(jax.device_put(local_block[lo:lo + (b - a)], d))
    return jax.make_array_from_single_device_arrays(gshape, sh, arrays)


def put_stream_rows_axis(mesh, local_block: np.ndarray, n_streams: int,
                         spans, stream_axis: int, dtype=None):
    """`put_stream_rows` generalized to a stream axis other than 0 (encoder
    caches are [L, B, ...]): assemble the global array sharded P('data') at
    `stream_axis` from this process's local rows along that axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    gshape = list(local_block.shape)
    gshape[stream_axis] = n_streams
    gshape = tuple(gshape)
    spec = [None] * local_block.ndim
    spec[stream_axis] = "data"
    sh = NamedSharding(mesh, P(*spec))
    offsets, off = {}, 0
    for a, b in spans:
        offsets[a] = off
        off += b - a

    def cb(index):
        import jax.numpy as jnp

        sl = index[stream_axis]
        a = sl.start or 0
        b = n_streams if sl.stop is None else sl.stop
        lo = offsets[a]
        idx = list(index)
        idx[stream_axis] = slice(lo, lo + (b - a))
        blk = local_block[tuple(idx)]
        return blk if dtype is None else jnp.asarray(blk, dtype)

    return jax.make_array_from_callback(gshape, sh, cb)


def fetch_stream_rows(x, stream_axis: int, rows) -> np.ndarray:
    """Materialize the given global stream rows of a (possibly
    non-fully-addressable) device array as numpy. Robust to whatever
    output sharding XLA chose (replication across a model axis, coarser
    or finer row blocks): it assembles from addressable shards and selects
    exactly `rows`."""
    if getattr(x, "is_fully_addressable", True):
        return np.take(np.asarray(x), rows, axis=stream_axis)
    blocks = {}
    for s in x.addressable_shards:
        sl = s.index[stream_axis]
        blocks.setdefault(sl.start or 0, np.asarray(s.data))
    starts = sorted(blocks)
    cat = np.concatenate([blocks[a] for a in starts], axis=stream_axis)
    covered = np.concatenate(
        [np.arange(a, a + blocks[a].shape[stream_axis]) for a in starts])
    pos = {int(r): i for i, r in enumerate(covered)}
    sel = [pos[int(r)] for r in rows]
    return np.take(cat, sel, axis=stream_axis)


class MultihostLockstep(LockstepEngine):
    """LockstepEngine spanning every process of a jax.distributed cluster.

    The device program and its state are GLOBAL (`n_streams` across all
    processes); the host interface is LOCAL: `tick()` takes
    [engine.n_local, N] PCM for this process's rows (`engine.local_rows`
    maps local index -> global row) and returns text keyed by local index.

    Collective-consistency contract — every process must:
      - construct the engine with identical config/params/n_streams,
      - issue the same sequence of tick()/finalize() calls with the SAME
        per-tick sample count (tick programs are traced per (buf_len, N);
        a divergent call sequence desyncs the SPMD programs).

    Not supported multihost: `endpoint_reset` (the reset is a collective
    whose firing is data-dependent per process). Plain endpointing (events
    without decoder reset) is pure host accounting and works.

    `save`/`load` are per-process shard snapshots: every process calls
    them COLLECTIVELY with the SAME path; each writes/reads its own
    `<path>.p<process_index>.npz` holding only the stream rows its devices
    own (no host ever materializes the global slab). Load requires the
    same process count/row ownership the snapshot was taken with.
    """

    def __init__(self, params, cfg, vocab=None, cache_config=None,
                 n_streams: int = 256, mesh=None, model_parallel: int = 1,
                 **kw):
        import jax

        if jax.process_count() < 2:
            raise RuntimeError(
                "MultihostLockstep needs a jax.distributed cluster "
                "(init_multihost); use LockstepEngine single-process")
        if kw.get("endpoint_reset"):
            raise ValueError("endpoint_reset is not supported multihost "
                             "(data-dependent collective); endpoint events "
                             "without reset work")
        if mesh is None:
            mesh = make_mesh(model_parallel=model_parallel)
        if n_streams % mesh.shape["data"]:
            raise ValueError(f"n_streams={n_streams} not divisible by the "
                             f"data axis ({mesh.shape['data']})")
        # preset BEFORE the base __init__ (which otherwise defaults
        # local == global); see LockstepEngine.__init__
        self._spans, rows = local_row_spans(mesh, n_streams)
        self._local_rows = rows
        self.n_local = len(rows)
        super().__init__(params, cfg, vocab, cache_config,
                         n_streams=n_streams, mesh=mesh, **kw)
        # Small jit constants were created as process-local arrays; a
        # multi-process jit requires globally-consistent inputs. Re-put
        # them replicated over the global mesh (numpy -> global sharding
        # is the one transfer every process can do independently).
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        self.window = jax.device_put(np.asarray(self.window), rep)
        self.filterbank = jax.device_put(np.asarray(self.filterbank), rep)

    @property
    def local_rows(self) -> np.ndarray:
        """Global row index of each local stream (local i -> global)."""
        return self._local_rows

    def _put_pcm(self, pcm_i16: np.ndarray):
        return put_stream_rows(self.mesh, np.asarray(pcm_i16, np.int16),
                               self.n_streams, self._spans)

    def _fetch_block(self, x, stream_axis: int) -> np.ndarray:
        return fetch_stream_rows(x, stream_axis, self._local_rows)

    def _unsnap_rows(self, a, dtype, stream_axis: int):
        from ..utils.npz import npz_decode

        return put_stream_rows_axis(self.mesh, npz_decode(a),
                                    self.n_streams, self._spans,
                                    stream_axis, dtype=dtype)

    def _shard_loaded_state(self) -> None:
        pass   # _unsnap_rows already materialized globally-sharded arrays

    def _rank_path(self, path: str) -> str:
        import jax

        base = path[:-4] if path.endswith(".npz") else path
        return f"{base}.p{jax.process_index()}.npz"

    def save(self, path: str) -> None:
        """Collective per-process shard snapshot (see class docstring)."""
        super().save(self._rank_path(path))

    def load(self, path: str) -> None:
        super().load(self._rank_path(path))
