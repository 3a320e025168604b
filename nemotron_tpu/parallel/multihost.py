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
from ..streaming.serving import ServingEngine
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


class MultihostServing(ServingEngine):
    """Ragged continuous-batching `ServingEngine` spanning every process of
    a jax.distributed cluster (VERDICT r3 item 6: the ragged path's
    multihost story, previously LockstepEngine-only).

    The device slab is GLOBAL (`n_slots` across all processes, sharded over
    the mesh's 'data' axis); the host interface is LOCAL: each process
    admits, feeds and reads only slots whose rows its own devices hold
    (`local_rows`). Host DSP only (dsp="numpy"); greedy / confidence /
    CTC / TDT decode modes (beam's staged slot resets are not wired).

    ## Collective-determinism contract

    SPMD requires every process to issue the SAME device-program sequence,
    but ragged serving is full of data-dependent host decisions (which
    slots are ready, who was just admitted, whose ring phase lags, whose
    endpoint fired). This engine makes the sequence deterministic by
    construction -- every `step()` call issues EXACTLY four collective
    programs regardless of local slot activity:

      1. staged full resets  (admissions / evictions since the last step),
      2. staged decoder-only resets (endpoint_reset fires),
      3. batched ring realign (models/encoder.py realign_rings; per-slot
         deltas, 0 = no-op -- the per-slot data-dependent realign_ring
         calls of the single-process engine would desync),
      4. ONE masked chunk step over the globally assembled ready mask.

    All four run even when every mask is empty. Every process must call
    step() at the same cadence (the lockstep-engine contract); a slot with
    more than one chunk buffered drains over successive calls instead of
    the single-process engine's data-dependent while loop.

    ## endpoint_reset, multihost

    SUPPORTED here via staging (the single-process engine resets fired
    slots' prediction networks immediately -- a data-dependent collective
    that MultihostLockstep must reject): a fired slot's decoder reset is
    folded into the NEXT step's pass-2 mask, landing one step late.
    Harmless by the same argument as the lockstep pipelined mode: blanks
    never advance the decoder state, so the only exposure is an utterance
    beginning within that single in-flight step.

    `finalize_stream` is not available (it would have to call step() a
    slot-dependent number of times from one process): feed whole chunks,
    run collective step()s until drained, then `remove_stream(slot)`.
    """

    def __init__(self, params, cfg, vocab=None, cache_config=None,
                 n_slots: int = 256, mesh=None, model_parallel: int = 1,
                 **kw):
        import jax
        import jax.numpy as jnp

        if jax.process_count() < 2:
            raise RuntimeError(
                "MultihostServing needs a jax.distributed cluster "
                "(init_multihost); use ServingEngine single-process")
        if kw.get("dsp", "numpy") == "device":
            raise ValueError("MultihostServing is host-DSP only "
                             "(dsp='numpy'); the device-DSP state is not "
                             "globally sharded")
        if kw.get("beam_size", 1) > 1:
            raise ValueError("beam decode is not wired multihost "
                             "(staged beam-slot resets not implemented)")
        kw["dsp"] = "numpy"
        # the base engine's immediate endpoint reset is a data-dependent
        # collective; run with it OFF and stage fires ourselves (pass 2)
        self._mh_ep_reset = bool(kw.pop("endpoint_reset", False))
        if mesh is None:
            mesh = make_mesh(model_parallel=model_parallel)
        if n_slots % mesh.shape["data"]:
            raise ValueError(f"n_slots={n_slots} not divisible by the "
                             f"data axis ({mesh.shape['data']})")
        self._spans, rows = local_row_spans(mesh, n_slots)
        self._local_rows = rows
        self._local_of = {int(r): i for i, r in enumerate(rows)}
        self.n_local = len(rows)
        self._staged_full = np.zeros(self.n_local, bool)
        self._staged_dec = np.zeros(self.n_local, bool)
        super().__init__(params, cfg, vocab, cache_config, n_slots=n_slots,
                         mesh=mesh, **kw)
        # per-process small device arrays -> globally consistent arrays
        # (same re-put MultihostLockstep does for its jit constants)
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.tdt_skip is not None:
            self.tdt_skip = jax.device_put(
                np.zeros(self.n_slots, np.int32),
                NamedSharding(self.mesh, P("data")))

    @property
    def local_rows(self) -> np.ndarray:
        return self._local_rows

    # -- local-row slot management with staged device resets ---------------

    def add_stream(self) -> int:
        free = [int(r) for r in self._local_rows if not self.active[r]]
        if not free:
            raise RuntimeError("no free local stream slots")
        slot = free[0]
        self.active[slot] = True
        self._clear_slot(slot)
        return slot

    def add_streams(self, count: int) -> list:
        return [self.add_stream() for _ in range(count)]

    def _clear_slot(self, slot: int) -> None:
        """Host-side clear + STAGED device reset (applied at the next
        collective step) -- overrides the base's immediate device calls."""
        self._staged_full[self._local_of[int(slot)]] = True
        if self.ctc_prev is not None:
            self.ctc_prev[slot] = -1
        self._dsp_reset(slot)
        self.mel_buffers[slot] = self._fresh_mel_buffer()
        self.frames_retired += int(self.frame_offsets[slot])
        self.tokens_retired += len(self.tokens[slot])
        self.tokens[slot] = []
        self.transcripts[slot] = ""
        self.frame_offsets[slot] = 0
        self.ep_silence[slot] = 0
        self.ep_emitted[slot] = False
        self.ep_utt_start[slot] = 0
        self._ep_pending = [p for p in self._ep_pending if p[0] != slot]
        if self.keep_segment_audio:
            self.seg_buffers[slot].reset()
        self.slot_phase[slot] = 0

    def finalize_stream(self, slot: int, return_tokens: bool = False):
        raise NotImplementedError(
            "finalize_stream is slot-locally data-dependent; feed whole "
            "chunks, run collective step()s until drained, then "
            "remove_stream(slot) -- see the class docstring")

    def _ep_update(self, emitted: dict, advanced: np.ndarray,
                   frames_advanced: int) -> None:
        before = len(self._ep_pending)
        super()._ep_update(emitted, advanced, frames_advanced)
        if self._mh_ep_reset:
            for s, _end, _seg in self._ep_pending[before:]:
                self._staged_dec[self._local_of[int(s)]] = True

    # -- the deterministic collective step ----------------------------------

    def _put_rows(self, local_block: np.ndarray):
        return put_stream_rows(self.mesh, local_block, self.n_slots,
                               self._spans)

    def step(self) -> dict:
        import jax.numpy as jnp

        from ..streaming import serving as serving_mod

        cc = self.cc
        rows = self._local_rows
        out: dict = {}

        # pass 1+2: staged resets (always issued)
        full_mask, self._staged_full = (self._staged_full,
                                        np.zeros(self.n_local, bool))
        dec_mask, self._staged_dec = (self._staged_dec,
                                      np.zeros(self.n_local, bool))
        g_full = self._put_rows(full_mask)
        g_dec = self._put_rows(dec_mask)
        blank = int(self.cfg.blank_token)
        self.enc_state, self.dec_state = serving_mod._reset_slots(
            self.enc_state, self.dec_state, g_full, jnp.int32(blank))
        self.dec_state = serving_mod._reset_decoder_slots(
            self.dec_state, g_dec, jnp.int32(blank))
        if self.tdt_skip is not None:
            self.tdt_skip = jnp.where(g_full, 0, self.tdt_skip)

        # local readiness + realign deltas to the shared write phase
        local_ready = np.array(
            [self.active[r] and self.mel_buffers[r].count
             >= cc.chunk_mel_frames for r in rows], bool)
        deltas = np.zeros(self.n_local, np.int32)
        for i, r in enumerate(rows):
            if local_ready[i] and self.slot_phase[r] != self.phase_counter:
                deltas[i] = (self.phase_counter - self.slot_phase[r]) \
                    % self.n_seg
                self.slot_phase[r] = self.phase_counter
        # pass 3: batched realign (always issued; 0 = identity)
        self.enc_state = _realign_rings_jit(
            self.enc_state, self._put_rows(deltas), cc.chunk_enc_len)

        # pass 4: ONE masked chunk step over the global ready mask
        chunk_local = np.zeros(
            (self.n_local, cc.chunk_mel_frames, self.cfg.n_mels),
            np.dtype(self.dtype))
        for i, r in enumerate(rows):
            if local_ready[i]:
                chunk_local[i] = self.mel_buffers[r].compact()[
                    : cc.chunk_mel_frames]
        gchunk = self._put_rows(chunk_local)
        gmask = self._put_rows(local_ready)

        import time as _time

        t0 = _time.perf_counter()
        ctc_lp = None
        if self.ctc:
            ids, frame_lp, self.enc_state = \
                serving_mod._chunk_step_masked_ctc_jit(
                    self.params, self.cfg, cc, gchunk, self.enc_state,
                    self.pos_heads, gmask,
                    with_confidence=self.confidence)
            ctc_ids = fetch_stream_rows(ids, 0, rows).astype(np.int64)
            if frame_lp is not None:
                ctc_lp = fetch_stream_rows(frame_lp, 0, rows)
            tokens = confs = None
        elif self.tdt:
            (tokens_d, confs_d, self.enc_state, self.dec_state,
             self.tdt_skip) = serving_mod._chunk_step_masked_tdt_jit(
                self.params, self.cfg, cc, gchunk, self.enc_state,
                self.dec_state, self.pos_heads, gmask, self.tdt_skip,
                with_confidence=self.confidence)
            tokens = fetch_stream_rows(tokens_d, 0, rows)
            confs = (fetch_stream_rows(confs_d, 0, rows)
                     if confs_d is not None else None)
            ctc_ids = None
        elif self.confidence:
            tokens_d, confs_d, self.enc_state, self.dec_state = \
                serving_mod._chunk_step_masked_conf_jit(
                    self.params, self.cfg, cc, gchunk, self.enc_state,
                    self.dec_state, self.pos_heads, gmask)
            tokens = fetch_stream_rows(tokens_d, 0, rows)
            confs = fetch_stream_rows(confs_d, 0, rows)
            ctc_ids = None
        else:
            from ..streaming.session import chunk_step_masked

            tokens_d, self.enc_state, self.dec_state = chunk_step_masked(
                self.params, self.cfg, cc, gchunk, self.enc_state,
                self.dec_state, self.pos_heads, gmask)
            tokens = fetch_stream_rows(tokens_d, 0, rows)
            confs = ctc_ids = None
        self.step_times.append(_time.perf_counter() - t0)

        # host fold-in for LOCAL ready slots (local-index results remapped
        # to global slot ids)
        ready_rows = rows[local_ready]
        for r in ready_rows:
            self.mel_buffers[int(r)].drop(cc.shift_mel_frames)
        if ctc_ids is not None:
            emitted_l = {}
            for i, r in enumerate(rows):
                if not local_ready[i]:
                    continue
                prev, toks = int(self.ctc_prev[r]), []
                base = int(self.frame_offsets[r])
                for t in range(ctc_ids.shape[1]):
                    tok = int(ctc_ids[i, t])
                    if tok != prev and tok != blank:
                        if ctc_lp is None:
                            toks.append((tok, base + t))
                        else:
                            toks.append((tok, base + t,
                                         float(ctc_lp[i, t])))
                    prev = tok
                self.ctc_prev[r] = prev
                if toks:
                    emitted_l[int(r)] = toks
            emitted = emitted_l
            frames_adv = ctc_ids.shape[1]
        else:
            from ..models import decoder as dec_mod

            local_em = dec_mod.extract_emitted(
                tokens, self.cfg.blank_token,
                self.frame_offsets[rows], confs=confs)
            emitted = {int(rows[i]): toks for i, toks in local_em.items()}
            frames_adv = tokens.shape[1]
        for slot, toks in emitted.items():
            self.tokens[slot].extend(toks)
            from ..utils.text import tokens_to_text

            text = tokens_to_text(toks, self.vocab)
            self.transcripts[slot] += text
            out[slot] = out.get(slot, "") + text
        if self.keep_segment_audio:
            pass  # segment buffers are filled by feed_audio (host-local)
        self.frame_offsets[ready_rows] += frames_adv
        self._ep_update(emitted, ready_rows, int(frames_adv))
        self.phase_counter = (self.phase_counter + 1) % self.n_seg
        self.slot_phase[ready_rows] = self.phase_counter
        return out


def _realign_rings_jit(enc_state, deltas, chunk_len):
    import jax

    from ..models import encoder as enc_mod

    global _REALIGN_JIT
    try:
        f = _REALIGN_JIT
    except NameError:
        def _realign_or_skip(enc_state, deltas, chunk_len):
            # Steady state (every stream real-time) has deltas == 0 on
            # every tick; the full two-ring gather there was a pure
            # always-on tax (VERDICT r4 item 7). lax.cond skips it ON
            # DEVICE: the predicate is replicated under GSPMD, so every
            # process still issues the identical program -- no host sync,
            # no SPMD call-sequence divergence -- and the donated buffers
            # pass through untouched on the skip branch.
            import jax.numpy as jnp

            return jax.lax.cond(
                jnp.any(deltas != 0),
                lambda s: enc_mod.realign_rings(s, deltas, chunk_len),
                lambda s: s,
                enc_state)

        f = _REALIGN_JIT = jax.jit(
            _realign_or_skip, static_argnums=(2,),
            donate_argnums=(0,))
    return f(enc_state, deltas, chunk_len)
