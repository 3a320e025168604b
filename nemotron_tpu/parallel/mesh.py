"""Device-mesh scale-out for many-stream serving.

The reference is single-process single-device with no collectives
(SURVEY.md 2.4). The TPU-native scale story is different:

  - DATA axis ('data'): the stream/batch axis of all session state (K/V and
    conv caches, LSTM state, prev tokens, mel chunks) is sharded across
    chips. Pure data parallelism: zero collectives in steady state; each
    chip serves its shard of streams.
  - MODEL axis ('model'): optional tensor parallelism over the FFN hidden
    dim and attention heads for latency scaling of a single big batch. XLA
    (GSPMD) inserts the all-reduces over ICI from the shardings alone.

Everything works through `jax.sharding.NamedSharding` + jit: no manual
collectives, per the scaling-book recipe (pick mesh, annotate, let XLA).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def _pspec_for_param(path: str, ndim: int) -> P:
    """Sharding rule for a parameter leaf, by field name.

    Layer params are stacked [L, ...]; dim 0 (layers) is never sharded.
    FFN: w1 [L, D, FF] shards FF, w2 [L, FF, D] shards FF (contracting) --
    GSPMD inserts the psum. Attention q/k/v/pos shard the head-packed output
    dim; out_w shards its input dim. QTensor leaves (path .../q, .../scale)
    inherit the parent weight's rule: the int8 values shard like the dense
    weight, and the per-block scales shard the same way (the block axis is
    in//32, aligned with the contraction axis)."""
    if path.endswith("/col_scale"):
        # [L, out] follows the parent weight's OUT-dim rule
        parent = _pspec_for_param(path.rsplit("/", 1)[0], 3)
        return P(parent[0], parent[-1])
    if path.endswith(("/q", "/scale")):
        path = path.rsplit("/", 1)[0]
    if "ffn" in path and path.endswith("w1"):
        return P(None, None, "model")
    if "ffn" in path and path.endswith("w2"):
        return P(None, "model", None)
    if path.endswith(("attn_q_w", "attn_k_w", "attn_v_w", "attn_pos_w")):
        return P(None, None, "model")
    if path.endswith("attn_out_w"):
        return P(None, "model", None)
    if path.endswith(("pos_bias_u", "pos_bias_v")):
        return P(None, "model", None)  # [L, H, dh]: shard heads
    if path.endswith("conv_pw1_w"):
        return P(None, None, None)  # GLU halves interact; keep replicated
    return P(*([None] * ndim))


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for ModelParams (TP over 'model', replicated over
    'data'). Any axis whose size does not divide the mesh axis falls back to
    replication (e.g. Q8_0 block-scale axes of small models)."""

    def one(path, leaf):
        name = "/".join(str(getattr(p, "name", p)) for p in path)
        spec = _pspec_for_param(name, np.ndim(leaf))
        shape = np.shape(leaf)
        fixed = tuple(
            ax if ax is None or shape[i] % mesh.shape[ax] == 0 else None
            for i, ax in enumerate(spec))
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(one, params)


def state_shardings(state, mesh: Mesh,
                    stream_axis_by_rank={5: 1, 4: 1, 3: 0, 1: 0}):
    """NamedSharding tree for (EncoderState, DecoderState, ...) pytrees.

    Encoder caches are [L, B, ...] (stream axis 1; K/V rings are rank-5
    head-major [L, B, H, KV, Dh]); decoder state is [B, ...] (axis 0);
    per-stream scalars are [B]."""

    def one(leaf):
        nd = np.ndim(leaf)
        axis = stream_axis_by_rank.get(nd, 0 if nd else None)
        spec = [None] * nd
        if axis is not None and nd:
            spec[axis] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(one, state)


def shard_stream_major(tree, mesh: Mesh):
    """Shard a pytree whose every leaf is stream-major ([S, ...]) over the
    'data' axis (e.g. BeamState [S, K, ...] leaves -- state_shardings' rank
    map is for [L, B, ...] encoder caches and would pick the wrong axis)."""

    def one(leaf):
        spec = ["data"] + [None] * (np.ndim(leaf) - 1)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(one, tree)


def mel_sharding(mesh: Mesh):
    """[S, T, n_mels] mel chunks: shard streams."""
    return NamedSharding(mesh, P("data", None, None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_state(state, mesh: Mesh):
    return jax.device_put(state, state_shardings(state, mesh))
