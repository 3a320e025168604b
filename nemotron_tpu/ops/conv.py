"""Causal convolutions: 2D subsampling stack and depthwise 1D conv.

TPU notes:
  - The subsampling convs map to XLA's conv-on-MXU path via
    lax.conv_general_dilated with explicit asymmetric causal padding
    (left/top = k-1, right/bottom = stride-1; reference
    src/nemo-ggml.cpp:820-873).
  - The depthwise 1D conv (K=9) is expressed as K static shifted
    multiply-adds, which XLA fuses into a handful of VPU ops -- the same
    formulation the reference uses on ggml (src/nemo-ggml.cpp:719-743) but
    vectorized over the batch/stream axis instead of built per-graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import SubsamplingParams
from .basic import glu, layer_norm, silu


def causal_conv2d(x, w, b, stride: int, groups: int = 1):
    """x: [B, T, F, Cin]; w: [kT, kF, Cin/groups, O] (HWIO). Causal padding:
    (k-1, stride-1) on both spatial dims.

    Depthwise case (groups == Cin == O) is expanded into kT*kF strided-slice
    multiply-adds: XLA lowers grouped convolutions poorly on TPU (they miss
    the MXU), while the expansion is a fused chain of VPU ops."""
    kT, kF = w.shape[0], w.shape[1]
    if groups > 1 and w.shape[2] == 1 and groups == x.shape[-1] == w.shape[3]:
        return _depthwise_conv2d(x, w, b, stride)
    if kT == kF == 1 and stride == 1 and groups == 1:
        # pointwise conv IS a matmul; skip the conv lowering entirely
        return x @ w[0, 0].astype(x.dtype) + b.astype(x.dtype)
    if groups == 1 and x.shape[-1] * kT * kF <= 64:
        # small-fan-in conv (the stem's Cin=1 3x3): im2col + one MXU matmul
        # beats XLA's conv path, which pads the single input channel
        return _im2col_conv2d(x, w, b, stride)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((kT - 1, stride - 1), (kF - 1, stride - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + b.astype(x.dtype)


def _im2col_conv2d(x, w, b, stride: int):
    """Causal conv2d as im2col patches @ reshaped kernel.

    x: [B, T, F, Cin]; w: [kT, kF, Cin, O]. Patches are built from kT*kF
    strided slices (cheap, fusable); the single matmul has contraction
    kT*kF*Cin."""
    B, T, F, Cin = x.shape
    kT, kF, _, O = w.shape
    s = stride
    xp = jnp.pad(x, ((0, 0), (kT - 1, s - 1), (kF - 1, s - 1), (0, 0)))
    T_out = (T + s - 2) // s + 1
    F_out = (F + s - 2) // s + 1
    cols = []
    for di in range(kT):
        for dj in range(kF):
            cols.append(jax.lax.slice(
                xp, (0, di, dj, 0),
                (B, di + s * (T_out - 1) + 1, dj + s * (F_out - 1) + 1, Cin),
                (1, s, s, 1)))
    patches = jnp.concatenate(cols, axis=-1)         # [B, T', F', kT*kF*Cin]
    # kernel reorder to match patch layout: (di, dj, cin) fastest = cin
    wmat = w.astype(x.dtype).reshape(kT * kF * Cin, O)
    return patches @ wmat + b.astype(x.dtype)


def _depthwise_conv2d(x, w, b, stride: int):
    """Causal depthwise conv2d as kT*kF shifted multiply-adds.

    x: [B, T, F, C]; w: [kT, kF, 1, C]. Same causal padding/output size as
    the grouped-conv path: out dims = in//stride + 1 per spatial dim."""
    B, T, F, C = x.shape
    kT, kF = w.shape[0], w.shape[1]
    s = stride
    xp = jnp.pad(x, ((0, 0), (kT - 1, s - 1), (kF - 1, s - 1), (0, 0)))
    T_out = (T + kT + s - 2 - kT) // s + 1
    F_out = (F + kF + s - 2 - kF) // s + 1
    wd = w.astype(x.dtype)
    out = None
    for di in range(kT):
        for dj in range(kF):
            sl = jax.lax.slice(
                xp,
                (0, di, dj, 0),
                (B, di + s * (T_out - 1) + 1, dj + s * (F_out - 1) + 1, C),
                (1, s, s, 1),
            )
            term = sl * wd[di, dj, 0]
            out = term if out is None else out + term
    return out + b.astype(x.dtype)


def conv_subsampling(p: SubsamplingParams, mel):
    """Causal ConvSubsampling: mel [B, T, n_mels] -> [B, T//8(+1s), d_model].

    Stage order and flatten convention (feature index = c*F' + f) follow
    reference src/nemo-ggml.cpp:877-952."""
    x = mel[..., None]                       # [B, T, F, 1]
    C = p.conv0_b.shape[0]
    x = jax.nn.relu(causal_conv2d(x, p.conv0_w, p.conv0_b, stride=2))
    x = causal_conv2d(x, p.conv2_w, p.conv2_b, stride=2, groups=C)
    x = jax.nn.relu(causal_conv2d(x, p.conv3_w, p.conv3_b, stride=1))
    x = causal_conv2d(x, p.conv5_w, p.conv5_b, stride=2, groups=C)
    x = jax.nn.relu(causal_conv2d(x, p.conv6_w, p.conv6_b, stride=1))
    # [B, T', F', C] -> flatten feature as c*F' + f
    B, Tp, Fp, Cc = x.shape
    x = jnp.swapaxes(x, 2, 3).reshape(B, Tp, Cc * Fp)
    return x @ p.out_w.astype(x.dtype) + p.out_b.astype(x.dtype)


def depthwise_conv1d(x, w_kd, cache=None):
    """Causal depthwise conv1d as K shifted multiply-adds.

    x: [B, T, D]; w_kd: [K, D]. If cache [B, K-1, D] is given, it is
    prepended (streaming); otherwise zero padding (batch). Returns
    (out [B, T, D], new_cache [B, K-1, D]) -- new cache is the last K-1
    frames of the padded input (reference src/nemo-stream.cpp:365-381)."""
    K, D = w_kd.shape
    B, T, _ = x.shape
    if cache is None:
        cache = jnp.zeros((B, K - 1, D), dtype=x.dtype)
    padded = jnp.concatenate([cache.astype(x.dtype), x], axis=1)  # [B, K-1+T, D]
    w = w_kd.astype(x.dtype)
    out = padded[:, 0:T, :] * w[0]
    for k in range(1, K):
        out = out + padded[:, k : k + T, :] * w[k]
    new_cache = padded[:, -(K - 1):, :]
    return out, new_cache


def conformer_conv_module(lp, x, cache=None):
    """Conformer conv module: pw1 -> GLU -> causal depthwise -> LN -> SiLU ->
    pw2 (reference src/nemo-ggml.cpp:683-761 / src/nemo-stream.cpp:618-651).

    lp: a ConformerLayerParams slice (single layer). x: [B, T, D].
    Returns (out, new_conv_cache)."""
    from .quant import qmm

    cur = glu(qmm(x, lp.conv_pw1_w))
    cur, new_cache = depthwise_conv1d(cur, lp.conv_dw_w, cache)
    cur = layer_norm(cur, lp.conv_ln_w, lp.conv_ln_b)
    cur = silu(cur)
    return qmm(cur, lp.conv_pw2_w), new_cache
