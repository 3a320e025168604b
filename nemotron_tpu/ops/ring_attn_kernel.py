"""Pallas TPU kernel: fused ring-buffer attention for the streaming encoder.

Why a kernel here (and not for the matmuls, where XLA won round 1):
the streaming attention is BANDWIDTH-bound, not FLOP-bound (~2% of step
FLOPs). Round-1 profiling found two taxes XLA cannot remove:

  1. the per-layer dynamic-slice of the K/V rings inside the layer scan
     costs ~3x the raw bytes (the slice materializes a relaid-out copy);
  2. the score/weight tensors [B, H, Q, KV+Q] round-trip HBM between the
     content einsum, bias add, softmax and context einsum.

This kernel takes the FULL ring stacks [L, B, H, KV, Dh] as HBM operands
and selects the layer with a scalar-prefetch index feeding the BlockSpec
index_map -- Pallas double-buffers exactly the [block_b, H, KV, Dh] bytes
each grid step needs (1x bandwidth, int8 rings read as int8), and the whole
scores -> +bias/mask -> softmax -> context chain lives in VMEM.

The position bias + validity mask arrive as one precomputed additive term
`A = pos_bias / sqrt(d_head) + mask` (computed by XLA outside: the skew +
one-hot-permute trick, rel_attention.rel_shift) -- one score-sized tensor
per layer instead of four.

Numerics match rel_pos_mha_ring exactly: f32 MXU accumulation for both
dots, f32 softmax, per-column int8 dequant scales folded into scores (keys)
and softmax weights (values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(l_ref, qu_ref, kn_ref, vn_ref, kr_ref, vr_ref, a_ref,
            kc_ref, vc_ref, out_ref, *, n_heads: int, block_b: int,
            kv: int, scale: float):
    """One grid step: `block_b` streams, all heads, one layer.

    Block shapes (leading layer axis already selected by index_map):
      qu/kn/vn [block_b, H, Q, Dh]   compute dtype
      kr/vr    [1, block_b, H, KV, Dh]  ring dtype (int8 or compute)
      a        [block_b, H, Q, KV+Q]  compute dtype (bias/sqrt + mask)
      kc/vc    [block_b, H, KV]      f32 dequant columns (ones when dense)
      out      [block_b, H, Q, Dh]   compute dtype
    """
    dt = qu_ref.dtype

    def body(idx, _):
        b, h = idx // n_heads, idx % n_heads
        qu = qu_ref[b, h]                                  # [Q, Dh]
        k_r = kr_ref[0, b, h].astype(dt)                   # [KV, Dh]
        c_r = jax.lax.dot_general(
            qu, k_r, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Q, KV]
        c_r = c_r * kc_ref[b, h][None, :]
        c_n = jax.lax.dot_general(
            qu, kn_ref[b, h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Q, Q]
        scores = (jnp.concatenate([c_r, c_n], axis=1) * scale
                  + a_ref[b, h].astype(jnp.float32))       # [Q, KV+Q]

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)         # f32 [Q, KV+Q]

        w_r = (w[:, :kv] * vc_ref[b, h][None, :]).astype(dt)
        v_r = vr_ref[0, b, h].astype(dt)                   # [KV, Dh]
        ctx = jax.lax.dot_general(
            w_r, v_r, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctx = ctx + jax.lax.dot_general(
            w[:, kv:].astype(dt), vn_ref[b, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[b, h] = ctx.astype(dt)
        return 0

    jax.lax.fori_loop(0, block_b * n_heads, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("block_b", "interpret"))
def fused_ring_attention(l, q_u, k_new, v_new, k_ring_all, v_ring_all,
                         a, k_cols, v_cols, *, block_b: int = 8,
                         interpret: bool = False):
    """ctx [B, H, Q, Dh] = softmax((q_u . [ring_l | k_new]) / sqrt(Dh) + a)
    . [ring_l | v_new], with the layer l selected from the stacked rings.

    q_u [B, H, Q, Dh]; k_ring_all/v_ring_all [L, B, H, KV, Dh] (int8 or
    compute dtype, REANDONLY); a [B, H, Q, KV+Q]; k_cols/v_cols [B, H, KV]
    f32. B must be a multiple of block_b."""
    B, H, Q, Dh = q_u.shape
    KV = k_ring_all.shape[3]
    if B % block_b:
        raise ValueError(f"B={B} not a multiple of block_b={block_b}")

    scale = float(1.0 / (Dh ** 0.5))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, H, Q, Dh), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((block_b, H, Q, Dh), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((block_b, H, Q, Dh), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((1, block_b, H, KV, Dh),
                         lambda i, l: (l[0], i, 0, 0, 0)),
            pl.BlockSpec((1, block_b, H, KV, Dh),
                         lambda i, l: (l[0], i, 0, 0, 0)),
            pl.BlockSpec((block_b, H, Q, KV + Q), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((block_b, H, KV), lambda i, l: (i, 0, 0)),
            pl.BlockSpec((block_b, H, KV), lambda i, l: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, H, Q, Dh),
                               lambda i, l: (i, 0, 0, 0)),
    )
    kernel = functools.partial(_kernel, n_heads=H, block_b=block_b,
                               kv=KV, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Q, Dh), q_u.dtype),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), q_u, k_new, v_new,
      k_ring_all, v_ring_all, a, k_cols, v_cols)
