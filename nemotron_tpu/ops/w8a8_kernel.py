"""Pallas TPU kernel: fused dynamic-activation int8 matmul (W8A8).

out[M, N] = quantize_rows(x) @ q[K, N] * col_scale[N]

The XLA W8A8 path (ops/quant.qmm_w8a8) pays separate HBM passes per matmul
for the activation abs-max reduce and the round/clip/int8 write (profiled at
~21 ms/step at batch 768). Here the activation tile is quantized in VMEM
right before the int8 MXU dot, with PER-(ROW, K-TILE) scales -- finer than
per-row (strictly no less accurate) and single-pass:

    acc_f32 += (xq_tile @ wq_tile)_int32 * row_tile_scale
    out = acc * col_scale
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, q_ref, cs_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)                     # [TM, TK]
    ax = jnp.max(jnp.abs(x), axis=1, keepdims=True)      # [TM, 1]
    s = jnp.maximum(ax, 1e-12) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    p = jax.lax.dot_general(
        xq, q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                # [TM, TN] int32
    acc_ref[:] += p.astype(jnp.float32) * s

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * cs_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def w8a8_matmul(x, q, col_scale, *, interpret: bool = False, out_dtype=None):
    """x: [M, K] f32/bf16; q: int8 [K, N]; col_scale: f32 [N].

    K and N must be multiples of 256; M is padded internally."""
    M, K = x.shape
    Kq, N = q.shape
    assert K == Kq and col_scale.shape == (N,)

    # big tiles: the first version used 256^2 tiles -> >1000 grid instances
    # per matmul, launch-bound. VMEM at (512, 1024, 1024): x 1MB + q 1MB +
    # acc 2MB + out 2MB (double-buffered by the pipeline) ~ 8MB, fits.
    TN = 1024 if N % 1024 == 0 else (512 if N % 512 == 0 else 256)
    TK = 1024 if K % 1024 == 0 else (512 if K % 512 == 0 else 256)
    TM = min(512, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    n_k = K // TK
    grid = (Mp // TM, N // TN, n_k)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * x.dtype.itemsize + K * N + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, col_scale.reshape(1, N).astype(jnp.float32))
    return out[:M] if Mp != M else out
