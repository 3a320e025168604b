"""Pallas TPU kernel: blockwise-int8 (Q8_0) weight matmul.

out[M, N] = x[M, K] @ (q[K, N] * expand(scale[K//32, N]))

The weight stays int8 in HBM (half the bytes of bf16 -- this kernel exists
for the HBM-bandwidth-bound regime: small-batch / low-latency serving).
Dequantization happens per [TK, TN] tile in VMEM right before the MXU matmul;
accumulation is f32 across K tiles.

Equivalent of the reference's dequant-in-mul_mat for Q8_0 tensors
(reference src/nemo-ggml.cpp:187-247 keeps quantized weights in device memory
and relies on ggml's fused dequant matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _q8_matmul_kernel(x_ref, q_ref, s_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    q = q_ref[:]                 # [TK, TN] int8
    s = s_ref[:]                 # [TK//QK, TN] f32
    # expand per-block scales to per-row: [nb, TN] -> [nb, QK, TN] -> [TK, TN]
    nb, tn = s.shape
    s_rows = jnp.broadcast_to(s[:, None, :], (nb, QK, tn)).reshape(nb * QK, tn)
    # Dequantize into the ACTIVATION dtype: bf16 serving hits the fast bf16
    # MXU path (f32 operands would quarter the MXU rate; the one bf16
    # rounding of scale*q is what a bf16 dense checkpoint would carry
    # anyway); f32 activations keep the bit-exact dequant used by the
    # parity tests. Accumulation is always f32.
    w = (q.astype(jnp.float32) * s_rows).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def q8_matmul(x, q, scale, *, interpret: bool = False, out_dtype=None):
    """x: [M, K]; q: int8 [K, N]; scale: f32 [K//QK, N]. Returns [M, N].

    K and N must be multiples of 256; M is padded internally."""
    M, K = x.shape
    Kq, N = q.shape
    assert K == Kq and scale.shape == (K // QK, N), (x.shape, q.shape, scale.shape)

    TN = 256
    TK = 256
    TM = min(256, _round_up(M, 32))
    Mp = _round_up(M, TM)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    n_k = K // TK
    grid = (Mp // TM, N // TN, n_k)

    out = pl.pallas_call(
        functools.partial(_q8_matmul_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // QK, TN), lambda i, j, k: (k, j),
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
            bytes_accessed=Mp * K * x.dtype.itemsize + K * N + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scale)
    return out[:M] if Mp != M else out
