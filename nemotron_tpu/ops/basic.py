"""Elementwise / normalization building blocks.

Semantics match the reference graph builders (layer_norm:
src/nemo-ggml.cpp:470-480; FFN Linear->SiLU->Linear: :484-500; GLU:
src/nemo-stream.cpp:620-636). All functions are batched over arbitrary
leading axes and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, w, b, eps: float = 1e-5):
    # Normalize in f32 regardless of compute dtype: LN statistics in bf16
    # lose too much precision for parity with the reference.
    #
    # Single-pass statistics (E[x^2] - mu^2) so XLA emits ONE fused reduction
    # over x instead of two (mean, then centered variance) -- profiling shows
    # the LN convert+reduce fusions dominate the non-matmul encoder time.
    # Cancellation is a non-issue at f32 for bf16-sourced activations.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def glu(x):
    """[..., 2C] -> [..., C]: first half gated by sigmoid of second half."""
    c = x.shape[-1] // 2
    return x[..., :c] * jax.nn.sigmoid(x[..., c:])


def ffn(x, w1, w2):
    """Linear -> SiLU -> Linear (no biases in this model). Weights may be
    dense arrays or int8 QTensors (weight-only quantized path)."""
    from .quant import qmm

    return qmm(silu(qmm(x, w1)), w2)
