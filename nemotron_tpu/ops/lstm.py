"""Batched 2-layer LSTM step for the RNN-T prediction network.

Gate order [i, f, g, o] matches PyTorch / the reference
(reference src/nemo-ggml.cpp:503-542, docs/TENSOR_SHAPES.md:112-129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import DecoderParams


def lstm_step(dp: DecoderParams, x, h, c):
    """One step through all LSTM layers.

    x: [B, in]; h, c: [B, L, H]. Returns (top hidden [B, H], h', c')."""
    n_layers = dp.w_ih.shape[0]
    H = h.shape[-1]
    dt = x.dtype
    hs, cs = [], []
    for l in range(n_layers):
        gates = (
            x @ dp.w_ih[l].astype(dt)
            + h[:, l] @ dp.w_hh[l].astype(dt)
            + dp.b_ih[l].astype(dt)
            + dp.b_hh[l].astype(dt)
        )
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c_l = f * c[:, l] + i * g
        h_l = o * jnp.tanh(c_l)
        hs.append(h_l)
        cs.append(c_l)
        x = h_l
    return x, jnp.stack(hs, axis=1), jnp.stack(cs, axis=1)
