"""FastConformer encoder: batch (full utterance) and cache-aware streaming.

TPU design vs the reference ggml graphs:
  - The 24 conformer layers run under one `lax.scan` over stacked layer
    params -> a single traced layer body instead of 24 copies (compile time
    and HBM-resident code size), with XLA free to pipeline weights from HBM.
  - All streaming state is an explicit pytree (`EncoderState`) with STATIC
    shapes: the K/V "sliding window" is concat(cache, new)[-C:], which XLA
    turns into static slices (the reference does concat+view per graph,
    src/nemo-stream.cpp:465-484).
  - Cold-cache validity masking is data (an additive mask computed from
    `valid_len`), not shape: chunk 0..8 all compile to the same program
    (reference recomputes the mask host-side per chunk,
    src/nemo-stream.cpp:980-992).
  - Position embeddings are projected through linear_pos ONCE per
    session/shape (precomputed), not once per chunk per layer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..params import ConformerLayerParams, ModelParams
from ..ops.basic import ffn, layer_norm
from ..ops.conv import conformer_conv_module, conv_subsampling
from ..ops.rel_attention import pos_emb_descending, project_pos, rel_pos_mha


def conformer_layer(lp: ConformerLayerParams, x, pos_heads, mask=None,
                    kv_cache=None, conv_cache=None, *, n_heads: int,
                    d_head: int):
    """One conformer layer (residual structure:
    reference src/nemo-ggml.cpp:768-813). Returns
    (y, new_k_cache, new_v_cache, new_conv_cache)."""
    r = x
    cur = layer_norm(r, lp.norm_ff1_w, lp.norm_ff1_b)
    r = r + 0.5 * ffn(cur, lp.ffn1_w1, lp.ffn1_w2)

    cur = layer_norm(r, lp.norm_attn_w, lp.norm_attn_b)
    attn, new_k, new_v = rel_pos_mha(lp, cur, pos_heads, n_heads, d_head,
                                     kv_cache=kv_cache, mask=mask)
    r = r + attn

    cur = layer_norm(r, lp.norm_conv_w, lp.norm_conv_b)
    conv, new_conv = conformer_conv_module(lp, cur, conv_cache)
    r = r + conv

    cur = layer_norm(r, lp.norm_ff2_w, lp.norm_ff2_b)
    r = r + 0.5 * ffn(cur, lp.ffn2_w1, lp.ffn2_w2)

    return layer_norm(r, lp.norm_final_w, lp.norm_final_b), new_k, new_v, new_conv


def encode_batch(params: ModelParams, cfg: ModelConfig, mel):
    """Full-utterance encoder: mel [B, T, n_mels] -> [B, T', d_model].

    The per-layer position projection happens inside the scan body (T varies
    per call; it is shared work only in the streaming path)."""
    x = conv_subsampling(params.subsampling, mel)
    Tp = x.shape[1]
    pos = jnp.asarray(pos_emb_descending(Tp, cfg.d_model), dtype=x.dtype)

    def body(h, lp):
        pos_heads = project_pos(lp.attn_pos_w, pos.astype(h.dtype),
                                cfg.n_heads, cfg.d_head)
        y, _, _, _ = conformer_layer(lp, h, pos_heads,
                                     n_heads=cfg.n_heads, d_head=cfg.d_head)
        return y, None

    x, _ = jax.lax.scan(body, x, params.layers)
    return x


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------

def _pytree_dataclass(cls):
    import dataclasses

    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class EncoderState:
    """Per-stream encoder caches, batched over a leading stream axis inside
    each leaf's second dim: arrays are [L, B, ...] so the layer scan can
    carry them.

    Mirrors the reference's consolidated k/v/conv cache tensors + host-side
    cache_valid_len (src/nemo-stream.h:149-153, :239)."""

    k_cache: Any      # [L, B, C, D]
    v_cache: Any      # [L, B, C, D]
    conv_cache: Any   # [L, B, K-1, D]
    valid_len: Any    # [B] int32


def init_encoder_state(cfg: ModelConfig, cc: CacheConfig, batch: int,
                       dtype=jnp.float32) -> EncoderState:
    L, D = cfg.n_layers, cfg.d_model
    return EncoderState(
        k_cache=jnp.zeros((L, batch, cc.att_left_context, D), dtype),
        v_cache=jnp.zeros((L, batch, cc.att_left_context, D), dtype),
        conv_cache=jnp.zeros((L, batch, cc.conv_cache_size, D), dtype),
        valid_len=jnp.zeros((batch,), jnp.int32),
    )


def precompute_pos_heads(params: ModelParams, cfg: ModelConfig,
                         cc: CacheConfig, dtype=jnp.float32):
    """[L, P, H, Dh]: per-layer linear_pos projection of the streaming
    pos-emb slice, hoisted out of the chunk step."""
    pos = jnp.asarray(pos_emb_descending(cc.kv_len, cfg.d_model), dtype)

    def proj(lp_pos_w):
        return project_pos(lp_pos_w, pos, cfg.n_heads, cfg.d_head)

    return jax.vmap(proj)(params.layers.attn_pos_w)


def encode_chunk(params: ModelParams, cfg: ModelConfig, cc: CacheConfig,
                 mel_chunk, state: EncoderState, pos_heads,
                 capture: bool = False, step_mask=None):
    """One streaming encoder step.

    mel_chunk: [B, chunk_mel_frames, n_mels]
    pos_heads: [L, P, H, Dh] from `precompute_pos_heads`.
    Returns (enc_out [B, valid_out_len, d_model], new EncoderState), plus a
    named-intermediates dict when capture=True (static) -- the TPU analogue
    of the reference's tensor-dump instrumentation
    (reference src/nemo-stream.cpp:880-958, scripts/my_streaming.py:265-300).

    Replicates reference src/nemo-stream.cpp:961-1030: subsampling, dropping
    drop_extra_pre_encoded overlap frames, validity-masked cached layers,
    valid_len bump, valid_out truncation.
    """
    x = conv_subsampling(params.subsampling, mel_chunk)
    x = x[:, cc.drop_extra_pre_encoded :, :]
    pre_encode_out = x
    B, chunk_len, _ = x.shape

    # additive validity mask [B, 1, 1, kv]: cache slots [0, C - valid) invalid
    C = cc.att_left_context
    kv = C + chunk_len
    j = jnp.arange(kv, dtype=jnp.int32)
    invalid = j[None, :] < (C - state.valid_len)[:, None]
    mask = jnp.where(invalid, jnp.float32(-1e9), 0.0)[:, None, None, :]
    if cc.strict_right_context:
        # intra-chunk lookahead limit: query i (absolute kv index C+i) may
        # see keys j <= C + i + R -- the [left, R] attention contract the
        # reference's streaming graph does not enforce (its TODO)
        i = jnp.arange(chunk_len, dtype=jnp.int32)
        future = j[None, :] > (C + i[:, None] + cc.att_right_context)
        mask = mask + jnp.where(future, jnp.float32(-1e9),
                                0.0)[None, None, :, :]

    # The caches ride the scan CARRY (updated in place per layer via
    # dynamic-update-slice) instead of being scan ys: stacked ys allocate a
    # fresh [L, ...] buffer that XLA then copies back into the donated input
    # (profiled at ~5.4 ms/step of pure copy at B=256); a carried buffer
    # aliases the donated input directly.
    def body(carry, per_layer):
        h, k_all, v_all, cv_all = carry
        lp, ph, l = per_layer
        kc = jax.lax.dynamic_index_in_dim(k_all, l, 0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(v_all, l, 0, keepdims=False)
        cvc = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
        y, nk, nv, ncv = conformer_layer(
            lp, h, ph, mask=mask, kv_cache=(kc, vc), conv_cache=cvc,
            n_heads=cfg.n_heads, d_head=cfg.d_head)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, nk, l, 0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, nv, l, 0)
        cv_all = jax.lax.dynamic_update_index_in_dim(cv_all, ncv, l, 0)
        return (y, k_all, v_all, cv_all), (y if capture else None)

    L = cfg.n_layers
    (x, nk, nv, ncv), layer_ys = jax.lax.scan(
        body, (x, state.k_cache, state.v_cache, state.conv_cache),
        (params.layers, pos_heads, jnp.arange(L, dtype=jnp.int32)))

    new_valid = jnp.minimum(state.valid_len + chunk_len, C)
    if step_mask is not None:
        # continuous batching: streams not advancing this step keep their
        # caches frozen (their mel slot is padding, not audio)
        m = step_mask[None, :, None, None]
        nk = jnp.where(m, nk, state.k_cache)
        nv = jnp.where(m, nv, state.v_cache)
        ncv = jnp.where(m, ncv, state.conv_cache)
        new_valid = jnp.where(step_mask, new_valid, state.valid_len)

    new_state = EncoderState(
        k_cache=nk,
        v_cache=nv,
        conv_cache=ncv,
        valid_len=new_valid,
    )
    enc_out = x[:, : cc.valid_out_len, :]
    if capture:
        inter = {"pre_encode_out": pre_encode_out,
                 "layer_out": layer_ys,       # [L, B, T, D]
                 "encoder_out": enc_out}
        return enc_out, new_state, inter
    return enc_out, new_state
