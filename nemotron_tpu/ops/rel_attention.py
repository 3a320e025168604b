"""Relative-position multi-head attention (Transformer-XL style).

The rel-shift (reference builds it from ggml pad/reshape/view ops,
src/nemo-ggml.cpp:548-585, src/nemo-stream.cpp:391-433; clearest index-math
spec at src/reference/conformer_modules.cpp:217-227) selects

    out[i, j] = raw[i, j + Q - 1 - i]

i.e. relative distance (cache + i) - j, because the position table is in
NeMo's descending order. Implemented here as the pad-reshape-drop skew
(`rel_shift`) -- NOT a gather: gathers lower to per-element VPU code on TPU
(measured ~14x whole-step regression). The ring-cache variant additionally
permutes the time-ordered bias into ring-slot order with a one-hot matmul.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pos_emb_descending(length_each_side: int, d_model: int) -> np.ndarray:
    """Sinusoidal relative-position table in NeMo's descending order
    (reference src/nemo-ggml.cpp:17-32): row p holds the embedding of
    position value (length_each_side-1) - p. Computed in numpy -- it is a
    compile-time constant for every static sequence length."""
    total = 2 * length_each_side - 1
    out = np.zeros((total, d_model), dtype=np.float32)
    positions = (length_each_side - 1) - np.arange(total, dtype=np.float32)
    i = np.arange(0, d_model, 2, dtype=np.float32)
    div = np.exp(-i * np.log(10000.0) / d_model)
    ang = positions[:, None] * div[None, :]
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out


def rel_shift(pos_raw, klen: int):
    """pos_raw: [..., Q, P] -> [..., Q, klen] with
    out[..., i, j] = pos_raw[..., i, j + Q - 1 - i].

    Implemented as pad -> reshape -> drop -> slice (the Transformer-XL
    trick; same algebra the reference builds from ggml views,
    src/nemo-ggml.cpp:548-585) rather than a gather: on TPU this lowers to
    pure reshapes/slices that XLA fuses, while take_along_axis lowers to a
    real gather, which is slow on the VPU.

    Derivation: pad one zero column on the left -> [..., Q, P+1]; flattening
    row-major and re-viewing as [..., P+1, Q] skews each original row i left
    by i; dropping the first row and re-viewing as [..., Q, P] leaves
    row i = original row i shifted left by i starting at column Q-1-i... net
    effect after slicing columns [0, klen): out[i, j] = in[i, j + Q-1-i]
    (requires P >= Q - 1 + klen, which 2*klen-1 >= Q-1+klen satisfies since
    klen >= Q)."""
    *lead, Q, P = pos_raw.shape
    padded = jnp.pad(pos_raw, [(0, 0)] * len(lead) + [(0, 0), (1, 0)])
    skewed = padded.reshape(*lead, P + 1, Q)
    skewed = skewed[..., 1:, :]                    # drop first row
    shifted = skewed.reshape(*lead, Q, P)
    return shifted[..., :klen]


def _softmax_ctx(content, pos_attn, v, mask, d_head, dt):
    """scores -> softmax -> context, with f32 math inside compute-dtype
    storage (halves attention HBM traffic in bf16 serving; identical to an
    all-f32 pipeline when dt is f32)."""
    scale = np.float32(1.0 / np.sqrt(d_head))
    scores = (content + pos_attn) * scale.astype(dt)
    if mask is not None:
        scores = scores + mask.astype(dt)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(dt)
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    w = (e.astype(jnp.float32) / s).astype(dt)
    return jnp.einsum("bhij,bjhd->bihd", w, v,
                      preferred_element_type=jnp.float32).astype(dt)


def rel_pos_mha(lp, x, pos_heads, n_heads: int, d_head: int,
                kv_cache=None, mask=None):
    """Relative-position MHA: batch mode, or legacy shift-cache streaming.

    lp: single-layer ConformerLayerParams.
    x: [B, Q, D] (post-layernorm input).
    pos_heads: [P, H, Dh] -- the position embeddings ALREADY projected through
        linear_pos and reshaped to heads. P must be 2*(cache+Q)-1 where cache
        is 0 in batch mode.
    kv_cache: optional (k_cache, v_cache) each [B, C, D]; keys/values become
        concat(cache, new) and the updated caches (last C frames) are
        returned (reference src/nemo-stream.cpp:457-484). The hot streaming
        path uses `rel_pos_mha_ring` instead (no window shift).
    mask: optional additive mask broadcastable to [B, 1, Q, kv]
        (0 = valid, -1e9 = masked; reference src/nemo-stream.cpp:521-528).

    Returns (out [B, Q, D], new_k_cache, new_v_cache).
    """
    from .quant import qmm

    B, Q, D = x.shape
    dt = x.dtype
    q = qmm(x, lp.attn_q_w).reshape(B, Q, n_heads, d_head)
    k_new = qmm(x, lp.attn_k_w)
    v_new = qmm(x, lp.attn_v_w)

    new_k_cache = new_v_cache = None
    if kv_cache is not None:
        k_cache, v_cache = kv_cache
        C = k_cache.shape[1]
        k_full = jnp.concatenate([k_cache.astype(dt), k_new], axis=1)
        v_full = jnp.concatenate([v_cache.astype(dt), v_new], axis=1)
        new_k_cache = k_full[:, -C:, :]
        new_v_cache = v_full[:, -C:, :]
    else:
        k_full, v_full = k_new, v_new

    kv = k_full.shape[1]
    k = k_full.reshape(B, kv, n_heads, d_head)
    v = v_full.reshape(B, kv, n_heads, d_head)

    q_u = q + lp.pos_bias_u.astype(dt)
    q_v = q + lp.pos_bias_v.astype(dt)

    content = jnp.einsum("bihd,bjhd->bhij", q_u, k,
                         preferred_element_type=jnp.float32).astype(dt)
    pos_raw = jnp.einsum("bihd,phd->bhip", q_v, pos_heads.astype(dt),
                         preferred_element_type=jnp.float32).astype(dt)
    pos_attn = rel_shift(pos_raw, kv)

    ctx = _softmax_ctx(content, pos_attn, v, mask, d_head, dt)
    out = qmm(ctx.reshape(B, Q, D), lp.attn_out_w)
    return out, new_k_cache, new_v_cache


def unpack_int4(p, dt):
    """Packed-nibble ring slab [..., Dh/2] int8 -> [..., Dh] in `dt`.

    Two s4 values per byte (the axon backend cannot pass s4 jit ARGUMENTS,
    so rings cross the jit boundary as int8 and are bitcast to native s4
    in-program; models/encoder.py packs with the mirror-image bitcast, so
    the round trip is bit-exact)."""
    import jax

    nib = jax.lax.bitcast_convert_type(p, jnp.int4)     # [..., Dh/2, 2]
    return nib.astype(dt).reshape(*p.shape[:-1], p.shape[-1] * 2)


def rel_pos_mha_ring(lp, x, pos_heads, n_heads: int, d_head: int,
                     k_ring, v_ring, pos_perm, mask,
                     k_scale_cols=None, v_scale_cols=None,
                     packed_int4: bool = False):
    """Relative-position MHA over a RING-buffered K/V cache.

    The streaming hot path. Instead of the reference's shift-window cache
    (concat + keep-last-70, src/nemo-stream.cpp:457-484) -- which rewrites
    the entire K/V cache every chunk -- the ring holds the last n_seg chunks
    in kv_len slots and only ONE segment per stream is rewritten per step
    (done by the caller, outside the layer scan). Inside the layer:

      - k_ring/v_ring [B, H, KV, Dh] (HEAD-MAJOR: the big dot operands
        carry batch dims (b, h) leading and the contraction minor, avoiding
        relayout copies) are READ-ONLY; the slot about to be
        overwritten holds the (n_seg)-chunks-old segment, which is outside
        the attention window and masked invalid by construction.
      - the CURRENT chunk's keys/values are attended as Q extra slots
        appended after the ring on the score axis (no concat of the big
        operands -- two einsums each for scores and context).
      - keys are in ring-slot order, not time order; the position bias is
        computed in chronological order with the standard skew trick and
        permuted into slot order by `pos_perm` [KV, KV+Q], a one-hot
        chronological->slot matrix applied as a (tiny) matmul -- a gather
        here would run per-element on the VPU (measured ~20x whole-step
        regression), while the one-hot matmul rides the MXU. `mask`
        [B|1, 1, 1|Q, KV+Q] carries validity (+ optional lookahead) in slot
        order. Softmax and the context sum are permutation-invariant, so
        this is numerically equivalent to the shift layout.

    Returns (out [B, Q, D], k_new [B, H, Q, Dh], v_new [B, H, Q, Dh]) --
    the caller writes them into the (head-major) ring segment.
    """
    from .quant import qmm, qmm_shared

    B, Q, D = x.shape
    dt = x.dtype

    def heads(t):  # [B, Q, D] -> [B, H, Q, Dh] (head-major)
        return jnp.swapaxes(t.reshape(B, Q, n_heads, d_head), 1, 2)

    # q/k/v share the input: one activation quantization for all three dots
    q3 = qmm_shared(x, [lp.attn_q_w, lp.attn_k_w, lp.attn_v_w])
    q, k_new, v_new = heads(q3[0]), heads(q3[1]), heads(q3[2])

    kv = k_ring.shape[2]
    # int8 rings: the astype is a convert fused into the dot's operand load
    # (reads stay int8); dequant scales are applied to the SCORES (keys,
    # per column) and to the softmax WEIGHTS (values, per column) so no
    # bf16 ring ever materializes in HBM. int4 rings arrive nibble-packed
    # and are expanded in-program (s4 -> dt convert).
    if packed_int4:
        k_r = unpack_int4(k_ring, dt)
        v_r = unpack_int4(v_ring, dt)
    else:
        k_r = k_ring.astype(dt)
        v_r = v_ring.astype(dt)

    q_u = q + lp.pos_bias_u.astype(dt)[None, :, None, :]
    q_v = q + lp.pos_bias_v.astype(dt)[None, :, None, :]

    content_r = jnp.einsum("bhid,bhjd->bhij", q_u, k_r,
                           preferred_element_type=jnp.float32)
    if k_scale_cols is not None:
        content_r = content_r * k_scale_cols[:, :, None, :]
    content = jnp.concatenate([
        content_r.astype(dt),
        jnp.einsum("bhid,bhjd->bhij", q_u, k_new,
                   preferred_element_type=jnp.float32).astype(dt),
    ], axis=-1)                                             # [B,H,Q,kv+Q]
    pos_raw = jnp.einsum("bhid,phd->bhip", q_v, pos_heads.astype(dt),
                         preferred_element_type=jnp.float32).astype(dt)
    # chronological bias over the full window incl. the current chunk:
    # out[i, t] has relative distance i - t + C for t in [0, kv)
    pos_chron = rel_shift(pos_raw, kv)
    # one flat [B*H*Q, kv] @ [kv, kv+Q] matmul -- the permutation is shared
    # across (b, h); a "bhit,tj" einsum lowers to B*H tiny batched matmuls
    # (launch-bound: measured ~9.5 ms at B=768 vs ~1 ms flat)
    B_, H_, Q_, _ = pos_chron.shape
    pos_attn = jax.lax.dot_general(
        pos_chron.reshape(B_ * H_ * Q_, kv), pos_perm.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(B_, H_, Q_, kv + Q)

    scale = np.float32(1.0 / np.sqrt(d_head))
    scores = (content + pos_attn) * scale.astype(dt)
    scores = scores + mask.astype(dt)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(dt)
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    w = (e.astype(jnp.float32) / s).astype(dt)

    w_r = w[..., :kv]
    if v_scale_cols is not None:
        w_r = (w_r.astype(jnp.float32)
               * v_scale_cols[:, :, None, :]).astype(dt)
    ctx = (jnp.einsum("bhij,bhjd->bhid", w_r, v_r,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhij,bhjd->bhid", w[..., kv:], v_new,
                        preferred_element_type=jnp.float32)).astype(dt)
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, Q, D)
    out = qmm(ctx, lp.attn_out_w)
    return out, k_new, v_new


def rel_pos_mha_ring_fused(lp, x, pos_heads, n_heads: int, d_head: int,
                           layer_idx, k_ring_all, v_ring_all, pos_perm,
                           mask, k_cols, v_cols, block_b: int = 8,
                           interpret: bool = False):
    """rel_pos_mha_ring with the bandwidth-bound half (ring reads + scores +
    softmax + context) fused into one Pallas kernel
    (ops/ring_attn_kernel.py). The rings are passed as the FULL stacked
    [L, B, H, KV, Dh] arrays; `layer_idx` selects the layer inside the
    kernel's BlockSpec index_map, so only this layer's block is DMA'd --
    bypassing the scan dynamic-slice relayout (~3x the raw bytes) AND the
    per-layer [B, H, Q, KV+Q] HBM round-trips of the unfused path.

    k_cols/v_cols [B, H, KV] f32: per-slot dequant columns (ones if dense).
    Numerically identical to rel_pos_mha_ring (same dot orders, f32
    accumulation and softmax; differentially tested)."""
    from .quant import qmm, qmm_shared
    from .ring_attn_kernel import fused_ring_attention

    B, Q, D = x.shape
    dt = x.dtype

    def heads(t):
        return jnp.swapaxes(t.reshape(B, Q, n_heads, d_head), 1, 2)

    q3 = qmm_shared(x, [lp.attn_q_w, lp.attn_k_w, lp.attn_v_w])
    q, k_new, v_new = heads(q3[0]), heads(q3[1]), heads(q3[2])

    kv = k_ring_all.shape[3]
    q_u = q + lp.pos_bias_u.astype(dt)[None, :, None, :]
    q_v = q + lp.pos_bias_v.astype(dt)[None, :, None, :]

    pos_raw = jnp.einsum("bhid,phd->bhip", q_v, pos_heads.astype(dt),
                         preferred_element_type=jnp.float32).astype(dt)
    pos_chron = rel_shift(pos_raw, kv)
    pos_attn = jax.lax.dot_general(
        pos_chron.reshape(B * n_heads * Q, kv), pos_perm.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(B, n_heads, Q, kv + Q)
    scale = np.float32(1.0 / np.sqrt(d_head))
    a = (pos_attn * scale + mask.astype(jnp.float32)).astype(dt)

    ctx = fused_ring_attention(layer_idx, q_u, k_new, v_new,
                               k_ring_all, v_ring_all, a, k_cols, v_cols,
                               block_b=block_b, interpret=interpret)
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, Q, D)
    out = qmm(ctx, lp.attn_out_w)
    return out, k_new, v_new


def project_pos(lp_pos_w, pos_emb, n_heads: int, d_head: int):
    """pos_emb [P, D] @ linear_pos -> [P, H, Dh]. For streaming this is
    precomputed once per session instead of per chunk (the reference re-runs
    the projection inside every chunk's graph, src/nemo-stream.cpp:487-488 --
    hoisting it saves 24 [P,1024]x[1024,1024] matmuls per step)."""
    from .quant import QTensor, QTensorW8A8, dequantize

    if isinstance(lp_pos_w, QTensor):
        lp_pos_w = dequantize(lp_pos_w, pos_emb.dtype)
    elif isinstance(lp_pos_w, QTensorW8A8):
        lp_pos_w = (lp_pos_w.q.astype(pos_emb.dtype)
                    * lp_pos_w.col_scale.astype(pos_emb.dtype))
    P = pos_emb.shape[0]
    return (pos_emb @ lp_pos_w.astype(pos_emb.dtype)).reshape(P, n_heads, d_head)
