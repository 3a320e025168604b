"""FastConformer encoder: batch (full utterance) and cache-aware streaming.

TPU design vs the reference ggml graphs:
  - The 24 conformer layers run under one `lax.scan` over stacked layer
    params -> a single traced layer body instead of 24 copies (compile time
    and HBM-resident code size), with XLA free to pipeline weights from HBM.
  - All streaming state is an explicit pytree (`EncoderState`) with STATIC
    shapes: the K/V attention window is a head-major RING buffer; one
    segment is rewritten per chunk (the reference's concat+keep-last-70
    graph rewrites the full window every chunk, src/nemo-stream.cpp:465-484).
  - Cold-cache validity masking is data (an additive mask computed from
    `valid_len`), not shape: chunk 0..8 all compile to the same program
    (reference recomputes the mask host-side per chunk,
    src/nemo-stream.cpp:980-992).
  - Position embeddings are projected through linear_pos ONCE per
    session/shape (precomputed), not once per chunk per layer.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..params import ConformerLayerParams, ModelParams
from ..ops.basic import ffn, layer_norm
from ..ops.conv import conformer_conv_module, conv_subsampling
from ..ops.rel_attention import (pos_emb_descending, project_pos,
                                 rel_pos_mha, rel_pos_mha_ring,
                                 rel_pos_mha_ring_fused)

_pallas_fallback_warned: set = set()


def _warn_pallas_fallback(reason: str) -> None:
    """One-time stderr note when NEMOTRON_TPU_ATTN=pallas is requested but
    the configuration forces the XLA attention path (e.g. --rc-by-layer:
    the fused kernel takes a layer-invariant mask). Fires at trace time."""
    if reason not in _pallas_fallback_warned:
        _pallas_fallback_warned.add(reason)
        import sys

        print(f"note: NEMOTRON_TPU_ATTN=pallas ignored ({reason}); "
              "using the XLA attention path", file=sys.stderr)


def conformer_layer(lp: ConformerLayerParams, x, pos_heads, mask=None,
                    kv_cache=None, conv_cache=None, ring=None,
                    ring_fused=None, *, n_heads: int, d_head: int,
                    ln_capture: dict | None = None):
    """One conformer layer (residual structure:
    reference src/nemo-ggml.cpp:768-813). Returns
    (y, new_k_cache, new_v_cache, new_conv_cache).

    Streaming uses `ring` = (k_ring, v_ring, pos_perm, ...) for the
    head-major ring-buffered attention cache, or `ring_fused` =
    (layer_idx, k_ring_all, v_ring_all, pos_perm, k_cols, v_cols,
    block_b, interpret) for the Pallas fused-attention path (rings stay
    stacked in HBM; the kernel DMAs one layer's block). `kv_cache` is the
    legacy shift-window path (kept for differential testing)."""
    r = x
    cur = layer_norm(r, lp.norm_ff1_w, lp.norm_ff1_b)
    if ln_capture is not None:
        ln_capture["norm_ff1"] = cur
    r = r + 0.5 * ffn(cur, lp.ffn1_w1, lp.ffn1_w2)

    cur = layer_norm(r, lp.norm_attn_w, lp.norm_attn_b)
    if ln_capture is not None:
        ln_capture["norm_attn"] = cur
    if ring_fused is not None:
        (l, k_all, v_all, pos_perm, k_cols, v_cols, block_b,
         interpret) = ring_fused
        attn, new_k, new_v = rel_pos_mha_ring_fused(
            lp, cur, pos_heads, n_heads, d_head, l, k_all, v_all,
            pos_perm, mask, k_cols, v_cols, block_b=block_b,
            interpret=interpret)
    elif ring is not None:
        k_ring, v_ring, pos_perm, k_cols, v_cols, *packed = ring
        attn, new_k, new_v = rel_pos_mha_ring(
            lp, cur, pos_heads, n_heads, d_head, k_ring, v_ring,
            pos_perm, mask, k_scale_cols=k_cols, v_scale_cols=v_cols,
            packed_int4=bool(packed and packed[0]))
    else:
        attn, new_k, new_v = rel_pos_mha(lp, cur, pos_heads, n_heads, d_head,
                                         kv_cache=kv_cache, mask=mask)
    r = r + attn

    cur = layer_norm(r, lp.norm_conv_w, lp.norm_conv_b)
    if ln_capture is not None:
        ln_capture["norm_conv"] = cur
    conv, new_conv = conformer_conv_module(lp, cur, conv_cache)
    r = r + conv

    cur = layer_norm(r, lp.norm_ff2_w, lp.norm_ff2_b)
    if ln_capture is not None:
        ln_capture["norm_ff2"] = cur
    r = r + 0.5 * ffn(cur, lp.ffn2_w1, lp.ffn2_w2)

    return layer_norm(r, lp.norm_final_w, lp.norm_final_b), new_k, new_v, new_conv


def encode_batch(params: ModelParams, cfg: ModelConfig, mel,
                 remat: bool = False, enc_lengths=None,
                 att_chunk: int | None = None, att_left: int = 70):
    """Full-utterance encoder: mel [B, T, n_mels] -> [B, T', d_model].

    The per-layer position projection happens inside the scan body (T varies
    per call; it is shared work only in the streaming path).

    remat=True checkpoints each conformer layer (recompute-in-backward):
    training activation memory drops from O(L) layer activations to O(1)
    at ~1.3x forward FLOPs -- the standard TPU memory/compute trade.

    enc_lengths [B] (in subsampled encoder frames): multi-utterance batches
    mask attention beyond each sequence's length, so padded rows cannot
    contaminate real frames (the reference is strictly batch=1 and has no
    such mask).

    att_chunk (encoder frames): STREAMING-EQUIVALENT chunked attention for
    training -- frame i attends to its own chunk [c*C, (c+1)*C) plus the
    `att_left` frames before the chunk start, exactly the visibility the
    cache-aware streaming step gives it (NeMo's cache-aware training
    regime; batch mode is otherwise fully bidirectional, which streaming
    inference never is). Pass cc.chunk_enc_len to match a latency mode."""
    x = conv_subsampling(params.subsampling, mel)
    Tp = x.shape[1]
    pos = jnp.asarray(pos_emb_descending(Tp, cfg.d_model), dtype=x.dtype)

    mask = None
    if enc_lengths is not None:
        j = jnp.arange(Tp, dtype=jnp.int32)
        invalid = j[None, :] >= enc_lengths[:, None]          # [B, T']
        mask = jnp.where(invalid, jnp.float32(-1e9), 0.0)[:, None, None, :]
    if att_chunk is not None:
        i = jnp.arange(Tp, dtype=jnp.int32)
        start = (i // att_chunk) * att_chunk                  # chunk starts
        j = jnp.arange(Tp, dtype=jnp.int32)
        vis = ((j[None, :] < start[:, None] + att_chunk)
               & (j[None, :] >= start[:, None] - att_left))   # [T', T']
        cmask = jnp.where(vis, 0.0, jnp.float32(-1e9))[None, None]
        mask = cmask if mask is None else mask + cmask

    def body(h, lp):
        pos_heads = project_pos(lp.attn_pos_w, pos.astype(h.dtype),
                                cfg.n_heads, cfg.d_head)
        y, _, _, _ = conformer_layer(lp, h, pos_heads, mask=mask,
                                     n_heads=cfg.n_heads, d_head=cfg.d_head)
        return y, None

    if remat:
        body = jax.checkpoint(body)
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
    each leaf's second dim ([L, B, ...]).

    The K/V caches are RING buffers of kv_len = C + chunk slots holding the
    last n_seg = kv_len/chunk chunks per layer; `phase` [B] is the next
    segment each stream will overwrite. Only one segment per stream is
    written per step -- the reference's shift-window cache
    (src/nemo-stream.cpp:457-484) rewrites all 70 frames of K and V in every
    layer every chunk, which profiling showed dominating the step. Slot
    ordering is reconciled with relative positions by computing the bias in
    time order (skew trick) and permuting it to slot order with a one-hot
    matmul built from `phase` (see rel_pos_mha_ring).

    `valid_len` mirrors the reference's host-side cache_valid_len
    (src/nemo-stream.h:239)."""

    k_cache: Any      # [L, B, H, KV, Dh] ring (head-major; int8 if
    v_cache: Any      #   cc.kv_cache_int8; [L, B, H, KV, Dh/2] int8
    #                     nibble-packed if cc.kv_cache_int4; else dtype).
    #                     cc.shared_cache: k_cache is the X-RING of
    #                     post-norm pre-projection activations
    #                     [L, B, 1, KV, D] (K/V recomputed per step) and
    #                     v_cache a [L, B, 1, KV, 0] placeholder -- same
    #                     ranks, so ring rolls / slot ops / shardings
    #                     (all rank- or axis-generic) apply unchanged.
    k_scale: Any      # [L, B, H, n_seg] f32 per-segment dequant scales
    v_scale: Any      #   (ones / unused when the ring is not quantized)
    conv_cache: Any   # [L, B, K-1, D]
    valid_len: Any    # [B] int32 (valid cached frames, capped at C)
    phase: Any        # [B] int32 (next ring segment to write)


def init_encoder_state(cfg: ModelConfig, cc: CacheConfig, batch: int,
                       dtype=jnp.float32) -> EncoderState:
    L, D = cfg.n_layers, cfg.d_model
    kv = cc.kv_len
    assert kv % cc.chunk_enc_len == 0, (
        f"kv_len {kv} must be a multiple of chunk_enc_len "
        f"{cc.chunk_enc_len} for the ring cache (true for all standard "
        f"latency modes)")
    H, DH = cfg.n_heads, cfg.d_head
    n_seg = kv // cc.chunk_enc_len
    if cc.kv_cache_int4:
        ring_dtype, d_ring = jnp.int8, DH // 2      # two nibbles per byte
    elif cc.kv_cache_int8:
        ring_dtype, d_ring = jnp.int8, DH
    else:
        ring_dtype, d_ring = dtype, DH
    if cc.shared_cache:
        # one x-ring shared by K and V: half the attention state bytes
        return EncoderState(
            k_cache=jnp.zeros((L, batch, 1, kv, D), ring_dtype),
            v_cache=jnp.zeros((L, batch, 1, kv, 0), ring_dtype),
            k_scale=jnp.ones((L, batch, 1, n_seg), jnp.float32),
            v_scale=jnp.ones((L, batch, 1, n_seg), jnp.float32),
            conv_cache=jnp.zeros((L, batch, cc.conv_cache_size, D), dtype),
            valid_len=jnp.zeros((batch,), jnp.int32),
            phase=jnp.zeros((batch,), jnp.int32),
        )
    return EncoderState(
        k_cache=jnp.zeros((L, batch, H, kv, d_ring), ring_dtype),
        v_cache=jnp.zeros((L, batch, H, kv, d_ring), ring_dtype),
        k_scale=jnp.ones((L, batch, H, n_seg), jnp.float32),
        v_scale=jnp.ones((L, batch, H, n_seg), jnp.float32),
        conv_cache=jnp.zeros((L, batch, cc.conv_cache_size, D), dtype),
        valid_len=jnp.zeros((batch,), jnp.int32),
        phase=jnp.zeros((batch,), jnp.int32),
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
    B, Q, _ = x.shape

    C = cc.att_left_context
    kv = C + Q
    n_seg = kv // Q

    # Ring geometry (slot order): segment s = slots [s*Q, (s+1)*Q); segment
    # s holds the chunk written a = ((phase-1-s) mod n_seg) + 1 chunks ago
    # (a = n_seg -> the stale segment about to be overwritten, always
    # outside the window). The CURRENT chunk occupies Q virtual slots
    # appended after the ring (slot index kv..kv+Q-1, distance d = i - j).
    #
    # The phase is a SCALAR inside the step: all advancing streams write in
    # lockstep at the same segment (a per-stream write offset would lower
    # to a TPU scatter, measured 18x slower). Streams that skip steps are
    # realigned by the serving engine on resume (a cheap ring roll), so
    # per-stream semantics stay exact; non-advancing streams' outputs are
    # discarded and their segment content is restored below.
    # INVARIANT: all advancing streams share ONE ring phase (lockstep
    # segment writes; the serving engine realigns lagging slots before they
    # re-enter, serving.py). A caller violating this would silently read
    # wrong attention windows, so the output is NaN-poisoned when the
    # invariant fails -- loud instead of wrong (a data-dependent raise is
    # not expressible inside jit).
    if step_mask is not None:
        phase_s = jnp.max(jnp.where(step_mask, state.phase, -1))
        phase_uniform = jnp.all(
            jnp.where(step_mask, state.phase == phase_s, True))
    else:
        phase_s = state.phase[0]
        phase_uniform = jnp.all(state.phase == phase_s)
    j = jnp.arange(kv, dtype=jnp.int32)
    s_j, o_j = j // Q, j % Q
    age = jnp.mod(phase_s - 1 - s_j, n_seg) + 1              # [kv]

    # chronological->slot one-hot permutation for the position bias
    # (rel_pos_mha_ring computes the bias in time order with the skew trick
    # and permutes it with this tiny matmul -- gathers are VPU-slow).
    # Ring slot j holds chronological index c*Q + o_j with c = n_seg-1-age
    # (the stale age==n_seg segment maps nowhere -> zero column, masked);
    # the Q appended current-chunk slots map to the last chron segment.
    chron_ring = (n_seg - 1 - age) * Q + o_j                 # [kv]
    chron_new = (n_seg - 1) * Q + jnp.arange(Q, dtype=jnp.int32)
    chron = jnp.concatenate([chron_ring, chron_new])         # [kv+Q]
    t = jnp.arange(kv, dtype=jnp.int32)
    pos_perm = (t[:, None] == chron[None, :]).astype(jnp.float32)

    i = jnp.arange(Q, dtype=jnp.int32)
    # distance from query i to ring slot j: d = i - o_j + Q * age
    d_ring = i[:, None] - o_j[None, :] + Q * age[None, :]    # [Q, kv]
    d_new = i[:, None] - i[None, :]                          # [Q, Q]
    d = jnp.concatenate([d_ring, d_new], axis=-1)            # [Q, kv+Q]

    # validity: ring slot valid iff its whole segment is within the cached
    # window (age*Q <= valid_len; the stale segment fails since n_seg*Q > C);
    # the appended current chunk is always valid
    ring_valid = (age[None, :] * Q) <= state.valid_len[:, None]   # [B, kv]
    valid = jnp.concatenate(
        [ring_valid, jnp.ones((B, Q), bool)], axis=-1)       # [B, kv+Q]
    mask = jnp.where(valid, 0.0, jnp.float32(-1e9))[:, None, None, :]
    if cc.strict_right_context:
        # intra-chunk lookahead limit (the reference's TODO at
        # src/nemo-stream.cpp:446): key more than R ahead of query i
        future = d < -cc.att_right_context                   # [Q, kv+Q]
        mask = mask + jnp.where(future, jnp.float32(-1e9), 0.0)[None, None]

    # Layers scan: rings are READ-ONLY inside; each layer emits its new
    # chunk K/V [B, Q, D] as stacked ys, and ONE batched segment write per
    # step updates all layers afterwards -- Q rows per stream per layer
    # instead of the reference's full-window rewrite.
    #
    # Attention impl (NEMOTRON_TPU_ATTN):
    #   'xla'    -- rings in the scan xs (per-layer dynamic slice) + einsum
    #               chain (rel_pos_mha_ring);
    #   'pallas' -- rings stay stacked in HBM as loop-invariant operands;
    #               the fused kernel DMAs one layer's block per call and
    #               keeps scores/softmax in VMEM (rel_pos_mha_ring_fused);
    #   'pallas-interpret' -- same, interpreter mode (CPU tests).
    import os

    attn_impl = os.environ.get("NEMOTRON_TPU_ATTN", "xla")
    block_b = int(os.environ.get("NEMOTRON_TPU_ATTN_BLOCK", "8"))
    # per-layer-group lookahead limits (NeMo per-group right context; the
    # reference's limitation #2, docs/STREAMING.md:540-548) ride the scan
    # as a per-layer scalar; the fused pallas kernel takes a layer-
    # invariant mask, so the pattern forces the XLA attention path
    rcs = cc.rc_schedule(cfg.n_layers)
    shared = cc.shared_cache
    use_fused = (attn_impl.startswith("pallas") and B % block_b == 0
                 and rcs is None and not cc.kv_cache_int4 and not shared)
    if attn_impl.startswith("pallas") and not use_fused:
        _warn_pallas_fallback(
            "per-layer right-context schedule set" if rcs is not None
            else "int4 K/V rings" if cc.kv_cache_int4
            else "shared x-ring cache" if shared
            else f"batch {B} not divisible by block {block_b}")
    rc_arr = None if rcs is None else jnp.asarray(rcs, jnp.int32)

    def body(carry, per_layer):
        h, cv_all, l = carry
        if use_fused:
            lp, ph, ks, vs = per_layer
        elif rc_arr is not None:
            lp, ph, kr, vr, ks, vs, rc_l = per_layer
        else:
            lp, ph, kr, vr, ks, vs = per_layer
        if rc_arr is None:
            lmask = mask
        else:
            # key more than rc_l ahead of query i is masked for this layer
            lmask = mask + jnp.where(d < -rc_l, jnp.float32(-1e9),
                                     jnp.float32(0.0))[None, None]
        cvc = jax.lax.dynamic_index_in_dim(cv_all, l, 0, keepdims=False)
        if cc.kv_quant_max is not None:
            # per-segment dequant scales expanded to per-slot columns
            kcols = jnp.repeat(ks, Q, axis=-1)           # [B, H, kv]
            vcols = jnp.repeat(vs, Q, axis=-1)
        elif use_fused:
            kcols = vcols = jnp.ones((B, cfg.n_heads, kv), jnp.float32)
        else:
            kcols = vcols = None
        if shared:
            # shared x-ring: dequantize the cached activations and
            # recompute this layer's K/V on the MXU (compute-for-HBM
            # trade; see CacheConfig.shared_cache). The dequant happens
            # BEFORE the projection, so no scale columns ride the scores.
            from ..ops.quant import qmm

            x_r = kr[:, 0]                            # [B, kv, D]
            if cc.kv_quant_max is not None:
                x_r = (x_r.astype(jnp.float32)
                       * kcols[:, 0, :, None])        # per-slot scales
            x_r = x_r.astype(h.dtype)

            def heads_of(t):   # [B, kv, D] -> [B, H, kv, Dh]
                return jnp.swapaxes(
                    t.reshape(B, kv, cfg.n_heads, cfg.d_head), 1, 2)

            k_r = heads_of(qmm(x_r, lp.attn_k_w))
            v_r = heads_of(qmm(x_r, lp.attn_v_w))
            cap: dict = {}
            y, _nk, _nv, ncv = conformer_layer(
                lp, h, ph, mask=lmask,
                ring=(k_r, v_r, pos_perm, None, None),
                conv_cache=cvc, n_heads=cfg.n_heads, d_head=cfg.d_head,
                ln_capture=cap)
            cv_all = jax.lax.dynamic_update_index_in_dim(cv_all, ncv, l, 0)
            new_x = cap["norm_attn"]                  # [B, Q, D] ring write
            ys = (new_x, y) if capture else (new_x,)
            return (y, cv_all, l + 1), ys
        if use_fused:
            y, nk, nv, ncv = conformer_layer(
                lp, h, ph, mask=lmask, conv_cache=cvc,
                ring_fused=(l, state.k_cache, state.v_cache, pos_perm,
                            kcols, vcols, block_b,
                            attn_impl == "pallas-interpret"),
                n_heads=cfg.n_heads, d_head=cfg.d_head)
        else:
            y, nk, nv, ncv = conformer_layer(
                lp, h, ph, mask=lmask,
                ring=(kr, vr, pos_perm, kcols, vcols, cc.kv_cache_int4),
                conv_cache=cvc, n_heads=cfg.n_heads, d_head=cfg.d_head)
        cv_all = jax.lax.dynamic_update_index_in_dim(cv_all, ncv, l, 0)
        ys = (nk, nv, y) if capture else (nk, nv)
        return (y, cv_all, l + 1), ys

    # NEMOTRON_TPU_SCAN_UNROLL > 1 trades compile time for static ring
    # slices (the scan's per-layer dynamic-slice of the K/V rings costs
    # ~3x the raw read bandwidth; unrolling lets XLA slice statically).
    # Measured on v5e at the headline config: full unroll = -4% step time
    # (112 vs 116 ms at B=768; docs/PERFORMANCE.md), so TPU defaults to
    # full unroll; CPU (tests, dryruns) keeps the rolled scan for fast
    # compiles. The env knob overrides either way.
    unroll_env = os.environ.get("NEMOTRON_TPU_SCAN_UNROLL")
    if unroll_env is not None:
        unroll = int(unroll_env)
    elif jax.default_backend() == "cpu":
        unroll = 1
    else:
        unroll = cfg.n_layers
    if use_fused:
        xs = (params.layers, pos_heads, state.k_scale, state.v_scale)
    elif rc_arr is not None:
        xs = (params.layers, pos_heads, state.k_cache, state.v_cache,
              state.k_scale, state.v_scale, rc_arr)
    else:
        xs = (params.layers, pos_heads, state.k_cache, state.v_cache,
              state.k_scale, state.v_scale)
    (x, ncv, _), ys = jax.lax.scan(
        body, (x, state.conv_cache, jnp.int32(0)), xs, unroll=unroll)
    if shared:
        # [L, B, Q, D] -> [L, B, 1, Q, D] to match the x-ring rank
        k_new, v_new = ys[0][:, :, None], None
    else:
        k_new, v_new = ys[0], ys[1]                      # [L, B, H, Q, Dh]

    new_k_scale, new_v_scale = state.k_scale, state.v_scale
    if cc.kv_quant_max is not None:
        # quantize the new segment per (layer, stream, head); the ring is
        # int8 (int4: nibble-packed int8), the CURRENT chunk attends at
        # full precision inside the scan
        qmax = cc.kv_quant_max

        def quant_seg(seg):
            # per-(layer, stream, head, segment) scale for BOTH widths:
            # per-slot scales were tried for int4 and measured identical
            # (K/V are LayerNorm'd, so slot amaxes within a segment agree;
            # the residual error is intrinsic int4 rounding, ~1/14 of
            # amax per element) while costing 14x the scale state.
            amax = jnp.max(jnp.abs(seg).astype(jnp.float32), axis=(-2, -1))
            sc = jnp.maximum(amax, 1e-12) / qmax         # [L, B, H]
            q = jnp.clip(jnp.round(seg.astype(jnp.float32)
                                   / sc[..., None, None]), -qmax, qmax
                         ).astype(jnp.int8)
            if cc.kv_cache_int4:
                # nibble-pack: mirror image of rel_attention.unpack_int4
                q = jax.lax.bitcast_convert_type(
                    q.reshape(*q.shape[:-1], q.shape[-1] // 2, 2
                              ).astype(jnp.int4), jnp.int8)
            return q, sc

        k_new, k_seg_scale = quant_seg(k_new)
        if not shared:
            v_new, v_seg_scale = quant_seg(v_new)

    off = phase_s * Q
    if step_mask is not None:
        # continuous batching: a non-advancing stream keeps its old segment
        # content (cheap: the where is on the [L, B, H, Q, Dh] slab only)
        old_k = jax.lax.dynamic_slice_in_dim(state.k_cache, off, Q, axis=3)
        m = step_mask[None, :, None, None, None]
        k_new = jnp.where(m, k_new.astype(state.k_cache.dtype), old_k)
        if not shared:
            old_v = jax.lax.dynamic_slice_in_dim(state.v_cache, off, Q,
                                                 axis=3)
            v_new = jnp.where(m, v_new.astype(state.v_cache.dtype), old_v)
        ncv = jnp.where(m[..., 0], ncv, state.conv_cache)
        if cc.kv_quant_max is not None:
            seg = phase_s  # scalar segment index
            old_ks = jax.lax.dynamic_slice_in_dim(state.k_scale, seg, 1, 3)
            mk = step_mask[None, :, None]
            k_seg_scale = jnp.where(mk, k_seg_scale, old_ks[..., 0])
            if not shared:
                old_vs = jax.lax.dynamic_slice_in_dim(state.v_scale, seg,
                                                      1, 3)
                v_seg_scale = jnp.where(mk, v_seg_scale, old_vs[..., 0])

    nk = jax.lax.dynamic_update_slice_in_dim(
        state.k_cache, k_new.astype(state.k_cache.dtype), off, axis=3)
    nv = state.v_cache if shared else jax.lax.dynamic_update_slice_in_dim(
        state.v_cache, v_new.astype(state.v_cache.dtype), off, axis=3)
    if cc.kv_quant_max is not None:
        new_k_scale = jax.lax.dynamic_update_slice_in_dim(
            state.k_scale, k_seg_scale[..., None], phase_s, axis=3)
        if not shared:
            new_v_scale = jax.lax.dynamic_update_slice_in_dim(
                state.v_scale, v_seg_scale[..., None], phase_s, axis=3)

    new_valid = jnp.minimum(state.valid_len + Q, C)
    new_phase = jnp.mod(state.phase + 1, n_seg)
    if step_mask is not None:
        new_valid = jnp.where(step_mask, new_valid, state.valid_len)
        new_phase = jnp.where(step_mask, new_phase, state.phase)

    new_state = EncoderState(
        k_cache=nk,
        v_cache=nv,
        k_scale=new_k_scale,
        v_scale=new_v_scale,
        conv_cache=ncv,
        valid_len=new_valid,
        phase=new_phase,
    )
    enc_out = x[:, : cc.valid_out_len, :]
    enc_out = jnp.where(phase_uniform, enc_out, jnp.nan)
    if capture:
        inter = {"pre_encode_out": pre_encode_out,
                 "layer_out": ys[1] if shared else ys[2],  # [L, B, T, D]
                 "encoder_out": enc_out}
        return enc_out, new_state, inter
    return enc_out, new_state


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def realign_ring(enc_state: "EncoderState", slot, delta, chunk_len: int):
    """Roll one stream's K/V ring forward by `delta` segments and bump its
    phase, so a stream that skipped engine steps re-enters the global
    lockstep write phase with its content->age mapping preserved exactly.
    Called by the serving engine when a lagging slot resumes."""
    shift = delta * chunk_len
    k = jnp.roll(enc_state.k_cache[:, slot], shift, axis=-2)
    v = jnp.roll(enc_state.v_cache[:, slot], shift, axis=-2)
    n_seg = enc_state.k_cache.shape[-2] // chunk_len
    ks = jnp.roll(enc_state.k_scale[:, slot], delta, axis=-1)
    vs = jnp.roll(enc_state.v_scale[:, slot], delta, axis=-1)
    return EncoderState(
        k_cache=enc_state.k_cache.at[:, slot].set(k),
        v_cache=enc_state.v_cache.at[:, slot].set(v),
        k_scale=enc_state.k_scale.at[:, slot].set(ks),
        v_scale=enc_state.v_scale.at[:, slot].set(vs),
        conv_cache=enc_state.conv_cache,
        valid_len=enc_state.valid_len,
        phase=enc_state.phase.at[slot].set(
            jnp.mod(enc_state.phase[slot] + delta, n_seg)),
    )


def realign_rings(enc_state: "EncoderState", deltas, chunk_len: int):
    """Batched `realign_ring`: roll EVERY stream's K/V ring forward by its
    own `deltas[b]` segments (0 = no-op) in one program.

    The multihost ragged engine (parallel/multihost.py MultihostServing)
    cannot make per-slot data-dependent realign calls -- each process only
    knows its own slots' phases, and a divergent device-call sequence
    desyncs the SPMD programs -- so it issues this once per collective
    step with a globally assembled delta vector. Cost: one gather pass
    over both rings per step even when all deltas are 0 (the price of
    collective determinism; the single-process engine keeps the cheaper
    per-slot realign_ring)."""
    KV = enc_state.k_cache.shape[-2]
    n_seg = KV // chunk_len
    deltas = deltas.astype(jnp.int32)
    shift = deltas * chunk_len                              # [B]
    pos = jnp.arange(KV, dtype=jnp.int32)[None, :]          # [1, KV]
    idx = jnp.mod(pos - shift[:, None], KV)                 # [B, KV]

    def roll_kv(x):  # [L, B, H, KV, Dh]
        # vmapped per-stream take: the indices stay [B, KV] and lower to
        # an XLA gather with a batching dim. The take_along_axis
        # formulation (broadcast indices to the ring's full shape) was
        # measured to OOM at serving scale -- the int32 index tensor
        # alone is 4x the int8 ring's bytes (B=800 full-size: 6.6 GB of
        # indices for a 1.65 GB ring).
        return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=2),
                        in_axes=(1, 0), out_axes=1)(x, idx)

    spos = jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    sidx = jnp.mod(spos - deltas[:, None], n_seg)           # [B, n_seg]

    def roll_seg(x):  # [L, B, H, n_seg]
        i = sidx.reshape((1, sidx.shape[0], 1, n_seg))
        i = jnp.broadcast_to(i, x.shape[:3] + (n_seg,))
        return jnp.take_along_axis(x, i, axis=3)

    return EncoderState(
        k_cache=roll_kv(enc_state.k_cache),
        v_cache=roll_kv(enc_state.v_cache),
        k_scale=roll_seg(enc_state.k_scale),
        v_scale=roll_seg(enc_state.v_scale),
        conv_cache=enc_state.conv_cache,
        valid_len=enc_state.valid_len,
        phase=jnp.mod(enc_state.phase + deltas, n_seg),
    )


def ring_to_chronological(ring, phase, chunk_len: int):
    """Host-side debug/interop: reorder a head-major ring cache
    [L, B, H, KV, Dh] into the reference's chronological window layout
    [L, B, KV-chunk, H*Dh] (oldest first, the stale segment dropped)."""
    import numpy as np

    ring = np.asarray(ring)
    phase = np.asarray(phase)
    L, B, H, KV, DH = ring.shape
    Q = chunk_len
    n = KV // Q
    out = np.zeros((L, B, KV - Q, H * DH), ring.dtype)
    for b in range(B):
        segs = [(int(phase[b]) - a) % n for a in range(n - 1, 0, -1)]
        chron = np.concatenate(
            [ring[:, b, :, s * Q:(s + 1) * Q] for s in segs], axis=2)
        out[:, b] = chron.transpose(0, 2, 1, 3).reshape(L, KV - Q, H * DH)
    return out
