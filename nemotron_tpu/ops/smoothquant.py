"""SmoothQuant-style activation->weight difficulty migration for W8A8.

The W8A8 serving path quantizes activations per token (ops/quant.py
`qmm_w8a8`): one abs-max scale per row. A single outlier channel in a
LayerNorm output therefore crushes the resolution of every other channel
in that token. SmoothQuant (Xiao et al., 2022) migrates that difficulty
into the weights, exploiting that the four quantized-matmul inputs in a
conformer layer are LayerNorm outputs with per-channel affine params:

    y = LN(x) * gamma + beta          (feeds W)
    y @ W == (y / s) @ (s * W)        for any per-channel s > 0

so dividing (gamma, beta) by s and multiplying the matmul weight ROWS by
s is EXACT in float and changes only the int8 rounding behavior. With
    s_j = amax_act_j^alpha / amax_w_j^(1-alpha)
activation outliers shrink (easier per-token int8) while the weight
columns absorb them (weights are quantized per output column and tolerate
per-row rescaling well).

Fold sites (see models/encoder.py `conformer_layer`):
    norm_ff1  -> ffn1_w1
    norm_attn -> attn_q_w, attn_k_w, attn_v_w   (ONE shared s: qmm_shared
                 quantizes the activation once for all three)
    norm_conv -> conv_pw1_w
    norm_ff2  -> ffn2_w1

NOT foldable (input is not a LayerNorm output): ffn*_w2 (SiLU output),
attn_out_w (attention context), conv_pw2_w (SiLU output), attn_pos_w
(positional encodings, not activations).

Calibration runs the real batch encoder layer code (`conformer_layer`
with `ln_capture`) over representative audio, so the statistics can never
drift from the serving graph. The reference has no quantized-activation
path at all (its Q8_0/Q4_0 are weight-only, dequantized in ggml mul_mat,
/root/reference/src/nemo-ggml.cpp:187-247); this lever exists to defend
the beyond-reference W8A8 throughput headline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# (LN param prefix, matmul weights fed by that LN output)
FOLD_SITES = (
    ("norm_ff1", ("ffn1_w1",)),
    ("norm_attn", ("attn_q_w", "attn_k_w", "attn_v_w")),
    ("norm_conv", ("conv_pw1_w",)),
    ("norm_ff2", ("ffn2_w1",)),
)


def calibrate_ln_amax(params, cfg, mel, att_chunk: int | None = None,
                      att_left: int = 70) -> dict:
    """Per-channel abs-max of every fold-site LayerNorm output.

    Runs the batch encoder (optionally with streaming-equivalent chunked
    attention, matching serving visibility) as ONE jitted `lax.scan` over
    the stacked layers, capturing LN outputs via
    `conformer_layer(ln_capture=...)` and reducing them to abs-max inside
    the scan body. A single compile: calibrating the full-size model takes
    seconds, where an eager per-layer walk pays hundreds of tiny-op
    compiles (~20 min through a tunneled TPU).

    params: DENSE (unquantized) model params. mel: [B, T, n_mels] f32.
    Returns {site: np.ndarray [L, D]} of abs-max per layer per channel.
    """
    from functools import partial

    from ..models.encoder import conformer_layer
    from ..ops.conv import conv_subsampling
    from ..ops.rel_attention import pos_emb_descending, project_pos

    sites = [site for site, _ in FOLD_SITES]

    @partial(jax.jit, static_argnames=())
    def run(p, mel_in):
        x = conv_subsampling(p.subsampling, mel_in)
        Tp = x.shape[1]
        pos = jnp.asarray(pos_emb_descending(Tp, cfg.d_model), dtype=x.dtype)
        mask = None
        if att_chunk is not None:
            i = jnp.arange(Tp, dtype=jnp.int32)
            start = (i // att_chunk) * att_chunk
            j = jnp.arange(Tp, dtype=jnp.int32)
            vis = ((j[None, :] < start[:, None] + att_chunk)
                   & (j[None, :] >= start[:, None] - att_left))
            mask = jnp.where(vis, 0.0, jnp.float32(-1e9))[None, None]

        def body(h, lp):
            pos_heads = project_pos(lp.attn_pos_w, pos,
                                    cfg.n_heads, cfg.d_head)
            cap: dict = {}
            y, _, _, _ = conformer_layer(lp, h, pos_heads, mask=mask,
                                         n_heads=cfg.n_heads,
                                         d_head=cfg.d_head, ln_capture=cap)
            a = jnp.stack([jnp.max(jnp.abs(cap[s]), axis=(0, 1))
                           for s in sites])            # [n_sites, D]
            return y, a

        _, amax = jax.lax.scan(body, x, p.layers)      # [L, n_sites, D]
        return amax

    amax = np.asarray(run(params, jnp.asarray(mel, jnp.float32)),
                      np.float32)
    return {s: amax[:, i] for i, s in enumerate(sites)}


def smooth_params(params, amax: dict, alpha: float = 0.5,
                  s_clip: float = 100.0, return_scales: bool = False):
    """Fold per-channel smoothing scales into the model (EXACT in float).

    amax: output of `calibrate_ln_amax`. alpha: migration strength
    (0 = no migration, 1 = all difficulty onto the weights; 0.5 is the
    SmoothQuant default). Returns new DENSE params; quantize afterwards
    with `params.quantize_model_params(..., mode='w8a8')`.
    With return_scales=True also returns {site: s [L, D]} (the LN outputs
    of the folded model are the originals divided by s).
    """
    layers = params.layers
    updates: dict = {}
    scales: dict = {}
    for site, weight_names in FOLD_SITES:
        ws = [np.asarray(getattr(layers, w), np.float32)
              for w in weight_names]                     # each [L, D, out]
        a = np.asarray(amax[site], np.float32)           # [L, D]
        w_amax = np.max(np.abs(np.concatenate(ws, axis=-1)), axis=-1)
        s = (np.maximum(a, 1e-5) ** alpha
             / np.maximum(w_amax, 1e-5) ** (1.0 - alpha))
        s = np.clip(s, 1.0 / s_clip, s_clip)             # [L, D]
        scales[site] = s
        g = np.asarray(getattr(layers, site + "_w"), np.float32)
        b = np.asarray(getattr(layers, site + "_b"), np.float32)
        updates[site + "_w"] = g / s
        updates[site + "_b"] = b / s
        for name, w in zip(weight_names, ws):
            updates[name] = w * s[..., :, None]
    out = dataclasses.replace(
        params, layers=dataclasses.replace(layers, **updates))
    return (out, scales) if return_scales else out


def attach_static_act_scales(qparams, amax: dict, fold_scales: dict,
                             margin: float = 1.0):
    """Attach STATIC per-tensor activation scales to the fold-site W8A8
    weights (see QTensorW8A8.act_scale): removes the per-token abs-max
    reduction from the serving step -- the quantize fuses into the LN.

    The folded model's LN outputs are the calibrated ones divided by the
    fold scales, so the static scale per (site, layer) is
        max_j(amax[site][l, j] / s[site][l, j]) * margin / 127
    exactly -- no second calibration pass. margin > 1 leaves headroom for
    activations beyond the calibration set (beyond it, int8 saturates).
    """
    from ..ops.quant import QTensorW8A8

    layers = qparams.layers
    updates: dict = {}
    for site, weight_names in FOLD_SITES:
        folded_amax = np.asarray(amax[site], np.float32) / fold_scales[site]
        a = np.max(folded_amax, axis=-1) * margin        # [L]
        act_scale = np.maximum(a, 1e-8).astype(np.float32) / 127.0
        for name in weight_names:
            w = getattr(layers, name)
            assert isinstance(w, QTensorW8A8), name
            updates[name] = dataclasses.replace(w, act_scale=act_scale)
    return dataclasses.replace(
        qparams, layers=dataclasses.replace(layers, **updates))


def smooth_quantize(params, cfg, mel, alpha: float = 0.5,
                    att_chunk: int | None = None,
                    static_act: bool = False, margin: float = 1.0):
    """Calibrate + fold + W8A8-quantize in one call.

    params must be dense f32. Returns W8A8 params whose f32 (pre-rounding)
    function is identical to the input's. static_act=True additionally
    attaches calibrated static activation scales to the fold-site weights
    (mode 'w8a8-sq-static'): faster serving step, activations beyond the
    calibration range saturate.
    """
    from ..params import quantize_model_params

    a = calibrate_ln_amax(params, cfg, mel, att_chunk=att_chunk)
    smoothed, s = smooth_params(params, a, alpha=alpha, return_scales=True)
    qp = quantize_model_params(smoothed, mode="w8a8")
    if static_act:
        qp = attach_static_act_scales(qp, a, s, margin=margin)
    return qp
