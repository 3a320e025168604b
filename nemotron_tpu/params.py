"""Parameter pytrees and GGUF <-> pytree mapping.

Tensor-name mapping mirrors the reference loader
(reference src/nemo-ggml.cpp:258-356). Conventions used throughout this
framework (chosen for TPU / jnp idiom, NOT the ggml layout):

  - Linear weights are stored as [in, out] so the forward pass is `x @ w`.
    (GGUF/PyTorch store [out, in]; the loader transposes.)
  - Conv2d kernels are HWIO: [kT, kF, in_ch, out_ch] for
    lax.conv_general_dilated with ('NHWC', 'HWIO', 'NHWC').
  - The depthwise conv1d weight is [kernel, d_model] (the reference converter
    already stores it this way, scripts/convert_to_gguf.py:331-336).
  - Conformer layer params are stacked along a leading layer axis so the
    encoder can `lax.scan` over layers (one trace instead of 24).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import numpy as np

from . import gguf as gguf_mod
from .config import ModelConfig
from .ops.quant import (QTensor, QTensorW8A8, quantize_tensor,
                        quantize_tensor_w8a8, should_quantize)


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class SubsamplingParams:
    """Causal ConvSubsampling (reference src/nemo-ggml.cpp:877-952)."""

    conv0_w: Any   # [3, 3, 1, 256]    full conv, stride 2
    conv0_b: Any   # [256]
    conv2_w: Any   # [3, 3, 1, 256]    depthwise, stride 2
    conv2_b: Any   # [256]
    conv3_w: Any   # [1, 1, 256, 256]  pointwise
    conv3_b: Any   # [256]
    conv5_w: Any   # [3, 3, 1, 256]    depthwise, stride 2
    conv5_b: Any   # [256]
    conv6_w: Any   # [1, 1, 256, 256]  pointwise
    conv6_b: Any   # [256]
    out_w: Any     # [4352, 1024]
    out_b: Any     # [1024]


@_pytree_dataclass
class ConformerLayerParams:
    """One (or L stacked) Conformer layer(s).

    All arrays carry a leading layer axis when stacked (see
    `stack_layers`). Residual structure: reference src/nemo-ggml.cpp:768-813.
    """

    norm_ff1_w: Any      # [D]
    norm_ff1_b: Any
    ffn1_w1: Any         # [D, 4D]
    ffn1_w2: Any         # [4D, D]
    norm_attn_w: Any
    norm_attn_b: Any
    attn_q_w: Any        # [D, D]
    attn_k_w: Any
    attn_v_w: Any
    attn_pos_w: Any
    attn_out_w: Any
    pos_bias_u: Any      # [H, d_head]
    pos_bias_v: Any
    norm_conv_w: Any
    norm_conv_b: Any
    conv_pw1_w: Any      # [D, 2D]
    conv_dw_w: Any       # [K, D]
    conv_ln_w: Any
    conv_ln_b: Any
    conv_pw2_w: Any      # [D, D]
    norm_ff2_w: Any
    norm_ff2_b: Any
    ffn2_w1: Any
    ffn2_w2: Any
    norm_final_w: Any
    norm_final_b: Any


@_pytree_dataclass
class DecoderParams:
    """RNN-T prediction network: Embedding + 2-layer LSTM
    (reference src/nemo-ggml.cpp:333-344, docs/TENSOR_SHAPES.md:69-83)."""

    embedding: Any      # [vocab, 640]
    w_ih: Any           # [2, 640, 2560]  (layer, in, 4*hidden) gates [i,f,g,o]
    w_hh: Any           # [2, 640, 2560]
    b_ih: Any           # [2, 2560]
    b_hh: Any           # [2, 2560]


@_pytree_dataclass
class JointParams:
    """Joint network (reference src/nemo-ggml.cpp:347-352)."""

    enc_w: Any   # [1024, 640]
    enc_b: Any   # [640]
    dec_w: Any   # [640, 640]
    dec_b: Any   # [640]
    out_w: Any   # [640, 1025]
    out_b: Any   # [1025]


@_pytree_dataclass
class PreprocessorParams:
    filterbank: Any   # [128, 257]
    window: Any       # [400]


@_pytree_dataclass
class CtcParams:
    """Optional auxiliary CTC head (NeMo hybrid RNNT-CTC convention:
    `ctc_decoder.decoder_layers.0.{weight,bias}`, a 1x1 conv = Linear
    d_model -> vocab incl. blank). The reference engine has no CTC path;
    NeMo's cache-aware checkpoints frequently ship hybrid heads, so the
    framework decodes either way (models/ctc.py)."""

    out_w: Any   # [d_model, vocab]
    out_b: Any   # [vocab]


@_pytree_dataclass
class ModelParams:
    subsampling: SubsamplingParams
    layers: ConformerLayerParams     # stacked [L, ...]
    decoder: DecoderParams
    joint: JointParams
    preprocessor: PreprocessorParams
    ctc: Any = None                  # CtcParams | None (hybrid checkpoints)


# ---------------------------------------------------------------------------
# GGUF -> pytree
# ---------------------------------------------------------------------------

def _conv2d_hwio(w: np.ndarray) -> np.ndarray:
    """PyTorch OIHW [O, I, kT, kF] -> HWIO [kT, kF, I, O]."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _linear(w) -> np.ndarray | QTensor:
    """PyTorch [out, in] -> [in, out]. QTensor-aware: Q8_0 blocks run along
    the contiguous (in) dim in GGUF, which becomes the contraction-dim
    blocking QTensor expects after the transpose."""
    if isinstance(w, QTensor):
        return QTensor(q=np.ascontiguousarray(w.q.T),
                       scale=np.ascontiguousarray(w.scale.T))
    return np.ascontiguousarray(w.T)


def params_from_arrays(t: dict[str, np.ndarray], cfg: ModelConfig) -> ModelParams:
    """Build the param pytree from a name->array dict using the reference's
    tensor names (reference src/nemo-ggml.cpp:258-356)."""

    sub = SubsamplingParams(
        conv0_w=_conv2d_hwio(t["encoder.pre_encode.conv.0.weight"]),
        conv0_b=t["encoder.pre_encode.conv.0.bias"],
        conv2_w=_conv2d_hwio(t["encoder.pre_encode.conv.2.weight"]),
        conv2_b=t["encoder.pre_encode.conv.2.bias"],
        conv3_w=_conv2d_hwio(t["encoder.pre_encode.conv.3.weight"]),
        conv3_b=t["encoder.pre_encode.conv.3.bias"],
        conv5_w=_conv2d_hwio(t["encoder.pre_encode.conv.5.weight"]),
        conv5_b=t["encoder.pre_encode.conv.5.bias"],
        conv6_w=_conv2d_hwio(t["encoder.pre_encode.conv.6.weight"]),
        conv6_b=t["encoder.pre_encode.conv.6.bias"],
        out_w=_linear(t["encoder.pre_encode.out.weight"]),
        out_b=t["encoder.pre_encode.out.bias"],
    )

    def layer(i: int) -> ConformerLayerParams:
        p = f"encoder.layers.{i}"
        dw = t[f"{p}.conv.depthwise_conv.weight"]
        if dw.ndim == 3:
            # raw NeMo layout (D, 1, K) -> converter layout (K, D)
            dw = dw.squeeze(1).T
        pw1 = t[f"{p}.conv.pointwise_conv1.weight"]
        if not isinstance(pw1, QTensor) and pw1.ndim == 3:
            pw1 = pw1.squeeze(2)
        pw2 = t[f"{p}.conv.pointwise_conv2.weight"]
        if not isinstance(pw2, QTensor) and pw2.ndim == 3:
            pw2 = pw2.squeeze(2)
        return ConformerLayerParams(
            norm_ff1_w=t[f"{p}.norm_feed_forward1.weight"],
            norm_ff1_b=t[f"{p}.norm_feed_forward1.bias"],
            ffn1_w1=_linear(t[f"{p}.feed_forward1.linear1.weight"]),
            ffn1_w2=_linear(t[f"{p}.feed_forward1.linear2.weight"]),
            norm_attn_w=t[f"{p}.norm_self_att.weight"],
            norm_attn_b=t[f"{p}.norm_self_att.bias"],
            attn_q_w=_linear(t[f"{p}.self_attn.linear_q.weight"]),
            attn_k_w=_linear(t[f"{p}.self_attn.linear_k.weight"]),
            attn_v_w=_linear(t[f"{p}.self_attn.linear_v.weight"]),
            attn_pos_w=_linear(t[f"{p}.self_attn.linear_pos.weight"]),
            attn_out_w=_linear(t[f"{p}.self_attn.linear_out.weight"]),
            pos_bias_u=t[f"{p}.self_attn.pos_bias_u"],
            pos_bias_v=t[f"{p}.self_attn.pos_bias_v"],
            norm_conv_w=t[f"{p}.norm_conv.weight"],
            norm_conv_b=t[f"{p}.norm_conv.bias"],
            conv_pw1_w=_linear(pw1),
            conv_dw_w=np.ascontiguousarray(dw),
            conv_ln_w=t[f"{p}.conv.batch_norm.weight"],
            conv_ln_b=t[f"{p}.conv.batch_norm.bias"],
            conv_pw2_w=_linear(pw2),
            norm_ff2_w=t[f"{p}.norm_feed_forward2.weight"],
            norm_ff2_b=t[f"{p}.norm_feed_forward2.bias"],
            ffn2_w1=_linear(t[f"{p}.feed_forward2.linear1.weight"]),
            ffn2_w2=_linear(t[f"{p}.feed_forward2.linear2.weight"]),
            norm_final_w=t[f"{p}.norm_out.weight"],
            norm_final_b=t[f"{p}.norm_out.bias"],
        )

    layers = stack_layers([layer(i) for i in range(cfg.n_layers)])

    dp = "decoder.prediction"
    decoder = DecoderParams(
        embedding=t[f"{dp}.embed.weight"],
        w_ih=np.stack([_linear(t[f"{dp}.dec_rnn.lstm.weight_ih_l{i}"]) for i in (0, 1)]),
        w_hh=np.stack([_linear(t[f"{dp}.dec_rnn.lstm.weight_hh_l{i}"]) for i in (0, 1)]),
        b_ih=np.stack([t[f"{dp}.dec_rnn.lstm.bias_ih_l{i}"] for i in (0, 1)]),
        b_hh=np.stack([t[f"{dp}.dec_rnn.lstm.bias_hh_l{i}"] for i in (0, 1)]),
    )

    joint = JointParams(
        enc_w=_linear(t["joint.enc.weight"]),
        enc_b=t["joint.enc.bias"],
        dec_w=_linear(t["joint.pred.weight"]),
        dec_b=t["joint.pred.bias"],
        out_w=_linear(t["joint.joint_net.2.weight"]),
        out_b=t["joint.joint_net.2.bias"],
    )

    pre = PreprocessorParams(
        filterbank=np.ascontiguousarray(
            t["preprocessor.featurizer.fb"].reshape(-1)[: cfg.n_mels * 257]
            .reshape(cfg.n_mels, 257)
        ),
        window=t["preprocessor.featurizer.window"].reshape(-1),
    )

    ctc = None
    cw = "ctc_decoder.decoder_layers.0.weight"
    if cw in t:
        w = t[cw]
        if not isinstance(w, QTensor) and w.ndim == 3:   # 1x1 conv (V, D, 1)
            w = w.squeeze(2)
        ctc = CtcParams(out_w=_linear(w),
                        out_b=t["ctc_decoder.decoder_layers.0.bias"])

    return ModelParams(sub, layers, decoder, joint, pre, ctc)


def stack_layers(layers: list[ConformerLayerParams]) -> ConformerLayerParams:
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)


_QUANT_LAYER_FIELDS = (
    "ffn1_w1", "ffn1_w2", "ffn2_w1", "ffn2_w2",
    "attn_q_w", "attn_k_w", "attn_v_w", "attn_pos_w", "attn_out_w",
    "conv_pw1_w", "conv_pw2_w",
)


def quantize_model_params(params: ModelParams,
                          mode: str = "q8_0") -> ModelParams:
    """Quantize the encoder conformer matmul weights (the reference's
    default quant pattern, scripts/convert_to_gguf.py:212-238). Subsampling,
    depthwise convs, norms, decoder and joint stay dense.

    mode:
      'q8_0'  -- weight-only, GGUF Q8_0-compatible per-32-block scales
                 (dequantized into the matmul; exact Q8_0 numerics)
      'w8a8'  -- dynamic int8 x int8 serving path: per-column weight scales
                 + per-token activation scales, runs on the MXU's
                 double-rate int8 path (accuracy: standard W8A8 behavior,
                 validate on real weights before production)"""
    from .ops.quant import dequantize

    quantize = {"q8_0": quantize_tensor, "w8a8": quantize_tensor_w8a8}[mode]
    layers = params.layers
    updates = {}
    for f in _QUANT_LAYER_FIELDS:
        w = getattr(layers, f)
        if isinstance(w, QTensor):
            if mode == "q8_0":
                continue
            w = np.asarray(dequantize(w))   # Q8_0 GGUF -> W8A8 serving mode
        elif isinstance(w, QTensorW8A8):
            if mode == "w8a8":
                continue
            w = (np.asarray(w.q, np.float32)
                 * np.asarray(w.col_scale)[..., None, :])
        else:
            w = np.asarray(w)
        updates[f] = quantize(w)
    layers = dataclasses.replace(layers, **updates)
    return dataclasses.replace(params, layers=layers)


def load_model(path: str, keep_quantized: bool = True,
               ) -> tuple[ModelParams, ModelConfig, list[str]]:
    """Load a GGUF file: (params, config, vocab).

    Mirrors the reference loader's hparam handling, including inferring
    kernel_size from the depthwise weight (reference src/nemo-ggml.cpp:320-324)
    rather than trusting the stale metadata value.

    With keep_quantized=True, Q8_0 tensors in the file stay quantized as
    QTensor leaves (bit-identical to the file blocks) and are dequantized on
    the fly in the matmul -- the reference's approach
    (src/nemo-ggml.cpp:187-247). Q4_0 is always dequantized to f32 (no native
    4-bit matmul path)."""
    g = gguf_mod.read_gguf(path)
    md = g.metadata

    def u32(key, default):
        return int(md.get(key, default))

    arrays: dict[str, object] = {}
    for name, tt in g.tensors.items():
        quantized_2d = (
            keep_quantized
            and tt.ggml_type in (gguf_mod.GGML_Q8_0, gguf_mod.GGML_Q4_0)
            and len(tt.shape) == 2 and tt.shape[1] % 32 == 0
            and should_quantize(name, np.empty(tt.shape)))
        if quantized_2d:
            unpack = (gguf_mod.q8_0_to_int8
                      if tt.ggml_type == gguf_mod.GGML_Q8_0
                      else gguf_mod.q4_0_to_int8)
            vals, scales = unpack(tt.raw, tt.n_elements)
            arrays[name] = QTensor(
                q=vals.reshape(tt.shape),
                scale=scales.reshape(tt.shape[0], tt.shape[1] // 32))
        else:
            arrays[name] = tt.to_numpy()
    dw = arrays.get("encoder.layers.0.conv.depthwise_conv.weight")
    kernel_size = 9
    if dw is not None:
        kernel_size = dw.shape[0] if dw.ndim == 2 else dw.shape[-1]

    # Dims the GGUF metadata doesn't carry (or carries stale -- the reference
    # hardcodes decoder dims as constants, src/nemo-ggml.h:130-133) are
    # inferred from weight shapes instead.
    emb = arrays["decoder.prediction.embed.weight"]
    cfg = ModelConfig(
        n_mels=u32("nemo.n_mels", 128),
        d_model=u32("nemo.d_model", 1024),
        n_heads=u32("nemo.n_heads", 8),
        d_head=u32("nemo.d_head", 128),
        d_ff=u32("nemo.d_ff", 4096),
        n_layers=u32("nemo.n_layers", 24),
        kernel_size=kernel_size,
        vocab_size=u32("nemo.vocab_size", emb.shape[0]),
        decoder_dim=emb.shape[1],
        joint_dim=arrays["joint.enc.weight"].shape[0],
        subsampling_channels=arrays["encoder.pre_encode.conv.0.weight"].shape[0],
    )
    td = md.get("nemo.tdt_durations")
    if td:  # TDT checkpoint: trailing joint logits are the duration head
        cfg = dataclasses.replace(
            cfg, tdt_durations=tuple(int(x) for x in td))

    vocab_blob = md.get("tokenizer.vocab", b"")
    if isinstance(vocab_blob, str):
        vocab_blob = vocab_blob.encode("utf-8", errors="surrogateescape")
    vocab = gguf_mod.decode_vocab(vocab_blob, cfg.vocab_size) if vocab_blob else []

    return params_from_arrays(arrays, cfg), cfg, vocab


def params_to_arrays(params: ModelParams, cfg: ModelConfig,
                     ) -> dict[str, np.ndarray]:
    """Inverse of params_from_arrays: pytree -> reference-named f32 arrays
    (PyTorch layouts, conv weights in the converter's 2D storage), ready for
    gguf.write_gguf -- the export half of a train -> deploy loop. Quantized
    leaves are dequantized first."""
    from .ops.quant import QTensorW8A8, dequantize

    def dense(w):
        if isinstance(w, QTensor):
            w = dequantize(w)
        elif isinstance(w, QTensorW8A8):
            w = jnp.asarray(w.q, jnp.float32) * jnp.asarray(
                w.col_scale, jnp.float32)
        return np.asarray(w, np.float32)

    def lin(w):  # [in, out] -> [out, in]
        return np.ascontiguousarray(dense(w).T)

    def conv(w):  # HWIO -> OIHW
        return np.ascontiguousarray(dense(w).transpose(3, 2, 0, 1))

    t: dict[str, np.ndarray] = {}
    s = params.subsampling
    for i, (wf, bf) in enumerate([("conv0_w", "conv0_b"), (None, None),
                                  ("conv2_w", "conv2_b"),
                                  ("conv3_w", "conv3_b"), (None, None),
                                  ("conv5_w", "conv5_b"),
                                  ("conv6_w", "conv6_b")]):
        if wf is None:
            continue
        t[f"encoder.pre_encode.conv.{i}.weight"] = conv(getattr(s, wf))
        t[f"encoder.pre_encode.conv.{i}.bias"] = dense(getattr(s, bf))
    t["encoder.pre_encode.out.weight"] = lin(s.out_w)
    t["encoder.pre_encode.out.bias"] = dense(s.out_b)

    L = cfg.n_layers
    # slicing a stacked layer pytree also slices QTensor q/scale leaves
    layer_list = [jax.tree_util.tree_map(lambda a, i=i: a[i], params.layers)
                  for i in range(L)]
    for i, lp in enumerate(layer_list):
        p = f"encoder.layers.{i}"
        t[f"{p}.norm_feed_forward1.weight"] = dense(lp.norm_ff1_w)
        t[f"{p}.norm_feed_forward1.bias"] = dense(lp.norm_ff1_b)
        t[f"{p}.feed_forward1.linear1.weight"] = lin(lp.ffn1_w1)
        t[f"{p}.feed_forward1.linear2.weight"] = lin(lp.ffn1_w2)
        t[f"{p}.norm_self_att.weight"] = dense(lp.norm_attn_w)
        t[f"{p}.norm_self_att.bias"] = dense(lp.norm_attn_b)
        t[f"{p}.self_attn.linear_q.weight"] = lin(lp.attn_q_w)
        t[f"{p}.self_attn.linear_k.weight"] = lin(lp.attn_k_w)
        t[f"{p}.self_attn.linear_v.weight"] = lin(lp.attn_v_w)
        t[f"{p}.self_attn.linear_pos.weight"] = lin(lp.attn_pos_w)
        t[f"{p}.self_attn.linear_out.weight"] = lin(lp.attn_out_w)
        t[f"{p}.self_attn.pos_bias_u"] = dense(lp.pos_bias_u)
        t[f"{p}.self_attn.pos_bias_v"] = dense(lp.pos_bias_v)
        t[f"{p}.norm_conv.weight"] = dense(lp.norm_conv_w)
        t[f"{p}.norm_conv.bias"] = dense(lp.norm_conv_b)
        t[f"{p}.conv.pointwise_conv1.weight"] = lin(lp.conv_pw1_w)
        t[f"{p}.conv.depthwise_conv.weight"] = dense(lp.conv_dw_w)
        t[f"{p}.conv.batch_norm.weight"] = dense(lp.conv_ln_w)
        t[f"{p}.conv.batch_norm.bias"] = dense(lp.conv_ln_b)
        t[f"{p}.conv.pointwise_conv2.weight"] = lin(lp.conv_pw2_w)
        t[f"{p}.norm_feed_forward2.weight"] = dense(lp.norm_ff2_w)
        t[f"{p}.norm_feed_forward2.bias"] = dense(lp.norm_ff2_b)
        t[f"{p}.feed_forward2.linear1.weight"] = lin(lp.ffn2_w1)
        t[f"{p}.feed_forward2.linear2.weight"] = lin(lp.ffn2_w2)
        t[f"{p}.norm_out.weight"] = dense(lp.norm_final_w)
        t[f"{p}.norm_out.bias"] = dense(lp.norm_final_b)

    dp = "decoder.prediction"
    d = params.decoder
    t[f"{dp}.embed.weight"] = dense(d.embedding)
    for i in (0, 1):
        t[f"{dp}.dec_rnn.lstm.weight_ih_l{i}"] = lin(d.w_ih[i])
        t[f"{dp}.dec_rnn.lstm.weight_hh_l{i}"] = lin(d.w_hh[i])
        t[f"{dp}.dec_rnn.lstm.bias_ih_l{i}"] = dense(d.b_ih[i])
        t[f"{dp}.dec_rnn.lstm.bias_hh_l{i}"] = dense(d.b_hh[i])

    j = params.joint
    t["joint.enc.weight"] = lin(j.enc_w)
    t["joint.enc.bias"] = dense(j.enc_b)
    t["joint.pred.weight"] = lin(j.dec_w)
    t["joint.pred.bias"] = dense(j.dec_b)
    t["joint.joint_net.2.weight"] = lin(j.out_w)
    t["joint.joint_net.2.bias"] = dense(j.out_b)

    pre = params.preprocessor
    t["preprocessor.featurizer.fb"] = dense(pre.filterbank)
    t["preprocessor.featurizer.window"] = dense(pre.window)

    if params.ctc is not None:
        t["ctc_decoder.decoder_layers.0.weight"] = lin(params.ctc.out_w)
        t["ctc_decoder.decoder_layers.0.bias"] = dense(params.ctc.out_b)
    return t


def save_model(path: str, params: ModelParams, cfg: ModelConfig,
               vocab: list[str] | None = None,
               quantize_mode: str | None = None) -> None:
    """Write params back to a GGUF both this framework and the reference
    loader can read (the export half of train -> deploy)."""
    arrays = params_to_arrays(params, cfg)
    meta = {
        "general.architecture": "nemo",
        "nemo.n_mels": cfg.n_mels, "nemo.d_model": cfg.d_model,
        "nemo.n_heads": cfg.n_heads, "nemo.d_head": cfg.d_head,
        "nemo.d_ff": cfg.d_ff, "nemo.n_layers": cfg.n_layers,
        "nemo.kernel_size": cfg.kernel_size,
        "nemo.vocab_size": cfg.vocab_size,
    }
    if cfg.tdt_durations:
        meta["nemo.tdt_durations"] = [int(d) for d in cfg.tdt_durations]
    if vocab:
        meta["tokenizer.vocab"] = gguf_mod.encode_vocab(
            [gguf_mod.fit_vocab_token(v) for v in vocab])
    quantize = {}
    if quantize_mode:
        gtype = {"q8_0": gguf_mod.GGML_Q8_0,
                 "q4_0": gguf_mod.GGML_Q4_0}[quantize_mode]
        quantize = {n: gtype for n, a in arrays.items()
                    if should_quantize(n, a)}
    gguf_mod.write_gguf(path, meta, arrays, quantize=quantize)


# ---------------------------------------------------------------------------
# Random init (for tests / benchmarks when no real GGUF is available)
# ---------------------------------------------------------------------------

def random_weight_arrays(cfg: ModelConfig, seed: int = 0,
                         scale: float = 0.05,
                         init: str = "bench",
                         ctc_head: bool = False) -> dict[str, np.ndarray]:
    """Random weights in the *reference's* name/shape convention
    (docs/TENSOR_SHAPES.md), so they can round-trip through GGUF and feed both
    the oracle and the JAX model.

    init:
      'bench'  -- every weight ~ N(0, scale^2): cheap and shape-exact, fine
                  for kernels/benchmarks/differential tests.
      'glorot' -- fan-scaled Glorot/Xavier init (std = sqrt(2/(fan_in +
                  fan_out)), conv fans include the kernel taps) + LSTM
                  forget-gate bias 1.0. REQUIRED for actual training: the
                  flat 0.05 is ~10x too small for the subsampling convs
                  (fan_in 9), which strangles the acoustic pathway --
                  measured as the tones task pinning at the
                  uniform-identity loss floor while the prediction-network
                  shortcut learns instantly."""
    rng = np.random.default_rng(seed)
    D, FF, H, DH = cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.d_head
    V, DD = cfg.vocab_size, cfg.decoder_dim
    K = cfg.kernel_size

    def w(*shape):
        if init == "glorot":
            if len(shape) == 1:
                return np.zeros(shape, dtype=np.float32)   # biases
            if len(shape) == 2:                            # [out, in]
                fan_in, fan_out = shape[1], shape[0]
            else:                                          # conv [Co, Ci, *k]
                rf = int(np.prod(shape[2:]))
                fan_in, fan_out = shape[1] * rf, shape[0] * rf
            std = np.sqrt(2.0 / (fan_in + fan_out))
            return rng.standard_normal(shape, dtype=np.float32) \
                * np.float32(std)
        return rng.standard_normal(shape, dtype=np.float32) * np.float32(scale)

    def ones(*shape):
        return np.ones(shape, dtype=np.float32)

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    t: dict[str, np.ndarray] = {}
    C = cfg.subsampling_channels
    t["encoder.pre_encode.conv.0.weight"] = w(C, 1, 3, 3)
    t["encoder.pre_encode.conv.0.bias"] = w(C)
    t["encoder.pre_encode.conv.2.weight"] = w(C, 1, 3, 3)
    t["encoder.pre_encode.conv.2.bias"] = w(C)
    t["encoder.pre_encode.conv.3.weight"] = w(C, C, 1, 1)
    t["encoder.pre_encode.conv.3.bias"] = w(C)
    t["encoder.pre_encode.conv.5.weight"] = w(C, 1, 3, 3)
    t["encoder.pre_encode.conv.5.bias"] = w(C)
    t["encoder.pre_encode.conv.6.weight"] = w(C, C, 1, 1)
    t["encoder.pre_encode.conv.6.bias"] = w(C)
    t["encoder.pre_encode.out.weight"] = w(D, cfg.pre_encode_out_dim)
    t["encoder.pre_encode.out.bias"] = w(D)

    for i in range(cfg.n_layers):
        p = f"encoder.layers.{i}"
        t[f"{p}.norm_feed_forward1.weight"] = ones(D)
        t[f"{p}.norm_feed_forward1.bias"] = zeros(D)
        t[f"{p}.feed_forward1.linear1.weight"] = w(FF, D)
        t[f"{p}.feed_forward1.linear2.weight"] = w(D, FF)
        t[f"{p}.norm_self_att.weight"] = ones(D)
        t[f"{p}.norm_self_att.bias"] = zeros(D)
        t[f"{p}.self_attn.linear_q.weight"] = w(D, D)
        t[f"{p}.self_attn.linear_k.weight"] = w(D, D)
        t[f"{p}.self_attn.linear_v.weight"] = w(D, D)
        t[f"{p}.self_attn.linear_pos.weight"] = w(D, D)
        t[f"{p}.self_attn.linear_out.weight"] = w(D, D)
        t[f"{p}.self_attn.pos_bias_u"] = w(H, DH)
        t[f"{p}.self_attn.pos_bias_v"] = w(H, DH)
        t[f"{p}.norm_conv.weight"] = ones(D)
        t[f"{p}.norm_conv.bias"] = zeros(D)
        t[f"{p}.conv.pointwise_conv1.weight"] = w(2 * D, D, 1)
        t[f"{p}.conv.depthwise_conv.weight"] = w(D, 1, K)
        t[f"{p}.conv.batch_norm.weight"] = ones(D)
        t[f"{p}.conv.batch_norm.bias"] = zeros(D)
        t[f"{p}.conv.pointwise_conv2.weight"] = w(D, D, 1)
        t[f"{p}.norm_feed_forward2.weight"] = ones(D)
        t[f"{p}.norm_feed_forward2.bias"] = zeros(D)
        t[f"{p}.feed_forward2.linear1.weight"] = w(FF, D)
        t[f"{p}.feed_forward2.linear2.weight"] = w(D, FF)
        t[f"{p}.norm_out.weight"] = ones(D)
        t[f"{p}.norm_out.bias"] = zeros(D)

    dp = "decoder.prediction"
    t[f"{dp}.embed.weight"] = w(V, DD)
    for i in (0, 1):
        in_dim = DD
        t[f"{dp}.dec_rnn.lstm.weight_ih_l{i}"] = w(4 * DD, in_dim)
        t[f"{dp}.dec_rnn.lstm.weight_hh_l{i}"] = w(4 * DD, DD)
        t[f"{dp}.dec_rnn.lstm.bias_ih_l{i}"] = w(4 * DD)
        t[f"{dp}.dec_rnn.lstm.bias_hh_l{i}"] = w(4 * DD)

    if init == "glorot":
        for i in (0, 1):
            # forget-gate bias 1.0 ([i,f,g,o] gate layout, ops/lstm.py):
            # standard LSTM trainability init
            t[f"{dp}.dec_rnn.lstm.bias_ih_l{i}"][DD:2 * DD] = 1.0

    t["joint.enc.weight"] = w(cfg.joint_dim, D)
    t["joint.enc.bias"] = w(cfg.joint_dim)
    t["joint.pred.weight"] = w(cfg.joint_dim, DD)
    t["joint.pred.bias"] = w(cfg.joint_dim)
    # TDT checkpoints widen the joint output by the duration head
    # (losses/tdt.py); the embedding/vocab stay V
    V_out = V + len(cfg.tdt_durations or ())
    t["joint.joint_net.2.weight"] = w(V_out, cfg.joint_dim)
    t["joint.joint_net.2.bias"] = w(V_out)

    t["preprocessor.featurizer.fb"] = np.abs(w(cfg.n_mels, 257))
    win = np.hanning(400).astype(np.float32)
    t["preprocessor.featurizer.window"] = win
    if ctc_head:   # hybrid RNNT-CTC auxiliary head (NeMo naming)
        t["ctc_decoder.decoder_layers.0.weight"] = w(V, D)
        t["ctc_decoder.decoder_layers.0.bias"] = w(V)
    return t


@functools.lru_cache(maxsize=2)
def _cached_random_params(seed: int) -> tuple:
    cfg = ModelConfig()
    arrays = random_weight_arrays(cfg, seed=seed)
    return params_from_arrays(arrays, cfg), cfg


def random_params(seed: int = 0) -> tuple[ModelParams, ModelConfig]:
    return _cached_random_params(seed)


def parse_boost_spec(spec: str) -> dict:
    """Parse the CLIs' `--boost=piece:weight,...` syntax into the dict
    `apply_logit_bias` takes. Pieces may be vocab strings (with or without
    the SentencePiece prefix) or integer token ids."""
    bias: dict = {}
    for item in spec.split(","):
        key, _, w = item.rpartition(":")
        if not key:
            raise ValueError(f"bad --boost item {item!r} "
                             "(want piece:weight)")
        try:
            bias[int(key)] = float(w)
        except ValueError:
            bias[key] = float(w)
    return bias


def apply_logit_bias(params: ModelParams, bias,
                     vocab: list[str] | None = None) -> ModelParams:
    """Contextual biasing ("hotword boosting"): return params whose joint
    emits `logits + bias`.

    Folding the bias into the joint's f32 output bias is EXACTLY
    equivalent to adding it to every decode step's logits (the vocab
    projection ends `... @ out_w + out_b`, models/decoder.joint_logits),
    so the boost applies everywhere with no decode-path changes: batch,
    sessions, both serving engines, beam search, and confidence (which
    then reports the biased posterior — standard shallow-fusion
    semantics). A capability beyond the reference, whose joint bias is a
    fixed weight (src/nemo-ggml.cpp:1062-1100).

    bias: a full [vocab] array, or a dict mapping token id (int) or vocab
    piece (str, matched exactly or with the SentencePiece "▁" prefix) to
    a log-space boost. Positive boosts favor tokens; boosting blank
    suppresses output. Unknown pieces raise.
    """
    import jax.numpy as jnp

    out_b = np.asarray(params.joint.out_b, np.float32).copy()
    if isinstance(bias, dict):
        for key, w in bias.items():
            if isinstance(key, str):
                if vocab is None:
                    raise ValueError("string keys need the vocab")
                if key in vocab:
                    idx = vocab.index(key)
                elif "▁" + key in vocab:
                    idx = vocab.index("▁" + key)
                else:
                    raise ValueError(f"piece {key!r} not in the vocab")
            else:
                idx = int(key)
            out_b[idx] += float(w)
    else:
        b = np.asarray(bias, np.float32)
        if b.shape != out_b.shape:
            raise ValueError(f"bias shape {b.shape} != vocab "
                             f"{out_b.shape}")
        out_b = out_b + b
    return dataclasses.replace(
        params, joint=dataclasses.replace(
            params.joint, out_b=jnp.asarray(out_b)))


def cast_params(params: ModelParams, dtype) -> ModelParams:
    """Cast all floating-point leaves to `dtype` (e.g. bf16 for serving).
    QTensor leaves are left untouched: int8 values + f32 block scales."""
    import jax.numpy as jnp

    def cast(x):
        if isinstance(x, QTensor):
            return QTensor(q=jnp.asarray(x.q),
                           scale=jnp.asarray(x.scale, jnp.float32))
        if isinstance(x, QTensorW8A8):
            return QTensorW8A8(
                q=jnp.asarray(x.q),
                col_scale=jnp.asarray(x.col_scale, jnp.float32),
                act_scale=None if x.act_scale is None
                else jnp.asarray(x.act_scale, jnp.float32))
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(
        cast, params,
        is_leaf=lambda x: isinstance(x, (QTensor, QTensorW8A8)))
