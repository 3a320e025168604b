"""Weight-only int8 quantization (GGUF Q8_0-compatible) for TPU.

The reference keeps Q8_0/Q4_0 tensors quantized in device memory and
dequantizes on the fly inside ggml's mul_mat (reference
src/nemo-ggml.cpp:187-247; block layout: fp16 scale + 32 int8 values,
scripts/convert_to_gguf.py:93-139). The TPU-native analogue:

  - A `QTensor` pytree leaf holds int8 values [.., in, out] plus per-block
    f32 scales [.., in//32, out] -- the same 32-element blocking along the
    contraction dim as Q8_0, transposed into x @ w orientation.
  - `qmm` dequantizes into the compute dtype and runs the matmul on the MXU.
    Under jit, XLA keeps weights in HBM as int8 (half the bytes of bf16 --
    the win when the step is HBM-bound) and fuses the scale multiply.

Numerics match round-tripping through the reference's Q8_0 exactly:
quantize -> QTensor -> qmm == quantize -> dequantize f32 -> matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

QK = 32  # Q8_0 block size (elements per scale)


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class QTensor:
    """Blockwise-quantized weight in x @ w orientation.

    q:     int8  [..., in, out]
    scale: f32   [..., in // QK, out]   (per 32-row block, per column)
    """

    q: Any
    scale: Any

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


def quantize_tensor(w: np.ndarray) -> QTensor:
    """Quantize a [in, out] (or [L, in, out]) f32 weight to Q8_0 blocks along
    the contraction (in) dim. Same scale/rounding rule as the reference
    quantizer (scripts/convert_to_gguf.py:93-139): scale = amax/127 stored as
    f16, q = round(w / scale)."""
    w = np.asarray(w, dtype=np.float32)
    *lead, n_in, n_out = w.shape
    assert n_in % QK == 0, f"in dim {n_in} not divisible by {QK}"
    blocks = w.reshape(*lead, n_in // QK, QK, n_out)
    amax = np.max(np.abs(blocks), axis=-2)                     # [.., nb, out]
    # match the reference: scales pass through fp16 storage
    scale = np.where(amax != 0, amax / 127.0, 0.0).astype(np.float16)
    s32 = scale.astype(np.float32)
    s_safe = np.where(s32 != 0, s32, 1.0)
    q = np.round(blocks / s_safe[..., None, :]).astype(np.int8)
    q = np.where(s32[..., None, :] != 0, q, 0).astype(np.int8)
    return QTensor(q=q.reshape(w.shape), scale=s32)


def dequantize(qt: QTensor, dtype=jnp.float32):
    """Expand a QTensor to a dense array (for testing / fallback)."""
    q = jnp.asarray(qt.q)
    scale = jnp.asarray(qt.scale)
    *lead, n_in, n_out = q.shape
    nb = n_in // QK
    w = q.astype(dtype).reshape(*lead, nb, QK, n_out)
    w = w * scale.astype(dtype)[..., :, None, :]
    return w.reshape(*lead, n_in, n_out)


@_pytree_dataclass
class QTensorW8A8:
    """Weight for the dynamic W8A8 path: int8 values [.., in, out] with ONE
    f32 scale per output column [.., out] (per-K-block scales cannot be
    folded out of an int8 accumulation). Activations are quantized
    per row (per token) on the fly; the int8 x int8 dot runs on the MXU's
    double-rate int8 path (v5e: 394 TOPS vs 197 bf16 TFLOPS).

    act_scale (optional, [..] matching the leading weight dims): STATIC
    per-tensor activation scale from calibration (ops/smoothquant.py).
    When set, qmm skips the per-token abs-max reduction entirely -- the
    quantize becomes a pure elementwise op XLA fuses into the activation's
    producer, removing one full activation read per quantized matmul.
    Out-of-calibration activations saturate at +-127 (standard static-int8
    serving behavior; gate with the token-agreement harness)."""

    q: Any
    col_scale: Any
    act_scale: Any = None

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


def quantize_tensor_w8a8(w: np.ndarray) -> QTensorW8A8:
    """Per-output-column symmetric int8 quantization of a [in, out] (or
    [L, in, out]) weight."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.max(np.abs(w), axis=-2)                       # [.., out]
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[..., None, :]), -127, 127).astype(np.int8)
    return QTensorW8A8(q=q, col_scale=scale)


def qmm_w8a8(x, w: "QTensorW8A8"):
    """Dynamic-activation int8 matmul: per-row (token) activation scales,
    per-column weight scales, int32 MXU accumulation.

    out = (x_q @ w_q) * x_scale[:, None] * col_scale[None, :].

    With a static act_scale the reduction disappears: the quantize is
    elementwise (fused into x's producer) and the output rescale folds to
    one constant [out] vector."""
    dt = x.dtype
    if w.act_scale is not None:
        s = jnp.asarray(w.act_scale, jnp.float32)           # scalar
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w.q,
            dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32)
                * (s * w.col_scale.astype(jnp.float32))).astype(dt)
    ax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-12) / 127.0                      # [.., 1] f32
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w.q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s
            * w.col_scale.astype(jnp.float32)).astype(dt)


def qmm_shared(x, ws: list):
    """Several matmuls over the SAME input tensor (e.g. attention q/k/v
    projections): when the weights are W8A8, the per-token activation
    quantization (abs-max reduce + round + int8 write) is done ONCE and
    reused for every int8 dot -- profiling showed these passes costing
    ~20 ms/step at batch 768 when repeated per matmul. Falls back to
    independent qmm calls for non-W8A8 weights."""
    if not all(isinstance(w, QTensorW8A8) for w in ws):
        return [qmm(x, w) for w in ws]
    dt = x.dtype
    if all(w.act_scale is not None for w in ws):
        # static scales: identical by construction (one shared LN input,
        # ops/smoothquant.py attaches the same per-site scale to all)
        s = jnp.asarray(ws[0].act_scale, jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                      ).astype(jnp.int8)
        return [
            (jax.lax.dot_general(
                xq, w.q,
                dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
             * (s * w.col_scale.astype(jnp.float32))).astype(dt)
            for w in ws]
    ax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    outs = []
    for w in ws:
        acc = jax.lax.dot_general(
            xq, w.q,
            dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        outs.append((acc.astype(jnp.float32) * s
                     * w.col_scale.astype(jnp.float32)).astype(dt))
    return outs


def qmm(x, w, prefer_pallas: bool = True):
    """Matmul with a possibly-quantized weight: x [.., in] @ w [in, out].

    Accepts a plain array (cast to x.dtype) or a QTensor. The Pallas kernel
    path is used on TPU for 2D QTensors when shapes are tile-aligned;
    otherwise dequant-then-matmul (XLA fuses the dequant into the HBM->VMEM
    weight load under jit)."""
    if isinstance(w, QTensorW8A8):
        if prefer_pallas and _w8a8_pallas_eligible(x, w):
            from .w8a8_kernel import w8a8_matmul

            lead = x.shape[:-1]
            out = w8a8_matmul(x.reshape(-1, x.shape[-1]), w.q, w.col_scale)
            return out.reshape(*lead, w.q.shape[-1])
        return qmm_w8a8(x, w)
    if not isinstance(w, QTensor):
        return x @ w.astype(x.dtype)
    if prefer_pallas and _pallas_eligible(x, w):
        from .quant_kernel import q8_matmul

        lead = x.shape[:-1]
        out = q8_matmul(x.reshape(-1, x.shape[-1]), w.q, w.scale)
        return out.reshape(*lead, w.q.shape[-1]).astype(x.dtype)
    return x @ dequantize(w, x.dtype)


def _w8a8_pallas_eligible(x, w: "QTensorW8A8") -> bool:
    # Disabled by default: XLA's int8 dot + fused quantize passes measured
    # FASTER than the hand-written fused kernel (123 vs 216 ms/step at
    # batch 768) -- XLA's matmul pipelining wins at these shapes. The kernel
    # stays available for experimentation via NEMOTRON_TPU_PALLAS_W8A8=1.
    import os

    if os.environ.get("NEMOTRON_TPU_PALLAS_W8A8") != "1":
        return False
    if w.act_scale is not None:   # kernel implements the dynamic path only
        return False
    if jax.default_backend() != "tpu":
        return False
    if w.q.ndim != 2:
        return False
    n_in, n_out = w.q.shape
    rows = int(np.prod(x.shape[:-1]))
    return n_in % 256 == 0 and n_out % 256 == 0 and rows >= 32


def _pallas_eligible(x, w: QTensor) -> bool:
    # Same negative result as the W8A8 kernel: XLA's dequant-fused matmul
    # measured faster than the hand-written kernel. Opt-in for experiments.
    import os

    if os.environ.get("NEMOTRON_TPU_PALLAS_W8A8") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if w.q.ndim != 2:
        return False
    n_in, n_out = w.q.shape
    rows = int(np.prod(x.shape[:-1]))
    return n_in % 256 == 0 and n_out % 256 == 0 and rows >= 8


_ENCODER_MATMUL_SUFFIXES = (
    "feed_forward1.linear1.weight", "feed_forward1.linear2.weight",
    "feed_forward2.linear1.weight", "feed_forward2.linear2.weight",
    "self_attn.linear_q.weight", "self_attn.linear_k.weight",
    "self_attn.linear_v.weight", "self_attn.linear_pos.weight",
    "self_attn.linear_out.weight",
    "conv.pointwise_conv1.weight", "conv.pointwise_conv2.weight",
)


def should_quantize(name: str, arr: np.ndarray,
                    pattern: str = "encoder-matmul") -> bool:
    """The reference's default quant selection
    (scripts/convert_to_gguf.py:212-238)."""
    if pattern == "none":
        return False
    if not name.startswith("encoder.layers."):
        return False
    if arr.ndim < 2:
        return False
    return name.endswith(_ENCODER_MATMUL_SUFFIXES)
