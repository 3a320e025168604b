"""Model hyperparameters and streaming cache configuration.

TPU-native re-implementation of the reference's two config tiers:
  - model hparams   (reference: src/nemo-ggml.h:37-49, GGUF "nemo.*" keys,
                     src/nemo-ggml.cpp:108-133)
  - cache config    (reference: src/nemo-stream.h:23-128 -- latency presets and
                     all derived chunk/shift/valid-out formulas)

Everything here is static Python data: all derived sizes are compile-time
constants so that every jitted step function has fully static shapes.
"""

from __future__ import annotations

import dataclasses
import enum


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of nemotron-speech-streaming-en-0.6b.

    Defaults mirror reference docs/TENSOR_SHAPES.md:5-17 and
    src/nemo-ggml.h:37-49. `kernel_size` is the *runtime* value inferred from
    the depthwise-conv weight shape (reference src/nemo-ggml.cpp:320-324); the
    stale GGUF metadata value (31) is ignored the same way the reference
    ignores it.
    """

    n_mels: int = 128
    d_model: int = 1024
    n_heads: int = 8
    d_head: int = 128
    d_ff: int = 4096
    n_layers: int = 24
    kernel_size: int = 9          # depthwise conv kernel (inferred from weights)
    vocab_size: int = 1025        # 1024 tokens + blank
    decoder_dim: int = 640        # LSTM hidden size
    decoder_layers: int = 2
    joint_dim: int = 640
    subsampling_channels: int = 256
    subsampling_factor: int = 8   # 3 stride-2 conv stages
    # TDT (token-and-duration transducer) checkpoints: the static duration
    # set predicted by the joint's trailing logits (GGUF key
    # `nemo.tdt_durations`; see losses/tdt.py). None = plain RNN-T.
    tdt_durations: tuple = None  # tuple[int, ...] | None

    @property
    def blank_token(self) -> int:
        return self.vocab_size - 1

    @property
    def subsampled_mels(self) -> int:
        """Frequency width after the 3 stride-2 causal conv stages.

        Causal pad (left=k-1, right=stride-1) gives out = in//2 + 1 per stage
        (reference src/nemo-ggml.cpp:828-835): 128 -> 65 -> 33 -> 17.
        """
        f = self.n_mels
        for _ in range(3):
            f = f // 2 + 1
        return f

    @property
    def pre_encode_out_dim(self) -> int:
        """Input width of the subsampling output Linear: C * F' = 256*17 = 4352."""
        return self.subsampling_channels * self.subsampled_mels


class LatencyMode(enum.IntEnum):
    """Right-context presets (reference src/nemo-stream.h:15-20).

    The value IS the att_right_context R; algorithmic latency is
    (1+R)*80 ms."""

    PURE_CAUSAL = 0   # 80 ms
    ULTRA_LOW = 1     # 160 ms
    LOW = 6           # 560 ms
    DEFAULT = 13      # 1.12 s


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Streaming cache-aware config (reference src/nemo-stream.h:23-128).

    All derived quantities replicate the reference formulas exactly so that
    the four latency modes produce identical chunk geometry:

        R          0    1    6    13
        chunk_mel  17   25   65   121
        shift_mel  8    16   56   112
        valid_out  1    2    7    14
    """

    att_left_context: int = 70
    att_right_context: int = 0
    cache_drop_size: int = 0
    conv_kernel_size: int = 9
    subsampling_factor: int = 8
    n_mels: int = 128
    sample_rate: int = 16000
    hop_length: int = 160
    drop_extra_pre_encoded: int = 2
    pre_encode_cache_size: int = 9
    # Intra-chunk future masking: when True, frame i may attend at most
    # att_right_context frames ahead WITHIN the chunk (NeMo's [70, R]
    # semantics). The reference leaves this unimplemented (TODO at
    # src/nemo-stream.cpp:446) and relies on valid_out_len truncation only;
    # False reproduces that behavior exactly.
    strict_right_context: bool = False
    # Per-layer-group intra-chunk lookahead limits (NeMo's per-group right
    # context, the reference's acknowledged limitation #2 at
    # docs/STREAMING.md:540-548: full-size groups are layers 0-5 rc=13,
    # 6-11 rc=6, 12-17 rc=1, 18-23 rc=0). A tuple of group values expanded
    # evenly over the layers, e.g. (13, 6, 1, 0) for 24 layers = 4 groups
    # of 6. Each value caps how far INTO THE CURRENT CHUNK that group may
    # attend (ring/cache keys are all past and unaffected); geometry and
    # latency are set by att_right_context as before. None = uniform
    # behavior (the reference's).
    att_right_context_by_layer: tuple[int, ...] | None = None
    # int8 K/V cache rings: halves ring HBM traffic and per-stream state
    # (~8 -> ~4.5 MB bf16-equivalent). Per-(layer, stream, head, segment)
    # scales are folded into the attention scores/weights so the big dots
    # read int8 directly. Opt-in: adds ~0.5% K/V quantization error.
    kv_cache_int8: bool = False
    # int4 K/V cache rings: quarter of bf16 (half of int8) ring HBM traffic
    # and per-stream state. Values are packed two-per-int8-byte across the
    # jit boundary (the axon TPU backend cannot pass s4 jit arguments) and
    # bitcast to native s4 inside the program; same per-(layer, stream,
    # head, segment) scale machinery as int8, qmax 7. Opt-in; coarser than
    # int8 -- gate with scripts/token_agreement.py before deploying.
    kv_cache_int4: bool = False
    # Shared channel cache (NeMo's layout, which the reference documents at
    # docs/STREAMING.md:446-456 but does not use): instead of separate K
    # and V rings [L, B, H, KV, Dh] x 2, cache ONE ring of post-norm
    # pre-projection activations [L, B, 1, KV, D] and recompute K = x@Wk,
    # V = x@Wv for the cached frames inside each step. Halves attention
    # ring state per stream (the HBM capacity binder at headline scale,
    # ~2560 stream states r4) at the cost of two extra [B*KV, D]@[D, D]
    # matmuls per layer per step -- a compute-for-memory trade that rides
    # the MXU, which profiling shows has headroom (the step is HBM-bound).
    # Composes with kv_cache_int8 (the x-ring is int8 with per-segment
    # scales); int4 is not supported for this layout.
    shared_cache: bool = False

    def __post_init__(self):
        if self.kv_cache_int8 and self.kv_cache_int4:
            raise ValueError("kv_cache_int8 and kv_cache_int4 are "
                             "mutually exclusive")
        if self.shared_cache and self.kv_cache_int4:
            raise ValueError("shared_cache does not support int4 rings "
                             "(use kv_cache_int8)")

    @property
    def kv_quant_max(self) -> int | None:
        """Quantized-ring clip level: 127 (int8), 7 (int4) or None."""
        if self.kv_cache_int8:
            return 127
        if self.kv_cache_int4:
            return 7
        return None

    def rc_schedule(self, n_layers: int) -> list[int] | None:
        """att_right_context_by_layer expanded to one value per layer
        (groups repeat evenly, NeMo convention), or None if unset."""
        pat = self.att_right_context_by_layer
        if pat is None:
            return None
        if not pat or n_layers % len(pat):
            raise ValueError(
                f"att_right_context_by_layer {pat} does not divide "
                f"{n_layers} layers into equal groups")
        rep = n_layers // len(pat)
        out = [int(r) for r in pat for _ in range(rep)]
        if any(r > self.att_right_context for r in out):
            raise ValueError(
                f"per-layer right context {pat} exceeds the chunk lookahead "
                f"att_right_context={self.att_right_context}")
        return out

    @property
    def conv_cache_size(self) -> int:
        return self.conv_kernel_size - 1

    @property
    def chunk_mel_frames(self) -> int:
        """Total mel frames fed to the encoder per chunk, incl. 9-frame overlap
        (reference src/nemo-stream.h:65-72)."""
        lookahead = self.att_right_context
        return self.pre_encode_cache_size + self.subsampling_factor * (1 + lookahead)

    @property
    def shift_mel_frames(self) -> int:
        """New mel frames consumed per chunk (reference src/nemo-stream.h:76-81)."""
        return self.subsampling_factor * (
            1 + self.att_right_context - self.cache_drop_size
        )

    @property
    def chunk_samples(self) -> int:
        return self.chunk_mel_frames * self.hop_length

    @property
    def shift_samples(self) -> int:
        return self.shift_mel_frames * self.hop_length

    @property
    def latency_ms(self) -> int:
        """Chunk buffer duration in ms (how much audio one chunk spans)."""
        return self.chunk_mel_frames * self.hop_length * 1000 // self.sample_rate

    @property
    def algorithmic_latency_ms(self) -> int:
        """The reference's headline latency figure: 80/160/560/1120 ms for
        R=0/1/6/13 = valid_out_len encoder frames x 80 ms
        (docs/STREAMING_ANALYSIS.md:19-24)."""
        return (self.valid_out_len * self.subsampling_factor
                * self.hop_length * 1000 // self.sample_rate)

    @property
    def valid_out_len(self) -> int:
        """Encoder frames emitted per chunk (reference src/nemo-stream.h:98-100)."""
        return 1 + self.att_right_context

    @property
    def subsampled_chunk_len(self) -> int:
        """Encoder frames produced by subsampling the chunk, before dropping
        the overlap. out = in//2 + 1 per stride-2 stage."""
        t = self.chunk_mel_frames
        for _ in range(3):
            t = t // 2 + 1
        return t

    @property
    def chunk_enc_len(self) -> int:
        """Encoder frames per chunk after dropping drop_extra_pre_encoded.

        Equals valid_out_len for all standard latency modes."""
        return self.subsampled_chunk_len - self.drop_extra_pre_encoded

    @property
    def kv_len(self) -> int:
        """Attention key/value length: left-context cache + current chunk."""
        return self.att_left_context + self.chunk_enc_len

    @property
    def pos_len(self) -> int:
        """Relative-position embedding slice length for cached attention
        (reference src/nemo-stream.cpp:150-159)."""
        return 2 * self.kv_len - 1

    @classmethod
    def with_latency(cls, mode: LatencyMode | int) -> "CacheConfig":
        return cls(att_right_context=int(mode))

    @classmethod
    def pure_causal(cls) -> "CacheConfig":
        return cls.with_latency(LatencyMode.PURE_CAUSAL)

    @classmethod
    def ultra_low_latency(cls) -> "CacheConfig":
        return cls.with_latency(LatencyMode.ULTRA_LOW)

    @classmethod
    def low_latency(cls) -> "CacheConfig":
        return cls.with_latency(LatencyMode.LOW)

    @classmethod
    def balanced(cls) -> "CacheConfig":
        return cls.with_latency(LatencyMode.DEFAULT)


# Greedy RNN-T decode bound (reference src/nemo-ggml.cpp:1134).
MAX_SYMBOLS_PER_STEP = 10


@dataclasses.dataclass(frozen=True)
class PreprocessorConfig:
    """Mel frontend constants (reference src/preprocessor.cpp:46-57)."""

    sample_rate: int = 16000
    n_window_size: int = 400      # 25 ms
    n_window_stride: int = 160    # 10 ms
    n_fft: int = 512
    preemph: float = 0.97
    n_mels: int = 128
    log_zero_guard: float = 2.0 ** -24
    mag_power: float = 2.0

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1  # 257

    @property
    def initial_pad(self) -> int:
        """Center-pad emulation: the audio buffer is pre-seeded with n_fft/2
        zeros (reference src/preprocessor.cpp:220-222)."""
        return self.n_fft // 2
