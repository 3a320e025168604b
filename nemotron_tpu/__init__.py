"""nemotron_tpu: a TPU-native (JAX/XLA/Pallas) streaming ASR framework.

Re-implements the full capability surface of the nemotron-speech.cpp reference
engine -- cache-aware FastConformer encoder, RNN-T prediction network + joint,
greedy streaming decode, GGUF weights (F32/F16/Q8_0/Q4_0), four latency modes
(80 ms .. 1.12 s) -- redesigned TPU-first: pure functions over pytrees,
explicit StreamState, static shapes, on-device decode loops, and a batched
stream axis for many-stream serving sharded over a device mesh.
"""

from .config import (  # noqa: F401
    CacheConfig,
    LatencyMode,
    ModelConfig,
    PreprocessorConfig,
    MAX_SYMBOLS_PER_STEP,
)
from .params import (  # noqa: F401
    ModelParams,
    load_model,
    quantize_model_params,
    random_params,
    save_model,
)

__version__ = "0.1.0"


def __getattr__(name):
    # heavy submodule conveniences, imported lazily
    if name == "StreamSession":
        from .streaming.session import StreamSession

        return StreamSession
    if name == "ServingEngine":
        from .streaming.serving import ServingEngine

        return ServingEngine
    if name == "transcribe_batch":
        from .streaming.session import transcribe_batch

        return transcribe_batch
    raise AttributeError(name)
