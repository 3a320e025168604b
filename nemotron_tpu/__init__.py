"""nemotron_tpu: a TPU-native (JAX/XLA/Pallas) streaming ASR framework.

Re-implements the full capability surface of the nemotron-speech.cpp reference
engine -- cache-aware FastConformer encoder, RNN-T prediction network + joint,
greedy streaming decode, GGUF weights (F32/F16/Q8_0/Q4_0), four latency modes
(80 ms .. 1.12 s) -- redesigned TPU-first: pure functions over pytrees,
explicit StreamState, static shapes, on-device decode loops, and a batched
stream axis for many-stream serving sharded over a device mesh.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Honor JAX_PLATFORMS=cpu even under backend plugins that ignore the
    # env var (the axon TPU plugin registers itself regardless): a
    # subprocess spawned with JAX_PLATFORMS=cpu -- the test suite's
    # hermeticity contract -- must never touch a real accelerator. Found
    # the hard way: suite subprocess benches silently ran on the tunneled
    # TPU, contending with concurrent jobs (the round-2 "timeout flake").
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

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
