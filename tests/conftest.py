"""Test config: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes. Real-TPU behavior is exercised by
bench.py / the driver, not the unit tests (mirrors the reference's
CPU-backend-by-default test policy, reference tests/test_compute.cpp:17-19).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from nemotron_tpu import params as params_mod  # noqa: E402


def tiny_config():
    """Shrunken model with the exact same structure as the real one (same
    layer composition, stride pattern, gate order) -- full-size parity runs on
    real GGUF weights via scripts/, not in unit tests."""
    from nemotron_tpu.config import ModelConfig

    return ModelConfig(
        n_mels=32,
        d_model=64,
        n_heads=4,
        d_head=16,
        d_ff=96,
        n_layers=3,
        kernel_size=9,
        vocab_size=41,
        decoder_dim=48,
        joint_dim=56,
        subsampling_channels=16,
    )


@pytest.fixture(scope="session")
def model_setup():
    """(raw weight arrays, ModelParams pytree, ModelConfig) with a small
    deterministic random model shared across tests."""
    cfg = tiny_config()
    arrays = params_mod.random_weight_arrays(cfg, seed=0)
    params = params_mod.params_from_arrays(arrays, cfg)
    return arrays, params, cfg


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def write_tiny_gguf(path: str, arrays: dict, cfg, quantize: dict | None = None,
                    vocab: list[str] | None = None) -> None:
    """Write the random model as a GGUF file using the reference converter's
    conventions (conv-weight reshapes, vocab blob, nemo.* metadata)."""
    from nemotron_tpu import gguf

    vocab = vocab or [f"t{i}"[:7] for i in range(cfg.vocab_size)]
    meta = {
        "general.architecture": "nemo",
        "tokenizer.vocab": gguf.encode_vocab(vocab),
        "nemo.n_mels": cfg.n_mels, "nemo.d_model": cfg.d_model,
        "nemo.n_heads": cfg.n_heads, "nemo.d_head": cfg.d_head,
        "nemo.d_ff": cfg.d_ff, "nemo.n_layers": cfg.n_layers,
        "nemo.kernel_size": 31,  # stale metadata, like the reference converter
        "nemo.vocab_size": cfg.vocab_size,
    }
    conv_arrays = {}
    for name, a in arrays.items():
        if name.endswith(".conv.depthwise_conv.weight") and a.ndim == 3:
            a = a.squeeze(1).T
        elif name.endswith((".conv.pointwise_conv1.weight",
                            ".conv.pointwise_conv2.weight")) and a.ndim == 3:
            a = a.squeeze(2)
        conv_arrays[name] = a
    gguf.write_gguf(path, meta, conv_arrays, quantize=quantize)


# ---------------------------------------------------------------------------
# Full-suite stability: XLA CPU compiles segfault nondeterministically deep
# into a single-process run (~350 compiled programs accumulated), inside
# LLVM codegen on the MAIN thread -- r3 crashed at test_streaming_encoder,
# r4 diagnostics at test_serving, each passing in isolation, with and
# without torch resident, so it is accumulated jit/backend state (not any
# one test, not the old torch theory). Dropping every compiled executable
# at module boundaries keeps the live-program count at the single-module
# level the crash never reproduces at. Costs ~10-20% runtime
# (module-scoped fixtures already bound most compile reuse to one module).
# ---------------------------------------------------------------------------

@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
