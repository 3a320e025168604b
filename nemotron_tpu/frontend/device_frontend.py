"""On-device mel frontend: the DSP chain as a jitted, batched device program.

The reference computes the whole frontend on the host, one stream at a time
(reference src/preprocessor.cpp:330-395). The host/numpy port of that lives
in preprocessor.py. At serving scale (hundreds of lockstep streams) the
TPU-native layout is different: ship raw i16 PCM to the chip (6.4x less
bytes than shipping framed f32 windows) and run scaling, pre-emphasis,
framing, windowing, rFFT, the mel filterbank matmul (MXU) and the log on
device, batched over all streams in ONE program -- usually fused into the
same program as the encoder step (streaming/lockstep.py).

Numerics mirror the reference chain exactly: i16/32768 scaling, pre-emphasis
0.97 with cross-call carry, center-pad emulation via an initial n_fft/2-zero
residue, Hann(400) zero-padded to 512, power spectrum, log(x + 2^-24)
(reference src/preprocessor.cpp:46-57, 220-222, 296-299, 363-383).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PreprocessorConfig


def _pytree_dataclass(cls):
    import dataclasses

    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class FrontendState:
    """Per-stream DSP carry, all on device.

    `residue` length is STATIC per compiled step; it changes only between
    the first and second call for a given feed size (the host wrapper keys
    its jit cache on it)."""

    last_sample: Any   # [S] f32 pre-emphasis carry
    residue: Any       # [S, R] f32 unconsumed pre-emphasized samples


def init_frontend_state(n_streams: int,
                        cfg: PreprocessorConfig = PreprocessorConfig()
                        ) -> FrontendState:
    # center-pad emulation: start with n_fft/2 zeros of "history"
    # (reference src/preprocessor.cpp:220-222)
    return FrontendState(
        last_sample=jnp.zeros((n_streams,), jnp.float32),
        residue=jnp.zeros((n_streams, cfg.initial_pad), jnp.float32),
    )


def frames_after(residue_len: int, n_new: int,
                 cfg: PreprocessorConfig = PreprocessorConfig()) -> int:
    """How many mel frames one step emits (host-side, deterministic)."""
    avail = residue_len + n_new
    if avail < cfg.n_fft:
        return 0
    return (avail - cfg.n_fft) // cfg.n_window_stride + 1


def residue_after(residue_len: int, n_new: int,
                  cfg: PreprocessorConfig = PreprocessorConfig()) -> int:
    """Residue length after one step (host-side, deterministic)."""
    nf = frames_after(residue_len, n_new, cfg)
    return residue_len + n_new - nf * cfg.n_window_stride


def mel_frontend_step(pcm_i16, state: FrontendState, window, filterbank,
                      cfg: PreprocessorConfig = PreprocessorConfig()):
    """One batched DSP step, fully traceable (static shapes only).

    pcm_i16: [S, N] int16 (N static). window: [n_fft] f32 (already padded).
    filterbank: [n_mels, n_freqs] f32.
    Returns (log_mel [S, F, n_mels] f32, new FrontendState) where
    F = frames_after(state.residue.shape[1], N).
    """
    S, N = pcm_i16.shape
    R = state.residue.shape[1]
    hop, n_fft = cfg.n_window_stride, cfg.n_fft

    x = pcm_i16.astype(jnp.float32) / 32768.0
    prev = jnp.concatenate([state.last_sample[:, None], x[:, :-1]], axis=1)
    emph = x - jnp.float32(cfg.preemph) * prev
    last = x[:, -1]

    buf = jnp.concatenate([state.residue, emph], axis=1)       # [S, R+N]
    n_frames = frames_after(R, N, cfg)
    new_res_len = R + N - n_frames * hop
    residue = buf[:, n_frames * hop:]
    assert residue.shape[1] == new_res_len
    new_state = FrontendState(last_sample=last, residue=residue)

    if n_frames == 0:
        return jnp.zeros((S, 0, cfg.n_mels), jnp.float32), new_state

    # overlapping frames [S, n_frames, n_fft]: extract-patches lowers to a
    # strided windowing XLA understands (vs a [F, n_fft] gather)
    patches = jax.lax.conv_general_dilated_patches(
        buf[:, None, :],                       # [S, C=1, T]
        filter_shape=(n_fft,), window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    frames = jnp.transpose(patches, (0, 2, 1))  # [S, F, n_fft]

    spec = jnp.fft.rfft((frames * window).astype(jnp.float32), axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = power @ filterbank.T                                  # MXU
    return jnp.log(mel + jnp.float32(cfg.log_zero_guard)), new_state


class DeviceFrontend:
    """Host wrapper with the StreamingPreprocessor interface (process /
    reset / state_dict), for direct use and differential testing; the
    serving hot path calls `mel_frontend_step` inside a fused program
    instead."""

    def __init__(self, filterbank: np.ndarray, window: np.ndarray,
                 n_streams: int = 1,
                 cfg: PreprocessorConfig = PreprocessorConfig()):
        from .preprocessor import pad_window

        self.cfg = cfg
        self.n_streams = n_streams
        self.filterbank = jnp.asarray(filterbank, jnp.float32)
        self.window = jnp.asarray(pad_window(np.asarray(window, np.float32),
                                             cfg.n_fft), jnp.float32)
        self._step = jax.jit(
            lambda pcm, st: mel_frontend_step(pcm, st, self.window,
                                              self.filterbank, cfg))
        self.reset()

    def reset(self) -> None:
        self.state = init_frontend_state(self.n_streams, self.cfg)

    def n_frames_for(self, n_new: int) -> int:
        return frames_after(self.state.residue.shape[1], n_new, self.cfg)

    def state_dict(self) -> dict:
        return {"last_sample": np.asarray(self.state.last_sample),
                "residue": np.asarray(self.state.residue)}

    def load_state_dict(self, st: dict) -> None:
        self.state = FrontendState(
            last_sample=jnp.asarray(st["last_sample"], jnp.float32),
            residue=jnp.asarray(st["residue"], jnp.float32))

    def process(self, audio_i16: np.ndarray) -> np.ndarray:
        squeeze = audio_i16.ndim == 1
        if squeeze:
            audio_i16 = audio_i16[None]
        mel, self.state = self._step(jnp.asarray(audio_i16, jnp.int16),
                                     self.state)
        out = np.asarray(mel)
        return out[0] if squeeze else out
