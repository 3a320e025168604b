"""Mel-spectrogram frontend.

Split host/device the TPU-native way:
  - HOST (numpy or the C++ runtime): i16 -> f32 scaling, pre-emphasis with
    cross-call carry, ring-buffer residue, framing into [n_frames, n_fft]
    windows. Pure memory movement, stateful, O(bytes).
  - DEVICE (jit): window multiply, 512-pt rFFT, power spectrum, mel
    filterbank matmul (MXU), log -- all the FLOPs, batched over streams.

Numerics mirror reference src/preprocessor.cpp:330-395 (pre-emphasis 0.97
carrying last_sample, center-pad emulation via an initial n_fft/2-zero
buffer, Hann(400) zero-padded to 512, power spectrum, log(x + 2^-24)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PreprocessorConfig


@functools.partial(jax.jit, static_argnames=())
def mel_spectrogram(frames, window, filterbank, log_zero_guard=2.0 ** -24):
    """frames: [..., n_frames, n_fft] f32 (already pre-emphasized and framed);
    window: [n_fft]; filterbank: [n_mels, n_freqs].
    Returns log-mel [..., n_frames, n_mels] f32."""
    x = frames * window
    spec = jnp.fft.rfft(x, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = power @ filterbank.T
    return jnp.log(mel + jnp.float32(log_zero_guard))


def pad_window(window: np.ndarray, n_fft: int) -> np.ndarray:
    """Zero-pad the analysis window to n_fft, centered
    (reference src/preprocessor.cpp:296-299)."""
    pad = (n_fft - window.shape[0]) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[pad : pad + window.shape[0]] = window
    return out


def hann_window(n: int) -> np.ndarray:
    """Symmetric Hann (torch.hann_window(n, periodic=False))."""
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))).astype(
        np.float32)


def mel_filterbank_slaney(n_mels: int = 128, n_fft: int = 512,
                          sample_rate: int = 16000, fmin: float = 0.0,
                          fmax: float | None = None) -> np.ndarray:
    """Slaney-style mel filterbank (librosa.filters.mel(htk=False, norm='slaney')),
    the construction NeMo's FilterbankFeatures uses. Only needed when running
    without a GGUF (the real filterbank ships in the model file,
    reference src/nemo-ggml.cpp:354-356)."""
    if fmax is None:
        fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


class StreamingPreprocessor:
    """Stateful PCM -> log-mel for S parallel streams.

    Host side of the frontend: scaling, pre-emphasis, residue buffering and
    framing in numpy; spectral compute on device via `mel_spectrogram`.
    All S streams must advance by the same number of samples per call (the
    serving engine's fixed chunk cadence guarantees this)."""

    def __init__(self, filterbank: np.ndarray, window: np.ndarray,
                 n_streams: int = 1,
                 cfg: PreprocessorConfig = PreprocessorConfig(),
                 device: bool = True, backend: str = "auto"):
        """backend: 'native' = C++ host DSP (native/frontend.cpp -- the
        reference's radix-2 f32 FFT, and 4x less host->device traffic),
        'numpy' = numpy framing + device/np spectral compute, 'auto' = native
        when the shared library is available."""
        self.cfg = cfg
        assert filterbank.shape == (cfg.n_mels, cfg.n_freqs)
        self.filterbank = jnp.asarray(filterbank, jnp.float32)
        self.window = jnp.asarray(pad_window(window, cfg.n_fft), jnp.float32)
        self.n_streams = n_streams
        self.device = device
        self._native = None
        if backend in ("auto", "native"):
            try:
                from .native import NativeFrontend

                self._native = NativeFrontend(
                    np.asarray(filterbank, np.float32),
                    pad_window(np.asarray(window, np.float32), cfg.n_fft),
                    n_streams=n_streams, n_fft=cfg.n_fft,
                    hop=cfg.n_window_stride, n_mels=cfg.n_mels,
                    preemph=cfg.preemph, log_zero_guard=cfg.log_zero_guard)
            except Exception:
                if backend == "native":
                    raise
        self.reset()

    def reset(self, stream: int | None = None) -> None:
        if self._native is not None:
            self._native.reset(stream)
        if stream is None:
            self.last_sample = np.zeros(self.n_streams, np.float32)
            self.residue = np.zeros(
                (self.n_streams, self.cfg.initial_pad), np.float32)
        else:
            # keep the shared residue length (lockstep batch); the reset
            # stream behaves as if it had been hearing silence
            self.last_sample[stream] = 0.0
            self.residue[stream, :] = 0.0

    def state_dict(self) -> dict:
        """Snapshot the DSP state (checkpoint/resume of a session)."""
        if self._native is not None:
            return self._native.state_dict()
        return {"last_sample": self.last_sample.copy(),
                "residue": self.residue.copy()}

    def load_state_dict(self, state: dict) -> None:
        if self._native is not None:
            self._native.load_state_dict(state)
            return
        self.last_sample = np.asarray(state["last_sample"],
                                      np.float32).copy()
        self.residue = np.asarray(state["residue"], np.float32).copy()

    def n_frames_for(self, n_new_samples: int) -> int:
        if self._native is not None:
            return self._native.n_frames_for(n_new_samples)
        avail = self.residue.shape[1] + n_new_samples
        if avail < self.cfg.n_fft:
            return 0
        return (avail - self.cfg.n_fft) // self.cfg.n_window_stride + 1

    def frame_only(self, audio_i16: np.ndarray) -> np.ndarray:
        """Host state update + framing WITHOUT the spectral FLOPs: returns
        pre-emphasized frames [S, n_frames, n_fft] f32 for a caller that
        batches the FFT/mel matmul across many preprocessor instances (the
        serving engine: one spectral call per tick instead of one per slot).
        numpy backend only."""
        assert self._native is None, "frame_only requires the numpy backend"
        cfg = self.cfg
        if audio_i16.ndim == 1:
            audio_i16 = audio_i16[None]
        S, N = audio_i16.shape
        assert S == self.n_streams

        x = audio_i16.astype(np.float32) / 32768.0
        prev = np.concatenate([self.last_sample[:, None], x[:, :-1]], axis=1)
        emph = x - np.float32(cfg.preemph) * prev
        self.last_sample = x[:, -1].copy()
        buf = np.concatenate([self.residue, emph], axis=1)

        n_frames = self.n_frames_for(N)
        if n_frames == 0:
            self.residue = buf
            return np.zeros((S, 0, cfg.n_fft), np.float32)
        hop, n_fft = cfg.n_window_stride, cfg.n_fft
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(n_fft)[None, :])
        frames = buf[:, idx]                      # [S, n_frames, n_fft]
        self.residue = buf[:, n_frames * hop:]
        assert self.residue.shape[1] < n_fft
        return frames

    def spectral(self, frames: np.ndarray) -> np.ndarray:
        """The FLOP half of process(): frames [..., n_fft] -> log-mel
        [..., n_mels], host-side (one vectorized rFFT + BLAS matmul).

        Uses scipy's pocketfft in f32 when available (numpy's rfft upcasts
        to f64 -- measured 15x slower at serving batch sizes; f32 FFT error
        is ~1e-6 on log-mels, far inside the 2e-4 oracle gate)."""
        cfg = self.cfg
        w = np.asarray(self.window)
        x = (frames * w).astype(np.float32)
        try:
            from scipy import fft as _sfft

            spec = _sfft.rfft(x, axis=-1, workers=-1)
        except ImportError:
            spec = np.fft.rfft(x, axis=-1)
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        return np.log(power @ np.asarray(self.filterbank).T
                      + np.float32(cfg.log_zero_guard)).astype(np.float32)

    def process(self, audio_i16: np.ndarray) -> np.ndarray:
        """audio_i16: [S, N] (or [N] if n_streams == 1) int16.
        Returns log-mel [S, n_frames, n_mels] f32 (n_frames may be 0)."""
        cfg = self.cfg
        squeeze = audio_i16.ndim == 1
        if squeeze:
            audio_i16 = audio_i16[None]
        if self._native is not None:
            return self._native.process(audio_i16)
        S, N = audio_i16.shape
        assert S == self.n_streams

        x = audio_i16.astype(np.float32) / 32768.0
        prev = np.concatenate([self.last_sample[:, None], x[:, :-1]], axis=1)
        emph = x - np.float32(cfg.preemph) * prev
        self.last_sample = x[:, -1].copy()
        buf = np.concatenate([self.residue, emph], axis=1)

        n_frames = self.n_frames_for(N)
        if n_frames == 0:
            self.residue = buf
            return np.zeros((S, 0, cfg.n_mels), np.float32)

        hop, n_fft = cfg.n_window_stride, cfg.n_fft
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
        frames = buf[:, idx]                      # [S, n_frames, n_fft]
        self.residue = buf[:, n_frames * hop :]
        assert self.residue.shape[1] < n_fft

        if self.device:
            mel = mel_spectrogram(jnp.asarray(frames), self.window,
                                  self.filterbank)
            mel = np.asarray(mel)
        else:
            w = np.asarray(self.window)
            spec = np.fft.rfft(frames * w, axis=-1)
            power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
            mel = np.log(power @ np.asarray(self.filterbank).T
                         + np.float32(cfg.log_zero_guard))
        return mel.astype(np.float32)
