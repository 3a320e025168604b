"""Audio input helpers: raw s16le PCM (the reference's only input format)
plus RIFF/WAV detection for convenience."""

from __future__ import annotations

import struct

import numpy as np


def read_audio_bytes(data: bytes, expect_rate: int = 16000) -> np.ndarray:
    """Decode a whole audio buffer: WAV (PCM16 mono) if it has a RIFF
    header, otherwise raw s16le."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _decode_wav(data, expect_rate)
    return np.frombuffer(data, dtype="<i2")


def read_audio_file(path: str, expect_rate: int = 16000) -> np.ndarray:
    with open(path, "rb") as f:
        return read_audio_bytes(f.read(), expect_rate)


def _decode_wav(data: bytes, expect_rate: int) -> np.ndarray:
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_fmt} bits={bits} "
                         "(need PCM16)")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    if rate != expect_rate:
        raise ValueError(f"WAV sample rate {rate} != required {expect_rate}; "
                         "resample first (e.g. ffmpeg -ar 16000)")
    return samples
