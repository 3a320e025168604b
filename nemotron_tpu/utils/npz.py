"""bfloat16-safe npz snapshot leaves.

numpy serializes ml_dtypes.bfloat16 arrays into .npy/.npz as a raw void
('|V2') dtype: the bytes survive the round trip but the dtype is lost, and
restoring with jnp.asarray(loaded, bf16) fails with "No cast function
available" — so every snapshot taken at the TPU serving dtype (bf16) was
unloadable (found in round 3; the exact-resume tests ran f32 and missed
it). Snapshot paths (StreamSession / ServingEngine / LockstepEngine /
train states) route leaves through these helpers:

  - encode: bf16 upcasts to f32 (exact — bf16 values are a subset of f32);
    everything else passes through.
  - decode: revives legacy '|V2' leaves (snapshots written before this
    fix) by viewing the raw bytes as bf16; everything else passes through.

The reference has no analogous risk: its state is POD f32 byte dumps
(src/nemo-ggml.h:358-398).
"""

from __future__ import annotations

import ml_dtypes
import numpy as np


def npz_encode(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype == ml_dtypes.bfloat16:
        return a.astype(np.float32)
    return a


def npz_decode(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype.kind == "V" and a.dtype.itemsize == 2:
        return a.view(ml_dtypes.bfloat16)
    return a


def savez_bf16_safe(path: str, flat: dict) -> None:
    np.savez(path, **{k: npz_encode(v) for k, v in flat.items()})


class NpzView:
    """An np.load result with npz_decode applied on every read (so legacy
    pre-fix snapshots with '|V2' bf16 leaves load too)."""

    def __init__(self, z):
        self._z = z

    @property
    def files(self):
        return self._z.files

    def __getitem__(self, k):
        return npz_decode(self._z[k])

    def __contains__(self, k):
        return k in self._z.files
