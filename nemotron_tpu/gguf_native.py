"""ctypes binding for the native mmap GGUF loader (native/gguf_loader.cpp).

Replaces the per-tensor `f.read` copies of the multi-GB weight payload with
zero-copy views into a single mmap (the reference loader freads every tensor
into backend buffers, src/nemo-ggml.cpp:221-247; here jax.device_put consumes
the page-cache-backed views directly)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnemotron_gguf.so")

_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
                return None
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.nemo_gguf_open.restype = ctypes.c_void_p
        lib.nemo_gguf_open.argtypes = [ctypes.c_char_p]
        lib.nemo_gguf_error.restype = ctypes.c_char_p
        lib.nemo_gguf_error.argtypes = [ctypes.c_void_p]
        lib.nemo_gguf_n_tensors.restype = ctypes.c_int64
        lib.nemo_gguf_n_tensors.argtypes = [ctypes.c_void_p]
        lib.nemo_gguf_tensor_info.restype = ctypes.c_uint64
        lib.nemo_gguf_tensor_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64)]
        lib.nemo_gguf_base.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.nemo_gguf_base.argtypes = [ctypes.c_void_p]
        lib.nemo_gguf_size.restype = ctypes.c_uint64
        lib.nemo_gguf_size.argtypes = [ctypes.c_void_p]
        lib.nemo_gguf_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeGGUF:
    """mmap-backed tensor payload table. Keep this object alive while any
    returned views are in use."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native gguf loader unavailable")
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.nemo_gguf_open(path.encode()))
        err = lib.nemo_gguf_error(self._handle)
        if err:
            msg = err.decode()
            lib.nemo_gguf_close(self._handle)
            self._handle = None
            raise ValueError(f"{path}: {msg}")
        size = lib.nemo_gguf_size(self._handle)
        base = lib.nemo_gguf_base(self._handle)
        self._mem = np.ctypeslib.as_array(base, shape=(size,))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.nemo_gguf_close(self._handle)
            self._handle = None

    def tensors(self):
        """Yields (name, ggml_type, shape numpy-order, raw zero-copy view)."""
        n = self._lib.nemo_gguf_n_tensors(self._handle)
        name_buf = ctypes.create_string_buffer(256)
        gtype = ctypes.c_int32()
        ndims = ctypes.c_uint32()
        ne = (ctypes.c_int64 * 4)()
        for i in range(n):
            off = self._lib.nemo_gguf_tensor_info(
                self._handle, i, name_buf, ctypes.byref(gtype),
                ctypes.byref(ndims), ne)
            shape = tuple(reversed([ne[d] for d in range(ndims.value)]))
            yield name_buf.value.decode(), int(gtype.value), shape, off

    def view(self, offset: int, nbytes: int) -> np.ndarray:
        return self._mem[offset:offset + nbytes]
