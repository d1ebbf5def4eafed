"""ctypes bindings for the native C++ runtime library (io/gguf fast path,
WAV encode, resampler). Builds on demand with g++; every entry point has a
pure-Python fallback so the framework works without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libqwen3tts_native.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.gguf_open.restype = ctypes.c_void_p
        lib.gguf_open.argtypes = [ctypes.c_char_p]
        lib.gguf_close.argtypes = [ctypes.c_void_p]
        lib.gguf_n_tensors.restype = ctypes.c_int64
        lib.gguf_n_tensors.argtypes = [ctypes.c_void_p]
        lib.gguf_tensor_name.restype = ctypes.c_char_p
        lib.gguf_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.gguf_tensor_info.restype = ctypes.c_int32
        lib.gguf_tensor_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        lib.gguf_read_tensor_f32.restype = ctypes.c_int32
        lib.gguf_read_tensor_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.gguf_read_tensor_q8.restype = ctypes.c_int32
        lib.gguf_read_tensor_q8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float)]
        lib.wav_write_pcm16.restype = ctypes.c_int32
        lib.wav_write_pcm16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32]
        lib.resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32]
        _lib = lib
        return _lib


class NativeGGUF:
    """GGUF reader over the C++ parser; tensor() returns f32 numpy arrays.
    Raises OSError if the native library is unavailable."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise OSError("native library unavailable")
        self._lib = lib
        self._h = lib.gguf_open(path.encode())
        if not self._h:
            raise ValueError(f"failed to parse GGUF: {path}")
        self.tensors = {}
        for i in range(lib.gguf_n_tensors(self._h)):
            name = lib.gguf_tensor_name(self._h, i).decode()
            shape = (ctypes.c_int64 * 8)()
            ttype = ctypes.c_int32()
            n = ctypes.c_int64()
            nd = lib.gguf_tensor_info(self._h, i, shape, ctypes.byref(ttype), ctypes.byref(n))
            self.tensors[name] = (i, tuple(shape[:nd]), int(ttype.value), int(n.value))

    def keys(self):
        return self.tensors.keys()

    def tensor(self, name: str) -> np.ndarray:
        i, shape, _ttype, n = self.tensors[name]
        out = np.empty(n, np.float32)
        rc = self._lib.gguf_read_tensor_f32(
            self._h, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IOError(f"gguf_read_tensor_f32({name}) -> {rc}")
        return out.reshape(shape)

    def tensor_q8(self, name: str):
        i, shape, ttype, n = self.tensors[name]
        if ttype != 8:  # GGML_Q8_0
            return None
        q = np.empty(n, np.int8)
        d = np.empty(n // 32, np.float32)
        rc = self._lib.gguf_read_tensor_q8(
            self._h, i,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IOError(f"gguf_read_tensor_q8({name}) -> {rc}")
        return q.reshape(shape), d.reshape(shape[:-1] + (shape[-1] // 32,))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.gguf_close(self._h)
            self._h = None


def wav_write_pcm16(path: str, samples: np.ndarray, sample_rate: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    samples = np.ascontiguousarray(samples, np.float32)
    rc = lib.wav_write_pcm16(
        path.encode(), samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), sample_rate)
    return rc == 0


def resample_linear(samples: np.ndarray, in_rate: int, out_rate: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, np.float32)
    out_len = int(len(samples) / (in_rate / out_rate))
    out = np.empty(out_len, np.float32)
    lib.resample_linear(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(samples), in_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len, out_rate)
    return out
