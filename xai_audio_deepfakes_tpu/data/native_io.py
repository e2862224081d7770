"""ctypes bridge to the native C++ IO library (see `native/`).

The reference ships no native code of its own (its heavy lifting is in torch
CUDA kernels); in this framework the host-side input pipeline — WAV decode,
int16 -> float32 conversion, polyphase resample — is the part the accelerator
can't help with, so it gets the C++ treatment. Falls back to pure Python
transparently when the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libaudio_io.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.decode_wav_pcm16.restype = ctypes.c_int64
    lib.decode_wav_pcm16.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    if hasattr(lib, "encode_wav_pcm16"):  # lib built before the writer: ok
        lib.encode_wav_pcm16.restype = ctypes.c_int64
        lib.encode_wav_pcm16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def read_wav_native(path: str, max_samples: int = 16000 * 60 * 10):
    """-> (float32 mono-or-[C,L] waveform, sr) or None if unavailable/unsupported."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(max_samples, dtype=np.float32)
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    n = lib.decode_wav_pcm16(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        ctypes.byref(sr),
        ctypes.byref(ch),
    )
    if n <= 0:
        return None  # unsupported encoding -> python fallback
    out = buf[:n].copy()
    if ch.value > 1:
        out = out.reshape(-1, ch.value).T
    return out, int(sr.value)


def write_wav_native(path: str, wav: np.ndarray, sample_rate: int) -> bool:
    """float32 [-1, 1] (mono [L] or [C, L]) -> 16-bit PCM WAV via the C++
    encoder; bit-identical to the Python scipy fallback (clip + truncate).
    Returns False (caller falls back) if the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "encode_wav_pcm16"):
        return False
    wav = np.asarray(wav, dtype=np.float32)
    if wav.ndim == 2:  # [C, L] -> interleaved frames
        channels = wav.shape[0]
        wav = np.ascontiguousarray(wav.T).reshape(-1)
    else:
        channels = 1
        wav = np.ascontiguousarray(wav.reshape(-1))
    rc = lib.encode_wav_pcm16(
        path.encode(),
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav.size,
        int(sample_rate),
        channels,
    )
    return rc == 0
