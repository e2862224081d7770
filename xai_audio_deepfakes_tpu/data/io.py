"""Audio IO: the host-side input pipeline.

`load_audio` mirrors `audioprocessor.load_audio` (`audioprocessor.py:49-63`):
read -> mono (first channel) -> resample to 16 kHz if needed -> right-zero-
pad or crop to exactly 5 s. Decoding is scipy/stdlib (no torchaudio), with an
optional C++ fast path (`native/`, loaded via ctypes) for PCM16 decode +
polyphase resample on large dataset sweeps.
"""

from __future__ import annotations

import os
import wave

import numpy as np

from xai_audio_deepfakes_tpu.ops.resample import resample_poly_np


def _pcm_to_float(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.int16:
        out = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        out = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        out = (data.astype(np.float32) - 128.0) / 128.0
    else:
        out = data.astype(np.float32)
    if out.ndim == 2:
        out = out.T  # [C, L]
    return out


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """-> (float32 waveform in [-1, 1], sample_rate). Multi-channel stays
    [C, L]; mono is [L]."""
    from xai_audio_deepfakes_tpu.data import native_io

    fast = native_io.read_wav_native(path)
    if fast is not None:
        return fast
    try:
        import scipy.io.wavfile as wavfile

        sr, data = wavfile.read(path)
        return _pcm_to_float(data), int(sr)
    except Exception:
        with wave.open(path, "rb") as f:
            sr = f.getframerate()
            n = f.getnframes()
            raw = f.readframes(n)
            width = f.getsampwidth()
            ch = f.getnchannels()
        if width == 2:
            data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 1:
            data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        if ch > 1:
            data = data.reshape(-1, ch).T
        return data, sr


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 16000) -> None:
    """16-bit PCM WAV out. Native C++ encoder when built (`make -C native`
    — the datagen apps write thousands of clips, `hifigan.py:223-230`),
    bit-identical Python fallback otherwise."""
    wav = np.asarray(wav, dtype=np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    from xai_audio_deepfakes_tpu.data.native_io import write_wav_native

    if write_wav_native(path, wav, sample_rate):
        return
    import scipy.io.wavfile as wavfile

    # match the native path's multichannel convention: [C, L] channels-first
    # (the layout load_audio/read_wav_native return) -> scipy's [frames, ch]
    if wav.ndim == 2:
        wav = wav.T
    wavfile.write(path, sample_rate, (np.clip(wav, -1, 1) * 32767).astype(np.int16))


def _to_clip(
    wav: np.ndarray, sr: int, target_sr: int, clip_seconds: float
) -> np.ndarray:
    if wav.ndim > 1:
        wav = wav[0]
    if sr != target_sr:
        wav = resample_poly_np(wav, sr, target_sr)
    n = int(round(clip_seconds * target_sr))
    if wav.shape[0] < n:
        wav = np.pad(wav, (0, n - wav.shape[0]))
    else:
        wav = wav[:n]
    return wav.astype(np.float32)


def load_audio(
    path: str, target_sr: int = 16000, clip_seconds: float = 5.0
) -> tuple[np.ndarray, int]:
    """Reference `load_audio` contract: mono (first channel), resampled,
    exactly clip_seconds * target_sr samples (right-zero-pad / head-crop)."""
    wav, sr = read_wav(path)
    return _to_clip(wav, sr, target_sr, clip_seconds), target_sr


def decode_wav_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """In-memory WAV decode (for the live explain API — no temp files)."""
    import io as _io

    try:
        import scipy.io.wavfile as wavfile

        sr, arr = wavfile.read(_io.BytesIO(data))
        return _pcm_to_float(arr), int(sr)
    except Exception:
        with wave.open(_io.BytesIO(data), "rb") as f:
            sr = f.getframerate()
            raw = f.readframes(f.getnframes())
            width = f.getsampwidth()
            ch = f.getnchannels()
        if width == 2:
            arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 1:
            arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        if ch > 1:
            arr = arr.reshape(-1, ch).T
        return arr, sr


def load_audio_bytes(
    data: bytes, target_sr: int = 16000, clip_seconds: float = 5.0
) -> tuple[np.ndarray, int]:
    """`load_audio` contract over in-memory WAV bytes."""
    wav, sr = decode_wav_bytes(data)
    return _to_clip(wav, sr, target_sr, clip_seconds), target_sr


def load_audio_chunks(
    path: str,
    target_sr: int = 16000,
    clip_seconds: float = 5.0,
    hop_seconds: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Split an arbitrarily long file into consecutive clip windows.

    The reference hard-crops every input to its first 5 s
    (`audioprocessor.py:56-62`); chunking covers the whole file with the
    same fixed-shape 5 s contract (so the one compiled program serves any
    duration). Returns (chunks [N, clip_samples] float32, start_samples [N]);
    the last chunk is right-zero-padded.
    """
    wav, sr = read_wav(path)
    if wav.ndim > 1:
        wav = wav[0]
    if sr != target_sr:
        wav = resample_poly_np(wav, sr, target_sr)
    n = int(round(clip_seconds * target_sr))
    hop = n if hop_seconds is None else int(round(hop_seconds * target_sr))
    if hop <= 0:
        raise ValueError(f"hop_seconds must be positive, got {hop_seconds}")
    total = max(wav.shape[0], 1)
    starts = list(range(0, total, hop))
    # drop windows that start past the signal (possible when hop > length)
    starts = [s for s in starts if s < wav.shape[0]] or [0]
    chunks = np.zeros((len(starts), n), np.float32)
    for i, s in enumerate(starts):
        seg = wav[s : s + n]
        chunks[i, : seg.shape[0]] = seg
    return chunks, np.asarray(starts, np.int64)


def wav_to_bytes(wav: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a float waveform as 16-bit PCM WAV bytes (API responses)."""
    import io as _io

    import scipy.io.wavfile as wavfile

    buf = _io.BytesIO()
    wav = np.asarray(wav, dtype=np.float32)
    wavfile.write(buf, sample_rate, (np.clip(wav, -1, 1) * 32767).astype(np.int16))
    return buf.getvalue()
