"""Mel spectrogram frontend for the HiFi-GAN vocoder path.

Matches the SpeechBrain `mel_spectogram` call used by the vocoded-data
generator (`hifigan.py:163-178`): hop 256, win 1024 periodic-Hann, 80 mels,
f_max 8 kHz, power=1 (magnitude), slaney scale + slaney norm filterbank
(torchaudio `mel_scale="slaney"`, `norm="slaney"`), then dynamic-range
compression log(clamp(x, 1e-5)) (SpeechBrain `compression=True`).

TPU-first: the filterbank application is one [B, T, 513] @ [513, n_mels]
matmul, fused by XLA with the magnitude computation; the whole wav->mel->
HiFi-GAN graph jit-compiles as a single program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import MelConfig, STFTConfig
from xai_audio_deepfakes_tpu.ops.stft import stft


def _hz_to_mel_slaney(hz: np.ndarray) -> np.ndarray:
    hz = np.asarray(hz, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (hz - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        hz >= min_log_hz, min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep, mels
    )


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    hz = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), hz)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, f_min: float, f_max: float
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank [n_freqs, n_mels]
    (librosa `mel(htk=False, norm='slaney')` / torchaudio slaney/slaney)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    m_min = _hz_to_mel_slaney(np.array(f_min))
    m_max = _hz_to_mel_slaney(np.array(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)  # [n_mels + 2]

    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # [n_freqs, n_mels]

    # slaney norm: scale each filter to approx constant energy per channel
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def mel_spectrogram(
    x: jnp.ndarray, cfg: MelConfig, compression: bool | None = None
) -> jnp.ndarray:
    """[B, L] (or [L]) waveform -> log-mel [B, n_mels, T].

    power=1 magnitude -> slaney filterbank -> log(clamp(., clip)) if
    compression (default from cfg).
    """
    stft_cfg = STFTConfig(
        sample_rate=cfg.sample_rate,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window="hann",
        center=True,
        pad_mode="reflect",
    )
    re, im = stft(x, stft_cfg)  # [B, F, T]
    mag = jnp.sqrt(re * re + im * im)
    if cfg.power != 1.0:
        mag = mag**cfg.power
    fb = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max)
    )
    # [B, F, T] -> [B, T, F] @ [F, M] -> [B, M, T]
    mel = jnp.matmul(
        mag.swapaxes(-1, -2), fb, precision=jax.lax.Precision.HIGHEST
    ).swapaxes(-1, -2)
    if compression is None:
        compression = cfg.compression
    if compression:
        mel = jnp.log(jnp.clip(mel, min=cfg.compression_clip))
    return mel
