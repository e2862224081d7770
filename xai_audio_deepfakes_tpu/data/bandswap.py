"""Band-splice ("any-band") manipulated-audio generation.

The reference's detector-training data protocol (`train_logReg_swapping.py:
29-102` and `hifigan.py:155-230`): for a real clip and its vocoded twin,
splice each 1 kHz band of the vocoded complex STFT into the real STFT,
invert, and treat the result as a manipulated sample (label 1); the untouched
real clip is label 0. An out-of-band leakage check warns above 1e-6
(`hifigan.py:216-221`).

TPU-first: all 8 band variants of a clip are produced by ONE jitted program —
the band masks become a [n_bands, F] 0/1 matrix broadcast over the complex
spec, and the 8 iSTFTs batch into a single matmul-DFT + overlap-add. The
reference loops bands serially on the GPU.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.ops.stft import istft, stft


@functools.lru_cache(maxsize=None)
def band_masks(
    num_bins: int, sample_rate: int, band_width: float, f_max: float
) -> np.ndarray:
    """[n_bands, num_bins] 0/1 masks for [start, start+band) Hz bands
    (`train_logReg_swapping.py:69-75`: freqs = linspace(0, sr/2, F))."""
    freqs = np.linspace(0, sample_rate / 2, num_bins)
    starts = np.arange(0, f_max, band_width)
    return (
        (freqs[None, :] >= starts[:, None]) & (freqs[None, :] < starts[:, None] + band_width)
    ).astype(np.float32)


def band_spliced_waveforms(
    wav_real: jnp.ndarray,
    wav_vocoded: jnp.ndarray,
    stft_cfg: STFTConfig = STFTConfig(),
    band_width: float = 1000.0,
    f_max: float = 8000.0,
    length: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[L] x2 -> (waves [n_bands, L], leakage [n_bands]).

    waves[i] = istft(real_spec with band i replaced by vocoded_spec) —
    complex replacement, magnitude AND phase (`hifigan.py:212-214`).
    leakage[i] = mean (|combined| - |real|)^2 outside band i.
    """
    if length is None:
        length = int(wav_real.shape[-1])
    re_r, im_r = stft(wav_real[None], stft_cfg)
    re_v, im_v = stft(wav_vocoded[None], stft_cfg)
    masks = jnp.asarray(
        band_masks(stft_cfg.num_bins, stft_cfg.sample_rate, band_width, f_max)
    )[None, :, :, None]  # [1, n_bands, F, 1]

    def splice(a, b):
        return a[:, None] * (1 - masks) + b[:, None] * masks  # [1, n_bands, F, T]

    re_c = splice(re_r, re_v)[0]
    im_c = splice(im_r, im_v)[0]
    waves = istft(re_c, im_c, stft_cfg, length=length)

    mag_c = jnp.sqrt(re_c**2 + im_c**2)
    mag_r = jnp.sqrt(re_r**2 + im_r**2)
    out_of_band = 1.0 - masks[0, :, :, 0]  # [n_bands, F]
    diff2 = (mag_c - mag_r) ** 2 * out_of_band[:, :, None]
    leakage = jnp.sum(diff2, axis=(1, 2)) / (
        jnp.sum(out_of_band, axis=1) * mag_r.shape[-1]
    )
    return waves, leakage


def generate_band_swap_features(
    pairs: Iterable[tuple[np.ndarray, np.ndarray]],
    embed_fn,
    stft_cfg: STFTConfig = STFTConfig(),
    band_width: float = 1000.0,
    f_max: float = 8000.0,
    leakage_warn: float = 1e-6,
    log_fn=None,
) -> tuple[np.ndarray, np.ndarray]:
    """The `generate_time_swap_dataset` capability (`train_logReg_swapping.py:
    29-102`): per (real, vocoded) pair, emit the real clip's mean-pooled
    embedding (label 0) and all band-spliced variants' embeddings (label 1).

    embed_fn: [B, L] -> [B, D] mean-pooled SSL features (jitted by caller).
    """
    xs, ys = [], []
    splice = jax.jit(
        lambda a, b: band_spliced_waveforms(a, b, stft_cfg, band_width, f_max)
    )
    for wav_real, wav_vocoded in pairs:
        wav_real = jnp.asarray(wav_real)
        wav_vocoded = jnp.asarray(wav_vocoded)
        feats_real = embed_fn(wav_real[None])
        xs.append(np.asarray(feats_real)[0])
        ys.append(0)
        waves, leakage = splice(wav_real, wav_vocoded)
        leak = np.asarray(leakage)
        if log_fn is not None and np.any(leak > leakage_warn):
            log_fn({"warning": "band-splice leakage", "max_leakage": float(leak.max())})
        feats = np.asarray(embed_fn(waves))
        xs.extend(list(feats))
        ys.extend([1] * feats.shape[0])
    return np.stack(xs), np.asarray(ys, dtype=np.int64)
