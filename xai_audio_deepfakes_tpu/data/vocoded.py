"""Vocoded-dataset generation — the `hifigan.py` app (`hifigan.py:91-230`).

For each source clip:
  1. mel spectrogram (hop 256, Hann-1024, 80 slaney mels, log-compressed —
     `hifigan.py:163-178`)
  2. HiFi-GAN vocode back to a waveform
  3. cross-correlation alignment of vocoded vs original (`:113-136`)
  4. Hann-1024 STFTs of both (`:188-204`)
  5. per-1kHz-band complex splice 0-8 kHz (`:208-214`) with out-of-band
     leakage warning vs 1e-6 (`:216-221`)
  6. save `{name}_vocoded_{start}-{end}.wav` (`:223-230`)

TPU-first: steps 1-2 run as one jitted mel->generator graph; step 5's eight
band variants batch into a single jitted splice+iSTFT program
(`data/bandswap.py`). Only alignment trimming and file IO run on host.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import MelConfig, STFTConfig
from xai_audio_deepfakes_tpu.data.bandswap import band_spliced_waveforms
from xai_audio_deepfakes_tpu.data.io import load_audio, write_wav
from xai_audio_deepfakes_tpu.ops.align import align_waveforms
from xai_audio_deepfakes_tpu.ops.mel import mel_spectrogram


def hann_splice_config(sample_rate: int = 16000) -> STFTConfig:
    """The data-gen STFT convention (`hifigan.py:188-204`): Hann-1024 full
    window, hop 256 — distinct from the pipeline's rect-644/hop-322."""
    return STFTConfig(
        sample_rate=sample_rate, n_fft=1024, hop_length=256, win_length=1024,
        window="hann",
    )


def make_vocoder_fn(pipe, params) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """wav [B, L] -> vocoded wav [B, ~L] (mel -> HiFi-GAN, one XLA program)."""

    # params as argument, not closure (closed-over weights inline into the
    # HLO as literal constants)
    @jax.jit
    def _vocode(hg_params, wav):
        mel = mel_spectrogram(wav, pipe.cfg.mel)
        return pipe.hifigan.apply(hg_params, mel)

    def vocode(wav):
        return _vocode(params["hifigan"], wav)

    return vocode


def generate_vocoded_dataset(
    file_names: Iterable[str],
    wav_dir: str,
    output_dir: str,
    vocode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    clip_seconds: float = 5.0,
    band_width: float = 1000.0,
    f_max: float = 8000.0,
    leakage_warn: float = 1e-6,
    log_fn=None,
) -> int:
    """Returns the number of band-spliced wavs written."""
    os.makedirs(output_dir, exist_ok=True)
    cfg = hann_splice_config()
    written = 0
    for name in file_names:
        path = os.path.join(wav_dir, name)
        if not os.path.exists(path):
            continue
        wav, sr = load_audio(path, clip_seconds=clip_seconds)
        voc = np.asarray(vocode_fn(jnp.asarray(wav[None]))[0])
        ref_a, voc_a = align_waveforms(wav, voc)
        n = len(ref_a)
        waves, leakage = band_spliced_waveforms(
            jnp.asarray(ref_a), jnp.asarray(voc_a), cfg,
            band_width=band_width, f_max=f_max, length=n,
        )
        leak = np.asarray(leakage)
        for b, start in enumerate(np.arange(0, f_max, band_width)):
            end = start + band_width
            if leak[b] > leakage_warn and log_fn is not None:
                log_fn({
                    "warning": "band-splice leakage",
                    "file": name, "band": f"{int(start)}-{int(end)}",
                    "leakage": float(leak[b]),
                })
            out_name = f"{name}_vocoded_{int(start)}-{int(end)}.wav"
            write_wav(os.path.join(output_dir, out_name), np.asarray(waves[b]), sr)
            written += 1
    return written
