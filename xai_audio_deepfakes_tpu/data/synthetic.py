"""Synthetic band-swap corpus with a KNOWN artifact band.

The reference's product claim is that the mask decoder produces listenable
explanations that localize the detector's actual evidence
(`/root/reference/README.md:1-4`, `loss_function.py:32-60`). Its data
protocol splices *any* 1 kHz band of a vocoded twin into a real clip
(`train_logReg_swapping.py:70-92`); because this environment ships no
external weights or corpora, the closed-loop demo builds the same protocol
from scratch — but with a FIXED swap band, so the ground truth the learned
mask should recover is checkable:

  real clips   : synthetic voiced signals (random f0 harmonic stacks with a
                 formant-like spectral tilt + a low noise floor)
  artifact src : wideband noise at several times the speech RMS — a blunt,
                 consistent stand-in for vocoder artifacts
  manipulated  : real clip with the artifact source's complex STFT spliced
                 into [lo_hz, hi_hz) (`hifigan.py:208-214` splice semantics)

A detector trained on (real=0, manipulated=1) embeddings then keys on the
band; a mask decoder trained against that detector should concentrate its
mask there. `metrics/localization.py` scores that concentration.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.ops.stft import istft, stft


def speechlike_clips(
    rng: np.random.Generator,
    n: int,
    num_samples: int,
    sample_rate: int = 16000,
    max_harmonic_hz: float = 7600.0,
) -> np.ndarray:
    """[n, num_samples] f32 voiced-speech stand-ins.

    Each clip: a harmonic stack at a random f0 in [110, 280] Hz with 1/k
    amplitude rolloff and random phases, a slow (2-6 Hz) amplitude
    modulation (syllable-rate envelope), and a -26 dB white noise floor.
    Broadband (harmonics up to ~7.6 kHz) so every swap band has natural
    content to displace.
    """
    t = np.arange(num_samples, dtype=np.float64) / sample_rate
    clips = np.empty((n, num_samples), np.float32)
    for i in range(n):
        f0 = rng.uniform(110.0, 280.0)
        n_harm = int(max_harmonic_hz // f0)
        k = np.arange(1, n_harm + 1)
        # formant-ish tilt: boost low harmonics, -6 dB/octave beyond ~1 kHz
        amp = (1.0 / k) * (1.0 + 3.0 * np.exp(-((k * f0 - 500.0) ** 2) / 2e5))
        phase = rng.uniform(0, 2 * np.pi, size=n_harm)
        sig = (amp[:, None] * np.sin(
            2 * np.pi * (k * f0)[:, None] * t[None, :] + phase[:, None]
        )).sum(axis=0)
        env = 0.55 + 0.45 * np.sin(
            2 * np.pi * rng.uniform(2.0, 6.0) * t + rng.uniform(0, 2 * np.pi)
        )
        sig = sig * env
        sig = sig / (np.max(np.abs(sig)) + 1e-9)
        sig = sig + 0.05 * rng.standard_normal(num_samples)
        clips[i] = (0.3 * sig).astype(np.float32)
    return clips


def noise_clips(
    rng: np.random.Generator, n: int, num_samples: int, rms: float = 0.5
) -> np.ndarray:
    """[n, num_samples] wideband-noise artifact sources at a fixed RMS."""
    x = rng.standard_normal((n, num_samples)).astype(np.float32)
    return x * (rms / (np.sqrt(np.mean(x**2, axis=1, keepdims=True)) + 1e-9))


def band_indicator(
    stft_cfg: STFTConfig, lo_hz: float, hi_hz: float
) -> np.ndarray:
    """[num_bins] 0/1 indicator of [lo_hz, hi_hz) under the reference's bin
    convention (freqs = linspace(0, sr/2, F), `train_logReg_swapping.py:69`)."""
    freqs = np.linspace(0, stft_cfg.sample_rate / 2, stft_cfg.num_bins)
    return ((freqs >= lo_hz) & (freqs < hi_hz)).astype(np.float32)


def splice_band(
    wav_real: jnp.ndarray,
    wav_src: jnp.ndarray,
    stft_cfg: STFTConfig,
    lo_hz: float,
    hi_hz: float,
) -> jnp.ndarray:
    """[B, L] x2 -> [B, L]: complex-STFT splice of the source's [lo, hi) band
    into the real clips (magnitude AND phase, `hifigan.py:212-214`), inverted
    back to waveforms. Batched single-band counterpart of
    `data/bandswap.py::band_spliced_waveforms`."""
    length = int(wav_real.shape[-1])
    re_r, im_r = stft(wav_real, stft_cfg)
    re_s, im_s = stft(wav_src, stft_cfg)
    m = jnp.asarray(band_indicator(stft_cfg, lo_hz, hi_hz))[None, :, None]
    re_c = re_r * (1 - m) + re_s * m
    im_c = im_r * (1 - m) + im_s * m
    return istft(re_c, im_c, stft_cfg, length=length)


def band_filter(
    wav: jnp.ndarray,
    stft_cfg: STFTConfig,
    lo_hz: float,
    hi_hz: float,
    keep_band: bool,
) -> jnp.ndarray:
    """[B, L] -> [B, L]: zero the complex STFT outside (keep_band) or inside
    (not keep_band) [lo_hz, hi_hz) and invert — the masking extremes the
    LMAC loss drives toward (`loss_function.py:38-47`: mask / 1-mask applied
    to the spectrogram, then iSTFT)."""
    length = int(wav.shape[-1])
    re, im = stft(wav, stft_cfg)
    m = jnp.asarray(band_indicator(stft_cfg, lo_hz, hi_hz))[None, :, None]
    if not keep_band:
        m = 1.0 - m
    return istft(re * m, im * m, stft_cfg, length=length)


def per_clip_band_indicator(
    stft_cfg: STFTConfig, bands: np.ndarray
) -> np.ndarray:
    """bands [B, 2] (lo_hz, hi_hz per clip) -> [B, num_bins] 0/1 indicators
    under the reference's bin convention (`train_logReg_swapping.py:69`)."""
    freqs = np.linspace(0, stft_cfg.sample_rate / 2, stft_cfg.num_bins)
    lo = np.asarray(bands)[:, 0:1]
    hi = np.asarray(bands)[:, 1:2]
    return ((freqs[None, :] >= lo) & (freqs[None, :] < hi)).astype(np.float32)


def splice_band_per_clip(
    wav_real: jnp.ndarray,
    wav_src: jnp.ndarray,
    stft_cfg: STFTConfig,
    band_ind: jnp.ndarray,
) -> jnp.ndarray:
    """[B, L] x2 + [B, F] per-clip band indicators -> [B, L]: complex-STFT
    splice of each source's own band into its real clip. The per-clip
    generalization of `splice_band` — one jitted program regardless of which
    band each clip draws (the indicator is data, not structure)."""
    length = int(wav_real.shape[-1])
    re_r, im_r = stft(wav_real, stft_cfg)
    re_s, im_s = stft(wav_src, stft_cfg)
    m = band_ind[:, :, None]
    return istft(
        re_r * (1 - m) + re_s * m, im_r * (1 - m) + im_s * m,
        stft_cfg, length=length,
    )


def band_filter_per_clip(
    wav: jnp.ndarray,
    stft_cfg: STFTConfig,
    band_ind: jnp.ndarray,
    keep_band: bool,
) -> jnp.ndarray:
    """[B, L] + [B, F] -> [B, L]: zero each clip's complex STFT outside
    (keep_band) or inside (not keep_band) its own band and invert."""
    length = int(wav.shape[-1])
    re, im = stft(wav, stft_cfg)
    m = band_ind[:, :, None]
    if not keep_band:
        m = 1.0 - m
    return istft(re * m, im * m, stft_cfg, length=length)


def make_anyband_corpus(
    rng: np.random.Generator,
    n: int,
    num_samples: int,
    stft_cfg: STFTConfig,
    band_width: float = 1000.0,
    f_max: float = 8000.0,
    noise_rms: float = 0.5,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (real [n, L], manipulated [n, L], bands [n, 2]).

    The PER-CLIP-band counterpart of `make_bandswap_corpus`: each clip draws
    its artifact band uniformly from the reference's grid of 1 kHz bands in
    [0, f_max) (`train_logReg_swapping.py:70-92` sweeps exactly these; the
    shipped detector is literally `logReg_vocoded_anyband.joblib`,
    `classifier_embedder.py:12`). A mask decoder that truly explains must
    therefore localize a DIFFERENT band per input — an input-independent
    constant mask cannot score on this corpus."""
    real = speechlike_clips(rng, n, num_samples, stft_cfg.sample_rate)
    src = noise_clips(rng, n, num_samples, rms=noise_rms)
    n_bands = int(f_max // band_width)
    starts = rng.integers(0, n_bands, size=n).astype(np.float64) * band_width
    bands = np.stack([starts, starts + band_width], axis=1)
    ind = per_clip_band_indicator(stft_cfg, bands)
    manipulated = np.asarray(
        splice_band_per_clip(
            jnp.asarray(real), jnp.asarray(src), stft_cfg, jnp.asarray(ind)
        )
    )
    return real, manipulated, bands


def detector_corpus_anyband(
    real: np.ndarray,
    manipulated: np.ndarray,
    stft_cfg: STFTConfig,
    bands: np.ndarray,
    band_width: float = 1000.0,
    f_max: float = 8000.0,
    rng: np.random.Generator | None = None,
    n_random_masks: int = 4,
    sweep: bool = True,
    noise_rms: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (wavs [N, L], labels [N]) for ANYBAND detector training.

    Base protocol = the reference's (`train_logReg_swapping.py:44-92`):
    real -> 0; band-spliced -> 1 for EVERY band of the grid (`sweep` splices
    fresh noise into each real clip at all n_bands bands, exactly the
    reference's per-file loop). The per-clip manipulated corpus (one drawn
    band each) is included too, so the detector sees the same distribution
    the mask decoder trains on.

    The causal augmentations mirror `detector_corpus`, per clip band:

      own-band-zeroed manipulated -> 0  (artifact removed: only real content)
      own-band-only   manipulated -> 1  (artifact isolated)
      random-band-zeroed real     -> 0
      random-band-only  real      -> 0  (natural band content != artifact)

    plus `n_random_masks` random smooth spectral masks with PER-CLIP causal
    labels: masked manipulated -> 1 iff the mask keeps most of that clip's
    own band (ambiguous partial keeps dropped per clip), masked real -> 0.
    """
    from xai_audio_deepfakes_tpu.data.bandswap import band_masks

    wavs = [real, manipulated]
    labels = [
        np.zeros(len(real), np.int64),
        np.ones(len(manipulated), np.int64),
    ]
    rj = jnp.asarray(real)
    mj = jnp.asarray(manipulated)
    ind = per_clip_band_indicator(stft_cfg, bands)
    ind_j = jnp.asarray(ind)
    length = real.shape[-1]
    rng = np.random.default_rng(0) if rng is None else rng

    if sweep:
        grid = band_masks(
            stft_cfg.num_bins, stft_cfg.sample_rate, band_width, f_max
        )
        for b in range(grid.shape[0]):
            src = noise_clips(rng, len(real), length, rms=noise_rms)
            one = np.broadcast_to(grid[b], (len(real), grid.shape[1]))
            wavs.append(
                np.asarray(
                    splice_band_per_clip(
                        rj, jnp.asarray(src), stft_cfg, jnp.asarray(one)
                    )
                )
            )
            labels.append(np.ones(len(real), np.int64))

    # causal band filters (own band for manipulated, random for real)
    rand_starts = (
        rng.integers(0, int(f_max // band_width), size=len(real)).astype(
            np.float64
        )
        * band_width
    )
    rand_bands = np.stack([rand_starts, rand_starts + band_width], axis=1)
    rand_ind = jnp.asarray(per_clip_band_indicator(stft_cfg, rand_bands))
    variants = [
        (mj, ind_j, False, 0),
        (mj, ind_j, True, 1),
        (rj, rand_ind, False, 0),
        (rj, rand_ind, True, 0),
    ]
    for src, bi, keep, lab in variants:
        wavs.append(
            np.asarray(band_filter_per_clip(src, stft_cfg, bi, keep))
        )
        labels.append(np.full(src.shape[0], lab, np.int64))

    # random spectral masks, labeled per clip by whether its own band survives
    if n_random_masks:
        band_sizes = ind.sum(axis=1)  # [B]
        for _ in range(n_random_masks):
            m = random_spectral_mask(rng, stft_cfg)
            keep_frac = (ind * m[None, :]).sum(axis=1) / np.maximum(
                band_sizes, 1.0
            )
            soft = jnp.asarray(m)[None, :, None]
            for src_w, full_lab in ((mj, 1), (rj, 0)):
                re, im = stft(src_w, stft_cfg)
                out = np.asarray(
                    istft(re * soft, im * soft, stft_cfg, length=length)
                )
                if full_lab == 1:
                    keep_sel = keep_frac > 0.75
                    zero_sel = keep_frac <= 0.25
                    # ambiguous partial keeps (0.25, 0.75] are dropped per
                    # clip rather than mislabeled
                    if keep_sel.any():
                        wavs.append(out[keep_sel])
                        labels.append(np.ones(int(keep_sel.sum()), np.int64))
                    if zero_sel.any():
                        wavs.append(out[zero_sel])
                        labels.append(np.zeros(int(zero_sel.sum()), np.int64))
                else:
                    wavs.append(out)
                    labels.append(np.zeros(out.shape[0], np.int64))
    return np.concatenate(wavs), np.concatenate(labels)


def detector_corpus(
    real: np.ndarray,
    manipulated: np.ndarray,
    stft_cfg: STFTConfig,
    lo_hz: float,
    hi_hz: float,
    augment: bool = True,
    rng: np.random.Generator | None = None,
    n_random_masks: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (wavs [N, L], labels [N]) for detector training.

    Base protocol (`train_logReg_swapping.py:44-92`): real -> 0,
    band-spliced -> 1. With `augment`, band-filtered variants are added so
    the detector's decision is CAUSALLY tied to the artifact band and robust
    under masking — the regime the LMAC loss evaluates it in (masked and
    complement audio, `loss_function.py:38-53`):

      band-zeroed manipulated -> 0  (artifact removed: only real content)
      band-only   manipulated -> 1  (artifact isolated)
      band-zeroed real        -> 0
      band-only   real        -> 0  (natural band content is not an artifact)

    and, with `rng`, `n_random_masks` random smooth spectral masks applied to
    every clip, labeled by whether the artifact band survives the mask:
    masked manipulated -> 1 iff the mask keeps most of [lo, hi), masked real
    -> 0 always. Without these, a detector trained only on full clips is
    free to call ANY spectrally-filtered audio "manipulated" (or to key on
    cues a low-capacity mask decoder can forge), and the decoder can then
    satisfy the LMAC loss without localizing anything.
    """
    wavs = [real, manipulated]
    labels = [np.zeros(len(real), np.int64), np.ones(len(manipulated), np.int64)]
    if augment:
        rj = jnp.asarray(real)
        mj = jnp.asarray(manipulated)
        variants = [
            (mj, False, 0),
            (mj, True, 1),
            (rj, False, 0),
            (rj, True, 0),
        ]
        for src, keep, lab in variants:
            wavs.append(np.asarray(band_filter(src, stft_cfg, lo_hz, hi_hz, keep)))
            labels.append(np.full(len(src), lab, np.int64))
        if rng is not None and n_random_masks:
            band = band_indicator(stft_cfg, lo_hz, hi_hz)
            length = real.shape[-1]
            for _ in range(n_random_masks):
                m = random_spectral_mask(rng, stft_cfg)
                keep_frac = float((m * band).sum() / max(band.sum(), 1.0))
                soft = jnp.asarray(m)[None, :, None]
                for src, full_lab in ((mj, 1), (rj, 0)):
                    re, im = stft(src, stft_cfg)
                    out = istft(re * soft, im * soft, stft_cfg, length=length)
                    wavs.append(np.asarray(out))
                    lab = full_lab if keep_frac > 0.75 else 0
                    # ambiguous partial-band masks are dropped rather than
                    # mislabeled
                    if full_lab == 1 and 0.25 < keep_frac <= 0.75:
                        wavs.pop()
                        continue
                    labels.append(np.full(len(src), lab, np.int64))
    return np.concatenate(wavs), np.concatenate(labels)


def random_spectral_mask(
    rng: np.random.Generator, stft_cfg: STFTConfig, n_bands: int = 3
) -> np.ndarray:
    """[num_bins] random 0/1 spectral mask built from `n_bands` random
    contiguous bands (union kept). Used to augment detector training so its
    decision survives arbitrary band-shaped masking."""
    bins = stft_cfg.num_bins
    m = np.zeros(bins, np.float32)
    for _ in range(n_bands):
        w = int(rng.integers(bins // 16, bins // 2))
        s = int(rng.integers(0, bins - w))
        m[s : s + w] = 1.0
    return m


def make_bandswap_corpus(
    rng: np.random.Generator,
    n: int,
    num_samples: int,
    stft_cfg: STFTConfig,
    lo_hz: float,
    hi_hz: float,
    noise_rms: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (real [n, L], manipulated [n, L]) with the artifact fixed to
    [lo_hz, hi_hz). manipulated[i] is real[i] with that band's complex STFT
    replaced by a noise source's."""
    real = speechlike_clips(rng, n, num_samples, stft_cfg.sample_rate)
    src = noise_clips(rng, n, num_samples, rms=noise_rms)
    manipulated = np.asarray(
        splice_band(jnp.asarray(real), jnp.asarray(src), stft_cfg, lo_hz, hi_hz)
    )
    return real, manipulated
