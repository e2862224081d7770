"""Mask-localization scoring against a known artifact band.

The reference never measures WHERE its masks put their energy — its
evidence is listenable samples (`audio_samples/`) and aggregate
probability metrics (`LMAC_metrics.py:160-172`). The closed-loop demo
(`train/closed_loop.py`) constructs corpora whose artifact band is known
ground truth, so localization becomes a checkable number: how much of the
learned mask's mass sits inside the band the detector actually keys on.

All statistics are computed over the decoder's support (the cropped
(freq_bins, frames) region, `models/unet.py`) — the zero padding
`pad_mask_to_spec` adds outside the crop is a framework constant, not
decoder behavior, and counting it would flatter out-of-band suppression.
"""

from __future__ import annotations

import numpy as np

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.data.synthetic import band_indicator


def mask_band_stats(
    mask: np.ndarray,
    stft_cfg: STFTConfig,
    lo_hz: float,
    hi_hz: float,
    freq_bins: int | None = None,
    frames: int | None = None,
    threshold: float = 0.5,
) -> dict:
    """mask [B, F, T] (full-spec, as `ExplainOutput.mask`) -> localization
    stats vs the [lo_hz, hi_hz) band:

      in_band_mean / out_band_mean : mean mask value inside/outside the band
      concentration               : in_band_mean / out_band_mean
      energy_fraction             : share of total mask mass in the band
      band_fraction               : share of bins the band occupies (the
                                    energy_fraction of a uniform mask)
      selectivity                 : energy_fraction / band_fraction
      iou                         : IoU of (mask > threshold) vs the band
    """
    mask = np.asarray(mask, np.float32)
    if freq_bins is not None or frames is not None:
        mask = mask[:, : freq_bins or mask.shape[1], : frames or mask.shape[2]]
    ind = band_indicator(stft_cfg, lo_hz, hi_hz)[: mask.shape[1]]
    in_b = ind[None, :, None]
    n_in = float(ind.sum()) * mask.shape[0] * mask.shape[2]
    n_out = float((1 - ind).sum()) * mask.shape[0] * mask.shape[2]
    in_mean = float((mask * in_b).sum() / max(n_in, 1.0))
    out_mean = float((mask * (1 - in_b)).sum() / max(n_out, 1.0))
    total = float(mask.sum())
    energy_frac = float((mask * in_b).sum() / max(total, 1e-12))
    band_frac = float(ind.sum() / mask.shape[1])
    hard = mask > threshold
    band_full = np.broadcast_to(in_b.astype(bool), mask.shape)
    inter = float(np.logical_and(hard, band_full).sum())
    union = float(np.logical_or(hard, band_full).sum())
    return {
        "in_band_mean": in_mean,
        "out_band_mean": out_mean,
        "concentration": in_mean / max(out_mean, 1e-9),
        "energy_fraction": energy_frac,
        "band_fraction": band_frac,
        "selectivity": energy_frac / max(band_frac, 1e-9),
        "iou": inter / max(union, 1.0),
    }
