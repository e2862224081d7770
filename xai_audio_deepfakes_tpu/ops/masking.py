"""Mask application and complex re-masking ops.

The reference has TWO coexisting masking conventions (explicit config here,
see `config.MaskingConvention`):
  * LINEAR (training, `loss_function.py:38-45`): relevant = mask * mag,
    irrelevant = (1-mask) * mag, recombined with the original phase.
  * LOG1P (eval/serving, `LMAC_metrics.py:136-153`,
    `streamlit_controlled_study.py:174-183`): the mask multiplies log1p(mag)
    and the result is mapped back with expm1 before phase recombination.

Also reproduces the reference's shape quirks explicitly:
  * the UNet consumes/produces (512, 248) while the STFT yields (513, 249) —
    `crop_spec` / `pad_mask_to_spec` make the crop visible and asserted
    instead of the reference's implicit `[:, :Tmax, :]` trim that actually
    cuts the *frequency* axis (`loss_function.py:37-43`).
"""

from __future__ import annotations

import jax.numpy as jnp

from xai_audio_deepfakes_tpu.config import MaskingConvention


def crop_spec(spec: jnp.ndarray, freq_bins: int, frames: int) -> jnp.ndarray:
    """[..., F, T] -> [..., freq_bins, frames] head crop (513,249)->(512,248)."""
    f, t = spec.shape[-2], spec.shape[-1]
    assert f >= freq_bins and t >= frames, (spec.shape, freq_bins, frames)
    return spec[..., :freq_bins, :frames]


def pad_mask_to_spec(mask: jnp.ndarray, freq_bins: int, frames: int) -> jnp.ndarray:
    """Zero-pad a (512,248) mask back to full-spec (513,249).

    The padded rows/cols multiply the spectrogram by 0, i.e. the top bin and
    final frame are treated as irrelevant — the same effect the reference's
    silent trim has on the retained region.
    """
    f, t = mask.shape[-2], mask.shape[-1]
    pad = [(0, 0)] * (mask.ndim - 2) + [(0, freq_bins - f), (0, frames - t)]
    return jnp.pad(mask, pad)


def apply_mask(
    mask: jnp.ndarray,
    magnitude: jnp.ndarray,
    convention: MaskingConvention = MaskingConvention.LINEAR,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (relevant_mag, irrelevant_mag), same shape as `magnitude`.

    `mask` and `magnitude` must already be shape-aligned ([..., F, T]).
    """
    if convention == MaskingConvention.LINEAR:
        return mask * magnitude, (1.0 - mask) * magnitude
    log_mag = jnp.log1p(magnitude)
    return jnp.expm1(mask * log_mag), jnp.expm1((1.0 - mask) * log_mag)


def remask_complex(
    masked_magnitude: jnp.ndarray, phase: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mag, phase -> (real, imag) = mag * e^{j phase} (`loss_function.py:44-45`).

    Kept as a real pair (no complex dtype) so the MXU iSTFT consumes it
    directly and autodiff stays in real arithmetic.
    """
    return masked_magnitude * jnp.cos(phase), masked_magnitude * jnp.sin(phase)
