"""Normalization, masking, pad/crop, and mel ops parity + properties."""

import jax.numpy as jnp
import numpy as np
import torch

from xai_audio_deepfakes_tpu.config import MaskingConvention, MelConfig
from xai_audio_deepfakes_tpu.ops.masking import (
    apply_mask,
    crop_spec,
    pad_mask_to_spec,
    remask_complex,
)
from xai_audio_deepfakes_tpu.ops.mel import mel_filterbank, mel_spectrogram
from xai_audio_deepfakes_tpu.ops.normalize import zero_mean_unit_var_norm
from xai_audio_deepfakes_tpu.ops.pad import pad_or_crop


def test_zero_mean_unit_var_matches_torch(rng):
    """torch .std() is unbiased (N-1) — `classifier_embedder.py:59-63`."""
    x = rng.standard_normal((3, 80000)).astype(np.float32) * 0.3 + 0.1
    ours = zero_mean_unit_var_norm(jnp.asarray(x))
    t = torch.from_numpy(x)
    ref = (t - t.mean(dim=-1, keepdim=True)) / (t.std(dim=-1, keepdim=True) + 1e-7)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_pad_or_crop():
    x = jnp.ones((2, 70000))
    y = pad_or_crop(x, 80000)
    assert y.shape == (2, 80000)
    assert float(y[:, 70000:].sum()) == 0
    z = pad_or_crop(jnp.ones((2, 90000)), 80000)
    assert z.shape == (2, 80000)


def test_apply_mask_linear(rng):
    mag = jnp.asarray(rng.uniform(size=(2, 513, 249)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(2, 513, 249)).astype(np.float32))
    rel, irr = apply_mask(mask, mag, MaskingConvention.LINEAR)
    np.testing.assert_allclose(np.asarray(rel + irr), np.asarray(mag), atol=1e-6)


def test_apply_mask_log1p_matches_reference_formula(rng):
    """LMAC_metrics.py:136-153: expm1(mask * log1p(mag))."""
    mag = jnp.asarray(rng.uniform(size=(1, 8, 8)).astype(np.float32) * 5)
    mask = jnp.asarray(rng.uniform(size=(1, 8, 8)).astype(np.float32))
    rel, irr = apply_mask(mask, mag, MaskingConvention.LOG1P)
    ref_rel = np.expm1(np.asarray(mask) * np.log1p(np.asarray(mag)))
    ref_irr = np.expm1((1 - np.asarray(mask)) * np.log1p(np.asarray(mag)))
    np.testing.assert_allclose(np.asarray(rel), ref_rel, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(irr), ref_irr, rtol=1e-3, atol=1e-5)
    # mask==1 keeps everything, mask==0 kills everything
    rel1, irr1 = apply_mask(jnp.ones_like(mag), mag, MaskingConvention.LOG1P)
    np.testing.assert_allclose(np.asarray(rel1), np.asarray(mag), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(irr1), 0.0, atol=1e-6)


def test_crop_and_pad_roundtrip(rng):
    spec = jnp.asarray(rng.uniform(size=(2, 513, 249)).astype(np.float32))
    cropped = crop_spec(spec, 512, 248)
    assert cropped.shape == (2, 512, 248)
    mask = jnp.ones((2, 512, 248))
    padded = pad_mask_to_spec(mask, 513, 249)
    assert padded.shape == (2, 513, 249)
    assert float(padded[:, 512, :].sum()) == 0  # top bin masked out
    assert float(padded[:, :, 248].sum()) == 0  # last frame masked out


def test_remask_complex(rng):
    mag = jnp.asarray(rng.uniform(size=(4, 16)).astype(np.float32))
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(4, 16)).astype(np.float32))
    re, im = remask_complex(mag, phase)
    ref = np.asarray(mag) * np.exp(1j * np.asarray(phase))
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-6)


def test_mel_filterbank_matches_torchaudio_formula():
    """Slaney/slaney filterbank vs an independently-coded torch oracle."""
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # each filter has nonzero support and peaks within (f_min, f_max)
    assert np.all(fb.sum(axis=0) > 0)
    try:
        import torchaudio

        ref = torchaudio.functional.melscale_fbanks(
            513, 0.0, 8000.0, 80, 16000, norm="slaney", mel_scale="slaney"
        ).numpy()
        np.testing.assert_allclose(fb, ref, atol=1e-6)
    except ImportError:
        pass


def test_mel_spectrogram_shapes_and_compression(rng):
    cfg = MelConfig()
    x = rng.standard_normal((2, 80000)).astype(np.float32) * 0.1
    mel = mel_spectrogram(jnp.asarray(x), cfg)
    assert mel.shape == (2, 80, 1 + 80000 // 256)
    # compression floor: silent input maps to log(clip)
    silent = mel_spectrogram(jnp.zeros((1, 8000)), cfg)
    np.testing.assert_allclose(np.asarray(silent), np.log(1e-5), atol=1e-3)
