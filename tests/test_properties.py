"""Property-based tests (hypothesis) for the DSP/metric core.

The reference's only numeric guards are ad-hoc printouts (SURVEY §4); here
the invariants that make the explanation pipeline meaningful are pinned as
properties over random inputs: mask decompositions conserve the spectrogram,
the iSTFT inverts the STFT for any signal, normalization is affine-invariant,
and EER is invariant under monotone score transforms.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from xai_audio_deepfakes_tpu.config import MaskingConvention, STFTConfig
from xai_audio_deepfakes_tpu.metrics.eer import compute_eer
from xai_audio_deepfakes_tpu.ops.masking import apply_mask
from xai_audio_deepfakes_tpu.ops.normalize import zero_mean_unit_var_norm
from xai_audio_deepfakes_tpu.ops.pad import pad_or_crop
from xai_audio_deepfakes_tpu.ops.resample import resample_poly_np
from xai_audio_deepfakes_tpu.ops.stft import istft, stft, stft_magnitude_phase

_f32 = lambda lo, hi: st.floats(
    lo, hi, allow_nan=False, allow_infinity=False, width=32
)


def _signals(length: int, batch: int = 1):
    return hnp.arrays(
        np.float32, (batch, length), elements=_f32(-1.0, 1.0)
    )


@settings(max_examples=15, deadline=None)
@given(_signals(4000))
def test_stft_roundtrip_any_signal(wav):
    """iSTFT(STFT(x)) == x for arbitrary bounded signals (rectangular
    win-644/hop-322 NOLA holds, so inversion is exact up to float error)."""
    cfg = STFTConfig()
    x = jnp.asarray(wav)
    real, imag = stft(x, cfg)
    back = istft(real, imag, cfg, length=wav.shape[-1])
    scale = max(float(np.abs(wav).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(back), wav, atol=2e-4 * scale + 1e-6)


@settings(max_examples=15, deadline=None)
@given(
    hnp.arrays(np.float32, (5, 9), elements=_f32(0.0, 1.0)),
    hnp.arrays(np.float32, (5, 9), elements=_f32(0.0, 50.0)),
)
def test_mask_decomposition_properties(mask, mag):
    m, g = jnp.asarray(mask), jnp.asarray(mag)
    rel, irr = apply_mask(m, g, MaskingConvention.LINEAR)
    # linear masking partitions the magnitude exactly
    np.testing.assert_allclose(np.asarray(rel + irr), mag, rtol=1e-5, atol=1e-5)
    assert float(jnp.min(rel)) >= 0 and float(jnp.min(irr)) >= 0

    rel_l, irr_l = apply_mask(m, g, MaskingConvention.LOG1P)
    # log1p convention: each part is bounded by the original magnitude
    assert np.all(np.asarray(rel_l) <= mag + 1e-4)
    assert np.all(np.asarray(irr_l) <= mag + 1e-4)
    assert float(jnp.min(rel_l)) >= -1e-6 and float(jnp.min(irr_l)) >= -1e-6


@settings(max_examples=15, deadline=None)
@given(
    _signals(512),
    _f32(0.125, 10.0),
    _f32(-5.0, 5.0),
)
def test_normalize_affine_invariance(wav, scale, shift):
    """zero-mean/unit-var output is invariant to input scale and shift
    (what makes the SSL embedder see a canonical waveform)."""
    x = jnp.asarray(wav)
    if float(jnp.std(x)) < 1e-3:
        return  # (near-)constant signals normalize to ~0 by the eps guard
    a = zero_mean_unit_var_norm(x)
    b = zero_mean_unit_var_norm(x * scale + shift)
    # f32 tolerances scale with the normalized range (outlier-heavy signals
    # legitimately produce |a| ~ sqrt(len))
    amax = max(1.0, float(jnp.max(jnp.abs(a))))
    assert abs(float(jnp.mean(a))) < 1e-5 * amax
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3 * amax)


@settings(max_examples=20, deadline=None)
@given(
    hnp.arrays(np.float32, (40,), elements=_f32(-5.0, 5.0)),
    hnp.arrays(np.int64, (40,), elements=st.integers(0, 1)),
)
def test_eer_monotone_invariance(scores, labels):
    if labels.min() == labels.max():
        return  # EER undefined with a single class
    e1 = compute_eer(scores, labels)
    # Strictly monotone transform of scores preserves the ROC, hence the EER.
    # f(x) = x + tanh(x) in float64 is expansive (f' >= 1), so it can never
    # collapse distinct float scores into new ties (a saturating transform
    # like tanh alone can, which legitimately changes the ROC).
    s64 = scores.astype(np.float64)
    e2 = compute_eer(s64 + np.tanh(s64), labels)
    assert 0.0 <= e1 <= 1.0
    np.testing.assert_allclose(e1, e2, atol=1e-9)


@settings(max_examples=20, deadline=None)
@given(_signals(777), st.integers(100, 2000))
def test_pad_or_crop_contract(wav, n):
    out = pad_or_crop(jnp.asarray(wav), n)
    assert out.shape == (1, n)
    keep = min(n, wav.shape[-1])
    np.testing.assert_array_equal(np.asarray(out[0, :keep]), wav[0, :keep])
    if n > wav.shape[-1]:
        assert float(jnp.abs(out[0, wav.shape[-1]:]).max()) == 0.0


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 1000))
def test_resample_preserves_dc(seed):
    """A constant (DC) signal stays constant through the polyphase resampler
    away from the edge taps (kernel rows sum to 1)."""
    rng = np.random.default_rng(seed)
    level = float(rng.uniform(-0.5, 0.5))
    x = np.full(4000, level, np.float32)
    y = resample_poly_np(x, 22050, 16000)
    core = y[50:-50]
    np.testing.assert_allclose(core, level, atol=5e-3)


@settings(max_examples=10, deadline=None)
@given(_signals(2000, batch=2))
def test_stft_magnitude_phase_consistency(wav):
    """mag*e^{j phase} reproduces the complex STFT (the remask identity the
    loss relies on, `loss_function.py:44-45`)."""
    cfg = STFTConfig()
    x = jnp.asarray(wav)
    real, imag, mag, phase = stft_magnitude_phase(x, cfg)
    np.testing.assert_allclose(
        np.asarray(mag * jnp.cos(phase)), np.asarray(real), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mag * jnp.sin(phase)), np.asarray(imag), atol=1e-4
    )
