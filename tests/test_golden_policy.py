"""Golden-sample reproduction policy + what IS checkable without weights.

SURVEY §2.2 calls `audio_samples/` the parity fixtures: "the rebuilt pipeline
must reproduce original -> explanation". **Full reproduction is impossible**:
the explanation wavs were produced by the reference's *trained* mask decoder
(`addvisor_epoch_*.pth`, `streamlit_controlled_study.py:32`), whose weights
are not in the reference repo. No reimplementation can regenerate the mask
without them. (The import path for such checkpoints exists —
`models/unet.params_from_torch_state_dict` — so a user who has the weights
gets the full reproduction.)

Measured facts about the shipped artifacts (pinned below):
  * each explanation survives our stft->istft round trip near-losslessly —
    i.e. it is in the image of the reference iSTFT convention
    (rect-644/hop-322/center/len-80000);
  * explanations are sample-aligned with their originals (xcorr lag 0);
  * their log-magnitude spectra correlate ~0.53-0.55 with the originals but
    are NOT phase-coherent with them, and the fake explanation carries ~2.7x
    the original's energy — so the shipped wavs are not a bare
    mask-and-invert of the originals (post-processing such as loudness
    normalization or vocoding intervened). A (0,1)-mask resynthesis check
    against them is therefore NOT a valid oracle; instead the mask->apply->
    istft->recover loop is closed on the golden *originals* with a known
    mask (`test_known_mask_loop_closure`).
"""

import numpy as np
import pytest

from xai_audio_deepfakes_tpu.config import MaskingConvention, STFTConfig
from xai_audio_deepfakes_tpu.ops.masking import apply_mask, remask_complex
from xai_audio_deepfakes_tpu.ops.stft import istft, stft_magnitude_phase

CFG = STFTConfig()


def _spec(wav):
    import jax.numpy as jnp

    return stft_magnitude_phase(jnp.asarray(wav[None]), CFG)


@pytest.mark.parametrize("name", ["real_explanation", "fake_explanation"])
def test_golden_explanation_roundtrip(golden_wavs, name):
    """Our stft->istft round trip reconstructs the shipped explanation wavs
    near-losslessly (conventions match the torch pipeline that made them)."""
    wav, _ = golden_wavs[name]
    re, im, _, _ = _spec(wav)
    rec = np.asarray(istft(re, im, CFG, length=wav.shape[0]))[0]
    mse = float(np.mean((rec - wav) ** 2))
    assert mse < 1e-6, mse


@pytest.mark.parametrize("pair", [("real_original", "real_explanation"),
                                  ("fake_original", "fake_explanation")])
def test_golden_explanation_aligned_and_spectrally_derived(golden_wavs, pair):
    """Explanations are time-aligned with their originals and spectrally
    correlated with them (they are *derived*, not unrelated audio) — the
    strongest statistical pins the artifacts support (see module doc)."""
    orig, _ = golden_wavs[pair[0]]
    expl, _ = golden_wavs[pair[1]]
    n = len(orig) + len(expl)
    xc = np.fft.irfft(np.fft.rfft(orig, n) * np.conj(np.fft.rfft(expl, n)), n)
    lag = int(np.argmax(np.abs(xc)))
    if lag > n // 2:
        lag -= n
    assert lag == 0, lag

    _, _, mag_o, _ = _spec(orig)
    _, _, mag_e, _ = _spec(expl)
    lo = np.log1p(np.asarray(mag_o)[0]).ravel()
    le = np.log1p(np.asarray(mag_e)[0]).ravel()
    corr = float(np.corrcoef(lo, le)[0, 1])
    assert corr > 0.45, corr


@pytest.mark.parametrize("name", ["real_original", "fake_original"])
def test_known_mask_loop_closure_on_golden_audio(golden_wavs, name):
    """mask -> apply_mask(LOG1P) -> istft -> stft -> recover-implied-mask
    closes on the golden ORIGINALS with a known smooth mask: validates the
    masking conventions on real reference audio end-to-end, which is the
    checkable core of 'original -> explanation' without the trained
    decoder."""
    import jax.numpy as jnp

    orig, _ = golden_wavs[name]
    _, _, mag, ph = _spec(orig)
    f, t = mag.shape[-2], mag.shape[-1]
    # a smooth sigmoid-like mask (checkerboard masks don't survive the
    # iSTFT->STFT projection; decoder outputs are smooth too)
    fi, ti = np.meshgrid(np.arange(f), np.arange(t), indexing="ij")
    known = (0.15 + 0.7 / (1 + np.exp((fi - f / 2) / 40.0))).astype(np.float32)
    known = np.broadcast_to(known, (1, f, t))

    rel_mag, _ = apply_mask(jnp.asarray(known), mag, MaskingConvention.LOG1P)
    wav_m = istft(*remask_complex(rel_mag, ph), CFG, length=orig.shape[0])
    _, _, mag_m, _ = stft_magnitude_phase(wav_m, CFG)

    mag_np, mag_m_np = np.asarray(mag)[0], np.asarray(mag_m)[0]
    loud = np.log1p(mag_np) > 0.2
    implied = np.log1p(mag_m_np[loud]) / np.log1p(mag_np[loud])
    err = np.abs(implied - known[0][loud])
    assert float(np.median(err)) < 0.05, float(np.median(err))
    assert float(np.mean(err)) < 0.10, float(np.mean(err))
