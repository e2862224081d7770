"""STFT/iSTFT parity vs torch.stft/torch.istft (the reference's exact ops,
`audioprocessor.py:102-131`) and internal consistency properties."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from xai_audio_deepfakes_tpu.config import AudioConfig, STFTConfig
from xai_audio_deepfakes_tpu.ops.stft import (
    istft,
    num_frames,
    stft,
    stft_magnitude_phase,
)
from xai_audio_deepfakes_tpu.ops.window import torch_style_window

CFG = STFTConfig()
AUDIO = AudioConfig()


def _torch_stft(x: np.ndarray, cfg: STFTConfig = CFG) -> torch.Tensor:
    win = None
    if cfg.window == "hann":
        win = torch.hann_window(cfg.win_length, dtype=torch.float64)
    return torch.stft(
        torch.from_numpy(x).to(torch.float64),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=win,
        center=cfg.center,
        return_complex=True,
    )


def test_window_matches_torch_padding():
    """torch.stft pads the win_length window centered to n_fft."""
    w = torch_style_window("rect", CFG.win_length, CFG.n_fft)
    left = (CFG.n_fft - CFG.win_length) // 2
    assert w.shape == (CFG.n_fft,)
    assert np.all(w[:left] == 0) and np.all(w[left + CFG.win_length :] == 0)
    assert np.all(w[left : left + CFG.win_length] == 1)


def test_num_frames_contract():
    """hop=322 => 249 frames for 80000 samples (matches wav2vec2 frame count,
    the alignment trick the reference's hop choice exists for)."""
    assert num_frames(AUDIO.num_samples, CFG) == 249


@pytest.mark.parametrize("batch", [1, 3])
def test_stft_matches_torch(rng, batch):
    x = rng.standard_normal((batch, AUDIO.num_samples)).astype(np.float32)
    re, im = stft(jnp.asarray(x), CFG)
    ref = _torch_stft(x)
    assert re.shape == (batch, 513, 249)
    np.testing.assert_allclose(np.asarray(re), ref.real.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag.numpy(), atol=2e-3)
    # relative error of the magnitude in float32 terms
    mag = np.abs(np.asarray(re) + 1j * np.asarray(im))
    ref_mag = ref.abs().numpy()
    denom = np.maximum(ref_mag, 1e-1)
    assert np.max(np.abs(mag - ref_mag) / denom) < 5e-4  # float32 DFT rounding


def test_stft_fft_method_agrees(rng):
    x = rng.standard_normal((2, AUDIO.num_samples)).astype(np.float32)
    re_m, im_m = stft(jnp.asarray(x), CFG, method="matmul")
    re_f, im_f = stft(jnp.asarray(x), CFG, method="fft")
    np.testing.assert_allclose(np.asarray(re_m), np.asarray(re_f), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_m), np.asarray(im_f), atol=2e-3)


def test_istft_matches_torch(rng):
    """Masked-spectrogram inversion parity: random mask in (0,1) applied to a
    real clip's STFT, inverted by us and by torch.istft."""
    x = rng.standard_normal((2, AUDIO.num_samples)).astype(np.float32) * 0.1
    ref_spec = _torch_stft(x)
    mask = rng.uniform(size=ref_spec.shape).astype(np.float32)
    masked = ref_spec.numpy() * mask
    ours = istft(
        jnp.asarray(masked.real.astype(np.float32)),
        jnp.asarray(masked.imag.astype(np.float32)),
        CFG,
        length=AUDIO.num_samples,
    )
    ref = torch.istft(
        torch.from_numpy(masked),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        length=AUDIO.num_samples,
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_roundtrip_mse(rng):
    """stft -> istft round trip reconstructs the waveform (< 1e-3 MSE; in
    practice ~float32 eps away from exact since rect-644/hop-322 tiles)."""
    x = rng.standard_normal((1, AUDIO.num_samples)).astype(np.float32)
    re, im = stft(jnp.asarray(x), CFG)
    y = istft(re, im, CFG, length=AUDIO.num_samples)
    mse = float(jnp.mean((y - x) ** 2))
    assert mse < 1e-6, mse


def test_roundtrip_hann_mel_convention(rng):
    """The vocoder data-gen convention (`hifigan.py:188-204`): Hann-1024,
    hop 256 roundtrips too."""
    cfg = STFTConfig(n_fft=1024, hop_length=256, win_length=1024, window="hann")
    x = rng.standard_normal((1, 40960)).astype(np.float32)
    re, im = stft(jnp.asarray(x), cfg)
    ref = _torch_stft(x, cfg)
    np.testing.assert_allclose(np.asarray(re), ref.real.numpy(), atol=2e-3)
    y = istft(re, im, cfg, length=40960)
    assert float(jnp.mean((y - x) ** 2)) < 1e-6


def test_magnitude_phase_match_torch(rng):
    x = rng.standard_normal((1, AUDIO.num_samples)).astype(np.float32)
    _, _, mag, phase = stft_magnitude_phase(jnp.asarray(x), CFG)
    ref = _torch_stft(x)
    np.testing.assert_allclose(np.asarray(mag), ref.abs().numpy(), atol=2e-3)
    # phase comparison away from near-zero magnitude bins
    m = ref.abs().numpy() > 1e-2
    dphi = np.asarray(phase) - ref.angle().numpy()
    dphi = np.mod(dphi + np.pi, 2 * np.pi) - np.pi
    assert np.max(np.abs(dphi[m])) < 1e-2


def test_istft_differentiable(rng):
    """The training loss needs gradients through iSTFT (`loss_function.py:46-53`)."""
    import jax

    x = rng.standard_normal((1, AUDIO.num_samples)).astype(np.float32)
    re, im = stft(jnp.asarray(x), CFG)

    def f(mask):
        y = istft(re * mask, im * mask, CFG, length=AUDIO.num_samples)
        return jnp.sum(y**2)

    g = jax.grad(f)(jnp.ones_like(re))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_golden_wav_stft_shapes(golden_wavs):
    wav, _ = golden_wavs["real_original"]
    assert wav.shape == (80000,)
    re, im = stft(jnp.asarray(wav[None]), CFG)
    assert re.shape == (1, 513, 249)
    ref = _torch_stft(wav[None])
    np.testing.assert_allclose(np.asarray(re), ref.real.numpy(), atol=2e-3)
