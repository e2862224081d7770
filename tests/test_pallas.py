"""Pallas fused STFT/iSTFT kernels vs the jnp oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.ops.pallas_stft import istft_pallas, stft_pallas
from xai_audio_deepfakes_tpu.ops.stft import istft, stft

CFG = STFTConfig()


def test_stft_pallas_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((2, 80000)).astype(np.float32) * 0.3)
    re_p, im_p = stft_pallas(x, CFG, interpret=True)
    re_j, im_j = stft(x, CFG)
    assert re_p.shape == re_j.shape == (2, 513, 249)
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_j), atol=2e-4)


def test_istft_pallas_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32) * 0.3)
    re, im = stft(x, CFG)
    mask = jnp.asarray(rng.uniform(size=re.shape).astype(np.float32))
    y_p = istft_pallas(re * mask, im * mask, CFG, length=80000, interpret=True)
    y_j = istft(re * mask, im * mask, CFG, length=80000)
    assert y_p.shape == (1, 80000)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_j), atol=2e-4)


def test_pallas_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32) * 0.3)
    re, im = stft_pallas(x, CFG, interpret=True)
    y = istft_pallas(re, im, CFG, length=80000, interpret=True)
    assert float(jnp.mean((y - x) ** 2)) < 1e-6


def test_fused_vjp_matches_jnp(rng):
    import jax

    from xai_audio_deepfakes_tpu.ops.pallas_stft import make_fused_istft, make_fused_stft

    x = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32) * 0.3)
    f_stft = make_fused_stft(CFG, interpret=True)
    f_istft = make_fused_istft(CFG, length=80000, interpret=True)

    def loss_fused(x):
        re, im = f_stft(x)
        y = f_istft(re * 0.5, im * 0.5)
        return jnp.sum(y**2)

    def loss_jnp(x):
        re, im = stft(x, CFG)
        y = istft(re * 0.5, im * 0.5, CFG, length=80000)
        return jnp.sum(y**2)

    g_f = jax.grad(loss_fused)(x)
    g_j = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), atol=2e-3)
