"""Attribution methods: analytic correctness on closed-form models + batching."""

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.attrib.methods import (
    attribution_mask,
    gradient_shap,
    input_x_gradient,
    integrated_gradients,
    saliency,
    smoothgrad,
    waveform_explanation,
)


def _linear_score(w):
    def fn(x):
        return x @ w  # [B, L] @ [L, 1]
    return fn


def test_saliency_and_ixg_linear(rng):
    L = 32
    w = jnp.asarray(rng.standard_normal((L, 1)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, L)).astype(np.float32))
    fn = _linear_score(w)
    np.testing.assert_allclose(
        np.asarray(saliency(fn, x)), np.abs(np.asarray(w)[None, :, 0]).repeat(3, 0),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(input_x_gradient(fn, x)), np.asarray(x) * np.asarray(w)[None, :, 0],
        atol=1e-6,
    )


def test_integrated_gradients_completeness(rng):
    """IG completeness axiom: sum(attr) == score(x) - score(baseline) for any
    model; exact for a quadratic with enough steps."""
    L = 16
    a = jnp.asarray(rng.standard_normal((L,)).astype(np.float32))

    def fn(x):  # nonlinear: quadratic + linear
        return (jnp.sum(x * x * a, axis=-1) + jnp.sum(x, axis=-1))[:, None]

    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    attr = integrated_gradients(fn, x, steps=64)
    total = np.asarray(jnp.sum(attr, axis=-1))
    ref = np.asarray(fn(x) - fn(jnp.zeros_like(x)))[:, 0]
    np.testing.assert_allclose(total, ref, rtol=1e-3)


def test_per_example_independence(rng):
    """Batched grad must equal per-example grads (no cross-example leakage)."""
    L = 8
    w = jnp.asarray(rng.standard_normal((L, 1)).astype(np.float32))

    def fn(x):
        return jnp.tanh(x) @ w

    x = jnp.asarray(rng.standard_normal((4, L)).astype(np.float32))
    batched = saliency(fn, x)
    for i in range(4):
        single = saliency(fn, x[i : i + 1])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single[0]), atol=1e-6)


def test_smoothgrad_and_gradshap_finite(rng):
    L = 16
    w = jnp.asarray(rng.standard_normal((L, 1)).astype(np.float32))
    fn = _linear_score(w)
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    sg = smoothgrad(fn, x, jax.random.PRNGKey(0), samples=8)
    # for a linear model smoothgrad == plain gradient regardless of noise
    np.testing.assert_allclose(
        np.asarray(sg), np.asarray(w)[None, :, 0].repeat(2, 0), atol=1e-4
    )
    gs = gradient_shap(fn, x, jax.random.PRNGKey(1), samples=8)
    assert np.all(np.isfinite(np.asarray(gs)))


def test_waveform_explanation_protocol(rng):
    """mask in [0,1] with per-example max 1; rel + irr == wav
    (`captum_saliency.py:136-143`)."""
    L = 32
    w = jnp.asarray(rng.standard_normal((L, 1)).astype(np.float32))
    fn = _linear_score(w)
    x = jnp.asarray(rng.standard_normal((3, L)).astype(np.float32))
    mask, rel, irr = waveform_explanation(fn, x, method="input_x_gradient")
    m = np.asarray(mask)
    assert np.all(m >= 0) and np.all(m <= 1)
    np.testing.assert_allclose(np.max(m, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rel + irr), np.asarray(x), atol=1e-6)


def test_attribution_mask_normalization(rng):
    a = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    m = attribution_mask(a)
    assert np.all(np.asarray(m) >= 0) and np.all(np.asarray(m) <= 1)


def test_methods_jit_compile(rng):
    L = 16
    w = jnp.asarray(rng.standard_normal((L, 1)).astype(np.float32))
    fn = _linear_score(w)
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    jit_ig = jax.jit(lambda xx: integrated_gradients(fn, xx, steps=8))
    np.testing.assert_allclose(
        np.asarray(jit_ig(x)), np.asarray(integrated_gradients(fn, x, steps=8)),
        atol=1e-6,
    )
