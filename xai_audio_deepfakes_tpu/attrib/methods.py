"""Gradient attribution over the waveform input — the TPU-native replacement
for the Captum baselines in `captum_saliency.py`.

The reference wraps wav -> wav2vec2 -> mean-pool -> LogReg as a torch module
(`captum_saliency.py:84-100`) and runs Captum's InputXGradient (active),
Saliency / IntegratedGradients / GradientShap (imported, `:3,117`). Here each
method is a pure combinator over an arbitrary `score_fn: wav [B,L] -> logits
[B,1]`, built from jax.grad + lax.scan/vmap — every method is ONE compiled
XLA graph, batched (the reference loops files unbatched, `:123-135`).

Method semantics match Captum:
  * saliency:          |d score / d wav|
  * input_x_gradient:  wav * d score / d wav
  * integrated_grads:  (wav - baseline) * mean_k grad(baseline + a_k (wav -
                       baseline)), a_k on a left Riemann grid (Captum
                       `method="riemann_left"`; its default Gauss-Legendre
                       differs only in quadrature nodes)
  * smoothgrad:        mean_k grad(wav + sigma * noise_k)
  * gradient_shap:     mean_k [(wav - b_k) * grad(b_k + u_k (wav - b_k) +
                       sigma noise_k)], b_k sampled from `baselines`
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

ScoreFn = Callable[[jnp.ndarray], jnp.ndarray]


def _grad_fn(score_fn: ScoreFn):
    """Per-batch-summed scalar grad: d sum(score) / d wav — each row's score
    depends only on that row, so this equals the per-example gradient."""
    return jax.grad(lambda w: jnp.sum(score_fn(w)))


def saliency(score_fn: ScoreFn, wav: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(_grad_fn(score_fn)(wav))


def input_x_gradient(score_fn: ScoreFn, wav: jnp.ndarray) -> jnp.ndarray:
    return wav * _grad_fn(score_fn)(wav)


def integrated_gradients(
    score_fn: ScoreFn,
    wav: jnp.ndarray,
    baseline: jnp.ndarray | None = None,
    steps: int = 32,
) -> jnp.ndarray:
    if baseline is None:
        baseline = jnp.zeros_like(wav)
    delta = wav - baseline
    g = _grad_fn(score_fn)
    alphas = (jnp.arange(steps, dtype=wav.dtype) + 0.5) / steps  # midpoint grid

    def body(acc, a):
        return acc + g(baseline + a * delta), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(wav), alphas)
    return delta * total / steps


def smoothgrad(
    score_fn: ScoreFn,
    wav: jnp.ndarray,
    key: jax.Array,
    samples: int = 16,
    sigma: float = 0.1,
) -> jnp.ndarray:
    """sigma is relative to the waveform's dynamic range (max - min)."""
    g = _grad_fn(score_fn)
    span = jnp.max(wav) - jnp.min(wav)

    def body(acc, k):
        noise = jax.random.normal(k, wav.shape, wav.dtype) * sigma * span
        return acc + g(wav + noise), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(wav), jax.random.split(key, samples))
    return total / samples


def gradient_shap(
    score_fn: ScoreFn,
    wav: jnp.ndarray,
    key: jax.Array,
    baselines: jnp.ndarray | None = None,
    samples: int = 16,
    sigma: float = 0.1,
) -> jnp.ndarray:
    if baselines is None:
        baselines = jnp.zeros((2,) + wav.shape[1:], wav.dtype)
    g = _grad_fn(score_fn)
    span = jnp.max(wav) - jnp.min(wav)

    def body(acc, k):
        kb, ku, kn = jax.random.split(k, 3)
        b_idx = jax.random.randint(kb, (wav.shape[0],), 0, baselines.shape[0])
        base = baselines[b_idx]
        u = jax.random.uniform(ku, (wav.shape[0],) + (1,) * (wav.ndim - 1), wav.dtype)
        noise = jax.random.normal(kn, wav.shape, wav.dtype) * sigma * span
        point = base + u * (wav - base) + noise
        return acc + (wav - base) * g(point), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(wav), jax.random.split(key, samples))
    return total / samples


def attribution_mask(attr: jnp.ndarray) -> jnp.ndarray:
    """|attr| normalized to [0, 1] per example (`captum_saliency.py:136-139`)."""
    a = jnp.abs(attr)
    peak = jnp.max(a, axis=tuple(range(1, a.ndim)), keepdims=True)
    return a / (peak + 1e-8)


METHODS = {
    "saliency": saliency,
    "input_x_gradient": input_x_gradient,
    "integrated_gradients": integrated_gradients,
    "smoothgrad": smoothgrad,
    "gradient_shap": gradient_shap,
}


def waveform_explanation(
    score_fn: ScoreFn,
    wav: jnp.ndarray,
    method: str = "input_x_gradient",
    key: jax.Array | None = None,
    **kw,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (mask, relevant_wav, irrelevant_wav): the waveform-domain masking
    protocol of `captum_saliency.py:136-143`."""
    fn = METHODS[method]
    if method in ("smoothgrad", "gradient_shap"):
        if key is None:
            key = jax.random.PRNGKey(0)
        attr = fn(score_fn, wav, key, **kw)
    else:
        attr = fn(score_fn, wav, **kw)
    mask = attribution_mask(attr)
    return mask, wav * mask, wav * (1.0 - mask)
