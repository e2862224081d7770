"""Per-utterance waveform normalization preceding the SSL embedder.

Matches `classifier_embedder.py:59-63`: zero-mean, divide by (std + 1e-7)
where std is torch's default **unbiased** (N-1 denominator) standard
deviation. Differentiable — it sits inside the LMAC loss graph
(`loss_function.py:48-49` -> `audioprocessor.py:69-77`).
"""

from __future__ import annotations

import jax.numpy as jnp


def zero_mean_unit_var_norm(x: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """[..., L] -> normalized [..., L] with unbiased std over the last axis."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    n = x.shape[-1]
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / max(n - 1, 1)
    return centered / (jnp.sqrt(var) + eps)
