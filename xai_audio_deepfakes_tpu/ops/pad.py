"""Fixed-length clip contract: right-zero-pad or crop to N samples
(`audioprocessor.py:49-63,82-100`). Static-shape friendly: the target length
is a Python int so XLA compiles one graph per clip length."""

from __future__ import annotations

import jax.numpy as jnp


def pad_or_crop(x: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """[..., L] -> [..., num_samples]: right zero-pad if short, head-crop if long."""
    length = x.shape[-1]
    if length < num_samples:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, num_samples - length)]
        return jnp.pad(x, pad)
    return x[..., :num_samples]
