"""Cross-correlation waveform alignment (`hifigan.py:113-136`
`align_waveforms`): the vocoder's output is shifted relative to the source;
the reference aligns by argmax of the full cross-correlation computed with
F.conv1d. Here the correlation runs as an FFT product (O(N log N) instead of
the reference's O(N^2) sliding dot), jit-compiled; the shift/trim bookkeeping
is identical."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xcorr_shift(ref: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """Lag (in samples) maximizing corr(ref, deg): positive means `deg` is
    delayed relative to `ref`. Matches the conv1d construction of
    `align_waveforms` (cc index - padding)."""
    n = ref.shape[-1] + deg.shape[-1]
    size = int(2 ** np.ceil(np.log2(n)))
    fr = jnp.fft.rfft(ref, size)
    fd = jnp.fft.rfft(deg, size)
    cc = jnp.fft.irfft(fr * jnp.conj(fd), size)
    # lags: 0..L-1 then negative wrap
    idx = jnp.argmax(jnp.concatenate([cc[..., -deg.shape[-1]:], cc[..., : ref.shape[-1]]], axis=-1))
    return idx - deg.shape[-1]


def align_waveforms(ref: np.ndarray, deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Trim both signals to their overlapping, aligned region (host-side,
    mirrors the shift>0 / shift<=0 branches of `hifigan.py:126-136`)."""
    shift = int(xcorr_shift(jnp.asarray(ref), jnp.asarray(deg)))
    if shift > 0:
        ref_a = ref[shift:]
        deg_a = deg[: ref_a.shape[-1]]
    else:
        deg_a = deg[-shift:]
        ref_a = ref[: deg_a.shape[-1]]
    m = min(ref_a.shape[-1], deg_a.shape[-1])
    return ref_a[:m], deg_a[:m]
