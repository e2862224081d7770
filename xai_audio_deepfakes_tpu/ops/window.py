"""Analysis-window construction matching torch.stft semantics.

The reference calls torch.stft with NO window argument
(`audioprocessor.py:102-108`), which torch treats as a rectangular (all-ones)
window of length `win_length`, zero-padded **centered** to `n_fft`. The
vocoded-data generator uses a Hann-1024 window instead (`hifigan.py:188-196`).
Both are reproduced here as static numpy arrays baked into the compiled graph.
"""

from __future__ import annotations

import numpy as np


def periodic_hann(win_length: int) -> np.ndarray:
    """torch.hann_window(win_length) default: periodic Hann."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float64)


def torch_style_window(
    kind: str, win_length: int, n_fft: int, dtype=np.float32
) -> np.ndarray:
    """Build the length-n_fft window torch.stft effectively applies.

    torch pads a length-`win_length` window to `n_fft` by centering it:
    left pad = (n_fft - win_length) // 2. For the reference convention
    (rect, 644 in 1024) that is zeros[0:190], ones[190:834], zeros[834:1024].
    """
    if kind == "rect":
        w = np.ones(win_length, dtype=np.float64)
    elif kind == "hann":
        w = periodic_hann(win_length)
    else:
        raise ValueError(f"unknown window kind: {kind!r}")
    if win_length > n_fft:
        raise ValueError("win_length must be <= n_fft")
    left = (n_fft - win_length) // 2
    padded = np.zeros(n_fft, dtype=np.float64)
    padded[left : left + win_length] = w
    return padded.astype(dtype)
