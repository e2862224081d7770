"""STFT / iSTFT matching the reference's torch conventions, built TPU-first.

Reference behavior reproduced (oracle: torch.stft / torch.istft, CPU):
  * `audioprocessor.py:102-112`: n_fft=1024, hop=322, win=644, center=True
    (reflect pad), rectangular window zero-padded centered to n_fft,
    onesided, normalized=False. Output [B, 513, 249] for 80000-sample clips.
  * `audioprocessor.py:117-131`: istft forced to length=80000, same window;
    overlap-add with window-square envelope normalization.

TPU-first design
----------------
Instead of calling an FFT, the DFT is expressed as two matmuls against
precomputed cosine/sine bases: frames [B*T, n_fft] @ basis [n_fft, 513].
For this pipeline's shapes (249 frames x 1024 taps) that is a pure MXU
workload which XLA fuses with the windowing multiply; it is also trivially
differentiable, which matters because the LMAC loss backprops *through*
iSTFT into the mask decoder (`loss_function.py:46-53`). A jnp.fft path is
kept as a cross-check oracle (`method="fft"`).

All shapes are static; bases are baked into the compiled graph as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.ops.window import torch_style_window

def _precision(cfg: STFTConfig):
    return getattr(jax.lax.Precision, cfg.precision.upper())


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward one-sided DFT bases: Re = frames @ C, Im = frames @ S.

    X_k = sum_n x_n e^{-2 pi i n k / N}  for k in [0, N//2].
    """
    k = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    ks = np.arange(k, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * ks / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _idft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse bases exploiting hermitian symmetry of a real signal's DFT:

    x_n = (1/N) [X_0 + 2 sum_{k=1}^{N/2-1} (Re_k cos - Im_k sin) + X_{N/2} cos]
        = Re @ A + Im @ B,   A,B: [N//2+1, n_fft]
    """
    k = n_fft // 2 + 1
    ks = np.arange(k, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * ks * n / n_fft
    c = np.full((k, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    a = (c * np.cos(ang) / n_fft).astype(np.float32)
    b = (-c * np.sin(ang) / n_fft).astype(np.float32)
    return a, b


def num_frames(num_samples: int, cfg: STFTConfig) -> int:
    if cfg.center:
        return 1 + num_samples // cfg.hop_length
    return 1 + (num_samples - cfg.n_fft) // cfg.hop_length


def frame_signal(x: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """[B, L] -> windowed frames [B, T, n_fft] (center/reflect pad first).

    TPU note: framing is expressed as `ceil(n_fft/hop)` strided reshapes
    ("chunk streams") concatenated on the tap axis instead of a gather —
    frame t's taps [j*hop, (j+1)*hop) are exactly stream j's row t, where
    stream j = x[j*hop:].reshape(T, hop). XLA lowers this to pure data
    movement it can fuse; the equivalent jnp.take gather measured ~5x the
    DFT matmul's cost at serving batch on v5e.
    """
    if x.ndim == 1:
        x = x[None]
    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    t = 1 + (x.shape[-1] - n_fft) // hop
    nc = -(-n_fft // hop)  # chunks per frame
    need = (t - 1 + nc) * hop  # last chunk of the last frame must be in-bounds
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    streams = [
        x[:, j * hop : (j + t) * hop].reshape(x.shape[0], t, hop)
        for j in range(nc)
    ]
    frames = jnp.concatenate(streams, axis=-1)[:, :, :n_fft]
    win = jnp.asarray(torch_style_window(cfg.window, cfg.win_length, cfg.n_fft))
    return frames * win


def stft(
    x: jnp.ndarray, cfg: STFTConfig, method: str = "matmul"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real STFT. [B, L] (or [L]) -> (real, imag), each [B, F, T].

    Output layout [B, freq, time] matches torch.stft for API parity with the
    reference; internally compute is [B, T, n_fft] @ [n_fft, F].
    """
    if method == "matmul" and cfg.use_pallas and jax.default_backend() == "tpu":
        # fused Pallas framing+windowing+DFT (VMEM-resident frames); the
        # custom_vjp wrapper keeps it differentiable for attrib/while CPU
        # and non-matmul callers fall through to the jnp formulation
        from xai_audio_deepfakes_tpu.ops.pallas_stft import make_fused_stft

        return make_fused_stft(cfg)(x if x.ndim > 1 else x[None])
    frames = frame_signal(x, cfg)  # [B, T, n_fft]
    if method == "matmul":
        c, s = _dft_bases(cfg.n_fft)
        re = jnp.matmul(frames, jnp.asarray(c), precision=_precision(cfg))
        im = jnp.matmul(frames, jnp.asarray(s), precision=_precision(cfg))
    elif method == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        re, im = jnp.real(spec), jnp.imag(spec)
    else:
        raise ValueError(f"unknown stft method {method!r}")
    # [B, T, F] -> [B, F, T]
    return re.swapaxes(-1, -2), im.swapaxes(-1, -2)


def stft_magnitude_phase(
    x: jnp.ndarray, cfg: STFTConfig, method: str = "matmul"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(real, imag, magnitude, phase), magnitude/phase as torch .abs()/.angle()."""
    re, im = stft(x, cfg, method=method)
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    return re, im, mag, phase


@functools.lru_cache(maxsize=None)
def _ola_envelope(
    num_frames_: int, n_fft: int, hop: int, window_kind: str, win_length: int
) -> np.ndarray:
    """Sum of squared windows at each output sample (pre-trim), [padded_len]."""
    w = torch_style_window(window_kind, win_length, n_fft, dtype=np.float64)
    padded_len = n_fft + hop * (num_frames_ - 1)
    env = np.zeros(padded_len, dtype=np.float64)
    for t in range(num_frames_):
        env[t * hop : t * hop + n_fft] += w * w
    return env.astype(np.float32)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    cfg: STFTConfig,
    length: int,
    method: str = "matmul",
) -> jnp.ndarray:
    """Inverse STFT. (real, imag) [B, F, T] -> waveform [B, length].

    Mirrors torch.istft (`audioprocessor.py:117-131`): per-frame inverse DFT,
    window multiply, overlap-add, division by the window-square envelope,
    center trim of n_fft//2, crop/zero-pad to `length`. Differentiable (the
    training loss needs d(istft)/d(spec), `loss_function.py:46-53`).
    """
    if real.ndim == 2:
        real, imag = real[None], imag[None]
    b, f, t = real.shape
    re = real.swapaxes(-1, -2)  # [B, T, F]
    im = imag.swapaxes(-1, -2)
    if method == "matmul":
        a_basis, b_basis = _idft_bases(cfg.n_fft)
        frames = jnp.matmul(
            re, jnp.asarray(a_basis), precision=_precision(cfg)
        ) + jnp.matmul(
            im, jnp.asarray(b_basis), precision=_precision(cfg)
        )  # [B, T, n_fft]
    elif method == "fft":
        frames = jnp.fft.irfft(re + 1j * im, n=cfg.n_fft, axis=-1)
    else:
        raise ValueError(f"unknown istft method {method!r}")

    win = jnp.asarray(torch_style_window(cfg.window, cfg.win_length, cfg.n_fft))
    frames = frames * win

    # overlap-add as chunk streams (the framing trick in reverse): frame
    # taps [j*hop, (j+1)*hop) form a contiguous stream at output offset
    # j*hop — each term is a reshape+pad, no scatter (XLA scatter-add
    # measured ~6x the iDFT matmul's cost at serving batch on v5e)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    padded_len = n_fft + hop * (t - 1)
    nc = -(-n_fft // hop)
    fr = frames
    if nc * hop > n_fft:
        fr = jnp.pad(fr, ((0, 0), (0, 0), (0, nc * hop - n_fft)))
    total = (t - 1 + nc) * hop
    y = jnp.zeros((b, total), dtype=frames.dtype)
    for j in range(nc):
        stream = fr[:, :, j * hop : (j + 1) * hop].reshape(b, t * hop)
        y = y + jnp.pad(stream, ((0, 0), (j * hop, (nc - 1 - j) * hop)))
    y = y[:, :padded_len]

    env = jnp.asarray(
        _ola_envelope(t, cfg.n_fft, cfg.hop_length, cfg.window, cfg.win_length)
    )
    y = y / jnp.where(env > 1e-11, env, 1.0)

    if cfg.center:
        y = y[:, cfg.n_fft // 2 :]
    if y.shape[-1] >= length:
        y = y[:, :length]
    else:
        y = jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
    return y
