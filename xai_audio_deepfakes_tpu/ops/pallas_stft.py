"""Pallas TPU kernels for the STFT hot path.

The jnp reference implementation (`ops/stft.py`) frames via gather, which
XLA materializes as a [B, 249, 1024] intermediate in HBM before the DFT
matmuls. These kernels fuse framing + windowing + the two DFT matmuls into
one pass: each grid step DMAs only the overlapping waveform span it needs
from HBM into VMEM, builds its frame tile in VMEM scratch, and runs the
[TILE_T, n_fft] @ [n_fft, n_bins] products on the MXU — no frame tensor ever
touches HBM. The iSTFT kernel is the mirror image: inverse-DFT matmul, then
windowed overlap-add accumulated in VMEM.

`make_fused_stft` / `make_fused_istft` wrap the kernels in custom_vjp: both
ops are linear, so the backward pass is their transpose, obtained from the
jnp oracle's vjp — the LMAC loss differentiates through the fused kernels
exactly as through the reference ops (`loss_function.py:46-53`).

The jnp path stays the numerical oracle; `tests/test_pallas.py` checks
equality in interpret mode on CPU. Production status: selectable via
`STFTConfig.use_pallas` (`ops/stft.py` dispatches here on TPU) and
measured END-TO-END at parity with the default chunk-stream matmul-DFT
(228.1 vs 229.7 clips/s at serving batch 128 — the XLA formulation needs
no gather at all and fuses fully, so it stays default; numbers in
docs/performance.md). Lowering on the real chip needs two accommodations:
the kernel is batch-aware (vmap'd pallas_call squeezes the batch dim out
of the block shape, which Mosaic's sublane rule rejects), and frames load
from 128-aligned offsets + `pltpu.roll` for the residual (Mosaic requires
lane-dim dynamic-slice offsets be provably lane-aligned; the hop is 322).
The iSTFT kernel's overlap-add WRITES at hop-strided offsets and there is
no scatter-side roll — it stays interpret-mode only; on TPU
`istft_pallas` would need the chunk-stream OLA, i.e. exactly what
`ops/stft.py::istft` already does.
Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.ops.stft import _dft_bases, _idft_bases, _ola_envelope
from xai_audio_deepfakes_tpu.ops.window import torch_style_window

# frames per grid step per sample: 8 rows is the f32 sublane tile
TILE_T = 8
# batch rows per grid step: Mosaic requires the second-to-last block dim be
# a multiple of 8 (or the full array dim) — a batch tile of 8 satisfies that
# for the [B, L] waveform input, and lets one grid step feed the MXU a
# [TILE_B*TILE_T, n_fft] frame matrix instead of single-frame dots
TILE_B = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_stft_call(batch: int, padded_len: int, num_frames: int, n_fft: int,
                    hop: int, n_bins: int, interpret: bool):
    # Mosaic requires lane-aligned (multiple-of-128) block minor dims; the
    # 513 one-sided bins are padded to 640 here (bases zero-padded, result
    # sliced by the wrapper)
    n_bins_p = _round_up(n_bins, 128)
    rows = TILE_B * TILE_T

    span = n_fft + 128  # aligned load + up-to-127-lane in-register rotate

    def kernel(wav_ref, win_ref, cos_ref, sin_ref, re_ref, im_ref, frames):
        t = pl.program_id(1)

        # stage the 64 windowed frames of this (batch-tile, frame-tile) into
        # VMEM scratch — frames overlap (hop < n_fft), which BlockSpec's
        # block-unit index maps cannot express, and Mosaic requires lane-dim
        # dynamic-slice offsets be provably 128-aligned (hop is 322): load
        # from the aligned offset below each frame start and rotate the
        # residual with pltpu.roll (dynamic in-register lane rotate)
        for b in range(TILE_B):
            def body(i, _):
                start = (t * TILE_T + i) * hop
                aligned = (start // 128) * 128
                shift = start - aligned  # in [0, 128)
                rows = wav_ref[b, pl.ds(aligned, span)][None, :]
                rows = pltpu.roll(rows, -shift, axis=1)
                frames[pl.ds(b * TILE_T + i, 1), :] = (
                    rows[:, :n_fft] * win_ref[0, :]
                )
                return 0

            jax.lax.fori_loop(0, TILE_T, body, 0)

        # one MXU-shaped dot pair for the whole tile
        re = jnp.dot(frames[...], cos_ref[...], preferred_element_type=jnp.float32)
        im = jnp.dot(frames[...], sin_ref[...], preferred_element_type=jnp.float32)
        for b in range(TILE_B):
            re_ref[b, :, :] = re[b * TILE_T : (b + 1) * TILE_T, :]
            im_ref[b, :, :] = im[b * TILE_T : (b + 1) * TILE_T, :]

    grid_b = batch // TILE_B
    grid_t = num_frames // TILE_T
    total_t = grid_t * TILE_T

    return pl.pallas_call(
        kernel,
        grid=(grid_b, grid_t),
        in_specs=[
            # full-length rows per batch tile: the frame overlap spans are
            # taken with pl.ds inside the kernel
            pl.BlockSpec((TILE_B, padded_len), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, TILE_T, n_bins_p), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, TILE_T, n_bins_p), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, total_t, n_bins_p), jnp.float32),
            jax.ShapeDtypeStruct((batch, total_t, n_bins_p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, n_fft), jnp.float32)],
        interpret=interpret,
    )


def stft_pallas(
    x: jnp.ndarray, cfg: STFTConfig, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, L] -> (re, im) [B, F, T]; numerically matches ops.stft.stft."""
    if x.ndim == 1:
        x = x[None]
    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    num_frames = 1 + (x.shape[-1] - n_fft) // hop
    n_bins = cfg.num_bins
    # pad frame count up to a TILE_T multiple; surplus frames read past the
    # signal, so extend the padded signal accordingly (zeros)
    t_pad = (-num_frames) % TILE_T
    total_t = num_frames + t_pad
    need = (total_t - 1) * hop + n_fft
    # Mosaic block minor dims must be lane-aligned (%128) — round the padded
    # waveform up; +128 because the kernel loads each frame from the aligned
    # offset below its start and rotates (see _make_stft_call). The surplus
    # zeros sit past the last frame's span and are never read.
    need = _round_up(max(need + 128, x.shape[-1]), 128)
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))

    cos_b, sin_b = _dft_bases(n_fft)
    n_bins_p = _round_up(n_bins, 128)
    pad_cols = ((0, 0), (0, n_bins_p - n_bins))
    cos_b = np.pad(cos_b, pad_cols)
    sin_b = np.pad(sin_b, pad_cols)
    win = torch_style_window(cfg.window, cfg.win_length, n_fft)[None, :]

    # batch tile: pad with zero rows (computed then discarded) rather than
    # vmap — vmap'd pallas_call squeezes the batch dim out of the block
    # shape, which Mosaic's sublane rule rejects for B > 1
    batch = x.shape[0]
    b_pad = (-batch) % TILE_B
    if b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, 0)))
    call = _make_stft_call(
        batch + b_pad, x.shape[-1], total_t, n_fft, hop, n_bins, interpret
    )
    re, im = call(x, jnp.asarray(win), jnp.asarray(cos_b), jnp.asarray(sin_b))
    re = re[:batch, :num_frames, :n_bins]
    im = im[:batch, :num_frames, :n_bins]
    return re.swapaxes(-1, -2), im.swapaxes(-1, -2)


def _make_istft_call(num_frames: int, n_fft: int, hop: int, n_bins: int,
                     padded_len: int, interpret: bool):
    def kernel(re_ref, im_ref, win_ref, a_ref, b_ref, out_ref, acc_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_scr[...] = jnp.zeros_like(acc_scr)

        t = pl.program_id(0)
        # [TILE_T, n_bins] @ [n_bins, n_fft] -> frames tile, then windowed OLA
        frames = (
            jnp.dot(re_ref[...], a_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(im_ref[...], b_ref[...], preferred_element_type=jnp.float32)
        ) * win_ref[0, :]

        def body(i, _):
            start = (t * TILE_T + i) * hop
            acc_scr[0, pl.ds(start, n_fft)] = (
                acc_scr[0, pl.ds(start, n_fft)] + frames[i, :]
            )
            return 0

        jax.lax.fori_loop(0, TILE_T, body, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_scr[...]

    grid_t = num_frames // TILE_T
    return pl.pallas_call(
        kernel,
        grid=(grid_t,),
        in_specs=[
            pl.BlockSpec((TILE_T, n_bins), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, n_bins), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, padded_len), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, padded_len), jnp.float32)],
        interpret=interpret,
    )


def istft_pallas(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    cfg: STFTConfig,
    length: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(re, im) [B, F, T] -> [B, length]; matches ops.stft.istft."""
    if real.ndim == 2:
        real, imag = real[None], imag[None]
    b, f, t = real.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    t_pad = (-t) % TILE_T
    total_t = t + t_pad
    re = jnp.pad(real.swapaxes(-1, -2), ((0, 0), (0, t_pad), (0, 0)))
    im = jnp.pad(imag.swapaxes(-1, -2), ((0, 0), (0, t_pad), (0, 0)))
    padded_len = n_fft + hop * (total_t - 1)

    a_b, b_b = _idft_bases(n_fft)
    win = torch_style_window(cfg.window, cfg.win_length, n_fft)[None, :]
    call = _make_istft_call(total_t, n_fft, hop, cfg.num_bins, padded_len, interpret)

    def one(re_row, im_row):
        return call(
            re_row, im_row, jnp.asarray(win), jnp.asarray(a_b), jnp.asarray(b_b)
        )[0]

    y = jax.vmap(one)(re, im)

    env = jnp.asarray(_ola_envelope(t, n_fft, hop, cfg.window, cfg.win_length))
    env = jnp.pad(env, (0, padded_len - env.shape[0]), constant_values=1.0)
    y = y / jnp.where(env > 1e-11, env, 1.0)
    if cfg.center:
        y = y[:, n_fft // 2 :]
    if y.shape[-1] >= length:
        y = y[:, :length]
    else:
        y = jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
    return y


# ---------------------------------------------------------------------------
# differentiable wrappers (backward = linear transpose via the jnp oracle)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def make_fused_stft(cfg: STFTConfig, interpret: bool = False):
    from xai_audio_deepfakes_tpu.ops.stft import stft as stft_jnp

    # the oracle must be the plain jnp path — with use_pallas set (the
    # production dispatch in ops/stft.py routes back here) the vjp of the
    # custom_vjp would recurse
    oracle_cfg = dataclasses.replace(cfg, use_pallas=False)

    @jax.custom_vjp
    def fused(x):
        return stft_pallas(x, cfg, interpret=interpret)

    def fwd(x):
        return fused(x), x.shape

    def bwd(shape, ct):
        zero = jnp.zeros(shape, jnp.float32)
        _, vjp = jax.vjp(lambda x: stft_jnp(x, oracle_cfg), zero)
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused


def make_fused_istft(cfg: STFTConfig, length: int, interpret: bool = False):
    from xai_audio_deepfakes_tpu.ops.stft import istft as istft_jnp

    @jax.custom_vjp
    def fused(real, imag):
        return istft_pallas(real, imag, cfg, length=length, interpret=interpret)

    def fwd(real, imag):
        return fused(real, imag), real.shape

    def bwd(shape, ct):
        zero = jnp.zeros(shape, jnp.float32)
        _, vjp = jax.vjp(lambda r, i: istft_jnp(r, i, cfg, length=length), zero, zero)
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused
