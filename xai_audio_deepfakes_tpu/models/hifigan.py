"""HiFi-GAN V1 generator for listenable-explanation synthesis.

The reference vocoder is SpeechBrain `tts-hifigan-libritts-16kHz`
(`hifigan.py:106-110`): HiFi-GAN V1 with 256x total upsampling
(rates 8,8,2,2) matching the hop-256 mel frontend, multi-receptive-field
fusion resblocks (kernels 3/7/11, dilations 1/3/5), LeakyReLU(0.1), tanh out.

TPU-first: NWC layout; transposed convs via flax ConvTranspose with
`transpose_kernel=True` so torch ConvTranspose1d weights [in, out, k] map
directly; weight_norm reparams are materialized to effective weights at
import time (the generator is inference-only here). The whole
mel [B, 80, T] -> wav [B, 256*T] graph jit-compiles as one XLA program; conv
channel widths (512..64) keep the MXU busy at every stage.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import HiFiGANConfig


class ResBlock1(nn.Module):
    """MRF residual block (HiFi-GAN V1): 3x [lrelu -> dilated conv -> lrelu ->
    conv(d=1)] with residual adds."""

    channels: int
    kernel: int
    dilations: tuple
    slope: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        for i, d in enumerate(self.dilations):
            pad = (k - 1) * d // 2
            y = nn.leaky_relu(x, self.slope)
            y = nn.Conv(self.channels, (k,), kernel_dilation=(d,),
                        padding=((pad, pad),), dtype=self.dtype, name=f"conv1_{i}")(y)
            y = nn.leaky_relu(y, self.slope)
            pad1 = (k - 1) // 2
            y = nn.Conv(self.channels, (k,), padding=((pad1, pad1),),
                        dtype=self.dtype, name=f"conv2_{i}")(y)
            x = x + y
        return x


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig = HiFiGANConfig()

    @nn.compact
    def __call__(self, mel):  # [B, n_mels, T] or [B, T, n_mels] -> [B, L]
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        if mel.shape[-1] == cfg.in_channels:
            x = mel  # already NWC
        else:
            x = mel.swapaxes(-1, -2)  # [B, T, n_mels]
        x = x.astype(dt)

        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding=((3, 3),),
                    dtype=dt, name="conv_pre")(x)

        ch = cfg.upsample_initial_channel
        for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = ch // 2
            x = nn.leaky_relu(x, cfg.leaky_slope)
            # torch ConvTranspose1d(padding=p) == full ("VALID") transposed
            # conv with p samples trimmed from each side (verified vs torch)
            pad = (k - rate) // 2
            x = nn.ConvTranspose(
                ch, (k,), strides=(rate,), padding="VALID",
                transpose_kernel=True, dtype=dt, name=f"up_{i}",
            )(x)
            if pad > 0:
                x = x[:, pad:-pad, :]
            acc = None
            for j, (rk, dils) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
            ):
                y = ResBlock1(ch, rk, dils, cfg.leaky_slope, dt,
                              name=f"res_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(cfg.resblock_kernel_sizes)

        x = nn.leaky_relu(x, cfg.leaky_slope)
        x = nn.Conv(1, (7,), padding=((3, 3),), dtype=dt, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]  # [B, L]


# ---------------------------------------------------------------------------
# Weight import (SpeechBrain / original jik876 layout, weight-normed torch)
# ---------------------------------------------------------------------------


def _wn(sd: dict, prefix: str) -> np.ndarray:
    """Materialize torch weight_norm: w = g * v / ||v|| (norm over dims != 0)."""
    for g_key, v_key in (
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
    ):
        if g_key in sd:
            g = np.asarray(sd[g_key], dtype=np.float32)
            v = np.asarray(sd[v_key], dtype=np.float32)
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)


def params_from_torch_state_dict(sd: dict, cfg: HiFiGANConfig) -> dict:
    """Map a jik876/SpeechBrain HiFi-GAN generator state_dict to this module.

    torch Conv1d weight [out, in, k] -> flax [k, in, out];
    torch ConvTranspose1d weight [in, out, k] -> flax(transpose_kernel=True)
    kernel [k, out, in]... verified against torch in tests: with
    transpose_kernel=True flax expects [spatial, out, in] == transpose(2,1,0).
    """

    def conv(prefix):
        w = _wn(sd, prefix)  # [out, in, k]
        p = {"kernel": w.transpose(2, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
        return p

    def tconv(prefix):
        w = _wn(sd, prefix)  # [in, out, k]
        p = {"kernel": w.transpose(2, 1, 0)}  # [k, out, in]
        if f"{prefix}.bias" in sd:
            p["bias"] = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
        return p

    p = {"conv_pre": conv("conv_pre")}
    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    for i in range(n_up):
        p[f"up_{i}"] = tconv(f"ups.{i}")
        for j in range(n_res):
            blk = {}
            for t in range(len(cfg.resblock_dilations[j])):
                blk[f"conv1_{t}"] = conv(f"resblocks.{i * n_res + j}.convs1.{t}")
                blk[f"conv2_{t}"] = conv(f"resblocks.{i * n_res + j}.convs2.{t}")
            p[f"res_{i}_{j}"] = blk
    p["conv_post"] = conv("conv_post")
    import jax

    return jax.tree.map(jnp.asarray, {"params": p})
