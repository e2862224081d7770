"""Spectrogram-magnitude -> sigmoid-mask UNet decoder (the current-generation
ADDvisor decoder, `addvisor.py:27-84`), rebuilt NHWC/TPU-native.

Geometry mirrors the reference exactly (same kernels/strides/dilations/
channel widths) but with the latent shape bug fixed: the reference annotates
input (B,1,512,249) yet its skip concats only close for (512, 248); the STFT
actually yields (513, 249) and no crop exists in its visible code
(`train_addvisor.py:251,363`). Here the input contract IS (freq 512, time
248) — producers crop via `ops.masking.crop_spec` and consumers pad the mask
back with `pad_mask_to_spec`, both asserted.

Encoder channels 1->32->64->128->256, dilated 512-ch bottleneck (d=2 then
d=4), transposed-conv decoder with skip concats, 1x1 conv + sigmoid head.
Freq-only downsampling in the first two stages (stride (2,1), kernel (5,3))
— the asymmetric design keeps all 248 frames at full resolution until stage
3, matching `addvisor.py:31-34`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from xai_audio_deepfakes_tpu.config import UNetConfig
from xai_audio_deepfakes_tpu.ops.quant import int8_conv2d


class Conv2D(nn.Module):
    """2-D conv with nn.Conv-compatible params ("kernel" HWIO + "bias") and
    an optional int8 MXU path (`ops.quant.int8_conv2d`, serving-only — the
    quantizer's round has zero gradient, so `quant` is ignored when a caller
    needs this module differentiable; see UNetMaskDecoder.__call__)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    kernel_dilation: tuple = (1, 1)
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.quant == "int8":
            y = int8_conv2d(x, kernel, self.strides, self.padding, self.kernel_dilation)
            return (y + bias).astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            self.strides, self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
        )
        return y + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    """conv(k,s,p) -> BN -> LeakyReLU -> conv(3,1,1) -> BN -> LeakyReLU
    (`addvisor.py:12-25`)."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple = (1, 1)
    slope: float = 0.2
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = ((self.padding[0], self.padding[0]), (self.padding[1], self.padding[1]))
        x = Conv2D(
            self.features, self.kernel, strides=self.strides, padding=pad,
            dtype=self.dtype, quant=self.quant, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(x)
        x = nn.leaky_relu(x, self.slope)
        x = Conv2D(self.features, (3, 3), dtype=self.dtype, quant=self.quant, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(x)
        return nn.leaky_relu(x, self.slope)


class UNetMaskDecoder(nn.Module):
    """magnitude [B, 512, 248] (or [B,512,248,1]) -> mask [B, 512, 248] in (0,1)."""

    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, mag, train: bool = False):
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        # int8 convs are serving-only (zero gradient through the quantizer's
        # round); the training graph always takes the float path.
        q = "none" if train else cfg.quant
        if mag.ndim == 3:
            x = mag[..., None]
        else:
            x = mag
        assert x.shape[1:] == (cfg.freq_bins, cfg.frames, 1), x.shape
        x = x.astype(dt)
        c = cfg.base_channels
        s = cfg.leaky_slope

        x1 = ConvBlock(c, (5, 3), (2, 1), (2, 1), s, dt, q, name="e1")(x, train)      # [256,248,32]
        x2 = ConvBlock(2 * c, (5, 3), (2, 1), (2, 1), s, dt, q, name="e2")(x1, train)  # [128,248,64]
        x3 = ConvBlock(4 * c, (3, 3), (2, 2), (1, 1), s, dt, q, name="e3")(x2, train)  # [64,124,128]
        x4 = ConvBlock(8 * c, (3, 3), (2, 2), (1, 1), s, dt, q, name="e4")(x3, train)  # [32,62,256]

        # dilated bottleneck (`addvisor.py:36-43`)
        b = Conv2D(16 * c, (3, 3), padding=((2, 2), (2, 2)), kernel_dilation=(2, 2),
                   dtype=dt, quant=q, name="bneck_conv1")(x4)
        b = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bneck_bn1")(b)
        b = nn.leaky_relu(b, s)
        b = Conv2D(16 * c, (3, 3), padding=((4, 4), (4, 4)), kernel_dilation=(4, 4),
                   dtype=dt, quant=q, name="bneck_conv2")(b)
        b = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bneck_bn2")(b)
        b = nn.leaky_relu(b, s)                                                     # [32,62,512]

        def up(z, feats, kernel, name):
            return nn.ConvTranspose(feats, kernel, strides=kernel, dtype=dt, name=name)(z)

        y = up(b, 8 * c, (2, 2), "up4")                                             # [64,124,256]
        y = jnp.concatenate([y, x3.astype(dt)], axis=-1)                            # 384ch
        y = ConvBlock(8 * c, slope=s, dtype=dt, quant=q, name="d4")(y, train)
        y = up(y, 4 * c, (2, 2), "up3")                                             # [128,248,128]
        y = jnp.concatenate([y, x2.astype(dt)], axis=-1)                            # 192ch
        y = ConvBlock(4 * c, slope=s, dtype=dt, quant=q, name="d3")(y, train)
        y = up(y, 2 * c, (2, 1), "up2")                                             # [256,248,64]
        y = jnp.concatenate([y, x1.astype(dt)], axis=-1)                            # 96ch
        y = ConvBlock(2 * c, slope=s, dtype=dt, quant=q, name="d2")(y, train)
        y = up(y, c, (2, 1), "up1")                                                 # [512,248,32]
        y = jnp.concatenate([y, x.astype(dt)], axis=-1)                             # 33ch
        y = ConvBlock(c, slope=s, dtype=dt, quant=q, name="d1")(y, train)

        y = Conv2D(1, (1, 1), padding=((0, 0), (0, 0)), dtype=dt, name="mask_head")(y)
        mask = jax.nn.sigmoid(y.astype(jnp.float32))
        return mask[..., 0]  # [B, 512, 248]


def params_from_torch_state_dict(sd: dict) -> dict:
    """Map a reference UNet state_dict (`addvisor.py:27-84`, the format of the
    trained checkpoints named at `LMAC_metrics.py:21` /
    `streamlit_controlled_study.py:32`) onto this module's variables.

    Accepts numpy arrays or torch tensors; DDP-saved dicts with a "module."
    prefix are handled (the reference strips it at `LMAC_metrics.py:23-25`).

    Weight layout conversions (verified against torch in tests):
      Conv2d          [out, in, kh, kw] -> flax [kh, kw, in, out]
      ConvTranspose2d [in, out, kh, kw] -> flax(transpose_kernel=False)
                      [kh, kw, in, out] with BOTH spatial axes flipped
      BatchNorm2d     weight/bias -> scale/bias; running stats -> batch_stats
    Returns {"params": ..., "batch_stats": ...} ready for `.apply`.
    """
    import numpy as np

    def arr(key):
        v = sd.get(key, sd.get("module." + key))
        if v is None:
            raise KeyError(f"missing key in UNet state dict: {key}")
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def conv(prefix):
        return {
            "kernel": jnp.asarray(arr(f"{prefix}.weight").transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(arr(f"{prefix}.bias")),
        }

    def tconv(prefix):
        w = arr(f"{prefix}.weight").transpose(2, 3, 0, 1)[::-1, ::-1]
        return {
            "kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(arr(f"{prefix}.bias")),
        }

    def bn(prefix):
        p = {
            "scale": jnp.asarray(arr(f"{prefix}.weight")),
            "bias": jnp.asarray(arr(f"{prefix}.bias")),
        }
        s = {
            "mean": jnp.asarray(arr(f"{prefix}.running_mean")),
            "var": jnp.asarray(arr(f"{prefix}.running_var")),
        }
        return p, s

    params: dict = {}
    stats: dict = {}

    def convblock(name, prefix):
        # torch ConvBlock Sequential: 0 conv, 1 bn, 3 conv, 4 bn
        bn1_p, bn1_s = bn(f"{prefix}.block.1")
        bn2_p, bn2_s = bn(f"{prefix}.block.4")
        params[name] = {
            "conv1": conv(f"{prefix}.block.0"),
            "bn1": bn1_p,
            "conv2": conv(f"{prefix}.block.3"),
            "bn2": bn2_p,
        }
        stats[name] = {"bn1": bn1_s, "bn2": bn2_s}

    for i in (1, 2, 3, 4):
        convblock(f"e{i}", f"e{i}")
        convblock(f"d{i}", f"d{i}")
    for flax_name, t_idx in (("bneck_conv1", 0), ("bneck_conv2", 3)):
        params[flax_name] = conv(f"bottleneck.{t_idx}")
    for flax_name, t_idx in (("bneck_bn1", 1), ("bneck_bn2", 4)):
        p, s = bn(f"bottleneck.{t_idx}")
        params[flax_name] = p
        stats[flax_name] = s
    for i in (1, 2, 3, 4):
        params[f"up{i}"] = tconv(f"up{i}")
    params["mask_head"] = conv("mask_head.0")
    return {"params": params, "batch_stats": stats}
