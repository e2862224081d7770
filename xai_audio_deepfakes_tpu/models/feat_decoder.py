"""Legacy feature-input mask decoder.

The reference imports an `ADDvisor` class that consumes wav2vec2 FEATURES
and emits a spectrogram mask (`LMAC_metrics.py:6,133`;
`streamlit_controlled_study.py:5,167`) — but that class no longer exists in
its `addvisor.py` (API drift between decoder generations; the shipped
checkpoints `addvisor_epoch_89_loss_0.0177.pth` / `addvisor_epoch_200_...`
were trained against it). This module provides the capability those two
consumers need, with the call-site contract preserved:

    mask = decoder(features[B, 249, 1920])   # -> [B, 512, 249]
    Tmax = mask.shape[1]                     # == 512
    magnitude[:, :Tmax, :]                   # crops freq 513 -> 512

i.e. `mask.shape[1]` must equal the cropped frequency-bin count, and the
trailing axis aligns with the 249 STFT/SSL frames (the hop-322 alignment
trick).

Design (TPU-first, not a port — the original is unrecoverable): per-frame
MLP projects SSL features to a frequency profile, a temporal depthwise-ish
conv stack mixes context, and a sigmoid head emits the (freq x time) mask.
All matmul-dominated, one fused XLA graph.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from xai_audio_deepfakes_tpu.config import FeatDecoderConfig


class FeatureMaskDecoder(nn.Module):
    cfg: FeatDecoderConfig = FeatDecoderConfig()

    @nn.compact
    def __call__(self, feats):  # [B, T, D] -> [B, freq_bins, T]
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        b, t, d = feats.shape
        assert d == cfg.feature_dim, (feats.shape, cfg.feature_dim)
        x = feats.astype(dt)
        x = nn.LayerNorm(dtype=jnp.float32, name="in_ln")(x).astype(dt)
        x = nn.Dense(cfg.hidden, dtype=dt, name="proj_in")(x)
        x = jax.nn.gelu(x)
        # temporal context mixing: residual conv1d blocks over the frame axis
        for i in range(cfg.temporal_blocks):
            k = 5
            h = nn.Conv(cfg.hidden, (k,), padding=((k // 2, k // 2),), dtype=dt,
                        name=f"tconv_{i}")(x)
            h = jax.nn.gelu(h)
            x = x + h
        # optional global context: pre-LN self-attention + FFN blocks (the
        # round-5 capacity study — local convs cannot move band evidence
        # across distant frames; zero layers reproduces the round-4 tree)
        for i in range(cfg.attn_layers):
            y = nn.LayerNorm(dtype=jnp.float32, name=f"attn_ln_{i}")(x).astype(dt)
            y = nn.MultiHeadDotProductAttention(
                num_heads=cfg.attn_heads, dtype=dt, name=f"attn_{i}"
            )(y, y)
            x = x + y
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ffn_ln_{i}")(x).astype(dt)
            y = nn.Dense(cfg.hidden * 4, dtype=dt, name=f"ffn_in_{i}")(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(cfg.hidden, dtype=dt, name=f"ffn_out_{i}")(y)
            x = x + y
        x = nn.LayerNorm(dtype=jnp.float32, name="out_ln")(x).astype(dt)
        prof = nn.Dense(cfg.freq_bins, dtype=dt, name="freq_head")(x)  # [B, T, F]
        mask = jax.nn.sigmoid(prof.astype(jnp.float32))
        return mask.swapaxes(-1, -2)  # [B, F, T]
