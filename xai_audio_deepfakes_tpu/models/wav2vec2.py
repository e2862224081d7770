"""Truncated wav2vec2 XLS-R SSL embedder, TPU-native (flax linen).

Reproduces the architecture the reference consumes (`classifier_embedder.py:
13-18` loads a locally-truncated facebook/wav2vec2-xls-r-2b; the pipeline
reads `hidden_states[9]`, `audioprocessor.py:76-77`):

  waveform [B, 80000]
    -> conv feature encoder: 7 conv1d layers, each conv -> LayerNorm -> GELU
       (XLS-R `feat_extract_norm="layer"`), strides 5*2^6 = 320x downsample
       -> [B, 249, 512]
    -> feature projection: LN(512) -> Dense(512 -> 1920)
    -> + grouped positional conv embedding (kernel 128, groups 16,
       weight-normed in torch; effective weight materialized here)
    -> 9 pre-LN transformer layers (XLS-R `do_stable_layer_norm=True`)
    -> hidden_states[9] == output of layer 9, NOT final-layer-normed
       (HF appends each state *before* running the layer; the encoder-final
       LN only lands on the last tuple entry).

TPU-first notes
---------------
  * NWC layout everywhere (channels last) — flax/XLA native, MXU-friendly.
  * Attention uses plain jnp.einsum; XLA's differentiable fused attention
    makes the reference's "disable flash SDP for backward" workaround
    (`train_addvisor.py:21-23`) unnecessary.
  * bf16 compute via cfg.dtype with f32 params and f32 softmax/LN.
  * Optional per-layer remat (cfg.remat) for the 3-forward/2-backward
    training graph of the LMAC loss.
  * Optional 2-way+ tensor parallelism over the 'model' mesh axis is applied
    by `parallel.sharding` via logical axis annotations on the Dense kernels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import EmbedderConfig


def _dtype(cfg: EmbedderConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _gelu(x, kind: str):
    """GELU with selectable precision/cost (`EmbedderConfig.gelu`): "exact"
    erf form (HF parity) or the "tanh" approximation (2.25x faster on the
    v5e VPU, max abs err 5e-4 ~ bf16 rounding; GELU is ~25% of serving
    time across the conv frontend and the 9 FFNs)."""
    return jax.nn.gelu(x, approximate=(kind == "tanh"))


class _LNf32Stats(nn.Module):
    """LayerNorm with f32 statistics but output cast to the compute dtype.
    The conv frontend's early activations are the biggest tensors in the
    whole serving graph ([3B, 16k, 512] ~ 6 GB bf16 at batch 128); an f32 LN
    output (nn.LayerNorm(dtype=f32)) would double that dominant HBM traffic
    for accuracy the next bf16 conv immediately discards. Param tree
    ("scale" [C], "bias" [C] f32) matches nn.LayerNorm."""

    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (h,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (h,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return (xc * jax.lax.rsqrt(var + self.eps) * scale + bias).astype(self.dtype)


class _ConvParams(nn.Module):
    """Param holder with nn.Conv's exact tree (kernel [k, Cin, Cout] f32,
    bias [Cout] f32, same initializers) for the fused-conv path — HF imports
    and checkpoints see no difference between the fused and XLA branches."""

    k: int
    cin: int
    cout: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.k, self.cin, self.cout),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.cout,), jnp.float32)
            if self.use_bias
            else jnp.zeros((self.cout,), jnp.float32)
        )
        return kernel, bias


class _LNParams(nn.Module):
    """Param holder matching _LNf32Stats' tree (scale/bias [C] f32)."""

    c: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.c,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.c,), jnp.float32),
        )


class ConvLayerNormBlock(nn.Module):
    """conv1d -> LayerNorm(channel) -> exact GELU (HF Wav2Vec2LayerNormConvLayer)."""

    features: int
    kernel: int
    stride: int
    use_bias: bool
    eps: float
    dtype: Any
    gelu: str = "exact"
    quant: str = "none"
    fused: bool = False
    fused_ln: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, x):  # [B, L, C]
        # NOT int8-quantized under cfg.quant (only under the separate
        # cfg.quant_conv knob): the early conv layers run at L ~ 16k x
        # 512ch where the int32 accumulator temps double activation HBM
        # (measured: batch-128 serving goes 15.7G -> 17.6G, OOM), and conv
        # FLOPs concentrate in exactly those layers. quant_conv="int8"
        # measures that trade explicitly (round-5 ask; Cin>=64 gate keeps
        # conv_0's L=80k input out of the quantize pass).
        if self.quant == "int8" and x.shape[-1] >= 64:
            from xai_audio_deepfakes_tpu.ops.quant import int8_conv1d

            kernel, cbias = _ConvParams(
                self.kernel, x.shape[-1], self.features, self.use_bias,
                name="conv",
            )()
            y = int8_conv1d(x, kernel, stride=self.stride) + cbias
            x = _LNf32Stats(self.eps, self.dtype, name="layer_norm")(
                y.astype(self.dtype)
            )
            return _gelu(x, self.gelu)
        from xai_audio_deepfakes_tpu.ops.pallas_conv import (
            conv_ln_gelu,
            supports_fused_conv,
        )

        use_fused = (
            self.fused
            and supports_fused_conv(
                self.kernel, self.stride, x.shape[-1], self.features
            )
            and (jax.default_backend() == "tpu" or self.fused_interpret)
        )
        if use_fused:
            kernel, cbias = _ConvParams(
                self.kernel, x.shape[-1], self.features, self.use_bias,
                name="conv",
            )()
            scale, lbias = _LNParams(self.features, name="layer_norm")()
            return conv_ln_gelu(
                x, kernel, cbias, scale, lbias,
                self.stride, self.eps, self.gelu, self.dtype,
                self.fused_interpret,
            )
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        from xai_audio_deepfakes_tpu.ops.pallas_ln_gelu import (
            ln_gelu,
            supports_ln_gelu,
        )

        if (
            self.fused_ln
            and supports_ln_gelu(self.features)
            and (jax.default_backend() == "tpu" or self.fused_interpret)
        ):
            scale, lbias = _LNParams(self.features, name="layer_norm")()
            return ln_gelu(
                x, scale, lbias, self.eps, self.gelu, self.dtype,
                self.fused_interpret,
            )
        x = _LNf32Stats(self.eps, self.dtype, name="layer_norm")(x)
        return _gelu(x, self.gelu)


class FeatureEncoder(nn.Module):
    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, wav):  # [B, L] -> [B, T, C_last]
        x = wav[..., None].astype(_dtype(self.cfg))  # [B, L, 1]
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            x = ConvLayerNormBlock(
                features=dim,
                kernel=k,
                stride=s,
                use_bias=self.cfg.conv_bias,
                eps=self.cfg.layer_norm_eps,
                dtype=_dtype(self.cfg),
                gelu=self.cfg.gelu,
                quant=self.cfg.quant_conv,
                fused=self.cfg.fused_conv,
                fused_ln=self.cfg.fused_ln_gelu,
                fused_interpret=self.cfg.fused_interpret,
                name=f"conv_{i}",
            )(x)
        return x


class FeatureProjection(nn.Module):
    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, x):  # [B, T, C] -> [B, T, H]
        x = nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm"
        )(x)
        return nn.Dense(self.cfg.hidden_size, dtype=_dtype(self.cfg), name="projection")(x)


class _Int8GroupedConv(nn.Module):
    """Grouped conv1d with int8 x int8 -> int32 MXU contraction (serving
    path; measured 29.7 vs 36.3 ms bf16 at the 3x128 serving shape — the
    grouped conv maps less cleanly onto the int8 MXU than a dense matmul,
    so the gain is ~1.2x, not 2x). Per-sample activation scale (the kernel
    mixes time steps, so per-token scales don't apply; per-sample keeps
    each clip independent of its batch neighbors) + per-output-channel
    weight scale. Param tree ("kernel" [k, in/g, out], "bias" [out], both
    f32) is identical to nn.Conv, so HF imports work unchanged."""

    features: int
    kernel_size: int
    groups: int
    pad: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1] // self.groups, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        xf = x.astype(jnp.float32)
        # per-SAMPLE scale (max over time+channels, not batch): the conv
        # never mixes batch elements, and a whole-tensor scale would let a
        # loud co-batched clip coarsen every other clip's quantization —
        # the serve-api batcher coalesces unrelated requests, so each
        # clip's output must not depend on its batch neighbors.
        sx = (
            jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2), keepdims=True), 1e-12)
            / 127.0
        )
        xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
        sw = (
            jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1), keepdims=True), 1e-12
            )
            / 127.0
        )
        wq = jnp.clip(jnp.round(kernel / sw), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq,
            window_strides=(1,),
            padding=((self.pad, self.pad),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (sx * sw[0]) + bias
        # match nn.Conv(dtype=...): keep the residual add in compute dtype
        return y.astype(x.dtype)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv1d positional embedding (HF Wav2Vec2PositionalConvEmbedding).

    torch uses padding=k//2 then drops the trailing element when k is even
    (Wav2Vec2SamePadLayer). Weight norm is a torch training reparam; weights
    are imported as the effective g * v/||v|| product.
    """

    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, x):  # [B, T, H]
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        # int8-static keeps this site dynamic: the pos conv runs once per
        # forward (vs 4 sites x num_layers in the transformer), so a static
        # scale would save one reduce out of ~40
        if self.cfg.quant in ("int8", "int8-static"):
            y = _Int8GroupedConv(
                self.cfg.hidden_size,
                kernel_size=k,
                groups=self.cfg.num_conv_pos_embedding_groups,
                pad=pad,
                name="conv",
            )(x)
        else:
            y = nn.Conv(
                self.cfg.hidden_size,
                kernel_size=(k,),
                padding=((pad, pad),),
                feature_group_count=self.cfg.num_conv_pos_embedding_groups,
                dtype=_dtype(self.cfg),
                name="conv",
            )(x)
        if k % 2 == 0:
            y = y[:, :-1, :]
        return _gelu(y, self.cfg.gelu)


class Int8Dense(nn.Module):
    """Drop-in Dense running its matmul as int8 x int8 -> int32 on the MXU
    (`ops/quant.py`). Param tree ("kernel" [K,N] f32, "bias" [N] f32) is
    identical to nn.Dense, so checkpoints and HF imports work unchanged.

    sx with ndim == 1 means STATIC per-channel scales (shape [K]): the
    scales fold into the weight (`int8_matmul_static`); any other shape is
    the dynamic per-token convention."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x, xq=None, sx=None):
        from xai_audio_deepfakes_tpu.ops.quant import (
            int8_matmul_prequant,
            int8_matmul_static,
            quantize_symmetric,
        )

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if xq is None:
            xq, sx = quantize_symmetric(x, axis=-1)
        if sx.ndim == 1:
            return (int8_matmul_static(xq, sx, kernel) + bias).astype(self.dtype)
        return (int8_matmul_prequant(xq, sx, kernel) + bias).astype(self.dtype)


class HeadDense(nn.Module):
    """Attention projection for the fused-attention path. Param tree is
    nn.Dense-compatible (kernel [in_features, features] f32, bias [features]
    f32 — checkpoints/HF imports unchanged), but the *weights* are zero-
    padded per head so head_dim becomes lane-aligned (120 -> 128 for XLS-R):
    pad_axis=1 pads output columns (q/k/v: activations come out [B, T,
    NH*HDP] with exact-zero pad lanes), pad_axis=0 pads input rows
    (out_proj consumes the padded context directly). Padding weights costs
    O(H^2) elementwise per call — nothing next to the O(B*T*H^2) matmul —
    and is what lets `ops/attention`'s kernel slice heads tile-aligned
    instead of paying a relayout or a 3 GB HBM transpose per dispatch.
    Optionally quantized like Int8Dense (zero pad columns/rows survive
    symmetric quantization exactly)."""

    in_features: int
    features: int
    dtype: Any
    quant: str = "none"
    head_pad: tuple | None = None  # (nh, hd, hdp)
    pad_axis: int = 1

    @nn.compact
    def __call__(self, x, xq=None, sx=None):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if self.head_pad is not None:
            nh, hd, hdp = self.head_pad
            if self.pad_axis == 1:
                k3 = kernel.reshape(self.in_features, nh, hd)
                kernel = jnp.pad(
                    k3, ((0, 0), (0, 0), (0, hdp - hd))
                ).reshape(self.in_features, nh * hdp)
                bias = jnp.pad(
                    bias.reshape(nh, hd), ((0, 0), (0, hdp - hd))
                ).reshape(nh * hdp)
            else:
                k3 = kernel.reshape(nh, hd, self.features)
                kernel = jnp.pad(
                    k3, ((0, 0), (0, hdp - hd), (0, 0))
                ).reshape(nh * hdp, self.features)
        if self.quant in ("int8", "int8-static"):
            from xai_audio_deepfakes_tpu.ops.quant import (
                int8_matmul_prequant,
                int8_matmul_static,
                quantize_symmetric,
            )

            if xq is None:
                xq, sx = quantize_symmetric(x, axis=-1)
            if sx.ndim == 1:
                # static per-channel scales fold into the (already padded)
                # kernel — pad rows multiply a 1e-12-floored scale by zero
                # weights, so they stay exact zeros through quantization
                return (
                    int8_matmul_static(xq, sx, kernel) + bias
                ).astype(self.dtype)
            return (int8_matmul_prequant(xq, sx, kernel) + bias).astype(self.dtype)
        return (
            x.astype(self.dtype) @ kernel.astype(self.dtype)
        ) + bias.astype(self.dtype)


class EncoderLayer(nn.Module):
    """Pre-LN transformer layer (HF Wav2Vec2EncoderLayerStableLayerNorm):
    x += attn(LN(x)); x += ffn(LN(x)). Exact-GELU FFN, biased q/k/v/out.

    With cfg.quant == "int8" the six projection matmuls (q/k/v/out, FFN
    in/out) run int8 on the MXU; LN, softmax, and the small attention
    einsums stay in f32/bf16 (they carry ~t/(6h) of the layer's FLOPs).

    cfg.quant == "int8-static" replaces the DYNAMIC per-token activation
    scales with CALIBRATED per-CHANNEL scales passed via `act_scales`, a
    dict {"qkv", "ctx", "ffn_in", "ffn_out"} of f32 [C_site] vectors (one
    scale per contracted channel). The quantize step becomes a single
    read+write pass with no per-token max-reduce, and the scales fold
    into the weights (`int8_matmul_static`) at the already-paid in-graph
    weight-quantize cost. Per-channel (not per-tensor) matters: a single
    tensor-wide scale measured probability drift up to 0.3 at full
    geometry (docs/performance.md round 5). Calibrate with
    `collect_absmax=True`, which returns (y, {site: absmax[C]});
    scales = absmax / 127 over a calibration corpus. With
    act_scales=None, int8-static falls back to dynamic scales
    (uncalibrated serving still works)."""

    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, x, act_scales=None, collect_absmax: bool = False):
        # x: [B, T, H]; act_scales: {site: [C_site] f32} or None
        cfg = self.cfg
        h = cfg.hidden_size
        nh = cfg.num_heads
        hd = h // nh
        dt = _dtype(cfg)
        quant = cfg.quant in ("int8", "int8-static")
        if collect_absmax and not quant:
            raise ValueError(
                "collect_absmax calibrates the int8 activation-quantize "
                "sites; set cfg.quant to 'int8' or 'int8-static'"
            )
        use_static = cfg.quant == "int8-static" and act_scales is not None
        absmax: dict = {}

        def _site(t, name):
            """Quantize activation tensor t at the named site: int8 values
            + scale (per-token dynamic, or calibrated per-channel [C])."""
            from xai_audio_deepfakes_tpu.ops.quant import quantize_symmetric

            if collect_absmax:
                t32 = jnp.abs(t.astype(jnp.float32))
                # [2, C]: per-channel max AND 99.9th percentile over the
                # batch's tokens. calibrate_quant picks one: max never
                # saturates the calibration set; p999 gives ordinary
                # tokens finer resolution while the token-level outliers
                # wav2vec2 activations carry saturate at +-127
                absmax[name] = jnp.stack(
                    [
                        jnp.max(t32, axis=(0, 1)),
                        jnp.quantile(
                            t32.reshape(-1, t32.shape[-1]), 0.999, axis=0
                        ),
                    ]
                )
            if use_static:
                s = jnp.maximum(act_scales[name], 1e-12)
                tq = jnp.clip(
                    jnp.round(t.astype(jnp.float32) / s), -127.0, 127.0
                ).astype(jnp.int8)
                return tq, s
            return quantize_symmetric(t, axis=-1)

        def dense(features, name):
            if quant:
                return Int8Dense(features, dtype=dt, name=name)
            return nn.Dense(features, dtype=dt, name=name)

        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="attn_ln")(x)
        # fused attention needs the head-padded projections; only worth it on
        # TPU (the kernel), elsewhere the einsum path below is XLA-optimal
        use_fused = (
            cfg.fused_attention and jax.default_backend() == "tpu"
        ) or cfg.fused_interpret
        if use_fused:
            from xai_audio_deepfakes_tpu.ops.attention import attention, head_pad_dim

            pad = (nh, hd, head_pad_dim(hd))

            def proj(name, pad_axis=1):
                return HeadDense(
                    h, h, dtype=dt, quant=cfg.quant,
                    head_pad=pad, pad_axis=pad_axis, name=name,
                )

            if quant:
                # q/k/v read the same LN output: one shared activation-
                # quantize pass instead of three (the quantize is HBM-bound)
                yq, sy = _site(y, "qkv")
                q = proj("q_proj")(y, yq, sy) * (hd**-0.5)
                k = proj("k_proj")(y, yq, sy)
                v = proj("v_proj")(y, yq, sy)
            else:
                q = proj("q_proj")(y) * (hd**-0.5)
                k = proj("k_proj")(y)
                v = proj("v_proj")(y)
            ctx = attention(q, k, v, nh, interpret=cfg.fused_interpret)  # [B, T, NH*HDP]
            if quant:
                cq, cs = _site(ctx, "ctx")
                x = residual + proj("out_proj", pad_axis=0)(ctx, cq, cs)
            else:
                x = residual + proj("out_proj", pad_axis=0)(ctx)
        else:
            if quant:
                yq, sy = _site(y, "qkv")
                q = dense(h, "q_proj")(y, yq, sy) * (hd**-0.5)
                k = dense(h, "k_proj")(y, yq, sy)
                v = dense(h, "v_proj")(y, yq, sy)
            else:
                q = dense(h, "q_proj")(y) * (hd**-0.5)
                k = dense(h, "k_proj")(y)
                v = dense(h, "v_proj")(y)
            b, t = y.shape[0], y.shape[1]
            q = q.reshape(b, t, nh, hd)
            k = k.reshape(b, t, nh, hd)
            v = v.reshape(b, t, nh, hd)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, h)
            if quant:
                cq, cs = _site(ctx, "ctx")
                x = residual + dense(h, "out_proj")(ctx, cq, cs)
            else:
                x = residual + dense(h, "out_proj")(ctx)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ffn_ln")(x)
        if quant:
            y1q, s1 = _site(y, "ffn_in")
            y = dense(cfg.intermediate_size, "ffn_in")(y, y1q, s1)
            y = _gelu(y, cfg.gelu)
            gq, s3 = _site(y, "ffn_out")
            y = dense(h, "ffn_out")(y, gq, s3)
        else:
            y = dense(cfg.intermediate_size, "ffn_in")(y)
            y = _gelu(y, cfg.gelu)
            y = dense(h, "ffn_out")(y)
        out = x + y
        if collect_absmax:
            return out, absmax
        return out


def _remat(cls, cfg: EmbedderConfig):
    """nn.remat with the configured rematerialization policy (cfg.remat_policy):
    "full" recomputes the whole layer in backward (minimum memory), "dots"
    keeps matmul outputs and recomputes only the elementwise chains — trades
    ~1-2 GB of bf16 residuals for skipping the backward's matmul recompute."""
    if cfg.remat_policy == "dots":
        return nn.remat(cls, policy=jax.checkpoint_policies.checkpoint_dots)
    if cfg.remat_policy != "full":
        raise ValueError(f"unknown remat_policy: {cfg.remat_policy!r}")
    return nn.remat(cls)


class _ScanLayerBody(nn.Module):
    """scan body: one EncoderLayer per step over stacked [L, ...] params.
    `collect` additionally emits each layer's INPUT as the scan output
    (for hidden_states parity); off by default to avoid materializing the
    [L, B, T, H] stack. `calibrate` emits the layer's quantize-site absmax
    [4] instead (scan stacks them to [L, 4] for calibrate_act_scales).
    `scales` is the per-layer [4] slice of the static activation scales
    (scanned along axis 0) or None."""

    cfg: EmbedderConfig
    collect: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x, scales):
        if self.calibrate:
            y, absmax = EncoderLayer(self.cfg, name="layer")(
                x, scales, collect_absmax=True
            )
        else:
            y = EncoderLayer(self.cfg, name="layer")(x, scales)
            absmax = None
        return y, (x if self.collect else None, absmax)


class Wav2Vec2Encoder(nn.Module):
    """waveform [B, L] -> SSL features [B, T, H] (== HF hidden_states[output_layer]).

    Set `collect_hidden=True` to also return the full hidden-states tuple
    (HF `output_hidden_states=True` semantics).

    cfg.scan_layers switches the layer stack from a Python unroll to
    lax.scan over stacked params — the program is ~num_layers x smaller, so
    XLA compiles (especially of gradient graphs) are dramatically faster;
    numerics are identical (see test_scan_layers_matches_unrolled).
    """

    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, wav, collect_hidden: bool = False,
                 act_scales=None, calibrate: bool = False):
        # act_scales: [num_layers, 4] calibrated static activation scales
        # (cfg.quant == "int8-static"): act_scales is a dict
        # {"qkv","ctx","ffn_in","ffn_out"} of [num_layers, C_site] f32;
        # calibrate=True returns (features, {site: absmax [n_run, C_site]}).
        # Calibrate on the SAME backend/attention mode as serving — the
        # "ctx" site width is head-padded only on the fused-attention path.
        cfg = self.cfg
        if act_scales is not None and cfg.quant != "int8-static":
            raise ValueError(
                "act_scales only applies with cfg.quant == 'int8-static'"
            )
        x = FeatureEncoder(cfg, name="feature_encoder")(wav)
        x = FeatureProjection(cfg, name="feature_projection")(x)
        x = x + PositionalConvEmbedding(cfg, name="pos_conv")(x)

        site_absmax = None
        if cfg.scan_layers:
            # the param stack is always [num_layers, ...]; an inner readout
            # (output_layer < num_layers) collects per-layer states. For the
            # flagship truncation num_layers == output_layer, so nothing
            # extra runs or materializes.
            collect = collect_hidden or cfg.output_layer < cfg.num_layers
            body = _remat(_ScanLayerBody, cfg) if cfg.remat else _ScanLayerBody
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
            )(cfg, collect=collect, calibrate=calibrate, name="layers")
            first = x
            # inputs: [L, B, T, H] if collect; site_absmax: {site: [L, C]}
            # if calibrate (nn.scan stacks each pytree leaf along L)
            x, (inputs, site_absmax) = scanned(x, act_scales)
            if collect:
                hidden_states = (
                    [first]
                    + [inputs[i] for i in range(1, cfg.num_layers)]
                    + [x]
                )
            else:
                hidden_states = [x]  # == hidden_states[output_layer]
        else:
            n_run = (
                cfg.num_layers
                if collect_hidden
                else min(cfg.output_layer, cfg.num_layers)
            )
            hidden_states = [x]
            layer_cls = EncoderLayer
            if cfg.remat:
                layer_cls = _remat(EncoderLayer, cfg)
            absmaxes = []
            for i in range(n_run):
                scales_i = (
                    None
                    if act_scales is None
                    else jax.tree.map(lambda a: a[i], act_scales)
                )
                if calibrate:
                    x, am = layer_cls(cfg, name=f"layer_{i}")(
                        x, scales_i, collect_absmax=True
                    )
                    absmaxes.append(am)
                else:
                    x = layer_cls(cfg, name=f"layer_{i}")(x, scales_i)
                hidden_states.append(x)
            if calibrate:
                # stack per-layer dicts leafwise -> {site: [n_run, C]}
                site_absmax = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *absmaxes
                )

        out = hidden_states[min(cfg.output_layer, len(hidden_states) - 1)]
        if cfg.final_layer_norm:
            out = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="final_ln"
            )(out)
        out = out.astype(jnp.float32)
        if collect_hidden:
            return out, tuple(h.astype(jnp.float32) for h in hidden_states)
        if calibrate:
            return out, site_absmax
        return out


# ---------------------------------------------------------------------------
# Weight import from HF torch checkpoints
# ---------------------------------------------------------------------------


def _wn_effective_weight(sd: dict, prefix: str) -> np.ndarray:
    """Materialize torch weight_norm(conv, dim=2): w = g * v / ||v||_{dims!=2}."""
    for g_key, v_key in (
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
    ):
        if g_key in sd:
            g = np.asarray(sd[g_key], dtype=np.float32)
            v = np.asarray(sd[v_key], dtype=np.float32)
            norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)


def stack_layer_params(p: dict, n_layers: int) -> dict:
    """Convert unrolled `layer_{i}` param subtrees into the scanned layout
    (`layers/layer` with a leading [n_layers] axis). In-place on `p`."""
    layers = [p.pop(f"layer_{i}") for i in range(n_layers)]
    p["layers"] = {
        "layer": jax.tree.map(lambda *xs: np.stack(xs), *layers)
    }
    return p


def unstack_layer_params(p: dict, n_layers: int) -> dict:
    """Inverse of stack_layer_params (scanned -> unrolled layout)."""
    stacked = p.pop("layers")["layer"]
    for i in range(n_layers):
        p[f"layer_{i}"] = jax.tree.map(lambda x: np.asarray(x[i]), stacked)
    return p


def params_from_hf_state_dict(sd: dict, cfg: EmbedderConfig) -> dict:
    """Map a HF Wav2Vec2Model (do_stable_layer_norm=True, feat_extract_norm=
    "layer") torch state_dict onto this module's param tree.

    torch conv weight [out, in, k] -> flax kernel [k, in, out]; torch Linear
    weight [out, in] -> flax kernel [in, out].
    """

    def arr(key):
        return np.asarray(sd[key], dtype=np.float32)

    p: dict = {"feature_encoder": {}, "feature_projection": {}, "pos_conv": {}}
    for i in range(len(cfg.conv_dim)):
        blk = {
            "conv": {
                "kernel": arr(f"feature_extractor.conv_layers.{i}.conv.weight").transpose(2, 1, 0)
            },
            "layer_norm": {
                "scale": arr(f"feature_extractor.conv_layers.{i}.layer_norm.weight"),
                "bias": arr(f"feature_extractor.conv_layers.{i}.layer_norm.bias"),
            },
        }
        if cfg.conv_bias:
            blk["conv"]["bias"] = arr(f"feature_extractor.conv_layers.{i}.conv.bias")
        p["feature_encoder"][f"conv_{i}"] = blk

    p["feature_projection"] = {
        "layer_norm": {
            "scale": arr("feature_projection.layer_norm.weight"),
            "bias": arr("feature_projection.layer_norm.bias"),
        },
        "projection": {
            "kernel": arr("feature_projection.projection.weight").T,
            "bias": arr("feature_projection.projection.bias"),
        },
    }

    w_eff = _wn_effective_weight(sd, "encoder.pos_conv_embed.conv")  # [out, in/g, k]
    p["pos_conv"] = {
        "conv": {
            "kernel": w_eff.transpose(2, 1, 0),
            "bias": arr("encoder.pos_conv_embed.conv.bias"),
        }
    }

    def dense(key):
        return {"kernel": arr(f"{key}.weight").T, "bias": arr(f"{key}.bias")}

    n_avail = 0
    while f"encoder.layers.{n_avail}.layer_norm.weight" in sd:
        n_avail += 1
    for i in range(min(cfg.num_layers, n_avail)):
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "attn_ln": {
                "scale": arr(f"{pre}.layer_norm.weight"),
                "bias": arr(f"{pre}.layer_norm.bias"),
            },
            "q_proj": dense(f"{pre}.attention.q_proj"),
            "k_proj": dense(f"{pre}.attention.k_proj"),
            "v_proj": dense(f"{pre}.attention.v_proj"),
            "out_proj": dense(f"{pre}.attention.out_proj"),
            "ffn_ln": {
                "scale": arr(f"{pre}.final_layer_norm.weight"),
                "bias": arr(f"{pre}.final_layer_norm.bias"),
            },
            "ffn_in": dense(f"{pre}.feed_forward.intermediate_dense"),
            "ffn_out": dense(f"{pre}.feed_forward.output_dense"),
        }

    if cfg.final_layer_norm and "encoder.layer_norm.weight" in sd:
        p["final_ln"] = {
            "scale": arr("encoder.layer_norm.weight"),
            "bias": arr("encoder.layer_norm.bias"),
        }

    if cfg.scan_layers:
        stack_layer_params(p, min(cfg.num_layers, n_avail))

    return jax.tree.map(jnp.asarray, {"params": p})


def params_from_hf_dir(model_dir: str, cfg: EmbedderConfig) -> dict:
    """Load from a local HF checkpoint directory (the reference points at
    `/mnt/QNAP/.../wav2vec2-xls-r-2b_truncated`). Supports safetensors and
    pytorch_model.bin; no network access."""
    import os

    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = torch.load(
            os.path.join(model_dir, "pytorch_model.bin"), map_location="cpu"
        )
        sd = {k: v.numpy() for k, v in sd.items()}
    sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
    return params_from_hf_state_dict(sd, cfg)
