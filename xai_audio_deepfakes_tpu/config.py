"""Typed configuration tree for the whole framework.

The reference hardcodes every constant across its scripts (STFT params as ctor
defaults in `audioprocessor.py:23-31`, lrs at `train_addvisor.py:104-105`,
batch sizes, data roots, ...). Here everything lives in one frozen dataclass
tree that is hashable (usable as a jit static argument) and CLI-overridable.

Reference inconsistencies are made explicit config instead of silently picking
one behavior:
  * masking convention: training masks RAW magnitude (`loss_function.py:39-45`)
    while eval/serving masks log1p(mag) then expm1 (`LMAC_metrics.py:138-153`).
  * label polarity: the detector was trained with real=0 / manipulated=1
    (`train_logReg_swapping.py:62-92`) but UI text claims 0=fake/1=real
    (`streamlit_controlled_study.py:273`).
  * spectrogram crop: the UNet only closes its skip connections for
    (512 freq x 248 frames) while the STFT yields (513 x 249); the crop the
    reference implies (`loss_function.py:37-43`) is explicit here.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass


class MaskingConvention(str, enum.Enum):
    """How the predicted mask is applied to the STFT magnitude.

    LINEAR: relevant = mask * mag                  (training convention,
            `loss_function.py:38-45`)
    LOG1P:  relevant = expm1(mask * log1p(mag))    (eval/serving convention,
            `LMAC_metrics.py:136-153`, `streamlit_controlled_study.py:174-183`)
    """

    LINEAR = "linear"
    LOG1P = "log1p"


class LabelPolarity(str, enum.Enum):
    """Which class the positive detector logit means.

    MANIPULATED_IS_ONE matches how the sklearn LogReg was actually trained
    (real=0, band-swapped=1, `train_logReg_swapping.py:62-92`).
    """

    MANIPULATED_IS_ONE = "manipulated_is_one"
    REAL_IS_ONE = "real_is_one"


def manipulated_probability(prob, polarity: "LabelPolarity | str"):
    """Map the detector's sigmoid output P(class 1) to P(manipulated).

    The reference is internally inconsistent about this: the LogReg was
    trained real=0/manipulated=1 (`train_logReg_swapping.py:62-92`), but the
    UI text and its fakes-first split assume 1=real
    (`streamlit_controlled_study.py:246-247,273`). Every decision in this
    framework (gallery split, manipulated counts) goes through this single
    mapping so the polarity knob actually changes behavior.
    """
    if LabelPolarity(polarity) is LabelPolarity.MANIPULATED_IS_ONE:
        return prob
    return 1.0 - prob


@dataclass(frozen=True)
class STFTConfig:
    """STFT convention of the reference (`audioprocessor.py:23-31,102-112`).

    No window argument to torch.stft means a rectangular (all-ones) window of
    `win_length`, zero-padded centered to `n_fft`. hop=322 is load-bearing:
    1 + 80000//322 = 249 STFT frames = 249 wav2vec2 frames (the conv encoder
    downsamples by 5*2^6=320), aligning mask frames with SSL feature frames.
    """

    sample_rate: int = 16000
    n_fft: int = 1024
    hop_length: int = 322
    win_length: int = 644
    window: str = "rect"  # "rect" | "hann"
    center: bool = True
    pad_mode: str = "reflect"
    use_pallas: bool = False  # TPU-only: run the forward STFT through the
    # fused Pallas framing+DFT kernel (`ops/pallas_stft.py` — frames are
    # built in VMEM scratch and never touch HBM) instead of the chunk-stream
    # matmul-DFT. Differentiable (custom_vjp transpose via the jnp oracle).
    # Off by default: measured at parity with the XLA formulation end-to-end
    # (numbers in docs/performance.md); the flag exists so the kernel is a
    # selectable production path rather than dead code. iSTFT always uses
    # the chunk-stream OLA — its Pallas variant needs hop-strided dynamic
    # writes Mosaic cannot lower. On CPU the flag falls back to the jnp path.
    precision: str = "high"  # MXU precision for the DFT matmuls:
    # "highest" (6-pass bf16, bit-closest to f32) | "high" (3-pass) |
    # "default" (1-pass bf16). Measured at serving batch 128 on v5e:
    # stft+istft 11.98 / 8.88 / 7.47 ms with max waveform error 0 /
    # 1.9e-5 / 1.7e-3 vs HIGHEST — "high" sits 50x under the <1e-3
    # parity budget (BASELINE.md) at 26% less DFT time, so it is the
    # default; CPU tests are exact f32 regardless.

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


@dataclass(frozen=True)
class AudioConfig:
    """Fixed-length clip contract (`audioprocessor.py:49-63`): 5 s @ 16 kHz,
    right-zero-padded or cropped to exactly 80000 samples."""

    sample_rate: int = 16000
    clip_seconds: float = 5.0

    @property
    def num_samples(self) -> int:
        return int(self.clip_seconds * self.sample_rate)

    def num_frames(self, stft: STFTConfig) -> int:
        assert stft.center
        return 1 + self.num_samples // stft.hop_length


@dataclass(frozen=True)
class MelConfig:
    """Mel transform used on the vocoder path (`hifigan.py:163-178`):
    hop 256, win 1024, 80 mels, f_max 8 kHz, slaney norm+scale, power 1,
    log-compression. (The 80-mel transform constructed in
    `audioprocessor.py:38-44` is dead code in the reference pipeline.)"""

    sample_rate: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8000.0
    power: float = 1.0
    norm: str = "slaney"
    mel_scale: str = "slaney"
    compression: bool = True
    compression_clip: float = 1e-5


@dataclass(frozen=True)
class EmbedderConfig:
    """Truncated wav2vec2 XLS-R-2B (`classifier_embedder.py:13-18`): hidden
    1920, and only layers up to hidden_states[9] are consumed
    (`audioprocessor.py:76-77`), i.e. embeddings + 9 transformer layers.

    Defaults mirror facebook/wav2vec2-xls-r-2b; `tiny()` builds a small config
    for tests.
    """

    hidden_size: int = 1920
    num_layers: int = 9  # transformer layers actually evaluated
    num_heads: int = 16
    intermediate_size: int = 7680
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "layer"  # XLS-R uses per-conv LayerNorm
    do_stable_layer_norm: bool = True  # pre-LN transformer (XLS-R)
    conv_bias: bool = True  # XLS-R feature-encoder convs have bias
    output_layer: int = 9  # hidden_states index consumed downstream
    final_layer_norm: bool = False  # apply encoder-final LN to the output
    # (hidden_states[9] of a >=10-layer truncation is NOT final-LN'd; a
    # 9-layer truncation's last hidden state IS — configurable for parity)
    remat: bool = False  # rematerialize encoder layers (training memory)
    remat_policy: str = "full"  # "full": recompute everything in backward
    # (minimum memory). "dots": jax.checkpoint_policies.checkpoint_dots —
    # keep matmul outputs, recompute only elementwise ops (LN/GELU/softmax);
    # saves the backward's matmul recompute (~1 fwd of MXU FLOPs per bwd)
    # for ~1-2 GB of saved bf16 residuals at train batch 16.
    scan_layers: bool = False  # lax.scan over the layer stack: ~num_layers x
    # smaller HLO -> much faster XLA compiles (essential for grad graphs and
    # deep truncations); params stack to [L, ...] under 'layers/layer'
    dtype: str = "float32"  # compute dtype; "bfloat16" for TPU serving
    quant: str = "none"  # "int8": transformer q/k/v/out + FFN matmuls run as
    # int8 x int8 -> int32 on the MXU (~2x bf16 peak on v5e) with per-token
    # activation scales and per-channel weight scales computed in-graph; the
    # param tree stays f32, so every weight-import path works unchanged.
    # Serving-only knob (quantization is not differentiated through).
    # "int8-static": same matmuls, but activation scales are CALIBRATED
    # per-tensor constants (pipeline.calibrate_quant -> params
    # ["quant_scales"] [L, 4]) instead of per-token reductions — removes a
    # whole max-reduce pass over each quantize site's input per layer;
    # measured +9% end-to-end serving (docs/performance.md round 5).
    # Uncalibrated int8-static falls back to dynamic scales.
    quant_conv: str = "none"  # "int8": the conv frontend's >=64-channel
    # layers (conv_1..conv_6 — conv_0 has Cin=1 and a quantize pass over
    # its L=80k input costs more HBM than the whole conv saves) run as
    # int8 x int8 -> int32 MXU contractions with per-sample activation
    # scales. Separate from `quant` because the regimes differ: the
    # transformer matmuls measured ~2x from int8, while the conv frontend
    # already runs at 70-89% of bf16 MXU peak with int32-accumulator HBM
    # temps as the cost (see docs/performance.md). Serving-only.
    fused_interpret: bool = False  # force the fused Pallas paths (attention
    # + conv frontend) in interpret mode regardless of backend — CPU parity
    # tests of the production kernels at real geometry.
    fused_conv: bool = False  # Pallas fused conv+LN+GELU for the stride-2
    # conv-frontend layers on TPU (one HBM read + one write per block
    # instead of XLA's separate conv and LN/GELU kernels over the largest
    # activations in the graph). Default OFF: parity-verified on TPU, but
    # the serving graph with it over-allocates HBM at the batch-128 sweet
    # spot (FAILED_PRECONDITION) — opt in at smaller batches. CPU falls
    # back to the identical XLA formulation. See ops/pallas_conv.py.
    fused_ln_gelu: bool = False  # Pallas fused LayerNorm+GELU epilogue for
    # the conv-frontend layers on TPU (one HBM read + one write per
    # activation row instead of XLA's stats pass + normalize/GELU pass over
    # the largest activations in the graph). Unlike fused_conv it needs no
    # halo blocks or strided selects — plain blocked reduce+elementwise.
    # CPU falls back to the identical XLA formulation; differentiable via
    # recompute VJP. See ops/pallas_ln_gelu.py.
    fused_attention: bool = True  # Pallas fused attention on TPU (scores/
    # softmax never touch HBM; differentiable via recompute VJP). On CPU the
    # op falls back to the identical einsum formulation, so tests and the
    # virtual-mesh dryrun are unaffected. See ops/attention.py.
    gelu: str = "exact"  # "exact" (erf, HF-parity default) | "tanh": the
    # tanh approximation measures 2.25x faster on the v5e VPU (33.1 -> 14.7
    # ms/pass at serving shape) with max abs error 5e-4 — at bf16 rounding
    # level, and well under the int8 path's quantization noise. GELU is
    # ~25% of serving time (conv frontend + 9 FFNs). Only bench.py defaults
    # to "tanh" (recorded in its output JSON); the CLI default is "exact",
    # so CLI serving output is always the HF-parity path unless overridden.

    @staticmethod
    def xls_r_2b_full() -> "EmbedderConfig":
        """Untruncated facebook/wav2vec2-xls-r-2b: 48 layers. With the
        hidden_states[9] readout the truncated default (9 layers) suffices;
        this preset serves full-model studies, with remat + bf16 + 2-way TP
        of the MLP/attention as the memory contingency (SURVEY §5)."""
        return EmbedderConfig(num_layers=48, remat=True, dtype="bfloat16")

    @staticmethod
    def tiny() -> "EmbedderConfig":
        return EmbedderConfig(
            hidden_size=32,
            num_layers=3,
            num_heads=2,
            intermediate_size=64,
            conv_dim=(8, 8, 8),
            conv_kernel=(10, 3, 2),
            conv_stride=(5, 2, 2),
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=2,
            output_layer=2,
        )


@dataclass(frozen=True)
class UNetConfig:
    """Spectrogram-magnitude mask decoder (`addvisor.py:27-84`). The input is
    the STFT magnitude cropped to (freq_bins, frames) so every skip concat
    closes; the reference's implied crop (513,249)->(512,248) is explicit."""

    freq_bins: int = 512
    frames: int = 248
    base_channels: int = 32
    leaky_slope: float = 0.2
    dtype: str = "float32"
    # Serving-only (ignored when the module is applied with train=True —
    # the quantizer's round has zero gradient): run the UNet's 3x3/5x3
    # convs as int8 MXU contractions (`ops.quant.int8_conv2d`). The mask is
    # the product output, so unlike the embedder's int8 knob this perturbs
    # what users hear; parity bounds are pinned in tests/test_models.py.
    quant: str = "none"  # "none" | "int8"


@dataclass(frozen=True)
class FeatDecoderConfig:
    """Legacy feature-input decoder (`ADDvisor` consumed at
    `LMAC_metrics.py:133` / `streamlit_controlled_study.py:167` but absent
    from the reference HEAD). Maps SSL features [B,T,H] to a (freq x frames)
    mask compatible with `mag[:, :mask.shape[1], :]` indexing."""

    feature_dim: int = 1920
    freq_bins: int = 512
    frames: int = 249
    hidden: int = 512
    dtype: str = "float32"
    # capacity knobs (round-5 feature-decoder study): defaults reproduce
    # the round-4 architecture (and its param tree / checkpoints) exactly.
    temporal_blocks: int = 2  # k5 residual conv blocks over the frame axis
    attn_layers: int = 0  # pre-LN self-attention+FFN blocks over frames
    # after the conv stack — the per-frame MLP + local convs cannot move
    # information across distant frames; attention can
    attn_heads: int = 8


@dataclass(frozen=True)
class HiFiGANConfig:
    """SpeechBrain tts-hifigan-libritts-16kHz generator (`hifigan.py:106-110`):
    HiFi-GAN V1 with 256x upsampling to match the hop-256 mel frontend."""

    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_slope: float = 0.1
    dtype: str = "float32"


@dataclass(frozen=True)
class LossConfig:
    """LMAC loss (`loss_function.py:19-77`): learnable softplus weights over
    [l_in, l_out, l1], init [3.0, 0.5, 3.0]; optional TV regularizer (dead in
    the reference: computed but unused with reg_w_tv=0)."""

    w_init: tuple = (3.0, 0.5, 3.0)
    reg_w_tv: float = 0.0
    masking: MaskingConvention = MaskingConvention.LINEAR
    l1_scale: float = 1.0  # fixed multiplier on the L1 sparsity term. The
    # reference has no such knob (its only sparsity control is the learnable
    # w[2], whose post-step renorm couples it to w_in/w_out); 1.0 is exact
    # reference behavior. >1 trades fidelity for sparser, more listenable
    # masks — the sparsity/fidelity frontier is measured in
    # docs/performance.md (round 4 L1 sweep).


@dataclass(frozen=True)
class TrainConfig:
    """Trainer (`train_addvisor.py:104-105,400`): Adam lr 3e-5 for the mask
    decoder, Adam lr 1e-4 for the loss weights, post-step renorm of w to
    sum=len(w) (`train_addvisor.py:379-380`)."""

    model_lr: float = 3e-5
    loss_w_lr: float = 1e-4
    batch_size: int = 2
    num_epochs: int = 1000
    seed: int = 0
    renorm_loss_w: bool = True
    # The epoch loop keeps per-step losses ON DEVICE and folds them into one
    # host transfer per epoch — a per-step float(loss) forces a device
    # round-trip that serializes dispatch (measured 20 vs 51.8 clips/s
    # through `cli train` in round 2). NaN divergence is still detected: a
    # small probe transfer every `nan_check_every` steps bounds how long a
    # diverged run can continue, and the epoch-end fold pins the exact
    # failing step. 0 = epoch-end checks only.
    nan_check_every: int = 16
    checkpoint_dir: str = "ckpts"
    artifact_dir: str = "explanations"
    checkpoint_every: int = 1
    donate_buffers: bool = True
    # The collate-stage clean embed only produces the (stop-gradient) target
    # y_hat (`train_addvisor.py:253-255` runs it under the loader, outside
    # the autograd graph) — so it can safely run the serving-grade fast paths
    # (int8 MXU matmuls / tanh GELU) without touching what is differentiated.
    # Targets shift by quantization noise only; default stays exact.
    target_quant: str = "none"  # "none" | "int8"
    target_gelu: str = "exact"  # "exact" | "tanh"
    # Decouple the GradNorm-style learnable-w dynamics from the L1 sparsity
    # term: freeze w[2] at its init value (no gradient step, excluded from
    # the post-step renorm, which then keeps w[0]+w[1] at their initial
    # sum). The measured 4x-scale l_out oscillation cycle (docs/
    # performance.md "Anyband at 4x scale") runs through the learnable
    # weights — the L1 term squeezes the mask until the flip breaks, the
    # renorm shifts weight, and the cycle repeats; this knob removes the
    # L1 side of that feedback while keeping reference semantics for
    # l_in/l_out. Default False = exact reference behavior
    # (`train_addvisor.py:379-380` renormalizes all three).
    freeze_l1_weight: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. The reference's only parallelism is DDP via HF Accelerate
    (`train_addvisor.py:410-412`); here the equivalent is a ('data','model')
    mesh: batch sharded over 'data' (gradient psum over ICI), with optional
    tensor sharding of the embedder MLP/attention over 'model'."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    audio: AudioConfig = AudioConfig()
    stft: STFTConfig = STFTConfig()
    mel: MelConfig = MelConfig()
    embedder: EmbedderConfig = EmbedderConfig()
    unet: UNetConfig = UNetConfig()
    feat_decoder: FeatDecoderConfig = FeatDecoderConfig()
    hifigan: HiFiGANConfig = HiFiGANConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    masking: MaskingConvention = MaskingConvention.LOG1P
    polarity: LabelPolarity = LabelPolarity.MANIPULATED_IS_ONE

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


DEFAULT = PipelineConfig()
