"""End-to-end ADDvisor pipeline: wav -> STFT -> SSL features -> detector ->
mask decoder -> masked iSTFT -> (optional mel -> HiFi-GAN) listenable
explanation, as pure jit-compilable graphs.

This replaces the reference's scattered script plumbing (`train_addvisor.py`
collate + loop, `LMAC_metrics.py:117-158`, `streamlit_controlled_study.py:
156-228`) with one construction point and explicit params — no import-time
model loading (the reference loads the 2B embedder on *import* of any module,
`audioprocessor.py:11-18`).

Every stage is a pure function of (params, arrays); `ADDvisorPipeline` is a
frozen bundle of module definitions + config, safe to close over in jit.
One compiled XLA program covers the whole explanation path; on TPU the
dominant cost is the embedder's matmuls (MXU), with STFT/iSTFT fused matmul
DFTs and elementwise masking fused around them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from xai_audio_deepfakes_tpu.config import (
    MaskingConvention,
    PipelineConfig,
)
from xai_audio_deepfakes_tpu.models.feat_decoder import FeatureMaskDecoder
from xai_audio_deepfakes_tpu.models.hifigan import HiFiGANGenerator
from xai_audio_deepfakes_tpu.models.logreg import LogReg, logreg_apply
from xai_audio_deepfakes_tpu.models.unet import UNetMaskDecoder
from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder
from xai_audio_deepfakes_tpu.ops.masking import (
    apply_mask,
    crop_spec,
    pad_mask_to_spec,
    remask_complex,
)
from xai_audio_deepfakes_tpu.ops.mel import mel_spectrogram
from xai_audio_deepfakes_tpu.ops.normalize import zero_mean_unit_var_norm
from xai_audio_deepfakes_tpu.ops.stft import istft, stft_magnitude_phase


class ExplainOutput(NamedTuple):
    """Everything the eval harness / UI consumes per batch
    (mirrors `streamlit_controlled_study.py:193-226`)."""

    mask: jnp.ndarray            # [B, F, T] full-spec mask (padded if needed)
    magnitude: jnp.ndarray       # [B, 513, 249] raw |STFT|
    phase: jnp.ndarray           # [B, 513, 249]
    relevant_wav: jnp.ndarray    # [B, 80000] listenable explanation
    irrelevant_wav: jnp.ndarray  # [B, 80000] complement
    probs_clean: jnp.ndarray     # [B, 1]
    probs_relevant: jnp.ndarray  # [B, 1]
    probs_irrelevant: jnp.ndarray  # [B, 1]


@dataclasses.dataclass(frozen=True)
class ADDvisorPipeline:
    cfg: PipelineConfig = PipelineConfig()
    # optional embedder-forward override (normalized wav [B, L] + encoder
    # param tree -> features [B, T, H]); lets the parallel layer swap in the
    # pipeline-parallel encoder (`parallel/inference.py`) without the
    # pipeline knowing about meshes. None -> plain encoder.apply.
    features_fn: Any = dataclasses.field(default=None, compare=False)

    @property
    def encoder(self) -> Wav2Vec2Encoder:
        return Wav2Vec2Encoder(self.cfg.embedder)

    @property
    def unet(self) -> UNetMaskDecoder:
        return UNetMaskDecoder(self.cfg.unet)

    @property
    def feat_decoder(self) -> FeatureMaskDecoder:
        return FeatureMaskDecoder(self.cfg.feat_decoder)

    @property
    def hifigan(self) -> HiFiGANGenerator:
        return HiFiGANGenerator(self.cfg.hifigan)

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, with_hifigan: bool = False) -> dict:
        """Random-init full param tree (weight-import utilities in models/*
        overwrite the respective subtrees with reference checkpoints)."""
        k_enc, k_unet, k_fd, k_hg = jax.random.split(rng, 4)
        n = self.cfg.audio.num_samples
        wav = jnp.zeros((1, n), jnp.float32)
        mag = jnp.zeros((1, self.cfg.unet.freq_bins, self.cfg.unet.frames), jnp.float32)
        feats = jnp.zeros(
            (1, self.cfg.feat_decoder.frames, self.cfg.feat_decoder.feature_dim),
            jnp.float32,
        )
        params = {
            "encoder": self.encoder.init(k_enc, wav),
            "unet": self.unet.init(k_unet, mag),
            "feat_decoder": self.feat_decoder.init(k_fd, feats),
            "logreg": LogReg.init(self.cfg.embedder.hidden_size),
        }
        if with_hifigan:
            mel = jnp.zeros((1, self.cfg.mel.n_mels, 8), jnp.float32)
            params["hifigan"] = self.hifigan.init(k_hg, mel)
        return params

    # ------------------------------------------------------------------
    # stages (pure functions of params + arrays)
    # ------------------------------------------------------------------

    def features(self, params: dict, wav: jnp.ndarray) -> jnp.ndarray:
        """wav [B, L] -> SSL features [B, T, H]
        (`audioprocessor.extract_features`: norm then hidden_states[9])."""
        norm = zero_mean_unit_var_norm(wav)
        if self.features_fn is not None:
            return self.features_fn(params["encoder"], norm)
        kw = {}
        if (
            self.cfg.embedder.quant == "int8-static"
            and "quant_scales" in params
        ):
            kw["act_scales"] = params["quant_scales"]
        return self.encoder.apply(params["encoder"], norm, **kw)

    def calibrate_quant(
        self,
        params: dict,
        wavs: jnp.ndarray,
        batch_size: int = 16,
        stat: str = "p999",
    ) -> dict:
        """Calibrate static PER-CHANNEL activation scales for the embedder's
        int8 matmul sites (cfg.embedder.quant == "int8-static") on a batch
        of representative clips. Returns a new params dict carrying a
        "quant_scales" entry ({site: [num_layers, C_site]} pytree) that
        `features` passes into the encoder; uncalibrated int8-static
        serving falls back to dynamic per-token scales. The scales remove
        the per-token max-reduce of dynamic quantization (they fold into
        the weights, `ops/quant.int8_matmul_static`); `stat` picks the
        per-channel statistic / 127: "max" (nothing in the calibration
        set saturates) or "p999" (default — wav2vec2 activations carry
        token-level outliers, and a max-based scale coarsens every
        ordinary token to protect them; the 99.9th percentile restores
        ordinary-token resolution and lets outliers saturate at +-127).
        Calibrate on the same backend/attention mode as serving — the
        "ctx" site width is head-padded only on the fused-attention
        (TPU) path."""
        if self.cfg.embedder.quant not in ("int8", "int8-static"):
            raise ValueError(
                "calibrate_quant needs an int8 embedder config "
                f"(got quant={self.cfg.embedder.quant!r})"
            )
        idx = {"max": 0, "p999": 1}[stat]
        fn = jax.jit(
            lambda p, w: self.encoder.apply(
                p, zero_mean_unit_var_norm(w), calibrate=True
            )[1]
        )
        n = wavs.shape[0]
        bs = min(batch_size, n)
        absmax = None
        # full batches only: one compiled shape; calibration does not need
        # the ragged tail
        for i in range(0, n - bs + 1, bs):
            m = fn(params["encoder"], wavs[i : i + bs])
            absmax = (
                m if absmax is None else jax.tree.map(jnp.maximum, absmax, m)
            )
        out = dict(params)
        # leaves are [n_layers, 2, C] (stat stacked per site); select stat
        out["quant_scales"] = jax.tree.map(
            lambda a: a[:, idx, :] / 127.0, absmax
        )
        return out

    def classify_features(self, params: dict, feats: jnp.ndarray):
        """feats [B, T, H] -> (logits, probs) [B, 1] via time mean-pool
        (`train_addvisor.py:254-255`)."""
        return logreg_apply(params["logreg"], jnp.mean(feats, axis=1))

    def classify(self, params: dict, wav: jnp.ndarray):
        return self.classify_features(params, self.features(params, wav))

    def spectrogram(self, wav: jnp.ndarray):
        """wav [B, L] -> (real, imag, magnitude, phase), each [B, 513, 249]."""
        return stft_magnitude_phase(wav, self.cfg.stft)

    def istft(self, real: jnp.ndarray, imag: jnp.ndarray) -> jnp.ndarray:
        return istft(real, imag, self.cfg.stft, length=self.cfg.audio.num_samples)

    def predict_mask(self, params: dict, magnitude: jnp.ndarray) -> jnp.ndarray:
        """Current-generation decoder: cropped magnitude -> UNet -> full-spec
        mask (zero-padded on the cropped top bin / last frame)."""
        uc = self.cfg.unet
        mag_c = crop_spec(magnitude, uc.freq_bins, uc.frames)
        mask = self.unet.apply(params["unet"], mag_c)
        return pad_mask_to_spec(mask, magnitude.shape[-2], magnitude.shape[-1])

    def predict_mask_from_features(self, params: dict, feats: jnp.ndarray,
                                   magnitude: jnp.ndarray) -> jnp.ndarray:
        """Legacy decoder consumed by `LMAC_metrics.py:133`: features -> mask
        [B, 512, 249], padded back to full spec."""
        mask = self.feat_decoder.apply(params["feat_decoder"], feats)
        return pad_mask_to_spec(mask, magnitude.shape[-2], magnitude.shape[-1])

    # ------------------------------------------------------------------
    # end-to-end explanation
    # ------------------------------------------------------------------

    def explain(
        self,
        params: dict,
        wav: jnp.ndarray,
        decoder: str = "unet",
        masking: MaskingConvention | None = None,
    ) -> ExplainOutput:
        """Full inference path (`LMAC_metrics.py:125-158` /
        `streamlit_controlled_study.py:162-226`), one XLA program."""
        masking = self.cfg.masking if masking is None else masking
        _, _, mag, phase = self.spectrogram(wav)

        if decoder == "unet":
            # mask depends only on the magnitude, so the clean embed can be
            # deferred and fused with the masked re-embeds below
            mask = self.predict_mask(params, mag)
            feats = None
        elif decoder == "features":
            feats = self.features(params, wav)
            mask = self.predict_mask_from_features(params, feats, mag)
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

        rel_mag, irr_mag = apply_mask(mask, mag, masking)
        rel_wav = self.istft(*remask_complex(rel_mag, phase))
        irr_wav = self.istft(*remask_complex(irr_mag, phase))
        # one embedder pass for every variant: 3x (or 2x) the batch on the
        # MXU instead of separate half-utilized dispatches
        b = rel_wav.shape[0]
        if feats is None:
            _, probs_all = self.classify(
                params, jnp.concatenate([wav, rel_wav, irr_wav], axis=0)
            )
            probs_clean = probs_all[:b]
            probs_rel, probs_irr = probs_all[b : 2 * b], probs_all[2 * b :]
        else:
            _, probs_clean = self.classify_features(params, feats)
            _, probs_both = self.classify(
                params, jnp.concatenate([rel_wav, irr_wav], axis=0)
            )
            probs_rel, probs_irr = probs_both[:b], probs_both[b:]
        return ExplainOutput(
            mask=mask, magnitude=mag, phase=phase,
            relevant_wav=rel_wav, irrelevant_wav=irr_wav,
            probs_clean=probs_clean, probs_relevant=probs_rel,
            probs_irrelevant=probs_irr,
        )

    def vocode(self, params: dict, wav: jnp.ndarray) -> jnp.ndarray:
        """Listenable synthesis: wav -> log-mel -> HiFi-GAN -> wav
        (the `hifigan.py:163-180` path, fused into one graph)."""
        mel = mel_spectrogram(wav, self.cfg.mel)
        return self.hifigan.apply(params["hifigan"], mel)

    def explain_vocoded(
        self,
        params: dict,
        wav: jnp.ndarray,
        decoder: str = "unet",
        masking: MaskingConvention | None = None,
    ) -> tuple[ExplainOutput, jnp.ndarray]:
        """The FULL listenable path as ONE XLA program (SURVEY §7 step 8):
        wav -> STFT -> mask -> masked iSTFT -> mel -> HiFi-GAN -> vocoded
        explanation. Returns (ExplainOutput, vocoded_relevant [B, L']).

        The reference runs this as two disconnected scripts (explanation in
        `LMAC_metrics.py:136-153`, vocoding one file at a time through
        SpeechBrain in `hifigan.py:163-180`); fusing them lets XLA overlap
        the HiFi-GAN conv stack with the explain graph's tail and drops one
        host round-trip per batch."""
        out = self.explain(params, wav, decoder, masking)
        return out, self.vocode(params, out.relevant_wav)

    def jit_explain_vocoded(self, decoder: str = "unet",
                            masking: MaskingConvention | None = None):
        return jax.jit(
            lambda params, wav: self.explain_vocoded(
                params, wav, decoder, masking
            )
        )

    # ------------------------------------------------------------------
    # jit entry points
    # ------------------------------------------------------------------

    def jit_explain(self, decoder: str = "unet",
                    masking: MaskingConvention | None = None):
        return jax.jit(
            lambda params, wav: self.explain(params, wav, decoder, masking)
        )

    def jit_classify(self):
        return jax.jit(self.classify)
