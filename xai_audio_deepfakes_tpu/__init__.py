"""xai_audio_deepfakes_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
ADDvisor audio-deepfake-explanation framework (davidcombei/xAI-Audio-Deepfakes).

The reference produces *listenable, frequency-domain explanations* for an
audio-deepfake classifier: a UNet mask decoder predicts a time-frequency mask
over a clip's STFT such that the masked ("relevant") audio keeps the
classifier's decision while the complement flips it; masked spectrograms are
inverted back to waveforms so a human can hear what the classifier keyed on.

This package is a ground-up TPU-first redesign, NOT a port:
  * pure-functional layers, explicit params, everything jit-compilable
  * no import-time side effects (the reference loads a 2B-param model at
    import — `/root/reference/audioprocessor.py:11-18`)
  * fixed static shapes (80000 samples, 513x249 spec, 249x1920 feats) so XLA
    compiles once
  * matmul(MXU)-based DFT for STFT/iSTFT instead of cuFFT
  * jax.sharding.Mesh + pjit data/model parallelism instead of HF Accelerate
  * Orbax checkpoints, optax optimizers, jax.grad-based attribution instead
    of Captum

Subpackages
-----------
ops       signal-processing kernels: STFT/iSTFT, mel, masking, normalization
models    UNet mask decoder, legacy feature decoder, LogReg head, wav2vec2
          SSL embedder (truncated XLS-R), HiFi-GAN vocoder
pipeline  end-to-end jitted graphs (wav -> mask -> listenable explanation)
losses    LMAC loss with learnable softplus weights
metrics   faithfulness / fidelity / AD / AI / AG, accuracy + EER
attrib    gradient attribution (saliency, input x grad, IG, SmoothGrad, ...)
train     trainers, checkpointing, artifacts
parallel  device mesh + sharding rules
data      audio IO, dataset scanners, vocoded/band-splice data generation
cli       command-line entry points
"""

__version__ = "0.1.0"

# Lazy top-level exports: `from xai_audio_deepfakes_tpu import ADDvisorPipeline,
# PipelineConfig` without importing jax/flax at package-import time (keeping
# `import xai_audio_deepfakes_tpu` side-effect-free and instant, unlike the
# reference's import-time 2B-model load).
_LAZY = {
    "ADDvisorPipeline": ("xai_audio_deepfakes_tpu.pipeline.core", "ADDvisorPipeline"),
    "PipelineConfig": ("xai_audio_deepfakes_tpu.config", "PipelineConfig"),
    "EmbedderConfig": ("xai_audio_deepfakes_tpu.config", "EmbedderConfig"),
    "MaskingConvention": ("xai_audio_deepfakes_tpu.config", "MaskingConvention"),
    "LabelPolarity": ("xai_audio_deepfakes_tpu.config", "LabelPolarity"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
