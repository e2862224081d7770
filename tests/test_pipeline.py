"""End-to-end pipeline tests on a tiny configuration (CPU-sized)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xai_audio_deepfakes_tpu.config import (
    AudioConfig,
    EmbedderConfig,
    FeatDecoderConfig,
    HiFiGANConfig,
    MaskingConvention,
    PipelineConfig,
    UNetConfig,
)
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline


def tiny_config() -> PipelineConfig:
    return PipelineConfig(
        audio=AudioConfig(clip_seconds=0.5),  # 8000 samples -> 25 STFT frames
        embedder=EmbedderConfig.tiny(),
        unet=UNetConfig(freq_bins=64, frames=24, base_channels=4),
        feat_decoder=FeatDecoderConfig(feature_dim=32, hidden=16),
        hifigan=HiFiGANConfig(
            in_channels=80,
            upsample_initial_channel=8,
            upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilations=((1, 3),),
        ),
    )


@pytest.fixture(scope="module")
def pipe():
    return ADDvisorPipeline(tiny_config())


@pytest.fixture(scope="module")
def params(pipe):
    return pipe.init_params(jax.random.PRNGKey(0), with_hifigan=True)


@pytest.fixture(scope="module")
def wav(pipe):
    rng = np.random.default_rng(1)
    return jnp.asarray(
        rng.standard_normal((2, pipe.cfg.audio.num_samples)).astype(np.float32) * 0.1
    )


def test_classify_shapes(pipe, params, wav):
    logits, probs = pipe.classify(params, wav)
    assert logits.shape == (2, 1) and probs.shape == (2, 1)
    p = np.asarray(probs)
    assert np.all(p > 0) and np.all(p < 1)


def test_explain_unet_shapes(pipe, params, wav):
    out = pipe.explain(params, wav, decoder="unet")
    n = pipe.cfg.audio.num_samples
    f = pipe.cfg.stft.num_bins
    t = 1 + n // pipe.cfg.stft.hop_length
    assert out.mask.shape == (2, f, t)
    assert out.magnitude.shape == (2, f, t)
    assert out.relevant_wav.shape == (2, n)
    assert out.irrelevant_wav.shape == (2, n)
    for probs in (out.probs_clean, out.probs_relevant, out.probs_irrelevant):
        assert probs.shape == (2, 1)
        assert np.all(np.asarray(probs) > 0) and np.all(np.asarray(probs) < 1)


def test_int8_static_pipeline_calibrate_and_explain(wav):
    """calibrate_quant attaches quant_scales; the static explain runs, its
    masks/waveforms are bit-identical to bf16 (embedder quant only moves
    probabilities), and probabilities stay close on held-out input."""
    import dataclasses

    base = tiny_config()
    ref_pipe = ADDvisorPipeline(base)
    params = ref_pipe.init_params(jax.random.PRNGKey(0))
    ref = ref_pipe.explain(params, wav)

    cfg = dataclasses.replace(
        base, embedder=dataclasses.replace(base.embedder, quant="int8-static")
    )
    pipe = ADDvisorPipeline(cfg)
    rng = np.random.default_rng(7)
    calib = jnp.asarray(
        rng.standard_normal((4, base.audio.num_samples)).astype(np.float32) * 0.1
    )
    p = pipe.calibrate_quant(params, calib)
    # unrolled stack runs the output_layer-truncated prefix; scales are
    # per-channel per site
    n_run = min(base.embedder.output_layer, base.embedder.num_layers)
    assert p["quant_scales"]["qkv"].shape == (n_run, base.embedder.hidden_size)
    assert p["quant_scales"]["ffn_out"].shape == (
        n_run, base.embedder.intermediate_size
    )
    out = pipe.jit_explain(decoder="unet")(p, wav)
    # embedder quant cannot touch the mask (magnitude -> UNet); the only
    # deltas are jit-vs-eager fusion rounding at f32 ulp level
    np.testing.assert_allclose(
        np.asarray(out.mask), np.asarray(ref.mask), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.relevant_wav), np.asarray(ref.relevant_wav), atol=1e-5
    )
    for k in ("probs_clean", "probs_relevant", "probs_irrelevant"):
        d = float(np.max(np.abs(np.asarray(getattr(out, k))
                                - np.asarray(getattr(ref, k)))))
        assert d < 0.2, (k, d)


def test_linear_masking_decomposition(pipe, params, wav):
    """With LINEAR masking, relevant + irrelevant spectrograms sum to the
    original, so the two inverted waveforms sum to the iSTFT of the original
    spectrogram — which reconstructs the input clip."""
    out = pipe.explain(params, wav, decoder="unet", masking=MaskingConvention.LINEAR)
    recon = np.asarray(out.relevant_wav + out.irrelevant_wav)
    mse = float(np.mean((recon - np.asarray(wav)) ** 2))
    assert mse < 1e-6, mse


def test_jit_explain_compiles_and_matches_eager(pipe, params, wav):
    eager = pipe.explain(params, wav, decoder="unet")
    jitted = pipe.jit_explain(decoder="unet")(params, wav)
    np.testing.assert_allclose(
        np.asarray(jitted.mask), np.asarray(eager.mask), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jitted.relevant_wav), np.asarray(eager.relevant_wav), atol=1e-4
    )


def test_vocode_shapes(pipe, params, wav):
    voc = pipe.vocode(params, wav)
    frames = 1 + pipe.cfg.audio.num_samples // pipe.cfg.mel.hop_length
    upsample = int(np.prod(pipe.cfg.hifigan.upsample_rates))
    assert voc.shape == (2, frames * upsample)
    assert np.all(np.isfinite(np.asarray(voc)))


def test_explain_vocoded_one_graph_parity(pipe, params, wav):
    """The fused listenable path (SURVEY §7 step 8: wav -> mask -> masked
    iSTFT -> mel -> HiFi-GAN as ONE jitted graph) matches the two-graph
    composition jit(explain) then jit(vocode)."""
    fused = pipe.jit_explain_vocoded(decoder="unet")
    out_f, voc_f = fused(params, wav)
    out_2 = pipe.jit_explain(decoder="unet")(params, wav)
    voc_2 = jax.jit(pipe.vocode)(params, out_2.relevant_wav)
    np.testing.assert_allclose(
        np.asarray(out_f.mask), np.asarray(out_2.mask), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(voc_f), np.asarray(voc_2), atol=1e-4
    )
    frames = 1 + pipe.cfg.audio.num_samples // pipe.cfg.mel.hop_length
    upsample = int(np.prod(pipe.cfg.hifigan.upsample_rates))
    assert voc_f.shape == (wav.shape[0], frames * upsample)


def test_explain_feature_decoder_alignment():
    """decoder='features' requires the frame-alignment trick (SSL frames ==
    STFT frames). Verified structurally with the full-size strides: both are
    249 for 80000 samples — here we check the pipeline wiring raises cleanly
    on misaligned tiny configs and works when aligned."""
    cfg = tiny_config()
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    wav = jnp.asarray(
        rng.standard_normal((1, cfg.audio.num_samples)).astype(np.float32) * 0.1
    )
    # tiny embedder downsamples 20x -> 399 feature frames != 25 STFT frames:
    # mask padding must fail loudly, not silently misalign
    with pytest.raises(Exception):
        pipe.explain(params, wav, decoder="features")
