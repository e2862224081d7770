"""Closed-loop explanation-quality protocol: corpus, localization scoring,
detector separation, and the tiny end-to-end loop (the product claim of
`/root/reference/README.md:1-4` made checkable without external weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.data.synthetic import (
    band_indicator,
    detector_corpus,
    detector_corpus_anyband,
    make_anyband_corpus,
    make_bandswap_corpus,
    noise_clips,
    per_clip_band_indicator,
    speechlike_clips,
    splice_band,
)
from xai_audio_deepfakes_tpu.metrics.localization import (
    mask_band_stats,
    per_clip_band_stats,
)
from xai_audio_deepfakes_tpu.ops.stft import stft

CFG = tiny_config()
S = CFG.stft
N = CFG.audio.num_samples  # 8000 (0.5 s)


def test_band_indicator_convention():
    """Bin convention matches the reference's linspace(0, sr/2, F)
    (`train_logReg_swapping.py:69`)."""
    ind = band_indicator(S, 1000.0, 2000.0)
    freqs = np.linspace(0, S.sample_rate / 2, S.num_bins)
    assert ind.shape == (S.num_bins,)
    assert set(np.unique(ind)) <= {0.0, 1.0}
    on = np.flatnonzero(ind)
    assert freqs[on[0]] >= 1000.0 and freqs[on[-1]] < 2000.0
    assert freqs[on[0] - 1] < 1000.0 and freqs[on[-1] + 1] >= 2000.0


def test_splice_band_swaps_exactly_that_band(rng):
    """The manipulated clip's STFT equals the source inside the band and the
    real clip outside it (up to one iSTFT/STFT round trip)."""
    real = speechlike_clips(rng, 2, N, S.sample_rate)
    src = noise_clips(rng, 2, N, rms=0.5)
    manip = splice_band(jnp.asarray(real), jnp.asarray(src), S, 1000.0, 2000.0)
    re_m, im_m = (np.asarray(a) for a in stft(jnp.asarray(manip), S))
    re_r, im_r = (np.asarray(a) for a in stft(jnp.asarray(real), S))
    re_s, im_s = (np.asarray(a) for a in stft(jnp.asarray(src), S))
    ind = band_indicator(S, 1000.0, 2000.0).astype(bool)
    # interior frames only: center-padding edge frames mix content under OLA.
    # iSTFT of a spliced spectrogram projects onto CONSISTENT spectrograms,
    # so a re-STFT is not bit-equal to the spliced one — assert relative
    # closeness instead: in-band the manipulated clip matches the source far
    # better than the real clip, and out-of-band the reverse.
    sl = np.s_[:, :, 8:-8]

    def dist(a, b, sel):
        return float(np.abs(a[:, sel][sl] - b[:, sel][sl]).mean())

    for re_or_im, (m, r, s) in (
        ("re", (re_m, re_r, re_s)),
        ("im", (im_m, im_r, im_s)),
    ):
        assert dist(m, s, ind) < 0.25 * dist(m, r, ind), re_or_im
        assert dist(m, r, ~ind) < 0.25 * dist(m, s, ~ind), re_or_im


def test_mask_band_stats_known_masks():
    """A perfect band mask scores selectivity 1/band_fraction and IoU ~1; a
    uniform mask scores selectivity ~1 and concentration ~1."""
    lo, hi = 1000.0, 2000.0
    ind = band_indicator(S, lo, hi)
    frames = 24
    perfect = np.broadcast_to(
        ind[None, :, None], (2, S.num_bins, frames)
    ).astype(np.float32)
    st = mask_band_stats(perfect, S, lo, hi)
    assert st["energy_fraction"] == pytest.approx(1.0)
    assert st["selectivity"] == pytest.approx(1.0 / st["band_fraction"])
    assert st["iou"] == pytest.approx(1.0)
    assert st["out_band_mean"] == 0.0

    uniform = np.full((2, S.num_bins, frames), 0.7, np.float32)
    st = mask_band_stats(uniform, S, lo, hi)
    assert st["selectivity"] == pytest.approx(1.0, abs=1e-6)
    assert st["concentration"] == pytest.approx(1.0, abs=1e-6)

    # crop: stats must be computed over the decoder's support only
    st_crop = mask_band_stats(uniform, S, lo, hi, freq_bins=64, frames=12)
    assert st_crop["band_fraction"] == pytest.approx(0.0)  # band above crop


BW, FMAX = 200.0, 800.0  # tiny anyband grid: 4 bands inside the 64-bin crop


def test_make_anyband_corpus_per_clip_bands(rng):
    """Every clip's band lies on the grid, bands actually vary across clips,
    and each manipulated clip matches the noise source inside ITS band only."""
    real, manip, bands = make_anyband_corpus(
        rng, 16, N, S, band_width=BW, f_max=FMAX, noise_rms=0.8
    )
    assert bands.shape == (16, 2)
    assert np.all(bands[:, 1] - bands[:, 0] == BW)
    assert np.all(np.isin(bands[:, 0], np.arange(0, FMAX, BW)))
    assert len(np.unique(bands[:, 0])) >= 2  # per-clip draw, not constant
    # in-band the manipulated spectrum departs from the real one; the same
    # clip's OTHER bands stay (comparatively) untouched
    re_m, im_m = (np.asarray(a) for a in stft(jnp.asarray(manip), S))
    re_r, im_r = (np.asarray(a) for a in stft(jnp.asarray(real), S))
    dmag = np.abs(np.hypot(re_m, im_m) - np.hypot(re_r, im_r))[:, :, 4:-4]
    ind = per_clip_band_indicator(S, bands).astype(bool)
    for i in range(16):
        in_d = dmag[i, ind[i]].mean()
        out_d = dmag[i, ~ind[i]].mean()
        assert in_d > 4 * out_d, (i, in_d, out_d)


def test_per_clip_band_stats_separates_constant_from_tracking():
    """The input-dependence statistics must (a) give a per-clip tracking mask
    high own-band IoU, low wrong-band IoU, LOW cross-clip IoU, and (b) give a
    constant band-pass mask cross-clip IoU ~1 with own ~ other on average —
    the shortcut the anyband protocol exists to rule out."""
    frames = 24
    f = S.num_bins
    starts = np.asarray([0.0, 200.0, 400.0, 600.0] * 2)
    bands = np.stack([starts, starts + BW], axis=1)
    ind = per_clip_band_indicator(S, bands)  # [8, F]
    tracking = np.repeat(ind[:, :, None], frames, axis=2).astype(np.float32)
    st = per_clip_band_stats(tracking, S, bands, BW, FMAX)
    assert st["own_iou_mean"] == pytest.approx(1.0)
    assert st["other_iou_mean"] < 0.05
    assert st["cross_band_pair_iou"] == pytest.approx(0.0)  # disjoint bands
    assert st["same_band_pair_iou"] == pytest.approx(1.0)
    assert st["mask_std_across_clips"] > 0.01  # sparse masks: small but != 0
    assert len(st["per_clip"]) == 8
    assert st["per_clip"][1]["band_lo"] == 200.0

    constant = np.broadcast_to(
        ind[0][None, :, None], (8, f, frames)
    ).astype(np.float32)
    st_c = per_clip_band_stats(constant, S, bands, BW, FMAX)
    assert st_c["cross_band_pair_iou"] == pytest.approx(1.0)
    assert st_c["mask_std_across_clips"] == 0.0
    # a constant band mask nails the clips whose band it is and scores 0 on
    # the rest — own_iou_mean collapses toward 1/n_bands_used
    assert st_c["own_iou_mean"] == pytest.approx(0.25)
    # crop support: stats over the decoder's (freq_bins, frames) region
    st_crop = per_clip_band_stats(
        tracking, S, bands, BW, FMAX, freq_bins=64, frames=12
    )
    assert st_crop["own_iou_mean"] == pytest.approx(1.0)


def test_detector_separates_anyband(rng):
    """The anyband detector corpus (per-clip bands + full-grid sweep +
    causal augmentations) is separable by a LogReg on random-init embeddings
    — the premise the anyband closed loop stands on."""
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.train_logreg import train_detector

    pipe = ADDvisorPipeline(CFG)
    params = pipe.init_params(jax.random.PRNGKey(0))
    real, manip, bands = make_anyband_corpus(
        rng, 16, N, S, band_width=BW, f_max=FMAX, noise_rms=0.8
    )
    wavs, y = detector_corpus_anyband(
        real, manip, S, bands, BW, FMAX, rng=rng, noise_rms=0.8
    )
    assert set(np.unique(y)) == {0, 1}
    embed = jax.jit(lambda w: jnp.mean(pipe.features(params, w), axis=1))
    x = np.concatenate(
        [
            np.asarray(embed(jnp.asarray(wavs[i : i + 8])))
            for i in range(0, len(wavs) - 7, 8)
        ]
    )
    _, metrics = train_detector(x, y[: len(x)])
    assert metrics["accuracy"] >= 0.75
    assert metrics["eer"] <= 0.3


def test_evaluate_explanations_covers_tail(rng):
    """n not a multiple of batch_size must still score EVERY clip (the tail
    batch is padded to the compiled shape and trimmed, not dropped)."""
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.closed_loop import evaluate_explanations

    pipe = ADDvisorPipeline(CFG)
    params = pipe.init_params(jax.random.PRNGKey(0))
    wavs = speechlike_clips(rng, 7, N, S.sample_rate)
    res = evaluate_explanations(
        pipe, params, wavs, (350.0, 650.0), CFG.loss.masking, batch_size=4,
        keep_wavs=5,
    )
    assert res["masks"].shape[0] == 7
    assert res["magnitude"].shape[0] == 7
    assert res["relevant_wavs"].shape[0] == 5
    # batching must not change per-clip results: clip 6 scored in the padded
    # tail batch == clip 6 scored in a full batch
    res_full = evaluate_explanations(
        pipe, params, wavs, (350.0, 650.0), CFG.loss.masking, batch_size=7
    )
    np.testing.assert_allclose(
        res["masks"][6], res_full["masks"][6], atol=1e-5
    )


@pytest.mark.e2e
def test_anyband_loop_masks_track_per_clip_band():
    """End-to-end tiny anyband loop: the trained decoder's masks must be
    INPUT-DEPENDENT — each held-out mask matches its clip's own band better
    than the grid's other bands, beats the untrained control, and masks of
    different-band clips differ (a constant mask scores cross_band_pair_iou
    ~1). This is the reference's actual product claim (`anyband` checkpoint,
    `classifier_embedder.py:12`), pinned at CPU scale; the full-geometry TPU
    run is recorded in docs/performance.md."""
    from xai_audio_deepfakes_tpu.config import TrainConfig
    from xai_audio_deepfakes_tpu.train.closed_loop import run_closed_loop

    cfg = tiny_config().replace(train=TrainConfig(model_lr=3e-3))
    res = run_closed_loop(
        cfg, seed=0, n_train=24, n_eval=8, epochs=25, batch_size=8,
        noise_rms=0.8, anyband=True, band_width=BW, f_max=FMAX,
    )
    assert res["anyband"] and res["band_hz"] is None
    assert len(res["eval_bands_hz"]) == 8
    before = res["before"]["localization"]
    after = res["after"]["localization"]
    # tracks its own clip's band, not the grid's others (wrong-band control)
    assert after["own_iou_mean"] > 2 * after["other_iou_mean"]
    # beats the untrained-decoder control
    assert after["own_iou_mean"] > 1.5 * before["own_iou_mean"]
    # input-dependent: different-band masks do NOT coincide
    assert after["cross_band_pair_iou"] < 0.5
    assert after["mask_std_across_clips"] > 0.01
    # the complement starts flipping the detector even at tiny scale
    assert res["after"]["p_manipulated_irrelevant"] < (
        res["before"]["p_manipulated_irrelevant"] - 0.1
    )


@pytest.mark.e2e
def test_l1_warmup_ramps_the_traced_scale():
    """--l1-warmup-epochs: the first epochs run at reduced L1 pressure and
    the ramp reaches the full scale by the warmup horizon. Identical
    corpora/seeds, so the logged l1 term (scale * mean|mask|) of the
    warmed-up run must start well below the immediate-full-pressure run
    and converge toward it after the ramp."""
    from xai_audio_deepfakes_tpu.config import TrainConfig
    from xai_audio_deepfakes_tpu.train.closed_loop import run_closed_loop

    cfg = tiny_config().replace(train=TrainConfig(model_lr=3e-3))
    kw = dict(
        seed=0, n_train=8, n_eval=4, epochs=6, batch_size=4,
        noise_rms=0.8, anyband=True, band_width=BW, f_max=FMAX,
        l1_scale=4.0,
    )
    full = run_closed_loop(cfg, **kw)["train_log"]
    warm = run_closed_loop(cfg, **kw, l1_warmup_epochs=4)["train_log"]
    # epoch 1: warmup runs at 1 + 3*(1/4) = 1.75 vs 4.0 — the l1 term must
    # reflect the reduced multiplier (masks are near-identical at epoch 1)
    assert warm[0]["l1"] < 0.6 * full[0]["l1"], (warm[0], full[0])
    # past the horizon both run at the full scale
    assert warm[-1]["l1"] > 0.5 * full[-1]["l1"]


@pytest.mark.e2e
def test_freeze_l1_w_pins_the_l1_weight():
    """--freeze-l1-w: through a real closed-loop run the logged w[2] stays
    bit-constant across epochs while w[0]/w[1] keep moving (the reference
    dynamic renormalizes all three, `train_addvisor.py:379-380`; this knob
    removes the L1 side of the learnable-w feedback loop)."""
    from xai_audio_deepfakes_tpu.config import TrainConfig
    from xai_audio_deepfakes_tpu.train.closed_loop import run_closed_loop

    cfg = tiny_config().replace(
        train=TrainConfig(model_lr=3e-3, freeze_l1_weight=True)
    )
    log = run_closed_loop(
        cfg, seed=0, n_train=8, n_eval=4, epochs=5, batch_size=4,
        noise_rms=0.8, anyband=True, band_width=BW, f_max=FMAX,
        l1_scale=4.0,
    )["train_log"]
    w = np.asarray([e["w"] for e in log])
    # frozen slot: constant at softplus(3.0) for every epoch
    np.testing.assert_allclose(w[:, 2], w[0, 2], rtol=1e-6)
    np.testing.assert_allclose(w[0, 2], np.log1p(np.exp(3.0)), rtol=1e-5)
    # head keeps the reference's relative-rebalancing dynamic
    assert np.abs(np.diff(w[:, 0])).max() > 1e-5
    np.testing.assert_allclose(w[:, 0] + w[:, 1], 2.0, atol=1e-4)


def aligned_features_config():
    """Tiny config satisfying the frame-alignment trick (SSL frames == STFT
    frames, the full-size hop-322 invariant, SURVEY §2.3): 7916 samples,
    hop 20, conv downsample 20 -> 396 frames both — required by the legacy
    feature-input decoder (`LMAC_metrics.py:133`)."""
    from xai_audio_deepfakes_tpu.config import (
        AudioConfig,
        EmbedderConfig,
        FeatDecoderConfig,
        LossConfig,
        MaskingConvention,
        PipelineConfig,
        STFTConfig,
        TrainConfig,
        UNetConfig,
    )

    return PipelineConfig(
        audio=AudioConfig(clip_seconds=7916 / 16000),
        stft=STFTConfig(hop_length=20),
        embedder=EmbedderConfig(
            hidden_size=32, num_layers=3, num_heads=2, intermediate_size=64,
            conv_dim=(8, 8), conv_kernel=(10, 2), conv_stride=(5, 4),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
            output_layer=2,
        ),
        unet=UNetConfig(freq_bins=64, frames=24, base_channels=4),
        feat_decoder=FeatDecoderConfig(feature_dim=32, freq_bins=64,
                                       frames=396, hidden=16),
        loss=LossConfig(masking=MaskingConvention.LOG1P),
        train=TrainConfig(model_lr=3e-3),
    )


@pytest.mark.e2e
def test_features_decoder_closed_loop_log1p():
    """VERDICT r3 #8: the SECOND decoder (legacy feature-input) under the
    SECOND masking convention (log1p, the reference's eval/UI path,
    `LMAC_metrics.py:136-153`) also trains through the closed loop: the LMAC
    loss decreases, the complement starts flipping the detector, and the
    trained masks are not constant across clips."""
    from xai_audio_deepfakes_tpu.train.closed_loop import run_closed_loop

    cfg = aligned_features_config()
    n = cfg.audio.num_samples
    t_ssl = n
    for k, s in zip(cfg.embedder.conv_kernel, cfg.embedder.conv_stride):
        t_ssl = (t_ssl - k) // s + 1
    assert t_ssl == 1 + n // cfg.stft.hop_length  # the alignment invariant

    res = run_closed_loop(
        cfg, seed=0, n_train=16, n_eval=8, epochs=12, batch_size=8,
        noise_rms=0.8, anyband=True, band_width=BW, f_max=FMAX,
        decoder="features",
    )
    assert res["decoder"] == "features" and res["masking"] == "log1p"
    log = res["train_log"]
    assert log[-1]["loss"] < 0.7 * log[0]["loss"]
    # trained behavior: the relevant waveform KEEPS the manipulated call
    # (improving on the untrained control) while the complement flips hard
    # (the control already flips here — log1p masking by an untrained
    # decoder destroys most content — so the flip check is absolute)
    assert res["after"]["p_manipulated_relevant"] > max(
        0.7, res["before"]["p_manipulated_relevant"]
    )
    assert res["after"]["p_manipulated_irrelevant"] < 0.1
    # not a constant mask
    assert res["after"]["localization"]["mask_std_across_clips"] > 0.005
    assert len(res["after"]["localization"]["per_clip"]) == 8


def test_detector_separates_bandswap(rng):
    """A LogReg on mean-pooled (random-init) embeddings separates real vs
    band-spliced clips — the premise of `train_logReg_swapping.py:105-128`."""
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.train_logreg import train_detector

    pipe = ADDvisorPipeline(CFG)
    params = pipe.init_params(jax.random.PRNGKey(0))
    real, manip = make_bandswap_corpus(rng, 24, N, S, 350.0, 650.0)
    wavs, y = detector_corpus(real, manip, S, 350.0, 650.0)
    embed = jax.jit(lambda w: jnp.mean(pipe.features(params, w), axis=1))
    x = np.concatenate(
        [np.asarray(embed(jnp.asarray(wavs[i : i + 8]))) for i in range(0, len(wavs), 8)]
    )
    _, metrics = train_detector(x, y)
    assert metrics["accuracy"] >= 0.8
    assert metrics["eer"] <= 0.25
