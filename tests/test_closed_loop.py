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
    make_bandswap_corpus,
    noise_clips,
    speechlike_clips,
    splice_band,
)
from xai_audio_deepfakes_tpu.metrics.localization import mask_band_stats
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
