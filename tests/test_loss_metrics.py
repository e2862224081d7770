"""LMAC loss, loss-weight dynamics, faithfulness metrics, and EER tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from xai_audio_deepfakes_tpu.config import LossConfig, MaskingConvention
from xai_audio_deepfakes_tpu.losses.lmac import (
    LMACLossState,
    bce_with_logits,
    lmac_loss,
    renormalize_w,
    softplus_weights,
)
from xai_audio_deepfakes_tpu.metrics.eer import compute_eer
from xai_audio_deepfakes_tpu.metrics.lmac_metrics import (
    compute_AD,
    compute_AG,
    compute_AI,
    compute_faithfulness,
    compute_fidelity,
    get_score_for_predicted_class,
    summarize,
)


def test_bce_matches_torch(rng):
    logits = rng.standard_normal((8, 1)).astype(np.float32)
    targets = rng.uniform(size=(8, 1)).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    assert abs(ours - ref) < 1e-6


def test_loss_weights_init_and_renorm():
    st = LMACLossState.init(LossConfig())
    np.testing.assert_allclose(np.asarray(st.w_raw), [3.0, 0.5, 3.0])
    w_raw2 = renormalize_w(st.w_raw)
    w2 = softplus_weights(w_raw2)
    # renormalized weights sum to len(w) (`train_addvisor.py:379-380`)
    np.testing.assert_allclose(float(jnp.sum(w2)), 3.0, atol=1e-5)
    # proportions preserved
    w1 = softplus_weights(st.w_raw)
    np.testing.assert_allclose(
        np.asarray(w2 / w2[0]), np.asarray(w1 / w1[0]), rtol=1e-5
    )


def test_renormalize_w_freeze_last():
    """TrainConfig.freeze_l1_weight semantics: the last raw entry passes
    through bit-identical, the head renormalizes among itself to sum
    len(w)-1 with proportions preserved (decouples the learnable-w
    feedback from the L1 term — docs/performance.md 4x-scale finding)."""
    st = LMACLossState.init(LossConfig())
    w_raw2 = renormalize_w(st.w_raw, freeze_last=True)
    # frozen slot untouched at the raw-parameter level
    np.testing.assert_array_equal(
        np.asarray(w_raw2[-1]), np.asarray(st.w_raw[-1])
    )
    w2 = softplus_weights(w_raw2)
    np.testing.assert_allclose(float(jnp.sum(w2[:-1])), 2.0, atol=1e-5)
    w1 = softplus_weights(st.w_raw)
    np.testing.assert_allclose(
        np.asarray(w2[1] / w2[0]), np.asarray(w1[1] / w1[0]), rtol=1e-5
    )
    # idempotent once normalized
    w_raw3 = renormalize_w(w_raw2, freeze_last=True)
    np.testing.assert_allclose(
        np.asarray(w_raw3), np.asarray(w_raw2), atol=1e-5
    )


def test_lmac_loss_formula(rng):
    """Verify total = sum(softplus(w_raw) * [l_in, l_out, l1]) with a linear
    stand-in classifier (analytically checkable)."""
    B, F, T = 2, 9, 7
    L = 64
    mag = jnp.asarray(rng.uniform(size=(B, F, T)).astype(np.float32))
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(B, F, T)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, F - 1, T - 1)).astype(np.float32))
    class_pred = jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32))
    w_raw = jnp.asarray([3.0, 0.5, 3.0])

    proj = jnp.asarray(rng.standard_normal((F * T * 2, 1)).astype(np.float32)) * 0.01

    def istft_fn(re, im):
        return jnp.concatenate([re.reshape(B, -1), im.reshape(B, -1)], axis=-1)

    def classify_wav(wav):
        return wav @ proj

    total, losses, w = lmac_loss(
        w_raw, mask, mag, phase, class_pred, classify_wav, istft_fn, LossConfig()
    )
    np.testing.assert_allclose(
        float(total), float(jnp.sum(jax.nn.softplus(w_raw) * losses)), rtol=1e-6
    )
    # l1 is the mean |mask| of the DECODER mask (`loss_function.py:60`)
    np.testing.assert_allclose(float(losses[2]), float(jnp.mean(jnp.abs(mask))), rtol=1e-6)
    assert float(losses[0]) > 0 and float(losses[1]) > 0

    # gradient flows into the mask through the full chain
    g = jax.grad(
        lambda m: lmac_loss(
            w_raw, m, mag, phase, class_pred, classify_wav, istft_fn, LossConfig()
        )[0]
    )(mask)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.max(jnp.abs(g))) > 0

    # l1_scale multiplies ONLY the sparsity term (1.0 = exact reference
    # formula; the frontier knob of LossConfig.l1_scale)
    import dataclasses

    total_s, losses_s, _ = lmac_loss(
        w_raw, mask, mag, phase, class_pred, classify_wav, istft_fn,
        dataclasses.replace(LossConfig(), l1_scale=4.0),
    )
    np.testing.assert_allclose(float(losses_s[2]), 4.0 * float(losses[2]), rtol=1e-6)
    np.testing.assert_allclose(float(losses_s[0]), float(losses[0]), rtol=1e-6)
    np.testing.assert_allclose(float(losses_s[1]), float(losses[1]), rtol=1e-6)

    # the TRACED l1_scale argument == the baked config knob, and sweeping
    # it reuses ONE compiled program (the whole point: an l1 sweep must not
    # pay a multi-minute remote recompile per point)
    jit_loss = jax.jit(
        lambda s: lmac_loss(
            w_raw, mask, mag, phase, class_pred, classify_wav, istft_fn,
            LossConfig(), l1_scale=s,
        )
    )
    total_t, losses_t, _ = jit_loss(jnp.float32(4.0))
    np.testing.assert_allclose(float(losses_t[2]), float(losses_s[2]), rtol=1e-6)
    np.testing.assert_allclose(float(total_t), float(total_s), rtol=1e-6)
    _ = jit_loss(jnp.float32(0.5))
    assert jit_loss._cache_size() == 1


def test_metrics_formulas():
    p = jnp.asarray([[0.9], [0.2], [0.6], [0.4]])
    pm = jnp.asarray([[0.7], [0.35], [0.2], [0.45]])

    # fidelity: agreement of thresholded decisions
    np.testing.assert_allclose(
        np.asarray(compute_fidelity(pm, p)), [1.0, 1.0, 0.0, 1.0]
    )
    # score for predicted class
    np.testing.assert_allclose(
        np.asarray(get_score_for_predicted_class(jnp.asarray([0.8, 0.2]))),
        [0.8, 0.8],
    )
    # faithfulness FF = (p - pm) * sign(p - 0.5)
    ff = np.asarray(compute_faithfulness(p, pm))
    np.testing.assert_allclose(
        ff, [(0.9 - 0.7), -(0.2 - 0.35), (0.6 - 0.2), -(0.4 - 0.45)], atol=1e-6
    )
    # AD/AI/AG
    pc = np.asarray(get_score_for_predicted_class(p[:, 0]))
    oc = np.asarray(get_score_for_predicted_class(pm[:, 0]))
    np.testing.assert_allclose(
        np.asarray(compute_AD(pm, p)), np.maximum(pc - oc, 0) / (pc + 1e-10) * 100,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(compute_AI(pm, p)), (oc > pc).astype(np.float32) * 100
    )
    np.testing.assert_allclose(
        np.asarray(compute_AG(pm, p)),
        np.maximum(oc - pc, 0) / (1 - pc + 1e-10) * 100, rtol=1e-5,
    )
    s = summarize(p, pm, pm)
    assert set(s) == {
        "faithfulness", "fidelity", "average_drop", "average_increase", "average_gain",
    }


def test_eer_matches_scipy_reference(rng):
    """Our numpy EER vs the reference's brentq/interp1d construction
    (`train_logReg_swapping.py:120-122`)."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve as sk_roc

    scores = np.concatenate([
        rng.standard_normal(500) + 1.0, rng.standard_normal(500) - 1.0,
    ])
    labels = np.concatenate([np.ones(500), np.zeros(500)])
    fpr, tpr, _ = sk_roc(labels, scores, pos_label=1)
    ref = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    ours = compute_eer(scores, labels)
    assert abs(ours - ref) < 5e-3, (ours, ref)


def test_eer_tied_scores_matches_sklearn(rng):
    """Tied scores share one ROC threshold; intermediate staircase vertices
    must be dropped (sklearn semantics), or the EER crossing shifts with the
    arbitrary sort order among ties."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve as sk_roc

    # Heavily quantized scores -> many cross-class ties.
    scores = np.round(np.concatenate([
        rng.standard_normal(400) + 0.7, rng.standard_normal(400) - 0.7,
    ]) * 2) / 2
    labels = np.concatenate([np.ones(400), np.zeros(400)])
    fpr, tpr, _ = sk_roc(labels, scores, pos_label=1)
    ref = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    ours = compute_eer(scores, labels)
    assert abs(ours - ref) < 1e-9, (ours, ref)


def test_eer_extremes():
    assert compute_eer(np.array([1, 2, 3, 4.0]), np.array([0, 0, 1, 1])) == 0.0
    assert compute_eer(np.array([4, 3, 2, 1.0]), np.array([0, 0, 1, 1])) == 1.0


def test_summarize_sums_fold_matches_summarize(rng):
    """Streaming (sum, count) partials folded over batches == the one-shot
    summarize over the concatenation (the eval sweep's O(1)-memory path)."""
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.metrics.lmac_metrics import (
        merge_summaries,
        summarize,
        summarize_sums,
    )

    batches = [
        tuple(
            jnp.asarray(rng.uniform(0.01, 0.99, (n, 1)).astype(np.float32))
            for _ in range(3)
        )
        for n in (3, 5, 2)
    ]
    folded = merge_summaries([summarize_sums(*b) for b in batches])
    cat = [jnp.concatenate([b[i] for b in batches]) for i in range(3)]
    ref = {k: float(v) for k, v in summarize(*cat).items()}
    assert folded["num_clips"] == 10
    for k, v in ref.items():
        np.testing.assert_allclose(folded[k], v, rtol=1e-5)


def test_merge_summaries_empty_is_clear_error():
    """Zero batches (everything dropped by drop_remainder / empty metadata)
    must raise a readable ValueError, not zip()'s TypeError."""
    import pytest

    from xai_audio_deepfakes_tpu.metrics.lmac_metrics import merge_summaries

    with pytest.raises(ValueError, match="no batches"):
        merge_summaries([])
