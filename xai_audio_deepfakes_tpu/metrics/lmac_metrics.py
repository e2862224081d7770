"""Faithfulness metrics for mask explanations (`LMAC_metrics.py:28-73`).

All functions are pure jnp over probability arrays [N, 1] (or [N]), batched
under vmap/jit. Every metric is a per-clip mean, so a sweep folds exactly as
(sum, count) partials — `summarize_sums` returns the device-side partial for
one batch and `merge_summaries` folds them, keeping eval memory O(1) in the
number of clips (the reference concatenates every probability on the host).

Conventions preserved from the reference:
  * `get_score_for_predicted_class(p)` = p if p > 0.5 else 1-p
    (`LMAC_metrics.py:43-45`)
  * fidelity: thresholded decision agreement (`:31-38`)
  * faithfulness FF = (p - p_masked) * sign(p - 0.5)  (`:48-52`)
  * AD = relu(pc - oc)/(pc + eps) * 100, AI = 100 * [oc > pc],
    AG = relu(oc - pc)/(1 - pc + eps) * 100, eps = 1e-10 (`:28,55-73`)
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-10


def _squeeze(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., 0] if p.ndim > 1 else p


def compute_fidelity(
    theta_out: jnp.ndarray, predictions: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    """1.0 where masked and clean predictions agree on the decision."""
    orig = _squeeze(predictions) > threshold
    masked = _squeeze(theta_out) > threshold
    return (orig == masked).astype(jnp.float32)


def get_score_for_predicted_class(p: jnp.ndarray) -> jnp.ndarray:
    pred = (p > 0.5).astype(p.dtype)
    return pred * p + (1.0 - pred) * (1.0 - p)


def compute_faithfulness(
    predictions: jnp.ndarray, predictions_masked: jnp.ndarray
) -> jnp.ndarray:
    p = _squeeze(predictions)
    pm = _squeeze(predictions_masked)
    return (p - pm) * jnp.sign(p - 0.5)


def compute_AD(theta_out: jnp.ndarray, predictions: jnp.ndarray) -> jnp.ndarray:
    pc = get_score_for_predicted_class(_squeeze(predictions))
    oc = get_score_for_predicted_class(_squeeze(theta_out))
    return jnp.maximum(pc - oc, 0.0) / (pc + EPS) * 100.0


def compute_AI(theta_out: jnp.ndarray, predictions: jnp.ndarray) -> jnp.ndarray:
    pc = get_score_for_predicted_class(_squeeze(predictions))
    oc = get_score_for_predicted_class(_squeeze(theta_out))
    return (oc > pc).astype(jnp.float32) * 100.0


def compute_AG(theta_out: jnp.ndarray, predictions: jnp.ndarray) -> jnp.ndarray:
    pc = get_score_for_predicted_class(_squeeze(predictions))
    oc = get_score_for_predicted_class(_squeeze(theta_out))
    return jnp.maximum(oc - pc, 0.0) / (1.0 - pc + EPS) * 100.0


def summarize(
    predictions: jnp.ndarray,
    theta_out: jnp.ndarray,
    masked_predictions: jnp.ndarray,
) -> dict:
    """The whole `run_addvisor_metrics` aggregate block
    (`LMAC_metrics.py:160-172`) as one dict of scalars.

    predictions: clean-clip probs; theta_out: relevant-masked probs;
    masked_predictions: irrelevant-masked probs.
    """
    return {
        "faithfulness": jnp.mean(compute_faithfulness(predictions, masked_predictions)),
        "fidelity": jnp.mean(compute_fidelity(theta_out, predictions)),
        "average_drop": jnp.mean(compute_AD(theta_out, predictions)),
        "average_increase": jnp.mean(compute_AI(theta_out, predictions)),
        "average_gain": jnp.mean(compute_AG(theta_out, predictions)),
    }


METRIC_KEYS = (
    "faithfulness", "fidelity", "average_drop", "average_increase",
    "average_gain",
)


def summarize_sums(
    predictions: jnp.ndarray,
    theta_out: jnp.ndarray,
    masked_predictions: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One batch's device-side partial: (sums [5] in METRIC_KEYS order,
    count). Jit-able; fold partials with `merge_summaries`."""
    sums = jnp.stack(
        [
            jnp.sum(compute_faithfulness(predictions, masked_predictions)),
            jnp.sum(compute_fidelity(theta_out, predictions)),
            jnp.sum(compute_AD(theta_out, predictions)),
            jnp.sum(compute_AI(theta_out, predictions)),
            jnp.sum(compute_AG(theta_out, predictions)),
        ]
    )
    return sums, jnp.asarray(_squeeze(predictions).shape[0], jnp.int32)


def merge_summaries(partials) -> dict:
    """[(sums, count), ...] -> the `summarize` dict + num_clips."""
    partials = list(partials)
    if not partials:
        # e.g. every clip dropped by drop_remainder batching — fail with a
        # clear message instead of zip(..., 0)'s TypeError
        raise ValueError(
            "no batches to summarize: the eval produced zero metric "
            "partials (all clips dropped by batching, or empty metadata)"
        )
    total = sum(float(c) for _, c in partials)
    acc = sum((jnp.asarray(s) for s, _ in partials))
    out = {k: float(v) / max(total, 1.0) for k, v in zip(METRIC_KEYS, acc)}
    out["num_clips"] = int(total)
    return out
