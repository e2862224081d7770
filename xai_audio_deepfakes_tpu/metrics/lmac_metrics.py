"""Faithfulness metrics for mask explanations (`LMAC_metrics.py:28-73`).

All functions are pure jnp over probability arrays [N, 1] (or [N]), designed
to run batched under vmap/jit and to fold across a sharded eval sweep with a
single psum — the reference computes them on concatenated host tensors.

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
