"""Frozen logistic-regression detector head.

Mirrors `classifier_embedder.py:21-38` (TorchLogReg): a Linear(1920 -> 1)
whose weights come from a scikit-learn LogisticRegression joblib checkpoint
(coef 1x1920 + intercept), followed by sigmoid. forward returns
(logits, probs) exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class LogReg:
    """Stateless functional head; params = {'weight': [D,1], 'bias': [1]}."""

    @staticmethod
    def init(feature_dim: int = 1920, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        return {
            "weight": jnp.asarray(
                rng.standard_normal((feature_dim, 1)).astype(np.float32)
                / np.sqrt(feature_dim)
            ),
            "bias": jnp.zeros((1,), jnp.float32),
        }

    @staticmethod
    def apply(params: dict, feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """[..., D] -> (logits [..., 1], probs [..., 1])."""
        return logreg_apply(params, feats)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def logreg_apply(params: dict, feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., D] -> (logits [..., 1], probs [..., 1]). Functional entry point."""
    logits = feats @ params["weight"] + params["bias"]
    return logits, _sigmoid(logits)


def logreg_params_from_joblib(path: str) -> dict:
    """Import sklearn LogisticRegression weights (`classifier_embedder.py:12`,
    checkpoint `logReg_ckpts/logReg_vocoded_anyband.joblib`)."""
    import joblib

    clf = joblib.load(path)
    coef = np.asarray(clf.coef_, dtype=np.float32)  # [1, D]
    intercept = np.asarray(clf.intercept_, dtype=np.float32)  # [1]
    return {"weight": jnp.asarray(coef.T), "bias": jnp.asarray(intercept)}


def logreg_params_from_arrays(coef: np.ndarray, intercept: np.ndarray) -> dict:
    coef = np.asarray(coef, dtype=np.float32).reshape(1, -1)
    return {
        "weight": jnp.asarray(coef.T),
        "bias": jnp.asarray(np.asarray(intercept, dtype=np.float32).reshape(-1)),
    }


def logreg_params_save(params: dict, path: str) -> None:
    np.savez(path, weight=np.asarray(params["weight"]), bias=np.asarray(params["bias"]))


def logreg_params_load(path: str) -> dict:
    z = np.load(path)
    return {"weight": jnp.asarray(z["weight"]), "bias": jnp.asarray(z["bias"])}


def logreg_params_from_any(path: str) -> dict:
    """Load detector weights from either a sklearn joblib checkpoint or the
    .npz written by `logreg_params_save` (cli train-detector)."""
    if path.endswith(".npz"):
        return logreg_params_load(path)
    return logreg_params_from_joblib(path)
