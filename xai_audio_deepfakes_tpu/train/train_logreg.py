"""Detector (logistic-regression head) training — the TPU-native
`train_logReg_swapping.py:105-128`.

The reference fits sklearn LogisticRegression(C=1e6, max_iter=10000) on CPU
after moving embeddings off the GPU. Here the fit itself runs in JAX (L-BFGS
via optax, full-batch — a 1920-dim logistic regression is a trivial device
problem), so feature generation AND fitting stay on-accelerator; sklearn
parity is checked in tests. Reports accuracy + EER like the reference and
exports params in the same layout the LogReg head consumes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xai_audio_deepfakes_tpu.metrics.eer import compute_eer
from xai_audio_deepfakes_tpu.models.logreg import logreg_apply


def stratified_split(
    x: np.ndarray, y: np.ndarray, test_size: float = 0.2, seed: int = 42
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """80/20 stratified split (`train_logReg_swapping.py:108-110`)."""
    rng = np.random.default_rng(seed)
    train_idx, test_idx = [], []
    for cls in np.unique(y):
        idx = np.flatnonzero(y == cls)
        rng.shuffle(idx)
        n_test = max(1, int(round(len(idx) * test_size)))
        test_idx.append(idx[:n_test])
        train_idx.append(idx[n_test:])
    tr = np.concatenate(train_idx)
    te = np.concatenate(test_idx)
    rng.shuffle(tr)
    rng.shuffle(te)
    return x[tr], x[te], y[tr], y[te]


def fit_logreg(
    x: np.ndarray,
    y: np.ndarray,
    c: float = 1e6,
    max_iter: int = 1000,
    tol: float = 1e-7,
) -> dict:
    """Full-batch L2-regularized logistic regression via L-BFGS.

    Matches sklearn's objective: sum_i log(1 + exp(-z_i)) + (1/(2C)) ||w||^2
    (bias unregularized). Returns params for `logreg_apply`.
    """
    xj = jnp.asarray(x, dtype=jnp.float32)
    yj = jnp.asarray(y, dtype=jnp.float32)[:, None]
    d = x.shape[1]

    def objective(params):
        logits = xj @ params["weight"] + params["bias"]
        nll = jnp.sum(
            jnp.maximum(logits, 0.0) - logits * yj + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        reg = 0.5 / c * jnp.sum(params["weight"] ** 2)
        return nll + reg

    params = {
        "weight": jnp.zeros((d, 1), jnp.float32),
        "bias": jnp.zeros((1,), jnp.float32),
    }
    solver = optax.lbfgs()
    opt_state = solver.init(params)
    value_and_grad = optax.value_and_grad_from_state(objective)

    @jax.jit
    def step(params, opt_state):
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=objective
        )
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grad)
        return params, opt_state, value, gnorm

    for _ in range(max_iter):
        params, opt_state, value, gnorm = step(params, opt_state)
        if float(gnorm) < tol * max(1.0, float(jnp.abs(value))):
            break
    return params


def evaluate_logreg(params: dict, x: np.ndarray, y: np.ndarray) -> dict:
    """Accuracy + EER, the reference's reported pair
    (`train_logReg_swapping.py:118-124`)."""
    logits, probs = logreg_apply(params, jnp.asarray(x, dtype=jnp.float32))
    scores = np.asarray(probs)[:, 0]
    pred = (scores > 0.5).astype(np.int64)
    acc = float(np.mean(pred == np.asarray(y)))
    eer = compute_eer(scores, y)
    return {"accuracy": acc, "eer": eer}


def train_detector(
    x: np.ndarray,
    y: np.ndarray,
    c: float = 1e6,
    test_size: float = 0.2,
    seed: int = 42,
    log_fn: Callable[[dict], None] | None = None,
) -> tuple[dict, dict]:
    """Split, fit, evaluate -> (params, metrics)."""
    x_tr, x_te, y_tr, y_te = stratified_split(x, y, test_size, seed)
    params = fit_logreg(x_tr, y_tr, c=c)
    metrics = evaluate_logreg(params, x_te, y_te)
    if log_fn is not None:
        log_fn({"detector": metrics})
    return params, metrics
