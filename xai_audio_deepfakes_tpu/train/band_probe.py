"""Per-frame band-information probe for SSL features.

Settles the round-4 open question on the legacy feature-input decoder
(the reference's deployed generation, `/root/reference/LMAC_metrics.py:133`):
its rebuilt counterpart solves the detector flip but emits near-input-
independent masks on the anyband corpus. Two hypotheses: (a) wav2vec2
features carry no PER-FRAME artifact-band information (mean-pooled
features provably carry it — the anyband detector reads it at 94.5% acc),
or (b) the decoder is too small. This probe separates them: a linear
softmax readout from per-frame features to the clip's artifact-band class.
If even a LINEAR probe recovers the band per frame, the information is
present and hypothesis (b) holds; if the probe sits at chance while the
mean-pooled control succeeds, (a) is measured and the decoder's failure is
a property of the representation, not the architecture.

The probe is the standard linear-probing protocol of the SSL analysis
literature; train/eval split is BY CLIP so no clip's frames leak across
the split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def fit_softmax_probe(
    x: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    l2: float = 1e-4,
    max_iter: int = 400,
    tol: float = 1e-7,
) -> dict:
    """Full-batch multinomial logistic regression via L-BFGS.

    x [N, D] f32, y [N] int class ids -> {"weight" [D, K], "bias" [K]}.
    Mirrors `fit_logreg` (train_logreg.py) with a softmax head.
    """
    xj = jnp.asarray(x, dtype=jnp.float32)
    yj = jnp.asarray(y, dtype=jnp.int32)
    d = x.shape[1]

    params = {
        "weight": jnp.zeros((d, n_classes), jnp.float32),
        "bias": jnp.zeros((n_classes,), jnp.float32),
    }
    solver = optax.lbfgs()
    opt_state = solver.init(params)

    # the data rides as jit ARGUMENTS, never a closure: a closed-over
    # feature matrix becomes a program constant, and at per-frame scale
    # (e.g. 72k x 1920 f32) that blows the remote-compile relay's request
    # limit (observed: HTTP 413 on the tunneled TPU)
    @jax.jit
    def step(params, opt_state, xj, yj):
        def objective(p):
            logits = xj @ p["weight"] + p["bias"]
            nll = -jnp.sum(
                jax.nn.log_softmax(logits)[jnp.arange(yj.shape[0]), yj]
            )
            return nll + 0.5 * l2 * jnp.sum(p["weight"] ** 2)

        value, grad = optax.value_and_grad_from_state(objective)(
            params, state=opt_state
        )
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=objective,
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, value, optax.global_norm(grad)

    for _ in range(max_iter):
        params, opt_state, value, gnorm = step(params, opt_state, xj, yj)
        if float(gnorm) < tol * max(1.0, float(jnp.abs(value))):
            break
    return jax.tree.map(np.asarray, params)


def probe_predict(params: dict, x: np.ndarray) -> np.ndarray:
    logits = np.asarray(x, dtype=np.float32) @ params["weight"] + params["bias"]
    return np.argmax(logits, axis=-1)


def frame_band_probe(
    feats: np.ndarray,
    band_cls: np.ndarray,
    n_classes: int,
    test_frac: float = 0.25,
    seed: int = 0,
    l2: float = 1e-4,
) -> dict:
    """feats [N, T, H] per-frame SSL features of manipulated clips,
    band_cls [N] artifact-band class per clip -> probe report.

    Fits three linear probes and evaluates on clip-held-out data:
      * mean_pool: clip-mean features -> band (the positive control — the
        anyband detector already proves this is linearly readable)
      * per_frame: every frame labeled with its clip's band; reports both
        frame-level accuracy and clip-level majority vote
      * shuffled: per_frame with clip labels permuted (the negative
        control — must sit at chance, else the probe is fitting noise)
    """
    rng = np.random.default_rng(seed)
    n, t, h = feats.shape
    order = rng.permutation(n)
    n_te = max(1, int(round(n * test_frac)))
    te, tr = order[:n_te], order[n_te:]

    report = {
        "n_clips": int(n),
        "n_frames_per_clip": int(t),
        "n_classes": int(n_classes),
        "chance": 1.0 / n_classes,
    }

    # positive control: mean-pooled
    pooled = feats.mean(axis=1)
    p = fit_softmax_probe(pooled[tr], band_cls[tr], n_classes, l2=l2)
    report["mean_pool_acc"] = float(
        np.mean(probe_predict(p, pooled[te]) == band_cls[te])
    )

    # per-frame
    def flat(idx):
        return (
            feats[idx].reshape(-1, h),
            np.repeat(band_cls[idx], t),
        )

    x_tr, y_tr = flat(tr)
    x_te, y_te = flat(te)
    p = fit_softmax_probe(x_tr, y_tr, n_classes, l2=l2)
    pred = probe_predict(p, x_te)
    report["frame_acc"] = float(np.mean(pred == y_te))
    # clip-level majority vote over the clip's frames
    votes = pred.reshape(n_te, t)
    maj = np.array(
        [np.bincount(v, minlength=n_classes).argmax() for v in votes]
    )
    report["clip_majority_acc"] = float(np.mean(maj == band_cls[te]))

    # negative control: permuted clip labels
    y_shuf = rng.permutation(band_cls[tr])
    x_tr2, y_tr2 = feats[tr].reshape(-1, h), np.repeat(y_shuf, t)
    p = fit_softmax_probe(x_tr2, y_tr2, n_classes, l2=l2)
    report["shuffled_frame_acc"] = float(
        np.mean(probe_predict(p, x_te) == y_te)
    )
    return report
