"""LMAC loss: listenable-mask training objective (`loss_function.py:19-77`).

    L = w_in * BCE(f(istft(mask * spec)), y_hat)
      + w_out * BCE(f(istft((1-mask) * spec)), 1 - y_hat)
      + w_l1 * mean|mask|

where f = SSL-embed -> mean-pool -> LogReg and the weights w = softplus(w_raw)
are learnable (GradNorm-flavored), initialized softplus^-1-free at raw
[3.0, 0.5, 3.0] (`loss_function.py:24`). After every optimizer step the
reference renormalizes w to sum to len(w) (`train_addvisor.py:379-380`) —
`renormalize_w` reproduces that in raw-parameter space.

The whole loss is one jit-able pure function: mask -> pad to full spec ->
complex remask -> iSTFT (MXU matmul) -> zero-mean/unit-var -> wav2vec2 ->
LogReg -> BCE, differentiated end-to-end through the (frozen) embedder — the
TPU-native equivalent of the reference's "force math SDP so backward through
attention works" workaround (`train_addvisor.py:21-23`), which XLA does not
need.

The TV regularizer is implemented but dead by default (reg_w_tv=0), exactly
like the reference (`loss_function.py:67-75` computes reg_loss and never uses
it).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from xai_audio_deepfakes_tpu.config import LossConfig, MaskingConvention
from xai_audio_deepfakes_tpu.ops.masking import apply_mask, pad_mask_to_spec, remask_complex


class LMACLossState(NamedTuple):
    """Learnable raw loss weights (the reference's `w_raw` nn.Parameter)."""

    w_raw: jnp.ndarray  # [3]

    @staticmethod
    def init(cfg: LossConfig) -> "LMACLossState":
        return LMACLossState(w_raw=jnp.asarray(cfg.w_init, dtype=jnp.float32))


def softplus_weights(w_raw: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(w_raw)


def _softplus_inverse(y: jnp.ndarray) -> jnp.ndarray:
    # softplus^-1(y) = y + log1p(-exp(-y)), numerically safe for y > 0
    return y + jnp.log1p(-jnp.exp(-jnp.maximum(y, 1e-6)))


def renormalize_w(
    w_raw: jnp.ndarray, freeze_last: bool = False
) -> jnp.ndarray:
    """Post-step renorm: w <- w / sum(w) * len(w) (`train_addvisor.py:379-380`),
    mapped back through softplus^-1 so the raw parameter stays consistent.

    freeze_last=True (TrainConfig.freeze_l1_weight) excludes the final
    (L1) weight from the renorm: the last raw entry passes through
    untouched (bit-identical across steps), and the first entries are
    renormalized among themselves to sum to len(w)-1 — so l_in/l_out keep
    the reference's relative-rebalancing dynamic under a fixed per-pair
    budget, while the L1 weight leaves the feedback loop entirely. (The
    total is NOT pinned to len(w): the raw init [3.0, 0.5, 3.0] has
    softplus(3.0) > 1 for the frozen slot, so pinning the total would
    drive the head budget negative.)"""
    w = jax.nn.softplus(w_raw)
    if freeze_last:
        head = w[:-1]
        head = head / jnp.sum(head) * (w.shape[0] - 1)
        return jnp.concatenate(
            [_softplus_inverse(head), w_raw[-1:]]
        )
    w = w / jnp.sum(w) * w.shape[0]
    return _softplus_inverse(w)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (torch F.binary_cross_entropy_
    with_logits semantics, `loss_function.py:54-59`)."""
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def lmac_loss(
    w_raw: jnp.ndarray,
    mask: jnp.ndarray,
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    class_pred: jnp.ndarray,
    classify_wav: Callable[[jnp.ndarray], jnp.ndarray],
    istft_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    cfg: LossConfig = LossConfig(),
    l1_scale: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (total, losses=[l_in, l_out, l1], w). Mirrors
    `LMACLoss.loss_function` (`loss_function.py:32-77`).

    mask:       [B, Fm, Tm] decoder output (e.g. 512x248)
    magnitude:  [B, F, T] raw STFT magnitude (513x249)
    phase:      [B, F, T]
    class_pred: [B, 1] sigmoid(detector logits on the clean clip)
                (`train_addvisor.py:364-366` passes sigmoid(yhat))
    classify_wav: waveform [B, L] -> detector logits [B, 1]
                (embed + mean-pool + LogReg; frozen)
    istft_fn:   (real, imag) [B, F, T] -> waveform [B, L]
    """
    f, t = magnitude.shape[-2], magnitude.shape[-1]
    mask_full = pad_mask_to_spec(mask, f, t)
    rel_mag, irr_mag = apply_mask(mask_full, magnitude, cfg.masking)
    rel_re, rel_im = remask_complex(rel_mag, phase)
    irr_re, irr_im = remask_complex(irr_mag, phase)
    rel_wav = istft_fn(rel_re, rel_im)
    irr_wav = istft_fn(irr_re, irr_im)
    rel_logits = classify_wav(rel_wav)
    irr_logits = classify_wav(irr_wav)

    l_in = bce_with_logits(rel_logits, class_pred)
    l_out = bce_with_logits(irr_logits, 1.0 - class_pred)
    # cfg.l1_scale=1.0 is the reference formula (`loss_function.py:60`); the
    # knob exposes the sparsity/fidelity frontier the learnable-w renorm
    # otherwise pins (see LossConfig.l1_scale). The optional `l1_scale`
    # argument is the TRACED form of the same knob: a sweep that passes it
    # as an array input shares ONE compiled train step across all its
    # points instead of baking a new constant (= a full multi-minute
    # remote recompile) per point.
    l1 = (
        cfg.l1_scale if l1_scale is None else l1_scale
    ) * jnp.mean(jnp.abs(mask))

    losses = jnp.stack([l_in, l_out, l1])
    w = softplus_weights(w_raw)
    total = jnp.sum(w * losses)

    if cfg.reg_w_tv > 0:
        tv_h = jnp.sum(jnp.abs(mask[..., :, :-1] - mask[..., :, 1:]))
        tv_w = jnp.sum(jnp.abs(mask[..., :-1, :] - mask[..., 1:, :]))
        total = total + cfg.reg_w_tv * (tv_h + tv_w)

    return total, losses, w
