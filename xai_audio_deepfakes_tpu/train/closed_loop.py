"""Closed-loop explanation-quality protocol: prove the masks explain.

The reference's entire purpose is explanations that keep the detector's
decision on the relevant part and flip it on the complement
(`/root/reference/README.md:1-4`, `loss_function.py:32-60`), but its
evidence is pre-trained artifacts this environment does not have. This
module closes the loop from scratch, with every stage a component this
framework already ships:

  1. build a band-swap corpus whose artifact band is KNOWN
     (`data/synthetic.py`; protocol of `train_logReg_swapping.py:29-102`
     with the band fixed instead of swept)
  2. train the LogReg detector on (real=0, manipulated=1) embeddings
     (`train/train_logreg.py`) — it must separate the classes
  3. train the UNet mask decoder against that *trained* detector with the
     LMAC loss (`train/train_addvisor.py`)
  4. verify the product claim:
       (a) FF/fidelity/AD/AI/AG improve over the untrained decoder
       (b) the learned mask's energy concentrates in the swapped band
           (`metrics/localization.py`)
       (c) the irrelevant waveform flips the detector; the relevant one
           keeps its decision

No step consumes external weights: the embedder stays randomly initialized
(a fixed random feature map — the detector head is what makes it a
detector), which is exactly what makes the loop self-contained.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.config import (
    MaskingConvention,
    PipelineConfig,
    manipulated_probability,
)
from xai_audio_deepfakes_tpu.data.synthetic import (
    detector_corpus,
    detector_corpus_anyband,
    make_anyband_corpus,
    make_bandswap_corpus,
)
from xai_audio_deepfakes_tpu.metrics.lmac_metrics import summarize
from xai_audio_deepfakes_tpu.metrics.localization import (
    mask_band_stats,
    per_clip_band_stats,
)
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
from xai_audio_deepfakes_tpu.train.train_addvisor import train_addvisor
from xai_audio_deepfakes_tpu.train.train_logreg import train_detector


def evaluate_explanations(
    pipe: ADDvisorPipeline,
    params: dict,
    wavs: np.ndarray,
    band: tuple[float, float] | None,
    masking: MaskingConvention,
    batch_size: int,
    keep_wavs: int = 0,
    decoder: str = "unet",
    bands: np.ndarray | None = None,
    band_width: float = 1000.0,
    f_max: float = 8000.0,
) -> dict:
    """Explain manipulated clips and score the product claim: LMAC metrics,
    mask-vs-band localization, and decision keep/flip rates. With
    `keep_wavs` > 0, the first that-many clips' listenable relevant/
    irrelevant waveforms are returned too (the reference's product is
    *audible* explanations, `README.md:1-4`).

    `band` scores every mask against one corpus-wide artifact band;
    `bands` [B, 2] scores each mask against ITS clip's band plus the
    input-dependence statistics (`metrics/localization.py::
    per_clip_band_stats`) — the anyband protocol."""
    explain = pipe.jit_explain(decoder=decoder, masking=masking)
    masks, pc, pr, pi = [], [], [], []
    mags = []
    rel_wavs, irr_wavs = [], []
    for i in range(0, len(wavs), batch_size):
        chunk = wavs[i : i + batch_size]
        k = len(chunk)
        if k < batch_size:
            # pad the tail batch to the compiled shape and trim the outputs —
            # every requested clip is scored (no silent coverage drop; the
            # ragged-batch handling `serve/api.py` already applies)
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_size - k, axis=0)]
            )
        out = explain(params, jnp.asarray(chunk))
        masks.append(np.asarray(out.mask[:k]))
        mags.append(np.asarray(out.magnitude[:k]))
        pc.append(np.asarray(out.probs_clean[:k]))
        pr.append(np.asarray(out.probs_relevant[:k]))
        pi.append(np.asarray(out.probs_irrelevant[:k]))
        if i < keep_wavs:
            rel_wavs.append(np.asarray(out.relevant_wav[:k][: keep_wavs - i]))
            irr_wavs.append(np.asarray(out.irrelevant_wav[:k][: keep_wavs - i]))
    masks = np.concatenate(masks)
    pc, pr, pi = (np.concatenate(x) for x in (pc, pr, pi))
    metrics = {
        k: float(v)
        for k, v in summarize(
            jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(pi)
        ).items()
    }
    pol = pipe.cfg.polarity
    p_clean = np.asarray(manipulated_probability(pc[:, 0], pol))
    p_rel = np.asarray(manipulated_probability(pr[:, 0], pol))
    p_irr = np.asarray(manipulated_probability(pi[:, 0], pol))
    uc = pipe.cfg.unet
    if bands is not None:
        localization = per_clip_band_stats(
            masks, pipe.cfg.stft, bands, band_width, f_max,
            freq_bins=uc.freq_bins, frames=uc.frames,
        )
    else:
        localization = mask_band_stats(
            masks, pipe.cfg.stft, band[0], band[1],
            freq_bins=uc.freq_bins, frames=uc.frames,
        )
    return {
        "metrics": metrics,
        "localization": localization,
        "p_manipulated_clean": float(p_clean.mean()),
        "p_manipulated_relevant": float(p_rel.mean()),
        "p_manipulated_irrelevant": float(p_irr.mean()),
        # on manipulated inputs: relevant must KEEP the manipulated call,
        # irrelevant must FLIP to real (`loss_function.py:54-58` objectives)
        "keep_rate": float(np.mean(p_rel > 0.5)),
        "flip_rate": float(np.mean(p_irr < 0.5)),
        "masks": masks,
        "magnitude": np.concatenate(mags),
        "relevant_wavs": np.concatenate(rel_wavs) if rel_wavs else None,
        "irrelevant_wavs": np.concatenate(irr_wavs) if irr_wavs else None,
        # per-clip P(class 1) triples (clean/relevant/irrelevant) — the
        # gallery's three prediction numbers (`streamlit...py:276-314`)
        "probs": np.concatenate([pc, pr, pi], axis=1),
    }


def run_closed_loop(
    cfg: PipelineConfig,
    seed: int = 0,
    n_train: int = 32,
    n_eval: int = 16,
    band: tuple[float, float] = (2000.0, 3000.0),
    epochs: int = 40,
    batch_size: int = 8,
    noise_rms: float = 0.5,
    mesh=None,
    log_fn: Callable[[dict], None] | None = None,
    artifact_fn=None,
    checkpoint_fn=None,
    keep_wavs: int = 0,
    anyband: bool = False,
    band_width: float = 1000.0,
    f_max: float = 8000.0,
    decoder: str = "unet",
    l1_scale: float | None = None,
    l1_warmup_epochs: int = 0,
) -> dict:
    """The full loop. Returns a dict with detector metrics, before/after
    explanation metrics + localization + keep/flip rates, the training log,
    and the final eval masks (for PNG artifacts).

    With `anyband`, the artifact band is drawn PER CLIP from the grid of
    `band_width` bands in [0, f_max) — the reference's actual protocol
    (`train_logReg_swapping.py:70-92`, checkpoint
    `logReg_vocoded_anyband.joblib`) — and localization is scored per clip
    with input-dependence statistics (cross-clip mask IoU, wrong-band
    control); `band` is ignored."""
    rng = np.random.default_rng(seed)
    n_samples = cfg.audio.num_samples
    bands_tr = bands_ev = None
    if anyband:
        real_tr, manip_tr, bands_tr = make_anyband_corpus(
            rng, n_train, n_samples, cfg.stft, band_width, f_max, noise_rms
        )
        real_ev, manip_ev, bands_ev = make_anyband_corpus(
            rng, n_eval, n_samples, cfg.stft, band_width, f_max, noise_rms
        )
    else:
        real_tr, manip_tr = make_bandswap_corpus(
            rng, n_train, n_samples, cfg.stft, band[0], band[1], noise_rms
        )
        real_ev, manip_ev = make_bandswap_corpus(
            rng, n_eval, n_samples, cfg.stft, band[0], band[1], noise_rms
        )

    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(seed))

    # --- detector: real=0 vs manipulated=1 on mean-pooled embeddings
    # (`train_logReg_swapping.py:105-128` semantics), with band-filtered
    # augmentation so its decision survives masking (see
    # `data/synthetic.py::detector_corpus`) ---
    embed = jax.jit(lambda p, w: jnp.mean(pipe.features(p, w), axis=1))

    def embed_all(wavs):
        out = []
        for i in range(0, len(wavs), batch_size):
            chunk = wavs[i : i + batch_size]
            k = len(chunk)
            if k < batch_size:  # pad the tail to the compiled shape
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch_size - k, axis=0)]
                )
            out.append(np.asarray(embed(params, jnp.asarray(chunk)))[:k])
        return np.concatenate(out)

    if anyband:
        det_wavs, y = detector_corpus_anyband(
            real_tr, manip_tr, cfg.stft, bands_tr, band_width, f_max,
            rng=rng, noise_rms=noise_rms,
        )
    else:
        det_wavs, y = detector_corpus(
            real_tr, manip_tr, cfg.stft, band[0], band[1], rng=rng
        )
    x = embed_all(det_wavs)
    det_params, det_metrics = train_detector(x, y, log_fn=log_fn)
    # held-out check on the eval corpus (un-augmented: the base protocol)
    from xai_audio_deepfakes_tpu.train.train_logreg import evaluate_logreg

    x_ev = np.concatenate([embed_all(real_ev), embed_all(manip_ev)])
    y_ev = np.concatenate(
        [np.zeros(len(real_ev), np.int64), np.ones(len(manip_ev), np.int64)]
    )
    det_holdout = evaluate_logreg(det_params, x_ev, y_ev)
    params["logreg"] = jax.tree.map(jnp.asarray, det_params)

    # --- explanation quality BEFORE decoder training (the control) ---
    masking = cfg.loss.masking
    loc_kw = dict(
        bands=bands_ev, band_width=band_width, f_max=f_max, decoder=decoder
    )
    before = evaluate_explanations(
        pipe, params, manip_ev, band, masking, batch_size, **loc_kw
    )

    # --- train the mask decoder against the trained detector ---
    order = np.arange(n_train)

    def batches():
        rng.shuffle(order)
        return [
            jnp.asarray(manip_tr[order[i : i + batch_size]])
            for i in range(0, n_train - batch_size + 1, batch_size)
        ]

    train_log: list[dict] = []

    def _log(rec):
        train_log.append(rec)
        if log_fn is not None:
            log_fn(rec)

    state = train_addvisor(
        pipe, params, batches, num_epochs=epochs, mesh=mesh, log_fn=_log,
        artifact_fn=artifact_fn, checkpoint_fn=checkpoint_fn, decoder=decoder,
        # traced (not baked) so an l1 sweep shares one compiled train step
        l1_scale=l1_scale,
        l1_warmup_epochs=l1_warmup_epochs,
    )
    from xai_audio_deepfakes_tpu.train.train_addvisor import decoder_params_key

    trained = dict(params)
    key = decoder_params_key(decoder)
    trained[key] = {"params": state.unet_params}
    if state.unet_batch_stats:
        trained[key]["batch_stats"] = state.unet_batch_stats

    # --- explanation quality AFTER ---
    after = evaluate_explanations(
        pipe, trained, manip_ev, band, masking, batch_size,
        keep_wavs=keep_wavs, **loc_kw,
    )
    # train-subset view: separates "the loss minimum localizes" from
    # "the decoder generalizes to held-out clips"
    n_sub = len(manip_ev)
    after_train = evaluate_explanations(
        pipe, trained, manip_tr[:n_sub], band, masking, batch_size,
        bands=None if bands_tr is None else bands_tr[:n_sub],
        band_width=band_width, f_max=f_max, decoder=decoder,
    )

    arrays = ("masks", "magnitude", "relevant_wavs", "irrelevant_wavs",
              "probs")
    return {
        "final_probs": after["probs"],
        "band_hz": None if anyband else list(band),
        "anyband": anyband,
        "decoder": decoder,
        "masking": str(getattr(masking, "value", masking)),
        "eval_bands_hz": None if bands_ev is None else bands_ev.tolist(),
        "detector": det_metrics,
        "detector_holdout": det_holdout,
        "before": {k: v for k, v in before.items() if k not in arrays},
        "after": {k: v for k, v in after.items() if k not in arrays},
        "after_train": {
            k: v for k, v in after_train.items() if k not in arrays
        },
        "train_log": train_log,
        "final_masks": after["masks"],
        "final_magnitude": after["magnitude"],
        "final_relevant_wavs": after["relevant_wavs"],
        "final_irrelevant_wavs": after["irrelevant_wavs"],
        "eval_manipulated": manip_ev,
        "state": state,
    }
