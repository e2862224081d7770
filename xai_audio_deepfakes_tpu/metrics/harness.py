"""Batched evaluation harnesses.

  * run_explanation_metrics — the `run_addvisor_metrics` sweep
    (`LMAC_metrics.py:117-172`): per batch, clean probs, decoder mask,
    log1p/expm1 masking, iSTFT, re-embed, probs; aggregate faithfulness /
    fidelity / AD / AI / AG.
  * run_attribution_metrics — the Captum baseline sweep
    (`captum_saliency.py:112-212`): waveform-domain attribution mask,
    relevant/irrelevant waveforms, re-embed, probs; faithfulness + fidelity +
    manipulated-count. The reference's counting bug (iterating the last
    batch's `probs_rel` instead of the accumulated scores,
    `captum_saliency.py:204-210`) is fixed: counting covers ALL files.

Both harnesses run one jitted program per batch, reduce each batch to a few
scalars on device, and fold those on the host — eval memory is O(1) in
clips. Across a mesh the batch axis shards over 'data' so the sweep scales
with chips (config 5 of BASELINE.json).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.attrib.methods import waveform_explanation
from xai_audio_deepfakes_tpu.config import (
    MaskingConvention,
    manipulated_probability,
)
from xai_audio_deepfakes_tpu.metrics.lmac_metrics import (
    compute_faithfulness,
    compute_fidelity,
    merge_summaries,
    summarize_sums,
)
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline


def run_explanation_metrics(
    pipe: ADDvisorPipeline,
    params: dict,
    batches: Iterable[np.ndarray],
    decoder: str = "unet",
    masking: MaskingConvention = MaskingConvention.LOG1P,
    log_fn: Callable[[dict], None] | None = None,
    mesh=None,
) -> dict:
    """With `mesh`, the sweep runs dp x tp sharded (every chip scores its
    slice of each batch — batch sizes must divide the data-axis size)."""
    if mesh is not None:
        from xai_audio_deepfakes_tpu.parallel.inference import (
            make_sharded_explain,
        )

        explain, params = make_sharded_explain(
            pipe, mesh, params, decoder=decoder, masking=masking
        )
    else:
        explain = pipe.jit_explain(decoder=decoder, masking=masking)
    fold = jax.jit(summarize_sums)
    # O(1) eval memory in clips: each batch reduces to a [5]-sum + count on
    # device; only those scalars ever reach the host (the reference
    # concatenates every probability, `LMAC_metrics.py:160-172`)
    partials = []
    for wav in batches:
        out = explain(params, jnp.asarray(wav))
        sums, count = fold(out.probs_clean, out.probs_relevant, out.probs_irrelevant)
        partials.append((np.asarray(sums), int(count)))
    result = merge_summaries(partials)
    if log_fn is not None:
        log_fn({"explanation_metrics": result})
    return result


def run_attribution_metrics(
    pipe: ADDvisorPipeline,
    params: dict,
    batches: Iterable[np.ndarray],
    method: str = "input_x_gradient",
    log_fn: Callable[[dict], None] | None = None,
    artifact_fn: Callable[..., None] | None = None,
    **method_kw,
) -> dict:
    """With `artifact_fn`, each batch's waveform mask and relevant/irrelevant
    waveforms are ALSO transferred to the host and passed as
    artifact_fn(wav, mask, rel_wav, irr_wav, p_clean, p_rel, p_irr) — the
    per-file artifact capability of `captum_saliency.py:136-166` (spectrogram
    PNGs, mask plot, listenable masked waveforms). Off by default: it adds
    three [B, 80000] device-to-host copies per batch to an otherwise
    scalars-only sweep."""
    # params is a jit ARGUMENT, not a closure: closed-over weights would be
    # inlined into the HLO as literal constants (measured: 3.4 GB of program
    # text at full geometry — uncompilable through the remote-compile relay)
    @jax.jit
    def step(params, wav):
        def score_fn(w):
            logits, _ = pipe.classify(params, w)
            return logits

        mask, rel_wav, irr_wav = waveform_explanation(
            score_fn, wav, method=method, **method_kw
        )
        _, p_clean = pipe.classify(params, wav)
        _, p_rel = pipe.classify(params, rel_wav)
        _, p_irr = pipe.classify(params, irr_wav)
        if artifact_fn is None:
            # metrics-only graph: masks/waveforms stay device-side and XLA
            # DCEs whatever the probabilities do not need
            return p_clean, p_rel, p_irr, (), (), ()
        return p_clean, p_rel, p_irr, mask, rel_wav, irr_wav

    # device-side fold (mirrors run_explanation_metrics): each batch reduces
    # to three scalars on device, so eval memory is O(1) in clips and only
    # scalars cross to the host — the reference instead keeps every
    # probability (`captum_saliency.py:169-192`)
    @jax.jit
    def fold(p_clean, p_rel, p_irr):
        ff = jnp.sum(compute_faithfulness(p_clean, p_irr))
        fid = jnp.sum(compute_fidelity(p_rel, p_clean))
        # fixed vs `captum_saliency.py:204-210`: count over ALL files;
        # "manipulated" decided under the pipeline's configured polarity
        manip = jnp.sum(
            (manipulated_probability(p_rel[:, 0], pipe.cfg.polarity) >= 0.5)
            .astype(jnp.int32)
        )
        return ff, fid, manip

    ff_sum = fid_sum = 0.0
    manip_count = n_clips = 0
    for wav in batches:
        p_clean, p_rel, p_irr, mask, rel, irr = step(params, jnp.asarray(wav))
        if artifact_fn is not None:
            artifact_fn(
                np.asarray(wav), np.asarray(mask), np.asarray(rel),
                np.asarray(irr), np.asarray(p_clean), np.asarray(p_rel),
                np.asarray(p_irr),
            )
        ff, fid, manip = fold(p_clean, p_rel, p_irr)
        ff_sum += float(ff)
        fid_sum += float(fid)
        manip_count += int(manip)
        n_clips += int(p_clean.shape[0])
    denom = max(n_clips, 1)
    result = {
        "method": method,
        "faithfulness": ff_sum / denom,
        "fidelity": fid_sum / denom,
        "relevant_classified_manipulated": manip_count,
        "num_clips": n_clips,
    }
    if log_fn is not None:
        log_fn({"attribution_metrics": result})
    return result
