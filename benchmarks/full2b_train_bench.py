"""LMAC training step against the untruncated XLS-R-2B embedder, one chip.

The reference trains the UNet mask decoder against the frozen XLS-R-2B
(`train_addvisor.py:345-393`, `classifier_embedder.py:13-16`); the flagship
ships the 9-layer truncation because the product consumes hidden_states[9],
so `benchmarks/train_bench.py` measures that geometry. This bench retires
the remaining 2B claim: the FULL 48-layer stack inside the training step —
3 embedder forwards + backward through 2 of them (gradients w.r.t. the
masked waveforms, not the frozen params) + STFT/UNet/iSTFT + dual Adam —
on a single 16 GB v5e, bf16 frozen params materialized on device (~4.3 GB)
with per-layer remat over the scan. Records clips/s or the OOM boundary;
the dp x stage pipeline fallback (`parallel/pipeline.py`, reachable via
`cli train --pipeline-stages`) is the multi-chip contingency either way.

    python benchmarks/full2b_train_bench.py            # batch 2
    FULL2B_TRAIN_BATCH=4 python benchmarks/full2b_train_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from xai_audio_deepfakes_tpu.utils.cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    import dataclasses

    from xai_audio_deepfakes_tpu.config import EmbedderConfig, PipelineConfig
    from xai_audio_deepfakes_tpu.models.logreg import LogReg
    from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.train_addvisor import (
        init_train_state,
        make_optimizers,
        make_train_step,
    )

    batch = int(os.environ.get("FULL2B_TRAIN_BATCH", "2"))
    iters = int(os.environ.get("FULL2B_TRAIN_ITERS", "5"))
    policy = os.environ.get("FULL2B_REMAT_POLICY", "full")

    # output_layer = num_layers: full-model readout is the last hidden state
    # (output_layer < L would flip on the scan's per-layer collect path and
    # materialize a [48, B, T, 1920] stack). The conv frontend is identical
    # across XLS-R sizes, so T/UNet/LogReg geometry match the flagship.
    emb = dataclasses.replace(
        EmbedderConfig.xls_r_2b_full(),
        scan_layers=True,
        output_layer=48,
        remat_policy=policy,
    )
    cfg = PipelineConfig(embedder=emb)
    pipe = ADDvisorPipeline(cfg)

    # Materialize the frozen 2B encoder bf16 directly on device (see
    # benchmarks/full2b_bench.py for the eval_shape trick rationale); the
    # trained subtrees (UNet) init normally — they are small.
    init_enc = Wav2Vec2Encoder(dataclasses.replace(emb, fused_attention=False))
    shapes = jax.eval_shape(
        lambda k: init_enc.init(k, jnp.zeros((1, cfg.audio.num_samples), jnp.float32)),
        jax.random.PRNGKey(0),
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))

    @jax.jit
    def materialize():
        return jax.tree.map(
            lambda s: jnp.full(
                s.shape,
                0.02,
                jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype,
            ),
            shapes,
        )

    mag = jnp.zeros((1, cfg.unet.freq_bins, cfg.unet.frames), jnp.float32)
    params = {
        "encoder": materialize(),
        "unet": pipe.unet.init(jax.random.PRNGKey(1), mag),
        "logreg": LogReg.init(emb.hidden_size),
    }

    tx_m, tx_w = make_optimizers(cfg)
    state = init_train_state(pipe, params, tx_m, tx_w)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}
    step = jax.jit(make_train_step(pipe, tx_m, tx_w), donate_argnums=(0,))

    wav = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )

    try:
        state, aux = step(state, frozen, wav)  # compile
        np.asarray(aux["loss"])  # barrier (see bench.py note)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, frozen, wav)
        np.asarray(aux["loss"])
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "xls_r_2b_full train clips/sec/chip",
                    "value": round(batch * iters / dt, 3),
                    "unit": "clips/s",
                    "steps_per_sec": round(iters / dt, 3),
                    "batch": batch,
                    "layers": emb.num_layers,
                    "remat_policy": policy,
                    "params_B": round(n_params / 1e9, 3),
                    "loss": float(np.asarray(aux["loss"])),
                    "device": str(jax.devices()[0]),
                }
            )
        )
    except Exception as e:  # record the OOM boundary instead of crashing
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
        print(
            json.dumps(
                {
                    "metric": "xls_r_2b_full train clips/sec/chip",
                    "value": None,
                    "batch": batch,
                    "remat_policy": policy,
                    "params_B": round(n_params / 1e9, 3),
                    "oom": oom,
                    "error": msg[:400],
                }
            )
        )
        raise SystemExit(1)


if __name__ == "__main__":
    main()
