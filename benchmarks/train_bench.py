"""Training-step throughput: clips/sec/chip through the full LMAC step.

Each step is the heaviest graph in the framework: STFT + UNet fwd + 2x
masked iSTFT + 3 embedder forwards + backward through 2 of them and the
iSTFTs into the UNet (reference hot loop, `train_addvisor.py:345-393` +
`loss_function.py:32-77`), plus dual Adam and the loss-weight renorm.
The embedder remats per layer (`EmbedderConfig.remat`) to keep 3 fwd +
2 bwd of the full geometry in HBM.

    python benchmarks/train_bench.py               # batch 16
    TRAIN_BATCH=32 python benchmarks/train_bench.py
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

from xai_audio_deepfakes_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()


def main() -> None:

    import dataclasses

    from xai_audio_deepfakes_tpu.config import EmbedderConfig, PipelineConfig
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.train_addvisor import (
        init_train_state,
        make_optimizers,
        make_train_step,
    )

    batch = int(os.environ.get("TRAIN_BATCH", "16"))
    iters = int(os.environ.get("TRAIN_ITERS", "10"))

    scan = os.environ.get("TRAIN_SCAN", "1") == "1"
    policy = os.environ.get("TRAIN_REMAT_POLICY", "full")
    emb = dataclasses.replace(
        EmbedderConfig(dtype="bfloat16"),
        remat=True,
        scan_layers=scan,
        remat_policy=policy,
    )
    from xai_audio_deepfakes_tpu.config import TrainConfig

    # TRAIN_TARGET_QUANT=int8 TRAIN_TARGET_GELU=tanh: serving-grade fast
    # paths for the gradient-free target embed (TrainConfig.target_quant)
    train_cfg = TrainConfig(
        target_quant=os.environ.get("TRAIN_TARGET_QUANT", "none"),
        target_gelu=os.environ.get("TRAIN_TARGET_GELU", "exact"),
    )
    cfg = PipelineConfig(embedder=emb, train=train_cfg)
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))

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

    state, aux = step(state, frozen, wav)  # compile
    np.asarray(aux["loss"])  # barrier (see bench.py note)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, frozen, wav)
    np.asarray(aux["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "train clips/sec/chip",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s",
                "steps_per_sec": round(iters / dt, 3),
                "batch": batch,
                "remat_policy": policy,
                "loss": float(np.asarray(aux["loss"])),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
