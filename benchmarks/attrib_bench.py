"""Attribution throughput: maps/sec/chip for each gradient method.

One of the three primary metrics named in BASELINE.md (explanations/sec,
RTF, attribution maps/sec). The reference's Captum path runs unbatched,
one file at a time, on GPU (`captum_saliency.py:123-135`); here every
method is one batched compiled graph (fwd + bwd of the full embedder).

    python benchmarks/attrib_bench.py            # input_x_gradient, batch 64
    ATTRIB_METHOD=integrated_gradients ATTRIB_BATCH=32 python benchmarks/attrib_bench.py
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

    from xai_audio_deepfakes_tpu.attrib import methods
    from xai_audio_deepfakes_tpu.config import EmbedderConfig, PipelineConfig
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    import dataclasses

    method = os.environ.get("ATTRIB_METHOD", "input_x_gradient")
    batch = int(os.environ.get("ATTRIB_BATCH", "64"))
    iters = int(os.environ.get("ATTRIB_ITERS", "10"))
    # remat + scan_layers shrink the backward HLO dramatically (the relay's
    # compile service broke on the unrolled grad graph after ~70 min; the
    # scanned one is ~num_layers x smaller)
    remat = os.environ.get("ATTRIB_REMAT", "1") == "1"
    scan = os.environ.get("ATTRIB_SCAN", "1") == "1"

    cfg = PipelineConfig(
        embedder=dataclasses.replace(
            EmbedderConfig(dtype="bfloat16"), remat=remat, scan_layers=scan
        )
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))

    fn = getattr(methods, method)
    key = jax.random.PRNGKey(1)

    # params as a jit ARGUMENT: a closed-over param tree is inlined into the
    # HLO as literal constants (measured 3.4 GB of program text at this
    # geometry — the remote-compile relay chokes on it)
    @jax.jit
    def run(params, wav):
        def score_fn(w):
            logits, _ = pipe.classify(params, w)
            return logits

        if method == "integrated_gradients":
            return fn(score_fn, wav, steps=16)
        if method == "smoothgrad":
            return fn(score_fn, wav, key, samples=16)
        if method == "gradient_shap":
            return fn(score_fn, wav, key, samples=16)
        return fn(score_fn, wav)

    wav = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )

    out = run(params, wav)  # compile
    np.asarray(out[:1, :1])  # barrier (see bench.py note)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(params, wav)
    np.asarray(out[:1, :1])
    dt = time.perf_counter() - t0

    maps_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "attribution maps/sec/chip",
                "method": method,
                "value": round(maps_per_sec, 3),
                "unit": "maps/s",
                "batch": batch,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
