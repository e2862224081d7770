"""End-to-end LISTENABLE explanation throughput: the one-graph path.

SURVEY §7 step 8 specifies wav -> mask -> masked-spec -> mel -> HiFi-GAN as
ONE jitted graph (`pipeline/core.py::explain_vocoded`); the reference runs
explanation (`LMAC_metrics.py:136-153`) and vocoding (`hifigan.py:163-180`,
one file at a time through SpeechBrain) as two disconnected scripts.
Measures clips/s/chip for the fused graph vs the two-dispatch composition
(jit(explain) then jit(vocode)) at the same batch.

    python benchmarks/listenable_bench.py                # batch 64
    LIS_BATCH=128 LIS_QUANT=int8 python benchmarks/listenable_bench.py
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

    from xai_audio_deepfakes_tpu.config import (
        EmbedderConfig,
        HiFiGANConfig,
        PipelineConfig,
    )
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    batch = int(os.environ.get("LIS_BATCH", "64"))
    iters = int(os.environ.get("LIS_ITERS", "10"))
    quant = os.environ.get("LIS_QUANT", "int8")
    gelu = os.environ.get("LIS_GELU", "tanh")

    cfg = PipelineConfig(
        embedder=EmbedderConfig(dtype="bfloat16", quant=quant, gelu=gelu,
                                scan_layers=True),
        hifigan=HiFiGANConfig(dtype="bfloat16"),
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), with_hifigan=True)
    wav = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )

    fused = pipe.jit_explain_vocoded(decoder="unet")
    explain = pipe.jit_explain(decoder="unet")
    vocode = jax.jit(pipe.vocode)

    def bench(fn):
        out = fn(wav)
        np.asarray(out[:1, :8])  # barrier (see bench.py note)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(wav)
        np.asarray(out[:1, :8])
        dt = (time.perf_counter() - t0) / iters
        return batch / dt, dt

    cps_fused, dt_f = bench(lambda w: fused(params, w)[1])
    cps_two, dt_2 = bench(
        lambda w: vocode(params, explain(params, w).relevant_wav)
    )

    clip_s = cfg.audio.clip_seconds
    print(json.dumps({
        "metric": "listenable_explanations_per_sec_per_chip",
        "batch": batch, "quant": quant, "gelu": gelu,
        "fused_clips_per_sec": round(cps_fused, 1),
        "fused_rtf": round(cps_fused * clip_s, 1),
        "two_graph_clips_per_sec": round(cps_two, 1),
        "fused_ms_per_batch": round(dt_f * 1e3, 2),
        "two_graph_ms_per_batch": round(dt_2 * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
