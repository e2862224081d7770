"""Single-clip explanation latency — the serving-quality complement to
bench.py's batch-128 throughput number.

The serve API (`serve/api.py`) coalesces concurrent requests into
fixed-shape micro-batches; an interactive user's floor is the batch-1 (or
small-batch) dispatch latency of the full explain graph (wav -> STFT ->
embed -> detect -> mask -> 2x masked iSTFT -> re-embed -> re-detect).
Reports per-dispatch wall-clock percentiles over `LAT_ITERS` dispatches at
`LAT_BATCH` (default 1). NOTE (this environment): each number includes the
tunneled single-chip dispatch round trip; on a local chip the fixed
overhead is lower.

    python benchmarks/latency_bench.py
    LAT_BATCH=8 python benchmarks/latency_bench.py
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
        PipelineConfig,
        UNetConfig,
    )
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    # 200 dispatches so p99 is a real percentile, not the sample max
    batch = int(os.environ.get("LAT_BATCH", "1"))
    iters = int(os.environ.get("LAT_ITERS", "200"))
    quant = os.environ.get("LAT_QUANT", "int8")
    gelu = os.environ.get("LAT_GELU", "tanh")

    cfg = PipelineConfig(
        embedder=EmbedderConfig(dtype="bfloat16", quant=quant, gelu=gelu),
        unet=UNetConfig(dtype="bfloat16"),
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    explain = pipe.jit_explain(decoder="unet")

    wav = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )

    out = explain(params, wav)  # compile
    np.asarray(out.probs_relevant)  # barrier (see bench.py note)

    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = explain(params, wav)
        np.asarray(out.probs_relevant)  # per-dispatch barrier: true latency
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    print(
        json.dumps(
            {
                "metric": "explain latency (ms/dispatch)",
                "p50": round(float(np.percentile(lat_ms, 50)), 1),
                "p90": round(float(np.percentile(lat_ms, 90)), 1),
                "p99": round(float(np.percentile(lat_ms, 99)), 1),
                "batch": batch,
                "iters": iters,
                "quant": quant,
                "gelu": gelu,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
