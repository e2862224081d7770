"""HiFi-GAN vocoding throughput — the data-gen hot path.

The reference's `hifigan.py` vocodes LJSpeech one file at a time through
SpeechBrain on CUDA (`hifigan.py:106-110,163-180`); here mel extraction +
the V1 generator (256x upsampling transposed-conv + MRF stack) run as one
jitted XLA program over a batch (`data/vocoded.py::make_vocoder_fn`).
Records vocoded clips/s/chip for the 5 s / 16 kHz clip contract.

    python benchmarks/vocoder_bench.py                 # batch 16, f32
    VOC_BATCH=32 VOC_DTYPE=bfloat16 python benchmarks/vocoder_bench.py
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

    from xai_audio_deepfakes_tpu.config import HiFiGANConfig, PipelineConfig
    from xai_audio_deepfakes_tpu.data.vocoded import make_vocoder_fn
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    batch = int(os.environ.get("VOC_BATCH", "16"))
    iters = int(os.environ.get("VOC_ITERS", "10"))
    dtype = os.environ.get("VOC_DTYPE", "float32")

    cfg = PipelineConfig(hifigan=HiFiGANConfig(dtype=dtype))
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), with_hifigan=True)
    vocode = make_vocoder_fn(pipe, params)

    wav = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )

    out = vocode(wav)  # compile
    np.asarray(out[:1, :8])  # barrier (see bench.py note)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = vocode(wav)
    np.asarray(out[:1, :8])
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "vocoded clips/sec/chip",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s",
                "rtf": round(clips_per_sec * cfg.audio.clip_seconds, 1),
                "batch": batch,
                "dtype": dtype,
                "out_samples": int(out.shape[-1]),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
