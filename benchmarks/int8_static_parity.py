"""Parity bound for the int8-static serving path (round-5 adoption gate).

int8-static replaces dynamic per-token activation scales with scales
calibrated on a corpus; unseen activations beyond the calibrated max
saturate at +-127. This measures, at FULL serving geometry on the chip:

  * probability deltas (clean / relevant / irrelevant) of int8-static vs
    dynamic int8 and vs bf16, on a HELD-OUT batch the calibration never
    saw (the honest deployment setting);
  * confirms masks/waveforms are bit-identical across embedder quant
    modes (the mask comes from the magnitude UNet; embedder quant can
    only move the probabilities).

Usage: python benchmarks/int8_static_parity.py   (on the TPU)
Prints one JSON line; record in docs/performance.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xai_audio_deepfakes_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402


def main() -> None:
    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xai_audio_deepfakes_tpu.config import (
        EmbedderConfig,
        PipelineConfig,
        UNetConfig,
    )
    from xai_audio_deepfakes_tpu.data.synthetic import speechlike_clips
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    batch = int(os.environ.get("PARITY_BATCH", "16"))

    def build(quant):
        cfg = PipelineConfig(
            embedder=EmbedderConfig(
                dtype="bfloat16", quant=quant, gelu="tanh",
            ),
            unet=UNetConfig(dtype="bfloat16"),
        )
        return ADDvisorPipeline(cfg)

    rng = np.random.default_rng(0)
    n = build("none").cfg.audio.num_samples
    calib = jnp.asarray(speechlike_clips(rng, batch, n, 16000))
    held_out = jnp.asarray(speechlike_clips(rng, batch, n, 16000))

    outs = {}
    params = None
    for mode, quant, stat in (
        ("none", "none", None),
        ("int8", "int8", None),
        ("static-max", "int8-static", "max"),
        ("static-p999", "int8-static", "p999"),
    ):
        pipe = build(quant)
        if params is None:
            params = pipe.init_params(jax.random.PRNGKey(0))
        p = params
        if stat is not None:
            p = pipe.calibrate_quant(params, calib, stat=stat)
        out = pipe.jit_explain(decoder="unet")(p, held_out)
        outs[mode] = jax.tree.map(np.asarray, out)

    def prob_delta(a, b):
        return {
            k: float(
                np.max(np.abs(getattr(outs[a], f"probs_{k}")
                              - getattr(outs[b], f"probs_{k}")))
            )
            for k in ("clean", "relevant", "irrelevant")
        }

    mask_identical = {
        q: bool(np.array_equal(outs["none"].mask, outs[q].mask))
        and bool(np.array_equal(outs["none"].relevant_wav, outs[q].relevant_wav))
        for q in ("int8", "static-max", "static-p999")
    }
    print(
        json.dumps(
            {
                "batch": batch,
                "held_out": True,
                "static_max_vs_dynamic": prob_delta("static-max", "int8"),
                "static_p999_vs_dynamic": prob_delta("static-p999", "int8"),
                "static_max_vs_bf16": prob_delta("static-max", "none"),
                "static_p999_vs_bf16": prob_delta("static-p999", "none"),
                "dynamic_vs_bf16": prob_delta("int8", "none"),
                "mask_and_wav_identical_to_bf16": mask_identical,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
