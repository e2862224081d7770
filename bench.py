"""Benchmark: end-to-end explanation throughput on one chip.

Measures the flagship path — wav [B,80000] -> STFT -> SSL embed (full-size
truncated XLS-R geometry, bf16) -> detector -> UNet mask -> masked iSTFT ->
relevant/irrelevant waveforms -> re-embed -> detector probs — as one jitted
XLA program, steady-state.

Prints ONE JSON line:
  {"metric": "explanations/sec/chip", "value": N, "unit": "clips/s",
   "vs_baseline": RTF / 50}
where RTF = (clips/s * 5 s-audio-per-clip); the baseline target is the
north-star >50x realtime per chip (BASELINE.md — the reference publishes no
numbers of its own).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int | None = None, iters: int = 10) -> None:
    # persistent compile cache: repeated driver runs (and recoveries from the
    # flaky remote-compile relay) reuse the compiled program. TPU-only by
    # design (utils/cache.py) — XLA:CPU AOT entries are host-CPU-specific.
    from xai_audio_deepfakes_tpu.utils.cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from xai_audio_deepfakes_tpu.config import EmbedderConfig, PipelineConfig
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    from xai_audio_deepfakes_tpu.config import UNetConfig

    # serving defaults: int8 MXU matmuls + tanh GELU for the embedder
    # (masks/waveforms bit-identical to bf16; probability deltas below int8
    # quantization noise — see docs/performance.md). BENCH_QUANT=none /
    # BENCH_GELU=exact measure the conservative paths.
    def _env_choice(name: str, default: str, choices: tuple) -> str:
        v = os.environ.get(name, default)
        if v not in choices:
            raise SystemExit(
                f"{name}={v!r} is not one of {choices} — refusing to fall "
                "through to a default path while recording the raw string "
                "in the bench JSON"
            )
        return v

    quant = _env_choice("BENCH_QUANT", "int8", ("none", "int8"))
    gelu = _env_choice("BENCH_GELU", "tanh", ("exact", "tanh"))
    # fused conv default-off: the Pallas conv kernel is parity-verified but
    # its serving graph over-allocates at batch 128 (FAILED_PRECONDITION);
    # opt in with BENCH_FUSED_CONV=1 at smaller batches.
    fused_conv = os.environ.get("BENCH_FUSED_CONV", "0") == "1"
    # UNet int8 convs: opt-in (BENCH_UNET_QUANT=int8) — unlike the embedder
    # quant knob this perturbs the mask itself (bounds in tests/test_models.py).
    unet_quant = _env_choice("BENCH_UNET_QUANT", "none", ("none", "int8"))
    # Pallas fused LN+GELU for the conv frontend: opt in with
    # BENCH_FUSED_LN=1. Default OFF — measured -10% end-to-end despite
    # winning standalone (docs/performance.md "Fused LN+GELU epilogue").
    fused_ln = os.environ.get("BENCH_FUSED_LN", "0") == "1"
    # Pallas fused framing+DFT for the forward STFT (BENCH_STFT_PALLAS=1);
    # measured at parity with the chunk-stream matmul-DFT default.
    stft_pallas = os.environ.get("BENCH_STFT_PALLAS", "0") == "1"
    from xai_audio_deepfakes_tpu.config import STFTConfig

    cfg = PipelineConfig(
        stft=STFTConfig(use_pallas=stft_pallas),
        embedder=EmbedderConfig(
            dtype="bfloat16", quant=quant, gelu=gelu, fused_conv=fused_conv,
            fused_ln_gelu=fused_ln,
        ),
        unet=UNetConfig(dtype="bfloat16", quant=unet_quant),
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))

    # batch 128 won the measured sweep on v5e: 109 clips/s @8, 120 @32,
    # 130 @64, 143 @128; 256 OOMs (bf16 FFN activations ~3 GB each)
    batch = batch or int(os.environ.get("BENCH_BATCH", "128"))
    clip_seconds = cfg.audio.clip_seconds
    wav = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )

    explain = pipe.jit_explain(decoder="unet")

    # warmup / compile. NOTE: on the tunneled single-chip platform here,
    # jax.block_until_ready returns before execution finishes; a
    # device-to-host copy of an existing output buffer is the reliable
    # barrier (the device stream executes in-order, so transferring the last
    # call's output waits for all queued work).
    out = explain(params, wav)
    _ = np.asarray(out.probs_relevant)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = explain(params, wav)
    _ = np.asarray(out.probs_relevant)
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    rtf = clips_per_sec * clip_seconds
    print(
        json.dumps(
            {
                "metric": "explanations/sec/chip",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s",
                "vs_baseline": round(rtf / 50.0, 3),
                "rtf": round(rtf, 1),
                "batch": batch,
                "quant": quant,
                "gelu": gelu,
                "fused_conv": fused_conv,
                "fused_ln_gelu": fused_ln,
                "unet_quant": unet_quant,
                "stft": "pallas" if stft_pallas else "matmul",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
