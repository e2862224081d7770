"""Untruncated XLS-R-2B forward on one chip — SURVEY §5's memory contingency.

The product pipeline consumes hidden_states[9], so the flagship ships the
9-layer truncation; `EmbedderConfig.xls_r_2b_full()` (48 layers, remat, bf16,
`config.py`) exists for full-model studies. This bench instantiates it for
real: full 48-layer forward at small batch, scan-layers, parameters
materialized bf16 directly on device (2.16 B params -> ~4.3 GB HBM; the f32
tree would be ~8.6 GB and leave little activation headroom on a 16 GB v5e).
Records clips/s or the OOM boundary; the 2-way tensor-parallel fallback is
exercised by `tests/test_train.py`'s mesh tests and the dryrun entry, and
pipeline parallelism by `tests/test_pipeline_parallel.py`.

    python benchmarks/full2b_bench.py             # batch 4
    FULL2B_BATCH=8 python benchmarks/full2b_bench.py
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

    from xai_audio_deepfakes_tpu.config import EmbedderConfig
    from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder
    from xai_audio_deepfakes_tpu.ops.normalize import zero_mean_unit_var_norm

    batch = int(os.environ.get("FULL2B_BATCH", "4"))
    iters = int(os.environ.get("FULL2B_ITERS", "5"))
    num_samples = 80000

    # output_layer = num_layers: the full-model readout is the LAST hidden
    # state; leaving the default 9 (< 48) would flip the scan's collect path
    # on and materialize a [48, B, T, 1920] per-layer stack of pure waste.
    cfg = dataclasses.replace(
        EmbedderConfig.xls_r_2b_full(), scan_layers=True, output_layer=48
    )
    enc = Wav2Vec2Encoder(cfg)

    # Materialize the 2.07 B-param tree directly ON the TPU: eval_shape the
    # init (no compute; fused_attention=False for the shape pass since the
    # Pallas kernel can't trace for CPU — HeadDense params are
    # nn.Dense-compatible, so the tree is identical), then one jitted
    # program fills bf16 leaves on device. This skips both the host-side
    # 2B-element RNG and a ~4.2 GB host->device transfer over the tunnel;
    # throughput on the MXU is data-independent, so constant-filled weights
    # time identically to trained ones.
    init_enc = Wav2Vec2Encoder(dataclasses.replace(cfg, fused_attention=False))
    shapes = jax.eval_shape(
        lambda k: init_enc.init(k, jnp.zeros((1, num_samples), jnp.float32)),
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

    params = materialize()

    @jax.jit
    def fwd(params, wav):
        return enc.apply(params, zero_mean_unit_var_norm(wav))

    wav = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((batch, num_samples))
            .astype(np.float32)
            * 0.1
        ),
        jax.devices()[0],
    )

    try:
        out = fwd(params, wav)  # compile
        np.asarray(out[:1, :1, :1])  # barrier (see bench.py note)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, wav)
        np.asarray(out[:1, :1, :1])
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "xls_r_2b_full fwd clips/sec/chip",
                    "value": round(batch * iters / dt, 3),
                    "unit": "clips/s",
                    "batch": batch,
                    "layers": cfg.num_layers,
                    "params_B": round(n_params / 1e9, 3),
                    "param_dtype": "bfloat16",
                    "out_shape": list(out.shape),
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
                    "metric": "xls_r_2b_full fwd clips/sec/chip",
                    "value": None,
                    "batch": batch,
                    "params_B": round(n_params / 1e9, 3),
                    "oom": oom,
                    "error": msg[:400],
                }
            )
        )
        raise SystemExit(1)


if __name__ == "__main__":
    main()
