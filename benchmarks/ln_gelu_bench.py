"""Microbench: XLA LN+GELU (stats pass + normalize/GELU pass) vs the fused
Pallas single-pass kernel (`ops/pallas_ln_gelu.py`) at the wav2vec2
conv-frontend shapes.

The round-2 trace attributes ~25 ms LN reduces + ~39 ms GELU of the 559 ms
serving dispatch to these chains; the fused kernel reads each activation
row once and writes once (theoretical ceiling ~1.5-2x on this op).

Usage: python benchmarks/ln_gelu_bench.py [--batch 384] [--iters 30]
Prints one JSON line per shape with ms + achieved GB/s for both paths.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xai_audio_deepfakes_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from xai_audio_deepfakes_tpu.ops.pallas_ln_gelu import ln_gelu, ln_gelu_reference

# conv-frontend output lengths down the stride pyramid (B = 3 x serving 128)
FRONTEND_L = [15999, 7999, 3999, 1999, 999, 499, 249]


def bench(fn, shape, iters):
    # Three documented TPU-relay hazards shape this harness: (1) a Python
    # timing loop queues every iteration's 6.3 GB output -> OOM, so the
    # loop lives INSIDE jit (chained y = fn(y)); (2) the input is generated
    # IN-GRAPH so it is a temp the Pallas kernel's in-place alias can
    # actually consume (an argument buffer must be preserved -> extra
    # 6.3 GB copy -> OOM at the largest shape); (3) the chain returns a
    # TINY slice -- the full output would be a multi-GB D2H through the
    # ~25 MB/s tunnel, and an out-of-jit `out.ravel()[0]` is itself a new
    # remotely-compiled program.
    chain = jax.jit(
        lambda key: jax.lax.fori_loop(
            0, iters, lambda i, v: fn(v),
            jax.random.normal(key, shape, jnp.bfloat16),
        )[:1, :1, :1]
    )
    key = jax.random.PRNGKey(0)
    # tunnel-safe barrier: device stream is in-order, a D2H transfer of an
    # existing (tiny) output waits for all queued work
    _ = np.asarray(chain(key))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(chain(key))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--gelu", default="tanh", choices=["tanh", "exact"])
    ap.add_argument("--channels", type=int, default=512)
    args = ap.parse_args()

    c = args.channels
    key = jax.random.PRNGKey(0)
    g = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (c,), jnp.float32)
    lb = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)

    ref = jax.jit(
        lambda x: ln_gelu_reference(x, g, lb, eps=1e-5, gelu=args.gelu,
                                    dtype=jnp.bfloat16)
    )
    fused = jax.jit(
        lambda x: ln_gelu(x, g, lb, 1e-5, args.gelu, jnp.bfloat16)
    )

    for l in FRONTEND_L:
        shape = (args.batch, l, c)
        nbytes = args.batch * l * c * 2  # one read or write of the activation
        t_ref = bench(ref, shape, args.iters)
        t_fused = bench(fused, shape, args.iters)
        # parity check only where three full buffers fit comfortably (the
        # formulation is shape-independent; interpret-mode tests cover the
        # edge tiles) — streamed in ONE jit so the f32 diff never
        # materializes
        maxdiff = None
        if nbytes < 2 << 30:
            maxdiff = float(jax.jit(
                lambda k: jnp.max(jnp.abs(
                    ref(jax.random.normal(k, shape, jnp.bfloat16))
                    .astype(jnp.float32)
                    - fused(jax.random.normal(k, shape, jnp.bfloat16))
                    .astype(jnp.float32)
                ))
            )(key))
        print(json.dumps({
            "shape": list(shape),
            "xla_ms": round(t_ref, 3),
            "pallas_ms": round(t_fused, 3),
            "speedup": round(t_ref / t_fused, 3),
            # achieved bandwidth assuming the ideal 1 read + 1 write
            "xla_gbs_ideal": round(2 * nbytes / t_ref / 1e6, 1),
            "pallas_gbs_ideal": round(2 * nbytes / t_fused / 1e6, 1),
            "maxdiff": maxdiff,
        }), flush=True)


if __name__ == "__main__":
    main()
