"""Microbench: bf16 XLA conv vs int8 conv for the embedder frontend.

Round-5 ask (VERDICT #3): the conv frontend is ~193 ms of the 638 ms
embedder dispatch and the last big bf16 island on the serving path. The
UNet's int8 rejection (BASELINE.md round 3) was measured at 4-64-channel
widths; the frontend's 512-channel k3/s2 layers are a different regime —
this measures it: `ops/quant.int8_conv1d` (per-sample activation scale +
per-output-channel weight scale, int32 MXU accumulation) against the bf16
native conv at every frontend shape, standalone. The end-to-end number
comes from `BENCH_CONV_QUANT=int8 python bench.py`.

Usage: python benchmarks/conv_int8_bench.py    (on the TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def conv_native(x, w, stride=2):  # x [B,L,C], w [k,Cin,Cout]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_int8(x, w, stride=2):
    from xai_audio_deepfakes_tpu.ops.quant import int8_conv1d

    return int8_conv1d(x, w, stride=stride).astype(x.dtype)


def bench(fn, x, w, stride, iters=30):
    f = jax.jit(lambda a, b: fn(a, b, stride))
    y = f(x, w)
    _ = float(y[0, 0, 0])  # dispatch barrier (see BASELINE.md timing note)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x, w)
    _ = float(y[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3, y


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}")
    # (B, L, k): layer-1..4 are k3/s2, layer-5..6 k2/s2; L halves per layer.
    cases = [
        (128, 15999, 3),   # serving batch, layer 1
        (128, 7999, 3),
        (128, 3999, 3),
        (128, 1999, 3),
        (128, 999, 2),
        (128, 499, 2),
    ]
    c = 512
    for b, l, k in cases:
        x = jax.random.normal(key, (b, l, c), jnp.float32).astype(DT)
        w = (jax.random.normal(jax.random.PRNGKey(1), (k, c, c),
                               jnp.float32) * 0.02).astype(DT)
        t_n, y_n = bench(conv_native, x, w, 2)
        t_q, y_q = bench(conv_int8, x, w, 2)
        yn = y_n.astype(jnp.float32)
        rel = float(
            jnp.linalg.norm(yn - y_q.astype(jnp.float32))
            / jnp.linalg.norm(yn)
        )
        flops = 2 * b * ((l - k) // 2 + 1) * k * c * c
        print(
            f"[{b},{l},{c}] k{k}: bf16 {t_n:7.2f} ms "
            f"({flops/t_n/1e9:6.1f} TF/s)  int8 {t_q:7.2f} ms "
            f"({flops/t_q/1e9:6.1f} TOP/s)  speedup {t_n/t_q:4.2f}x  "
            f"relerr {rel:.3e}"
        )


if __name__ == "__main__":
    main()
