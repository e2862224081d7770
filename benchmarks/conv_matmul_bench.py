"""Microbench: XLA native conv vs strided-slice matmul for the frontend.

The round-2 trace put the six 512->512 stride-2 frontend convs at 76 ms of
the 559 ms serving dispatch and ~4x off the bf16 MXU roofline
(docs/performance.md, trace-guided findings); the Pallas fused kernel that
was built to close the gap is blocked by an environment backend bug. This
probes a pure-XLA reformulation: a k-tap stride-s conv is exactly

    y[t] = sum_j x[s*t + j] @ w[j]        (j in 0..k-1)

i.e. k strided slices x[:, j::s] each matmul'd by the [Cin, Cout] tap and
summed in f32. Same FLOPs, but expressed as dots XLA tiles straight onto
the MXU instead of going through its 1-D conv lowering. No im2col HBM
blowup: the slices are views of the same activation.

Shapes: the post-layer-0 frontend at serving batch (the conv stack's FLOPs
are dominated by k3/s2 512ch layers at L 16k -> 500).

Usage: python benchmarks/conv_matmul_bench.py    (on the TPU)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def conv_native(x, w, stride=2):  # x [B,L,C], w [k,Cin,Cout]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_strided_matmul(x, w, stride=2):
    k = w.shape[0]
    lout = (x.shape[1] - k) // stride + 1
    acc = None
    for j in range(k):
        xj = jax.lax.slice_in_dim(
            x, j, j + stride * (lout - 1) + 1, stride, axis=1
        )
        yj = jax.lax.dot_general(
            xj, w[j],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = yj if acc is None else acc + yj
    return acc.astype(x.dtype)


def bench(fn, x, w, iters=30):
    f = jax.jit(fn)
    y = f(x, w)
    _ = float(y[0, 0, 0])  # dispatch barrier (see BASELINE.md timing note:
    # block_until_ready returns early on this tunneled platform; a
    # device->host transfer of a value dependent on the output is the barrier)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x, w)
    _ = float(y[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3, y


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}")
    # (B, L, k): layer-1..4 are k3/s2, layer-5..6 k2/s2; L halves each layer.
    cases = [
        (128, 15999, 3),   # serving batch, layer 1
        (128, 7999, 3),
        (128, 3999, 3),
        (128, 1999, 3),
        (128, 999, 2),
        (128, 499, 2),
        (48, 15999, 3),    # the shape the Pallas kernel was measured at
    ]
    c = 512
    for b, l, k in cases:
        x = jax.random.normal(key, (b, l, c), jnp.float32).astype(DT)
        w = (jax.random.normal(jax.random.PRNGKey(1), (k, c, c),
                               jnp.float32) * 0.02).astype(DT)
        t_n, y_n = bench(conv_native, x, w)
        t_m, y_m = bench(conv_strided_matmul, x, w)
        d = float(jnp.max(jnp.abs(y_n.astype(jnp.float32)
                                  - y_m.astype(jnp.float32))))
        flops = 2 * b * ((l - k) // 2 + 1) * k * c * c
        print(
            f"[{b},{l},{c}] k{k}: native {t_n:7.2f} ms "
            f"({flops/t_n/1e9:6.1f} TF/s)  matmul {t_m:7.2f} ms "
            f"({flops/t_m/1e9:6.1f} TF/s)  speedup {t_n/t_m:4.2f}x  "
            f"maxdiff {d:.3e}"
        )


if __name__ == "__main__":
    main()
