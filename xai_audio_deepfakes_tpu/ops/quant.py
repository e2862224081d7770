"""Dynamic int8 quantization for MXU matmuls (serving path).

The reference has no quantization at all (its embedder runs fp32 CUDA,
`classifier_embedder.py:13-18`); this is a TPU-native addition: v5e's MXU
executes int8 x int8 -> int32 at ~2x the bf16 FLOP rate, so the embedder's
transformer matmuls — the dominant cost of the explain path (SURVEY §3.1
hot spots) — can nearly double in throughput at serving time.

Scheme (standard dynamic symmetric quantization):
  * activations: per-token (last-axis) scale  s_x = max|x| / 127
  * weights:     per-output-channel scale     s_w = max|w| / 127
  * y = (x_q @ w_q) * (s_x * s_w) + b, accumulated in int32.

Weight quantization happens *in-graph* — it is O(K*N) elementwise against an
O(M*K*N) matmul (M = B*T ~ 1e5 rows on the serving path), so folding it into
the forward costs nothing measurable while keeping the param tree f32 and
every checkpoint/import path unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axis) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (int8 values, f32 scale with keepdims along `axis`)."""
    x = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_matmul_prequant(
    xq: jnp.ndarray, sx: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Pre-quantized activations (xq int8 [..., K], sx f32 [..., 1]) @ w
    [K, N] f32 -> [..., N] f32. Lets several projections off one tensor
    (q/k/v off the same LN output) share a single activation-quantize pass —
    the quantize is HBM-bound, so deduplicating it matters more than its
    FLOPs."""
    wq, sw = quantize_symmetric(w, axis=0)           # [K, N],  [1, N]
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw)


def int8_matmul_static(
    xq: jnp.ndarray, s_act: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """STATIC per-channel activation scales, folded into the weight.

    xq int8 [..., K] pre-quantized as round(x / s_act) with CALIBRATED
    s_act f32 [K] (one scale per contracted channel, not per token):
        y = sum_k xq[k] * s_act[k] * w[k, n]
          = (xq @ quantize(w * s_act[:, None])) * sw
    The fold rides the existing O(K*N) in-graph weight quantize, so
    relative to dynamic int8 this removes the whole per-token max-reduce
    pass over the activation AND the per-token rescale in the epilogue —
    while keeping per-CHANNEL activation resolution (a per-tensor static
    scale measured probability drift up to 0.3 at full geometry;
    docs/performance.md round 5)."""
    wq, sw = quantize_symmetric(w * s_act[:, None], axis=0)  # [K,N], [1,N]
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sw


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] (any float dtype) @ w [K, N] (f32) -> [..., N] f32.

    Contracts on the MXU in int8 with int32 accumulation; rescales by the
    outer product of the dynamic per-token and per-channel scales.
    """
    xq, sx = quantize_symmetric(x, axis=-1)          # [..., K], [..., 1]
    return int8_matmul_prequant(xq, sx, w)


def int8_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    padding="VALID",
) -> jnp.ndarray:
    """NHC x [B,L,Cin] * HIO kernel [k,Cin,Cout] -> f32 [B,L',Cout],
    contracted on the MXU in int8 with int32 accumulation.

    For the wav2vec2 conv frontend's 512-channel k3 layers — the regime
    where the UNet's int8 rejection (4-64 channel widths, BASELINE.md
    round 3) does not apply. Scales: per-SAMPLE for activations (axis
    (1, 2) — the conv mixes time steps so per-token scales don't apply,
    and per-sample keeps each clip's output independent of its batch
    neighbors under the serve-api batcher), per-output-channel for
    weights. Serving-only: `jnp.round` has zero gradient.
    """
    xq, sx = quantize_symmetric(x, axis=(1, 2))        # [B,L,C],  [B,1,1]
    kq, sk = quantize_symmetric(kernel, axis=(0, 1))   # [k,I,O],  [1,1,O]
    acc = jax.lax.conv_general_dilated(
        xq, kq, (stride,), padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sk)


def int8_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: tuple = (1, 1),
    padding="SAME",
    kernel_dilation: tuple = (1, 1),
) -> jnp.ndarray:
    """NHWC x [B,H,W,Cin] * HWIO kernel [kh,kw,Cin,Cout] -> f32 [B,H',W',Cout],
    contracted on the MXU in int8 with int32 accumulation.

    Measured on v5e: a 3x3 384->256 conv at the UNet decoder's geometry runs
    188 TOP/s int8 vs 153 TFLOP/s bf16 (+23%) — the int8 conv lowering does
    use the MXU's double-rate path, just not at the full 2x of the matmul
    case. Scales: per-sample for activations (axis (1,2,3) — one scale per
    image keeps the rescale a rank-1 broadcast), per-output-channel for
    weights (axis (0,1,2)). Serving-only: `jnp.round` has zero gradient.
    """
    xq, sx = quantize_symmetric(x, axis=(1, 2, 3))     # [B,H,W,C], [B,1,1,1]
    kq, sk = quantize_symmetric(kernel, axis=(0, 1, 2))  # [kh,kw,I,O], [1,1,1,O]
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        rhs_dilation=kernel_dilation,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sk.reshape(1, 1, 1, -1))
