"""Fused conv1d + LayerNorm + GELU Pallas kernel for the wav2vec2 conv
frontend (stride-2 layers).

Why: XLA runs the conv (MXU) and the LN/GELU chain (VPU) of each
`ConvLayerNormBlock` as separate kernels with an HBM round trip between them
— measured 62 ms conv + ~40 ms LN + ~39 ms GELU at the 3x128 serving batch
(docs/performance.md). The early conv activations are the largest tensors in
the serving graph ([3B, 16k, 512]), so those extra passes are pure HBM
bandwidth. This kernel computes conv -> LN -> GELU per output tile entirely
in VMEM: the activation is read once and written once.

How the conv becomes tile-aligned matmuls (no im2col materialization —
docs/performance.md measured XLA's conv lowering ~3x faster than an
XLA-level im2col matmul, so the kernel must do better than that): for
stride 2 the input is viewed as [B, L/2, 2C] (a free reshape: samples
(2t, 2t+1) become the lane halves of row t). Then with taps W0..W{k-1}:

  k=2:  y[t] = x[2t] W0 + x[2t+1] W1             = xr[t] @ concat(W0, W1)
  k=3:  y[t] = xr[t] @ concat(W0, W1) + ev[t+1] @ W2

i.e. one (k=2) or two (k=3) MXU matmuls per tile at exactly the conv's
FLOPs, with every operand a static lane/sublane slice. The k=3 halo row
(ev[t+1] for the last row of a tile) comes from passing the SAME input array
under a second BlockSpec shifted one block — no manual DMA, so Pallas'
automatic double-buffering pipelines both streams.

The epilogue applies channel LayerNorm with f32 statistics and GELU in the
compute dtype — bit-identical formulation to `models/wav2vec2._LNf32Stats` +
`_gelu`.

Backward: flash-style recompute VJP — gradients are taken through the plain
jnp reference formulation (`conv_ln_gelu_reference`), the same math XLA's
autograd produces for the unfused path, so training/attribution through the
frontend needs no hand-written transpose kernels.

Reference behavior being reproduced: HF Wav2Vec2LayerNormConvLayer
(conv -> LN -> GELU), consumed via `classifier_embedder.py:13-18`.
Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports_fused_conv(kernel: int, stride: int, cin: int, cout: int) -> bool:
    """The kernel covers the six 512->512 stride-2 layers of XLS-R's conv
    stack (k3 x4, k2 x2). Layer 0 (cin=1, k10/s5) stays on XLA's native conv
    lowering — its input has one channel, so there is nothing to fuse a
    matmul over."""
    return stride == 2 and kernel in (2, 3) and cin % 128 == 0 and cout % 128 == 0


def conv_ln_gelu_reference(x, kernel, bias, ln_scale, ln_bias, *,
                           stride: int, eps: float, gelu: str, dtype):
    """Oracle / CPU / backward formulation: plain XLA conv + f32-stats LN +
    GELU. x [B, L, Cin], kernel [k, Cin, Cout]."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    y32 = y.astype(jnp.float32)
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    yc = y32 - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    normed = (yc * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(dtype)
    return jax.nn.gelu(normed, approximate=(gelu == "tanh"))


def _ln_gelu_epilogue(acc, b_ref, g_ref, lb_ref, out_ref, eps, gelu):
    """f32 accumulator -> +bias -> channel LN (f32 stats) -> GELU -> out
    (bit-identical formulation to models/wav2vec2._LNf32Stats + _gelu)."""
    acc = acc + b_ref[...].astype(jnp.float32)
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    yc = acc - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    normed = (
        yc * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
        + lb_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)
    out_ref[0] = jax.nn.gelu(normed, approximate=(gelu == "tanh"))


def _kernel_body_k2(xr_ref, w01_ref, b_ref, g_ref, lb_ref, out_ref, *,
                    eps: float, gelu: str):
    acc = jnp.dot(xr_ref[0], w01_ref[...], preferred_element_type=jnp.float32)
    _ln_gelu_epilogue(acc, b_ref, g_ref, lb_ref, out_ref, eps, gelu)


def _kernel_body_k3(xr_ref, xh_ref, w01_ref, w2_ref, b_ref, g_ref, lb_ref,
                    out_ref, *, cin: int, eps: float, gelu: str):
    xr = xr_ref[0]                      # [T, 2*Cin]
    acc = jnp.dot(xr, w01_ref[...], preferred_element_type=jnp.float32)
    # ev[t+1] for rows t..t+T-1: rows 1..T-1 of this block's even lanes
    # plus the halo row (row T, fetched by the small shifted second spec)
    ev1 = jnp.concatenate([xr[1:, :cin], xh_ref[0, :1, :]], axis=0)
    acc = acc + jnp.dot(ev1, w2_ref[...], preferred_element_type=jnp.float32)
    _ln_gelu_epilogue(acc, b_ref, g_ref, lb_ref, out_ref, eps, gelu)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def conv_ln_gelu(x, kernel, bias, ln_scale, ln_bias,
                 stride: int, eps: float, gelu: str, dtype=jnp.bfloat16,
                 interpret: bool = False):
    """Fused conv1d+LN+GELU. x [B, L, Cin] -> [B, Lout, Cout] in `dtype`.

    kernel [k, Cin, Cout] (flax nn.Conv layout), bias [Cout] (required —
    XLS-R conv_bias=True), ln_scale/ln_bias [Cout]. Dispatch: Pallas on TPU
    (or interpret=True anywhere), reference formulation elsewhere.
    """
    if not (interpret or jax.default_backend() == "tpu"):
        return conv_ln_gelu_reference(
            x, kernel, bias, ln_scale, ln_bias,
            stride=stride, eps=eps, gelu=gelu, dtype=dtype,
        )
    return _conv_ln_gelu_pallas(
        x, kernel, bias, ln_scale, ln_bias,
        stride=stride, eps=eps, gelu=gelu, dtype=dtype, interpret=interpret,
    )


def _conv_ln_gelu_pallas(x, kernel, bias, ln_scale, ln_bias, *,
                         stride, eps, gelu, dtype, interpret,
                         block_t: int = 256):
    k, cin, cout = kernel.shape
    assert supports_fused_conv(k, stride, cin, cout), (k, stride, cin, cout)
    b, l = x.shape[0], x.shape[1]
    lout = (l - k) // stride + 1

    # t multiple of 16 (bf16 sublane tile; also the k=3 halo-spec row unit)
    t = block_t if lout > block_t else _round_up(lout, 16)
    nt = -(-lout // t)

    # even/odd lane packing: samples (2u, 2u+1) become the lane halves of
    # pair-row u (a free reshape — the memory layout is unchanged). Keep the
    # trailing odd sample (it is ev[lout] for k=3) by padding x to even
    # length first; then pad pair rows to one block past the grid so the
    # k=3 shifted spec never reads out of range. Padded rows only influence
    # output rows >= lout, cropped below.
    l2 = (l + 1) // 2
    need_pairs = (nt + 1) * t
    xp = jnp.pad(x, ((0, 0), (0, 2 * l2 - l), (0, 0))).reshape(b, l2, 2 * cin)
    if need_pairs > l2:
        xp = jnp.pad(xp, ((0, 0), (0, need_pairs - l2), (0, 0)))

    w01 = kernel[:2].reshape(2 * cin, cout).astype(dtype)  # concat(W0,W1) rows
    bias2 = (bias if bias is not None else jnp.zeros((cout,), jnp.float32))
    bias2 = bias2.reshape(1, cout).astype(jnp.float32)
    g = ln_scale.reshape(1, cout).astype(jnp.float32)
    lb = ln_bias.reshape(1, cout).astype(jnp.float32)

    scalar_specs = [pl.BlockSpec((1, cout), lambda i, j: (0, 0))] * 3
    if k == 2:
        out = pl.pallas_call(
            functools.partial(_kernel_body_k2, eps=eps, gelu=gelu),
            out_shape=jax.ShapeDtypeStruct((b, nt * t, cout), dtype),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, t, 2 * cin), lambda i, j: (i, j, 0)),
                pl.BlockSpec((2 * cin, cout), lambda i, j: (0, 0)),
                *scalar_specs,
            ],
            out_specs=pl.BlockSpec((1, t, cout), lambda i, j: (i, j, 0)),
            interpret=interpret,
        )(xp, w01, bias2, g, lb)
    else:
        w2 = kernel[2].astype(dtype)
        out = pl.pallas_call(
            functools.partial(_kernel_body_k3, cin=cin, eps=eps, gelu=gelu),
            out_shape=jax.ShapeDtypeStruct((b, nt * t, cout), dtype),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, t, 2 * cin), lambda i, j: (i, j, 0)),
                # the same array again: a SMALL block (16 rows, even lanes
                # only) whose first row is pair row (j+1)*t — the halo —
                # so the halo costs ~16/t extra input traffic, not 2x
                pl.BlockSpec(
                    (1, 16, cin), lambda i, j: (i, (j + 1) * (t // 16), 0)
                ),
                pl.BlockSpec((2 * cin, cout), lambda i, j: (0, 0)),
                pl.BlockSpec((cin, cout), lambda i, j: (0, 0)),
                *scalar_specs,
            ],
            out_specs=pl.BlockSpec((1, t, cout), lambda i, j: (i, j, 0)),
            interpret=interpret,
        )(xp, xp, w01, w2, bias2, g, lb)
    return out[:, :lout, :]


def _fwd(x, kernel, bias, ln_scale, ln_bias, stride, eps, gelu, dtype,
         interpret):
    return (
        conv_ln_gelu(x, kernel, bias, ln_scale, ln_bias,
                     stride, eps, gelu, dtype, interpret),
        (x, kernel, bias, ln_scale, ln_bias),
    )


def _bwd(stride, eps, gelu, dtype, interpret, res, ct):
    x, kernel, bias, ln_scale, ln_bias = res
    def f(x, kernel, bias, ln_scale, ln_bias):
        return conv_ln_gelu_reference(
            x, kernel, bias, ln_scale, ln_bias,
            stride=stride, eps=eps, gelu=gelu, dtype=dtype,
        )
    _, vjp = jax.vjp(f, x, kernel, bias, ln_scale, ln_bias)
    return vjp(ct)


conv_ln_gelu.defvjp(_fwd, _bwd)
