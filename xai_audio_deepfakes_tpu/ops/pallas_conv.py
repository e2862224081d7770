"""Fused conv1d + LayerNorm + GELU Pallas kernel for the wav2vec2 conv
frontend (stride-2 layers).

Why: XLA runs the conv (MXU) and the LN/GELU chain (VPU) of each
`ConvLayerNormBlock` as separate kernels with an HBM round trip between them
— measured 62 ms conv + ~40 ms LN + ~39 ms GELU at the 3x128 serving batch
(docs/performance.md). The early conv activations are the largest tensors in
the serving graph ([3B, 16k, 512]), so those extra passes are pure HBM
bandwidth. This kernel computes conv -> LN -> GELU per output tile entirely
in VMEM: the activation is read once and written once.

Memory shape: the kernel reads the input in its NATURAL [B, L, C] layout.
(A first version packed sample pairs into lanes, [B, L/2, 2C], to run the
conv at exactly its FLOPs — but on TPU that reshape is a tiled-layout
relayout, i.e. a full HBM copy of the largest activation in the graph:
batch-128 serving went 15.7G -> 17.6G and OOM'd. Recorded as a negative
result; the fix is to keep the layout and spend MXU instead of HBM.)

In-kernel formulation ("full-phase" matmuls): with the input tile x_ext
[2T+k-1, C] (2T rows + a halo fetched by a small second BlockSpec over the
same array), compute per tap

    m_k = x_ext @ W_k                  # [2T+2, Cout] on the MXU
    c[r] = m_0[r] + m_1[r+1] + m_2[r+2]  (static sublane slices)
    y[t] = c[2t]                       # stride-2 sublane select, in VMEM

This does ~2x the conv's MXU FLOPs (odd phases are computed and dropped) —
v5e has the MXU headroom (the conv stack is ~24 ms of MXU at peak), while
HBM is the measured bottleneck; trading FLOPs for bandwidth is the right
direction on this hardware. All slices are static; the only non-tile-aligned
ops are VMEM-local.

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7 — below bf16
    resolution): Mosaic has no erf/erfc lowering, only exp."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _tanh_exp(y):
    """tanh from exp only (numerically stable via -2|y|)."""
    e = jnp.exp(-2.0 * jnp.abs(y))
    return jnp.sign(y) * (1.0 - e) / (1.0 + e)


def _gelu_kernel(x, kind: str):
    """GELU usable inside a Mosaic kernel (exp-only formulation of the same
    math as models/wav2vec2._gelu). Computed in f32, cast by the caller."""
    x32 = x.astype(jnp.float32)
    if kind == "tanh":
        inner = 0.7978845608028654 * (x32 + 0.044715 * x32 * x32 * x32)
        return (0.5 * x32 * (1.0 + _tanh_exp(inner))).astype(x.dtype)
    return (0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))).astype(x.dtype)


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


def _kernel_body(xb_ref, xh_ref, w_ref, sel_ref, b_ref, g_ref, lb_ref,
                 out_ref, *, k: int, t: int, l: int, eps: float, gelu: str):
    # x_ext: 2T rows of this tile + the first rows of the halo block
    x_ext = jnp.concatenate([xb_ref[0], xh_ref[0, : k - 1, :]], axis=0)
    # full-phase taps: m_k[r] = x_ext[r] @ W_k, shifted-added into the
    # stride-1 conv c, of which only even rows survive
    c = None
    for tap in range(k):
        m = jnp.dot(
            x_ext, w_ref[tap], preferred_element_type=jnp.float32
        )  # [2T + k - 1, Cout]
        sl = m[tap : tap + 2 * t]  # offset sublane slice (contiguous — ok)
        c = sl if c is None else c + sl
    # Edge blocks read past L: those rows hold unspecified bits (NaN in
    # interpret). The select below is a MATMUL — 0 * NaN = NaN would poison
    # every output row — so zero the invalid c rows first (`where` selects,
    # it never multiplies).
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    lim = l - k + 1 - 2 * t * pl.program_id(1)
    c = jnp.where(row < lim, c, 0.0)
    # even-row select via a one-hot [T, 2T] matmul: Mosaic rejects strided
    # sublane slices (they lower to an unsupported gather), and one extra
    # MXU pass (~17% of the tap MACs) is cheaper than any VPU relayout.
    # Selecting in the compute dtype reproduces the unfused path's numerics
    # exactly (the XLA conv emits its output in the compute dtype too).
    dt = out_ref.dtype
    acc = jnp.dot(
        sel_ref[...], c.astype(dt), preferred_element_type=jnp.float32
    ) + b_ref[...].astype(jnp.float32)  # [T, Cout]
    # channel LayerNorm, f32 stats (models/wav2vec2._LNf32Stats) + GELU
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    yc = acc - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    normed = (
        yc * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
        + lb_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)
    out_ref[0] = _gelu_kernel(normed, gelu)


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

    # t multiple of 8 (f32 sublane tile; the halo spec's row unit is 16)
    t = block_t if lout > block_t else _round_up(lout, 16)
    nt = -(-lout // t)

    x = x.astype(dtype)
    # No host-side reshape/pad of x: the input stays in its natural layout
    # (any repack is a full HBM relayout copy of the graph's largest
    # activation — measured OOM at serving batch, see module doc). Edge
    # blocks whose rows run past L are clamped by Pallas; they only feed
    # output rows >= lout, cropped below.
    w = kernel.astype(dtype)  # [k, Cin, Cout]
    sel = (
        jnp.zeros((t, 2 * t), dtype)
        .at[jnp.arange(t), 2 * jnp.arange(t)]
        .set(1)
    )
    bias2 = (bias if bias is not None else jnp.zeros((cout,), jnp.float32))
    bias2 = bias2.reshape(1, cout).astype(jnp.float32)
    g = ln_scale.reshape(1, cout).astype(jnp.float32)
    lb = ln_bias.reshape(1, cout).astype(jnp.float32)

    # out_shape is EXACTLY lout rows: Pallas masks edge-block writes past the
    # array, and a post-hoc `out[:, :lout]` crop would be a full copy of the
    # second-largest activation in the graph (measured RESOURCE_EXHAUSTED at
    # serving batch).
    out = pl.pallas_call(
        functools.partial(_kernel_body, k=k, t=t, l=l, eps=eps, gelu=gelu),
        out_shape=jax.ShapeDtypeStruct((b, lout, cout), dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 2 * t, cin), lambda i, j: (i, j, 0)),
            # same array again: a SMALL block whose first rows are the
            # halo samples 2(j+1)t .. — costs ~16/2t extra input traffic
            pl.BlockSpec((1, 16, cin), lambda i, j: (i, (j + 1) * (2 * t // 16), 0)),
            pl.BlockSpec((k, cin, cout), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((t, 2 * t), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(x, x, w, sel, bias2, g, lb)
    return out


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
