"""Fused channel-LayerNorm + GELU Pallas kernel for the wav2vec2 conv
frontend.

Why: the round-2 device trace attributes ~25 ms of LN reduces + ~39 ms of
GELU (batch 3x128) to the conv frontend — XLA lowers each
`ConvLayerNormBlock`'s LN/GELU chain as a stats pass plus a normalize+GELU
pass over the largest activations in the serving graph ([3B, 16k, 512]
down the stride pyramid), i.e. ~2 HBM reads + 1 write where 1+1 suffice.
This kernel computes the f32-stats LayerNorm and the GELU per VMEM tile:
each activation row is read once and written once. Unlike the fused
conv+LN+GELU kernel (`ops/pallas_conv.py`, blocked on a TPU-runtime bug at
production shapes), this kernel needs no halo blocks, no strided selects,
and no MXU — it is a plain blocked row-reduce + elementwise program, the
shape of kernel Mosaic handles robustly.

Numerics: bit-identical formulation to `models/wav2vec2._LNf32Stats`
(f32 mean/var, centered two-pass, rsqrt(var+eps), f32 scale/bias, cast to
compute dtype) followed by GELU computed in f32 (the exp-only erf/tanh
formulations of `ops/pallas_conv._gelu_kernel`; Mosaic has no erf).

Backward: recompute VJP through the plain jnp reference (`ln_gelu_reference`)
— the same math XLA's autograd produces for the unfused path, so training
and attribution through the frontend need no hand-written transpose kernels.

Reference behavior being reproduced: HF Wav2Vec2LayerNormConvLayer's
LayerNorm+GELU epilogue, consumed via `classifier_embedder.py:13-18`.
Guide: /opt/skills/guides/pallas_guide.md.

Status (measured, docs/performance.md "Fused LN+GELU epilogue"): wins
1.1-1.2x standalone at every frontend shape but LOSES ~10% end-to-end —
in the real graph XLA fuses the LN/GELU chain with its conv producer/
consumer and the custom call is a fusion+layout barrier. Default OFF
(`EmbedderConfig.fused_ln_gelu`); kept selectable and parity-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from xai_audio_deepfakes_tpu.ops.pallas_conv import _gelu_kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports_ln_gelu(c: int) -> bool:
    """Channel dim must be lane-aligned (the LN reduce runs over full lanes;
    a ragged channel dim would fold padding into the statistics)."""
    return c % 128 == 0


def ln_gelu_reference(x, scale, bias, *, eps: float, gelu: str, dtype):
    """Oracle / CPU / backward formulation — exactly
    `_LNf32Stats.__call__` + `_gelu` from models/wav2vec2."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    normed = (
        xc * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
        + bias.astype(jnp.float32)
    ).astype(dtype)
    return jax.nn.gelu(normed, approximate=(gelu == "tanh"))


def _kernel_body(x_ref, g_ref, b_ref, out_ref, *, eps: float, gelu: str):
    x32 = x_ref[0].astype(jnp.float32)  # [T, C]
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    normed = (
        xc * jax.lax.rsqrt(var + eps) * g_ref[...] + b_ref[...]
    ).astype(out_ref.dtype)
    out_ref[0] = _gelu_kernel(normed, gelu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ln_gelu(x, scale, bias, eps: float, gelu: str, dtype=jnp.bfloat16,
            interpret: bool = False):
    """Fused channel-LN + GELU. x [B, L, C] -> [B, L, C] in `dtype`.

    scale/bias [C] f32 (the `_LNf32Stats` param tree). Dispatch: Pallas on
    TPU (or interpret=True anywhere), reference formulation elsewhere.
    Rows are independent (stats are per [b, l] row), so edge tiles whose
    padded rows hold unspecified bits cannot pollute valid rows.

    Call under jit only (all in-repo call sites are). The Pallas path
    donates x into the output (input_output_aliases) and its "XLA inserts
    a copy when x is still live" safety argument holds only for traced
    computations; an eager top-level TPU call could invalidate a caller's
    still-referenced x buffer.
    """
    if not (interpret or jax.default_backend() == "tpu"):
        return ln_gelu_reference(x, scale, bias, eps=eps, gelu=gelu, dtype=dtype)
    return _ln_gelu_pallas(
        x, scale, bias, eps=eps, gelu=gelu, dtype=dtype, interpret=interpret
    )


def _ln_gelu_pallas(x, scale, bias, *, eps, gelu, dtype, interpret,
                    block_t: int = 512):
    b, l, c = x.shape
    assert supports_ln_gelu(c), c
    t = block_t if l > block_t else _round_up(l, 16)
    nt = -(-l // t)
    g = scale.reshape(1, c).astype(jnp.float32)
    lb = bias.reshape(1, c).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel_body, eps=eps, gelu=gelu),
        out_shape=jax.ShapeDtypeStruct((b, l, c), dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
        # in-place: each grid step reads exactly the block it writes, so the
        # output can reuse the input buffer — without this the custom call
        # pins input AND output (2 x 6.3 GB at the serving frontend shape)
        # and XLA adds a layout copy on top. When the input is still live
        # (e.g. saved as a VJP residual) XLA inserts the copy itself, so
        # correctness never depends on the alias. Only valid when input and
        # output dtypes match (the serving case); x is passed UNCONVERTED
        # either way so the f32 LN statistics see the caller's precision,
        # exactly like ln_gelu_reference and the recompute-VJP backward.
        input_output_aliases={0: 0} if x.dtype == dtype else {},
        interpret=interpret,
    )(x, g, lb)


def _fwd(x, scale, bias, eps, gelu, dtype, interpret):
    return ln_gelu(x, scale, bias, eps, gelu, dtype, interpret), (x, scale, bias)


def _bwd(eps, gelu, dtype, interpret, res, ct):
    x, scale, bias = res

    def f(x, scale, bias):
        return ln_gelu_reference(x, scale, bias, eps=eps, gelu=gelu, dtype=dtype)

    _, vjp = jax.vjp(f, x, scale, bias)
    return vjp(ct)


ln_gelu.defvjp(_fwd, _bwd)
