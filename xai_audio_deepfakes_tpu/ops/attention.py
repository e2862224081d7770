"""Fused multi-head attention for the SSL embedder (Pallas TPU kernel).

The jnp path in `models/wav2vec2.EncoderLayer` materializes the attention
scores and probabilities in HBM: at the serving batch (3x128 clips fused,
16 heads, 249 frames) that is ~1.5 GB of f32 scores plus ~0.8 GB of bf16
probs written AND re-read per transformer layer — measured ~12 ms/layer for
matmuls that need ~1 ms of MXU time. The reference hits the same wall on
CUDA and works around it by *disabling* fused SDP so autograd stays happy
(`train_addvisor.py:21-23`); here the fused kernel is differentiable via a
flash-style recompute VJP instead.

Layout strategy (the part that actually makes it fast): XLS-R's head_dim is
120, which is not lane-aligned, and the natural activation layout
[B, T, NH, HD] tiles its two minor dims (NH, HD) — a kernel reading [T, HD]
matrices from it pays a relayout per head, and physically transposing to a
heads-major layout costs ~3 GB of HBM traffic per dispatch (both variants
measured SLOWER than the einsum). Instead the *projection weights* are
padded per head from 120 to 128 columns (zeros — free at the weight level,
see `models/wav2vec2.HeadDense`), so q/k/v arrive as [B, T, NH*128] where
every head is a static, tile-aligned lane slice. The whole [T, T] score
tile for one head then fits in VMEM (the sequence is a fixed 249 frames —
SURVEY §2.3's hop-322 alignment contract), so no online softmax is needed:
qk^T -> masked softmax -> pv runs entirely in VMEM and only the context
ever reaches HBM.

Padding safety: q/k/v's pad lanes are exact zeros (zero weight columns and
zero bias), so they add nothing to the contractions. The T axis is padded
249 -> 256 per block; that padding holds unspecified bits, which `where`
masks neutralize (`where` selects, it never multiplies — NaN-safe).

Backward = recompute: probabilities are rebuilt from (q, k, v) with the
plain einsum formulation and differentiated in f32 — the same math the
unfused path's autograd produces, while storing only the (q, k, v)
residuals instead of the [B, NH, T, T] probs.

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


def head_pad_dim(hd: int) -> int:
    """Lane-aligned head dim the fused path pads to."""
    return _round_up(hd, 128)


def attention_reference(q, k, v):
    """Oracle / CPU path: q, k, v [B, T, NH, HD] (q pre-scaled) -> ctx
    [B, T, NH, HD]. f32 softmax, probs cast back to the compute dtype —
    bit-for-bit the formulation inlined in EncoderLayer's unfused branch."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _make_attention_call(
    b: int, t: int, nh: int, hdp: int, g: int, dtype, interpret: bool
):
    tp = _round_up(t, 128)

    def kernel(q_ref, k_ref, v_ref, out_ref):
        col_t = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (tp, hdp), 0)
        neg_inf = jnp.float32(-1e30)

        for i in range(g):  # static unroll: every ref slice is tile-aligned
            sl = slice(i * hdp, (i + 1) * hdp)
            qh = q_ref[0, :, sl]
            # T-padding rows hold unspecified bits (possibly NaN): probs for
            # them are exactly 0, but 0 * NaN = NaN — zero them at load
            kh = jnp.where(row_t < t, k_ref[0, :, sl], 0)
            vh = jnp.where(row_t < t, v_ref[0, :, sl], 0)
            s = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(col_t < t, s, neg_inf)
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))  # <= 1, bf16-safe
            # normalize AFTER the pv matmul: the divide runs on the [T, HDP]
            # context tile instead of the [T, T] prob tile (VPU-bound kernel)
            ctx = jnp.dot(p.astype(dtype), vh, preferred_element_type=jnp.float32)
            ctx = ctx / jnp.sum(p, axis=-1, keepdims=True)
            out_ref[0, :, sl] = ctx.astype(dtype)

    spec = pl.BlockSpec(
        (1, tp, g * hdp), lambda bi, hi: (bi, 0, hi), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nh // g),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, nh * hdp), dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * tp * tp * hdp,
            bytes_accessed=4 * b * nh * t * hdp * (2 if dtype == jnp.bfloat16 else 4),
            transcendentals=b * nh * tp * tp,
        ),
        interpret=interpret,
    )


def attention_pallas(q, k, v, nh: int, interpret: bool = False):
    """q, k, v [B, T, NH*HDP] with HDP lane-aligned (pad lanes exact zeros,
    q pre-scaled) -> ctx [B, T, NH*HDP]."""
    b, t, f = q.shape
    hdp = f // nh
    g = next(gg for gg in (16, 8, 4, 2, 1) if nh % gg == 0)
    call = _make_attention_call(b, t, nh, hdp, g, q.dtype, interpret)
    return call(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def attention(q, k, v, nh: int, interpret: bool = False):
    """Differentiable fused attention on head-padded activations
    [B, T, NH*HDP], with automatic platform dispatch: Pallas kernel on TPU,
    the einsum oracle elsewhere (tests force the kernel on CPU via
    `interpret=True`)."""
    if interpret or jax.default_backend() == "tpu":
        return attention_pallas(q, k, v, nh, interpret=interpret)
    b, t, f = q.shape
    heads = lambda x: x.reshape(b, t, nh, f // nh)
    return attention_reference(heads(q), heads(k), heads(v)).reshape(b, t, f)


def _attention_fwd(q, k, v, nh, interpret):
    return attention(q, k, v, nh, interpret), (q, k, v)


def _attention_bwd(nh, interpret, res, ct):
    q, k, v = res
    b, t, f = q.shape
    heads = lambda x: x.astype(jnp.float32).reshape(b, t, nh, f // nh)
    qf, kf, vf, g = heads(q), heads(k), heads(v), heads(ct)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, vf)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    flat = lambda x, like: x.reshape(b, t, f).astype(like.dtype)
    return flat(dq, q), flat(dk, k), flat(dv, v)


attention.defvjp(_attention_fwd, _attention_bwd)
