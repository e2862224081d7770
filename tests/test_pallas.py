"""Pallas fused STFT/iSTFT kernels vs the jnp oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xai_audio_deepfakes_tpu.config import STFTConfig
from xai_audio_deepfakes_tpu.ops.pallas_stft import istft_pallas, stft_pallas
from xai_audio_deepfakes_tpu.ops.stft import istft, stft

CFG = STFTConfig()


def test_stft_pallas_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((2, 80000)).astype(np.float32) * 0.3)
    re_p, im_p = stft_pallas(x, CFG, interpret=True)
    re_j, im_j = stft(x, CFG)
    assert re_p.shape == re_j.shape == (2, 513, 249)
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_j), atol=2e-4)


def test_istft_pallas_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32) * 0.3)
    re, im = stft(x, CFG)
    mask = jnp.asarray(rng.uniform(size=re.shape).astype(np.float32))
    y_p = istft_pallas(re * mask, im * mask, CFG, length=80000, interpret=True)
    y_j = istft(re * mask, im * mask, CFG, length=80000)
    assert y_p.shape == (1, 80000)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_j), atol=2e-4)


def test_pallas_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32) * 0.3)
    re, im = stft_pallas(x, CFG, interpret=True)
    y = istft_pallas(re, im, CFG, length=80000, interpret=True)
    assert float(jnp.mean((y - x) ** 2)) < 1e-6


def test_fused_vjp_matches_jnp(rng):
    import jax

    from xai_audio_deepfakes_tpu.ops.pallas_stft import make_fused_istft, make_fused_stft

    x = jnp.asarray(rng.standard_normal((1, 80000)).astype(np.float32) * 0.3)
    f_stft = make_fused_stft(CFG, interpret=True)
    f_istft = make_fused_istft(CFG, length=80000, interpret=True)

    def loss_fused(x):
        re, im = f_stft(x)
        y = f_istft(re * 0.5, im * 0.5)
        return jnp.sum(y**2)

    def loss_jnp(x):
        re, im = stft(x, CFG)
        y = istft(re * 0.5, im * 0.5, CFG, length=80000)
        return jnp.sum(y**2)

    g_f = jax.grad(loss_fused)(x)
    g_j = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_j), atol=2e-3)


# ---------------------------------------------------------------------------
# fused attention (ops/attention.py)
# ---------------------------------------------------------------------------


def _padded_qkv(rng, b, t, nh, hd, hdp):
    """Head-padded activations as HeadDense produces them: [B, T, NH*HDP]
    with exact-zero pad lanes."""
    qkv = []
    for _ in range(3):
        x = rng.standard_normal((b, t, nh, hd)).astype(np.float32) * 0.2
        xp = np.zeros((b, t, nh, hdp), np.float32)
        xp[..., :hd] = x
        qkv.append((jnp.asarray(x), jnp.asarray(xp.reshape(b, t, nh * hdp))))
    return qkv


def test_attention_pallas_matches_reference(rng):
    from xai_audio_deepfakes_tpu.ops.attention import (
        attention_pallas,
        attention_reference,
        head_pad_dim,
    )

    # production-like dims: T=249 frames, head_dim 120 padded to 128
    b, t, nh, hd = 2, 249, 4, 120
    hdp = head_pad_dim(hd)
    (q, qp), (k, kp), (v, vp) = _padded_qkv(rng, b, t, nh, hd, hdp)
    out_p = np.asarray(attention_pallas(qp, kp, vp, nh, interpret=True))
    out_p = out_p.reshape(b, t, nh, hdp)
    out_r = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(out_p[..., :hd], out_r, atol=1e-5)
    # pad lanes stay exactly zero (out_proj's padded rows rely on it only
    # for cleanliness — they multiply by zero weights anyway)
    np.testing.assert_array_equal(out_p[..., hd:], 0.0)


def test_attention_pallas_small_t(rng):
    from xai_audio_deepfakes_tpu.ops.attention import (
        attention_pallas,
        attention_reference,
        head_pad_dim,
    )

    b, t, nh, hd = 1, 25, 2, 16  # tiny-config geometry
    hdp = head_pad_dim(hd)
    (q, qp), (k, kp), (v, vp) = _padded_qkv(rng, b, t, nh, hd, hdp)
    out_p = np.asarray(attention_pallas(qp, kp, vp, nh, interpret=True))
    out_p = out_p.reshape(b, t, nh, hdp)
    np.testing.assert_allclose(
        out_p[..., :hd], np.asarray(attention_reference(q, k, v)), atol=1e-5
    )


def test_attention_vjp_matches_autograd(rng):
    import jax

    from xai_audio_deepfakes_tpu.ops.attention import attention, head_pad_dim

    b, t, nh, hd = 1, 37, 2, 24
    hdp = head_pad_dim(hd)
    (_, qp), (_, kp), (_, vp) = _padded_qkv(rng, b, t, nh, hd, hdp)

    def loss_fused(q, k, v):
        return jnp.sum(attention(q, k, v, nh, True) ** 2)

    def loss_ref(q, k, v):
        from xai_audio_deepfakes_tpu.ops.attention import attention_reference

        heads = lambda x: x.reshape(b, t, nh, hdp)
        return jnp.sum(attention_reference(heads(q), heads(k), heads(v)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qp, kp, vp)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qp, kp, vp)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_head_dense_padding_matches_dense(rng):
    """HeadDense with head_pad produces the plain Dense result in the real
    lanes and exact zeros in the pad lanes; the pad_axis=0 variant folds the
    padded context back without touching the result."""
    import jax

    from xai_audio_deepfakes_tpu.models.wav2vec2 import HeadDense

    h, nh, hd = 48, 4, 12
    hdp = 128
    x = jnp.asarray(rng.standard_normal((2, 5, h)).astype(np.float32))
    mod = HeadDense(h, h, dtype=jnp.float32, head_pad=(nh, hd, hdp), pad_axis=1)
    params = mod.init(jax.random.PRNGKey(0), x)
    yp = np.asarray(mod.apply(params, x)).reshape(2, 5, nh, hdp)
    plain = HeadDense(h, h, dtype=jnp.float32)
    y = np.asarray(plain.apply(params, x)).reshape(2, 5, nh, hd)
    np.testing.assert_allclose(yp[..., :hd], y, rtol=1e-6)
    np.testing.assert_array_equal(yp[..., hd:], 0.0)

    # out-proj variant: padded input rows carry zero weights
    ctx_p = jnp.asarray(yp.reshape(2, 5, nh * hdp))
    out_mod = HeadDense(h, h, dtype=jnp.float32, head_pad=(nh, hd, hdp), pad_axis=0)
    out_params = out_mod.init(jax.random.PRNGKey(1), ctx_p)
    got = np.asarray(out_mod.apply(out_params, ctx_p))
    ref = np.asarray(
        HeadDense(h, h, dtype=jnp.float32).apply(
            out_params, jnp.asarray(y.reshape(2, 5, h))
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_encoder_layer_fused_attention_cpu_fallback(rng):
    """On CPU the embedder keeps the einsum formulation, so fused_attention
    on/off must agree exactly (params are interchangeable either way)."""
    import dataclasses

    import jax

    from xai_audio_deepfakes_tpu.config import EmbedderConfig
    from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder

    cfg_on = EmbedderConfig.tiny()
    cfg_off = dataclasses.replace(cfg_on, fused_attention=False)
    wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    params = Wav2Vec2Encoder(cfg_off).init(jax.random.PRNGKey(0), wav)
    out_on = Wav2Vec2Encoder(cfg_on).apply(params, wav)
    out_off = Wav2Vec2Encoder(cfg_off).apply(params, wav)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off), atol=0.0)


# fused conv frontend (ops/pallas_conv.py)


def _conv_args(rng, k, cin=128, cout=128):
    kern = (rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.05)
    bias = rng.standard_normal((cout,)).astype(np.float32) * 0.1
    g = 1.0 + rng.standard_normal((cout,)).astype(np.float32) * 0.1
    lb = rng.standard_normal((cout,)).astype(np.float32) * 0.1
    return kern, bias, g, lb


@pytest.mark.parametrize("k,l", [(3, 515), (3, 512), (2, 500), (2, 77), (3, 37)])
def test_conv_ln_gelu_pallas_matches_reference(rng, k, l):
    """Fused conv+LN+GELU (interpret) == XLA reference formulation, odd/even
    lengths incl. the trailing-sample edge case for k=3."""
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.ops.pallas_conv import (
        conv_ln_gelu_reference,
        _conv_ln_gelu_pallas,
    )

    kern, bias, g, lb = _conv_args(rng, k)
    x = rng.standard_normal((2, l, 128)).astype(np.float32)
    args = map(jnp.asarray, (x, kern, bias, g, lb))
    ref = conv_ln_gelu_reference(
        jnp.asarray(x), jnp.asarray(kern), jnp.asarray(bias), jnp.asarray(g),
        jnp.asarray(lb), stride=2, eps=1e-5, gelu="exact", dtype=jnp.float32,
    )
    out = _conv_ln_gelu_pallas(
        jnp.asarray(x), jnp.asarray(kern), jnp.asarray(bias), jnp.asarray(g),
        jnp.asarray(lb), stride=2, eps=1e-5, gelu="exact",
        dtype=jnp.float32, interpret=True, block_t=64,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv_ln_gelu_vjp_matches_autograd(rng):
    """Recompute VJP == autograd through the reference formulation."""
    import jax
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.ops.pallas_conv import (
        conv_ln_gelu,
        conv_ln_gelu_reference,
    )

    kern, bias, g, lb = _conv_args(rng, 3)
    x = rng.standard_normal((1, 131, 128)).astype(np.float32)

    def f_fused(x, kern, bias, g, lb):
        return jnp.sum(
            conv_ln_gelu(x, kern, bias, g, lb, 2, 1e-5, "exact",
                         jnp.float32, True) ** 2
        )

    def f_ref(x, kern, bias, g, lb):
        return jnp.sum(
            conv_ln_gelu_reference(x, kern, bias, g, lb, stride=2, eps=1e-5,
                                   gelu="exact", dtype=jnp.float32) ** 2
        )

    args = tuple(map(jnp.asarray, (x, kern, bias, g, lb)))
    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_use_pallas_flag_cpu_fallback(rng):
    # STFTConfig.use_pallas dispatches the forward STFT to the fused kernel
    # only on TPU; on CPU it must transparently fall back to the identical
    # jnp formulation (same config object usable in tests and production)
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.3)
    cfg = STFTConfig(use_pallas=True)
    re_p, im_p = stft(x, cfg)
    re_j, im_j = stft(x, STFTConfig())
    np.testing.assert_array_equal(np.asarray(re_p), np.asarray(re_j))
    np.testing.assert_array_equal(np.asarray(im_p), np.asarray(im_j))


# fused LN+GELU frontend epilogue (ops/pallas_ln_gelu.py)


@pytest.mark.parametrize("l,kind", [(515, "exact"), (512, "tanh"), (77, "exact"), (37, "tanh")])
def test_ln_gelu_pallas_matches_reference(rng, l, kind):
    """Fused LN+GELU (interpret) == the _LNf32Stats+_gelu math, including
    non-divisible edge tiles (the padded rows must not pollute valid rows)."""
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.ops.pallas_ln_gelu import (
        _ln_gelu_pallas,
        ln_gelu_reference,
    )

    g = jnp.asarray(1.0 + rng.standard_normal((128,)).astype(np.float32) * 0.1)
    lb = jnp.asarray(rng.standard_normal((128,)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, l, 128)).astype(np.float32))
    ref = ln_gelu_reference(x, g, lb, eps=1e-5, gelu=kind, dtype=jnp.float32)
    out = _ln_gelu_pallas(
        x, g, lb, eps=1e-5, gelu=kind, dtype=jnp.float32, interpret=True,
        block_t=64,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ln_gelu_vjp_matches_autograd(rng):
    """Recompute VJP == autograd through the reference formulation."""
    import jax
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.ops.pallas_ln_gelu import (
        ln_gelu,
        ln_gelu_reference,
    )

    g = 1.0 + rng.standard_normal((128,)).astype(np.float32) * 0.1
    lb = rng.standard_normal((128,)).astype(np.float32) * 0.1
    x = rng.standard_normal((1, 131, 128)).astype(np.float32)

    def f_fused(x, g, lb):
        return jnp.sum(ln_gelu(x, g, lb, 1e-5, "exact", jnp.float32, True) ** 2)

    def f_ref(x, g, lb):
        return jnp.sum(
            ln_gelu_reference(x, g, lb, eps=1e-5, gelu="exact",
                              dtype=jnp.float32) ** 2
        )

    args = tuple(map(jnp.asarray, (x, g, lb)))
    gf = jax.grad(f_fused, argnums=(0, 1, 2))(*args)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ln_gelu_mixed_dtype_stats_match_reference(rng):
    """f32 input with bf16 output: the kernel's LN statistics must see the
    UNCONVERTED f32 input (like the reference and the recompute-VJP
    backward), not a pre-rounded bf16 copy; the in-place alias is dropped
    for this dtype mix."""
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.ops.pallas_ln_gelu import (
        _ln_gelu_pallas,
        ln_gelu_reference,
    )

    g = jnp.asarray(1.0 + rng.standard_normal((128,)).astype(np.float32) * 0.1)
    lb = jnp.asarray(rng.standard_normal((128,)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, 77, 128)).astype(np.float32))
    ref = ln_gelu_reference(x, g, lb, eps=1e-5, gelu="tanh", dtype=jnp.bfloat16)
    out = _ln_gelu_pallas(
        x, g, lb, eps=1e-5, gelu="tanh", dtype=jnp.bfloat16, interpret=True,
        block_t=64,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.03
    )
