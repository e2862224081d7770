"""UNet / feature-decoder / LogReg / HiFi-GAN structural and parity tests."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch

from xai_audio_deepfakes_tpu.config import (
    FeatDecoderConfig,
    HiFiGANConfig,
    UNetConfig,
)
from xai_audio_deepfakes_tpu.models.feat_decoder import FeatureMaskDecoder
from xai_audio_deepfakes_tpu.models.hifigan import (
    HiFiGANGenerator,
    params_from_torch_state_dict,
)
from xai_audio_deepfakes_tpu.models.logreg import (
    logreg_apply,
    logreg_params_from_arrays,
)
from xai_audio_deepfakes_tpu.models.unet import UNetMaskDecoder


def test_unet_shapes_and_range(rng):
    cfg = UNetConfig()
    model = UNetMaskDecoder(cfg)
    mag = jnp.asarray(rng.uniform(size=(2, 512, 248)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mag)
    mask = model.apply(variables, mag)
    assert mask.shape == (2, 512, 248)
    m = np.asarray(mask)
    assert np.all(m > 0) and np.all(m < 1)


def test_unet_train_mode_updates_batch_stats(rng):
    cfg = UNetConfig()
    model = UNetMaskDecoder(cfg)
    mag = jnp.asarray(rng.uniform(size=(2, 512, 248)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mag)
    _, updates = model.apply(
        variables, mag, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates
    # running mean must have moved away from init zeros somewhere
    leaves = jax.tree.leaves(updates["batch_stats"])
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in leaves)


def test_unet_gradients(rng):
    cfg = UNetConfig()
    model = UNetMaskDecoder(cfg)
    mag = jnp.asarray(rng.uniform(size=(1, 512, 248)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mag)

    def loss(params):
        mask = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, mag)
        return jnp.mean(mask)

    g = jax.grad(loss)(variables["params"])
    gmax = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_feat_decoder_contract(rng):
    """mask.shape[1] == freq_bins (512) so the reference's `Tmax = mask.shape[1];
    magnitude[:, :Tmax, :]` call sites work (`LMAC_metrics.py:133-137`)."""
    cfg = FeatDecoderConfig(feature_dim=64, hidden=32)
    model = FeatureMaskDecoder(cfg)
    feats = jnp.asarray(rng.standard_normal((2, 249, 64)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feats)
    mask = model.apply(variables, feats)
    assert mask.shape == (2, 512, 249)
    assert mask.shape[1] == cfg.freq_bins
    m = np.asarray(mask)
    assert np.all(m > 0) and np.all(m < 1)


def test_logreg_matches_sklearn(rng):
    """LogReg head parity vs sklearn predict_proba (`classifier_embedder.py:21-38`)."""
    from sklearn.linear_model import LogisticRegression

    X = rng.standard_normal((64, 16)).astype(np.float64)
    y = (X[:, 0] + 0.1 * rng.standard_normal(64) > 0).astype(int)
    clf = LogisticRegression(C=1e6, max_iter=10000).fit(X, y)
    params = logreg_params_from_arrays(clf.coef_, clf.intercept_)
    logits, probs = logreg_apply(params, jnp.asarray(X.astype(np.float32)))
    ref = clf.predict_proba(X)[:, 1]
    np.testing.assert_allclose(np.asarray(probs)[:, 0], ref, atol=1e-4)


def _torch_tconv1d(x, weight, bias, stride, padding):
    return torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(weight), torch.from_numpy(bias),
        stride=stride, padding=padding,
    ).numpy()


def test_convtranspose_mapping_matches_torch(rng):
    """Pin down flax ConvTranspose(transpose_kernel=True) <-> torch
    ConvTranspose1d weight mapping used by the HiFi-GAN import."""
    cin, cout, k, s = 6, 4, 16, 8
    pad = (k - s) // 2
    x = rng.standard_normal((2, 20, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)  # torch layout
    b = rng.standard_normal((cout,)).astype(np.float32)

    ref = _torch_tconv1d(x.transpose(0, 2, 1), w, b, s, pad).transpose(0, 2, 1)

    mod = nn.ConvTranspose(
        cout, (k,), strides=(s,), padding="VALID", transpose_kernel=True
    )
    params = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}
    ours = mod.apply({"params": params}, jnp.asarray(x))
    if pad > 0:
        ours = ours[:, pad:-pad, :]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_hifigan_upsampling_and_import(rng):
    """Tiny HiFi-GAN: output length = prod(rates) * T; torch state-dict import
    (jik876 layout incl. weight_norm) produces identical params shape-wise and
    a finite waveform in [-1, 1]."""
    cfg = HiFiGANConfig(
        in_channels=8,
        upsample_initial_channel=16,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    gen = HiFiGANGenerator(cfg)
    mel = jnp.asarray(rng.standard_normal((2, 8, 10)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (2, 80)  # 4*2*10
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)

    # build an equivalent torch state dict (weight-normed) and import it
    torch.manual_seed(0)
    sd = {}
    def wn_conv(prefix, cin_, cout_, k_):
        v = torch.randn(cout_, cin_, k_)
        g = torch.rand(cout_, 1, 1) + 0.5
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = v
        sd[f"{prefix}.bias"] = torch.randn(cout_)
    def wn_tconv(prefix, cin_, cout_, k_):
        v = torch.randn(cin_, cout_, k_)
        g = torch.rand(cin_, 1, 1) + 0.5
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = v
        sd[f"{prefix}.bias"] = torch.randn(cout_)

    wn_conv("conv_pre", 8, 16, 7)
    wn_tconv("ups.0", 16, 8, 8)
    for t in range(2):
        wn_conv(f"resblocks.0.convs1.{t}", 8, 8, 3)
        wn_conv(f"resblocks.0.convs2.{t}", 8, 8, 3)
    wn_tconv("ups.1", 8, 4, 4)
    for t in range(2):
        wn_conv(f"resblocks.1.convs1.{t}", 4, 4, 3)
        wn_conv(f"resblocks.1.convs2.{t}", 4, 4, 3)
    wn_conv("conv_post", 4, 1, 7)

    sd_np = {k2: v2.numpy() for k2, v2 in sd.items()}
    imported = params_from_torch_state_dict(sd_np, cfg)
    ref_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, imported["params"])
    assert ref_shapes == got_shapes
    wav2 = gen.apply(imported, mel)
    assert np.all(np.isfinite(np.asarray(wav2)))
