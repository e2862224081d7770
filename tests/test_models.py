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


def test_feat_decoder_scaled_variant(rng):
    """The round-5 capacity knobs: attention blocks add global frame
    context, gradients flow, and the DEFAULT config's param tree is
    unchanged (round-4 checkpoints keep loading)."""
    cfg0 = FeatDecoderConfig(feature_dim=64, hidden=32)
    feats = jnp.asarray(rng.standard_normal((2, 49, 64)).astype(np.float32))
    tree0 = set(
        FeatureMaskDecoder(cfg0).init(jax.random.PRNGKey(0), feats)["params"]
    )
    assert tree0 == {"in_ln", "proj_in", "tconv_0", "tconv_1", "out_ln",
                     "freq_head"}

    cfg = FeatDecoderConfig(
        feature_dim=64, hidden=32, temporal_blocks=3, attn_layers=2,
        attn_heads=4,
    )
    model = FeatureMaskDecoder(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats)
    assert "attn_0" in variables["params"] and "ffn_out_1" in variables["params"]
    mask = model.apply(variables, feats)
    assert mask.shape == (2, 512, 49)
    m = np.asarray(mask)
    assert np.all(m > 0) and np.all(m < 1)

    def loss(p):
        return jnp.mean(model.apply({"params": p}, feats) ** 2)

    g = jax.grad(loss)(variables["params"])
    gmax = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0


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


def test_logreg_from_any_roundtrip(rng, tmp_path):
    """Detector weights round-trip: train-detector's .npz output loads back
    through the same CLI flag as a sklearn joblib (`--logreg-joblib`)."""
    from sklearn.linear_model import LogisticRegression

    from xai_audio_deepfakes_tpu.models.logreg import (
        logreg_params_from_any,
        logreg_params_save,
    )

    X = rng.standard_normal((64, 16)).astype(np.float64)
    y = (X[:, 0] > 0).astype(int)
    clf = LogisticRegression(C=1e6, max_iter=10000).fit(X, y)
    params = logreg_params_from_arrays(clf.coef_, clf.intercept_)

    npz = str(tmp_path / "det.npz")
    logreg_params_save(params, npz)
    loaded = logreg_params_from_any(npz)
    np.testing.assert_array_equal(np.asarray(loaded["weight"]), np.asarray(params["weight"]))
    np.testing.assert_array_equal(np.asarray(loaded["bias"]), np.asarray(params["bias"]))

    import joblib

    jl = str(tmp_path / "det.joblib")
    joblib.dump(clf, jl)
    loaded_jl = logreg_params_from_any(jl)
    np.testing.assert_allclose(
        np.asarray(loaded_jl["weight"]), np.asarray(params["weight"]), atol=1e-7
    )


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


def _torch_ref_unet():
    """Spec re-implementation of the reference UNet (`addvisor.py:12-84`) for
    checkpoint-import parity: same module names, so its state_dict has the
    exact key layout of the reference's trained `.pth` checkpoints."""
    import torch.nn as tnn

    class ConvBlock(tnn.Module):
        # the reference nests the Sequential under `.block`
        # (`addvisor.py:12-25`), so checkpoint keys are e.g. e1.block.0.weight
        def __init__(self, cin, cout, k=(3, 3), s=(1, 1), p=(1, 1)):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.Conv2d(cin, cout, k, stride=s, padding=p),
                tnn.BatchNorm2d(cout),
                tnn.LeakyReLU(0.2),
                tnn.Conv2d(cout, cout, 3, padding=1),
                tnn.BatchNorm2d(cout),
                tnn.LeakyReLU(0.2),
            )

        def forward(self, x):
            return self.block(x)

    block = ConvBlock

    class Ref(tnn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = block(1, 32, (5, 3), (2, 1), (2, 1))
            self.e2 = block(32, 64, (5, 3), (2, 1), (2, 1))
            self.e3 = block(64, 128, s=(2, 2))
            self.e4 = block(128, 256, s=(2, 2))
            self.bottleneck = tnn.Sequential(
                tnn.Conv2d(256, 512, 3, padding=2, dilation=2),
                tnn.BatchNorm2d(512),
                tnn.LeakyReLU(0.2),
                tnn.Conv2d(512, 512, 3, padding=4, dilation=4),
                tnn.BatchNorm2d(512),
                tnn.LeakyReLU(0.2),
            )
            self.up4 = tnn.ConvTranspose2d(512, 256, (2, 2), stride=(2, 2))
            self.d4 = block(384, 256)
            self.up3 = tnn.ConvTranspose2d(256, 128, (2, 2), stride=(2, 2))
            self.d3 = block(192, 128)
            self.up2 = tnn.ConvTranspose2d(128, 64, (2, 1), stride=(2, 1))
            self.d2 = block(96, 64)
            self.up1 = tnn.ConvTranspose2d(64, 32, (2, 1), stride=(2, 1))
            self.d1 = block(33, 32)
            self.mask_head = tnn.Sequential(tnn.Conv2d(32, 1, 1), tnn.Sigmoid())

        def forward(self, x):
            x1 = self.e1(x)
            x2 = self.e2(x1)
            x3 = self.e3(x2)
            x4 = self.e4(x3)
            b = self.bottleneck(x4)
            y = self.d4(torch.cat([self.up4(b), x3], dim=1))
            y = self.d3(torch.cat([self.up3(y), x2], dim=1))
            y = self.d2(torch.cat([self.up2(y), x1], dim=1))
            y = self.d1(torch.cat([self.up1(y), x], dim=1))
            return self.mask_head(y)

    return Ref()


def test_unet_torch_checkpoint_import_parity(rng):
    """Full-geometry (512x248) output parity between a torch reference UNet
    with random weights+running stats and our flax UNet loaded via
    `unet.params_from_torch_state_dict` — the recipe that makes reference-
    trained `.pth` decoders (`LMAC_metrics.py:21`) portable."""
    from xai_audio_deepfakes_tpu.models.unet import (
        params_from_torch_state_dict as unet_from_torch,
    )

    torch.manual_seed(0)
    ref = _torch_ref_unet()
    # randomize BN running stats so parity proves the stats mapping too
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
    ref.eval()

    mag = rng.uniform(size=(2, 512, 248)).astype(np.float32) * 3.0
    with torch.no_grad():
        ref_mask = ref(torch.from_numpy(mag[:, None])).numpy()[:, 0]

    # DDP prefix handling in the same pass
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    variables = unet_from_torch(sd)
    model = UNetMaskDecoder(UNetConfig())
    ours = np.asarray(model.apply(variables, jnp.asarray(mag)))
    assert ours.shape == ref_mask.shape
    np.testing.assert_allclose(ours, ref_mask, atol=1e-4)


def test_unet_int8_serving_parity(rng):
    """UNetConfig(quant='int8') shares the f32 param tree (compute-only knob)
    and its mask stays close to the float path — the bound documented for
    the --unet-quant serving flag."""
    mag = jnp.asarray(rng.uniform(size=(2, 512, 248)).astype(np.float32) * 3.0)
    f32 = UNetMaskDecoder(UNetConfig())
    variables = f32.init(jax.random.PRNGKey(0), mag)
    ref = np.asarray(f32.apply(variables, mag))

    q = UNetMaskDecoder(UNetConfig(quant="int8"))
    # identical tree: every checkpoint / torch import loads unchanged
    assert jax.tree_util.tree_structure(
        q.init(jax.random.PRNGKey(0), mag)
    ) == jax.tree_util.tree_structure(variables)
    ours = np.asarray(q.apply(variables, mag))
    assert np.max(np.abs(ours - ref)) < 0.15
    assert np.mean(np.abs(ours - ref)) < 0.01


def test_unet_int8_config_trains_in_float(rng):
    """train=True must ignore quant='int8' (zero-gradient round): gradients
    through the quant-configured module equal the float module's exactly."""
    mag = jnp.asarray(rng.uniform(size=(1, 512, 248)).astype(np.float32))
    f32 = UNetMaskDecoder(UNetConfig())
    q = UNetMaskDecoder(UNetConfig(quant="int8"))
    variables = f32.init(jax.random.PRNGKey(0), mag)

    def loss(model, params):
        mask, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            mag, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(mask)

    g_f32 = jax.grad(lambda p: loss(f32, p))(variables["params"])
    g_q = jax.grad(lambda p: loss(q, p))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_f32), jax.tree.leaves(g_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
