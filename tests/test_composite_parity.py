"""Composite end-to-end reference-parity test.

Round-1 pinned parity piecewise (torch.stft, HF hidden states, torch BCE,
sklearn LogReg). This file composes the reference's EXACT pipeline semantics
in torch at tiny scale — mask -> complex remask -> iSTFT -> normalize ->
embed -> mean-pool -> LogReg -> BCE (`loss_function.py:32-77`), and the
eval-time log1p/expm1 masking (`LMAC_metrics.py:136-153`) — and diffs the
final loss and all three probabilities against `lmac_loss` /
the ops `ADDvisorPipeline.explain` composes, on shared weights.

Where the reference is internally broken (its `[:, :Tmax, :]` trim cannot
broadcast against the (512,248) decoder output), the torch side mirrors this
repo's documented resolution: the decoder-shaped mask is zero-padded to the
full spectrogram (`ops/masking.pad_mask_to_spec`), i.e. cropped bins are
fully irrelevant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.config import LossConfig, MaskingConvention
from xai_audio_deepfakes_tpu.losses.lmac import LMACLossState, lmac_loss
from xai_audio_deepfakes_tpu.models.logreg import logreg_params_from_arrays
from xai_audio_deepfakes_tpu.models.wav2vec2 import params_from_hf_state_dict
from xai_audio_deepfakes_tpu.ops.masking import (
    apply_mask,
    pad_mask_to_spec,
    remask_complex,
)
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline


@pytest.fixture(scope="module")
def shared():
    """Torch tiny embedder + shared LogReg weights + our pipeline importing
    the same weights."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = tiny_config()
    e = cfg.embedder
    torch.manual_seed(0)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(
            hidden_size=e.hidden_size,
            num_hidden_layers=e.num_layers,
            num_attention_heads=e.num_heads,
            intermediate_size=e.intermediate_size,
            conv_dim=list(e.conv_dim),
            conv_kernel=list(e.conv_kernel),
            conv_stride=list(e.conv_stride),
            num_conv_pos_embeddings=e.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=e.num_conv_pos_embedding_groups,
            do_stable_layer_norm=True,
            feat_extract_norm="layer",
            conv_bias=True,
            hidden_dropout=0.0,
            attention_dropout=0.0,
            feat_proj_dropout=0.0,
            layerdrop=0.0,
        )
    )
    hf.eval()
    rng = np.random.default_rng(7)
    lw = rng.standard_normal((1, e.hidden_size)).astype(np.float32) * 0.5
    lb = rng.standard_normal((1,)).astype(np.float32)

    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    params["encoder"] = params_from_hf_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, e
    )
    params["logreg"] = logreg_params_from_arrays(lw, lb)

    wav = rng.standard_normal((2, cfg.audio.num_samples)).astype(np.float32) * 0.1
    mask = rng.uniform(0.05, 0.95, (2, cfg.unet.freq_bins, cfg.unet.frames)).astype(
        np.float32
    )
    return cfg, hf, (lw, lb), pipe, params, wav, mask


def _torch_reference_pipeline(cfg, hf, logreg_wb, wav_np, mask_np, convention):
    """The reference semantics end-to-end in torch: returns
    (total, [l_in,l_out,l1], probs_clean, probs_rel, probs_irr)."""
    lw, lb = logreg_wb
    s = cfg.stft
    n = cfg.audio.num_samples
    wav = torch.from_numpy(wav_np)
    window = torch.ones(s.win_length)  # reference passes no window arg ->
    # torch.stft uses a rectangular win_length window (`audioprocessor.py:102`)
    spec = torch.stft(
        wav, s.n_fft, hop_length=s.hop_length, win_length=s.win_length,
        window=window, center=True, pad_mode="reflect", return_complex=True,
    )
    mag, phase = spec.abs(), spec.angle()

    def embed_probs(w):
        # zero_mean_unit_var_norm (`classifier_embedder.py:59-63`, unbiased
        # std + 1e-7), hidden_states[k], mean-pool, LogReg
        normed = (w - w.mean(dim=1, keepdim=True)) / (
            w.std(dim=1, keepdim=True) + 1e-7
        )
        hs = hf(normed, output_hidden_states=True).hidden_states[
            cfg.embedder.output_layer
        ]
        feats = hs.mean(dim=1)
        logits = feats @ torch.from_numpy(lw).T + torch.from_numpy(lb)
        return logits, torch.sigmoid(logits)

    mask = torch.from_numpy(mask_np)
    mask_full = F.pad(
        mask, (0, mag.shape[-1] - mask.shape[-1], 0, mag.shape[-2] - mask.shape[-2])
    )
    if convention == MaskingConvention.LINEAR:
        rel_mag = mask_full * mag
        irr_mag = (1.0 - mask_full) * mag
    else:  # LMAC_metrics.py:136-153
        log_mag = torch.log1p(mag)
        rel_mag = torch.expm1(mask_full * log_mag)
        irr_mag = torch.expm1((1.0 - mask_full) * log_mag)

    def inv(m):
        return torch.istft(
            m * torch.exp(1j * phase), s.n_fft, hop_length=s.hop_length,
            win_length=s.win_length, window=window, center=True, length=n,
        )

    with torch.no_grad():
        clean_logits, clean_probs = embed_probs(wav)
        rel_logits, rel_probs = embed_probs(inv(rel_mag))
        irr_logits, irr_probs = embed_probs(inv(irr_mag))
        class_pred = clean_probs  # train passes sigmoid(yhat),
        # `train_addvisor.py:364-366`
        l_in = F.binary_cross_entropy_with_logits(rel_logits, class_pred)
        l_out = F.binary_cross_entropy_with_logits(irr_logits, 1 - class_pred)
        l1 = mask.abs().mean()
        losses = torch.stack([l_in, l_out, l1])
        w = F.softplus(torch.tensor([3.0, 0.5, 3.0]))
        total = torch.sum(w * losses)
    return (
        float(total),
        losses.numpy(),
        clean_probs.numpy(),
        rel_probs.numpy(),
        irr_probs.numpy(),
    )


@pytest.mark.parametrize(
    "convention", [MaskingConvention.LINEAR, MaskingConvention.LOG1P]
)
def test_composite_loss_and_probs_parity(shared, convention):
    cfg, hf, logreg_wb, pipe, params, wav_np, mask_np = shared
    ref_total, ref_losses, ref_pc, ref_pr, ref_pi = _torch_reference_pipeline(
        cfg, hf, logreg_wb, wav_np, mask_np, convention
    )

    wav = jnp.asarray(wav_np)
    mask = jnp.asarray(mask_np)
    _, _, mag, phase = pipe.spectrogram(wav)
    _, class_pred = pipe.classify(params, wav)  # sigmoid(yhat),
    # `train_addvisor.py:364-366`
    state = LMACLossState.init(cfg.loss)
    total, losses, _ = lmac_loss(
        state.w_raw, mask, mag, phase, class_pred,
        classify_wav=lambda w: pipe.classify(params, w)[0],
        istft_fn=pipe.istft,
        cfg=LossConfig(masking=convention),
    )
    np.testing.assert_allclose(np.asarray(losses), ref_losses, atol=1e-4)
    np.testing.assert_allclose(float(total), ref_total, atol=1e-4)

    # the three probabilities via the same ops explain() composes
    mask_full = pad_mask_to_spec(mask, mag.shape[-2], mag.shape[-1])
    rel_mag, irr_mag = apply_mask(mask_full, mag, convention)
    rel_wav = pipe.istft(*remask_complex(rel_mag, phase))
    irr_wav = pipe.istft(*remask_complex(irr_mag, phase))
    _, pc = pipe.classify(params, wav)
    _, pr = pipe.classify(params, rel_wav)
    _, pi = pipe.classify(params, irr_wav)
    np.testing.assert_allclose(np.asarray(pc), ref_pc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pr), ref_pr, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pi), ref_pi, atol=1e-4)
