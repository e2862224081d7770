"""wav2vec2 embedder parity vs HF transformers (torch CPU) on a tiny
random-init model with the XLS-R architecture flags (do_stable_layer_norm,
feat_extract_norm="layer", conv_bias) — pins down conv geometry, LN
placement, pos-conv weight-norm import, and hidden_states[k] semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from xai_audio_deepfakes_tpu.config import EmbedderConfig
from xai_audio_deepfakes_tpu.models.wav2vec2 import (
    Wav2Vec2Encoder,
    params_from_hf_state_dict,
)

TINY = EmbedderConfig.tiny()


@pytest.fixture(scope="module")
def hf_tiny():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        conv_dim=list(TINY.conv_dim),
        conv_kernel=list(TINY.conv_kernel),
        conv_stride=list(TINY.conv_stride),
        num_conv_pos_embeddings=TINY.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=TINY.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    model = Wav2Vec2Model(cfg)
    model.eval()
    return model


def test_hidden_states_parity(hf_tiny, rng):
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        out = hf_tiny(torch.from_numpy(wav), output_hidden_states=True)
    ref = out.hidden_states[TINY.output_layer].numpy()

    enc = Wav2Vec2Encoder(TINY)
    params = params_from_hf_state_dict(
        {k: v.numpy() for k, v in hf_tiny.state_dict().items()}, TINY
    )
    ours = enc.apply(params, jnp.asarray(wav))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)


def test_all_hidden_states_parity(hf_tiny, rng):
    """Every entry of the hidden-states tuple matches (before-layer append
    semantics, final entry final-LN'd in HF — we only collect pre-LN)."""
    wav = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        out = hf_tiny(torch.from_numpy(wav), output_hidden_states=True)
    enc = Wav2Vec2Encoder(TINY)
    params = params_from_hf_state_dict(
        {k: v.numpy() for k, v in hf_tiny.state_dict().items()}, TINY
    )
    _, hs = enc.apply(params, jnp.asarray(wav), collect_hidden=True)
    # HF tuple: [proj+pos, layer1_out, ..., final_LN(last)] — all but the last
    # HF entry must match ours exactly
    assert len(hs) == len(out.hidden_states)
    for i in range(len(hs) - 1):
        np.testing.assert_allclose(
            np.asarray(hs[i]), out.hidden_states[i].numpy(), atol=5e-4,
        )


def test_scan_layers_matches_unrolled(rng):
    """lax.scan over stacked layer params == the unrolled stack, for the
    plain output, remat, and collect_hidden paths."""
    import dataclasses

    from xai_audio_deepfakes_tpu.models.wav2vec2 import stack_layer_params

    wav = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    unrolled_cfg = TINY
    enc_u = Wav2Vec2Encoder(unrolled_cfg)
    # init with collect_hidden so all num_layers exist (output_layer <
    # num_layers in the tiny config)
    params_u = enc_u.init(jax.random.PRNGKey(0), wav, collect_hidden=True)
    ref, ref_hidden = enc_u.apply(params_u, wav, collect_hidden=True)

    import copy

    p = copy.deepcopy(jax.tree.map(np.asarray, params_u["params"]))
    stack_layer_params(p, unrolled_cfg.num_layers)
    params_s = {"params": p}
    for scan_cfg in (
        dataclasses.replace(unrolled_cfg, scan_layers=True),
        dataclasses.replace(unrolled_cfg, scan_layers=True, remat=True),
    ):
        enc_s = Wav2Vec2Encoder(scan_cfg)
        out = jax.jit(enc_s.apply)(params_s, wav)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        out2, hidden = enc_s.apply(params_s, wav, collect_hidden=True)
        assert len(hidden) == len(ref_hidden)
        for a, b in zip(hidden, ref_hidden):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # init in scan mode produces the stacked layout directly
    enc_s = Wav2Vec2Encoder(dataclasses.replace(unrolled_cfg, scan_layers=True))
    fresh = enc_s.init(jax.random.PRNGKey(1), wav)
    stacked_kernel = fresh["params"]["layers"]["layer"]["q_proj"]["kernel"]
    assert stacked_kernel.shape == (
        unrolled_cfg.num_layers, TINY.hidden_size, TINY.hidden_size,
    )


def test_scan_layers_hf_import_parity(hf_tiny, rng):
    """HF import with scan_layers=True matches hidden_states[k] too."""
    import dataclasses

    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        out = hf_tiny(torch.from_numpy(wav), output_hidden_states=True)
    ref = out.hidden_states[TINY.output_layer].numpy()

    cfg = dataclasses.replace(TINY, scan_layers=True)
    enc = Wav2Vec2Encoder(cfg)
    params = params_from_hf_state_dict(
        {k: v.numpy() for k, v in hf_tiny.state_dict().items()}, cfg
    )
    ours = enc.apply(params, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)


def test_frame_count_80000_samples():
    """The conv encoder produces 249 frames for 80000 samples (hop-322
    alignment trick, `audioprocessor.py:25-27` + SURVEY 2.3)."""
    cfg = EmbedderConfig()  # full-size strides
    length = 80000
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        length = (length - k) // s + 1
    assert length == 249


def test_gradients_flow_to_waveform(rng):
    """The LMAC loss backprops through the embedder to the iSTFT output
    (`loss_function.py:46-53`) — grads w.r.t. the waveform must exist."""
    enc = Wav2Vec2Encoder(TINY)
    wav = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), wav)

    def f(w):
        return jnp.sum(enc.apply(params, w) ** 2)

    g = jax.grad(f)(wav)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_params_from_hf_dir_roundtrip(hf_tiny, rng, tmp_path):
    """save_pretrained -> params_from_hf_dir (safetensors route) produces the
    same features as the in-memory state-dict import."""
    from xai_audio_deepfakes_tpu.models.wav2vec2 import params_from_hf_dir

    hf_tiny.save_pretrained(str(tmp_path))
    params_dir = params_from_hf_dir(str(tmp_path), TINY)
    params_sd = params_from_hf_state_dict(
        {k: v.numpy() for k, v in hf_tiny.state_dict().items()}, TINY
    )
    wav = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    enc = Wav2Vec2Encoder(TINY)
    a = enc.apply(params_dir, jnp.asarray(wav))
    b = enc.apply(params_sd, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_int8_quant_matmul_accuracy(rng):
    """Dynamic int8 matmul (per-token + per-channel scales) stays within ~1%
    relative error of the f32 matmul on well-conditioned inputs."""
    from xai_audio_deepfakes_tpu.ops.quant import int8_matmul

    x = rng.standard_normal((4, 33, 64)).astype(np.float32)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    ref = x @ w
    out = np.asarray(jax.jit(int8_matmul)(jnp.asarray(x), jnp.asarray(w)))
    # quantization noise is uniform across the output, so the right metric is
    # the relative Frobenius error (per-element max is dominated by outputs
    # that happen to be near zero)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # exactness on exactly-representable inputs: powers of two times scale
    x2 = np.zeros((1, 2, 4), np.float32); x2[0, 0, 0] = 127.0; x2[0, 1, 2] = -127.0
    w2 = np.eye(4, dtype=np.float32) * 127.0
    np.testing.assert_allclose(
        np.asarray(int8_matmul(jnp.asarray(x2), jnp.asarray(w2))), x2 @ w2,
        rtol=1e-6,
    )


def test_int8_encoder_close_to_f32(rng):
    """quant="int8" shares the f32 param tree and produces features highly
    correlated with the f32 path (serving-accuracy smoke)."""
    import dataclasses

    wav = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    enc32 = Wav2Vec2Encoder(TINY)
    params = enc32.init(jax.random.PRNGKey(0), wav)
    ref = np.asarray(enc32.apply(params, wav))

    enc8 = Wav2Vec2Encoder(dataclasses.replace(TINY, quant="int8"))
    # identical tree: no re-init, no param surgery
    out = np.asarray(jax.jit(enc8.apply)(params, wav))
    assert out.shape == ref.shape
    a, b = ref.ravel(), out.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.999, cos
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
    assert rel < 0.05, rel


def test_int8_conv1d_accuracy(rng):
    """int8 conv1d (per-sample + per-output-channel scales) tracks the f32
    conv within quantization noise at the frontend's k3 regime."""
    from xai_audio_deepfakes_tpu.ops.quant import int8_conv1d

    x = rng.standard_normal((2, 99, 64)).astype(np.float32)
    k = (rng.standard_normal((3, 64, 48)).astype(np.float32) * 0.05)
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (2,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
    )
    out = np.asarray(
        jax.jit(lambda a, b: int8_conv1d(a, b, stride=2))(
            jnp.asarray(x), jnp.asarray(k)
        )
    )
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def test_quant_conv_encoder_close_to_f32(rng):
    """quant_conv="int8" shares the f32 param tree and only quantizes the
    >=64-channel conv layers; features stay tightly correlated with f32."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY,
        conv_dim=(64, 64, 64),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
    )
    wav = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    enc32 = Wav2Vec2Encoder(cfg)
    params = enc32.init(jax.random.PRNGKey(0), wav)
    ref = np.asarray(enc32.apply(params, wav))

    enc8 = Wav2Vec2Encoder(dataclasses.replace(cfg, quant_conv="int8"))
    # identical tree: no re-init, no param surgery
    out = np.asarray(jax.jit(enc8.apply)(params, wav))
    assert out.shape == ref.shape
    a, b = ref.ravel(), out.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.999, cos


def test_int8_static_calibrated_close_to_dynamic(rng):
    """int8-static with calibrated per-tensor scales tracks dynamic int8
    closely on the calibration distribution, in both the unrolled and
    scanned layer stacks (same param tree throughout)."""
    import dataclasses

    from xai_audio_deepfakes_tpu.models.wav2vec2 import stack_layer_params

    # output_layer == num_layers (the flagship truncation's shape): every
    # layer runs in both the unrolled and scanned layouts
    base = dataclasses.replace(TINY, output_layer=TINY.num_layers)
    wav = jnp.asarray(rng.standard_normal((4, 4000)).astype(np.float32) * 0.1)
    enc_dyn = Wav2Vec2Encoder(dataclasses.replace(base, quant="int8"))
    params = enc_dyn.init(jax.random.PRNGKey(0), wav)
    dyn = np.asarray(enc_dyn.apply(params, wav))

    n_run = base.num_layers
    enc_st = Wav2Vec2Encoder(dataclasses.replace(base, quant="int8-static"))
    _, absmax = enc_st.apply(params, wav, calibrate=True)
    h, inter = base.hidden_size, base.intermediate_size
    # [n_run, 2, C]: per-channel (max, p999) per site
    assert {k: v.shape for k, v in absmax.items()} == {
        "qkv": (n_run, 2, h), "ctx": (n_run, 2, h),
        "ffn_in": (n_run, 2, h), "ffn_out": (n_run, 2, inter),
    }
    assert all(np.all(np.asarray(v) > 0) for v in absmax.values())
    # p999 <= max, per channel
    for v in absmax.values():
        a = np.asarray(v)
        assert np.all(a[:, 1, :] <= a[:, 0, :] + 1e-6)
    scales = jax.tree.map(lambda a: a[:, 0, :] / 127.0, absmax)

    out = np.asarray(jax.jit(enc_st.apply)(params, wav, act_scales=scales))
    a, b = dyn.ravel(), out.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.999, cos

    # uncalibrated int8-static falls back to dynamic scales exactly
    fallback = np.asarray(enc_st.apply(params, wav))
    np.testing.assert_allclose(fallback, dyn, atol=1e-5)

    # scanned stack: calibrate in the scanned layout (all num_layers run;
    # the readout still takes hidden_states[output_layer]); its prefix
    # matches the unrolled calibration, and serving with those scales
    # matches the unrolled static output
    p = jax.tree.map(np.asarray, dict(params["params"]))
    stack_layer_params(p, base.num_layers)
    enc_scan = Wav2Vec2Encoder(
        dataclasses.replace(base, quant="int8-static", scan_layers=True)
    )
    _, absmax_s = enc_scan.apply({"params": p}, wav, calibrate=True)
    assert absmax_s["qkv"].shape == (base.num_layers, 2, h)
    for k in absmax:
        # scan reassociates the f32 reductions; maxima agree to rounding
        np.testing.assert_allclose(
            np.asarray(absmax_s[k][:n_run]), np.asarray(absmax[k]), rtol=1e-4
        )
    out_s = np.asarray(
        jax.jit(enc_scan.apply)(
            {"params": p}, wav,
            act_scales=jax.tree.map(lambda a: a[:, 0, :] / 127.0, absmax_s),
        )
    )
    # not elementwise: scan's different f32 accumulation order flips a few
    # values sitting exactly on int8 rounding boundaries by one step
    rel = np.linalg.norm(out_s - out) / np.linalg.norm(out)
    assert rel < 1e-3, rel


def test_tanh_gelu_encoder_close_to_exact(rng):
    """gelu="tanh" (the 2.25x-cheaper VPU serving approximation) must keep
    features tightly correlated with the exact-erf path on the same params."""
    import dataclasses

    wav = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    enc_exact = Wav2Vec2Encoder(TINY)
    params = enc_exact.init(jax.random.PRNGKey(0), wav)
    ref = np.asarray(enc_exact.apply(params, wav))
    out = np.asarray(
        Wav2Vec2Encoder(dataclasses.replace(TINY, gelu="tanh")).apply(params, wav)
    )
    a, b = ref.ravel(), out.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.9999, cos
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
    assert rel < 0.01, rel


@pytest.mark.slow
def test_full_width_hidden_states_parity(rng):
    """Parity at the REAL XLS-R-2B width — hidden 1920, 16 heads, head_dim
    120 (the very dimension the HeadDense 120->128 padding exists for,
    `classifier_embedder.py:13-16`) — on a 2-layer truncation vs HF, for
    both the einsum path and the fused-attention (Pallas interpret) path.
    Catches geometry-specific bugs the tiny config (head_dim 16) cannot."""
    import dataclasses

    from transformers import Wav2Vec2Config, Wav2Vec2Model

    # output_layer < num_layers mirrors production semantics: hidden_states[9]
    # of a deeper truncation is NOT final-LN'd, and HF final-LN's only the
    # LAST hidden_states entry of a stable-layer-norm model
    full2 = dataclasses.replace(
        EmbedderConfig(), num_layers=2, output_layer=1
    )
    torch.manual_seed(0)
    hf_cfg = Wav2Vec2Config(
        hidden_size=full2.hidden_size,
        num_hidden_layers=full2.num_layers,
        num_attention_heads=full2.num_heads,
        intermediate_size=full2.intermediate_size,
        conv_dim=list(full2.conv_dim),
        conv_kernel=list(full2.conv_kernel),
        conv_stride=list(full2.conv_stride),
        num_conv_pos_embeddings=full2.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=full2.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    hf = Wav2Vec2Model(hf_cfg)
    hf.eval()
    wav = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(wav), output_hidden_states=True
        ).hidden_states[full2.output_layer].numpy()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    params = params_from_hf_state_dict(sd, full2)
    ours = np.asarray(Wav2Vec2Encoder(full2).apply(params, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)

    fused_cfg = dataclasses.replace(
        full2, fused_interpret=True, fused_conv=True
    )
    fused = np.asarray(
        Wav2Vec2Encoder(fused_cfg).apply(params, jnp.asarray(wav))
    )
    np.testing.assert_allclose(fused, ref, atol=5e-4)

    fused_ln_cfg = dataclasses.replace(
        full2, fused_interpret=True, fused_ln_gelu=True
    )
    fused_ln = np.asarray(
        Wav2Vec2Encoder(fused_ln_cfg).apply(params, jnp.asarray(wav))
    )
    np.testing.assert_allclose(fused_ln, ref, atol=5e-4)


def test_int8_posconv_batch_independent(rng):
    """A clip's int8 pos-conv output must not depend on its batch
    neighbors: the serve-api batcher coalesces unrelated requests, so the
    activation scale must be per-SAMPLE, not whole-tensor (a whole-tensor
    max would let the 300x-louder neighbor coarsen this clip's
    quantization by 300x). Bitwise check at module level."""
    import dataclasses

    from xai_audio_deepfakes_tpu.models.wav2vec2 import PositionalConvEmbedding

    mod = PositionalConvEmbedding(dataclasses.replace(TINY, quant="int8"))
    a = rng.standard_normal((1, 12, TINY.hidden_size)).astype(np.float32)
    loud = a * 0 + rng.standard_normal((1, 12, TINY.hidden_size)).astype(
        np.float32
    ) * 300.0
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(a))
    alone = np.asarray(mod.apply(params, jnp.asarray(a)))
    co = np.asarray(mod.apply(params, jnp.asarray(np.concatenate([a, loud]))))
    np.testing.assert_array_equal(alone, co[:1])


def test_int8_encoder_batch_coupling_bounded(rng):
    """End-to-end int8 batch coupling stays at quantization-step level.

    All int8 scales are per-sample/per-token, so a co-batched clip cannot
    change another clip's scales. What remains is XLA's batch-1-vs-batch-2
    instruction selection (~1e-6 on the f32 path, measured) amplified by
    round()'s discontinuity to at most a few int8 steps (~1/127 per
    tensor) — bounded noise, NOT proportional to the neighbor's loudness."""
    import dataclasses

    enc8 = Wav2Vec2Encoder(dataclasses.replace(TINY, quant="int8"))
    a = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1
    loud = rng.standard_normal((1, 4000)).astype(np.float32) * 30.0
    params = enc8.init(jax.random.PRNGKey(0), jnp.asarray(a))

    alone = np.asarray(enc8.apply(params, jnp.asarray(a)))
    cobatched = np.asarray(
        enc8.apply(params, jnp.asarray(np.concatenate([a, loud])))
    )[:1]
    scale = float(np.max(np.abs(alone)))
    np.testing.assert_allclose(alone, cobatched, rtol=0, atol=0.05 * scale)
