"""Pipeline parallelism (`parallel/pipeline.py`): shard_map + ppermute
GPipe rotation over the scanned layer stack, validated on the 8-virtual-
device CPU mesh against a plain sequential scan of the same layers.

The reference has no PP (its only distribution is DDP,
`train_addvisor.py:410-412`); this is the rebuild's third mesh axis for the
48-layer XLS-R-2B stack (SURVEY §5 contingency).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from xai_audio_deepfakes_tpu.config import EmbedderConfig
from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder
from xai_audio_deepfakes_tpu.parallel.pipeline import (
    encoder_layer_fn,
    pipeline_apply,
    pipelined_encoder_apply,
    stack_to_stages,
)


@pytest.fixture(scope="module")
def stacked():
    """8 stacked tiny EncoderLayers + a [B, T, H] activation."""
    cfg = dataclasses.replace(
        EmbedderConfig.tiny(), num_layers=8, scan_layers=True
    )
    enc = Wav2Vec2Encoder(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 1600)).astype(np.float32)
    )
    params = enc.init(jax.random.PRNGKey(0), wav)
    layer_params = params["params"]["layers"]["layer"]
    x = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((16, 12, cfg.hidden_size))
        .astype(np.float32)
    )
    return cfg, layer_params, x


def _sequential(layer_fn, layer_params, x):
    def body(h, p):
        return layer_fn(p, h), None

    out, _ = jax.lax.scan(body, x, layer_params)
    return out


@pytest.mark.parametrize("dp,pp,n_micro", [(2, 4, 4), (2, 4, 8), (1, 8, 8)])
def test_pipeline_matches_sequential(stacked, dp, pp, n_micro):
    cfg, layer_params, x = stacked
    layer_fn = encoder_layer_fn(cfg)
    want = _sequential(layer_fn, layer_params, x)

    mesh = Mesh(
        np.asarray(jax.devices()[: dp * pp]).reshape(dp, pp),
        ("data", "stage"),
    )
    got = pipeline_apply(
        layer_fn,
        stack_to_stages(layer_params, pp),
        x,
        mesh,
        n_micro=n_micro,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_single_stage_degenerate(stacked):
    cfg, layer_params, x = stacked
    layer_fn = encoder_layer_fn(cfg)
    want = _sequential(layer_fn, layer_params, x)
    mesh = Mesh(
        np.asarray(jax.devices()[:2]).reshape(2, 1), ("data", "stage")
    )
    got = pipeline_apply(layer_fn, layer_params, x, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_jit_compiles_once(stacked):
    """The whole rotation is one jittable program (static shapes, scan'd
    schedule) — jit of pipeline_apply compiles and matches eager."""
    cfg, layer_params, x = stacked
    layer_fn = encoder_layer_fn(cfg)
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(2, 4), ("data", "stage")
    )

    fn = jax.jit(
        lambda p, x: pipeline_apply(layer_fn, p, x, mesh, n_micro=4)
    )
    got = fn(layer_params, x)
    want = _sequential(layer_fn, layer_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_gradients_match_sequential(stacked):
    """PP must support *training*, not just inference: grads w.r.t. both the
    stage-sharded layer params and the input flow back through the ppermute
    rotation (ppermute's transpose is the reverse permutation, inserted by
    JAX) and match the sequential scan's grads."""
    cfg, layer_params, x = stacked
    layer_fn = encoder_layer_fn(cfg)
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(2, 4), ("data", "stage")
    )

    def loss_pp(p, x):
        return jnp.sum(pipeline_apply(layer_fn, p, x, mesh, n_micro=4) ** 2)

    def loss_seq(p, x):
        return jnp.sum(_sequential(layer_fn, p, x) ** 2)

    gp_pp, gx_pp = jax.grad(loss_pp, argnums=(0, 1))(layer_params, x)
    gp_seq, gx_seq = jax.grad(loss_seq, argnums=(0, 1))(layer_params, x)

    # psum/scan reassociate the float sums: rel diffs ~1e-5 at grad
    # magnitudes ~50 — tolerance covers reassociation, not logic errors
    np.testing.assert_allclose(
        np.asarray(gx_pp), np.asarray(gx_seq), rtol=1e-4, atol=1e-3
    )
    flat_pp = jax.tree.leaves(gp_pp)
    flat_seq = jax.tree.leaves(gp_seq)
    assert len(flat_pp) == len(flat_seq)
    for a, b in zip(flat_pp, flat_seq):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
        )


@pytest.mark.parametrize("output_layer", [9, 2])
def test_pipelined_encoder_matches_plain_apply(output_layer):
    """Model-level wrapper: conv frontend + projection + pos-conv as usual,
    transformer stack pipelined — must equal Wav2Vec2Encoder.apply exactly
    (incl. the hidden_states[output_layer] readout semantics)."""
    cfg = dataclasses.replace(
        EmbedderConfig.tiny(),
        num_layers=4,
        scan_layers=True,
        output_layer=output_layer,
    )
    enc = Wav2Vec2Encoder(cfg)
    wav = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, 3200)).astype(np.float32)
    )
    params = enc.init(jax.random.PRNGKey(0), wav)
    want = enc.apply(params, wav)

    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "stage")
    )
    got = pipelined_encoder_apply(cfg, params, wav, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_explain_with_pipeline_stages_matches_single_device():
    """`make_sharded_explain` on a ('data','stage') mesh runs the embedder
    through the shard_map/ppermute rotation inside the one jitted explain
    graph; outputs must match the plain single-device explain."""
    from xai_audio_deepfakes_tpu.parallel.inference import make_sharded_explain
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from tests.test_pipeline import tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, embedder=dataclasses.replace(cfg.embedder, scan_layers=True)
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.default_rng(5)
        .standard_normal((4, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )
    want = pipe.explain(params, wav, decoder="unet")

    # tiny() runs output_layer=2 layers -> 2 stages; 2-way dp alongside
    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "stage")
    )
    explain, sharded = make_sharded_explain(pipe, mesh, params)
    got = explain(sharded, wav)

    np.testing.assert_allclose(
        np.asarray(got.probs_clean), np.asarray(want.probs_clean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.probs_relevant),
        np.asarray(want.probs_relevant),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.relevant_wav), np.asarray(want.relevant_wav), atol=1e-4
    )

    # without scan_layers the pp mesh must be rejected loudly
    with pytest.raises(ValueError, match="scan_layers"):
        make_sharded_explain(
            ADDvisorPipeline(tiny_config()),
            mesh,
            ADDvisorPipeline(tiny_config()).init_params(jax.random.PRNGKey(0)),
        )


def test_pipeline_validation_errors(stacked):
    cfg, layer_params, x = stacked
    with pytest.raises(ValueError, match="not divisible"):
        stack_to_stages(layer_params, 3)
    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(1, 4), ("data", "stage")
    )
    with pytest.raises(ValueError, match="batch"):
        pipeline_apply(
            encoder_layer_fn(cfg), layer_params, x, mesh, n_micro=3
        )


def test_pipeline_remat_matches_and_grads(stacked):
    """`cfg.remat` must work under PP too (the full-2B `--pipeline-stages
    --remat` contingency): encoder_layer_fn wraps the layer in
    jax.checkpoint, and outputs AND grads match the non-remat pipeline."""
    cfg, layer_params, x = stacked
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(2, 4), ("data", "stage")
    )
    fn_plain = encoder_layer_fn(cfg)
    for policy in ("full", "dots"):
        cfg_r = dataclasses.replace(cfg, remat=True, remat_policy=policy)
        fn_remat = encoder_layer_fn(cfg_r)

        def loss(fn, p, x):
            return jnp.sum(pipeline_apply(fn, p, x, mesh, n_micro=4) ** 2)

        want = jax.grad(lambda p: loss(fn_plain, p, x))(layer_params)
        got = jax.grad(lambda p: loss(fn_remat, p, x))(layer_params)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
            )

    with pytest.raises(ValueError, match="remat_policy"):
        encoder_layer_fn(dataclasses.replace(cfg, remat=True, remat_policy="x"))


def _three_axis_mesh():
    return Mesh(
        np.asarray(jax.devices()).reshape(2, 2, 2), ("data", "stage", "model")
    )


def test_pipeline_composes_with_tensor_parallel(stacked):
    """dp x pp x tp in one program: layer stack sharded over 'stage',
    Megatron kernel dims over 'model' (auto/GSPMD inside the partially
    manual shard_map), batch over 'data' — output matches the sequential
    scan."""
    from jax.sharding import NamedSharding

    from xai_audio_deepfakes_tpu.config import MeshConfig
    from xai_audio_deepfakes_tpu.parallel.sharding import (
        embedder_pp_tp_param_specs,
    )

    cfg, layer_params, x = stacked
    layer_fn = encoder_layer_fn(cfg)
    want = _sequential(layer_fn, layer_params, x)

    mesh = _three_axis_mesh()
    specs = embedder_pp_tp_param_specs(
        layer_params, MeshConfig(model_parallel=2)
    )
    placed = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        layer_params,
        specs,
    )
    xp = jax.device_put(x, NamedSharding(mesh, jax.sharding.PartitionSpec("data")))

    fn = jax.jit(
        lambda p, x: pipeline_apply(layer_fn, p, x, mesh, n_micro=2)
    )
    got = fn(placed, xp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_tp_gradients_match_sequential(stacked):
    """Training through dp x pp x tp: grads w.r.t. the stage+model-sharded
    params match the sequential scan's."""
    from jax.sharding import NamedSharding

    from xai_audio_deepfakes_tpu.config import MeshConfig
    from xai_audio_deepfakes_tpu.parallel.sharding import (
        embedder_pp_tp_param_specs,
    )

    cfg, layer_params, x = stacked
    layer_fn = encoder_layer_fn(cfg)
    mesh = _three_axis_mesh()
    specs = embedder_pp_tp_param_specs(
        layer_params, MeshConfig(model_parallel=2)
    )
    placed = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        layer_params,
        specs,
    )

    def loss_pp(p, x):
        return jnp.sum(pipeline_apply(layer_fn, p, x, mesh, n_micro=2) ** 2)

    def loss_seq(p, x):
        return jnp.sum(_sequential(layer_fn, p, x) ** 2)

    got = jax.jit(jax.grad(loss_pp))(placed, x)
    want = jax.grad(loss_seq)(layer_params, x)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
        )


def test_sharded_explain_dp_pp_tp_matches_single_device():
    """make_sharded_explain on the full ('data','stage','model') mesh:
    pipeline rotation over 'stage' with Megatron-sharded layer kernels
    over 'model' (GSPMD-auto inside the shard_map) — outputs match the
    plain single-device explain."""
    from tests.test_pipeline import tiny_config

    from xai_audio_deepfakes_tpu.parallel.inference import make_sharded_explain
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, embedder=dataclasses.replace(cfg.embedder, scan_layers=True)
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.default_rng(7)
        .standard_normal((4, cfg.audio.num_samples))
        .astype(np.float32)
        * 0.1
    )
    want = pipe.explain(params, wav, decoder="unet")

    mesh = _three_axis_mesh()  # tiny output_layer=2 -> 2 stages, tp=2, dp=2
    explain, sharded = make_sharded_explain(pipe, mesh, params)
    got = explain(sharded, wav)
    np.testing.assert_allclose(
        np.asarray(got.probs_clean), np.asarray(want.probs_clean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.probs_relevant),
        np.asarray(want.probs_relevant),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.relevant_wav), np.asarray(want.relevant_wav), atol=1e-4
    )
