"""Training step, overfit sanity, multi-chip data parallelism (8 virtual CPU
devices), checkpoint save/restore."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.config import MeshConfig
from xai_audio_deepfakes_tpu.parallel.mesh import make_mesh
from xai_audio_deepfakes_tpu.parallel.sharding import embedder_param_specs, shard_params
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
from xai_audio_deepfakes_tpu.train.checkpoints import (
    latest_checkpoint,
    parse_checkpoint_name,
    restore_checkpoint,
    save_checkpoint,
)
from xai_audio_deepfakes_tpu.train.train_addvisor import (
    init_train_state,
    make_optimizers,
    make_train_step,
    train_addvisor,
)


@pytest.fixture(scope="module")
def setup():
    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    wav = jnp.asarray(
        rng.standard_normal((8, pipe.cfg.audio.num_samples)).astype(np.float32) * 0.1
    )
    return pipe, params, wav


def test_train_step_runs_and_w_renormalized(setup):
    pipe, params, wav = setup
    tx_m, tx_w = make_optimizers(pipe.cfg)
    state = init_train_state(pipe, params, tx_m, tx_w)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}
    step = jax.jit(make_train_step(pipe, tx_m, tx_w))
    state2, aux = step(state, frozen, wav)
    assert int(state2.step) == 1
    assert np.isfinite(float(aux["loss"]))
    # post-step renorm: softplus weights sum to 3 (`train_addvisor.py:379-380`)
    np.testing.assert_allclose(float(jnp.sum(aux["w"])), 3.0, atol=1e-4)
    assert aux["mask_first"].shape == (pipe.cfg.unet.freq_bins, pipe.cfg.unet.frames)


def test_overfit_loss_decreases(setup):
    """The reference's de-facto acceptance check is overfitting one clip
    (`train_addvisor.py:200-210`): loss must go down on a repeated batch."""
    pipe, params, wav = setup
    tx_m, tx_w = make_optimizers(pipe.cfg)
    state = init_train_state(pipe, params, tx_m, tx_w)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}
    step = jax.jit(make_train_step(pipe, tx_m, tx_w))
    first = None
    last = None
    for _ in range(12):
        state, aux = step(state, frozen, wav)
        if first is None:
            first = float(aux["loss"])
        last = float(aux["loss"])
    assert last < first, (first, last)


def test_remat_policies_match(setup):
    """remat + remat_policy only change what the backward saves vs
    recomputes — the step's loss and updated params must be identical to
    the no-remat step (same graph, same numerics)."""
    import dataclasses

    pipe, params, wav = setup
    results = {}
    for name, (remat, policy) in {
        "none": (False, "full"),
        "full": (True, "full"),
        "dots": (True, "dots"),
    }.items():
        cfg = dataclasses.replace(
            pipe.cfg,
            embedder=dataclasses.replace(
                pipe.cfg.embedder, remat=remat, remat_policy=policy
            ),
        )
        p2 = ADDvisorPipeline(cfg)
        tx_m, tx_w = make_optimizers(cfg)
        state = init_train_state(p2, params, tx_m, tx_w)
        frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}
        step = jax.jit(make_train_step(p2, tx_m, tx_w))
        state2, aux = step(state, frozen, wav)
        results[name] = (
            float(aux["loss"]),
            np.asarray(jax.tree.leaves(state2.unet_params)[0]),
        )
    for name in ("full", "dots"):
        np.testing.assert_allclose(
            results[name][0], results["none"][0], rtol=1e-6, err_msg=name
        )
        np.testing.assert_allclose(
            results[name][1], results["none"][1], atol=1e-6, err_msg=name
        )


def test_train_loop_with_logging(setup, tmp_path):
    pipe, params, wav = setup
    records = []
    state = train_addvisor(
        pipe, params, batches=lambda: [wav[:4]], num_epochs=2,
        log_fn=records.append,
    )
    assert len(records) == 2
    assert int(state.step) == 2
    assert {"epoch", "loss", "l_in", "l_out", "l1", "w"} <= set(records[0])


def test_data_parallel_matches_single_device(setup):
    """jit with batch sharded over the 8-device 'data' axis must produce the
    same numbers as unsharded execution (GSPMD psum == DDP allreduce)."""
    pipe, params, wav = setup
    tx_m, tx_w = make_optimizers(pipe.cfg)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}
    step = make_train_step(pipe, tx_m, tx_w)

    state0 = init_train_state(pipe, params, tx_m, tx_w)
    ref_state, ref_aux = jax.jit(step)(state0, frozen, wav)

    mesh = make_mesh(MeshConfig())
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state0s = jax.device_put(init_train_state(pipe, params, tx_m, tx_w), rep)
    frozens = jax.device_put(frozen, rep)
    wavs = jax.device_put(wav, data)
    sh_state, sh_aux = jax.jit(step, in_shardings=(rep, rep, data))(
        state0s, frozens, wavs
    )
    np.testing.assert_allclose(
        float(sh_aux["loss"]), float(ref_aux["loss"]), rtol=1e-4
    )
    a = jax.tree.leaves(ref_state.unet_params)
    b = jax.tree.leaves(sh_state.unet_params)
    # tolerance: psum reduction order can flip the sign of a ~0 gradient
    # component, and Adam then moves that param by up to 2*lr = 6e-5
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1.5e-4)


def test_pipeline_parallel_training_matches_single_device(setup):
    """`train_addvisor` on a ('data','stage') mesh runs every embedder
    forward/backward through the shard_map/ppermute pipeline; the epoch loss
    must match single-device training (same graph, resharded)."""
    import dataclasses

    from jax.sharding import Mesh

    pipe, _, wav = setup
    cfg = dataclasses.replace(
        pipe.cfg,
        embedder=dataclasses.replace(pipe.cfg.embedder, scan_layers=True),
    )
    p2 = ADDvisorPipeline(cfg)
    params = p2.init_params(jax.random.PRNGKey(0))

    ref_records = []
    train_addvisor(
        p2, params, batches=lambda: [wav], num_epochs=1,
        log_fn=ref_records.append,
    )

    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "stage")
    )
    pp_records = []
    train_addvisor(
        p2, params, batches=lambda: [wav], num_epochs=1, mesh=mesh,
        log_fn=pp_records.append,
    )
    np.testing.assert_allclose(
        pp_records[0]["loss"], ref_records[0]["loss"], rtol=1e-4
    )

    # without scan_layers the stage mesh must be rejected loudly
    with pytest.raises(ValueError, match="scan_layers"):
        train_addvisor(
            ADDvisorPipeline(tiny_config()),
            ADDvisorPipeline(tiny_config()).init_params(jax.random.PRNGKey(0)),
            batches=lambda: [wav], num_epochs=1, mesh=mesh,
        )


def test_tensor_parallel_embedder_specs(setup):
    """2-way TP sharding of the embedder runs under the ('data','model') mesh
    and matches replicated execution."""
    pipe, params, wav = setup
    cfg = MeshConfig(model_parallel=2)
    mesh = make_mesh(cfg)
    specs = embedder_param_specs(params["encoder"], cfg)
    enc_sharded = shard_params(params["encoder"], mesh, specs)
    ref = pipe.encoder.apply(params["encoder"], wav)
    got = pipe.encoder.apply(enc_sharded, wav)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # at least the ffn kernels must actually be sharded over 'model'
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded_paths = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, spec in flat if spec != P()
    ]
    assert any("ffn_in" in s for s in sharded_paths)
    assert any("q_proj" in s for s in sharded_paths)


def test_checkpoint_roundtrip(setup, tmp_path):
    pipe, params, wav = setup
    tx_m, tx_w = make_optimizers(pipe.cfg)
    state = init_train_state(pipe, params, tx_m, tx_w)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}
    step = jax.jit(make_train_step(pipe, tx_m, tx_w))
    state, _ = step(state, frozen, wav)

    path = save_checkpoint(str(tmp_path), epoch=1, loss=0.1234, state=state)
    assert parse_checkpoint_name(path) == (1, 0.1234)
    assert latest_checkpoint(str(tmp_path)) == path

    restored = restore_checkpoint(path, state)
    for x, y in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)
    # resuming: another step from the restored state works
    state2, aux = step(restored, frozen, wav)
    assert int(state2.step) == 2

    # async save commits the same bytes after wait_for_saves()
    from xai_audio_deepfakes_tpu.train.checkpoints import wait_for_saves

    apath = save_checkpoint(
        str(tmp_path), epoch=2, loss=0.05, state=state, async_save=True
    )
    wait_for_saves()
    assert latest_checkpoint(str(tmp_path)) == apath
    arestored = restore_checkpoint(apath, state)
    for x, y in zip(jax.tree.leaves(state), jax.tree.leaves(arestored)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_sharded_explain_matches_single_device(setup):
    """Serving scale-out: dp x tp sharded inference == single-device jit."""
    from xai_audio_deepfakes_tpu.parallel.inference import make_sharded_explain

    pipe, params, wav = setup
    mesh_cfg = MeshConfig(model_parallel=2)
    mesh = make_mesh(mesh_cfg, devices=jax.devices()[:8])
    fn, sharded = make_sharded_explain(pipe, mesh, params, mesh_cfg=mesh_cfg)
    out = fn(sharded, np.asarray(wav))
    ref = pipe.jit_explain()(params, wav)
    np.testing.assert_allclose(
        np.asarray(out.probs_clean), np.asarray(ref.probs_clean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.relevant_wav), np.asarray(ref.relevant_wav), atol=1e-4
    )


def test_artifacts_png(tmp_path, rng):
    from xai_audio_deepfakes_tpu.train.artifacts import save_mask_png, save_spectrogram_png

    mask = rng.uniform(size=(64, 24)).astype(np.float32)
    p1 = save_mask_png(mask, str(tmp_path / "m.png"))
    p2 = save_spectrogram_png(
        rng.uniform(size=(64, 24)).astype(np.float32), str(tmp_path / "s.png")
    )
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_resume_via_initial_state(setup, tmp_path):
    """Orbax checkpoint -> initial_state resume continues the step counter."""
    from xai_audio_deepfakes_tpu.train.train_addvisor import train_addvisor

    pipe, params, wav = setup
    state1 = train_addvisor(pipe, params, batches=lambda: [wav[:2]], num_epochs=1)
    path = save_checkpoint(str(tmp_path), epoch=1, loss=0.5, state=state1)
    restored = restore_checkpoint(path, state1)
    state2 = train_addvisor(
        pipe, params, batches=lambda: [wav[:2]], num_epochs=1,
        initial_state=restored,
    )
    assert int(state2.step) == 2


def test_nan_guard(setup):
    """Trainer halts with FloatingPointError on divergence (injected NaN)."""
    from xai_audio_deepfakes_tpu.train.train_addvisor import train_addvisor

    pipe, params, wav = setup
    bad = wav[:2].at[0, 0].set(jnp.nan)
    with pytest.raises(FloatingPointError):
        train_addvisor(pipe, params, batches=lambda: [bad], num_epochs=1)


def test_graft_dryrun_multichip_inprocess():
    """The driver-checked entry point: with >= n visible devices it runs
    in-process (the subprocess bootstrap path is exercised by running
    `python __graft_entry__.py` under a live single-chip backend)."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_target_quant_fast_path(setup):
    """TrainConfig.target_quant runs the gradient-free target embed through
    the int8/tanh serving path; the differentiated graph is untouched, so
    the step's loss stays within target-quantization noise of the exact
    step and the updated UNet params stay close."""
    import dataclasses

    pipe, params, wav = setup
    cfg = dataclasses.replace(
        pipe.cfg,
        train=dataclasses.replace(
            pipe.cfg.train, target_quant="int8", target_gelu="tanh"
        ),
    )
    fast_pipe = ADDvisorPipeline(cfg)
    tx_m, tx_w = make_optimizers(cfg)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}

    state_exact = init_train_state(pipe, params, tx_m, tx_w)
    state_fast = init_train_state(fast_pipe, params, tx_m, tx_w)
    out_exact, aux_exact = jax.jit(make_train_step(pipe, tx_m, tx_w))(
        state_exact, frozen, wav
    )
    out_fast, aux_fast = jax.jit(make_train_step(fast_pipe, tx_m, tx_w))(
        state_fast, frozen, wav
    )
    assert np.isfinite(float(aux_fast["loss"]))
    # only the BCE target y_hat differs (by int8 noise on the clean probs)
    np.testing.assert_allclose(
        float(aux_fast["loss"]), float(aux_exact["loss"]), rtol=0.05
    )
    leaves_e = jax.tree_util.tree_leaves(out_exact.unet_params)
    leaves_f = jax.tree_util.tree_leaves(out_fast.unet_params)
    for a, b in zip(leaves_e, leaves_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_dp_pp_tp_training_matches_single_device(setup):
    """`train_addvisor` on the full ('data','stage','model') mesh — the
    CLI's --data-parallel x --pipeline-stages x --model-parallel combo:
    pipeline rotation with Megatron-sharded layer kernels inside, epoch
    loss matches single-device training."""
    import dataclasses

    from jax.sharding import Mesh

    pipe, _, wav = setup
    cfg = dataclasses.replace(
        pipe.cfg,
        embedder=dataclasses.replace(pipe.cfg.embedder, scan_layers=True),
    )
    p2 = ADDvisorPipeline(cfg)
    params = p2.init_params(jax.random.PRNGKey(0))

    ref_records = []
    train_addvisor(
        p2, params, batches=lambda: [wav], num_epochs=1,
        log_fn=ref_records.append,
    )
    mesh = Mesh(
        np.asarray(jax.devices()).reshape(2, 2, 2), ("data", "stage", "model")
    )
    records = []
    train_addvisor(
        p2, params, batches=lambda: [wav], num_epochs=1, mesh=mesh,
        log_fn=records.append,
    )
    np.testing.assert_allclose(
        records[0]["loss"], ref_records[0]["loss"], rtol=1e-4
    )


def test_nan_guard_pins_step_with_epoch_fold(setup):
    """The device-side loss fold (one host transfer per epoch) still detects
    divergence: the mid-epoch probe halts promptly and the epoch-end fold
    pins the exact failing step."""
    import dataclasses

    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.train_addvisor import train_addvisor

    pipe, params, wav = setup
    bad = wav[:2].at[0, 0].set(jnp.nan)
    batches = lambda: [wav[:2], bad, wav[:2]]

    # probe every step: halt raised by the mid-epoch check
    cfg = dataclasses.replace(
        pipe.cfg, train=dataclasses.replace(pipe.cfg.train, nan_check_every=1)
    )
    with pytest.raises(FloatingPointError, match="step 1"):
        train_addvisor(ADDvisorPipeline(cfg), params, batches, num_epochs=1)

    # probes off: the epoch-end fold still pins step 1
    cfg = dataclasses.replace(
        pipe.cfg, train=dataclasses.replace(pipe.cfg.train, nan_check_every=0)
    )
    with pytest.raises(FloatingPointError, match="step 1"):
        train_addvisor(ADDvisorPipeline(cfg), params, batches, num_epochs=1)
