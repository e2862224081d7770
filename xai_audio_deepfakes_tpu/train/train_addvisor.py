"""Mask-decoder training — the TPU-native `train_addvisor.py`.

Reference training semantics reproduced (`train_addvisor.py:99-105,345-393`):
  * UNet on STFT magnitude, LMAC loss with sigmoid(detector logits) as target
  * dual Adam: lr 3e-5 for the decoder, lr 1e-4 for the raw loss weights
  * post-step renorm of w to sum = len(w)
  * frozen embedder + LogReg inside the differentiated loss graph
  * per-epoch first-batch mask artifact, checkpoint name encoding epoch+loss

TPU-native differences:
  * ONE jitted train step: STFT + 3 embedder forwards + 2 backwards + UNet
    fwd/bwd + both optimizer updates fuse into a single XLA program — the
    reference splits this across collate_fn (host loop), module forwards, and
    two optimizer steps.
  * Data parallelism by sharding the batch over the mesh 'data' axis: the DDP
    gradient allreduce becomes a GSPMD-inserted psum (no Accelerate).
  * Embedder rematerialization (cfg.embedder.remat) for the
    3-forward/2-backward memory profile of the 2B model.
  * Donated state buffers (donate_argnums) keep HBM flat.
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xai_audio_deepfakes_tpu.config import PipelineConfig
from xai_audio_deepfakes_tpu.losses.lmac import (
    LMACLossState,
    lmac_loss,
    renormalize_w,
    softplus_weights,
)
from xai_audio_deepfakes_tpu.models.logreg import logreg_apply
from xai_audio_deepfakes_tpu.ops.masking import crop_spec
from xai_audio_deepfakes_tpu.ops.normalize import zero_mean_unit_var_norm
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline


class AddvisorTrainState(NamedTuple):
    """Everything that evolves during training. Frozen components (embedder,
    LogReg) live outside, passed separately so they can be sharded once.

    `unet_params`/`unet_batch_stats` hold whichever mask decoder is being
    trained: the current-generation UNet (decoder="unet") or the legacy
    feature-input decoder (decoder="features" — the `ADDvisor` consumed at
    `LMAC_metrics.py:133`; it has no batch stats, so that leaf stays {})."""

    unet_params: Any
    unet_batch_stats: Any
    w_raw: jnp.ndarray
    opt_model: Any
    opt_w: Any
    step: jnp.ndarray


def decoder_params_key(decoder: str) -> str:
    """Param-tree key for the trainable mask decoder."""
    if decoder == "unet":
        return "unet"
    if decoder == "features":
        return "feat_decoder"
    raise ValueError(f"unknown decoder {decoder!r}")


def init_train_state(
    pipe: ADDvisorPipeline, params: dict, tx_model: optax.GradientTransformation,
    tx_w: optax.GradientTransformation, decoder: str = "unet",
) -> AddvisorTrainState:
    tree = params[decoder_params_key(decoder)]
    dec_params = tree["params"]
    w_raw = LMACLossState.init(pipe.cfg.loss).w_raw
    return AddvisorTrainState(
        unet_params=dec_params,
        unet_batch_stats=tree.get("batch_stats", {}),
        w_raw=w_raw,
        opt_model=tx_model.init(dec_params),
        opt_w=tx_w.init(w_raw),
        step=jnp.zeros((), jnp.int32),
    )


def make_optimizers(cfg: PipelineConfig):
    return optax.adam(cfg.train.model_lr), optax.adam(cfg.train.loss_w_lr)


def make_train_step(
    pipe: ADDvisorPipeline,
    tx_model: optax.GradientTransformation,
    tx_w: optax.GradientTransformation,
    decoder: str = "unet",
) -> Callable:
    """-> step(state, frozen, wav) -> (state, aux dict).

    `frozen` = {'encoder': vars, 'logreg': params} — the 2B embedder + head.
    `wav` [B, 80000]. The whole body jits; call through jax.jit (see
    `train_addvisor` below, which also installs shardings).

    decoder="features" trains the legacy feature-input decoder instead of
    the UNet (`LMAC_metrics.py:133` consumer): the clean embed is computed
    ONCE and reused as both the (stop-gradient) detector target and the
    decoder input, so the step still costs 3 embedder forwards + 2
    backwards like the UNet path.
    """
    cfg = pipe.cfg
    decoder_params_key(decoder)  # validate early

    # Optional fast path for the target-producing clean embed (see
    # TrainConfig.target_quant): a second encoder module over the SAME params
    # (Int8Dense is nn.Dense param-compatible), used only in the collate
    # stage where no gradient flows. Not combined with a pipeline-parallel
    # features_fn override (that path owns the encoder forward).
    target_encoder = None
    if (
        (cfg.train.target_quant != "none" or cfg.train.target_gelu != "exact")
        and pipe.features_fn is None
    ):
        import dataclasses as _dc

        from xai_audio_deepfakes_tpu.models.wav2vec2 import Wav2Vec2Encoder

        target_encoder = Wav2Vec2Encoder(
            _dc.replace(
                cfg.embedder,
                quant=cfg.train.target_quant,
                gelu=cfg.train.target_gelu,
            )
        )

    def classify_wav_target(frozen, wav):
        if target_encoder is None:
            return classify_wav(frozen, wav)
        norm = zero_mean_unit_var_norm(wav)
        feats = target_encoder.apply(frozen["encoder"], norm)
        logits, _ = logreg_apply(frozen["logreg"], jnp.mean(feats, axis=1))
        return logits

    def classify_wav(frozen, wav):
        norm = zero_mean_unit_var_norm(wav)
        # honor a pipeline-parallel (or otherwise overridden) encoder
        # forward, mirroring ADDvisorPipeline.features
        feats = (
            pipe.features_fn(frozen["encoder"], norm)
            if pipe.features_fn is not None
            else pipe.encoder.apply(frozen["encoder"], norm)
        )
        logits, _ = logreg_apply(frozen["logreg"], jnp.mean(feats, axis=1))
        return logits

    def step(state: AddvisorTrainState, frozen: dict, wav: jnp.ndarray):
        # --- collate stage (`train_addvisor.py:247-260`), now on-device ---
        _, _, mag, phase = pipe.spectrogram(wav)
        if decoder == "features":
            # one clean embed serves target AND decoder input (exact path:
            # the decoder consumes these features, so no quantized target
            # fast path here)
            norm = zero_mean_unit_var_norm(wav)
            feats = (
                pipe.features_fn(frozen["encoder"], norm)
                if pipe.features_fn is not None
                else pipe.encoder.apply(frozen["encoder"], norm)
            )
            feats = jax.lax.stop_gradient(feats)
            yhat_logits, _ = logreg_apply(
                frozen["logreg"], jnp.mean(feats, axis=1)
            )
        else:
            feats = None
            yhat_logits = classify_wav_target(frozen, wav)
        class_pred = jax.nn.sigmoid(jax.lax.stop_gradient(yhat_logits))
        mag_c = crop_spec(mag, cfg.unet.freq_bins, cfg.unet.frames)

        def loss_fn(dec_params, w_raw):
            if decoder == "features":
                mask = pipe.feat_decoder.apply({"params": dec_params}, feats)
                new_stats = state.unet_batch_stats  # none for this decoder
            else:
                mask, updates = pipe.unet.apply(
                    {"params": dec_params,
                     "batch_stats": state.unet_batch_stats},
                    mag_c, train=True, mutable=["batch_stats"],
                )
                new_stats = updates["batch_stats"]
            total, losses, w = lmac_loss(
                w_raw, mask, mag, phase, class_pred,
                lambda x: classify_wav(frozen, x),
                pipe.istft, cfg.loss,
                # traced sweep knob: present only when the caller put it in
                # `frozen` (e.g. benchmarks/l1_sweep.py) — absent, the
                # pytree structure and thus the compile cache key are
                # unchanged from the default path
                l1_scale=frozen.get("l1_scale"),
            )
            return total, (losses, w, new_stats, mask)

        (total, (losses, w, new_stats, mask)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.unet_params, state.w_raw)
        g_model, g_w = grads

        upd_m, opt_model = tx_model.update(g_model, state.opt_model, state.unet_params)
        unet_params = optax.apply_updates(state.unet_params, upd_m)
        if cfg.train.freeze_l1_weight:
            # decouple the learnable-w feedback from the L1 term: no
            # gradient step on w_raw[-1] (see TrainConfig.freeze_l1_weight)
            g_w = g_w.at[-1].set(0.0)
        upd_w, opt_w = tx_w.update(g_w, state.opt_w, state.w_raw)
        w_raw = optax.apply_updates(state.w_raw, upd_w)
        if cfg.train.renorm_loss_w:
            w_raw = renormalize_w(
                w_raw, freeze_last=cfg.train.freeze_l1_weight
            )

        new_state = AddvisorTrainState(
            unet_params=unet_params,
            unet_batch_stats=new_stats,
            w_raw=w_raw,
            opt_model=opt_model,
            opt_w=opt_w,
            step=state.step + 1,
        )
        aux = {
            "loss": total,
            "l_in": losses[0], "l_out": losses[1], "l1": losses[2],
            # one device-side [4] vector so the epoch loop can fold a whole
            # epoch of losses into a single host transfer (see train_addvisor)
            "loss_vec": jnp.stack([total, losses[0], losses[1], losses[2]]),
            "w": softplus_weights(w_raw),
            "mask_first": mask[0],
        }
        return new_state, aux

    return step


def train_addvisor(
    pipe: ADDvisorPipeline,
    params: dict,
    batches: Callable[[], Any],
    num_epochs: int | None = None,
    mesh=None,
    log_fn: Callable[[dict], None] | None = None,
    artifact_fn: Callable[[int, Any, dict], None] | None = None,
    checkpoint_fn: Callable[[int, AddvisorTrainState, float], None] | None = None,
    initial_state: AddvisorTrainState | None = None,
    decoder: str = "unet",
    l1_scale: float | None = None,
    l1_warmup_epochs: int = 0,
) -> AddvisorTrainState:
    """Epoch loop (`train_addvisor.py:345-393`). `batches()` yields wav
    arrays [B, 80000] per epoch. Artifacts/checkpoints/logging are injected
    so the loop stays host-side-effect free otherwise. Pass `initial_state`
    (e.g. a restored checkpoint) to resume. `decoder` selects the trainable
    mask decoder ("unet" | "features", see `make_train_step`). `l1_scale`
    overrides `cfg.loss.l1_scale` as a TRACED input: sweeping it reuses one
    compiled step (a config change would recompile per value).
    `l1_warmup_epochs` ramps the traced scale linearly from the reference
    formula (1.0) to `l1_scale` over that many epochs — the round-5 4x-scale
    runs showed strong L1 pressure from step 0 makes l_out oscillate (the
    mask collapses past the flip and recovers); the ramp is a host-side
    scalar swap on the SAME compiled step, zero recompiles."""
    cfg = pipe.cfg
    tx_model, tx_w = make_optimizers(cfg)
    state = (
        init_train_state(pipe, params, tx_model, tx_w, decoder)
        if initial_state is None
        else initial_state
    )
    # the step donates its state buffers; copy so the caller's `params`
    # arrays (shared with state.unet_params at init) survive
    state = jax.tree.map(jnp.copy, state)
    frozen = {"encoder": params["encoder"], "logreg": params["logreg"]}

    def _l1_for_epoch(e: int) -> float | None:
        if l1_scale is None:
            return None
        if l1_warmup_epochs and l1_warmup_epochs > 0:
            frac = min(1.0, (e + 1) / l1_warmup_epochs)
            return 1.0 + (float(l1_scale) - 1.0) * frac
        return float(l1_scale)

    l1_now = _l1_for_epoch(0)
    if l1_now is not None:
        frozen["l1_scale"] = jnp.asarray(l1_now, jnp.float32)

    if mesh is not None:
        import dataclasses

        from jax.sharding import NamedSharding, PartitionSpec as P

        from xai_audio_deepfakes_tpu.parallel.sharding import (
            embedder_param_specs,
            embedder_pp_param_specs,
            shard_params,
        )

        stages = int(mesh.shape.get("stage", 1))
        if stages > 1:
            # pipeline-parallel embedder: all 3 per-step embeds (clean +
            # relevant + irrelevant; the latter two inside the loss grad)
            # rotate microbatches through the 'stage'-sharded layer stack
            # (shard_map + ppermute, differentiable — gradient parity pinned
            # in tests/test_pipeline_parallel.py)
            from xai_audio_deepfakes_tpu.parallel.pipeline import (
                pipelined_encoder_apply,
            )

            if not cfg.embedder.scan_layers:
                raise ValueError(
                    "pipeline-parallel training needs scan_layers=True "
                    "(stacked [L, ...] layer params)"
                )
            pipe = dataclasses.replace(
                pipe,
                features_fn=lambda enc, norm: pipelined_encoder_apply(
                    cfg.embedder, enc, norm, mesh,
                    data_axis=cfg.mesh.data_axis,
                ),
            )
            enc_specs = embedder_pp_param_specs(
                frozen["encoder"],
                stages,
                # dp x pp x tp: Megatron-shard the stacked layer kernels over
                # 'model' too when the mesh carries that axis (GSPMD-auto
                # inside the pipeline shard_map)
                mesh_cfg=dataclasses.replace(
                    cfg.mesh,
                    model_parallel=int(
                        mesh.shape.get(cfg.mesh.model_axis, 1)
                    ),
                ),
            )
        else:
            # frozen embedder tensor-shards over 'model' (Megatron specs)
            enc_specs = embedder_param_specs(frozen["encoder"], cfg.mesh)

        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(cfg.mesh.data_axis))
        state = jax.device_put(state, rep)
        frozen = {
            **{
                k: jax.device_put(v, rep)
                for k, v in frozen.items()
                if k not in ("encoder", "logreg")  # e.g. traced l1_scale
            },
            "encoder": shard_params(frozen["encoder"], mesh, enc_specs),
            "logreg": shard_params(frozen["logreg"], mesh),
        }
        step_fn = make_train_step(pipe, tx_model, tx_w, decoder)
        jit_step = jax.jit(step_fn, in_shardings=(rep, None, data), donate_argnums=(0,))
    else:
        step_fn = make_train_step(pipe, tx_model, tx_w, decoder)
        jit_step = jax.jit(step_fn, donate_argnums=(0,))

    num_epochs = cfg.train.num_epochs if num_epochs is None else num_epochs
    nan_every = cfg.train.nan_check_every

    def _raise_nonfinite(epoch: int, vals: np.ndarray):
        bad = np.flatnonzero(~np.isfinite(vals[:, 0]))
        if bad.size:
            # failure detection the reference lacks (SURVEY §5): halt on
            # divergence instead of training on NaN weights; the caller
            # resumes from the last checkpoint
            raise FloatingPointError(
                f"non-finite loss at epoch {epoch + 1} step {int(bad[0])}: "
                f"{vals[int(bad[0]), 0]}"
            )

    # Host-off-the-hot-path epoch loop (round-2 measured `cli train` at 20
    # vs 51.8 clips/s for the jitted step; the reference's loop is fully
    # synchronous, `train_addvisor.py:345-393`):
    #   * per-step losses stay on device; one [n,4] fold per epoch
    #   * epochs chain through ONE background prefetch stream, so the next
    #     epoch's decode + device_put overlap this epoch's device tail
    #   * the epoch record is finalized ONE epoch late from an async
    #     device->host copy, so dispatch never drains waiting on the fold;
    #     the `nan_check_every` probe still bounds divergence detection
    from xai_audio_deepfakes_tpu.data.prefetch import prefetch

    def _epoch_stream():
        for epoch in range(num_epochs):
            got = False
            for wav in batches():
                got = True
                yield epoch, wav
            if not got:
                yield epoch, None  # keep the per-epoch record contract

    def _finish_epoch(epoch, loss_vecs, t0, drain=False):
        """Stage the epoch fold: start the async transfer now, finalize
        (record/log/checkpoint) when `_finalize` is called later. With
        `drain` (last epoch), block for the device first so the timing
        covers the real compute, not just its dispatch."""
        vec = jnp.stack(loss_vecs) if loss_vecs else jnp.zeros((0, 4))
        if drain:
            vec = jnp.asarray(np.asarray(vec))
        else:
            try:
                vec.copy_to_host_async()
            except AttributeError:  # not a device array (e.g. under tracing)
                pass
        # this epoch's state buffers get DONATED by the next epoch's first
        # step before the deferred finalize runs — snapshot what finalize
        # needs as fresh on-device copies (enqueued, no host sync)
        w_snap = jnp.copy(state.w_raw)
        every = cfg.train.checkpoint_every
        snap = None
        # snapshot ONLY on epochs that will checkpoint: each snapshot is a
        # full on-device state copy + host DMA (~90 MB at full geometry)
        if checkpoint_fn is not None and every and (epoch + 1) % every == 0:
            snap = jax.tree.map(jnp.copy, state)
            # prestart the device->host DMA so a checkpoint_fn that reads
            # the snapshot (orbax serialize) finds it already transferred
            def _prefetch(x):
                try:
                    x.copy_to_host_async()
                except AttributeError:
                    pass
                return x

            jax.tree.map(_prefetch, snap)
        return (epoch, vec, snap, w_snap, t0, time.perf_counter())

    def _finalize(staged):
        epoch, vec, snap, w_snap, t0, t1 = staged
        vals = np.asarray(vec)
        n = vals.shape[0]
        _raise_nonfinite(epoch, vals)
        sums = vals.sum(axis=0) if n else np.zeros(4)
        avg = float(sums[0]) / max(n, 1)
        record = {
            "epoch": epoch + 1,
            "loss": avg,
            "l_in": float(sums[1]) / max(n, 1),
            "l_out": float(sums[2]) / max(n, 1),
            "l1": float(sums[3]) / max(n, 1),
            "w": [float(x) for x in softplus_weights(w_snap)],
            "sec": t1 - t0,
        }
        if log_fn is not None:
            log_fn(record)
        if snap is not None:  # staged only on checkpoint epochs
            checkpoint_fn(epoch + 1, snap, avg)

    cur_epoch, i, loss_vecs = 0, 0, []
    staged_prev = None
    t0 = time.perf_counter()
    for epoch, wav in prefetch(_epoch_stream(), size=2):
        if epoch != cur_epoch:
            staged = _finish_epoch(cur_epoch, loss_vecs, t0)
            if staged_prev is not None:
                _finalize(staged_prev)
            staged_prev = staged
            cur_epoch, i, loss_vecs = epoch, 0, []
            # epochs tile wall-clock: next epoch starts where this one's
            # boundary was stamped, so per-epoch `sec` sums to total wall
            t0 = staged[-1]
            if l1_warmup_epochs and l1_scale is not None:
                # warmup: swap the traced scalar for the new epoch (same
                # compiled step — l1_scale is a step INPUT, not a constant)
                frozen = {
                    **frozen,
                    "l1_scale": jnp.asarray(
                        _l1_for_epoch(epoch), jnp.float32
                    ),
                }
        if wav is None:  # empty epoch placeholder
            continue
        state, aux = jit_step(state, frozen, wav)
        if i == 0 and artifact_fn is not None:
            artifact_fn(epoch, aux["mask_first"], aux)
        loss_vecs.append(aux["loss_vec"])
        if nan_every and (i + 1) % nan_every == 0:
            probe = np.asarray(aux["loss_vec"])
            if not np.all(np.isfinite(probe)):
                _raise_nonfinite(epoch, np.asarray(jnp.stack(loss_vecs)))
        i += 1
    if num_epochs > 0:
        staged = _finish_epoch(cur_epoch, loss_vecs, t0, drain=True)
        if staged_prev is not None:
            _finalize(staged_prev)
        _finalize(staged)
    return state


def restore_decoder_for_inference(
    path: str, pipe: ADDvisorPipeline, params: dict, decoder: str = "unet"
) -> dict:
    """Extract the mask decoder (+BN stats) from a `cli train` checkpoint.

    Train checkpoints carry the FULL AddvisorTrainState (decoder + loss
    weights + both optimizer states, `train/checkpoints.py`); eval/explain/
    serve only need the decoder variables. Restores against the full-state
    template first, falling back to a bare decoder-tree template for
    checkpoints saved outside the trainer. `decoder` selects which decoder
    the checkpoint holds ("unet" | "features")."""
    from xai_audio_deepfakes_tpu.train.checkpoints import restore_checkpoint

    tx_m, tx_w = make_optimizers(pipe.cfg)
    template = init_train_state(pipe, params, tx_m, tx_w, decoder)
    try:
        state = restore_checkpoint(path, template)
    except Exception:
        return restore_checkpoint(path, params[decoder_params_key(decoder)])
    tree = {"params": state.unet_params}
    if state.unet_batch_stats:
        tree["batch_stats"] = state.unet_batch_stats
    return tree
