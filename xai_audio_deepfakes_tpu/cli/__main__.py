"""Command-line entry points.

The reference's six apps are module-level scripts with hardcoded paths and no
flags (`train_addvisor.py`, `LMAC_metrics.py`, `captum_saliency.py`,
`streamlit_controlled_study.py`, `train_logReg_swapping.py`, `hifigan.py`).
Here each becomes a subcommand over the one config tree:

  python -m xai_audio_deepfakes_tpu.cli explain  --wav a.wav b.wav --out dir
  python -m xai_audio_deepfakes_tpu.cli train    --metadata m.txt --root d
  python -m xai_audio_deepfakes_tpu.cli eval     --metadata m.txt --root d
  python -m xai_audio_deepfakes_tpu.cli attrib   --metadata m.txt --method ig
  python -m xai_audio_deepfakes_tpu.cli datagen  --metadata m.txt ...
  python -m xai_audio_deepfakes_tpu.cli train-detector --features X.npz
  python -m xai_audio_deepfakes_tpu.cli serve    --artifacts dir
  python -m xai_audio_deepfakes_tpu.cli serve-api --port 8080
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _build_pipeline(args):
    import jax

    from xai_audio_deepfakes_tpu.config import (
        EmbedderConfig,
        FeatDecoderConfig,
        PipelineConfig,
        STFTConfig,
        TrainConfig,
        UNetConfig,
    )
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline

    cfg = PipelineConfig(
        stft=STFTConfig(use_pallas=getattr(args, "stft_pallas", False)),
        embedder=EmbedderConfig(
            dtype=args.dtype,
            scan_layers=getattr(args, "scan_layers", False),
            remat=getattr(args, "remat", False),
            remat_policy=getattr(args, "remat_policy", "full"),
            quant=getattr(args, "quant", "none"),
            gelu=getattr(args, "gelu", "exact"),
            fused_ln_gelu=getattr(args, "fused_ln_gelu", False),
        ),
        unet=UNetConfig(quant=getattr(args, "unet_quant", "none")),
        feat_decoder=FeatDecoderConfig(
            hidden=getattr(args, "feat_hidden", 512),
            temporal_blocks=getattr(args, "feat_temporal_blocks", 2),
            attn_layers=getattr(args, "feat_attn_layers", 0),
        ),
        train=TrainConfig(
            target_quant=getattr(args, "target_quant", "none"),
            target_gelu=getattr(args, "target_gelu", "exact"),
            checkpoint_every=getattr(args, "checkpoint_every", 1),
            freeze_l1_weight=getattr(args, "freeze_l1_w", False),
        ),
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(args.seed))
    if args.embedder_dir:
        from xai_audio_deepfakes_tpu.models.wav2vec2 import params_from_hf_dir

        params["encoder"] = params_from_hf_dir(args.embedder_dir, cfg.embedder)
    if args.logreg_joblib:
        from xai_audio_deepfakes_tpu.models.logreg import logreg_params_from_any

        params["logreg"] = logreg_params_from_any(args.logreg_joblib)
    if args.checkpoint:
        from xai_audio_deepfakes_tpu.train.train_addvisor import (
            decoder_params_key,
            restore_decoder_for_inference,
        )

        # eval/explain --decoder picks which decoder the checkpoint holds;
        # subcommands without that flag restore the UNet (the reference
        # trainer's decoder)
        dec = getattr(args, "decoder", "unet")
        params[decoder_params_key(dec)] = restore_decoder_for_inference(
            args.checkpoint, pipe, params, dec
        )
    if getattr(args, "unet_pth", ""):
        import torch

        from xai_audio_deepfakes_tpu.models.unet import (
            params_from_torch_state_dict as unet_from_torch,
        )

        sd = torch.load(args.unet_pth, map_location="cpu")
        params["unet"] = unet_from_torch(sd)
    if cfg.embedder.quant == "int8-static":
        # calibrate AFTER every weight import (the scales depend on the
        # final weights): --calib-wavs corpus if given, else a
        # deterministic synthetic speech batch
        import glob as _glob

        import jax.numpy as jnp

        from xai_audio_deepfakes_tpu.data.synthetic import speechlike_clips

        calib_dir = getattr(args, "calib_wavs", "")
        if calib_dir:
            from xai_audio_deepfakes_tpu.data.io import load_audio

            paths = sorted(_glob.glob(os.path.join(calib_dir, "*.wav")))[:64]
            if not paths:
                raise SystemExit(f"--calib-wavs {calib_dir}: no .wav files")
            wavs = np.stack([load_audio(p)[0] for p in paths])
        else:
            wavs = speechlike_clips(
                np.random.default_rng(args.seed), 16,
                cfg.audio.num_samples, cfg.stft.sample_rate,
            )
        params = pipe.calibrate_quant(params, jnp.asarray(wavs))
    return pipe, params


def _load_hifigan(args, pipe, params):
    """Ensure a HiFi-GAN param subtree exists (random-init or torch/
    SpeechBrain checkpoint import via --hifigan-ckpt)."""
    import jax

    if "hifigan" not in params:
        params["hifigan"] = pipe.hifigan.init(
            jax.random.PRNGKey(args.seed),
            np.zeros((1, pipe.cfg.mel.n_mels, 8), np.float32),
        )
    if getattr(args, "hifigan_ckpt", ""):
        import torch

        from xai_audio_deepfakes_tpu.models.hifigan import params_from_torch_state_dict

        sd = torch.load(args.hifigan_ckpt, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        params["hifigan"] = params_from_torch_state_dict(sd, pipe.cfg.hifigan)
    return params


def _common(p: argparse.ArgumentParser):
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument(
        "--scan-layers", action="store_true",
        help="lax.scan over embedder layers (much faster XLA compiles; "
             "identical numerics; stacked param layout)",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize embedder layers — required headroom for "
             "full-geometry training (3 fwd + 2 bwd per step) on 16 GB HBM",
    )
    p.add_argument(
        "--remat-policy", default="full", choices=["full", "dots"],
        help="with --remat: 'full' recomputes whole layers in backward "
             "(min memory); 'dots' keeps matmul outputs and recomputes only "
             "elementwise chains (faster steps, ~1-2 GB more HBM)",
    )
    p.add_argument(
        "--quant", default="none", choices=["none", "int8", "int8-static"],
        help="int8: embedder transformer matmuls on the int8 MXU "
             "(~2x bf16 peak; serving only). int8-static: same matmuls "
             "with CALIBRATED per-tensor activation scales instead of "
             "per-token dynamic ones — measured +9%% end-to-end "
             "(250.5 vs 229.7 clips/s, docs/performance.md); calibrates "
             "at startup on --calib-wavs or a synthetic speech batch",
    )
    p.add_argument(
        "--calib-wavs", default="",
        help="--quant int8-static: directory of wavs to calibrate the "
             "static activation scales on (first 64 used); default: a "
             "deterministic synthetic speech batch",
    )
    p.add_argument(
        "--gelu", default="exact", choices=["exact", "tanh"],
        help="tanh: GELU approximation, 2.25x faster on the VPU, max abs "
             "err 5e-4 (~bf16 rounding; GELU is ~25%% of serving time)",
    )
    p.add_argument(
        "--unet-quant", default="none", choices=["none", "int8"],
        help="int8: UNet mask-decoder convs on the int8 MXU (serving only; "
             "unlike --quant this perturbs the mask itself — bounds in "
             "tests/test_models.py)",
    )
    p.add_argument(
        "--stft-pallas", action="store_true",
        help="TPU: forward STFT via the fused Pallas framing+DFT kernel "
             "(VMEM-resident frames) instead of the chunk-stream matmul-DFT; "
             "measured at parity (docs/performance.md). CPU: no-op fallback.",
    )
    p.add_argument(
        "--fused-ln-gelu", action="store_true",
        help="TPU: conv-frontend LayerNorm+GELU as one fused Pallas pass "
             "(one HBM read + one write over the graph's largest "
             "activations). CPU: no-op fallback to the identical XLA math.",
    )
    p.add_argument("--embedder-dir", default="", help="local HF checkpoint dir")
    p.add_argument(
        "--logreg-joblib",
        default="",
        help="detector weights: sklearn joblib checkpoint, or the .npz "
        "written by train-detector",
    )
    p.add_argument("--checkpoint", default="", help="orbax UNet checkpoint dir")
    p.add_argument(
        "--unet-pth", default="",
        help="reference-trained torch .pth UNet decoder "
             "(`addvisor.py` format, e.g. addvisor_epoch_89_loss_0.0177.pth; "
             "DDP 'module.' prefixes handled)",
    )
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--out", default="artifacts")
    # legacy feature-decoder capacity knobs (round-5 study): must match
    # between training (closed-loop) and any command restoring a
    # `--decoder features` checkpoint, so they live on every pipeline
    # builder. Defaults reproduce the round-4 architecture/tree.
    p.add_argument(
        "--feat-hidden", type=int, default=512,
        help="feature decoder hidden width",
    )
    p.add_argument(
        "--feat-temporal-blocks", type=int, default=2,
        help="feature decoder: k5 residual conv blocks over frames",
    )
    p.add_argument(
        "--feat-attn-layers", type=int, default=0,
        help="feature decoder: self-attention+FFN blocks after the conv "
             "stack (global frame context; 0 = the round-4 architecture)",
    )


def _mesh_flags(p: argparse.ArgumentParser):
    p.add_argument(
        "--data-parallel", type=int, default=0, metavar="DP",
        help="shard over a dp x tp device mesh: batch over 'data', GSPMD "
             "collectives over ICI (0 = all devices / --model-parallel; "
             "omit both flags for single-device)",
    )
    p.add_argument(
        "--model-parallel", type=int, default=0, metavar="TP",
        help="tensor-parallel ways for the embedder within the mesh",
    )
    p.add_argument(
        "--pipeline-stages", type=int, default=0, metavar="PP",
        help="pipeline-parallel stages for the embedder layer stack "
             "(shard_map+ppermute rotation; needs --scan-layers and "
             "output_layer %% PP == 0; composes with --model-parallel "
             "into a dp x pp x tp mesh)",
    )


def _mesh_from_args(args):
    """Build the ('data','model'), ('data','stage'), or
    ('data','stage','model') mesh requested via --data-parallel /
    --model-parallel / --pipeline-stages, or None when no flag is set."""
    pp = getattr(args, "pipeline_stages", 0)
    if not (
        getattr(args, "data_parallel", 0)
        or getattr(args, "model_parallel", 0)
        or pp
    ):
        return None
    import jax

    from xai_audio_deepfakes_tpu.config import MeshConfig
    from xai_audio_deepfakes_tpu.parallel.mesh import make_mesh

    if pp > 1:
        import numpy as _np
        from jax.sharding import Mesh

        mp = args.model_parallel or 1
        dp = args.data_parallel or max(1, len(jax.devices()) // (pp * mp))
        if dp * pp * mp > len(jax.devices()):
            raise SystemExit(
                f"--data-parallel {dp} x --pipeline-stages {pp}"
                + (f" x --model-parallel {mp}" if mp > 1 else "")
                + f" needs {dp * pp * mp} devices, have {len(jax.devices())}"
            )
        if mp > 1:
            # all three axes on one mesh: the layer stack rotates over
            # 'stage' while its Megatron kernel dims shard over 'model'
            # (GSPMD-auto inside the pipeline shard_map, parallel/pipeline.py)
            return Mesh(
                _np.asarray(jax.devices()[: dp * pp * mp]).reshape(dp, pp, mp),
                ("data", "stage", "model"),
            )
        return Mesh(
            _np.asarray(jax.devices()[: dp * pp]).reshape(dp, pp),
            ("data", "stage"),
        )

    mp = args.model_parallel or 1
    dp = args.data_parallel or max(1, len(jax.devices()) // mp)
    if dp * mp > len(jax.devices()):
        raise SystemExit(
            f"--data-parallel {dp} x --model-parallel {mp} needs "
            f"{dp * mp} devices, have {len(jax.devices())}"
        )
    return make_mesh(MeshConfig(model_parallel=mp), devices=jax.devices()[: dp * mp])


def _batches(args, paths, pipe=None, drop_remainder=False):
    from xai_audio_deepfakes_tpu.data.datasets import AudioBatcher

    kw = {}
    if pipe is not None:  # honor a non-default clip contract
        kw = dict(
            sample_rate=pipe.cfg.audio.sample_rate,
            clip_seconds=pipe.cfg.audio.clip_seconds,
        )
    return AudioBatcher(
        paths, batch_size=args.batch_size, root=args.root, shuffle=False,
        drop_remainder=drop_remainder, **kw,
    )


def cmd_explain(args):
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.config import MaskingConvention
    from xai_audio_deepfakes_tpu.data.io import load_audio, write_wav
    from xai_audio_deepfakes_tpu.serve.viewer import build_gallery
    from xai_audio_deepfakes_tpu.train.artifacts import (
        save_mask_png,
        save_spectrogram_png,
    )

    # fail fast on bad inputs BEFORE the (expensive) model construction
    missing = [p for p in args.wav if not os.path.exists(p)]
    if missing:
        print(f"error: wav file(s) not found: {', '.join(missing)}", file=sys.stderr)
        return 2

    import jax

    pipe, params = _build_pipeline(args)
    if args.synthesize:
        # wav -> mask -> masked iSTFT -> mel -> HiFi-GAN as ONE jitted graph
        # (SURVEY §7 step 8; `pipeline/core.py::explain_vocoded`)
        _load_hifigan(args, pipe, params)
        explain = pipe.jit_explain_vocoded(
            decoder=args.decoder, masking=MaskingConvention(args.masking)
        )
    else:
        explain = pipe.jit_explain(
            decoder=args.decoder, masking=MaskingConvention(args.masking)
        )
    os.makedirs(args.out, exist_ok=True)
    results = []
    items = []  # (stem, source, wav[80000])
    for path in args.wav:
        base = os.path.splitext(os.path.basename(path))[0]
        if args.chunk_long:
            from xai_audio_deepfakes_tpu.data.io import load_audio_chunks

            chunks, starts = load_audio_chunks(
                path, clip_seconds=pipe.cfg.audio.clip_seconds
            )
            for i, (chunk, s) in enumerate(zip(chunks, starts)):
                suffix = f"_chunk{i}" if len(chunks) > 1 else ""
                items.append((f"{base}{suffix}", f"{path}@{int(s)}", chunk))
        else:
            items.append((base, path, load_audio(path)[0]))
    # fixed-shape batched dispatches: pad the tail so every call hits the
    # same compiled program (one compile, full MXU batches)
    bs = max(1, args.batch_size)
    outs, vocs = [], []
    for i in range(0, len(items), bs):
        group = items[i : i + bs]
        rows = np.zeros((bs, pipe.cfg.audio.num_samples), np.float32)
        for j, (_, _, w) in enumerate(group):
            rows[j] = w
        if args.synthesize:
            out, voc = explain(params, jnp.asarray(rows))
            vocs.extend(np.asarray(voc[j]) for j in range(len(group)))
        else:
            out = explain(params, jnp.asarray(rows))
            vocs.extend([None] * len(group))
        outs.extend(
            jax.tree.map(lambda x, j=j: np.asarray(x[j : j + 1]), out)
            for j in range(len(group))
        )
    for (stem, path, wav), out, voc in zip(items, outs, vocs):
        write_wav(os.path.join(args.out, f"{stem}_original.wav"), wav)
        write_wav(
            os.path.join(args.out, f"{stem}_explanation.wav"),
            np.asarray(out.relevant_wav[0]),
        )
        if voc is not None:
            write_wav(
                os.path.join(args.out, f"{stem}_explanation_vocoded.wav"),
                voc,
            )
        mag = np.asarray(out.magnitude[0])
        mask = np.asarray(out.mask[0])
        save_spectrogram_png(mag, os.path.join(args.out, f"{stem}_spec.png"))
        save_mask_png(mask, os.path.join(args.out, f"{stem}_mask.png"))
        save_mask_png(1 - mask, os.path.join(args.out, f"{stem}_mask_compl.png"))
        save_spectrogram_png(
            mask * np.log1p(mag), os.path.join(args.out, f"{stem}_spec_masked.png"),
            log1p=False,
        )
        save_spectrogram_png(
            (1 - mask) * np.log1p(mag),
            os.path.join(args.out, f"{stem}_spec_masked_compl.png"), log1p=False,
        )
        results.append(
            {
                "source": path,
                "original_audio": f"{stem}_original.wav",
                "reconstructed_audio": f"{stem}_explanation.wav",
                "spectrogram_img": f"{stem}_spec.png",
                "mask_img": f"{stem}_mask.png",
                "mask_compl_img": f"{stem}_mask_compl.png",
                "masked_spectrogram_img": f"{stem}_spec_masked.png",
                "compl_masked_spectrogram_img": f"{stem}_spec_masked_compl.png",
                "pred_original": float(out.probs_clean[0, 0]),
                "pred_reconstructed_mask": float(out.probs_relevant[0, 0]),
                "pred_reconstructed_1mask": float(out.probs_irrelevant[0, 0]),
            }
        )
    index = build_gallery(results, args.out, polarity=pipe.cfg.polarity.value)
    print(json.dumps({"explained": len(results), "gallery": index}))


def cmd_train(args):
    from xai_audio_deepfakes_tpu.data.datasets import extract_wavs
    from xai_audio_deepfakes_tpu.train.artifacts import save_mask_png
    from xai_audio_deepfakes_tpu.train.checkpoints import (
        latest_checkpoint,
        parse_checkpoint_name,
        restore_checkpoint,
        save_checkpoint,
    )
    from xai_audio_deepfakes_tpu.train.train_addvisor import train_addvisor
    from xai_audio_deepfakes_tpu.utils.logging import JSONLLogger

    # fail fast on bad flags/paths BEFORE the expensive model build
    mesh = _mesh_from_args(args)
    if mesh is not None:
        need = mesh.devices.shape[0] * int(mesh.shape.get("stage", 1))
        if args.batch_size % need:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of "
                f"data-parallel x stages = {need}"
            )
    pipe, params = _build_pipeline(args)
    paths = extract_wavs(args.metadata)
    if args.limit:
        paths = paths[: args.limit]
    logger = JSONLLogger(os.path.join(args.out, "train_log.jsonl"))

    resume_state = None
    if args.resume:
        ckpt = latest_checkpoint(os.path.join(args.out, "ckpts"))
        if ckpt is not None:
            from xai_audio_deepfakes_tpu.train.train_addvisor import (
                init_train_state,
                make_optimizers,
            )

            tx_m, tx_w = make_optimizers(pipe.cfg)
            template = init_train_state(
                pipe, params, tx_m, tx_w, args.train_decoder
            )
            resume_state = restore_checkpoint(ckpt, template)
            logger({"resumed_from": ckpt, "epoch": parse_checkpoint_name(ckpt)[0]})

    # artifact saves run on one worker thread: the device->host mask copy,
    # the loss-scalar floats, and the matplotlib render all come off the
    # dispatch path (they cost ~0.5 s/epoch synchronously — a large slice
    # of a ~1.3 s epoch; the reference renders inline, train_addvisor.py:367)
    from concurrent.futures import ThreadPoolExecutor

    artifact_pool = ThreadPoolExecutor(max_workers=1)
    artifact_futures = []

    def artifact_fn(epoch, mask, aux):
        l_in, l_out, l1 = aux["l_in"], aux["l_out"], aux["l1"]

        def _save():
            save_mask_png(
                np.asarray(mask),
                os.path.join(args.out, f"{epoch + 1}_explanation.png"),
                title=(
                    f"L_in = {float(l_in):.6f}, L_out = {float(l_out):.6f}, "
                    f"L1 = {float(l1):.6f}"
                ),
            )

        artifact_futures.append(artifact_pool.submit(_save))

    # checkpoints also go through a worker: orbax's async_save only
    # backgrounds the disk write — the device->host copy of the train state
    # (~90 MB over this tunneled link) is synchronous at call time and was
    # measured at ~2 s/epoch of the steady-state wall. The trainer hands us
    # a private on-device snapshot (never donated), so the copy is safe off
    # the dispatch thread.
    ckpt_pool = ThreadPoolExecutor(max_workers=1)
    ckpt_futures = []

    def checkpoint_fn(epoch, state, loss):
        # bound in-flight checkpoints to ONE: each pending save pins an
        # on-device state snapshot (~90 MB at full geometry); letting fast
        # epochs outrun slow tunnel transfers piles snapshots up until HBM
        # RESOURCE_EXHAUSTs (measured). The trainer prestarts the snapshot's
        # host DMA, so this wait is usually near-zero.
        if ckpt_futures:
            ckpt_futures[-1].result()
        ckpt_futures.append(
            ckpt_pool.submit(
                save_checkpoint,
                os.path.join(args.out, "ckpts"), epoch, loss, state,
                True,  # async_save: disk write overlaps too
            )
        )

    from xai_audio_deepfakes_tpu.data.prefetch import prefetch_to_device

    batch_shard = None
    if mesh is not None:
        from xai_audio_deepfakes_tpu.parallel.mesh import batch_sharding

        batch_shard = batch_sharding(mesh)

    state = train_addvisor(
        pipe, params,
        batches=lambda: prefetch_to_device(
            # mesh batches must keep the dp-divisible shape -> drop the tail
            _batches(args, paths, pipe, drop_remainder=mesh is not None),
            size=2,
            sharding=batch_shard,
        ),
        num_epochs=args.epochs,
        mesh=mesh,
        log_fn=logger,
        artifact_fn=artifact_fn,
        checkpoint_fn=checkpoint_fn,
        initial_state=resume_state,
        decoder=args.train_decoder,
    )
    from xai_audio_deepfakes_tpu.train.checkpoints import wait_for_saves

    for f in artifact_futures + ckpt_futures:  # surface save errors
        f.result()
    artifact_pool.shutdown()
    ckpt_pool.shutdown()
    wait_for_saves()
    print(json.dumps({"trained_steps": int(state.step)}))


def cmd_eval(args):
    from xai_audio_deepfakes_tpu.config import MaskingConvention
    from xai_audio_deepfakes_tpu.data.datasets import extract_wavs
    from xai_audio_deepfakes_tpu.metrics.harness import run_explanation_metrics

    # fail fast on bad flags/paths BEFORE the expensive model build
    mesh = _mesh_from_args(args)
    paths = extract_wavs(args.metadata)
    if args.limit:
        paths = paths[: args.limit]
    pipe, params = _build_pipeline(args)
    drop = False
    if mesh is not None:
        dp = mesh.devices.shape[0]
        # a 'stage' mesh additionally splits each per-dp slice into PP
        # microbatches, so the batch must divide by dp x stages
        need = dp * int(mesh.shape.get("stage", 1))
        if args.batch_size % need:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of "
                f"data-parallel x stages = {need}"
            )
        if len(paths) % args.batch_size:
            drop = True  # ragged tail can't shard over 'data'
            print(
                f"note: dropping {len(paths) % args.batch_size} tail clip(s) "
                f"so every batch shards dp={dp}",
                file=sys.stderr,
            )
    result = run_explanation_metrics(
        pipe, params, _batches(args, paths, pipe, drop_remainder=drop),
        decoder=args.decoder, masking=MaskingConvention(args.masking),
        mesh=mesh,
    )
    print(json.dumps(result))


def cmd_attrib(args):
    from xai_audio_deepfakes_tpu.data.datasets import extract_wavs
    from xai_audio_deepfakes_tpu.metrics.harness import run_attribution_metrics

    pipe, params = _build_pipeline(args)
    paths = extract_wavs(args.metadata)
    if args.limit:
        paths = paths[: args.limit]

    artifact_fn = None
    records: list[dict] = []
    if args.save_artifacts:
        # per-file artifacts (`captum_saliency.py:136-166`): listenable
        # relevant/irrelevant waveforms, original/relevant/irrelevant
        # spectrogram PNGs, and the waveform-mask line plot, fed into the
        # same gallery the explain path uses
        from xai_audio_deepfakes_tpu.data.io import write_wav
        from xai_audio_deepfakes_tpu.ops.stft import stft_magnitude_phase
        from xai_audio_deepfakes_tpu.train.artifacts import (
            save_spectrogram_png,
            save_waveform_mask_png,
        )

        import jax

        os.makedirs(args.out, exist_ok=True)
        spec_of = jax.jit(
            lambda w: stft_magnitude_phase(w, pipe.cfg.stft)[2]
        )
        counter = {"i": 0}
        limit = args.artifact_limit

        def artifact_fn(wav, mask, rel, irr, p_clean, p_rel, p_irr):
            for j in range(wav.shape[0]):
                i = counter["i"]
                counter["i"] += 1
                if i >= len(paths) or (limit and i >= limit):
                    return
                stem = os.path.splitext(os.path.basename(paths[i]))[0]
                stem = f"{stem}_{args.method}"
                write_wav(os.path.join(args.out, f"{stem}_original.wav"), wav[j])
                write_wav(os.path.join(args.out, f"{stem}_relevant.wav"), rel[j])
                write_wav(os.path.join(args.out, f"{stem}_irrelevant.wav"), irr[j])
                mags = np.asarray(spec_of(jnp.asarray(wav[j : j + 1])))[0]
                mags_r = np.asarray(spec_of(jnp.asarray(rel[j : j + 1])))[0]
                mags_i = np.asarray(spec_of(jnp.asarray(irr[j : j + 1])))[0]
                save_spectrogram_png(
                    mags, os.path.join(args.out, f"{stem}_spec.png")
                )
                save_spectrogram_png(
                    mags_r, os.path.join(args.out, f"{stem}_spec_relevant.png"),
                    title="Relevant (wav x mask)",
                )
                save_spectrogram_png(
                    mags_i, os.path.join(args.out, f"{stem}_spec_irrelevant.png"),
                    title="Irrelevant (wav x (1 - mask))",
                )
                save_waveform_mask_png(
                    mask[j], os.path.join(args.out, f"{stem}_wavmask.png"),
                    wav=wav[j], title=f"{args.method} attribution mask",
                )
                records.append(
                    {
                        "source": paths[i],
                        "original_audio": f"{stem}_original.wav",
                        "reconstructed_audio": f"{stem}_relevant.wav",
                        "spectrogram_img": f"{stem}_spec.png",
                        "mask_img": f"{stem}_wavmask.png",
                        "masked_spectrogram_img": f"{stem}_spec_relevant.png",
                        "compl_masked_spectrogram_img": f"{stem}_spec_irrelevant.png",
                        "pred_original": float(p_clean[j, 0]),
                        "pred_reconstructed_mask": float(p_rel[j, 0]),
                        "pred_reconstructed_1mask": float(p_irr[j, 0]),
                    }
                )

    import jax.numpy as jnp

    result = run_attribution_metrics(
        pipe, params, _batches(args, paths, pipe), method=args.method,
        artifact_fn=artifact_fn,
    )
    if records:
        from xai_audio_deepfakes_tpu.serve.viewer import build_gallery

        result["gallery"] = build_gallery(
            records, args.out, polarity=pipe.cfg.polarity.value
        )
        result["artifacts"] = len(records)
    print(json.dumps(result))


def cmd_datagen(args):
    """Band-splice dataset generation (`train_logReg_swapping.py:29-102`)."""
    import jax
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.data.bandswap import generate_band_swap_features
    from xai_audio_deepfakes_tpu.data.datasets import extract_wavs
    from xai_audio_deepfakes_tpu.data.io import load_audio
    from xai_audio_deepfakes_tpu.utils.logging import JSONLLogger

    pipe, params = _build_pipeline(args)
    paths = extract_wavs(args.metadata)
    if args.limit:
        paths = paths[: args.limit]
    logger = JSONLLogger(None)

    # params as argument, not closure (closed-over weights inline into the
    # HLO as giant literal constants)
    @jax.jit
    def _embed(params, wavs):
        return jnp.mean(pipe.features(params, wavs), axis=1)

    def embed_fn(wavs):
        return _embed(params, wavs)

    def pairs():
        for p in paths:
            real = load_audio(os.path.join(args.root, p))[0]
            voc_path = os.path.join(args.vocoded_root, p + "_vocoded.wav")
            if not os.path.exists(voc_path):
                voc_path = os.path.join(args.vocoded_root, p)
            if not os.path.exists(voc_path):
                continue
            yield real, load_audio(voc_path)[0]

    x, y = generate_band_swap_features(pairs(), embed_fn, log_fn=logger)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "band_swap_features.npz"), X=x, y=y)
    print(json.dumps({"X_shape": list(x.shape), "labels": int(y.sum())}))


def cmd_embed(args):
    """Batched SSL feature extraction over a corpus (BASELINE config 2):
    wav folder/metadata -> mean-pooled embeddings npz + per-clip detector
    scores (the `collate_fn` capability, `train_addvisor.py:247-260`)."""
    import jax
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.data.datasets import extract_wavs

    pipe, params = _build_pipeline(args)
    paths = extract_wavs(args.metadata)
    if args.limit:
        paths = paths[: args.limit]

    @jax.jit
    def embed(params, wavs):
        feats = pipe.features(params, wavs)
        pooled = jnp.mean(feats, axis=1)
        logits, probs = pipe.classify_features(params, feats)
        # the hot loop keeps only the pooled outputs: returning the full
        # [B, T, H] feature map here would force XLA to materialize it as
        # an output buffer on every batch for a value only the optional
        # first-batch PNG dump reads (it re-extracts via a separate jit)
        return pooled, logits, probs

    feats_all, probs_all, names = [], [], []
    n = 0
    for wav in _batches(args, paths, pipe):
        wavs = jnp.asarray(wav)
        pooled, logits, probs = embed(params, wavs)
        if n == 0 and getattr(args, "features_png", False):
            # feature-map visual dump (`train_addvisor.py:59-94` plot_features)
            from xai_audio_deepfakes_tpu.train.artifacts import save_features_png

            feats0 = jax.jit(pipe.features)(params, wavs[:1])
            os.makedirs(args.out, exist_ok=True)
            save_features_png(
                np.asarray(feats0[0]),
                os.path.join(args.out, "features.png"),
                title=os.path.basename(paths[0]),
            )
        feats_all.append(np.asarray(pooled))
        probs_all.append(np.asarray(probs))
        names.extend(paths[n : n + wav.shape[0]])
        n += wav.shape[0]
    os.makedirs(args.out, exist_ok=True)
    np.savez(
        os.path.join(args.out, "embeddings.npz"),
        features=np.concatenate(feats_all),
        probs=np.concatenate(probs_all),
        paths=np.asarray(names),
    )
    print(json.dumps({"embedded": n, "dim": int(feats_all[0].shape[1])}))


def cmd_vocode_datagen(args):
    """Vocoded band-spliced dataset generation (`hifigan.py:91-230`)."""
    import jax

    from xai_audio_deepfakes_tpu.data.datasets import extract_wavs
    from xai_audio_deepfakes_tpu.data.vocoded import (
        generate_vocoded_dataset,
        make_vocoder_fn,
    )
    from xai_audio_deepfakes_tpu.utils.logging import JSONLLogger

    pipe, params = _build_pipeline(args)
    _load_hifigan(args, pipe, params)
    names = extract_wavs(args.metadata)
    if args.limit:
        names = names[: args.limit]
    n = generate_vocoded_dataset(
        names, args.root, args.out, make_vocoder_fn(pipe, params),
        log_fn=JSONLLogger(None),
    )
    print(json.dumps({"written": n}))


def cmd_train_detector(args):
    from xai_audio_deepfakes_tpu.models.logreg import logreg_params_save
    from xai_audio_deepfakes_tpu.train.train_logreg import train_detector

    z = np.load(args.features)
    params, metrics = train_detector(z["X"], z["y"], c=args.c)
    os.makedirs(args.out, exist_ok=True)
    logreg_params_save(params, os.path.join(args.out, "logreg_vocoded_anyband.npz"))
    print(json.dumps(metrics))


def cmd_closed_loop(args):
    """Closed-loop explanation-quality protocol: band-swap corpus with a
    KNOWN artifact band -> train the detector -> train the mask decoder
    against it -> verify the mask localizes the band and flips the detector
    on the complement (the product claim of `/root/reference/README.md:1-4`
    made checkable without external weights; `train/closed_loop.py`)."""
    from xai_audio_deepfakes_tpu.config import (
        EmbedderConfig,
        FeatDecoderConfig,
        LossConfig,
        MaskingConvention,
        PipelineConfig,
        STFTConfig,
        TrainConfig,
        UNetConfig,
    )
    from xai_audio_deepfakes_tpu.train.artifacts import (
        save_mask_png,
        save_spectrogram_png,
    )
    from xai_audio_deepfakes_tpu.train.closed_loop import run_closed_loop
    from xai_audio_deepfakes_tpu.utils.logging import JSONLLogger

    mesh = _mesh_from_args(args)
    cfg = PipelineConfig(
        stft=STFTConfig(use_pallas=args.stft_pallas),
        embedder=EmbedderConfig(
            dtype=args.dtype, scan_layers=args.scan_layers, remat=args.remat,
            remat_policy=args.remat_policy, gelu=args.gelu,
            fused_ln_gelu=args.fused_ln_gelu,
        ),
        unet=UNetConfig(quant=args.unet_quant),
        feat_decoder=FeatDecoderConfig(
            hidden=args.feat_hidden,
            temporal_blocks=args.feat_temporal_blocks,
            attn_layers=args.feat_attn_layers,
        ),
        train=TrainConfig(
            model_lr=args.model_lr,
            freeze_l1_weight=args.freeze_l1_w,
        ),
        loss=LossConfig(masking=MaskingConvention(args.loss_masking)),
    )
    os.makedirs(args.out, exist_ok=True)
    logger = JSONLLogger(os.path.join(args.out, "closed_loop_log.jsonl"))
    n_wavs = min(args.artifact_limit, 4)
    res = run_closed_loop(
        cfg, seed=args.seed, n_train=args.n_train, n_eval=args.n_eval,
        band=(args.band_lo, args.band_hi), epochs=args.epochs,
        batch_size=args.batch_size, noise_rms=args.noise_rms, mesh=mesh,
        log_fn=logger, keep_wavs=n_wavs, anyband=args.anyband,
        band_width=args.band_width, decoder=args.decoder,
        # traced, so it shares one compiled train step with any other
        # scale (incl. the benchmarks/l1_sweep.py points)
        l1_scale=args.l1_scale,
        l1_warmup_epochs=args.l1_warmup_epochs,
    )
    eval_bands = res.get("eval_bands_hz")
    masks, mags = res.pop("final_masks"), res.pop("final_magnitude")
    rel = res.pop("final_relevant_wavs", None)
    irr = res.pop("final_irrelevant_wavs", None)
    manip = res.pop("eval_manipulated", None)
    probs = res.pop("final_probs", None)
    state = res.pop("state", None)
    # the trained decoder, restorable by `cli eval/explain --checkpoint`
    # (`train/train_addvisor.py::restore_decoder_for_inference`)
    from xai_audio_deepfakes_tpu.train.checkpoints import (
        save_checkpoint,
        wait_for_saves,
    )

    if state is not None:
        log = res.get("train_log") or []
        final_loss = log[-1]["loss"] if log else 0.0
        save_checkpoint(
            os.path.join(args.out, "ckpts"), args.epochs, final_loss, state
        )
    from xai_audio_deepfakes_tpu.data.io import write_wav

    sr = cfg.audio.sample_rate
    for i in range(min(args.artifact_limit, len(masks))):
        lo, hi = (
            (eval_bands[i][0], eval_bands[i][1])
            if eval_bands
            else (args.band_lo, args.band_hi)
        )
        save_mask_png(
            masks[i], os.path.join(args.out, f"final_mask_{i}.png"),
            title=f"learned mask, artifact band {lo:.0f}-{hi:.0f} Hz",
        )
        save_spectrogram_png(
            mags[i], os.path.join(args.out, f"manipulated_spec_{i}.png"),
            title="manipulated clip |STFT|",
        )
    # the listenable product claim (`captum_saliency.py:136-143` shape):
    # manipulated input + what the mask keeps + what it removes
    gallery_items = []
    if rel is not None:
        eval_bands = res.get("eval_bands_hz")
        for i in range(len(rel)):
            write_wav(
                os.path.join(args.out, f"eval_{i}_manipulated.wav"),
                manip[i], sr,
            )
            write_wav(
                os.path.join(args.out, f"eval_{i}_relevant.wav"), rel[i], sr
            )
            write_wav(
                os.path.join(args.out, f"eval_{i}_irrelevant.wav"), irr[i], sr
            )
            if probs is None or i >= len(probs):
                continue
            band_txt = (
                f" (artifact band {eval_bands[i][0]:.0f}-"
                f"{eval_bands[i][1]:.0f} Hz)"
                if eval_bands
                else f" (artifact band {args.band_lo:.0f}-"
                     f"{args.band_hi:.0f} Hz)"
            )
            gallery_items.append({
                "source": f"held-out eval clip {i}{band_txt}",
                "original_audio": f"eval_{i}_manipulated.wav",
                "reconstructed_audio": f"eval_{i}_relevant.wav",
                "spectrogram_img": f"manipulated_spec_{i}.png",
                "mask_img": f"final_mask_{i}.png",
                "pred_original": float(probs[i, 0]),
                "pred_reconstructed_mask": float(probs[i, 1]),
                "pred_reconstructed_1mask": float(probs[i, 2]),
            })
    if gallery_items:
        # the same listening-study gallery `cli explain`/`cli serve` use
        # (`serve/viewer.py`), so the closed loop's held-out explanations
        # are browsable: `cli serve --artifacts <out>`
        from xai_audio_deepfakes_tpu.serve.viewer import build_gallery

        build_gallery(gallery_items, args.out, polarity=cfg.polarity.value)
    with open(os.path.join(args.out, "closed_loop.json"), "w") as f:
        json.dump(res, f, indent=1)
    wait_for_saves()
    print(json.dumps(res))


def cmd_serve(args):
    from xai_audio_deepfakes_tpu.serve.viewer import serve_gallery

    serve_gallery(args.artifacts, port=args.port)


def cmd_profile(args):
    """Per-stage timing breakdown (+ optional jax.profiler trace) of the
    explanation pipeline — the observability the reference lacks entirely
    (SURVEY §5: tqdm bars only)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from xai_audio_deepfakes_tpu.data.io import load_audio
    from xai_audio_deepfakes_tpu.utils.profiling import StageTimer, trace

    pipe, params = _build_pipeline(args)
    if args.wav:
        wavs = np.stack([load_audio(p)[0] for p in args.wav])
        reps = max(1, args.batch_size // wavs.shape[0])
        wavs = np.tile(wavs, (reps, 1))[: args.batch_size]
    else:
        wavs = (
            np.random.default_rng(args.seed)
            .standard_normal((args.batch_size, pipe.cfg.audio.num_samples))
            .astype(np.float32)
            * 0.1
        )
    wav = jnp.asarray(wavs)

    stages = {
        "stft": jax.jit(lambda w: pipe.spectrogram(w)),
        "embed": jax.jit(lambda p, w: pipe.features(p, w)),
        "mask_unet": jax.jit(
            lambda p, w: pipe.predict_mask(p, pipe.spectrogram(w)[2])
        ),
        "explain_full": pipe.jit_explain(decoder=args.decoder),
    }
    # compile outside the timed region
    for name, fn in stages.items():
        out = fn(params, wav) if name != "stft" else fn(wav)
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)

    # barrier = device-to-host copy of a TINY slice of the output: the device
    # stream is in-order, so this waits for the program without paying a
    # large-tensor transfer over the (possibly tunneled) link
    tiny = lambda x: np.asarray(x[(slice(0, 1),) * x.ndim])

    timer = StageTimer()
    ctx = trace(args.trace_dir) if args.trace_dir else contextlib.nullcontext()
    with ctx:
        for _ in range(args.iters):
            with timer.stage("stft", outputs=None):
                out = stages["stft"](wav)
                tiny(out[2])
            with timer.stage("embed", outputs=None):
                out = stages["embed"](params, wav)
                tiny(out)
            with timer.stage("mask_unet", outputs=None):
                out = stages["mask_unet"](params, wav)
                tiny(out)
            with timer.stage("explain_full", outputs=None):
                out = stages["explain_full"](params, wav)
                tiny(out.probs_relevant)
    summary = timer.summary()
    summary["batch"] = args.batch_size
    summary["device"] = str(jax.devices()[0])
    if args.trace_dir:
        summary["trace_dir"] = args.trace_dir
    print(json.dumps(summary))


def cmd_export(args):
    """AOT-compile the explain graph and write a self-contained serving
    artifact (StableHLO + weights + meta) — see `serve/export.py`."""
    from xai_audio_deepfakes_tpu.serve.export import save_exported

    pipe, params = _build_pipeline(args)
    platforms = tuple(p for p in args.platforms.split(",") if p) or None
    out = save_exported(
        args.out,
        pipe,
        params,
        batch_size=args.batch_size,
        decoder=args.decoder,
        masking=args.masking,
        platforms=platforms,
    )
    sizes = {
        f: os.path.getsize(os.path.join(out, f)) for f in sorted(os.listdir(out))
    }
    meta = json.load(open(os.path.join(out, "meta.json")))
    print(json.dumps({"artifact": out, "platforms": meta["platforms"],
                      "batch_size": args.batch_size, "files": sizes}))
    return 0


def cmd_serve_api(args):
    from xai_audio_deepfakes_tpu.serve.api import serve_api

    if args.exported:
        from xai_audio_deepfakes_tpu.config import PipelineConfig
        from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
        from xai_audio_deepfakes_tpu.serve.export import load_exported

        art = load_exported(args.exported)
        pipe = ADDvisorPipeline(PipelineConfig())
        if art.num_samples != pipe.cfg.audio.num_samples:
            raise SystemExit(
                f"artifact clip length {art.num_samples} != pipeline contract "
                f"{pipe.cfg.audio.num_samples}"
            )
        serve_api(
            pipe,
            art.params,
            port=args.port,
            batch_size=art.batch_size,
            linger_ms=args.linger_ms,
            decoder=art.meta.get("decoder", "unet"),
            explain_fn=lambda p, w: art._exported.call(p, w),
        )
        return
    pipe, params = _build_pipeline(args)
    serve_api(
        pipe,
        params,
        port=args.port,
        batch_size=args.batch_size,
        linger_ms=args.linger_ms,
        decoder=args.decoder,
    )


def _force_platform(name: str) -> None:
    """Pin the JAX backend before any jax use. Needed because environments
    that bake a platform via sitecustomize (e.g. a TPU relay) can override
    ``JAX_PLATFORMS`` set on the command line; ``jax.config`` wins."""
    import jax

    jax.config.update("jax_platforms", name)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="xai_audio_deepfakes_tpu")
    parser.add_argument(
        "--platform", default=os.environ.get("ADDVISOR_PLATFORM", ""),
        help="force the JAX backend (e.g. cpu, tpu); default: ambient. "
             "Also settable via ADDVISOR_PLATFORM.",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("explain", help="wav -> mask -> listenable explanation")
    _common(p)
    p.add_argument("--wav", nargs="+", required=True)
    p.add_argument("--decoder", default="unet", choices=["unet", "features"])
    p.add_argument("--masking", default="log1p", choices=["linear", "log1p"])
    p.add_argument(
        "--chunk-long", action="store_true",
        help="explain every 5 s window of long files (default: first 5 s, "
             "the reference behavior)",
    )
    p.add_argument(
        "--synthesize", action="store_true",
        help="also re-synthesize the explanation through HiFi-GAN "
             "(mel -> generator) into {stem}_explanation_vocoded.wav",
    )
    p.add_argument("--hifigan-ckpt", default="", help="torch generator state dict")
    p.set_defaults(fn=cmd_explain)

    p = sub.add_parser("train", help="train the mask decoder")
    _common(p)
    p.add_argument("--metadata", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument(
        "--train-decoder", default="unet", choices=["unet", "features"],
        dest="train_decoder",
        help="which mask decoder to train: the current-generation UNet "
             "(the reference trainer's decoder, train_addvisor.py:363) or "
             "the legacy feature-input decoder (LMAC_metrics.py:133 "
             "consumer; requires the frame-alignment contract)",
    )
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --out/ckpts")
    p.add_argument(
        "--checkpoint-every", type=int, default=1, metavar="N",
        help="checkpoint every N epochs (0 = never). Each save transfers "
             "the full train state off-device; on short synthetic epochs "
             "that transfer, not compute, bounds the epoch wall-clock",
    )
    p.add_argument(
        "--target-quant", default="none", choices=["none", "int8"],
        help="int8 MXU matmuls for the gradient-free target embed only "
             "(the collate-stage clean forward that produces y_hat); the "
             "differentiated graph stays exact. Measured +3%% step "
             "throughput; targets shift by quantization noise only.",
    )
    p.add_argument(
        "--target-gelu", default="exact", choices=["exact", "tanh"],
        help="tanh GELU for the target embed only (see --target-quant)",
    )
    _mesh_flags(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="faithfulness metric sweep")
    _common(p)
    p.add_argument("--metadata", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--decoder", default="unet", choices=["unet", "features"])
    p.add_argument("--masking", default="log1p", choices=["linear", "log1p"])
    p.add_argument("--limit", type=int, default=0)
    _mesh_flags(p)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("attrib", help="gradient-attribution metric sweep")
    _common(p)
    p.add_argument("--metadata", required=True)
    p.add_argument("--root", default="")
    p.add_argument(
        "--method", default="input_x_gradient",
        choices=["saliency", "input_x_gradient", "integrated_gradients",
                 "smoothgrad", "gradient_shap"],
    )
    p.add_argument("--limit", type=int, default=0)
    p.add_argument(
        "--save-artifacts", action="store_true",
        help="per-file artifacts into --out: relevant/irrelevant wavs, "
             "original/relevant/irrelevant spectrogram PNGs, waveform-mask "
             "plot, and a gallery index (`captum_saliency.py:136-166`)",
    )
    p.add_argument(
        "--artifact-limit", type=int, default=32,
        help="cap on clips that get artifacts (0 = all; metrics still "
             "cover every clip)",
    )
    p.set_defaults(fn=cmd_attrib)

    p = sub.add_parser("datagen", help="band-splice detector training data")
    _common(p)
    p.add_argument("--metadata", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--vocoded-root", required=True)
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_datagen)

    p = sub.add_parser("embed", help="batched SSL embeddings + detector scores")
    _common(p)
    p.add_argument("--metadata", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument(
        "--features-png", action="store_true",
        help="dump the first clip's [T, H] feature map as features.png "
             "(the reference's plot_features, train_addvisor.py:59-94)",
    )
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("vocode-datagen", help="HiFi-GAN vocoded band-splice wavs")
    _common(p)
    p.add_argument("--metadata", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--hifigan-ckpt", default="", help="torch generator state dict")
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_vocode_datagen)

    p = sub.add_parser("train-detector", help="fit the LogReg detector head")
    p.add_argument("--features", required=True, help="npz with X, y")
    p.add_argument("--c", type=float, default=1e6)
    p.add_argument("--out", default="artifacts")
    p.set_defaults(fn=cmd_train_detector)

    p = sub.add_parser(
        "closed-loop",
        help="explanation-quality capstone: known-band corpus -> detector "
             "-> mask decoder -> localization + flip verification",
    )
    _common(p)
    p.add_argument("--band-lo", type=float, default=2000.0)
    p.add_argument("--band-hi", type=float, default=3000.0)
    p.add_argument(
        "--anyband", action="store_true",
        help="draw the artifact band PER CLIP from the 1 kHz grid (the "
             "reference's anyband protocol, train_logReg_swapping.py:70-92) "
             "and score per-clip localization + input-dependence; "
             "--band-lo/--band-hi are ignored",
    )
    p.add_argument(
        "--band-width", type=float, default=1000.0,
        help="anyband grid band width in Hz (grid spans [0, 8000))",
    )
    p.add_argument(
        "--decoder", default="unet", choices=["unet", "features"],
        help="which mask decoder the loop trains: the current-generation "
             "UNet or the legacy feature-input decoder "
             "(LMAC_metrics.py:133 consumer)",
    )
    p.add_argument(
        "--loss-masking", default="linear", choices=["linear", "log1p"],
        help="masking convention for BOTH the training loss and the eval "
             "(linear = training convention loss_function.py:38-45; log1p = "
             "the eval/serving convention LMAC_metrics.py:136-153)",
    )
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-eval", type=int, default=16)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--noise-rms", type=float, default=1.0)
    p.add_argument(
        "--model-lr", type=float, default=3e-4,
        help="decoder Adam lr (the loop's short schedule wants a hotter lr "
             "than the reference's 3e-5 1000-epoch default)",
    )
    p.add_argument(
        "--l1-scale", type=float, default=None,
        help="multiplier on the L1 sparsity term (default: the exact "
             "reference formula, = 1.0). RECOMMENDED: 4 — measured "
             "strictly dominant on the anyband frontier (own-band IoU "
             "0.61 -> 0.80, out-of-band mask mass 0.171 -> 0.069, "
             "keep/flip/faithfulness unchanged; benchmarks/l1_sweep.py, "
             "docs/performance.md). The default stays 1.0 only for "
             "reference parity. Traced, not baked: different values "
             "share one compiled train step",
    )
    p.add_argument(
        "--freeze-l1-w", action="store_true",
        help="decouple the learnable loss weights from the L1 term: w[2] "
             "takes no gradient step and is excluded from the post-step "
             "renorm (l_in/l_out renormalize among themselves to sum 2). "
             "The 4x-scale l_out oscillation runs through this feedback "
             "loop (docs/performance.md); default off = exact reference "
             "dynamics (train_addvisor.py:379-380)",
    )
    p.add_argument(
        "--l1-warmup-epochs", type=int, default=0,
        help="ramp --l1-scale linearly from 1.0 (reference formula) over "
             "this many epochs. Measured at 4x scale: the ramp does NOT "
             "remove the l_out oscillation (same spike statistics as "
             "immediate pressure — the pressure LEVEL, not the schedule, "
             "drives it; docs/performance.md). Kept as a scheduling "
             "primitive; host-side scalar swap, zero recompiles",
    )
    p.add_argument("--artifact-limit", type=int, default=8)
    _mesh_flags(p)
    p.set_defaults(fn=cmd_closed_loop)

    p = sub.add_parser("serve", help="host the listening-study gallery")
    p.add_argument("--artifacts", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("profile", help="per-stage timings + jax.profiler trace")
    _common(p)
    p.add_argument("--wav", nargs="*", default=[])
    p.add_argument("--decoder", default="unet", choices=["unet", "features"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", default="", help="emit a jax.profiler trace here")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser(
        "serve-api", help="live explain API (micro-batched TPU serving)"
    )
    _common(p)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--decoder", default="unet", choices=["unet", "features"])
    p.add_argument("--linger-ms", type=float, default=5.0)
    p.add_argument(
        "--exported", default="",
        help="serve from an AOT artifact dir written by `export` (no model "
             "code or tracing; batch size/decoder come from its meta.json)",
    )
    p.set_defaults(fn=cmd_serve_api)

    p = sub.add_parser(
        "export",
        help="AOT-compile + serialize the explain graph (StableHLO artifact)",
    )
    _common(p)
    p.add_argument("--decoder", default="unet", choices=["unet", "features"])
    p.add_argument("--masking", default="log1p", choices=["linear", "log1p"])
    p.add_argument(
        "--platforms", default="",
        help="comma-separated lowering platforms baked into the artifact "
             "(default: the current backend; multi-platform requires an "
             "attention path every platform can lower — see serve/export.py)",
    )
    p.set_defaults(fn=cmd_export)

    args = parser.parse_args(argv)
    # int8 quantization is serving-only: jnp.round has zero gradient, so any
    # subcommand that differentiates through the embedder (trainer loss,
    # attribution maps) would silently produce garbage gradients.
    if getattr(args, "quant", "none") != "none" and args.fn in (
        cmd_train,
        cmd_attrib,
    ):
        parser.error(
            "--quant int8 is serving-only: quantized matmuls have zero "
            "gradient, so train/attrib would silently differentiate through "
            "a constant. Use --quant none for gradient-dependent commands."
        )
    # --unet-quant on the trainer would be silently ignored (the module takes
    # the float path when train=True); reject it so the flag is never a
    # silent no-op on the training graph. On subcommands whose graph never
    # instantiates the UNet (attrib/embed/datagen/vocode-datagen — the other
    # _common() consumers) it is also a no-op — warn rather than error there,
    # since the flag arrives via the shared _common() parser.
    if getattr(args, "unet_quant", "none") != "none":
        if args.fn is cmd_train:
            parser.error(
                "--unet-quant int8 is serving-only (the training graph needs "
                "gradients through the UNet; quantized convs have none)."
            )
        if args.fn in (
            cmd_attrib,
            cmd_embed,
            cmd_datagen,
            cmd_vocode_datagen,
        ):
            print(
                "warning: --unet-quant has no effect here — this subcommand's "
                "graph does not include the UNet mask decoder",
                file=sys.stderr,
            )
    if args.platform:
        _force_platform(args.platform)
    # compute subcommands compile large programs; reuse them across runs
    # (5-25 min fresh compiles through the tunneled TPU relay vs seconds
    # cached). Must come after the platform pin — the helper reads the
    # backend and stays off on CPU (see utils/cache.py). Allowlisted to the
    # subcommands that actually compile device programs worth caching:
    # `serve` is a pure host-side HTTP server and `train-detector` runs one
    # tiny L-BFGS fit, and the helper's backend probe would otherwise grab
    # the exclusive TPU client for their whole lifetime.
    if args.fn in (
        cmd_explain,
        cmd_train,
        cmd_eval,
        cmd_attrib,
        cmd_datagen,
        cmd_embed,
        cmd_vocode_datagen,
        cmd_closed_loop,
        cmd_profile,
        cmd_export,
        cmd_serve_api,
    ):
        from xai_audio_deepfakes_tpu.utils.cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
