"""Full-format weight-import rehearsal: every import path, one real command.

Round-5 VERDICT ask #6: the unit tests cover each converter (HF dir
round-trip, sklearn joblib, torch `.pth` UNet incl. DDP prefix,
SpeechBrain weight-norm HiFi-GAN) in isolation, but nothing exercised all
four through the real CLI on the real chip in one run — the exact command
a reference user migrating their trained assets would type. This driver
fabricates the four checkpoint formats at FULL geometry with random
weights (the real artifacts are environment-blocked: no network, no
reference weights — `classifier_embedder.py:12-16`, `LMAC_metrics.py:21`),
then invokes `cli explain --synthesize` as a subprocess with all four
import flags at once, and verifies the artifacts.

Usage:
  python benchmarks/import_rehearsal.py [--assets /tmp/rehearsal]
         [--out /tmp/rehearsal_out] [--tiny]

Prints one JSON line with the command, per-asset sizes, and the explain
output. Record in docs/migration.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_hf_dir(cfg, path: str) -> None:
    """Truncated-XLS-R-geometry HF checkpoint dir (config.json +
    safetensors), the format of the reference's local embedder dir."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    hf_cfg = Wav2Vec2Config(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    Wav2Vec2Model(hf_cfg).save_pretrained(path)


def build_joblib(dim: int, path: str) -> None:
    """sklearn LogisticRegression joblib — the reference's detector format
    (`classifier_embedder.py:12`)."""
    import joblib
    import numpy as np
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, dim)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int64)
    clf = LogisticRegression(C=1e6, max_iter=1000).fit(x, y)
    joblib.dump(clf, path)


def build_unet_pth(path: str) -> None:
    """Reference-layout UNet state dict WITH the DDP 'module.' prefix —
    the exact shape of its Accelerate-saved checkpoints
    (`LMAC_metrics.py:22-26`)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_models import _torch_ref_unet

    torch.manual_seed(0)
    ref = _torch_ref_unet()
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    torch.save(sd, path)


def build_hifigan_ckpt(cfg, path: str) -> None:
    """jik876/SpeechBrain-layout HiFi-GAN generator state dict with
    weight_norm parametrization (`hifigan.py:106-110`)."""
    import torch

    torch.manual_seed(0)
    sd = {}

    def wn_conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight_v"] = torch.randn(cout, cin, k) * 0.05
        sd[f"{prefix}.weight_g"] = torch.rand(cout, 1, 1) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(cout) * 0.01

    def wn_tconv(prefix, cin, cout, k):
        sd[f"{prefix}.weight_v"] = torch.randn(cin, cout, k) * 0.05
        sd[f"{prefix}.weight_g"] = torch.rand(cin, 1, 1) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(cout) * 0.01

    ch = cfg.upsample_initial_channel
    wn_conv("conv_pre", cfg.in_channels, ch, 7)
    c = ch
    n_res = len(cfg.resblock_kernel_sizes)
    for i, k in enumerate(cfg.upsample_kernel_sizes):
        wn_tconv(f"ups.{i}", c, c // 2, k)
        c //= 2
        for j, (rk, dil) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
        ):
            for t in range(len(dil)):
                wn_conv(f"resblocks.{i * n_res + j}.convs1.{t}", c, c, rk)
                wn_conv(f"resblocks.{i * n_res + j}.convs2.{t}", c, c, rk)
    wn_conv("conv_post", c, 1, 7)
    torch.save(sd, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="/tmp/import_rehearsal/assets")
    ap.add_argument("--out", default="/tmp/import_rehearsal/out")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry on CPU (test path)")
    args = ap.parse_args()

    if args.tiny:
        # pin CPU before anything imports jax — the tiny path must never
        # contend for the exclusive TPU client
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from xai_audio_deepfakes_tpu.config import EmbedderConfig, HiFiGANConfig

    if args.tiny:
        emb_cfg = EmbedderConfig.tiny()
        hg_cfg = HiFiGANConfig(
            in_channels=80,
            upsample_initial_channel=8,
            upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilations=((1, 3),),
        )
    else:
        emb_cfg = EmbedderConfig()
        hg_cfg = HiFiGANConfig()

    os.makedirs(args.assets, exist_ok=True)
    hf_dir = os.path.join(args.assets, "wav2vec2_truncated")
    jl = os.path.join(args.assets, "logReg_vocoded_anyband.joblib")
    unet = os.path.join(args.assets, "addvisor_epoch_89_loss_0.0177.pth")
    hg = os.path.join(args.assets, "hifigan_generator.pth")
    wav_path = os.path.join(args.assets, "clip.wav")

    t0 = time.perf_counter()
    if not os.path.isdir(hf_dir):
        build_hf_dir(emb_cfg, hf_dir)
    if not os.path.exists(jl):
        build_joblib(emb_cfg.hidden_size, jl)
    if not os.path.exists(unet) and not args.tiny:
        build_unet_pth(unet)
    if not os.path.exists(hg):
        build_hifigan_ckpt(hg_cfg, hg)
    if not os.path.exists(wav_path):
        import numpy as np

        from xai_audio_deepfakes_tpu.data.io import write_wav
        from xai_audio_deepfakes_tpu.data.synthetic import speechlike_clips

        n = 8000 if args.tiny else 80000
        sr = 16000
        clip = speechlike_clips(np.random.default_rng(0), 1, n, sr)[0]
        write_wav(wav_path, clip)
    build_s = time.perf_counter() - t0

    # the exact migration command (README "Weight import" / docs/migration.md)
    cmd = [
        sys.executable, "-m", "xai_audio_deepfakes_tpu.cli", "explain",
        "--wav", wav_path,
        "--embedder-dir", hf_dir,
        "--logreg-joblib", jl,
        "--hifigan-ckpt", hg,
        "--synthesize",
        "--scan-layers",
        "--out", args.out,
    ]
    if not args.tiny:
        cmd += ["--unet-pth", unet]
    env = dict(os.environ)
    if args.tiny:
        env["JAX_PLATFORMS"] = "cpu"
        # tiny geometry needs the tiny pipeline — the CLI builds full
        # geometry, so tiny mode only rehearses the ASSET formats the CLI
        # can actually consume at its geometry (joblib dims must match):
        # skip the CLI run and validate converters in-process instead
        import numpy as np

        from xai_audio_deepfakes_tpu.models.hifigan import (
            params_from_torch_state_dict,
        )
        from xai_audio_deepfakes_tpu.models.logreg import logreg_params_from_any
        from xai_audio_deepfakes_tpu.models.wav2vec2 import params_from_hf_dir

        enc = params_from_hf_dir(hf_dir, emb_cfg)
        det = logreg_params_from_any(jl)
        import torch

        sd = {k: v.numpy() for k, v in torch.load(hg, map_location="cpu").items()}
        hgp = params_from_torch_state_dict(sd, hg_cfg)
        print(json.dumps({
            "mode": "tiny-converters",
            "encoder_subtrees": sorted(enc["params"].keys()),
            "detector_dim": int(np.asarray(det["weight"]).shape[0]),
            "hifigan_subtrees": len(hgp["params"]),
            "build_seconds": round(build_s, 1),
        }))
        return

    t1 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    run_s = time.perf_counter() - t1
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    result = json.loads(tail) if tail.startswith("{") else {"raw": tail}
    sizes = {
        "hf_dir_mb": round(sum(
            os.path.getsize(os.path.join(hf_dir, f)) for f in os.listdir(hf_dir)
        ) / 1e6, 1),
        "joblib_kb": round(os.path.getsize(jl) / 1e3, 1),
        "unet_pth_mb": round(os.path.getsize(unet) / 1e6, 1),
        "hifigan_mb": round(os.path.getsize(hg) / 1e6, 1),
    }
    print(json.dumps({
        "command": " ".join(cmd),
        "rc": proc.returncode,
        "result": result,
        "assets": sizes,
        "build_seconds": round(build_s, 1),
        "run_seconds": round(run_s, 1),
        "stderr_tail": proc.stderr.strip().splitlines()[-3:]
        if proc.returncode else [],
    }))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
