"""Sparsity/fidelity frontier: sweep the L1 mask penalty in the closed loop.

Round-3 verdict: the learned mask kept substantial out-of-band mass
(out_band_mean 0.232 at the default penalty) — the "relevant" wav still
carried most non-evidence content. This sweeps the L1 multiplier
(1.0 = exact reference formula, `loss_function.py:60`) through the anyband
closed loop, passing it as the TRACED `l1_scale` train-step input
(`train/train_addvisor.py`) so every point shares one compiled step
instead of baking a new constant (= a full multi-minute remote recompile)
per point.

Recorded result (docs/performance.md "Sparsity/fidelity frontier"): at
the headline budget, scale 4.0 strictly dominates — own-band IoU
0.61 -> 0.80, out-of-band mask mass 0.171 -> 0.069, keep/flip/FF
unchanged. Budget matters: at 1/3 the steps NO scale leaves the
dense-mask regime.

Usage:
  python benchmarks/l1_sweep.py [--scales 0.5,1,2,4] [--epochs 120]
         [--n-train 128] [--n-eval 64] [--out docs/closed_loop_anyband]

Prints one JSON line per point and writes l1_sweep.json to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xai_audio_deepfakes_tpu.utils.cache import enable_persistent_compile_cache  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="0.5,1,2,4")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-eval", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model-lr", type=float, default=3e-4)
    ap.add_argument("--out", default="docs/closed_loop_anyband")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-geometry smoke (CPU) instead of full")
    args = ap.parse_args()

    from xai_audio_deepfakes_tpu.config import (
        EmbedderConfig,
        PipelineConfig,
        TrainConfig,
    )
    from xai_audio_deepfakes_tpu.train.closed_loop import run_closed_loop

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from tests.test_pipeline import tiny_config

        base = tiny_config()
        band_kw = dict(band_width=200.0, f_max=800.0)
    else:
        base = PipelineConfig(
            embedder=EmbedderConfig(
                dtype="bfloat16", scan_layers=True, remat=True,
                remat_policy="dots",
            ),
        )
        band_kw = dict(band_width=1000.0, f_max=8000.0)
        enable_persistent_compile_cache()
    base = base.replace(train=TrainConfig(model_lr=args.model_lr))

    rows = []
    for scale in [float(s) for s in args.scales.split(",")]:
        # l1_scale rides as a TRACED step input (train_addvisor
        # frozen["l1_scale"]), so every sweep point after the first reuses
        # the same compiled train/eval programs — a config change here
        # would bake a new constant and recompile per point (measured:
        # ~8 min/point through the remote-compile relay).
        res = run_closed_loop(
            base, seed=args.seed, n_train=args.n_train, n_eval=args.n_eval,
            epochs=args.epochs, batch_size=args.batch_size, noise_rms=1.0,
            anyband=True, l1_scale=scale, **band_kw,
        )
        loc = res["after"]["localization"]
        row = {
            "l1_scale": scale,
            "own_iou": loc["own_iou_mean"],
            "other_iou": loc["other_iou_mean"],
            "own_in_band_mean": loc["own_in_band_mean"],
            "own_out_band_mean": loc["own_out_band_mean"],
            "cross_band_pair_iou": loc["cross_band_pair_iou"],
            "keep_rate": res["after"]["keep_rate"],
            "flip_rate": res["after"]["flip_rate"],
            "faithfulness": res["after"]["metrics"].get("faithfulness"),
            "final_loss": res["train_log"][-1]["loss"] if res["train_log"] else None,
            "final_l1": res["train_log"][-1]["l1"] if res["train_log"] else None,
            "final_w": res["train_log"][-1]["w"] if res["train_log"] else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "l1_sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
