"""Per-frame band-probe driver (round-5 VERDICT ask #2a).

Builds the anyband corpus at full truncated-XLS-R geometry, embeds the
manipulated clips, and fits linear probes from (a) mean-pooled and (b)
PER-FRAME SSL features to each clip's artifact-band class (1 kHz grid ->
8 classes), with a shuffled-label negative control — all held out by clip
(`train/band_probe.py`). Outcome decides the feature-decoder question:

  * frame_acc >> chance  -> per-frame band information exists; the legacy
    feature decoder's input-independent masks are an architecture/capacity
    failure -> scale `models/feat_decoder.py` and rerun the closed loop.
  * frame_acc ~= chance while mean_pool_acc is high -> the representation
    itself localizes only at the clip level; the decoder generation the
    reference deployed cannot localize regardless of capacity, which is
    measured support for its move to the magnitude-input UNet.

Usage: python benchmarks/frame_band_probe.py [--n 384] [--tiny]
Prints one JSON line; appends to --out (default docs/frame_band_probe.json).
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
    ap.add_argument("--n", type=int, default=384)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise-rms", type=float, default=1.0)
    ap.add_argument("--test-frac", type=float, default=0.25)
    ap.add_argument("--out", default="docs/frame_band_probe.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-geometry smoke (CPU) instead of full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xai_audio_deepfakes_tpu.config import EmbedderConfig, PipelineConfig
    from xai_audio_deepfakes_tpu.data.synthetic import make_anyband_corpus
    from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
    from xai_audio_deepfakes_tpu.train.band_probe import frame_band_probe

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        from tests.test_pipeline import tiny_config

        cfg = tiny_config()
        band_width, f_max = 200.0, 800.0
    else:
        cfg = PipelineConfig(
            embedder=EmbedderConfig(dtype="bfloat16", scan_layers=True),
        )
        band_width, f_max = 1000.0, 8000.0
        enable_persistent_compile_cache()

    rng = np.random.default_rng(args.seed)
    _, manip, bands = make_anyband_corpus(
        rng, args.n, cfg.audio.num_samples, cfg.stft,
        band_width, f_max, args.noise_rms,
    )
    band_cls = (bands[:, 0] // band_width).astype(np.int64)
    n_classes = int(f_max // band_width)

    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(args.seed))
    feats_fn = jax.jit(lambda p, w: pipe.features(p, w))

    out = []
    bs = args.batch_size
    for i in range(0, args.n, bs):
        chunk = manip[i : i + bs]
        k = len(chunk)
        if k < bs:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], bs - k, axis=0)]
            )
        out.append(
            np.asarray(feats_fn(params, jnp.asarray(chunk)))[:k]
        )
    feats = np.concatenate(out).astype(np.float32)

    report = frame_band_probe(
        feats, band_cls, n_classes,
        test_frac=args.test_frac, seed=args.seed,
    )
    report.update(
        {
            "geometry": "tiny" if args.tiny else "full",
            "n": args.n,
            "noise_rms": args.noise_rms,
            "embedder_params_seed": args.seed,
        }
    )
    print(json.dumps(report), flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)
    rows.append(report)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
