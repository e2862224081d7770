"""Eval harnesses, detector trainer, CLI explain end-to-end, gallery builder."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import tiny_config
from xai_audio_deepfakes_tpu.metrics.harness import (
    run_attribution_metrics,
    run_explanation_metrics,
)
from xai_audio_deepfakes_tpu.pipeline.core import ADDvisorPipeline
from xai_audio_deepfakes_tpu.train.train_logreg import train_detector


@pytest.fixture(scope="module")
def setup():
    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    batches = [
        rng.standard_normal((2, pipe.cfg.audio.num_samples)).astype(np.float32) * 0.1
        for _ in range(2)
    ]
    return pipe, params, batches


def test_run_explanation_metrics(setup):
    pipe, params, batches = setup
    result = run_explanation_metrics(pipe, params, batches, decoder="unet")
    assert result["num_clips"] == 4
    for k in ("faithfulness", "fidelity", "average_drop", "average_increase", "average_gain"):
        assert np.isfinite(result[k])
    assert 0 <= result["fidelity"] <= 1


def test_run_explanation_metrics_sharded_matches(setup):
    """Mesh-sharded eval sweep == single-device sweep (config-5 scaling)."""
    from xai_audio_deepfakes_tpu.config import MeshConfig
    from xai_audio_deepfakes_tpu.parallel.mesh import make_mesh

    pipe, params, batches = setup
    mesh = make_mesh(MeshConfig(model_parallel=2), devices=jax.devices()[:4])
    single = run_explanation_metrics(pipe, params, batches)
    sharded = run_explanation_metrics(pipe, params, batches, mesh=mesh)
    assert sharded["num_clips"] == single["num_clips"]
    for k in ("faithfulness", "fidelity", "average_drop"):
        np.testing.assert_allclose(sharded[k], single[k], atol=1e-4)


def test_run_attribution_metrics(setup):
    pipe, params, batches = setup
    result = run_attribution_metrics(
        pipe, params, batches, method="input_x_gradient"
    )
    assert result["num_clips"] == 4
    assert 0 <= result["relevant_classified_manipulated"] <= 4
    assert np.isfinite(result["faithfulness"])


def test_train_detector_separable(rng):
    """LogReg trainer reaches ~perfect accuracy / ~0 EER on separable data and
    matches sklearn within tolerance on the same split."""
    n, d = 400, 8
    w = rng.standard_normal(d)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (x @ w > 0).astype(np.int64)
    params, metrics = train_detector(x, y, c=1e6)
    assert metrics["accuracy"] > 0.97
    assert metrics["eer"] < 0.05

    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(C=1e6, max_iter=10000).fit(x, y)
    w_ours = np.asarray(params["weight"])[:, 0]
    w_sk = clf.coef_[0]
    cos = np.dot(w_ours, w_sk) / (np.linalg.norm(w_ours) * np.linalg.norm(w_sk))
    assert cos > 0.999, cos


def test_cli_platform_flag(tmp_path, rng, capsys):
    """Global --platform pins the jax backend before any jax use (the baked
    axon sitecustomize overrides JAX_PLATFORMS, so the flag is the only
    reliable knob on relay-tunneled boxes)."""
    from xai_audio_deepfakes_tpu.cli.__main__ import main

    x = rng.standard_normal((60, 4)).astype(np.float32)
    y = (x @ np.array([1.0, -1, 1, -1]) > 0).astype(np.int64)
    feats = tmp_path / "fx.npz"
    np.savez(feats, X=x, y=y)
    import jax

    prev = jax.config.jax_platforms
    try:
        rc = main(["--platform", "cpu", "train-detector",
                   "--features", str(feats), "--out", str(tmp_path / "det")])
        assert not rc
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert 0.0 <= out["eer"] <= 1.0
        assert jax.default_backend() == "cpu"
    finally:
        # don't leak the CLI's process-wide platform pin to later tests
        jax.config.update("jax_platforms", prev)


def test_gallery_builder(tmp_path):
    from xai_audio_deepfakes_tpu.serve.viewer import build_gallery

    results = [
        {
            "source": f"clip{i}.wav",
            "original_audio": "a.wav",
            "reconstructed_audio": "b.wav",
            "pred_original": 0.3 if i % 2 else 0.8,
            "pred_reconstructed_mask": 0.4,
            "pred_reconstructed_1mask": 0.6,
        }
        for i in range(4)
    ]
    # an item carrying only pred_original (older/partial artifact index)
    # must render its one prediction instead of raising KeyError
    results.append(
        {
            "source": "partial.wav",
            "original_audio": "c.wav",
            "pred_original": 0.7,
        }
    )
    index = build_gallery(results, str(tmp_path))
    assert os.path.exists(index)
    content = open(index).read()
    assert "audio controls" in content
    assert "partial.wav" in content and "original: 0.7000" in content
    assert os.path.exists(tmp_path / "results.json")


def test_fallback_gallery_builder(tmp_path):
    """A directory of loose closed-loop artifacts (no index.html, no
    recorded predictions) must still serve: triplet wavs group into one
    item with their index-matched PNGs; unmatched wavs get bare players;
    no prediction numbers are invented."""
    from xai_audio_deepfakes_tpu.serve.viewer import build_fallback_gallery

    for name in (
        "eval_0_manipulated.wav", "eval_0_relevant.wav",
        "eval_0_irrelevant.wav", "final_mask_0.png",
        "manipulated_spec_0.png", "loose.wav",
    ):
        (tmp_path / name).write_bytes(b"x")
    index = build_fallback_gallery(str(tmp_path))
    content = open(index).read()
    assert content.count("<section") == 2
    assert "eval_0_relevant.wav" in content and "final_mask_0.png" in content
    assert "loose.wav" in content
    assert "Predictions" not in content

    # ambiguous trailing index (two stem families both ending _0): showing
    # the wrong run's mask would mislead a listening study — show none
    (tmp_path / "other_0_manipulated.wav").write_bytes(b"x")
    content = open(build_fallback_gallery(str(tmp_path))).read()
    assert content.count("<section") == 3
    assert "final_mask_0.png" not in content

    # the auto-built index is marked, so serve_gallery rebuilds it (new
    # artifacts appear) while a pipeline-built gallery is never touched
    from xai_audio_deepfakes_tpu.serve.viewer import _FALLBACK_MARK

    assert content.startswith(_FALLBACK_MARK.strip())


def test_cli_eval_sharded_mesh(monkeypatch, capsys, tmp_path, rng):
    """`cli eval --data-parallel 4 --model-parallel 2` builds the dp x tp
    mesh from the visible (virtual CPU) devices and matches the
    single-device sweep."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import write_wav

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    n = pipe.cfg.audio.num_samples
    for i in range(4):
        write_wav(
            str(tmp_path / f"c{i}.wav"),
            rng.uniform(-0.3, 0.3, n).astype(np.float32),
            16000,
        )
    meta = tmp_path / "meta.csv"
    meta.write_text("".join(f"c{i}.wav\n" for i in range(4)))
    base = [
        "eval", "--metadata", str(meta), "--root", str(tmp_path),
        "--batch-size", "4",
    ]
    cli.main(base)
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(base + ["--data-parallel", "4", "--model-parallel", "2"])
    sharded = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sharded["num_clips"] == single["num_clips"] == 4
    np.testing.assert_allclose(
        sharded["faithfulness"], single["faithfulness"], atol=1e-4
    )

    # more devices than exist -> clean failure
    with pytest.raises(SystemExit):
        cli.main(base + ["--data-parallel", "64", "--model-parallel", "2"])


def test_cli_eval_pipeline_stages(monkeypatch, capsys, tmp_path, rng):
    """`cli eval --data-parallel 2 --pipeline-stages 2` runs the embedder as
    a 2-stage shard_map/ppermute pipeline inside the eval sweep and matches
    the single-device metrics."""
    import dataclasses

    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import write_wav

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, embedder=dataclasses.replace(cfg.embedder, scan_layers=True)
    )
    pipe = ADDvisorPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    n = pipe.cfg.audio.num_samples
    for i in range(4):
        write_wav(
            str(tmp_path / f"c{i}.wav"),
            rng.uniform(-0.3, 0.3, n).astype(np.float32),
            16000,
        )
    meta = tmp_path / "meta.csv"
    meta.write_text("".join(f"c{i}.wav\n" for i in range(4)))
    base = [
        "eval", "--metadata", str(meta), "--root", str(tmp_path),
        "--batch-size", "4",
    ]
    cli.main(base)
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(base + ["--data-parallel", "2", "--pipeline-stages", "2"])
    pp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pp["num_clips"] == single["num_clips"] == 4
    np.testing.assert_allclose(
        pp["faithfulness"], single["faithfulness"], atol=1e-4
    )

    # all three axes compose: dp x pp x tp from the CLI (2x2x2 mesh)
    cli.main(
        base
        + [
            "--data-parallel", "2",
            "--model-parallel", "2",
            "--pipeline-stages", "2",
        ]
    )
    full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert full["num_clips"] == 4
    np.testing.assert_allclose(
        full["faithfulness"], single["faithfulness"], atol=1e-4
    )
    # batch not divisible by dp x stages -> clean failure
    with pytest.raises(SystemExit):
        cli.main(
            base[:-1] + ["2", "--data-parallel", "2", "--pipeline-stages", "2"]
        )


def test_cli_train_sharded_mesh(monkeypatch, capsys, tmp_path, rng):
    """`cli train --data-parallel 2 --model-parallel 2`: one epoch of mesh
    training from the CLI (dp batch sharding + tp frozen embedder), loss
    finite, checkpoint written."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import write_wav

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    n = pipe.cfg.audio.num_samples
    for i in range(4):
        write_wav(
            str(tmp_path / f"c{i}.wav"),
            rng.uniform(-0.3, 0.3, n).astype(np.float32),
            16000,
        )
    meta = tmp_path / "meta.csv"
    meta.write_text("".join(f"c{i}.wav\n" for i in range(4)))
    out = tmp_path / "run"
    rc = cli.main(
        ["train", "--metadata", str(meta), "--root", str(tmp_path),
         "--batch-size", "4", "--epochs", "1", "--out", str(out),
         "--data-parallel", "2", "--model-parallel", "2"]
    )
    assert rc is None or rc == 0
    log_lines = (out / "train_log.jsonl").read_text().strip().splitlines()
    rec = json.loads(log_lines[-1])
    assert np.isfinite(rec["loss"])
    assert os.path.isdir(out / "ckpts")

    # batch size not divisible by dp -> clean failure
    with pytest.raises(SystemExit):
        cli.main(
            ["train", "--metadata", str(meta), "--root", str(tmp_path),
             "--batch-size", "3", "--epochs", "1", "--out", str(out),
             "--data-parallel", "2"]
        )


def test_restore_decoder_from_train_checkpoint(monkeypatch, capsys, tmp_path, rng):
    """`cli eval/explain --checkpoint <cli-train ckpt>` regression: train
    checkpoints carry the FULL AddvisorTrainState, and the inference-side
    restore must extract the decoder from it (found broken on TPU: the old
    code restored against a bare UNet template and Orbax rejected the
    structure mismatch)."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import write_wav
    from xai_audio_deepfakes_tpu.train.checkpoints import latest_checkpoint
    from xai_audio_deepfakes_tpu.train.train_addvisor import (
        restore_decoder_for_inference,
    )

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    n = pipe.cfg.audio.num_samples
    for i in range(2):
        write_wav(
            str(tmp_path / f"c{i}.wav"),
            rng.uniform(-0.3, 0.3, n).astype(np.float32),
            16000,
        )
    meta = tmp_path / "meta.csv"
    meta.write_text("c0.wav\nc1.wav\n")
    out = tmp_path / "run"
    cli.main(
        ["train", "--metadata", str(meta), "--root", str(tmp_path),
         "--batch-size", "2", "--epochs", "1", "--out", str(out)]
    )
    ckpt = latest_checkpoint(str(out / "ckpts"))
    assert ckpt is not None

    unet = restore_decoder_for_inference(ckpt, pipe, params)
    assert set(unet) >= {"params"}
    # restored decoder drives the explain pipeline
    restored = dict(params, unet=unet)
    wav = jnp.asarray(rng.uniform(-0.3, 0.3, (1, n)).astype(np.float32))
    res = pipe.explain(restored, wav, decoder="unet")
    assert np.isfinite(np.asarray(res.probs_relevant)).all()


def test_cli_explain_tiny_chunked_synthesized(monkeypatch, capsys, tmp_path, rng):
    """`cli explain --chunk-long --synthesize` over a tiny pipeline: long
    input splits into per-chunk artifacts and each gets a vocoded wav."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import write_wav

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    # 1.2 s file, 0.5 s clips -> 3 chunks
    wav_path = str(tmp_path / "long.wav")
    write_wav(wav_path, rng.uniform(-0.3, 0.3, 19200).astype(np.float32), 16000)
    rc = cli.main(
        ["explain", "--wav", wav_path, "--out", str(tmp_path / "art"),
         "--chunk-long", "--synthesize"]
    )
    assert rc is None or rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["explained"] == 3
    for i in range(3):
        assert os.path.exists(tmp_path / "art" / f"long_chunk{i}_explanation.wav")
        assert os.path.exists(
            tmp_path / "art" / f"long_chunk{i}_explanation_vocoded.wav"
        )


def test_cli_profile(monkeypatch, capsys):
    """`cli profile` stage breakdown over a tiny pipeline (pipeline injected
    so the test lane avoids the full-size compile)."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    rc = cli.main(["profile", "--batch-size", "2", "--iters", "1"])
    assert rc is None or rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for stage in ("stft", "embed", "mask_unet", "explain_full"):
        assert out[stage]["calls"] == 1
        assert out[stage]["mean_ms"] > 0
    assert out["batch"] == 2


@pytest.mark.slow
def test_cli_explain_smoke(tmp_path, rng):
    """`cli explain` end-to-end on a synthetic wav with the FULL-size model
    random-init — exercises artifact + gallery emission. Slow (CPU full-size
    embedder), marked for the nightly lane."""
    from xai_audio_deepfakes_tpu.data.io import write_wav

    wav_path = str(tmp_path / "in.wav")
    write_wav(wav_path, rng.uniform(-0.3, 0.3, 80000).astype(np.float32), 16000)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable, "-m", "xai_audio_deepfakes_tpu.cli", "explain",
            "--wav", wav_path, "--out", str(tmp_path / "art"), "--dtype", "float32",
        ],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["explained"] == 1
    assert os.path.exists(tmp_path / "art" / "index.html")
    assert os.path.exists(tmp_path / "art" / "in_explanation.wav")


def test_manipulated_probability_polarity():
    from xai_audio_deepfakes_tpu.config import (
        LabelPolarity,
        manipulated_probability,
    )

    assert manipulated_probability(0.8, LabelPolarity.MANIPULATED_IS_ONE) == 0.8
    assert manipulated_probability(0.8, "real_is_one") == pytest.approx(0.2)
    arr = np.array([0.1, 0.9])
    np.testing.assert_allclose(
        manipulated_probability(arr, LabelPolarity.REAL_IS_ONE), [0.9, 0.1]
    )


def test_gallery_polarity_split(tmp_path):
    """The fakes-first split honors LabelPolarity: under manipulated_is_one
    (how the detector was trained, `train_logReg_swapping.py:62-92`) a
    p=0.9 clip is a fake; under real_is_one it's a real."""
    from xai_audio_deepfakes_tpu.serve.viewer import build_gallery

    results = [
        {
            "source": f"clip{i}.wav",
            "original_audio": "a.wav",
            "reconstructed_audio": "b.wav",
            "pred_original": p,
            "pred_reconstructed_mask": 0.4,
            "pred_reconstructed_1mask": 0.6,
        }
        for i, p in enumerate([0.9, 0.1])
    ]
    idx_m = build_gallery(results, str(tmp_path / "m"), polarity="manipulated_is_one")
    first_page = open(tmp_path / "m" / "page_0.html").read()
    assert "clip0.wav" in first_page and "clip1.wav" not in first_page
    assert "fake page 1" in first_page
    idx_r = build_gallery(results, str(tmp_path / "r"), polarity="real_is_one")
    first_page = open(tmp_path / "r" / "page_0.html").read()
    assert "clip1.wav" in first_page and "clip0.wav" not in first_page


def test_cli_rejects_int8_for_gradient_commands(tmp_path):
    """--quant int8 has zero gradient (jnp.round); train/attrib must refuse it
    instead of silently training/attributing through a constant."""
    from xai_audio_deepfakes_tpu.cli.__main__ import main

    with pytest.raises(SystemExit) as exc:
        main(["train", "--quant", "int8", "--metadata", str(tmp_path)])
    assert exc.value.code == 2
    with pytest.raises(SystemExit) as exc:
        main(["attrib", "--quant", "int8", "--metadata", str(tmp_path)])
    assert exc.value.code == 2


def test_cli_embed_features_png(monkeypatch, capsys, tmp_path, rng):
    """`cli embed --features-png` writes embeddings.npz + the plot_features
    counterpart (features.png) over a tiny pipeline."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import write_wav

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    for i in range(2):
        write_wav(
            str(tmp_path / f"c{i}.wav"),
            rng.uniform(-0.3, 0.3, pipe.cfg.audio.num_samples).astype(np.float32),
            16000,
        )
    meta = tmp_path / "meta.txt"
    meta.write_text("".join(f"{tmp_path}/c{i}.wav\n" for i in range(2)))
    rc = cli.main(
        ["embed", "--metadata", str(meta), "--out", str(tmp_path / "out"),
         "--batch-size", "2", "--features-png"]
    )
    assert rc is None or rc == 0
    assert os.path.exists(tmp_path / "out" / "embeddings.npz")
    assert os.path.exists(tmp_path / "out" / "features.png")
    data = np.load(tmp_path / "out" / "embeddings.npz")
    assert data["features"].shape[0] == 2


def test_cli_attrib_save_artifacts(monkeypatch, capsys, tmp_path, rng):
    """`cli attrib --save-artifacts` writes the reference's per-file outputs
    (`captum_saliency.py:136-166`): original/relevant/irrelevant wavs, three
    spectrogram PNGs, the waveform-mask plot, and a gallery index — while
    still printing the aggregate metrics JSON."""
    from xai_audio_deepfakes_tpu.cli import __main__ as cli
    from xai_audio_deepfakes_tpu.data.io import load_audio, write_wav

    pipe = ADDvisorPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "_build_pipeline", lambda args: (pipe, params))
    n = pipe.cfg.audio.num_samples
    for i in range(3):
        write_wav(
            str(tmp_path / f"c{i}.wav"),
            rng.uniform(-0.3, 0.3, n).astype(np.float32),
            16000,
        )
    meta = tmp_path / "meta.txt"
    meta.write_text("".join(f"{tmp_path}/c{i}.wav\n" for i in range(3)))
    out = tmp_path / "art"
    cli.main(
        ["attrib", "--metadata", str(meta), "--out", str(out),
         "--batch-size", "2", "--save-artifacts", "--artifact-limit", "2",
         "--method", "saliency"]
    )
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # metrics cover every clip; artifacts honor the cap
    assert result["num_clips"] == 3
    assert result["artifacts"] == 2
    assert os.path.exists(result["gallery"])
    for i in range(2):
        stem = f"c{i}_saliency"
        for suffix in ("_original.wav", "_relevant.wav", "_irrelevant.wav",
                       "_spec.png", "_spec_relevant.png",
                       "_spec_irrelevant.png", "_wavmask.png"):
            assert os.path.exists(out / f"{stem}{suffix}"), stem + suffix
    assert not os.path.exists(out / "c2_saliency_original.wav")
    # the relevant waveform is the masked clip, not a copy of the original
    orig, _ = load_audio(str(out / "c0_saliency_original.wav"))
    rel, _ = load_audio(str(out / "c0_saliency_relevant.wav"))
    assert orig.shape == rel.shape
    assert not np.allclose(orig, rel)


def test_cli_closed_loop_wiring(monkeypatch, capsys, tmp_path):
    """`cli closed-loop` builds the config from flags, runs the loop, writes
    mask/spectrogram PNGs + closed_loop.json, and prints the result (the
    loop itself is exercised at tiny scale in tests/test_closed_loop.py)."""
    import xai_audio_deepfakes_tpu.train.closed_loop as cl
    from xai_audio_deepfakes_tpu.cli import __main__ as cli

    seen = {}

    def fake_loop(cfg, **kw):
        seen["cfg"] = cfg
        seen.update(kw)
        return {
            "band_hz": [kw["band"][0], kw["band"][1]],
            "after": {"flip_rate": 1.0},
            "train_log": [{"epoch": 1, "loss": 0.5}],
            "final_masks": np.full((2, 64, 24), 0.5, np.float32),
            "final_magnitude": np.ones((2, 64, 24), np.float32),
            "final_relevant_wavs": np.zeros((1, 800), np.float32),
            "final_irrelevant_wavs": np.zeros((1, 800), np.float32),
            "eval_manipulated": np.zeros((2, 800), np.float32),
            "final_probs": np.asarray([[0.9, 0.8, 0.1]], np.float32),
            "state": {"unet": np.zeros(3, np.float32)},
        }

    monkeypatch.setattr(cl, "run_closed_loop", fake_loop)
    out = tmp_path / "loop"
    cli.main(
        ["closed-loop", "--out", str(out), "--band-lo", "400", "--band-hi",
         "900", "--epochs", "3", "--n-train", "8", "--n-eval", "4",
         "--model-lr", "1e-3", "--artifact-limit", "1",
         "--anyband", "--band-width", "500", "--decoder", "features",
         "--loss-masking", "log1p", "--l1-scale", "4", "--freeze-l1-w"]
    )
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["band_hz"] == [400.0, 900.0]
    assert "final_masks" not in printed and "state" not in printed
    assert seen["cfg"].train.model_lr == 1e-3
    assert seen["epochs"] == 3 and seen["n_train"] == 8
    # round-4 flags reach the loop: anyband protocol, grid width, decoder
    # choice, and the masking convention (which feeds BOTH loss and eval)
    assert seen["anyband"] is True and seen["band_width"] == 500.0
    assert seen["decoder"] == "features"
    assert seen["l1_scale"] == 4.0  # the traced frontier knob
    # round-5 flag: decouple the learnable-w dynamics from the L1 term
    assert seen["cfg"].train.freeze_l1_weight is True
    from xai_audio_deepfakes_tpu.config import MaskingConvention

    assert seen["cfg"].loss.masking is MaskingConvention.LOG1P
    assert os.path.exists(out / "closed_loop.json")
    assert os.path.exists(out / "final_mask_0.png")
    assert os.path.exists(out / "manipulated_spec_0.png")
    assert not os.path.exists(out / "final_mask_1.png")
    # listenable artifacts + the trained-decoder checkpoint
    assert seen["keep_wavs"] == 1  # min(artifact_limit, 4)
    for stem in ("manipulated", "relevant", "irrelevant"):
        assert os.path.exists(out / f"eval_0_{stem}.wav")
    # held-out explanations are browsable via the same gallery cli serve
    # hosts (round-4 addition)
    assert os.path.exists(out / "index.html")
    assert "eval_0_relevant.wav" in (out / "index.html").read_text()
    from xai_audio_deepfakes_tpu.train.checkpoints import latest_checkpoint

    assert latest_checkpoint(str(out / "ckpts")) is not None


def test_persistent_compile_cache_inert_on_cpu():
    """utils/cache.py must be a no-op on CPU: XLA:CPU cache entries are
    AOT-compiled against the build host's CPU features and loading them on
    a different host risks SIGILL — a shared repo-dir cache must never
    carry that. (On TPU it sets jax_compilation_cache_dir; not testable
    here.)"""
    from xai_audio_deepfakes_tpu.utils.cache import (
        enable_persistent_compile_cache,
    )

    before = jax.config.jax_compilation_cache_dir
    assert jax.default_backend() == "cpu"
    enable_persistent_compile_cache()
    assert jax.config.jax_compilation_cache_dir == before
