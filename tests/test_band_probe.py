"""Linear band-probe (train/band_probe.py) and its driver.

The probe must (a) recover a band class that IS linearly present per
frame, (b) report ~chance on the shuffled-label negative control, and the
driver must run the full corpus->embed->probe path at tiny geometry.
"""

import json
import sys

import numpy as np
import pytest


def test_probe_recovers_planted_band_signal(rng):
    from xai_audio_deepfakes_tpu.train.band_probe import frame_band_probe

    n, t, h, k = 48, 12, 24, 4
    cls = rng.integers(0, k, size=n)
    # plant the class as a direction in feature space on EVERY frame
    dirs = rng.standard_normal((k, h)).astype(np.float32)
    feats = (
        dirs[cls][:, None, :]
        + 0.3 * rng.standard_normal((n, t, h)).astype(np.float32)
    )
    rep = frame_band_probe(feats, cls, k, seed=0)
    assert rep["chance"] == pytest.approx(0.25)
    assert rep["mean_pool_acc"] > 0.9
    assert rep["frame_acc"] > 0.9
    assert rep["clip_majority_acc"] > 0.9
    assert rep["shuffled_frame_acc"] < 0.5  # near chance, noise-fit bound


def test_probe_reports_chance_when_absent(rng):
    """Features carrying NO band information: every probe at ~chance while
    the report structure stays intact (the measured-impossibility case)."""
    from xai_audio_deepfakes_tpu.train.band_probe import frame_band_probe

    n, t, h, k = 48, 12, 24, 4
    cls = rng.integers(0, k, size=n)
    feats = rng.standard_normal((n, t, h)).astype(np.float32)
    rep = frame_band_probe(feats, cls, k, seed=0)
    assert rep["frame_acc"] < 0.55
    assert rep["clip_majority_acc"] < 0.7


@pytest.mark.e2e
def test_frame_band_probe_driver_tiny(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, ".")
    from benchmarks.frame_band_probe import main

    out = tmp_path / "probe.json"
    monkeypatch.setattr(
        sys, "argv",
        ["frame_band_probe.py", "--tiny", "--n", "24", "--batch-size", "8",
         "--out", str(out)],
    )
    main()
    rows = json.load(open(out))
    assert len(rows) == 1
    rep = rows[0]
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["geometry"] == "tiny"
    for key in ("mean_pool_acc", "frame_acc", "clip_majority_acc",
                "shuffled_frame_acc", "chance", "n_classes"):
        assert key in rep and rep[key] is not None
