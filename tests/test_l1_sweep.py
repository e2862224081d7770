"""Regression for the sparsity/fidelity sweep driver (benchmarks/l1_sweep.py).

The driver produced the recorded frontier (docs/performance.md); this pins
its tiny-geometry CPU path end to end: two scales through the full anyband
closed loop in one process, one JSON row per point, l1_sweep.json written,
and the L1 term actually responding to the traced scale.
"""

import json
import sys

import pytest


@pytest.mark.e2e
def test_l1_sweep_tiny_two_points(tmp_path, monkeypatch):
    sys.path.insert(0, ".")
    from benchmarks.l1_sweep import main

    monkeypatch.setattr(
        sys, "argv",
        ["l1_sweep.py", "--tiny", "--scales", "1,4", "--epochs", "3",
         "--n-train", "8", "--n-eval", "4", "--batch-size", "4",
         "--out", str(tmp_path)],
    )
    main()
    rows = json.load(open(tmp_path / "l1_sweep.json"))
    assert [r["l1_scale"] for r in rows] == [1.0, 4.0]
    for r in rows:
        for k in ("own_iou", "other_iou", "cross_band_pair_iou",
                  "keep_rate", "flip_rate", "faithfulness", "final_loss",
                  "final_l1"):
            assert k in r and r[k] is not None
    # the traced scale reaches the loss: identical corpora/seeds, so after
    # 3 tiny epochs the masks are near-identical and the recorded L1 term
    # (scale * mean|mask|) must be larger under the 4x multiplier. The
    # TOTAL is not asserted — the learnable-w softplus renorm can
    # down-weight the larger L1 term, so the total is not monotone in the
    # multiplier.
    assert rows[1]["final_l1"] > rows[0]["final_l1"]
