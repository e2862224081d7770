"""The hardened bench driver's fallback ladder (round-4 post-mortem).

Round 4's official benchmark died on a transient TPU backend fault at the
warmup barrier and recorded nothing but a stack trace. bench.py now runs a
pre-flight device probe plus a fresh-subprocess attempt ladder
(default -> cache-bypass -> batch-64) and always writes a diagnostics
JSON. These tests drive the real driver end to end on CPU at tiny
geometry, injecting failures via BENCH_INJECT_FAIL to force each rung.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _run_bench(tmp_path, extra_env):
    env = dict(os.environ)
    env.update(
        {
            # ADDVISOR_PLATFORM, not JAX_PLATFORMS: this box's sitecustomize
            # re-pins the axon TPU backend over the env var; the bench's
            # jax.config-based pin is the one that wins
            "ADDVISOR_PLATFORM": "cpu",
            "BENCH_TINY": "1",
            "BENCH_ITERS": "1",
            "BENCH_DIAG_PATH": str(tmp_path / "diag.json"),
            "BENCH_PREFLIGHT_TIMEOUT": "300",
            "BENCH_ATTEMPT_TIMEOUT": "300",
        }
    )
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    line = proc.stdout.strip().splitlines()[-1]
    diag = json.load(open(tmp_path / "diag.json"))
    return proc.returncode, json.loads(line), diag


@pytest.mark.e2e
def test_recovers_via_cache_bypass(tmp_path):
    """Attempt 1 fails (injected), the fresh-subprocess cache-bypass retry
    succeeds, and the stdout line still carries a real measurement."""
    rc, result, diag = _run_bench(
        tmp_path, {"BENCH_INJECT_FAIL": "nocache", "BENCH_BATCH": "2"}
    )
    assert rc == 0
    assert result["metric"] == "explanations/sec/chip"
    assert result["value"] and result["value"] > 0
    assert result["recovered_via"] == "cache-bypass"
    assert diag["ok"] is True
    labels = [(a["label"], a["ok"]) for a in diag["attempts"]]
    assert labels == [("default", False), ("cache-bypass", True)]
    # the failed attempt recorded how far it got and why it died
    failed = diag["attempts"][0]
    assert "params" in failed["phases"]
    assert any("injected failure" in ln for ln in failed["stderr_tail"])
    assert diag["preflight"][0]["ok"] is True


@pytest.mark.e2e
def test_batch_fallback(tmp_path):
    """Both full-batch attempts fail (injected); the batch-64 rung lands."""
    rc, result, diag = _run_bench(
        tmp_path, {"BENCH_INJECT_FAIL": "batch", "BENCH_BATCH": "128"}
    )
    assert rc == 0
    assert result["value"] and result["value"] > 0
    assert result["batch"] == 64
    assert result["recovered_via"] == "batch-64-fallback"
    assert [a["ok"] for a in diag["attempts"]] == [False, False, True]


@pytest.mark.e2e
def test_total_failure_still_emits_parseable_json(tmp_path):
    """Every rung fails: rc=1, but stdout is STILL one parseable JSON line
    with the error tail, and the diagnostics file records every attempt."""
    rc, result, diag = _run_bench(
        tmp_path, {"BENCH_INJECT_FAIL": "always", "BENCH_BATCH": "2"}
    )
    assert rc == 1
    assert result["metric"] == "explanations/sec/chip"
    assert result["value"] is None
    assert "injected failure" in result["error"]
    assert result["failed_attempts"] == ["default", "cache-bypass"]
    assert result["last_phase"] == "params"
    assert diag["ok"] is False and diag["result"] is None
    assert all(a["ok"] is False for a in diag["attempts"])
