"""Benchmark/driver resilience: pre-flight device probe + retrying
subprocess attempts with diagnostics.

Motivation (round-4 post-mortem, docs/performance.md): the official round-4
benchmark run died with a transient `FAILED_PRECONDITION: TPU backend error`
at the warmup barrier after a 6-hour session on the tunneled chip — the
serving graph itself was healthy (an unmodified re-run measured 229.8
clips/s), but the driver had no retry, no cache-bypass fallback, and no
diagnostics output, so the round recorded a stack trace instead of a
number. This module gives every driver the missing discipline:

  * `device_preflight()` — a tiny compile+execute+host-transfer program
    that proves the device/tunnel is alive before a multi-minute compile
    is attempted (and whose failure is itself retried once: the relay's
    transient faults frequently clear within seconds).
  * `run_attempts()` — run a command as a sequence of fresh-subprocess
    attempts with per-attempt env overrides (cache bypass, smaller batch),
    parsing one JSON result line from stdout and `BENCH_PHASE <name>`
    progress markers from stderr, and returning a machine-readable
    diagnostics record whether or not any attempt succeeded.

The reference has no counterpart (its scripts print and crash,
e.g. `/root/reference/train_addvisor.py:345-393`); this defends the
framework's own recorded baselines.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PHASE_PREFIX = "BENCH_PHASE "


def phase(name: str) -> None:
    """Mark progress from inside a measured subprocess. The outer driver
    collects these from stderr so a crash still records how far the run
    got (imports / params / compile+warmup / measure / done)."""
    print(PHASE_PREFIX + name, file=sys.stderr, flush=True)


def device_preflight(retries: int = 1, retry_wait_s: float = 10.0) -> dict:
    """Prove the device can compile, execute, and return data to the host.

    Runs in-process (callers that want isolation run it via a subprocess
    attempt). Returns {"device", "value"}; raises the last error after
    `retries` re-attempts. Kept tiny on purpose: a failure here means the
    backend/tunnel is down, not that the workload is wrong.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    last = None
    for i in range(retries + 1):
        try:
            x = jnp.full((128, 128), 1.0, jnp.bfloat16)
            y = jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())(x)
            val = float(np.asarray(y))
            return {"device": str(jax.devices()[0]), "value": val}
        except Exception as e:  # noqa: BLE001 — any backend error qualifies
            last = e
            if i < retries:
                time.sleep(retry_wait_s)
    raise last


def _parse_result_line(stdout: str):
    """Last stdout line that parses as a JSON object, else None."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict):
            return obj
    return None


def run_attempts(
    cmd: list[str],
    attempts: list[tuple[str, dict]],
    timeout_s: float = 2700.0,
    stderr_tail_lines: int = 12,
) -> tuple[dict | None, list[dict]]:
    """Run `cmd` once per (label, env_extra) attempt until one succeeds.

    Success = exit code 0 AND a JSON object line on stdout. Each attempt is
    a FRESH subprocess (a wedged TPU client or poisoned compile-cache entry
    cannot leak into the next try). Returns (result_or_None, attempt
    records); each record carries label, env overrides, rc, phases reached,
    wall seconds, and the stderr tail on failure.
    """
    records: list[dict] = []
    for label, env_extra in attempts:
        env = dict(os.environ)
        env.update({k: str(v) for k, v in env_extra.items()})
        t0 = time.perf_counter()
        rec: dict = {"label": label, "env": dict(env_extra)}
        try:
            proc = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                env=env,
                timeout=timeout_s,
            )
            rc, out, err = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = -1
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            err += f"\n[run_attempts] timeout after {timeout_s}s"
        rec["rc"] = rc
        rec["seconds"] = round(time.perf_counter() - t0, 3)
        rec["phases"] = [
            ln[len(PHASE_PREFIX):].strip()
            for ln in err.splitlines()
            if ln.startswith(PHASE_PREFIX)
        ]
        result = _parse_result_line(out) if rc == 0 else None
        if result is not None:
            rec["ok"] = True
            records.append(rec)
            return result, records
        rec["ok"] = False
        rec["stderr_tail"] = "\n".join(
            ln for ln in err.splitlines() if not ln.startswith(PHASE_PREFIX)
        )[-4000:].splitlines()[-stderr_tail_lines:]
        records.append(rec)
    return None, records
