"""Per-round probe of the fused conv+LN+GELU Pallas kernel on the real TPU.

The kernel (`ops/pallas_conv.py`) is parity-verified in interpret mode but
disabled in production because the tunneled TPU runtime fails to execute it
at most serving shapes, with an unstable pass/fail set across sessions
(docs/performance.md "fused conv" sections; reference for the fused stack:
/root/reference/classifier_embedder.py feature-extractor convs). VERDICT
round-2 item 8 asks for one cheap re-test per round so the ~+10% end-to-end
win turns on the day the runtime is fixed.

Each shape probes in its OWN subprocess: a failed kernel execution wedges
the TPU client (every subsequent device_put raises INTERNAL), so in-process
sweeps would serially poison later shapes.

Usage: python benchmarks/fused_conv_probe.py          # prints a verdict table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# (batch, length) probe matrix: historical passes, historical fails, and the
# serving-graph shapes that matter for flipping the flag on.
SHAPES = [
    (2, 999),      # historically passing
    (6, 999),      # passed early r2, failed late r2 (instability witness)
    (7, 999),      # historically failing
    (8, 15999),    # historically failing
    (48, 15999),   # serving-adjacent
    (128, 3749),   # serving batch, post-layer-2 length
]

_CHILD = r"""
import sys, jax, jax.numpy as jnp
from xai_audio_deepfakes_tpu.ops.pallas_conv import conv_ln_gelu, conv_ln_gelu_reference
b, l = int(sys.argv[1]), int(sys.argv[2])
k, c = 3, 512
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (b, l, c), jnp.float32)
w = jax.random.normal(jax.random.PRNGKey(1), (k, c, c), jnp.float32) * 0.02
bias = jnp.zeros((c,), jnp.float32)
g = jnp.ones((c,), jnp.float32)
lb = jnp.zeros((c,), jnp.float32)
kw = dict(stride=2, eps=1e-5, gelu="tanh", dtype=jnp.bfloat16)
y = conv_ln_gelu(x, w, bias, g, lb, **kw)
y.block_until_ready()
ref = conv_ln_gelu_reference(x, w, bias, g, lb, **kw)
d = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"PROBE_OK maxdiff={d:.3e}")
"""


def probe(b: int, l: int) -> dict:
    env = dict(os.environ)
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, str(b), str(l)],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        # a hung kernel is exactly the failure mode this probe exists to
        # detect — mark the shape failed and keep sweeping
        return {
            "batch": b, "length": l, "ok": False,
            "detail": "timeout after 600s",
        }
    out = r.stdout.strip().splitlines()
    ok = any(line.startswith("PROBE_OK") for line in out)
    detail = next((s for s in out if s.startswith("PROBE_OK")), "")
    if not ok:
        # last nonempty stderr line is the runtime error class
        errs = [s for s in r.stderr.strip().splitlines() if s.strip()]
        detail = errs[-1][:160] if errs else f"exit={r.returncode}"
    return {"batch": b, "length": l, "ok": ok, "detail": detail}


def main() -> None:
    shapes = SHAPES
    if len(sys.argv) > 1:  # e.g. `... 7x999 128x3749` to probe a subset
        shapes = [tuple(map(int, a.split("x"))) for a in sys.argv[1:]]
    results = [probe(b, l) for b, l in shapes]
    for res in results:
        print(json.dumps(res))
    n_ok = sum(r["ok"] for r in results)
    verdict = "FIXED — flip EmbedderConfig.fused_conv on and measure" \
        if n_ok == len(results) else "still broken — kernel stays off"
    print(f"fused-conv probe: {n_ok}/{len(results)} shapes pass; {verdict}")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
