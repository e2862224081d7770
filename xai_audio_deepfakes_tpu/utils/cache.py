"""Persistent XLA compile cache, one switch for every entry point.

Fresh compiles of the large programs (train step, serving explain graph)
take 5-25 minutes through the tunneled TPU relay on this environment;
with the on-disk cache a re-run of the same program is seconds. bench.py
has always enabled it — the CLI and the benchmark drivers route through
here so closed-loop / sweep / train invocations get the same reuse.
Off-switch: ADDVISOR_NO_COMPILE_CACHE=1 (e.g. to time a cold compile).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_compile_cache(cache_dir: str | None = None) -> None:
    """Idempotent; call after the backend is pinned (it reads
    jax.default_backend(), which initializes the backend). Never raises — a
    read-only filesystem or an old jax just means no cache.

    TPU-only by design: XLA:CPU cache entries are AOT-compiled against the
    build host's exact CPU features and loading them on a different host
    warns "could lead to execution errors such as SIGILL" — a shared
    repo-dir cache must not carry that risk, and CPU compiles are cheap
    anyway."""
    if os.environ.get("ADDVISOR_NO_COMPILE_CACHE", "0") == "1":
        return
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir", cache_dir or _DEFAULT_DIR
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
