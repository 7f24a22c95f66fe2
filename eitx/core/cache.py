"""Persistent XLA compilation cache.

On remote-compile TPU attachments a fresh executable costs minutes; the
jax persistent cache makes every previously-seen shape load in ~0.1s in
any later process. Enabled by the service entrypoint, bench, the graft
entry, and the test harness. Opt out with EITX_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/eitx_xla")


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> bool:
    if os.environ.get("EITX_NO_COMPILE_CACHE") == "1":
        return False
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:  # pragma: no cover - cache is best-effort
        return False
