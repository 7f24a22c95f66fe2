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
        # 0.0, not the 1.0 default-ish threshold this used to set: on the
        # remote-compile attachment EVERY program — including one-op
        # jit_add/convert_element_type dispatch programs — costs ~0.4-0.5s
        # to compile, and a cold pipeline runs dozens of them. The round-5
        # probe measured ~30s of sub-threshold compiles per fresh process
        # that the cache was REFUSING to store (the big programs were
        # hitting fine); caching everything is what makes a second
        # process's cold start approach steady state (VERDICT r4 item 5).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:  # pragma: no cover - cache is best-effort
        return False
