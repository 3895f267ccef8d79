"""Persistent XLA compilation cache.

Remote-compile TPU backends pay ~1 minute per distinct (node-bucket,
edge-bucket) program; the persistent cache makes every shape a one-time
cost across all runs on the machine. Call sites: Trainer, bench, graft
entry, inference.
"""
from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_compilation_cache(cache_dir: str | None = None):
    global _ENABLED
    if _ENABLED:
        return
    import jax
    cache_dir = cache_dir or os.environ.get(
        'POINTVS_XLA_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'pointvs_tpu',
                     'xla'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # 0, NOT the usual ~1s threshold: remote-compile backends return
        # from backend_compile in <1s (the compile continues server-side
        # and the first EXECUTION blocks on it), so a time threshold
        # makes jax silently skip the cache write for exactly the
        # programs that cost minutes — every screen/bench/CLI process
        # then recompiles. Observed 2026-08-17: trivial 6-matmul program,
        # 175s wall compile, no cache entry written at threshold 1.0.
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        _ENABLED = True
    except (OSError, AttributeError):
        pass
