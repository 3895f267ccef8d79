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
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        _ENABLED = True
    except (OSError, AttributeError):
        pass
