"""Persistent XLA compilation cache, enabled on package import.

Against a remote TPU (the axon tunnel) a cold compile costs tens of
seconds, so compiled executables are cached across processes (CLI runs,
notebooks, bare `sequila_tpu.dataframe` use).  Role analog of the
reference relying on cargo's build cache for its ahead-of-time native
kernels — here compilation happens at run time, so the cache must too.

Set SEQUILA_JAX_CACHE to move the directory, or to "" to disable.
"""

from __future__ import annotations

import os

_done = False


def setup_jax_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get(
            "SEQUILA_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "sequila_tpu", "jax"),
        )
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is best-effort
        pass
