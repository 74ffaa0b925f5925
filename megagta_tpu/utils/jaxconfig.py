"""Process-wide JAX configuration helpers.

Compilation through this environment's TPU tunnel can take minutes; the
persistent compilation cache makes every wavefront/pipeline shape compile
once per machine.
"""

from __future__ import annotations

import os

_done = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    d = cache_dir or os.environ.get(
        "MEGAGTA_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "megagta_tpu_jax"),
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
