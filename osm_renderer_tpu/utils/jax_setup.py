"""JAX runtime configuration shared by serving, benches, and tools.

The TPU toolchain in some environments compiles large programs through a
remote service with high latency; the persistent compilation cache makes
that a one-time cost per (program, shape-bucket) signature.  Batch
shapes are bucketed (see primitives.build_batch) so serving reuses a
small, stable set of compiled executables.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OSMR_JAX_CACHE", os.path.expanduser("~/.cache/osmr_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _DONE = True


def next_pow2(n: int, minimum: int = 1) -> int:
    v = max(n, minimum)
    return 1 << (v - 1).bit_length()
