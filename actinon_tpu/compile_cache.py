"""Persistent XLA compilation cache.

Composite-heavy scenes (hanging_lamp: 117 CSG composites) produce large
HLO modules whose first compile is expensive, especially on the CPU
backend used by tests and the golden-corpus oracle.  The persistent
cache makes every compile after the first instant across processes —
the standard production setup for TPU fleets.

Call enable() from entry points (bench, CLI, tests, golden_gen).  Set
ACTINON_NO_COMPILE_CACHE=1 to opt out (e.g. when measuring cold-compile
time itself).
"""

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def enable(cache_dir: str = None) -> None:
    if os.environ.get("ACTINON_NO_COMPILE_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get("ACTINON_COMPILE_CACHE",
                                       _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took XLA real effort; tiny kernels recompile
    # faster than they (de)serialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
