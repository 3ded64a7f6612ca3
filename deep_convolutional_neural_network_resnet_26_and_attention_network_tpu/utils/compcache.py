"""Persistent XLA compilation cache, shared by every CLI driver.

The full-width 300 px model takes minutes to compile over the tunnel
device; a resumed or re-run driver process would pay it again without a
persistent cache. bench.py has carried this since round 1 — this module
gives the training/eval/GAN drivers the same behavior.

Opt-out: set JAX_DISABLE_PERSISTENT_CACHE=1 (e.g. when a cache directory
holds AOT entries compiled on a different host CPU, which XLA:CPU loads
with SIGILL risk — see tests/conftest.py, which disables it for CPU CI).
"""

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache. Returns the
    directory used, or None when disabled/unavailable."""
    if os.environ.get("JAX_DISABLE_PERSISTENT_CACHE"):
        return None
    try:
        cache_dir = (cache_dir
                     or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or _DEFAULT_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return cache_dir
    except Exception:
        return None  # older jax / read-only checkout: run uncached
