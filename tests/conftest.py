"""Test environment: force the CPU backend with 8 virtual devices so
sharding tests exercise a real multi-device mesh without TPU hardware.

The XLA flag must be in the environment before the backend initializes;
the platform override must go through jax.config because the surrounding
environment pre-pins ``jax_platforms`` at import time.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI drivers enable the persistent compilation cache (utils/compcache);
# XLA:CPU AOT entries are host-CPU-specific (cross-host loads can SIGILL)
# and CI shapes are tiny — keep tests uncached
os.environ["JAX_DISABLE_PERSISTENT_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
