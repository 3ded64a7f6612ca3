"""Regression: importing the package must perform ZERO device ops.

Round 1's multi-chip dry run failed in the driver environment because
module-level ``jnp.array`` constants (stylegan._BLUR_KERNEL,
blocks._RGB_FROM_HED) materialized arrays on the default TPU backend at
import time, so a skewed libtpu crashed the import before the dry run
could force the CPU platform. Constants are numpy now; this test pins it.

Runs in a subprocess because the pytest process itself (conftest) already
initialized a backend.
"""

import os
import subprocess
import sys

import pytest

# fresh-interpreter subprocesses (one runs a full 4-device dryrun compile):
# packaging/driver contracts, not numerics — slow tier, like the other
# subprocess-based CLI drives
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys

import deep_convolutional_neural_network_resnet_26_and_attention_network_tpu as pkg
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (
    data, interpret, models, ops, parallel, train, utils,
)
import __graft_entry__  # the driver's import, incl. compilation-cache setup

from jax._src import xla_bridge as xb

backends = getattr(xb, "_backends", None)
assert backends is not None, "jax xla_bridge API drifted; update this probe"
assert not backends, f"import initialized backend(s): {list(backends)}"
print("IMPORT_PURE")
"""


def test_package_import_initializes_no_backend():
    env = dict(os.environ)
    # Deliberately do NOT set JAX_PLATFORMS: the import must be pure even
    # when the default platform would be an (possibly broken) accelerator.
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "IMPORT_PURE" in proc.stdout


def test_dryrun_multichip_never_touches_default_backend():
    """dryrun_multichip must run entirely on virtual CPU devices, even when
    the default platform is unavailable (JAX_PLATFORMS points nowhere usable
    until the dryrun itself forces cpu)."""
    probe = (
        "import __graft_entry__ as g; g.dryrun_multichip(4); print('DRYRUN_OK')"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "DRYRUN_OK" in proc.stdout
