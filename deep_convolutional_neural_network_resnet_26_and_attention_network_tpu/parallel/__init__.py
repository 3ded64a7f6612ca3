"""Multi-chip execution: meshes, shardings, jitted train/eval steps."""

from . import mesh  # noqa: F401
from . import steps  # noqa: F401
