"""Multi-chip execution: meshes, shardings, jitted train/eval steps, and
sharded/streaming inference paths."""

from . import inference  # noqa: F401
from . import mesh  # noqa: F401
from . import shard_pool  # noqa: F401
from . import steps  # noqa: F401
