"""Training drivers, LR schedule, and checkpointing."""

from . import checkpoint, schedule  # noqa: F401
