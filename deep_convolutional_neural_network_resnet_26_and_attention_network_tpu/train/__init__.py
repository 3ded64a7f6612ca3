"""Training drivers, LR schedule, and checkpointing."""

from . import checkpoint, schedule  # noqa: F401

#: Exit status for a run halted by the non-finite-loss guard — distinct
#: from success (0) and argparse errors (2) so supervisors (sweep
#: scripts, the serving restart loop) can tell divergence from success.
DIVERGED_EXIT = 3


class Diverged(RuntimeError):
    """Training loss went non-finite; the run halted WITHOUT
    checkpointing the poisoned epoch. All three drivers share this
    contract: their ``main()`` converts it to exit code
    :data:`DIVERGED_EXIT`."""
