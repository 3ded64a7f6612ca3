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


class PreemptionLatch:
    """SIGTERM → finish the current epoch, checkpoint it, exit 0.

    Batch schedulers and preemptible TPU pools stop jobs with SIGTERM;
    without a handler a mid-epoch kill loses the partial epoch. Epoch
    boundaries are the durable unit here (per-epoch checkpoints +
    bit-exact elastic resume), so the drivers install this latch and
    poll :meth:`stop_requested` after each epoch's checkpoint lands —
    a preempted run then exits 0 with its newest checkpoint complete,
    and ``--ckpt auto`` resumes it exactly where it stopped. A hard
    kill remains safe (atomic checkpoint writes), it just re-pays the
    interrupted epoch.
    """

    def __init__(self):
        import threading

        self._event = threading.Event()
        self._prev = None

    def install(self):
        import signal

        try:
            self._prev = signal.signal(
                signal.SIGTERM, lambda s, f: self.request_stop())
        except ValueError:  # not the main thread (in-process callers)
            self._prev = None
        return self

    def restore(self):
        import signal

        if self._prev is not None:
            signal.signal(signal.SIGTERM, self._prev)
            self._prev = None

    def request_stop(self):
        """Idempotent; signal-handler and thread safe."""
        if not self._event.is_set():
            self._event.set()
            print("train: SIGTERM/preemption — finishing the current "
                  "epoch, checkpointing, then exiting 0; resume with "
                  "--ckpt auto", flush=True)

    def stop_requested(self) -> bool:
        return self._event.is_set()
