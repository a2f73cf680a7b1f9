"""Serial background writer for artifact IO.

Checkpoint writes sit on the sampler's critical path (reference writes
them inline too, ``nnest/nested.py:473-507``); on the remote-TPU tunnel
the np.save/pickle file IO plus device pulls measured ~1 s of a warm
10-D run (phase timer ``checkpoint_io``). The sampler now snapshots all
state on the main thread (cheap memcpy + one batched device pull) and
hands the pure file IO to this single daemon thread.

One thread, FIFO order: checkpoint file sets keep their internal
ordering contract (data files first, ``checkpoint_<it>.txt`` marker
last) and successive checkpoints never interleave. ``drain()`` blocks
until everything queued so far is on disk — callers invoke it before
reading checkpoints back and before declaring a run complete.
"""

from __future__ import annotations

import queue
import threading


class SerialWriter:
    """FIFO background executor for file-IO closures."""

    def __init__(self, name='nnest-io'):
        self._q = queue.Queue()
        self._exc = None
        self._t = threading.Thread(target=self._run, daemon=True,
                                   name=name)
        self._t.start()

    def _run(self):
        while True:
            job = self._q.get()
            try:
                if job is self._STOP:
                    return
                if job is not None:
                    job()
            except BaseException as e:  # surfaced on next drain()
                if self._exc is None:   # keep the FIRST failure: later
                    self._exc = e       # jobs often fail as side effects
            finally:                    # of the root cause (ENOSPC, a
                self._q.task_done()     # closed writer, ...)

    def submit(self, job):
        self._q.put(job)

    _STOP = object()

    def close(self):
        """Drain, stop the worker thread, and re-raise any failure.
        The thread is stopped even when drain re-raises (error paths
        must not leak it). Long-lived processes that build many samplers
        (seed sweeps) call this at run end so each sampler's thread is
        released instead of leaking one blocked daemon thread per
        instance."""
        try:
            self.drain()
        finally:
            self._q.put(self._STOP)
            self._t.join()

    def drain(self):
        """Block until all queued jobs completed; re-raise the first
        failure (a lost checkpoint must not be silent)."""
        self._q.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
