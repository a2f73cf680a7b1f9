"""SerialWriter (utils/io_async.py): FIFO artifact writer semantics."""

import threading
import time

import pytest

from nnest_tpu.utils.io_async import SerialWriter


def test_fifo_order_and_drain():
    w = SerialWriter()
    out = []
    for i in range(50):
        w.submit(lambda i=i: out.append(i))
    w.drain()
    assert out == list(range(50))
    w.close()


def test_drain_reraises_first_failure():
    """The FIRST failure is the root cause (ENOSPC, ...); later queued
    jobs failing as side effects must not mask it."""
    w = SerialWriter()
    w.submit(lambda: (_ for _ in ()).throw(OSError('root cause')))
    w.submit(lambda: (_ for _ in ()).throw(ValueError('secondary')))
    with pytest.raises(OSError, match='root cause'):
        w.drain()
    # cleared after re-raise: a later drain of healthy jobs succeeds
    ok = []
    w.submit(lambda: ok.append(1))
    w.drain()
    assert ok == [1]
    w.close()


def test_close_stops_worker_thread():
    """close() releases the daemon thread (one sampler per seed in sweep
    processes must not accumulate blocked threads)."""
    before = threading.active_count()
    writers = [SerialWriter() for _ in range(8)]
    done = []
    for w in writers:
        w.submit(lambda: done.append(1))
    assert threading.active_count() >= before + 8
    for w in writers:
        w.close()
    assert done == [1] * 8
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before


def test_close_reraises_pending_failure():
    w = SerialWriter()
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError('boom')))
    with pytest.raises(RuntimeError, match='boom'):
        w.close()
