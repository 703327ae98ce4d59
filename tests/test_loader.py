"""DevicePrefetcher lifecycle: error surfacing, shutdown, exhaustion.

The reference delegates this to torch DataLoader workers; our prefetcher
(refign_tpu/data/loader.py) is original machinery, so it gets direct
lifecycle tests rather than goldens.
"""
import time

import pytest

from refign_tpu.data.loader import DevicePrefetcher


def test_producer_error_surfaces_on_next():
    def boom():
        raise ValueError("boom")

    p = DevicePrefetcher(make_batch=boom, put=lambda b: b)
    with pytest.raises(ValueError, match="boom"):
        p.next()
    p.close()


def test_close_does_not_stall_when_error_hits_full_queue():
    """Producer raising while the queue is full must not hang close():
    the err put has to poll the stop event like the ok path does."""
    calls = {"n": 0}

    def make_batch():
        calls["n"] += 1
        if calls["n"] <= 2:
            return calls["n"]
        raise ValueError("late boom")

    p = DevicePrefetcher(make_batch=make_batch, put=lambda b: b, depth=2)
    time.sleep(1.0)  # queue fills with 2 ok items; producer stuck on err
    t0 = time.time()
    p.close()
    assert time.time() - t0 < 3.0, "close() stalled on the error put"
    assert not p._t.is_alive(), "producer thread leaked"


def test_next_raises_after_close_instead_of_deadlocking():
    p = DevicePrefetcher(make_batch=lambda: 1, put=lambda b: b)
    assert p.next() == 1
    p.close()
    with pytest.raises(RuntimeError, match="exhausted"):
        while True:  # drain whatever was buffered, then it must raise
            p.next()


def test_normal_flow():
    p = DevicePrefetcher(make_batch=lambda: 42, put=lambda b: b * 2)
    assert p.next() == 84
    assert p.next() == 84
    p.close()
