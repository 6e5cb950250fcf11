"""Sync/async queue policy tests."""
import numpy as np
import warnings

from slam_toolbox_tpu.api.queue_modes import AsyncPolicy, SyncQueue


class FakeSession:
    def __init__(self, fail=False):
        self.processed = []

    def process_scan(self, ranges, odom_pose, t):
        self.processed.append((ranges, odom_pose, t))
        return np.zeros(3), np.eye(3)


def test_sync_queue_processes_in_order():
    s = FakeSession()
    q = SyncQueue(s)
    for i in range(5):
        q.add_scan(np.full(3, i), np.zeros(3), t=i)
    assert q.pump() == 5
    assert [t for _, _, t in s.processed] == [0, 1, 2, 3, 4]


def test_sync_queue_backlog_warns_and_clears():
    s = FakeSession()
    q = SyncQueue(s, backlog_warn=3)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for i in range(6):
            q.add_scan(np.zeros(3), np.zeros(3), t=i)
        assert any("backlog" in str(x.message) for x in w)
    assert q.clear() == 6
    assert q.pump() == 0


def test_async_policy_processes_when_free():
    s = FakeSession()
    a = AsyncPolicy(s)
    out = a.add_scan(np.zeros(3), np.zeros(3), t=0.0)
    assert out is not None
    assert len(s.processed) == 1
    assert a.dropped == 0
