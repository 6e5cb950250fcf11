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


# -- three-domain pause (toolbox_types.hpp:77-117) --------------------------

class PausableSession(FakeSession):
    def __init__(self):
        super().__init__()
        from slam_toolbox_tpu.api.slam import PausedState

        self.paused_state = PausedState()

    def is_paused(self, app):
        return self.paused_state.get(app)


def test_processing_pause_queues_without_consuming():
    from slam_toolbox_tpu.api.slam import PausedApplication

    s = PausableSession()
    q = SyncQueue(s, backlog_warn=100)
    s.paused_state.set(PausedApplication.PROCESSING, True)
    for i in range(4):
        q.add_scan(np.zeros(3), np.zeros(3), t=i)
    assert q.pump() == 0          # consumer idles...
    assert len(q.queue) == 4      # ...but the queue keeps accumulating
    s.paused_state.set(PausedApplication.PROCESSING, False)
    assert q.pump() == 4          # everything drains in order afterwards
    assert [t for _, _, t in s.processed] == [0, 1, 2, 3]


def test_session_pause_domains_are_independent():
    from slam_toolbox_tpu.api.slam import (
        PausedApplication, SlamSession,
    )
    from slam_toolbox_tpu.core.params import MapperConfig
    from slam_toolbox_tpu.core.scan import LaserConfig

    laser = LaserConfig(beam_count=31, min_angle=-1.0, max_angle=1.0,
                        min_range=0.05, max_range=10.0,
                        range_threshold=8.0, is_360=False)
    sess = SlamSession(
        MapperConfig(use_scan_matching=False,
                     minimum_travel_distance=0.0,
                     minimum_time_interval=0.0),
        laser,
    )
    r = np.full(31, 4.0)
    assert sess.process_scan(r, [0.0, 0.0, 0.0], time=0) is not None
    # NEW_MEASUREMENTS pause drops scans at the gate (common.cpp:762)
    assert sess.pause() is True
    assert sess.process_scan(r, [0.5, 0.0, 0.0], time=1) is None
    assert sess.pause() is False
    assert sess.process_scan(r, [1.0, 0.0, 0.0], time=2) is not None
    # VISUALIZING_GRAPH pause suppresses graph publishes (common.cpp:524)
    assert sess.get_graph() is not None
    sess.paused_state.set(PausedApplication.VISUALIZING_GRAPH, True)
    assert sess.get_graph() is None
    sess.paused_state.set(PausedApplication.VISUALIZING_GRAPH, False)
    # interactive mode = PROCESSING + VISUALIZING_GRAPH paused together
    assert sess.toggle_interactive_mode() is True
    assert sess.is_paused(PausedApplication.PROCESSING)
    assert sess.is_paused(PausedApplication.VISUALIZING_GRAPH)
    assert not sess.is_paused(PausedApplication.NEW_MEASUREMENTS)
    assert sess.toggle_interactive_mode() is False
    assert not sess.is_paused(PausedApplication.PROCESSING)
