"""SlamSession occupancy-grid caching: steady-state publishes fold only
new scans (add_scans_incremental); pose corrections / removals /
resolution changes force a full re-raster. Equivalence of the
incremental fold itself is covered by
test_occupancy.test_incremental_equals_full_rebuild."""
import numpy as np
import pytest

from slam_toolbox_tpu.api import SlamSession
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.kernels import occupancy


@pytest.fixture
def sess_and_data():
    laser = LaserConfig(
        beam_count=91, min_angle=-np.pi / 2, max_angle=np.pi / 2,
        min_range=0.05, max_range=12.0, range_threshold=10.0, is_360=False,
    )
    cfg = MapperConfig(
        use_scan_matching=False,
        minimum_travel_distance=0.0, minimum_time_interval=0.0,
    )
    sess = SlamSession(cfg, laser)

    def make_ranges(i, r=5.0):
        # deterministic: varying the base range controls the scan bbox
        return np.full(laser.n_beams, r) + 0.2 * np.sin(
            np.linspace(0, 3, laser.n_beams) + 0.1 * i
        )

    return sess, laser, make_ranges


def _count_calls(monkeypatch, module, name):
    calls = []
    orig = getattr(module, name)

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(module, name, spy)
    return calls


def test_steady_state_publish_is_incremental(sess_and_data, monkeypatch):
    sess, laser, make_ranges = sess_and_data
    # a small inner loop first, then a WIDE bounding pass so later scans
    # stay inside the established extent
    for i, x in enumerate(np.linspace(-3.0, 3.0, 8)):
        sess.process_scan(make_ranges(i), [x, 0.0, 0.0], time=i)
    g1 = sess.get_occupancy_grid()
    inc_calls = _count_calls(monkeypatch, occupancy, "add_scans_incremental")
    full_calls = _count_calls(monkeypatch, occupancy, "create_from_scans")
    # new scans inside the extent (shorter ranges, interior poses) ->
    # incremental fold, no full rebuild
    for i, x in enumerate(np.linspace(-1.0, 1.0, 4)):
        sess.process_scan(make_ranges(10 + i, r=3.0), [x, 0.0, 0.0],
                          time=10 + i)
    g2 = sess.get_occupancy_grid()
    assert len(inc_calls) == 1 and len(full_calls) == 0
    # and it matches a from-scratch raster exactly (this reference call
    # goes through the spy too — account for it below)
    ref = occupancy.create_from_scans(
        sess.mapper.all_processed_scans(),
        sess.config.map_resolution,
        sess.config.min_pass_through,
        sess.config.occupancy_threshold,
    )
    np.testing.assert_array_equal(g2.cells, ref.cells)
    np.testing.assert_allclose(g2.offset, ref.offset)
    # no new scans -> cached object returned untouched
    g3 = sess.get_occupancy_grid()
    assert g3 is g2
    assert len(inc_calls) == 1 and len(full_calls) == 1  # ref call only


def test_extent_growth_forces_full_rebuild(sess_and_data, monkeypatch):
    sess, laser, make_ranges = sess_and_data
    for i, x in enumerate(np.linspace(-1.0, 1.0, 4)):
        sess.process_scan(make_ranges(i), [x, 0.0, 0.0], time=i)
    sess.get_occupancy_grid()
    full_calls = _count_calls(monkeypatch, occupancy, "create_from_scans")
    # a far-away scan extends the map extent
    sess.process_scan(make_ranges(9), [15.0, 0.0, 0.0], time=9)
    g = sess.get_occupancy_grid()
    assert len(full_calls) == 1
    ref = occupancy.create_from_scans(
        sess.mapper.all_processed_scans(),
        sess.config.map_resolution,
        sess.config.min_pass_through,
        sess.config.occupancy_threshold,
    )
    np.testing.assert_array_equal(g.cells, ref.cells)


def test_pose_revision_and_resolution_invalidate(sess_and_data, monkeypatch):
    sess, laser, make_ranges = sess_and_data
    for i, x in enumerate(np.linspace(-1.0, 1.0, 6)):
        sess.process_scan(make_ranges(i), [x, 0.0, 0.0], time=i)
    sess.get_occupancy_grid()
    full_calls = _count_calls(monkeypatch, occupancy, "create_from_scans")
    # simulate a solver correction pass
    sess.mapper.graph.pose_revision += 1
    sess.get_occupancy_grid()
    assert len(full_calls) == 1
    # different resolution -> rebuild, and the cache keys on it
    sess.get_occupancy_grid(resolution=0.1)
    assert len(full_calls) == 2
    sess.get_occupancy_grid(resolution=0.1)
    assert len(full_calls) == 2
