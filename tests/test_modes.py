"""Localization mode, lifelong decay, and map-merge tests."""
import numpy as np
import pytest

from slam_toolbox_tpu.api import MatchType, SlamSession
from slam_toolbox_tpu.api.merge import MapMerger
from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.mapper.lifelong import (
    LifelongConfig, LifelongMapper, area_overlap_ratio, intersect_area, iou,
    reading_overlap_ratio,
)
from test_pipeline import sim_config

# heavyweight end-to-end module: excluded from the fast subset
# (python -m pytest -m 'not slow'); CI runs everything
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mapped_session(tmp_path_factory):
    """A short mapping run + snapshot, reused by mode tests."""
    laser, cfg = sim_config()
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.01, 0.004), seed=11)
    waypoints = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 1.0),
    ])
    data = sim.simulate(waypoints, step=0.45)
    sess = SlamSession(cfg, laser)
    for i, (scan, tp) in enumerate(data):
        sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
    path = str(tmp_path_factory.mktemp("mode") / "session.npz")
    sess.serialize(path)
    return sess, path, data, world


def test_localization_mode_bounds_graph(mapped_session):
    sess, path, data, world = mapped_session
    laser, cfg = sim_config()
    cfg = cfg.replace(scan_buffer_size=5)
    loc = SlamSession(cfg, laser, mode="localization")
    loc.deserialize(path, MatchType.LOCALIZE_AT_POSE,
                    initial_pose=data[0][0].odom_pose)
    n_prior = loc.mapper.solver.n_nodes

    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.01, 0.004), seed=23)
    waypoints = np.array([(-6.0, -3.5), (0.0, -3.5), (3.0, -3.5)])
    new_data = sim.simulate(waypoints, step=0.45)
    n_done = 0
    errs = []
    for i, (scan, tp) in enumerate(new_data):
        out = loc.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if out is not None:
            n_done += 1
            errs.append(np.hypot(*(out[0][:2] - tp[:2])))
    assert n_done > 6
    # the rolling buffer keeps the graph bounded: at most prior + buffer
    assert (
        loc.mapper.solver.n_nodes <= n_prior + cfg.scan_buffer_size
    ), f"{loc.mapper.solver.n_nodes} vs prior {n_prior}"
    # localized within the prior map
    assert np.median(errs) < 0.3, f"median err {np.median(errs)}"


def test_lifelong_metrics():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    from slam_toolbox_tpu.core.scan import LocalizedScan

    world = SegmentWorld.box(4.0)
    sim = LidarSimulator(world, laser, range_noise=0.0, seed=1)
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([0.5, 0.2, 0.1])
    s1 = LocalizedScan(laser, sim.scan_at(p1), p1)
    s2 = LocalizedScan(laser, sim.scan_at(p2), p2)
    # same room: nearly full bbox overlap
    assert iou(s1, s2) > 0.7
    assert area_overlap_ratio(s1, s2) > 0.8
    assert intersect_area(s1, s1) > 50.0
    # identical scans have IOU 1
    assert iou(s1, s1) == pytest.approx(1.0, abs=1e-9)
    # reading overlap on synthetic discs (in a shared room every scan's
    # bbox is the room, so this metric needs scans with differing bboxes;
    # wall points on the bbox boundary are excluded by the strict
    # intersect test — reference semantics, lifelong :455-478)
    const = np.full(laser.n_beams, 2.0)
    d1 = LocalizedScan(laser, const, np.array([0.0, 0.0, 0.0]))
    d2 = LocalizedScan(laser, const, np.array([1.0, 0.0, 0.0]))
    d3 = LocalizedScan(laser, const, np.array([10.0, 0.0, 0.0]))
    r_near = reading_overlap_ratio(d2, d1)
    r_far = reading_overlap_ratio(d3, d1)
    assert r_near > 0.2
    assert r_far == 0.0


def test_lifelong_decay_removes_redundant_nodes(mapped_session):
    """Revisit the same corridor repeatedly; decay should remove nodes."""
    laser, cfg = sim_config()
    world = SegmentWorld.rooms(16.0, 10.0)
    from slam_toolbox_tpu.mapper import Mapper
    from slam_toolbox_tpu.core.scan import LocalizedScan

    mapper = Mapper(cfg.replace(scan_buffer_size=4, do_loop_closing=False))
    ll = LifelongMapper(
        mapper,
        LifelongConfig(removal_score=0.5, nearby_penalty=0.4,
                       iou_thresh=0.05),
    )
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.005, 0.002), seed=5)
    # pace back and forth over the same 2 m of corridor
    wps = np.array([(-6.0, -3.5), (-4.0, -3.5), (-6.0, -3.6),
                    (-4.0, -3.6), (-6.0, -3.5), (-4.0, -3.5)])
    data = sim.simulate(wps, step=0.45)
    removed_total = 0
    for i, (scan, tp) in enumerate(data):
        ok = mapper.process(scan)
        if ok:
            removed_total += len(ll.evaluate_node_depreciation(scan))
    assert removed_total > 0, "aggressive decay config should remove nodes"
    # graph stays consistent: every vertex still resolvable
    for name, verts in mapper.graph.vertices.items():
        for sid, s in verts.items():
            assert mapper.sensor_manager.get_scan(name, sid) is s


def test_merge_auto_align(mapped_session):
    """Second session recorded in an offset odometry frame; auto_align
    must recover the offset."""
    sess, path, data, world = mapped_session
    laser, cfg = sim_config()
    from slam_toolbox_tpu.core import geometry
    from slam_toolbox_tpu.core.scan import LocalizedScan
    from slam_toolbox_tpu.api import SlamSession

    offset = np.array([1.3, -0.8, np.deg2rad(12.0)])
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.005, 0.002), seed=44)
    wps = np.array([(-5.0, -3.5), (0.0, -3.5), (3.0, -3.5)])
    d2 = sim.simulate(wps, step=0.45)
    sess2 = SlamSession(cfg, laser)
    for i, (scan, tp) in enumerate(d2):
        # odometry reported in a frame offset from the world
        odom = np.asarray(geometry.compose(offset, scan.odom_pose))
        sess2.process_scan(scan.ranges, odom, time=i * 0.1)

    merger = MapMerger()
    merger.add_scans(sess.mapper.all_processed_scans())
    i1 = merger.add_scans(sess2.mapper.all_processed_scans())
    # rough initial guess: we only know the session started "somewhere
    # near (-5, -3.5)" — 30+ cm and several degrees off
    guess = np.array([-4.8, -3.3, 0.1])
    resp = merger.auto_align(0, i1, initial_guess=guess)
    assert resp is not None and resp > 0.4
    # the recovered correction must undo the odometry-frame offset
    t0 = merger.submaps[i1][0]
    aligned = np.asarray(geometry.compose(
        merger.corrections[i1], t0.corrected_pose
    ))
    true0 = d2[0][1]
    err = np.hypot(*(aligned[:2] - true0[:2]))
    assert err < 0.1, f"auto-align error {err}"


def test_map_merge(mapped_session, tmp_path):
    sess, path, data, world = mapped_session
    merger = MapMerger()
    i0 = merger.add_submap(path)
    i1 = merger.add_submap(path)
    # offset the second copy; the merged map must span both
    merger.set_correction(i1, np.array([20.0, 0.0, 0.0]))
    grid = merger.merge(resolution=0.1)
    assert grid is not None
    assert grid.width > 250  # two 16 m maps 20 m apart at 0.1 res
    assert (grid.cells == 100).sum() > 100


def test_localization_streaming_matches_classic(mapped_session):
    """Streaming elastic localization: same bounded graph and comparable
    accuracy as the classic per-scan path (the buffer append/evict is
    hooked into the drain)."""
    sess, path, data, world = mapped_session
    laser, cfg = sim_config()
    cfg = cfg.replace(scan_buffer_size=5)
    loc = SlamSession(cfg, laser, mode="localization", streaming=True,
                      drain_every=4)
    loc.deserialize(path, MatchType.LOCALIZE_AT_POSE,
                    initial_pose=data[0][0].odom_pose)
    n_prior = loc.mapper.solver.n_nodes

    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.01, 0.004), seed=23)
    waypoints = np.array([(-6.0, -3.5), (0.0, -3.5), (3.0, -3.5)])
    new_data = sim.simulate(waypoints, step=0.45)
    n_done = 0
    for i, (scan, tp) in enumerate(new_data):
        out = loc.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if out is not None:
            n_done += 1
    loc.flush()
    assert n_done > 6
    # rolling buffer still bounds the graph under streaming
    assert (
        loc.mapper.solver.n_nodes <= n_prior + cfg.scan_buffer_size
    ), f"{loc.mapper.solver.n_nodes} vs prior {n_prior}"
    assert len(loc.mapper.localization_buffer) <= cfg.scan_buffer_size
    # corrected poses (post-drain) localize within the prior map; buffer
    # eviction removed older scans, so match survivors to ground truth by
    # their scan time (i * 0.1)
    gt = [tp for scan, tp in new_data]
    errs = []
    for s in loc.mapper.all_processed_scans()[n_prior:]:
        i = int(round(s.time * 10.0))
        errs.append(np.hypot(*(s.corrected_pose[:2] - gt[i][:2])))
    assert errs and np.median(errs) < 0.5, f"median {np.median(errs)}"


def test_toggle_mode_runtime(mapped_session):
    """Map-and-localization: runtime mapping<->localization switch
    (slam_toolbox_map_and_localization.cpp toggle service)."""
    sess, path, data, world = mapped_session
    laser, cfg = sim_config()
    cfg = cfg.replace(scan_buffer_size=4)
    s = SlamSession(cfg, laser, mode="mapping")
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.01, 0.004), seed=41)
    wps = np.array([(-6.0, -3.5), (0.0, -3.5), (3.0, -3.5)])
    d = sim.simulate(wps, step=0.45)
    half = len(d) // 2
    for i, (scan, tp) in enumerate(d[:half]):
        s.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
    n_mapping = s.mapper.solver.n_nodes
    s.toggle_mode("localization")
    for i, (scan, tp) in enumerate(d[half:]):
        s.process_scan(scan.ranges, scan.odom_pose, time=(half + i) * 0.1)
    # localization bounds growth to the buffer size
    assert s.mapper.solver.n_nodes <= n_mapping + cfg.scan_buffer_size
    n_loc = s.mapper.solver.n_nodes
    s.toggle_mode("mapping")
    assert s.mode == "mapping"
    # buffered nodes became permanent; mapping adds nodes again
    sim2 = LidarSimulator(world, laser, range_noise=0.01,
                          odom_noise=(0.01, 0.004), seed=43)
    d2 = sim2.simulate(np.array([(3.0, -3.5), (5.0, -3.5)]), step=0.45)
    for i, (scan, tp) in enumerate(d2):
        s.process_scan(scan.ranges, scan.odom_pose,
                       time=(len(d) + i) * 0.1)
    assert s.mapper.solver.n_nodes > n_loc
