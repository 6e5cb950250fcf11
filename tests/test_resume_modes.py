"""Dock / against-node resume entry points (Mapper.cpp:3023-3102)."""
import numpy as np

from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.io.serialization import load_snapshot, save_snapshot
from slam_toolbox_tpu.mapper import Mapper
from test_pipeline import sim_config


def test_process_at_dock_resumes_from_first_node(tmp_path):
    laser, cfg = sim_config()
    world = SegmentWorld.box(5.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.005, 0.002), seed=9)
    data = sim.simulate(np.array([(-2.0, -2.0), (1.0, -2.0)]), step=0.45)

    mapper = Mapper(cfg)
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        mapper.process(s)
    path = str(tmp_path / "dock.npz")
    save_snapshot(mapper, path)

    # fresh session: resume at the dock (node 0); a scan taken at the dock
    # pose (odometry restarts near zero there) must localize onto node 0
    m2 = load_snapshot(path)
    dock_true = data[0][1]
    r = sim.scan_at(dock_true)
    s = LocalizedScan(laser, r, np.array([0.02, -0.01, 0.01]) + dock_true,
                      time=100.0)
    ok = m2.process_at_dock(s)
    assert ok
    err = np.hypot(*(s.corrected_pose[:2] - dock_true[:2]))
    assert err < 0.1, f"dock relocalization error {err}"
    # odometric pose was rebased to the corrected frame
    np.testing.assert_allclose(s.odom_pose, s.corrected_pose)


def test_process_against_node_seeds_running(tmp_path):
    laser, cfg = sim_config()
    world = SegmentWorld.box(5.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.005, 0.002), seed=11)
    data = sim.simulate(np.array([(-2.0, -2.0), (2.0, -2.0)]), step=0.45)
    mapper = Mapper(cfg)
    accepted = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if mapper.process(s):
            accepted.append((s, tp))
    path = str(tmp_path / "mid.npz")
    save_snapshot(mapper, path)

    m2 = load_snapshot(path)
    mid_scan, mid_true = accepted[len(accepted) // 2]
    r = sim.scan_at(mid_true)
    s = LocalizedScan(laser, r, mid_true + 0.02, time=200.0)
    ok = m2.process_against_node(s, mid_scan.state_id)
    assert ok
    err = np.hypot(*(s.corrected_pose[:2] - mid_true[:2]))
    assert err < 0.1, f"against-node error {err}"
    running = m2.sensor_manager.get_running_scans(laser.name)
    assert s in running
