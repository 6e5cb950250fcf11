"""Multi-robot mapping: two sensors feeding one mapper; the second
robot's first scan links to the first robot's map
(AddEdges first-scan branch, Mapper.cpp:1454-1483)."""
import numpy as np

from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.mapper import Mapper
from test_pipeline import sim_config


def test_two_robot_session():
    laser_cfg, cfg = sim_config()
    laser_a = LaserConfig(
        name="robot_a", min_range=0.05, max_range=12.0,
        range_threshold=10.0, angular_resolution=np.deg2rad(1.0),
    )
    laser_b = LaserConfig(
        name="robot_b", min_range=0.05, max_range=12.0,
        range_threshold=10.0, angular_resolution=np.deg2rad(1.0),
    )
    world = SegmentWorld.box(5.0)
    sim_a = LidarSimulator(world, laser_a, range_noise=0.01,
                           odom_noise=(0.01, 0.004), seed=1)
    sim_b = LidarSimulator(world, laser_b, range_noise=0.01,
                           odom_noise=(0.01, 0.004), seed=2)
    mapper = Mapper(cfg)

    # robot A maps a stretch
    wps_a = np.array([(-3.0, -3.0), (3.0, -3.0)])
    data_a = sim_a.simulate(wps_a, step=0.45)
    for i, (scan, tp) in enumerate(data_a):
        s = LocalizedScan(laser_a, scan.ranges, scan.odom_pose,
                          time=i * 0.1)
        mapper.process(s)
    n_a = mapper.solver.n_nodes
    assert n_a > 5

    # robot B starts inside the same map
    wps_b = np.array([(0.0, 0.0), (2.0, 0.0)])
    data_b = sim_b.simulate(wps_b, step=0.45)
    for i, (scan, tp) in enumerate(data_b):
        s = LocalizedScan(laser_b, scan.ranges, scan.odom_pose,
                          time=100 + i * 0.1)
        mapper.process(s)

    assert mapper.solver.n_nodes > n_a
    # the two sensors' graphs must be connected through the first-scan
    # cross link: BFS from a robot_b scan should reach robot_a scans
    sm = mapper.sensor_manager
    b0 = sm.get_scans("robot_b")[0]
    reached = mapper.graph.find_near_linked_scans(b0, 1e9)
    names = {s.laser.name for s in reached}
    assert names == {"robot_a", "robot_b"}, names
