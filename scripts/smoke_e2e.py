"""End-to-end smoke run: synthetic world -> full SLAM pipeline -> ATE."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SMOKE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from slam_toolbox_tpu.api import SlamSession
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld, ate_rmse


def main():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(
        world, laser, range_noise=0.01, odom_noise=(0.015, 0.006), seed=42
    )
    # a loop around the apartment
    waypoints = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
        (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0), (-6.0, -3.5),
        (-3.0, -3.5),
    ])
    data = sim.simulate(waypoints, step=0.3)
    print(f"{len(data)} scans")

    cfg = MapperConfig(
        minimum_travel_distance=0.2,
        minimum_travel_heading=np.deg2rad(10.0),
        minimum_time_interval=3600.0,
        scan_buffer_size=10,
        loop_search_maximum_distance=4.0,
        loop_match_minimum_chain_size=10,
        loop_match_minimum_response_coarse=0.35,
        loop_match_minimum_response_fine=0.45,
        loop_match_maximum_variance_coarse=3.0,
        link_match_minimum_response_fine=0.1,
        link_scan_maximum_distance=1.5,
        correlation_search_space_dimension=0.5,
        correlation_search_space_resolution=0.01,
        correlation_search_space_smear_deviation=0.1,
        distance_variance_penalty=0.5,
        angle_variance_penalty=1.0,
    )
    sess = SlamSession(cfg, laser)
    t0 = time.time()
    est, gt, odo = [], [], []
    n_proc = 0
    for i, (scan, true_pose) in enumerate(data):
        out = sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if out is not None:
            n_proc += 1
            est.append(out[0])
            gt.append(true_pose)
            odo.append(scan.odom_pose)
        if i % 25 == 0:
            print(f"  scan {i}  processed={n_proc}  t={time.time()-t0:.1f}s")
    dt = time.time() - t0
    est, gt, odo = np.stack(est), np.stack(gt), np.stack(odo)
    print(f"processed {n_proc}/{len(data)} in {dt:.1f}s "
          f"({n_proc/dt:.2f} scans/s)")
    print(f"ATE slam: {ate_rmse(est, gt):.3f} m   "
          f"ATE odom: {ate_rmse(odo, gt):.3f} m")
    print(f"edges: {len(sess.mapper.graph.edges)}  "
          f"nodes: {sess.mapper.solver.n_nodes}")
    grid = sess.get_occupancy_grid(0.05)
    print(f"map {grid.width}x{grid.height} occupied "
          f"{(grid.cells == 100).sum()} free {(grid.cells == 255).sum()}")


if __name__ == "__main__":
    main()
