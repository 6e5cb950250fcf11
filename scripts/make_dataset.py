"""Generate recorded-dataset npz files for the BASELINE benchmark configs
(a synthetic stand-in for the reference's rosbag workflow).

  python scripts/make_dataset.py --out /tmp/apartment.npz --scans 5000
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld


def figure_eight_waypoints(loops: int) -> np.ndarray:
    """Repeated double-loop through the apartment world."""
    loop_a = [
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 3.5), (1.0, 3.5),
        (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0), (-6.0, -3.5),
    ]
    wps = []
    for _ in range(loops):
        wps.extend(loop_a)
    return np.array(wps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scans", type=int, default=5000)
    ap.add_argument("--beams", type=int, default=1081)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=2 * np.pi / (args.beams - 1),
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(
        world, laser, range_noise=0.01, odom_noise=(0.012, 0.005),
        seed=args.seed,
    )
    # pick loop count/step to hit the requested scan count
    per_loop = 24.0 / 0.3  # rough loop length / step
    loops = max(int(np.ceil(args.scans / per_loop)), 1)
    data = sim.simulate(figure_eight_waypoints(loops), step=0.3)
    data = data[: args.scans]

    ranges = np.stack([s.ranges for s, _ in data])
    odom = np.stack([s.odom_pose for s, _ in data])
    gt = np.stack([tp for _, tp in data])
    times = 0.1 * np.arange(len(data))
    np.savez_compressed(
        args.out,
        ranges=ranges, odom=odom, times=times, ground_truth=gt,
        min_range=laser.min_range, max_range=laser.max_range,
        range_threshold=laser.range_threshold,
        min_angle=laser.min_angle, max_angle=laser.max_angle,
        angular_resolution=laser.angular_resolution,
    )
    print(f"{len(data)} scans -> {args.out}")


if __name__ == "__main__":
    main()
