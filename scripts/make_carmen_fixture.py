"""Generate tests/data/loop_rooms.clf.gz — a CARMEN-format recorded-log
fixture (ROBOTLASER1 + TRUEPOS records) for the ingestion tests and the
`cli run real.clf` path.

Provenance: raycast through the SegmentWorld simulator (no real sensor
logs are redistributable inside this repo); the FILE is genuine CARMEN
syntax, so any real Intel-Lab/ACES-style log drops into the same path.
"""
import gzip
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from slam_toolbox_tpu.core.scan import LaserConfig  # noqa: E402
from slam_toolbox_tpu.io.carmen import read_carmen, write_carmen  # noqa: E402
from slam_toolbox_tpu.io.dataset import (  # noqa: E402
    LidarSimulator, SegmentWorld,
)

laser = LaserConfig(
    name="fixture_sick", min_range=0.05, max_range=12.0,
    range_threshold=10.0, min_angle=np.deg2rad(-135.0),
    max_angle=np.deg2rad(135.0), angular_resolution=np.deg2rad(1.0),
    is_360=False, offset_pose=(0.12, 0.0, 0.0),
)
world = SegmentWorld.rooms(16.0, 10.0)
sim = LidarSimulator(world, laser, range_noise=0.012,
                     odom_noise=(0.02, 0.008), seed=1234)
lap = [
    (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
    (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0),
]
data = sim.simulate(np.array(lap * 2 + [lap[0]]), step=0.35)
ranges = np.stack([r.ranges for r, _ in data])
odom = np.stack([r.odom_pose for r, _ in data])
gt = np.stack([tp for _, tp in data])
times = np.arange(len(data)) * 0.25

out = os.path.join(os.path.dirname(__file__), "..",
                   "tests", "data", "loop_rooms.clf.gz")
os.makedirs(os.path.dirname(out), exist_ok=True)
write_carmen(out, laser, ranges, odom, times=times, true_poses=gt)

log = read_carmen(out)
assert len(log.records) == len(data)
assert log.laser.n_beams == laser.n_beams
gt2 = log.ground_truth()
assert np.allclose(gt2, gt, atol=1e-5)
with gzip.open(out) as f:
    nbytes = len(f.read())
print(f"wrote {out}: {len(data)} records, "
      f"{os.path.getsize(out)/1e3:.0f} KB gz ({nbytes/1e6:.1f} MB raw)")
