"""CARMEN recorded-log ingestion (io/carmen.py + cli run wiring).

Reference parity target: the rosbag scan-ingestion path
(slam_toolbox_common.cpp:715-737) and the README's recorded-data
validation (/root/reference/README.md:42-44). The checked-in fixture
tests/data/loop_rooms.clf.gz is genuine CARMEN ROBOTLASER1+TRUEPOS
syntax (provenance: simulator raycast — see scripts/make_carmen_fixture;
real logs are not redistributable here, but any Intel-Lab-style log
takes the identical path).
"""
import os

import numpy as np
import pytest

from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.carmen import (
    is_carmen_log, read_carmen, write_carmen,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "loop_rooms.clf.gz")

# two classic old-format lines (FLASER: n ranges laser_xyt odom_xyt ts
# host log_ts) with a preceding TRUEPOS, the Intel-Lab record layout
_OLD_LOG = """\
# comment line
PARAM robot_front_laser_max 81.92
TRUEPOS 1.0 2.0 0.5 0.9 1.9 0.45 100.10 host 100.10
FLASER 4 1.50 2.25 81.91 3.75 0.90 1.90 0.45 0.90 1.90 0.45 100.12 host 100.12
ODOM 0.95 1.95 0.46 0.1 0.0 0.0 100.15 host 100.15
FLASER 4 1.40 2.20 3.10 81.92 1.00 2.00 0.50 1.00 2.00 0.50 100.22 host 100.22
"""


def test_parse_old_format_flaser(tmp_path):
    p = str(tmp_path / "old.clf")
    with open(p, "w") as f:
        f.write(_OLD_LOG)
    assert is_carmen_log(p)
    log = read_carmen(p)
    assert len(log.records) == 2
    assert log.params["robot_front_laser_max"] == "81.92"
    las = log.laser
    # gmapping convention: fov pi, start -pi/2, increment pi/n
    assert las.n_beams == 4
    assert np.isclose(las.min_angle, -np.pi / 2)
    assert np.isclose(las.angular_resolution, np.pi / 4)
    assert np.isclose(las.max_range, 81.92)
    r0 = log.records[0]
    # maxrange readings become +inf no-returns
    assert np.isposinf(r0.ranges[2])
    assert np.isclose(r0.ranges[0], 1.50)
    assert np.allclose(r0.odom_pose, [0.90, 1.90, 0.45])
    # TRUEPOS attaches to the next laser record only
    assert np.allclose(r0.true_pose, [1.0, 2.0, 0.5])
    assert log.records[1].true_pose is None
    gt = log.ground_truth()  # second record inherits the last TRUEPOS
    assert np.allclose(gt[1], [1.0, 2.0, 0.5])


def test_roundtrip_robotlaser1(tmp_path):
    laser = LaserConfig(
        min_range=0.05, max_range=8.0, range_threshold=7.5,
        min_angle=np.deg2rad(-120.0), max_angle=np.deg2rad(120.0),
        angular_resolution=np.deg2rad(2.0), is_360=False,
        offset_pose=(0.2, -0.05, 0.1),
    )
    rng = np.random.default_rng(3)
    N, B = 7, laser.n_beams
    ranges = rng.uniform(0.5, 7.0, (N, B))
    ranges[2, 5] = np.inf          # no-return round-trips
    odom = rng.normal(0, 1.0, (N, 3))
    gt = odom + 0.01
    p = str(tmp_path / "rt.clf.gz")
    write_carmen(p, laser, ranges, odom, true_poses=gt)
    log = read_carmen(p)
    las = log.laser
    assert las.n_beams == B
    assert np.isclose(las.min_angle, laser.min_angle, atol=1e-5)
    assert np.isclose(las.angular_resolution, laser.angular_resolution,
                      atol=1e-7)
    got = np.stack([r.ranges for r in log.records])
    assert np.isposinf(got[2, 5])
    fin = np.isfinite(ranges) & (ranges < 8.0 * 0.99)
    assert np.allclose(got[fin], ranges[fin], atol=2e-3)
    assert np.allclose(
        np.stack([r.odom_pose for r in log.records]), odom, atol=1e-5
    )
    assert np.allclose(log.ground_truth(), gt, atol=1e-5)
    # extrinsics recovered from laser-vs-robot pose of the first record
    assert np.allclose(las.offset_pose, laser.offset_pose, atol=1e-4)


@pytest.mark.slow
def test_fixture_end_to_end(tmp_path):
    """`cli run` on the recorded log: map + trajectory out, loop closure
    fires, final ATE bounded and better than odometry."""
    from slam_toolbox_tpu.api import cli

    assert is_carmen_log(FIXTURE)
    out = str(tmp_path / "clfrun")
    rc = cli.main(["run", "--dataset", FIXTURE, "--out", out])
    assert rc == 0
    import json

    with open(out + "_metrics.json") as f:
        m = json.load(f)
    assert m["nodes"] > 100
    assert m["ate_rmse_m"] < 0.30
    assert m["ate_rmse_m"] < m["ate_odom_m"]
    assert os.path.exists(out + ".pgm")
    assert os.path.exists(out + "_trajectory.txt")

    # a loop closure actually fired: some accepted edge spans far-apart
    # state ids (beyond any running-buffer link)
    from slam_toolbox_tpu.api import SlamSession
    from slam_toolbox_tpu.core.params import ONLINE_SYNC
    from slam_toolbox_tpu.io.carmen import read_carmen as _rc

    log = _rc(FIXTURE)
    sess = SlamSession(ONLINE_SYNC, log.laser)
    sess.deserialize(out + ".posegraph.npz")
    edges = sess.mapper.graph.edges
    spans = [abs(e.source.state_id - e.target.state_id) for e in edges]
    assert max(spans) > 20, "no loop-closure edge in the graph"
