"""Laser auto-configuration parity (laser_utils.cpp:96-206)."""
import numpy as np
import pytest

from slam_toolbox_tpu.core.laser_utils import (
    LaserMetadata, RawScan, ScanHolder, invert_scan, is_inverted,
    make_laser, to_laser_metadata,
)


def _scan_360(n=360, closed=False):
    inc = 2.0 * np.pi / n
    amax = np.pi if not closed else np.pi
    # closed interval variant: [0, 360] -> n+1 beams over the same range
    nb = n if not closed else n + 1
    return RawScan(
        angle_min=-np.pi, angle_max=np.pi, angle_increment=inc,
        range_min=0.2, range_max=30.0, ranges=np.full(nb, 5.0),
    )


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    T = np.eye(4)
    T[:3, :3] = [[1, 0, 0], [0, c, -s], [0, s, c]]
    return T


def test_make_laser_fields_and_360_detection():
    scan = _scan_360()
    T = np.eye(4)
    T[0, 3], T[1, 3] = 0.3, -0.1
    yaw = 0.25
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    laser = make_laser(scan, T, max_laser_range=20.0)
    assert laser.is_360
    assert laser.min_range == 0.2 and laser.max_range == 30.0
    assert laser.range_threshold == 20.0
    np.testing.assert_allclose(laser.offset_pose, (0.3, -0.1, yaw),
                               atol=1e-12)
    assert laser.n_beams == 360


def test_closed_interval_360_is_treated_as_non_360():
    # a "360" lidar reporting [0, 360] (one redundant beam) must not be
    # flagged 360 (laser_utils.cpp:115-118)
    scan = _scan_360(closed=True)
    laser = make_laser(scan)
    assert not laser.is_360
    assert laser.n_beams == 361


def test_range_threshold_clamping():
    scan = _scan_360()
    warns = []
    laser = make_laser(scan, max_laser_range=-1.0, warn=warns.append)
    assert laser.range_threshold == scan.range_max and len(warns) == 1
    laser = make_laser(scan, max_laser_range=99.0, warn=warns.append)
    assert laser.range_threshold == scan.range_max and len(warns) == 2


def test_is_inverted():
    assert not is_inverted(np.eye(4))          # upright
    assert is_inverted(_rot_x(np.pi))          # flipped 180 about x
    assert not is_inverted(_rot_x(0.3))        # tilted but upright
    # mounted below the base far enough that (0,0,1+z) flips sign even
    # for an upright laser? vector is rotation-only: translation z only
    # scales the vector, never flips an upright mount
    T = np.eye(4)
    T[2, 3] = -3.0
    assert is_inverted(T)  # 1 + (-3) = -2 -> z<=0 per reference rule


def test_invert_scan_full_reversal():
    r = np.arange(7.0)
    np.testing.assert_array_equal(invert_scan(r), r[::-1])


def test_scan_holder_corrects_inverted():
    scan = _scan_360()
    meta = to_laser_metadata(scan, _rot_x(np.pi))
    assert meta.inverted
    holder = ScanHolder(lasers={"laser": meta})
    raw = RawScan(
        angle_min=-np.pi, angle_max=np.pi,
        angle_increment=scan.angle_increment,
        range_min=0.2, range_max=30.0,
        ranges=np.arange(360, dtype=float), frame_id="laser",
    )
    holder.add_scan(raw)
    got = holder.get_corrected_scan(0)
    np.testing.assert_array_equal(got.ranges, np.arange(360.0)[::-1])
    # original stored scan untouched
    np.testing.assert_array_equal(holder._scans[0].ranges,
                                  np.arange(360.0))
    assert len(holder) == 1


def test_metadata_correct_upright_passthrough():
    scan = _scan_360()
    meta = to_laser_metadata(scan, np.eye(4))
    assert not meta.inverted
    r = np.arange(5.0)
    np.testing.assert_array_equal(meta.correct(r), r)
