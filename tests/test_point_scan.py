"""LocalizedPointScan (LocalizedRangeScanWithPoints, Karto.h:5777)."""
import numpy as np
import pytest

from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedPointScan, LocalizedScan


def _laser(offset=(0.0, 0.0, 0.0)):
    return LaserConfig(
        beam_count=61, min_angle=-1.5, max_angle=1.5, min_range=0.05,
        max_range=10.0, range_threshold=8.0, is_360=False,
        offset_pose=offset,
    )


def _polar_equivalent(laser, rng):
    """A polar scan and the point scan carrying its exact endpoints in
    the robot frame."""
    ranges = 3.0 + rng.uniform(-0.5, 0.5, laser.n_beams)
    ranges[7] = np.nan
    polar = LocalizedScan(laser, ranges, [0.3, -0.2, 0.4])
    lp = polar.local_points  # sensor frame
    ox, oy, oh = laser.offset_pose
    c, s = np.cos(oh), np.sin(oh)
    robot_pts = np.stack(
        [ox + c * lp[:, 0] - s * lp[:, 1],
         oy + s * lp[:, 0] + c * lp[:, 1]], axis=-1,
    )
    pts = LocalizedPointScan(laser, ranges, robot_pts, [0.3, -0.2, 0.4])
    return polar, pts


def test_world_points_match_polar():
    """With points equal to the polar endpoints, the world projection is
    identical (corrected o offset o offset^-1 o p == corrected o p)."""
    laser = _laser(offset=(0.12, -0.05, 0.3))
    polar, pts = _polar_equivalent(laser, np.random.default_rng(3))
    for s in (polar, pts):
        s.set_corrected_pose([1.5, 2.5, 0.7])
    w1 = polar.points_world()
    w2 = pts.points_world()
    m = np.isfinite(w1[:, 0])
    np.testing.assert_allclose(w2[m], w1[m], atol=1e-12)


def test_barycenter_uses_all_finite_points():
    """WithPoints' Update() applies no range filtering (Karto.h:5813):
    a beam past range_threshold still contributes to the barycenter."""
    laser = _laser()
    rng = np.random.default_rng(4)
    ranges = np.full(laser.n_beams, 2.0)
    ranges[0] = 9.5  # past range_threshold=8 -> filtered out of polar
    polar = LocalizedScan(laser, ranges, [0.0, 0.0, 0.0])
    lp = np.nan_to_num(polar.local_points)
    pts = LocalizedPointScan(laser, ranges, lp, [0.0, 0.0, 0.0])
    # polar barycenter excludes beam 0; point barycenter includes it
    assert not np.allclose(polar.barycenter, pts.barycenter)
    expected = lp.mean(axis=0)
    np.testing.assert_allclose(pts.barycenter[:2], expected, atol=1e-12)
    # bbox includes the far point (beam 0 at angle -1.5 rad: y ~ -9.47)
    assert pts.bounding_box[0][1] <= -9.4


def test_nan_points_excluded():
    laser = _laser()
    pts_xy = np.ones((laser.n_beams, 2))
    pts_xy[3] = np.nan
    s = LocalizedPointScan(
        laser, np.ones(laser.n_beams), pts_xy, [0.0, 0.0, 0.0]
    )
    assert not s.filtered_mask[3]
    assert s.filtered_mask.sum() == laser.n_beams - 1
    np.testing.assert_allclose(s.barycenter[:2], [1.0, 1.0], atol=1e-12)


def test_shape_validation():
    laser = _laser()
    with pytest.raises(ValueError):
        LocalizedPointScan(
            laser, np.ones(laser.n_beams), np.ones((5, 2)), [0, 0, 0]
        )


def test_finite_range_nonfinite_point_invalid_in_matcher_paths():
    """Round-2 advisor (medium): a finite range + non-finite point must
    NOT become a 'valid' beam in matcher/raster paths (which derive
    validity from isfinite(ranges)) — the reference WithPoints Update()
    excludes NaN POINTS regardless of range (Karto.h:5819-5824). Without
    the __init__ reconciliation its nan_to_num local point was (0,0): a
    spurious sensor-origin hit in every raster."""
    from slam_toolbox_tpu.kernels.match import _scan_device_cache
    from slam_toolbox_tpu.mapper.streaming import scan_pack

    laser = _laser()
    pts_xy = np.ones((laser.n_beams, 2)) * 2.0
    pts_xy[5] = np.nan          # non-finite point, finite range
    ranges = np.full(laser.n_beams, 2.5)
    ranges[9] = np.nan          # finite point, non-finite range
    s = LocalizedPointScan(laser, ranges, pts_xy, [0.0, 0.0, 0.0])

    # validity masks all key off isfinite(ranges): beam 5 invalid,
    # beam 9 VALID (the points drive validity for this subclass)
    assert not np.isfinite(s.ranges[5])
    assert np.isfinite(s.ranges[9])
    assert s.ranges[9] == pytest.approx(np.hypot(2.0, 2.0))

    _, finite = _scan_device_cache(s)
    finite = np.asarray(finite)
    assert not finite[5] and finite[9]

    pack = scan_pack(s)
    flags = pack[:, 7].astype(np.int32)
    assert (flags[5] & 1) == 0 and (flags[9] & 1) == 1
    # and the packed local point for the invalid beam is zeroed, masked
    np.testing.assert_allclose(pack[9, 0:2], s._local_pts[9], atol=1e-6)


def test_consistent_masks_polar_equivalence_unchanged():
    """The reconciliation must be a no-op when ranges and points agree."""
    laser = _laser(offset=(0.12, -0.05, 0.3))
    polar, pts = _polar_equivalent(laser, np.random.default_rng(11))
    m1 = np.isfinite(polar.ranges)
    m2 = np.isfinite(pts.ranges)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(
        pts.ranges[m2], polar.ranges[m1], atol=1e-12
    )
