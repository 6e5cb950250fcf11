"""Parity of the round-5 host fast paths against their reference
implementations: native scan_pack vs the numpy assembly, the closed-form
3x3 sqrt-info vs LAPACK, the scalar rotate_covariance vs the matmul
path, and the K=1 weighted-mean shortcut."""
import numpy as np
import pytest

from slam_toolbox_tpu.core import geometry
from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.kernels import rasterize as rz
from slam_toolbox_tpu.solver.se2_solver import _sqrt_info_3x3


def _numpy_pack(scan):
    """The pre-round-5 numpy scan_pack assembly, verbatim."""
    finite = np.isfinite(scan.ranges)
    delim_idx, anchors, next_delim = rz.find_valid_points_structure(
        scan.local_points
    )
    B = len(scan.ranges)
    pack = np.zeros((B, 8), np.float32)
    pack[:, 0:2] = scan.local_points
    if not finite.all():
        pack[~finite, 0:2] = 0.0
    D = len(delim_idx)
    if D:
        pack[:D, 2:4] = anchors
        pack[:D, 4:6] = pack[delim_idx, 0:2]
    pack[:, 6] = next_delim.astype(np.float32)
    flags = finite.astype(np.int32)
    if D:
        flags[:D] |= 2
    pack[:, 7] = flags.astype(np.float32)
    return pack


def test_native_scan_pack_bit_exact():
    from slam_toolbox_tpu import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    laser = LaserConfig(min_range=0.05, max_range=12.0,
                        range_threshold=10.0,
                        angular_resolution=np.deg2rad(1.0))
    for trial in range(8):
        ranges = rng.uniform(0.2, 11.0, laser.n_beams)
        # sprinkle invalid beams: NaN, inf, and out-of-range
        bad = rng.choice(laser.n_beams, 30, replace=False)
        ranges[bad[:10]] = np.nan
        ranges[bad[10:20]] = np.inf
        ranges[bad[20:]] = 0.0
        scan = LocalizedScan(laser, ranges, np.zeros(3), time=0.0)
        ref = _numpy_pack(scan)
        got = native.scan_pack(scan.local_points, scan.ranges)
        assert got is not None
        np.testing.assert_array_equal(
            np.asarray(got), ref, err_msg=f"trial {trial}"
        )


def test_sqrt_info_matches_lapack():
    rng = np.random.default_rng(3)
    for _ in range(200):
        A = rng.normal(size=(3, 3))
        cov = A @ A.T + 1e-3 * np.eye(3)
        fast = _sqrt_info_3x3(cov)
        info = np.linalg.inv(cov)
        info = 0.5 * (info + info.T)
        ref = np.linalg.cholesky(info).T
        # U^T U must reproduce the information matrix
        np.testing.assert_allclose(fast.T @ fast, ref.T @ ref,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(fast, ref, rtol=1e-6, atol=1e-9)


def test_sqrt_info_degenerate_falls_back():
    # singular covariance must raise like the LAPACK path always did
    cov = np.zeros((3, 3))
    with pytest.raises(np.linalg.LinAlgError):
        _sqrt_info_3x3(cov)


def test_rotate_covariance_scalar_matches_matmul():
    rng = np.random.default_rng(11)
    for _ in range(50):
        A = rng.normal(size=(3, 3))
        cov = A @ A.T
        th = rng.uniform(-np.pi, np.pi)
        fast = geometry.rotate_covariance(cov, th)
        r = geometry.rot3_z(np.asarray([th]))[0]
        ref = r @ cov @ r.T
        np.testing.assert_allclose(fast, ref, rtol=1e-12, atol=1e-14)


def test_weighted_mean_single_is_identity():
    m = np.array([[1.5, -2.0, 2.9]])
    c = np.array([np.eye(3) * 0.1])
    out = geometry.weighted_mean_pose(m, c)
    np.testing.assert_allclose(out[:2], m[0, :2], rtol=0, atol=0)
    assert abs(out[2] - m[0, 2]) < 1e-12
    # multi-entry path unchanged: fuse two identical measurements
    m2 = np.array([[1.0, 2.0, 0.5], [1.0, 2.0, 0.5]])
    c2 = np.array([np.eye(3), np.eye(3)])
    out2 = geometry.weighted_mean_pose(m2, c2)
    np.testing.assert_allclose(out2, [1.0, 2.0, 0.5], atol=1e-12)
