import numpy as np
import pytest

from slam_toolbox_tpu.core import geometry as g


def rand_poses(n, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-5, 5, size=(n, 3))
    p[:, 2] = rng.uniform(-np.pi, np.pi, size=n)
    return p


def test_compose_inverse_roundtrip():
    a = rand_poses(64, 1)
    out = np.asarray(g.compose(g.inverse(a), a))
    np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-5)


def test_relative_pose_consistency():
    a, b = rand_poses(32, 2), rand_poses(32, 3)
    rel = np.asarray(g.relative_pose(a, b))
    recon = np.asarray(g.compose(a, rel))
    np.testing.assert_allclose(recon[:, :2], b[:, :2], atol=1e-5)
    dh = np.arctan2(
        np.sin(recon[:, 2] - b[:, 2]), np.cos(recon[:, 2] - b[:, 2])
    )
    np.testing.assert_allclose(dh, np.zeros_like(dh), atol=1e-5)


def test_transform_pose_between_maps_p1_to_p2():
    p1, p2 = rand_poses(16, 4), rand_poses(16, 5)
    out = np.asarray(g.transform_pose_between(p1, p2, p1))
    np.testing.assert_allclose(out[:, :2], p2[:, :2], atol=1e-5)


def test_corrected_at_inverts_sensor_at():
    robot = rand_poses(16, 6)
    offset = np.array([0.3, -0.1, 0.7])
    sensor = np.asarray(g.sensor_at(robot, offset))
    back = np.asarray(g.corrected_at(sensor, offset))
    np.testing.assert_allclose(back[:, :2], robot[:, :2], atol=1e-5)
    dh = np.arctan2(
        np.sin(back[:, 2] - robot[:, 2]), np.cos(back[:, 2] - robot[:, 2])
    )
    np.testing.assert_allclose(dh, np.zeros_like(dh), atol=1e-5)


def test_rotate_covariance():
    cov = np.diag([2.0, 1.0, 0.5])
    out = np.asarray(g.rotate_covariance(cov, np.pi / 2))
    np.testing.assert_allclose(
        np.diag(out), [1.0, 2.0, 0.5], atol=1e-5
    )


def test_weighted_mean_identical_covs():
    means = np.array([[1.0, 0.0, 0.1], [3.0, 2.0, 0.3]])
    covs = np.stack([np.eye(3)] * 2)
    out = np.asarray(g.weighted_mean_pose(means, covs))
    np.testing.assert_allclose(out[:2], [2.0, 1.0], atol=1e-5)
    assert abs(out[2] - 0.2) < 1e-5
