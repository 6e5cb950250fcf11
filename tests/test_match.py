"""Golden-value tests of the correlative matcher against NumPy oracles, plus
behavioral recovery tests on synthetic scans."""
import numpy as np
import jax.numpy as jnp
import pytest

from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.kernels import rasterize as rz
from slam_toolbox_tpu.kernels.match import (
    Matcher, _match_pass, build_index_tables,
)

import oracle


SMALL_LASER = LaserConfig(
    min_range=0.1, max_range=8.0, range_threshold=5.0,
    min_angle=-np.pi, max_angle=np.pi,
    angular_resolution=2 * np.pi / 180,  # 91 beams
)


def square_room_ranges(laser, pose, half=4.0):
    """Distances from a pose inside a 2*half square room to its walls."""
    angles = laser.beam_angles + pose[2]
    c, s = np.cos(angles), np.sin(angles)
    with np.errstate(divide="ignore", invalid="ignore"):
        ts = np.stack([
            (half - pose[0]) / c, (-half - pose[0]) / c,
            (half - pose[1]) / s, (-half - pose[1]) / s,
        ])
    ts = np.where(ts > 0, ts, np.inf)
    r = ts.min(axis=0)
    r[~np.isfinite(r)] = np.nan
    r[r > laser.max_range] = np.nan
    return r


def make_scan(pose, laser=SMALL_LASER, noise=0.0, seed=0):
    r = square_room_ranges(laser, pose)
    if noise:
        r = r + np.random.default_rng(seed).normal(0, noise, len(r))
    return LocalizedScan(laser, r, pose)


def small_matcher(**kw):
    args = dict(
        search_size=0.3, resolution=0.02, smear_deviation=0.03,
        range_threshold=5.0,
        coarse_angle_offset=np.deg2rad(10), coarse_angle_resolution=np.deg2rad(2),
        fine_angle_offset=np.deg2rad(0.2),
        dist_var_penalty=0.09, ang_var_penalty=0.1218,
        min_dist_penalty=0.5, min_ang_penalty=0.9,
    )
    args.update(kw)
    return Matcher(**args)


def test_rasterize_matches_oracle():
    rng = np.random.default_rng(7)
    G, hk = 64, 3
    scale = 1.0 / 0.05
    sigma_cells = 0.03 / 0.05
    off = np.array([-1.0, -1.2])
    pts = rng.uniform(-1.0, 1.5, size=(200, 2))
    valid = rng.random(200) > 0.2
    grid = rz.rasterize_smear(
        jnp.asarray(pts, jnp.float32), jnp.asarray(valid),
        jnp.asarray(off, jnp.float32), jnp.float32(scale),
        jnp.float32(sigma_cells), G, hk,
    )
    mine = np.asarray(
        rz.round_half_away(np.asarray(grid) * 100.0), np.int32
    )
    ref = oracle.rasterize_smear_oracle(
        pts, valid, off, scale, sigma_cells, G, hk
    )
    # allow off-by-one from float .5 boundary ties
    diff = np.abs(mine - ref)
    assert (diff > 1).sum() == 0, f"max diff {diff.max()}"
    assert mine.max() == 100


def test_find_valid_points_matches_direct_simulation():
    """Cross-check the cached-structure FindValidPoints against a literal
    re-simulation of the reference loop (Mapper.cpp:1113-1164)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 2, size=(150, 2))
    pts[40:43] = np.nan
    vp = np.array([0.3, -0.2])

    struct = rz.find_valid_points_structure(pts)
    mask = rz.find_valid_mask(pts, struct, vp)

    # literal reference loop
    valid = np.zeros(len(pts), bool)
    trailing = 0
    first = None
    for i, p in enumerate(pts):
        if first is None and np.isfinite(p).all():
            first = p.copy()
        if first is None:
            continue
        delta = first - p
        if delta @ delta > 0.01:
            a = vp[1] - first[1]
            b = first[0] - vp[0]
            c = first[1] * vp[0] - first[0] * vp[1]
            ss = p[0] * a + p[1] * b + c
            first = p.copy()
            if ss < 0:
                trailing = i
            else:
                valid[trailing:i] = True
                trailing = i
    valid &= np.isfinite(pts).all(axis=1)
    np.testing.assert_array_equal(mask, valid)


def test_match_pass_response_matches_oracle():
    m = small_matcher()
    pose = np.array([0.4, -0.3, 0.3])
    # small range noise breaks exact cell-boundary ties that would otherwise
    # make f32 (kernel) vs f64 (oracle) rounding disagree
    base = make_scan(pose, noise=0.004, seed=11)
    query = make_scan(
        pose + np.array([0.05, -0.04, 0.03]), noise=0.004, seed=12
    )
    center = query.sensor_pose
    grid_flat, off = m.build_grid([base], center)
    grid2d = np.asarray(grid_flat)[:-1].reshape(m.G, m.G).astype(np.int32)

    x_off = np.array([-0.08, -0.04, 0.0, 0.04, 0.08])
    angles = center[2] + np.deg2rad([-4.0, 0.0, 4.0])
    local_pts = query.local_points.astype(np.float32)
    finite = np.isfinite(query.ranges)

    ref_resp = oracle.correlate_oracle(
        grid2d, off, m.scale, center, x_off, x_off, angles,
        local_pts, finite, True, *[float(p) for p in m.penalty_params],
    )
    ref_best, ref_mean = oracle.best_and_tie_average(
        ref_resp, center, x_off, x_off, angles
    )

    d, cand_x, cand_y = build_index_tables(
        angles, local_pts, center, off, m.scale, x_off, x_off
    )
    best, mean, cov = _match_pass(
        grid_flat, jnp.int32(m.G), jnp.asarray(off, jnp.float32),
        jnp.float32(m.scale), jnp.asarray(center, jnp.float32),
        jnp.asarray(x_off, jnp.float32), jnp.asarray(x_off, jnp.float32),
        jnp.asarray(angles, jnp.float32), jnp.asarray(d),
        jnp.asarray(cand_x), jnp.asarray(cand_y),
        jnp.asarray(finite), jnp.float32(0.04),
        jnp.float32(np.deg2rad(4.0)), jnp.bool_(True),
        *m.penalty_params, fine=False,
    )
    assert abs(float(best) - ref_best) < 2e-5
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-4)
    assert np.asarray(cov)[0, 0] > 0


def test_match_recovers_offset():
    """Perturb the odometry prior; the matcher should recover the true pose."""
    m = small_matcher()
    true_pose = np.array([0.5, -0.2, 0.2])
    base = make_scan(np.array([0.45, -0.15, 0.15]))
    query = make_scan(true_pose)
    # corrupt the prior by a few cm / degrees
    query.set_corrected_pose(true_pose + np.array([0.06, -0.05, np.deg2rad(3)]))
    res = m.match_scan(query, [base])
    # the test laser is sparse (2 deg): adjacent wall samples sit several
    # cells apart, so mean response ~0.4 is expected; recovery is the point
    assert res.response > 0.35
    err = res.sensor_pose - true_pose
    assert abs(err[0]) < 0.025
    assert abs(err[1]) < 0.025
    assert abs(np.arctan2(np.sin(err[2]), np.cos(err[2]))) < np.deg2rad(1.1)
    # covariance should be small and positive definite-ish
    assert 0 < res.covariance[0, 0] < 0.1
    assert 0 < res.covariance[2, 2] < 0.1


def test_match_zero_grid_gives_max_variance():
    m = small_matcher()
    query = make_scan(np.array([0.0, 0.0, 0.0]))
    res = m.match_scan(query, [], refine=False)
    assert res.response == 0.0
    assert res.covariance[0, 0] == pytest.approx(500.0)
