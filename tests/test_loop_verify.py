"""Fused loop verification (kernels/loop_verify.py) vs the staged path."""
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.kernels import loop_verify as lv
from slam_toolbox_tpu.kernels.match import Matcher


def _matcher(search, res, rth):
    return Matcher(
        search_size=search, resolution=res, smear_deviation=0.03,
        range_threshold=rth,
        coarse_angle_offset=np.deg2rad(10),
        coarse_angle_resolution=np.deg2rad(2),
        fine_angle_offset=np.deg2rad(0.2),
        dist_var_penalty=0.09, ang_var_penalty=0.1218,
        min_dist_penalty=0.5, min_ang_penalty=0.9,
    )


def test_fused_matches_staged_cpu():
    laser = LaserConfig(
        min_range=0.05, max_range=10.0, range_threshold=8.0,
        angular_resolution=np.deg2rad(2.0),
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.0, 0.0), seed=3)
    wp = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
        (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0), (-6.0, -3.5),
    ])
    pairs = sim.simulate(wp, step=0.5)
    scans = []
    for scan, _true in pairs:
        scan.state_id = len(scans)
        scan.unique_id = len(scans)
        scans.append(scan)

    seq = _matcher(0.3, 0.02, laser.range_threshold)
    loop = _matcher(2.0, 0.05, laser.range_threshold)
    query = scans[-1]
    chain = scans[2:12]

    # staged: coarse -> gates -> fine at the coarse pose
    coarse = loop.match_scans_batch(
        query, [chain], penalize=False, refine=False
    )[0]
    cfg = SimpleNamespace(
        loop_match_minimum_response_coarse=0.2,
        loop_match_maximum_variance_coarse=5.0,
    )
    gate_staged = (
        coarse.response > cfg.loop_match_minimum_response_coarse
        and coarse.covariance[0, 0] < cfg.loop_match_maximum_variance_coarse
        and coarse.covariance[1, 1] < cfg.loop_match_maximum_variance_coarse
    )
    tmp = LocalizedScan(query.laser, query.ranges, query.odom_pose,
                        query.time)
    tmp.set_corrected_pose(query.corrected_pose)
    tmp.set_sensor_pose(coarse.sensor_pose)
    fine = seq.match_scan(tmp, chain, penalize=False)

    # fused single program (CPU: parity=False path)
    rows = np.asarray(jnp.stack(lv.dispatch_loop_verify(
        loop, seq, query, [chain], cfg
    )), np.float64)
    got_c = Matcher.results_from_packed(rows[0, :13])[0]
    got_f = Matcher.results_from_packed(rows[0, 13:26])[0]
    gate_fused = rows[0, 26] > 0.5

    assert bool(gate_fused) == bool(gate_staged)
    np.testing.assert_allclose(got_c.response, coarse.response, atol=1e-6)
    np.testing.assert_allclose(
        got_c.sensor_pose, coarse.sensor_pose, atol=1e-5
    )
    np.testing.assert_allclose(
        got_c.covariance, coarse.covariance, rtol=1e-4, atol=1e-6
    )
    assert gate_staged  # this scenario must exercise the fine stage
    np.testing.assert_allclose(got_f.response, fine.response, atol=1e-6)
    np.testing.assert_allclose(
        got_f.sensor_pose, fine.sensor_pose, atol=1e-5
    )


def test_pooled_gather_matches_upload_path():
    """dispatch_loop_verify with a PackPool (device slot gathers) must
    produce the same rows as the per-scan upload path."""
    from slam_toolbox_tpu.mapper.streaming import PackPool, scan_pack

    laser = LaserConfig(
        min_range=0.05, max_range=10.0, range_threshold=8.0,
        angular_resolution=np.deg2rad(2.0),
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.0, 0.0), seed=5)
    wp = np.array([(-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5)])
    pairs = sim.simulate(wp, step=0.5)
    scans = []
    for scan, _true in pairs:
        scan.state_id = len(scans)
        scan.unique_id = len(scans)
        scans.append(scan)

    seq = _matcher(0.3, 0.02, laser.range_threshold)
    loop = _matcher(2.0, 0.05, laser.range_threshold)
    query = scans[-1]
    chains = [scans[0:6], scans[6:12]]
    cfg = SimpleNamespace(
        loop_match_minimum_response_coarse=0.2,
        loop_match_maximum_variance_coarse=5.0,
    )

    ref = np.asarray(lv.dispatch_loop_verify(
        loop, seq, query, chains, cfg
    ), np.float64)

    pool = PackPool(laser.n_beams, cap=16)  # force a growth step
    batch = np.stack([scan_pack(s) for s in scans[:12]])
    pool.append_batch(jnp.asarray(batch), scans[:12])
    assert all(s._pool_slot is not None for s in scans[:12])
    got = np.asarray(lv.dispatch_loop_verify(
        loop, seq, query, chains, cfg, pool=pool
    ), np.float64)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_chain_match_fused_matches_staged():
    """dispatch_chain_matches (pool-gather scan over pairs) vs the
    per-chain match_scans_batch path."""
    from slam_toolbox_tpu.mapper.streaming import PackPool, scan_pack

    laser = LaserConfig(
        min_range=0.05, max_range=10.0, range_threshold=8.0,
        angular_resolution=np.deg2rad(2.0),
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.0, 0.0), seed=9)
    wp = np.array([(-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5),
                   (5.5, 3.5), (1.0, 3.5)])
    pairs_data = sim.simulate(wp, step=0.5)
    scans = []
    for scan, _true in pairs_data:
        scan.state_id = len(scans)
        scan.unique_id = len(scans)
        scans.append(scan)

    seq = _matcher(0.3, 0.02, laser.range_threshold)
    pool = PackPool(laser.n_beams, cap=64)
    batch = np.stack([scan_pack(s) for s in scans])
    pool.append_batch(jnp.asarray(batch), scans)

    pairs = [
        (scans[-1], scans[0:6]),
        (scans[-2], scans[3:9]),
        (scans[-1], scans[6:12]),
    ]
    rows = lv.dispatch_chain_matches(seq, pairs, pool)
    got = np.asarray(jnp.concatenate(rows, axis=0), np.float64)
    fused = Matcher.results_from_packed(got)

    for (q, chain), res in zip(pairs, fused):
        ref = seq.match_scans_batch(q, [chain], penalize=False,
                                    refine=True)[0]
        # the fused path rasters from f32 device world points (the
        # staged path rounds f64 host points): a handful of boundary
        # cells flip, moving the response by ~1e-3 and the tie-averaged
        # pose by a fraction of a cell
        np.testing.assert_allclose(res.response, ref.response, atol=2e-3)
        np.testing.assert_allclose(
            res.sensor_pose, ref.sensor_pose, atol=2.5e-2
        )
        # the chain raster computes world points in f32 on device (the
        # staged path rounds f64 host points): boundary-cell flips move
        # single responses in/out of the `>= best - 0.1` covariance set,
        # shifting the surface's second moments — diagonals at the 1e-2
        # level, the near-zero off-diagonals by small absolute amounts
        np.testing.assert_allclose(
            np.diag(res.covariance), np.diag(ref.covariance),
            rtol=2e-2, atol=1e-6,
        )
        off = ~np.eye(3, dtype=bool)
        np.testing.assert_allclose(
            res.covariance[off], ref.covariance[off], atol=5e-3
        )
