"""Distributed solver tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from slam_toolbox_tpu.dist import distributed_lm_solve
from test_solver import build_loop_graph, run_solver


def _pack(init, edges, n_dev):
    n = len(init)
    n_pad = 1
    while n_pad < n:
        n_pad <<= 1
    e = len(edges)
    e_pad = ((e + n_dev - 1) // n_dev) * n_dev
    poses = np.zeros((n_pad, 3), np.float32)
    poses[:n] = init
    src = np.full(e_pad, n_pad - 1, np.int32)
    dst = np.full(e_pad, n_pad - 1, np.int32)
    rel = np.zeros((e_pad, 3), np.float32)
    si = np.zeros((e_pad, 3, 3), np.float32)
    em = np.zeros(e_pad, bool)
    for k, (i, j, rp, cov) in enumerate(edges):
        src[k], dst[k] = i, j
        rel[k] = rp
        si[k] = np.linalg.cholesky(np.linalg.inv(cov)).T
        em[k] = True
    free = np.ones(n_pad, np.float32)
    free[n:] = 0
    free[0] = 0  # gauge
    return poses, src, dst, rel, si, em, free, n


def test_distributed_solve_matches_single_device():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("graph",))

    gt, init, edges = build_loop_graph(n=24, drift=0.03, seed=7)
    poses, src, dst, rel, si, em, free, n = _pack(init, edges, 8)

    out, chi2 = distributed_lm_solve(
        mesh, poses, src, dst, rel, si, em, free
    )
    single, _ = run_solver(init, edges)

    np.testing.assert_allclose(out[:n, :2], single[:, :2], atol=1e-2)
    dh = np.arctan2(
        np.sin(out[:n, 2] - single[:, 2]), np.cos(out[:n, 2] - single[:, 2])
    )
    np.testing.assert_allclose(dh, 0, atol=1e-2)


def test_large_graph_uses_distributed_path():
    """PoseGraphSolver auto-routes big graphs to the sharded solve."""
    import jax
    from slam_toolbox_tpu.solver import PoseGraphSolver

    from slam_toolbox_tpu.core.params import SolverConfig

    assert jax.device_count() >= 8
    # chain graphs need O(n) CG iterations — keep n small on the CPU test
    # backend and lower the routing threshold to exercise the dist path
    n = 300
    s = PoseGraphSolver(SolverConfig(dist_edge_threshold=256))
    cov = np.diag([1e-4, 1e-4, 1e-5])
    rng = np.random.default_rng(0)
    pose = np.zeros(3)
    s.add_node(0, pose)
    for i in range(1, n):
        step = np.array([0.5, 0.0, 2 * np.pi / n])
        noisy = step + rng.normal(0, 0.01, 3)
        c, sn = np.cos(pose[2]), np.sin(pose[2])
        pose = np.array([
            pose[0] + c * noisy[0] - sn * noisy[1],
            pose[1] + sn * noisy[0] + c * noisy[1],
            pose[2] + noisy[2],
        ])
        s.add_node(i, pose)
        s.add_constraint(i - 1, i, step, cov)
    s.add_constraint(n - 1, 0, np.array([0.5, 0.0, 2 * np.pi / n]), cov)
    corr = dict(s.compute())
    assert len(corr) == n
    # the loop must close: last node near the first
    d = np.hypot(*(corr[n - 1][:2] - corr[0][:2]))
    assert d < 1.5, f"loop not closed, gap {d}"


def test_distributed_solve_improves_chi2():
    devices = jax.devices()
    mesh = Mesh(np.array(devices[:4]), ("graph",))
    gt, init, edges = build_loop_graph(n=16, drift=0.05, seed=9)
    poses, src, dst, rel, si, em, free, n = _pack(init, edges, 4)
    out, chi2 = distributed_lm_solve(
        mesh, poses, src, dst, rel, si, em, free
    )
    assert np.isfinite(chi2)
    # end node pulled toward ground truth by the loop closure
    err_init = np.linalg.norm(init[-1][:2] - gt[-1][:2])
    err_out = np.linalg.norm(out[n - 1][:2] - gt[-1][:2])
    assert err_out < err_init


def _out_and_back_graph():
    """Out-and-back corridor whose early stretch is a valid loop-candidate
    chain for the final scan (same construction as test_events)."""
    from slam_toolbox_tpu.core.params import MapperConfig
    from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
    from slam_toolbox_tpu.mapper.mapper import Mapper

    laser = LaserConfig(beam_count=181, min_angle=-np.pi / 2,
                        max_angle=np.pi / 2, min_range=0.05,
                        max_range=12.0, range_threshold=10.0, is_360=False)
    cfg = MapperConfig(loop_match_minimum_chain_size=4,
                       minimum_travel_distance=0.0,
                       minimum_time_interval=0.0)
    m = Mapper(cfg)
    m.initialize(laser.range_threshold)
    rng = np.random.default_rng(3)
    cov = np.eye(3) * 1e-3
    xs = list(np.arange(0, 7.0, 0.35)) + list(np.arange(7.0, -0.01, -0.35))
    sm = m.sensor_manager
    scans, prev = [], None
    for i, x in enumerate(xs):
        ranges = 4.0 + 0.5 * np.sin(
            np.linspace(0, 3, laser.n_beams)
        ) + rng.normal(0, 0.01, laser.n_beams)
        s = LocalizedScan(laser, ranges, [x, 0.0, 0.0], time=i)
        sm.add_scan(s)
        m.graph.add_vertex(s)
        if prev is not None:
            m.graph.link_scans(prev, s, s.sensor_pose, cov)
        prev = s
        scans.append(s)
    return m, laser, scans


def test_sharded_chain_match_equals_per_chain_path():
    from slam_toolbox_tpu.dist.match_dist import match_chains_sharded

    m, laser, scans = _out_and_back_graph()
    query = scans[-1]
    chains, _ = m.graph._sweep_chains(query, laser.name, 0)
    assert chains
    # give the sharded path a multi-chain batch even if the sweep found 1
    if len(chains) == 1:
        chains = chains + [chains[0][:len(chains[0]) // 2 + 4]]
    ref = m.loop_matcher.match_scans_batch(
        query, chains, penalize=False, refine=False
    )
    got = match_chains_sharded(m.loop_matcher, query, chains)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a.response, b.response, atol=1e-5)
        np.testing.assert_allclose(
            a.sensor_pose, b.sensor_pose, atol=1e-5
        )
        np.testing.assert_allclose(
            a.covariance, b.covariance, atol=1e-4
        )


def test_try_close_loop_uses_sharded_path_on_multi_device(monkeypatch):
    import slam_toolbox_tpu.dist.match_dist as md

    m, laser, scans = _out_and_back_graph()
    calls = []
    orig = md.match_chains_sharded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(md, "match_chains_sharded", spy)
    m.graph.try_close_loop(scans[-1], laser.name)
    # conftest provides 8 CPU devices, so multi-chain sweeps must route
    # through the sharded matcher (single-chain sweeps may fall through)
    chains, _ = m.graph._sweep_chains(scans[-1], laser.name, 0)
    if len(chains) > 1:
        assert calls
