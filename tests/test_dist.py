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
