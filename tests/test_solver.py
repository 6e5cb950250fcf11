"""Solver convergence tests on canonical pose graphs, validated against a
scipy nonlinear least-squares reference."""
import numpy as np
import pytest

from slam_toolbox_tpu.solver import PoseGraphSolver


def _wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def build_loop_graph(n=20, radius=5.0, drift=0.02, seed=0):
    """A noisy circular trajectory with odometry edges and one loop closure."""
    rng = np.random.default_rng(seed)
    gt = []
    for i in range(n):
        th = 2 * np.pi * i / n
        gt.append(
            np.array([radius * np.cos(th), radius * np.sin(th),
                      _wrap(th + np.pi / 2)])
        )
    gt = np.stack(gt)
    # odometry-integrated initial guess with drift
    init = [gt[0].copy()]
    edges = []
    cov = np.diag([1e-4, 1e-4, 1e-5])
    for i in range(1, n):
        rel = relative(gt[i - 1], gt[i])
        noisy = rel + rng.normal(0, drift, 3) * np.array([1, 1, 0.5])
        edges.append((i - 1, i, noisy, cov))
        init.append(compose(init[-1], noisy))
    # loop closure from last to first: exact measurement
    edges.append((n - 1, 0, relative(gt[n - 1], gt[0]), cov))
    return gt, np.stack(init), edges


def relative(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, _wrap(b[2] - a[2])])


def compose(a, d):
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array(
        [a[0] + c * d[0] - s * d[1], a[1] + s * d[0] + c * d[1],
         _wrap(a[2] + d[2])]
    )


def scipy_reference(init, edges, n):
    from scipy.optimize import least_squares

    sqrt_infos = {
        k: np.linalg.cholesky(np.linalg.inv(cov)).T
        for k, (_, _, _, cov) in enumerate(edges)
    }

    def resid(x):
        poses = np.concatenate([init[0], x]).reshape(n, 3)
        out = []
        for k, (i, j, rel, cov) in enumerate(edges):
            a, b = poses[i], poses[j]
            c, s = np.cos(a[2]), np.sin(a[2])
            dx, dy = b[0] - a[0], b[1] - a[1]
            r = np.array(
                [c * dx + s * dy - rel[0], -s * dx + c * dy - rel[1],
                 _wrap(b[2] - a[2] - rel[2])]
            )
            out.append(sqrt_infos[k] @ r)
        return np.concatenate(out)

    res = least_squares(resid, init[1:].reshape(-1), method="lm", xtol=1e-12)
    return np.concatenate([init[0], res.x]).reshape(n, 3)


def run_solver(init, edges):
    s = PoseGraphSolver()
    for i, p in enumerate(init):
        s.add_node(i, p)
    for (i, j, rel, cov) in edges:
        s.add_constraint(i, j, rel, cov)
    corr = dict(s.compute())
    return np.stack([corr[i] for i in range(len(init))]), s


def test_loop_graph_converges_to_scipy():
    gt, init, edges = build_loop_graph(n=20)
    ours, _ = run_solver(init, edges)
    ref = scipy_reference(init, edges, len(init))
    # both should agree on the optimum to a few mm / mrad
    np.testing.assert_allclose(ours[:, :2], ref[:, :2], atol=5e-3)
    dh = _wrap(ours[:, 2] - ref[:, 2])
    np.testing.assert_allclose(dh, 0, atol=5e-3)


def test_solver_reduces_chi2_and_fixes_gauge():
    gt, init, edges = build_loop_graph(n=30, drift=0.05, seed=3)
    ours, s = run_solver(init, edges)
    # gauge: first node unchanged
    np.testing.assert_allclose(ours[0], init[0], atol=1e-6)
    # loop closure should pull the end of the trajectory back: the final
    # node must be far closer to ground truth than the odometry guess
    err_init = np.linalg.norm(init[-1][:2] - gt[-1][:2])
    err_ours = np.linalg.norm(ours[-1][:2] - gt[-1][:2])
    assert err_ours < 0.5 * err_init


def test_incremental_add_remove():
    s = PoseGraphSolver()
    cov = np.eye(3) * 1e-3
    s.add_node(0, [0, 0, 0])
    s.add_node(1, [1, 0, 0])
    s.add_node(2, [2, 0, 0])
    s.add_constraint(0, 1, [1, 0, 0], cov)
    s.add_constraint(1, 2, [1.2, 0, 0], cov)
    s.compute()
    assert s.n_nodes == 3 and s.n_edges == 2
    # remove middle node like the localization buffer eviction
    s.remove_constraint(0, 1)
    s.remove_constraint(1, 2)
    s.remove_node(1)
    assert s.n_nodes == 2 and s.n_edges == 0
    s.add_constraint(0, 2, [2.2, 0, 0], cov)
    corr = dict(s.compute())
    assert 1 not in corr
    np.testing.assert_allclose(corr[2][0], 2.2, atol=1e-2)


def test_empty_graph_noop():
    s = PoseGraphSolver()
    assert s.compute() == []


# -- host sparse-Cholesky path (n > DENSE_MAX_NODES) -------------------------


def test_host_sparse_matches_device_path():
    """The host sparse LM must land on the same optimum as the device
    (dense-Cholesky) LM for a graph both can solve."""
    from slam_toolbox_tpu.solver import se2_solver

    from slam_toolbox_tpu.core.params import SolverConfig

    gt, init, edges = build_loop_graph(n=60, drift=0.04, seed=7)
    # force the on-device LM (host_sparse_min_nodes past the graph size)
    s = PoseGraphSolver(SolverConfig(host_sparse_min_nodes=10**9))
    for i, p in enumerate(init):
        s.add_node(i, p)
    for (i, j, rel, cov) in edges:
        s.add_constraint(i, j, rel, cov)
    corr = dict(s.compute())
    dev = np.stack([corr[i] for i in range(len(init))])
    assert "host_sparse_ms" not in s.last_stats

    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    rel = np.stack([e[2] for e in edges])
    sqrt_info = np.stack(
        [np.linalg.cholesky(np.linalg.inv(e[3])).T for e in edges]
    )
    free = np.ones(len(init))
    free[0] = 0.0
    res = se2_solver.host_sparse_lm(
        init.copy(), src, dst, rel, sqrt_info, free,
        se2_solver.PoseGraphSolver().config,
    )
    if res is None:
        pytest.skip("native lib unavailable")
    host, _, _ = res
    np.testing.assert_allclose(host[:, :2], dev[:, :2], atol=5e-3)
    np.testing.assert_allclose(_wrap(host[:, 2] - dev[:, 2]), 0, atol=5e-3)


def test_large_graph_takes_host_sparse_path():
    """A graph past DENSE_MAX_NODES solves through the native sparse
    Cholesky and converges (noise-free measurements -> exact recovery)."""
    from slam_toolbox_tpu.native import get_lib
    from slam_toolbox_tpu.solver import se2_solver

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    n = se2_solver.DENSE_MAX_NODES + 256
    rng = np.random.default_rng(11)
    th = 2 * np.pi * np.arange(n) / n
    gt = np.stack(
        [40.0 * np.cos(th), 40.0 * np.sin(th), _wrap(th + np.pi / 2)], -1
    )
    drift = np.cumsum(
        rng.normal(scale=[0.03, 0.03, 0.005], size=(n, 3)), axis=0
    )
    drift -= drift[0]
    s = PoseGraphSolver()
    cov = np.diag([1e-2, 1e-2, 3e-3])
    for i in range(n):
        s.add_node(i, gt[i] + drift[i])
    for i in range(n - 1):
        s.add_constraint(i, i + 1, relative(gt[i], gt[i + 1]), cov)
    for i in range(0, n, 41):  # loop closures across the circle
        j = (i + n // 2) % n
        a, b = min(i, j), max(i, j)
        if b - a > 2:
            s.add_constraint(a, b, relative(gt[a], gt[b]), cov)
    s.add_constraint(n - 1, 0, relative(gt[n - 1], gt[0]), cov)
    corr = dict(s.compute())
    assert "host_sparse_ms" in s.last_stats
    out = np.stack([corr[i] for i in range(n)])
    ate = np.sqrt(np.mean(np.sum((out[:, :2] - gt[:, :2]) ** 2, axis=1)))
    assert ate < 1e-3
