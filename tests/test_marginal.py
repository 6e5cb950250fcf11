"""Marginalization-on-removal (graph/marginal.py).

The reference deletes constraints with the node (Mapper.cpp:2964-3021);
marginalize_on_removal composes them onto the neighbors instead. These
tests check the math (degree-2 composition == the Gauss-Newton Schur
complement of the eliminated variable) and that a solve over the
marginalized graph reproduces the full graph's solution for the
surviving nodes.
"""
import numpy as np
import pytest

from slam_toolbox_tpu.core import geometry
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.graph import marginal
from slam_toolbox_tpu.graph.pose_graph import Edge, PoseGraph
from slam_toolbox_tpu.solver.se2_solver import PoseGraphSolver


class _Laser:
    name = "fake"
    offset_pose = (0.0, 0.0, 0.0)


class _Scan:
    def __init__(self, uid, pose):
        self.unique_id = uid
        self.state_id = uid
        self.laser = _Laser()
        self.corrected_pose = np.asarray(pose, np.float64)
        self.sensor_pose = self.corrected_pose

    def reference_pose(self, use_bc):
        return self.corrected_pose


class _MapperShell:
    def __init__(self, solver):
        self.solver = solver
        self.config = MapperConfig()
        self.stats = None


def _graph_with(poses, edge_pairs, cov_scale=1.0, rng=None):
    """PoseGraph + solver over fake scans; edges carry the TRUE relative
    pose (consistent measurements) with a random SPD covariance."""
    solver = PoseGraphSolver()
    g = PoseGraph.__new__(PoseGraph)
    g.mapper = _MapperShell(solver)
    g.vertices = {}
    g.edges = []
    g.adjacency = {}
    g._version = 0
    g.pose_revision = 0
    g._q_dirty = True
    g._q_xy_stale = "ALL"
    g._q_uid_to_idx = {}
    g._q_tombstones = 0
    scans = [_Scan(i, p) for i, p in enumerate(poses)]
    for s in scans:
        g.vertices.setdefault("fake", {})[s.state_id] = s
        g.adjacency[s.unique_id] = []
        solver.add_node(s.unique_id, s.corrected_pose)
    for a, b in edge_pairs:
        rel = np.asarray(
            geometry.relative_pose(scans[a].corrected_pose,
                                   scans[b].corrected_pose)
        )
        if rng is not None:
            q = rng.normal(0, 0.3, (3, 3))
            cov = cov_scale * (q @ q.T + np.eye(3) * 0.05)
        else:
            cov = np.eye(3) * cov_scale
        e = Edge.__new__(Edge)
        e.source, e.target = scans[a], scans[b]
        e.rel_pose, e.covariance = rel, cov
        e._list_idx = len(g.edges)
        g.edges.append(e)
        g.adjacency[scans[a].unique_id].append(e)
        g.adjacency[scans[b].unique_id].append(e)
        solver.add_constraint(scans[a].unique_id, scans[b].unique_id,
                              rel, cov)
    return g, solver, scans


def _residual_jacobians(xa, xb, rel):
    """GN blocks of the SE(2) relative-pose residual at (xa, xb):
    e = z - rel(xa, xb) with rel = [R(-ha)(tb-ta); hb-ha] and the
    covariance expressed in the SOURCE frame (the Edge/ceres_utils
    convention — no rotation into the measurement frame). Returns
    (A, B) = de/dxa, de/dxb (sign of the rel term)."""
    c, s = np.cos(xa[2]), np.sin(xa[2])
    R_a = np.array([[c, s], [-s, c]])          # world->a rotation
    d = xb[:2] - xa[:2]
    # d(R_a d)/d xa = [-R_a, dR/dth d]; /dxb = [R_a]
    dR = np.array([[-s, c], [-c, -s]])
    A = np.zeros((3, 3))
    A[:2, :2] = -R_a
    A[:2, 2] = dR @ d
    A[2, 2] = -1.0
    B = np.zeros((3, 3))
    B[:2, :2] = R_a
    B[2, 2] = 1.0
    return A, B


def test_degree2_composition_matches_schur():
    """For a degree-2 node, the composed factor's information equals the
    Schur complement of the eliminated variable (consistent edges, first
    order)."""
    rng = np.random.default_rng(0)
    poses = [
        np.array([0.0, 0.0, 0.1]),
        np.array([1.0, 0.3, 0.5]),
        np.array([2.1, 0.9, 0.9]),
    ]
    g, solver, scans = _graph_with(
        poses, [(0, 1), (1, 2)], cov_scale=0.02, rng=rng
    )
    factors = marginal.marginal_factors(g, scans[1])
    assert len(factors) == 1
    sa, sb, rel, cov = factors[0]
    assert (sa.unique_id, sb.unique_id) == (0, 2)
    # measurement = current relative pose (consistent edges)
    np.testing.assert_allclose(
        rel, geometry.relative_pose(poses[0], poses[2]), atol=1e-12
    )
    # Schur complement over [r, a, b] ordering: H = J^T Λ J summed
    H = np.zeros((9, 9))  # blocks: [a(0:3), r(3:6), b(6:9)]
    for e in [g.edges[0], g.edges[1]]:
        ia = {0: 0, 1: 3, 2: 6}[e.source.unique_id]
        ib = {0: 0, 1: 3, 2: 6}[e.target.unique_id]
        A, B = _residual_jacobians(
            e.source.corrected_pose, e.target.corrected_pose, e.rel_pose
        )
        lam = np.linalg.inv(e.covariance)
        for (i, Ji) in ((ia, A), (ib, B)):
            for (j, Jj) in ((ia, A), (ib, B)):
                H[i:i + 3, j:j + 3] += Ji.T @ lam @ Jj
    keep = [0, 1, 2, 6, 7, 8]
    Hrr = H[3:6, 3:6]
    Hkr = H[np.ix_(keep, [3, 4, 5])]
    schur = H[np.ix_(keep, keep)] - Hkr @ np.linalg.inv(Hrr) @ Hkr.T
    # the factor's own GN contribution over (a, b)
    A, B = _residual_jacobians(poses[0], poses[2], rel)
    lam = np.linalg.inv(cov)
    Hf = np.zeros((6, 6))
    J = np.hstack([A, B])
    Hf = J.T @ lam @ J
    np.testing.assert_allclose(Hf, schur, rtol=5e-3, atol=1e-6)


def test_marginalized_solve_matches_full():
    """Perturb a loop graph, solve; marginalizing an interior node must
    reproduce the full solution for the survivors."""
    rng = np.random.default_rng(3)
    n = 8
    true = [np.array([np.cos(t), np.sin(t), t + 0.5])
            for t in np.linspace(0, 2 * np.pi * (n - 1) / n, n)]
    pairs = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1), (2, 6)]

    def solve(remove_uid=None, marginalize=False):
        g, solver, scans = _graph_with(true, pairs, cov_scale=0.01,
                                       rng=np.random.default_rng(3))
        # perturb all but the gauge node
        for s in scans[1:]:
            s.corrected_pose = s.corrected_pose + rng.normal(0, 0.0, 3)
        if remove_uid is not None:
            if marginalize:
                marginal.marginalize_and_remove(g, scans[remove_uid])
            else:
                g.remove_vertex(scans[remove_uid])
        # add a perturbing extra edge so the solve has something to do
        rel = np.asarray(geometry.relative_pose(true[1], true[5]))
        rel = rel + np.array([0.05, -0.04, 0.02])
        solver.add_constraint(1, 5, rel, np.eye(3) * 0.01)
        out = dict(solver.compute())
        return out

    full = solve()
    marg = solve(remove_uid=4, marginalize=True)
    dele = solve(remove_uid=4, marginalize=False)
    err_m, err_d = [], []
    for uid in marg:
        if uid == 4 or uid not in full:
            continue
        err_m.append(np.linalg.norm(marg[uid][:2] - full[uid][:2]))
        err_d.append(np.linalg.norm(dele[uid][:2] - full[uid][:2]))
    err_m, err_d = max(err_m), max(err_d)
    # marginalized keeps the removed node's information: closer to the
    # full solution than deletion, and close in absolute terms
    assert err_m <= err_d + 1e-12, (err_m, err_d)
    assert err_m < 0.02, err_m


def test_duplicate_pair_skipped():
    """A marginal factor whose endpoints are already directly linked is
    dropped, not double-added."""
    poses = [np.zeros(3), np.array([1.0, 0, 0]), np.array([2.0, 0, 0])]
    g, solver, scans = _graph_with(poses, [(0, 1), (1, 2), (0, 2)])
    n_edges0 = len(g.edges)
    marginal.marginalize_and_remove(g, scans[1])
    # node 1's two edges removed; the (0,2) factor is skipped because a
    # direct (0,2) edge exists
    assert len(g.edges) == n_edges0 - 2
    assert solver.n_edges == 1
