"""O(1) removal paths: solver swap-with-last, graph edge-list
swap-with-last, PackPool release/compaction — the localization buffer
evicts one node per scan (Mapper.cpp:2911-2962), so these must not be
linear in graph size (reference intent: Ceres enable_fast_removal,
ceres_solver.cpp:183-186)."""
import numpy as np

from slam_toolbox_tpu.solver.se2_solver import PoseGraphSolver

COV = np.eye(3) * 1e-3


def _chain_solver(n):
    s = PoseGraphSolver()
    for i in range(n):
        s.add_node(i, [float(i), 0.0, 0.0])
    for i in range(n - 1):
        s.add_constraint(i, i + 1, [1.0, 0.0, 0.0], COV)
    return s


def test_remove_node_swap_with_last_keeps_index_consistent():
    s = _chain_solver(10)
    for nid in (3, 7, 0, 9):
        for k in list(s._edges):
            if nid in k:
                s.remove_constraint(*k)
        s.remove_node(nid)
        # invariant: _id_to_idx is the exact inverse of _ids
        assert len(s._ids) == len(s._id_to_idx)
        for idx, i in enumerate(s._ids):
            assert s._id_to_idx[i] == idx
    assert s.n_nodes == 6
    # gauge moved off the removed first node
    assert s._first_id in s._id_to_idx
    corr = dict(s.compute())
    assert set(corr) == set(s._ids)


def test_remove_then_solve_matches_fresh_solver():
    rng = np.random.default_rng(0)
    s = _chain_solver(30)
    s.add_constraint(0, 29, [29.0, 0.0, 0.0], COV)  # loop edge
    # perturb poses so the solve does real work
    for i in range(1, 30):
        s.set_node_pose(i, s.get_node_pose(i) + rng.normal(0, 0.05, 3))
    # evict a middle run like the localization buffer would
    for nid in (10, 11, 12):
        for k in list(s._edges):
            if nid in k:
                s.remove_constraint(*k)
        s.remove_node(nid)
    s.add_constraint(9, 13, [4.0, 0.0, 0.0], COV)  # re-link across the gap
    got = dict(s.compute())

    fresh = PoseGraphSolver()
    # rebuild an identical problem from scratch (insertion order differs)
    for nid in sorted(s._ids):
        fresh.add_node(nid, dict(zip(s._ids, s._poses))[nid])
    # force the same gauge node
    fresh._first_id = s._first_id
    for (i1, i2), (rel, _si) in s._edges.items():
        fresh._edges[(i1, i2)] = s._edges[(i1, i2)]
    want = dict(fresh.compute())
    for nid in got:
        np.testing.assert_allclose(got[nid], want[nid], atol=1e-8)


def test_add_constraint_rejects_reversed_duplicate():
    s = _chain_solver(3)
    assert not s.add_constraint(1, 0, [-1.0, 0.0, 0.0], COV)
    assert s.n_edges == 2
    # same-direction re-add is an idempotent re-link (overwrite)
    assert s.add_constraint(0, 1, [1.1, 0.0, 0.0], COV)
    assert s.n_edges == 2


def test_graph_edge_swap_removal():
    from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
    from slam_toolbox_tpu.mapper.mapper import Mapper
    from slam_toolbox_tpu.core.params import MapperConfig

    laser = LaserConfig(name="t", beam_count=16, min_angle=-1.0,
                        max_angle=1.0, min_range=0.1, max_range=10.0,
                        is_360=False)
    m = Mapper(MapperConfig(use_scan_matching=False))
    m.initialize(laser.range_threshold)
    scans = []
    for i in range(6):
        s = LocalizedScan(laser, np.full(16, 2.0), [i * 0.3, 0.0, 0.0])
        s.unique_id = i
        s.state_id = i
        m.graph.add_vertex(s)
        scans.append(s)
    for i in range(5):
        m.graph.link_scans(scans[i], scans[i + 1],
                           scans[i + 1].sensor_pose, COV)
    m.graph.link_scans(scans[0], scans[5], scans[5].sensor_pose, COV)
    assert len(m.graph.edges) == 6
    m.graph.remove_vertex(scans[2])
    assert len(m.graph.edges) == 4
    # _list_idx invariant: every edge knows its position
    for idx, e in enumerate(m.graph.edges):
        assert e._list_idx == idx
    assert all(scans[2] not in (e.source, e.target) for e in m.graph.edges)
    m.graph.remove_vertex(scans[5])
    assert len(m.graph.edges) == 2
    for idx, e in enumerate(m.graph.edges):
        assert e._list_idx == idx


def test_pack_pool_release_and_compaction():
    from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
    from slam_toolbox_tpu.mapper.streaming import PackPool, scan_pack

    laser = LaserConfig(name="t", beam_count=16, min_angle=-1.0,
                        max_angle=1.0, min_range=0.1, max_range=10.0,
                        is_360=False)
    pool = PackPool(16, cap=16)
    scans = []
    for i in range(12):
        s = LocalizedScan(laser, np.full(16, 1.0 + 0.1 * i),
                          [0.1 * i, 0.0, 0.0])
        scans.append(s)
    pool.add_scans(scans)
    assert pool.n == 13
    packs_before = {
        id(s): np.asarray(pool.gather(s._pool_slot)) for s in scans
    }
    # release 8 of 12 — enough freed rows that the next overflow compacts
    for s in scans[:8]:
        pool.release(s)
    assert all(s._pool_slot is None for s in scans[:8])
    more = []
    for i in range(8):
        s = LocalizedScan(laser, np.full(16, 3.0 + 0.1 * i),
                          [1.0 + 0.1 * i, 0.0, 0.0])
        more.append(s)
    pool.add_scans(more)  # 13 + 8 > 16 -> compaction, NOT growth
    assert pool.cap == 16
    assert pool.n == 13  # 1 zero row + 4 survivors + 8 new
    # survivors keep their data under the new slot numbering
    for s in scans[8:]:
        np.testing.assert_array_equal(
            np.asarray(pool.gather(s._pool_slot)), packs_before[id(s)]
        )
    for s in more:
        np.testing.assert_array_equal(
            np.asarray(pool.gather(s._pool_slot)), scan_pack(s)
        )
    # row 0 still the zero pad row
    assert not np.any(np.asarray(pool.buf[0]))
