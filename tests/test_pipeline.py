"""End-to-end pipeline tests: synthetic world -> full SLAM -> ATE assertion
(the SURVEY.md §7.2 milestone; BASELINE config 1)."""
import numpy as np
import pytest

from slam_toolbox_tpu.api import SlamSession
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.dataset import (
    LidarSimulator, SegmentWorld, ate_rmse,
)

# heavyweight end-to-end module: excluded from the fast subset
# (python -m pytest -m 'not slow'); CI runs everything
pytestmark = pytest.mark.slow


def sim_config():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    cfg = MapperConfig(
        minimum_travel_distance=0.2,
        minimum_time_interval=3600.0,
        scan_buffer_size=10,
        link_match_minimum_response_fine=0.1,
        link_scan_maximum_distance=1.5,
        correlation_search_space_dimension=0.5,
        correlation_search_space_resolution=0.01,
        correlation_search_space_smear_deviation=0.1,
        distance_variance_penalty=0.5,
        angle_variance_penalty=1.0,
    )
    return laser, cfg


def run_sequence(data, sess):
    est, gt, odo = [], [], []
    for i, (scan, tp) in enumerate(data):
        out = sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if out is not None:
            est.append(out[0])
            gt.append(tp)
            odo.append(scan.odom_pose)
    return np.stack(est), np.stack(gt), np.stack(odo)


@pytest.fixture(scope="module")
def loop_run():
    laser, cfg = sim_config()
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(
        world, laser, range_noise=0.01, odom_noise=(0.02, 0.008), seed=7
    )
    waypoints = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
        (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0), (-6.0, -3.5),
    ])
    data = sim.simulate(waypoints, step=0.45)
    sess = SlamSession(cfg, laser)
    est, gt, odo = run_sequence(data, sess)
    return sess, est, gt, odo


def test_slam_beats_odometry(loop_run):
    sess, est, gt, odo = loop_run
    ate_slam = ate_rmse(est, gt)
    ate_odom = ate_rmse(odo, gt)
    assert ate_slam < ate_odom, f"slam {ate_slam} vs odom {ate_odom}"
    assert ate_slam < 0.15


def test_graph_grows(loop_run):
    sess, est, gt, odo = loop_run
    assert sess.mapper.solver.n_nodes == len(est)
    assert len(sess.mapper.graph.edges) >= len(est) - 1


def test_map_renders(loop_run):
    sess, est, gt, odo = loop_run
    grid = sess.get_occupancy_grid(0.1)
    assert (grid.cells == 100).sum() > 100
    assert (grid.cells == 255).sum() > 1000


def test_map_to_odom_transform(loop_run):
    sess, est, gt, odo = loop_run
    from slam_toolbox_tpu.core import geometry

    # applying map->odom to the last odom pose gives the corrected pose
    recon = np.asarray(geometry.compose(sess.map_to_odom, odo[-1]))
    np.testing.assert_allclose(recon[:2], est[-1][:2], atol=1e-6)


def test_near_chains_native_matches_python(loop_run):
    """The native single-sensor chain walk must produce the same chains
    (same scans, same order) as the pure-Python reference walk."""
    from slam_toolbox_tpu import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    sess = loop_run[0]
    graph = sess.mapper.graph
    scans = sess.mapper.all_processed_scans()
    for query in (scans[-1], scans[len(scans) // 2]):
        got = graph.find_near_chains(query)
        lib = native._lib
        native._lib = None
        orig_build = native._build
        native._build = lambda: False
        try:
            ref = graph.find_near_chains(query)
        finally:
            native._lib = lib
            native._build = orig_build
        got_ids = [[s.unique_id for s in c] for c in got]
        ref_ids = [[s.unique_id for s in c] for c in ref]
        assert got_ids == ref_ids


def test_query_structure_tombstones_and_compaction(loop_run):
    """Node removals tombstone the query structure (O(1)); queries must
    stay equivalent to the pure-Python paths through tombstones AND
    through the lazy compaction that follows bulk removals."""
    import copy

    from slam_toolbox_tpu import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    sess = loop_run[0]
    mapper = copy.deepcopy(sess.mapper)
    graph = mapper.graph
    scans = mapper.all_processed_scans()
    assert len(scans) > 20

    def python_near_linked(query, dist):
        lib = native._lib
        native._lib = None
        orig = native._build
        native._build = lambda: False
        try:
            return [s.unique_id for s in graph.find_near_linked_scans(
                query, dist)]
        finally:
            native._lib = lib
            native._build = orig

    # remove 40% of nodes (every other one in the middle) — crosses the
    # compaction threshold partway through
    removed = 0
    for s in scans[3:-3]:
        if s.state_id % 2 == 0:
            mapper.remove_node_from_graph(s)
            removed += 1
    assert removed > len(scans) // 4
    query = scans[-1]
    got = [s.unique_id for s in graph.find_near_linked_scans(query, 2.5)]
    ref = python_near_linked(query, 2.5)
    assert got == ref
    # removed nodes must never appear
    removed_ids = {s.unique_id for s in scans[3:-3] if s.state_id % 2 == 0}
    assert not (set(got) & removed_ids)
    # force the lazy compaction (the removal count may sit under the
    # max(64, n/4) trigger in this scenario) and re-check equivalence
    graph._q_tombstones = 10 ** 6
    got2 = [s.unique_id for s in graph.find_near_linked_scans(query, 2.5)]
    assert got2 == ref
    assert graph._q_tombstones == 0  # compaction ran

    # chains also agree after removals
    got_c = [[s.unique_id for s in c] for c in graph.find_near_chains(query)]
    lib = native._lib
    native._lib = None
    orig = native._build
    native._build = lambda: False
    try:
        ref_c = [[s.unique_id for s in c]
                 for c in graph.find_near_chains(query)]
    finally:
        native._lib = lib
        native._build = orig
    assert got_c == ref_c
