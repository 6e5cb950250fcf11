"""Serialization round-trip + continue-mapping tests
(reference: serialize/deserialize services, slam_toolbox_common.cpp:928-1079)."""
import numpy as np
import pytest

from slam_toolbox_tpu.api import MatchType, SlamSession
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.io.serialization import load_snapshot, save_snapshot
from test_pipeline import sim_config


@pytest.fixture(scope="module")
def short_run(tmp_path_factory):
    laser, cfg = sim_config()
    world = SegmentWorld.box(5.0)
    sim = LidarSimulator(world, laser, range_noise=0.01, seed=3)
    waypoints = np.array([(-2.0, -2.0), (2.0, -2.0), (2.0, 2.0)])
    data = sim.simulate(waypoints, step=0.45)
    sess = SlamSession(cfg, laser)
    for i, (scan, tp) in enumerate(data):
        sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
    path = str(tmp_path_factory.mktemp("snap") / "graph.npz")
    sess.serialize(path)
    return sess, path, data


def test_roundtrip_preserves_graph(short_run):
    sess, path, data = short_run
    m2 = load_snapshot(path)
    assert m2.solver.n_nodes == sess.mapper.solver.n_nodes
    assert len(m2.graph.edges) == len(sess.mapper.graph.edges)
    s1 = sess.mapper.all_processed_scans()
    s2 = m2.all_processed_scans()
    assert len(s1) == len(s2)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(a.corrected_pose, b.corrected_pose,
                                   atol=1e-9)
        # ranges round-trip through f32 storage (2e-5 m at 20 m — far
        # below the >=1 cm matcher cell size)
        np.testing.assert_allclose(
            np.nan_to_num(a.ranges), np.nan_to_num(b.ranges), atol=3e-5
        )
        assert a.unique_id == b.unique_id and a.state_id == b.state_id
        # the barycenter cache persists (relocalization first-touch at
        # big priors otherwise recomputes it for every scan)
        assert b._local_bary is not None
        np.testing.assert_allclose(
            a.barycenter, b.barycenter, atol=5e-5
        )


def test_continue_mapping_from_snapshot(short_run):
    sess, path, data = short_run
    laser, cfg = sim_config()
    sess2 = SlamSession(cfg, laser)
    sess2.deserialize(path, MatchType.START_AT_GIVEN_POSE,
                      initial_pose=data[-1][0].corrected_pose)
    n0 = sess2.mapper.solver.n_nodes
    # feed a few more scans continuing the path
    world = SegmentWorld.box(5.0)
    sim = LidarSimulator(world, laser, range_noise=0.01, seed=5)
    last_true = data[-1][1]
    wps = np.array([last_true[:2], (last_true[0] - 1.5, last_true[1])])
    more = sim.simulate(wps, step=0.45)
    n_ok = 0
    for i, (scan, tp) in enumerate(more):
        out = sess2.process_scan(
            scan.ranges, scan.odom_pose, time=100 + i * 0.1
        )
        if out is not None:
            n_ok += 1
    assert n_ok > 0
    assert sess2.mapper.solver.n_nodes > n0


def test_deserialize_localization_mode(short_run):
    sess, path, data = short_run
    laser, cfg = sim_config()
    sess2 = SlamSession(cfg, laser, mode="localization")
    sess2.deserialize(path, MatchType.LOCALIZE_AT_POSE,
                      initial_pose=data[-1][0].corrected_pose)
    from slam_toolbox_tpu.api import ProcessType

    assert sess2.processor_type == ProcessType.PROCESS_NEAR_REGION
    assert sess2.mode == "localization"
