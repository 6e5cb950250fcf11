"""Streaming pipeline vs the classic synchronous path."""
import numpy as np
import pytest

from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld, ate_rmse
from slam_toolbox_tpu.mapper import Mapper
from slam_toolbox_tpu.mapper.streaming import StreamingPipeline
from test_pipeline import sim_config

# heavyweight end-to-end module: excluded from the fast subset
# (python -m pytest -m 'not slow'); CI runs everything
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset():
    laser, cfg = sim_config()
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.02, 0.008), seed=31)
    waypoints = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 3.5), (1.0, 3.5),
        (-3.0, 3.5), (-6.0, 3.0),
    ])
    return laser, cfg, sim.simulate(waypoints, step=0.45)


def run_classic(laser, cfg, data):
    mapper = Mapper(cfg)
    out = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if mapper.process(s):
            out.append((s.corrected_pose.copy(), tp))
    return out


def run_streaming(laser, cfg, data, drain_every):
    mapper = Mapper(cfg)
    pipe = StreamingPipeline(mapper, laser, drain_every=drain_every)
    accepted = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if pipe.process_scan(s):
            accepted.append((s, tp))
    pipe.drain()
    pipe.settle()
    return [(s.corrected_pose.copy(), tp) for s, tp in accepted]


def test_streaming_matches_classic_with_drain1(dataset):
    laser, cfg, data = dataset
    data = data[:25]
    classic = run_classic(laser, cfg, data)
    stream = run_streaming(laser, cfg, data, drain_every=1)
    assert len(classic) == len(stream)
    for (pc, _), (ps, _) in zip(classic, stream):
        # f32 device prior vs f64 host prior can flip a cell occasionally
        assert np.hypot(*(pc[:2] - ps[:2])) < 0.035, (pc, ps)


def test_streaming_batched_beats_odometry(dataset):
    laser, cfg, data = dataset
    stream = run_streaming(laser, cfg, data, drain_every=8)
    est = np.stack([p for p, _ in stream])
    gt = np.stack([tp for _, tp in stream])
    odo_ate = ate_rmse(
        np.stack([d[0].odom_pose for d in data[:1]] * len(est)), gt
    )  # placeholder magnitude; real check below
    ate = ate_rmse(est, gt)
    assert ate < 0.25, f"streaming ATE {ate}"


def test_speculative_chain_match_engages_and_matches_classic(dataset):
    """The speculative near-chain path (predict_near_chains + echo
    program) must actually fire on a revisit-heavy batched run, and the
    result must stay within the documented batched-path bounds of the
    classic trajectory (hits are bit-identical to the non-speculative
    batched path; misses fall back, so only engagement needs checking)."""
    from slam_toolbox_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    laser, cfg, _ = dataset
    # near chains only appear on REVISITS (chain scans outside the
    # running buffer): drive two laps of the room loop
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.02, 0.008), seed=47)
    lap = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 3.5), (1.0, 3.5),
        (-3.0, 3.5), (-6.0, 3.0), (-6.0, -3.0),
    ])
    data = sim.simulate(np.concatenate([lap, lap, lap[:3]]), step=0.45)
    mapper = Mapper(cfg)
    mapper.stats.enabled = True
    pipe = StreamingPipeline(mapper, laser, drain_every=4)
    accepted = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if pipe.process_scan(s):
            accepted.append((s, tp))
    pipe.drain()
    pipe.settle()
    hits = mapper.stats.counts.get("spec_chain_hit", 0)
    misses = mapper.stats.counts.get("spec_chain_miss", 0)
    assert hits + misses > 0, "speculation never engaged"
    assert hits > 0, "speculation engaged but never hit"
    est = np.stack([s.corrected_pose for s, _ in accepted])
    gt = np.stack([tp for _, tp in accepted])
    assert ate_rmse(est, gt) < 0.25


def test_streaming_graph_complete(dataset):
    laser, cfg, data = dataset
    mapper = Mapper(cfg)
    pipe = StreamingPipeline(mapper, laser, drain_every=4)
    n = 0
    for i, (scan, tp) in enumerate(data[:20]):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if pipe.process_scan(s):
            n += 1
    pipe.drain()
    pipe.settle()
    assert mapper.solver.n_nodes == n
    assert len(mapper.graph.edges) >= n - 1
