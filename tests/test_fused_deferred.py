"""Deferred loop-closure equivalence (ADVICE r1): with SLAM_FUSED_LOOP=1
the fused verify + begin/finish split runs on the CPU backend, so the
deferred machinery (streaming drain dispatches the verify, settle()
fetches and applies it before later bookkeeping) is exercised and must
produce the same final poses as the blocking classic path."""
import numpy as np
import pytest

from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.mapper import Mapper
from slam_toolbox_tpu.mapper.streaming import StreamingPipeline

# heavyweight end-to-end module: excluded from the fast subset
# (python -m pytest -m 'not slow'); CI runs everything
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def loop_dataset():
    from test_pipeline import sim_config

    laser, cfg = sim_config()
    cfg = cfg.replace(
        do_loop_closing=True,
        loop_match_minimum_chain_size=6,
        loop_search_maximum_distance=3.0,
        loop_match_minimum_response_coarse=0.35,
        loop_match_minimum_response_fine=0.45,
        loop_match_maximum_variance_coarse=3.0,
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(
        world, laser, range_noise=0.01, odom_noise=(0.025, 0.01), seed=11
    )
    # closed loop around the rooms: revisits the start
    waypoints = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
        (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0), (-6.0, -3.5),
        (-3.0, -3.5),
    ])
    return laser, cfg, sim.simulate(waypoints, step=0.55)


def _run_classic(laser, cfg, data):
    mapper = Mapper(cfg)
    out = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if mapper.process(s):
            out.append(s)
    return mapper, out


def _run_streaming(laser, cfg, data, drain_every):
    mapper = Mapper(cfg)
    pipe = StreamingPipeline(mapper, laser, drain_every=drain_every)
    accepted = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        if pipe.process_scan(s):
            accepted.append(s)
    pipe.drain()
    pipe.settle()
    return mapper, accepted


def test_deferred_fused_matches_blocking(loop_dataset, monkeypatch):
    """Deferred (begin -> commit/settle fetch) vs blocking closure INSIDE
    the same streaming pipeline: identical f32 compute, only the fetch
    timing differs, so final poses must agree to fp noise. A classic-path
    run bounds the result at the documented streaming tolerance and
    proves a closure actually fired.

    Bit-equivalence is pinned under SLAM_EARLY_VERIFY=0 (the round-3
    tail-dispatch order): the round-4 early-verify ordering dispatches
    the verify BEFORE the remaining scans' bookkeeping, so a blocking
    begin applies its correction mid-batch while the deferred one
    applies at settle — an intentional, documented ordering change
    (PARITY.md §Known). The new default order is covered against the
    classic path below (test_early_verify_matches_classic)."""
    from slam_toolbox_tpu.mapper import streaming

    monkeypatch.setenv("SLAM_FUSED_LOOP", "1")
    monkeypatch.setattr(streaming, "EARLY_VERIFY", False)
    laser, cfg, data = loop_dataset

    m_def, s_def = _run_streaming(laser, cfg, data, drain_every=16)

    # blocking variant: begin resolves synchronously via the blocking
    # sweep (the pipeline handles bool handles), so no verify is ever
    # deferred past a drain
    from slam_toolbox_tpu.graph.pose_graph import PoseGraph

    monkeypatch.setattr(
        PoseGraph, "try_close_loop_begin",
        lambda self, scan, name, spec=None: self.try_close_loop(scan, name),
    )
    m_blk, s_blk = _run_streaming(laser, cfg, data, drain_every=16)

    assert len(s_def) == len(s_blk)
    for a, b in zip(s_def, s_blk):
        np.testing.assert_allclose(
            a.corrected_pose, b.corrected_pose, atol=1e-6,
            err_msg=f"scan {b.unique_id} diverged",
        )
    assert m_def.solver.n_nodes == m_blk.solver.n_nodes
    assert len(m_def.graph.edges) == len(m_blk.graph.edges)

    # the dataset must actually close a loop, otherwise this test says
    # nothing about the deferred path
    closures = sum(
        1 for e in m_def.graph.edges
        if abs(e.source.unique_id - e.target.unique_id) > 8
    )
    assert closures >= 1, "no loop closure fired — tune the dataset"

    # sanity vs the classic blocking path at the documented streaming
    # tolerance (f32 device prior vs f64 host prior)
    monkeypatch.undo()
    monkeypatch.setenv("SLAM_FUSED_LOOP", "1")
    m_classic, s_classic = _run_classic(laser, cfg, data)
    assert len(s_classic) == len(s_def)
    for a, b in zip(s_def, s_classic):
        assert np.hypot(*(a.corrected_pose[:2] - b.corrected_pose[:2])) \
            < 0.05, (a.corrected_pose, b.corrected_pose)


def test_early_verify_matches_classic(loop_dataset, monkeypatch):
    """The round-4 early-verify ordering (default) must stay within the
    documented streaming tolerance of the classic per-scan path, with a
    real closure fired."""
    from slam_toolbox_tpu.mapper import streaming

    monkeypatch.setenv("SLAM_FUSED_LOOP", "1")
    assert streaming.EARLY_VERIFY  # the default under test
    laser, cfg, data = loop_dataset
    m_ev, s_ev = _run_streaming(laser, cfg, data, drain_every=16)
    closures = sum(
        1 for e in m_ev.graph.edges
        if abs(e.source.unique_id - e.target.unique_id) > 8
    )
    assert closures >= 1, "no loop closure fired — tune the dataset"
    m_classic, s_classic = _run_classic(laser, cfg, data)
    assert len(s_classic) == len(s_ev)
    for a, b in zip(s_ev, s_classic):
        assert np.hypot(*(a.corrected_pose[:2] - b.corrected_pose[:2])) \
            < 0.05, (a.corrected_pose, b.corrected_pose)


def test_finish_handles_sync_resolution(monkeypatch):
    """try_close_loop_finish must pass through bools (synchronously
    resolved begins) untouched."""
    from slam_toolbox_tpu.core.params import MapperConfig

    m = Mapper(MapperConfig())
    m.initialize(10.0)
    assert m.graph.try_close_loop_finish(False) is False
    assert m.graph.try_close_loop_finish(True) is True
