"""Mapper event/listener surface (MapperListener family, Mapper.h:48-105;
fired per Mapper.cpp:1505-1561, 3180-3234)."""
import numpy as np

from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.mapper.mapper import Mapper, MapperListener


class Recorder(MapperListener):
    def __init__(self):
        self.events = []

    def info(self, msg):
        self.events.append(("info", msg))

    def debug(self, msg):
        self.events.append(("debug", msg))

    def loop_closure_check(self, msg):
        self.events.append(("check", msg))

    def begin_loop_closure(self, msg):
        self.events.append(("begin", msg))

    def end_loop_closure(self, msg):
        self.events.append(("end", msg))


def test_fire_methods_dispatch_and_legacy_callbacks():
    m = Mapper(MapperConfig(use_scan_matching=False))
    rec = Recorder()
    m.add_listener(rec)
    legacy = []
    m.listeners.append(legacy.append)
    m.fire_info("i")
    m.fire_debug("d")
    m.fire_loop_closure_check("c")
    m.fire_loop_closure("Closing loop...")
    m.fire_end_loop_closure("Loop closed!")
    assert rec.events == [
        ("info", "i"), ("debug", "d"), ("check", "c"),
        ("begin", "Closing loop..."), ("end", "Loop closed!"),
    ]
    # legacy plain callbacks still get the begin message only
    assert legacy == ["Closing loop..."]
    m.remove_listener(rec)
    m.fire_info("x")
    assert len(rec.events) == 5


def test_loop_closure_events_fire_on_real_candidate_sweep():
    """Drive try_close_loop against a real out-and-back candidate chain:
    the coarse check must fire with the reference's COARSE RESPONSE
    wording (Mapper.cpp:1513-1521), and any closure must emit a matched
    begin/end pair."""
    laser = LaserConfig(beam_count=181, min_angle=-np.pi / 2,
                        max_angle=np.pi / 2, min_range=0.05,
                        max_range=12.0, range_threshold=10.0, is_360=False)
    cfg = MapperConfig(
        loop_match_minimum_chain_size=4,
        minimum_travel_distance=0.0,
        minimum_time_interval=0.0,
    )
    m = Mapper(cfg)
    m.initialize(laser.range_threshold)
    rec = Recorder()
    m.add_listener(rec)
    rng = np.random.default_rng(3)
    cov = np.eye(3) * 1e-3
    # out 7 m and back: the return scans are spatially near the early
    # ones but only graph-reachable through the far end, so the early
    # stretch forms a valid candidate chain for the final scan
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
    chains, _ = m.graph._sweep_chains(scans[-1], laser.name, 0)
    assert chains, "scenario must produce a candidate chain"
    m.graph.try_close_loop(scans[-1], laser.name)
    checks = [e for e in rec.events if e[0] == "check"]
    assert checks, "loop_closure_check never fired"
    assert any(msg.startswith("COARSE RESPONSE") for _, msg in checks)
    for _, msg in checks:
        assert msg.startswith(("COARSE RESPONSE", "FINE RESPONSE",
                               "REJECTED!"))
    begins = [e for e in rec.events if e[0] == "begin"]
    ends = [e for e in rec.events if e[0] == "end"]
    assert len(begins) == len(ends)
    assert all(msg == "Closing loop..." for _, msg in begins)
    assert all(msg == "Loop closed!" for _, msg in ends)
