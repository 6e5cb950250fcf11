"""Lifecycle + bond heartbeat + watchdog (utils/lifecycle.py).

Reference contract: managed-node transitions
(slam_toolbox_common.cpp:99-237) and the bond heartbeat the lifecycle
manager watches (createBond/destroyBond, :72-96; period 0.10 s,
timeout 4.0 s). Timings here are scaled down ~100x so the suite stays
fast; the logic is period-relative.
"""
import time

import pytest

from slam_toolbox_tpu.utils.lifecycle import (
    Bond, BondMonitor, Lifecycle, LifecycleState, TransitionError, Watchdog,
)


def _wait_for(pred, timeout=5.0, poll=0.005):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(poll)
    return pred()


class TestLifecycle:
    def test_happy_path(self):
        lc = Lifecycle()
        assert lc.state is LifecycleState.UNCONFIGURED
        assert lc.configure() is LifecycleState.INACTIVE
        assert lc.activate() is LifecycleState.ACTIVE
        assert lc.deactivate() is LifecycleState.INACTIVE
        assert lc.cleanup() is LifecycleState.UNCONFIGURED
        assert lc.shutdown() is LifecycleState.FINALIZED

    def test_illegal_transitions_raise(self):
        lc = Lifecycle()
        with pytest.raises(TransitionError):
            lc.activate()  # must configure first
        lc.configure()
        with pytest.raises(TransitionError):
            lc.configure()  # already configured
        lc.shutdown()
        with pytest.raises(TransitionError):
            lc.activate()  # finalized is terminal

    def test_failing_hook_aborts_transition(self):
        def boom():
            raise RuntimeError("on_configure failed")

        lc = Lifecycle(hooks={"configure": boom})
        with pytest.raises(RuntimeError):
            lc.configure()
        assert lc.state is LifecycleState.UNCONFIGURED  # unchanged

    def test_hooks_fire(self):
        calls = []
        lc = Lifecycle(hooks={
            "activate": lambda: calls.append("act"),
            "deactivate": lambda: calls.append("deact"),
        })
        lc.configure()
        lc.activate()
        lc.deactivate()
        assert calls == ["act", "deact"]


class TestBond:
    def test_heartbeat_advances_and_monitor_stays_calm(self):
        bond = Bond("t", period=0.01).start()
        try:
            assert _wait_for(lambda: bond.last_beat()[0] >= 3)
            mon = BondMonitor(bond=bond, timeout=0.2, poll=0.01)
            for _ in range(5):
                assert not mon.check()
                time.sleep(0.02)
        finally:
            bond.break_bond()

    def test_break_is_detected_once(self):
        broken = []
        bond = Bond("t", period=0.01).start()
        mon = BondMonitor(bond=bond, timeout=0.1, poll=0.01,
                          on_broken=lambda: broken.append(1)).start()
        try:
            assert _wait_for(lambda: bond.last_beat()[0] >= 2)
            bond.break_bond()
            assert _wait_for(lambda: mon.broken, timeout=5.0)
            time.sleep(0.05)
            assert broken == [1]  # callback fired exactly once
        finally:
            mon.stop()
            bond.break_bond()

    def test_file_based_bond_cross_process_surface(self, tmp_path):
        path = str(tmp_path / "live")
        bond = Bond("t", period=0.01, path=path).start()
        try:
            assert _wait_for(lambda: bond.last_beat()[0] >= 2)
            mon = BondMonitor(path=path, timeout=0.3, poll=0.01)
            assert not mon.check()
            bond.break_bond()  # also removes the file
            assert _wait_for(lambda: mon.check(), timeout=5.0)
        finally:
            bond.break_bond()


class TestWatchdog:
    def test_stall_flagged_and_cleared(self):
        stalls = []
        wd = Watchdog(stall_s=0.05, poll=0.01,
                      on_stall=lambda n, dt: stalls.append(n))
        wd.start()
        try:
            with wd.section("fetch"):
                assert _wait_for(lambda: wd.health()["status"] == "stalled")
            assert stalls == ["fetch"]
            h = wd.health()
            assert h["status"] == "ok"  # section exited
            assert h["stalls"][0]["section"] == "fetch"
        finally:
            wd.stop()

    def test_fast_section_never_fires(self):
        wd = Watchdog(stall_s=0.5, poll=0.01)
        with wd.section("quick"):
            pass
        assert wd.health()["status"] == "ok"
        assert wd.health()["stalls"] == []


class TestSessionIntegration:
    def _session(self):
        from slam_toolbox_tpu.api import SlamSession
        from slam_toolbox_tpu.core.params import MapperConfig
        from slam_toolbox_tpu.core.scan import LaserConfig

        return SlamSession(MapperConfig(), LaserConfig())

    def test_transitions_drive_pause_domains(self):
        from slam_toolbox_tpu.api.slam import PausedApplication

        s = self._session()
        s.configure()
        s.activate()
        assert not s.is_paused(PausedApplication.NEW_MEASUREMENTS)
        assert not s.is_paused(PausedApplication.PROCESSING)
        s.deactivate()
        assert s.is_paused(PausedApplication.NEW_MEASUREMENTS)
        assert s.is_paused(PausedApplication.PROCESSING)
        s.cleanup()
        assert s.lifecycle.state is LifecycleState.UNCONFIGURED

    def test_bond_follows_activation(self, tmp_path):
        s = self._session()
        bond = s.create_bond(path=str(tmp_path / "live"), period=0.01)
        assert bond.alive
        s.configure()
        s.activate()
        s.deactivate()  # on_deactivate breaks the bond
        assert not bond.alive
        h = s.health()
        assert h["lifecycle"] == "INACTIVE"
        assert not h["bond_alive"]
        s.shutdown()
        assert s.lifecycle.state is LifecycleState.FINALIZED

    def test_health_reports_watchdog(self):
        s = self._session()
        wd = s.enable_watchdog(stall_s=0.05)
        try:
            with wd.section("drain_fetch"):
                _wait_for(lambda: s.health()["status"] == "stalled")
                assert s.health()["status"] == "stalled"
            assert s.health()["status"] == "ok"
        finally:
            wd.stop()
