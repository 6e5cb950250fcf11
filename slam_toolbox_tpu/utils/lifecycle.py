"""Lifecycle + bond-heartbeat failure detection (tpu-native analog).

The reference is a managed rclcpp_lifecycle node: an external lifecycle
manager drives configure/activate/deactivate/cleanup transitions
(slam_toolbox_common.cpp:99-237) and watches a *bond* heartbeat
(createBond/destroyBond, slam_toolbox_common.cpp:72-96; period 0.10 s,
timeout 4.0 s) so it can restart the node if the heartbeat stops. That
bond is the reference's ONLY failure-detection mechanism (SURVEY §5).

Here the same contract is transport-free:

- ``Lifecycle``: the managed-node state machine (UNCONFIGURED <->
  INACTIVE <-> ACTIVE, -> FINALIZED) with per-transition hooks, used by
  ``SlamSession.configure()/activate()/deactivate()/cleanup()/
  shutdown()``.
- ``Bond``: a daemon thread stamping a monotonically increasing beat
  counter at ``period`` into an in-process cell and (optionally) a
  liveness file, so BOTH an in-process monitor and an external
  supervisor process (e.g. the bench.py parent) can watch it.
- ``BondMonitor``: the lifecycle-manager side — declares the bond
  broken after ``timeout`` seconds without a fresh beat and fires
  ``on_broken`` once.
- ``Watchdog``: tunnel-stall detection the reference never needed —
  remote TPU calls (drain fetch, block_until_ready) can wedge
  indefinitely; sections the hot path and flags any section in flight
  longer than ``stall_s``. It NEVER kills anything (killing a process
  mid-d2h-fetch wedges the tunnel); it only reports, so a supervisor
  can decide.

All threads are daemons with sub-second default granularity scaled off
the configured period; nothing here touches jax.
"""
from __future__ import annotations

import enum
import os
import threading
import time
from typing import Callable, Dict, Optional


class LifecycleState(enum.Enum):
    """rclcpp_lifecycle primary states (slam_toolbox_common.cpp:99-237)."""

    UNCONFIGURED = 0
    INACTIVE = 1      # configured but paused (on_configure done)
    ACTIVE = 2        # processing (on_activate done)
    FINALIZED = 3     # shut down, terminal


# legal (from, verb) -> to transitions, mirroring the managed-node graph
_TRANSITIONS = {
    (LifecycleState.UNCONFIGURED, "configure"): LifecycleState.INACTIVE,
    (LifecycleState.INACTIVE, "activate"): LifecycleState.ACTIVE,
    (LifecycleState.ACTIVE, "deactivate"): LifecycleState.INACTIVE,
    (LifecycleState.INACTIVE, "cleanup"): LifecycleState.UNCONFIGURED,
    (LifecycleState.UNCONFIGURED, "shutdown"): LifecycleState.FINALIZED,
    (LifecycleState.INACTIVE, "shutdown"): LifecycleState.FINALIZED,
    (LifecycleState.ACTIVE, "shutdown"): LifecycleState.FINALIZED,
}


class TransitionError(RuntimeError):
    pass


class Lifecycle:
    """Managed-node state machine with per-verb hooks.

    ``hooks[verb]`` runs AFTER the transition is validated and BEFORE the
    state is committed; a hook raising aborts the transition (state is
    unchanged), matching CallbackReturn::FAILURE semantics.
    """

    def __init__(self, hooks: Optional[Dict[str, Callable[[], None]]] = None):
        self.state = LifecycleState.UNCONFIGURED
        self._hooks = dict(hooks or {})
        self._lock = threading.Lock()

    def _apply(self, verb: str) -> LifecycleState:
        with self._lock:
            key = (self.state, verb)
            if key not in _TRANSITIONS:
                raise TransitionError(
                    f"illegal transition {verb!r} from {self.state.name}"
                )
            hook = self._hooks.get(verb)
            if hook is not None:
                hook()  # raising aborts (state unchanged)
            self.state = _TRANSITIONS[key]
            return self.state

    def configure(self):
        return self._apply("configure")

    def activate(self):
        return self._apply("activate")

    def deactivate(self):
        return self._apply("deactivate")

    def cleanup(self):
        return self._apply("cleanup")

    def shutdown(self):
        return self._apply("shutdown")


class Bond:
    """Heartbeat publisher (bond::Bond analog, period 0.10 s default).

    Beats are (counter, monotonic time) in an in-process cell; if
    ``path`` is given the counter is also written there atomically so an
    external supervisor can poll the file.
    """

    def __init__(self, name: str = "slam_toolbox",
                 period: float = 0.10, path: Optional[str] = None):
        self.name = name
        self.period = float(period)
        self.path = path
        self._beat = (0, time.monotonic())
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "Bond":
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name=f"bond-{self.name}", daemon=True
        )
        self._thread.start()
        return self

    def _stamp(self) -> None:
        n = self._beat[0] + 1
        self._beat = (n, time.monotonic())
        if self.path:
            tmp = f"{self.path}.tmp.{os.getpid()}"
            try:
                with open(tmp, "w") as f:
                    f.write(f"{self.name} {n} {time.time():.6f}\n")
                os.replace(tmp, self.path)
            except OSError:
                pass  # liveness file is best-effort

    def _run(self) -> None:
        while not self._stop.wait(self.period):
            self._stamp()

    @property
    def alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def last_beat(self):
        """(counter, monotonic_ts) of the newest beat."""
        return self._beat

    def break_bond(self) -> None:
        """destroyBond(): stop beating (monitor will declare it broken)."""
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout=2.0)
        self._thread = None
        if self.path:
            try:
                os.unlink(self.path)
            except OSError:
                pass

    stop = break_bond


class BondMonitor:
    """Lifecycle-manager side: watch a Bond (in-process) or a liveness
    file (cross-process) and fire ``on_broken`` once after ``timeout``
    seconds without a fresh beat (bond timeout 4.0 s default)."""

    def __init__(self, bond: Optional[Bond] = None,
                 path: Optional[str] = None, timeout: float = 4.0,
                 on_broken: Optional[Callable[[], None]] = None,
                 poll: Optional[float] = None):
        if bond is None and path is None:
            raise ValueError("need a bond or a liveness-file path")
        self.bond = bond
        self.path = path
        self.timeout = float(timeout)
        self.on_broken = on_broken
        self.poll = poll if poll is not None else max(self.timeout / 8, 0.01)
        self.broken = False
        self._last = None  # (marker, monotonic ts we saw it change)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _marker(self):
        if self.bond is not None:
            return self.bond.last_beat()[0]
        try:
            with open(self.path) as f:
                return f.read()
        except OSError:
            return None

    def check(self) -> bool:
        """One poll; returns (and latches) broken-ness."""
        if self.broken:
            return True
        mark = self._marker()
        now = time.monotonic()
        if self._last is None or mark != self._last[0]:
            self._last = (mark, now)
        # a deleted/never-written liveness file is just a beat that never
        # refreshes — the stale test covers it
        stale = now - self._last[1] > self.timeout
        if stale:
            self.broken = True
            cb = self.on_broken
            if cb is not None:
                try:
                    cb()
                except Exception:
                    pass
        return self.broken

    def start(self) -> "BondMonitor":
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name="bond-monitor", daemon=True
        )
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.wait(self.poll):
            if self.check():
                return

    def stop(self) -> None:
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout=2.0)
        self._thread = None


class Watchdog:
    """Stall detector for remote-device sections (no reference analog —
    the tunnel can wedge inside a fetch; see CLAUDE.md tunnel facts).

    Usage::

        wd = Watchdog(stall_s=30.0, on_stall=cb).start()
        with wd.section("drain_fetch"):
            np.asarray(results)

    ``health()`` reports {"status": "ok"|"stalled", "in_flight": {...},
    "stalls": [...]}. The callback fires once per stalled section entry.
    It never interrupts or kills the stalled call.
    """

    def __init__(self, stall_s: float = 30.0,
                 on_stall: Optional[Callable[[str, float], None]] = None,
                 poll: Optional[float] = None):
        self.stall_s = float(stall_s)
        self.on_stall = on_stall
        self.poll = poll if poll is not None else max(self.stall_s / 8, 0.01)
        self._in_flight: Dict[int, tuple] = {}  # token -> (name, t0, fired)
        self._next = 0
        self._stalls = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    class _Section:
        def __init__(self, wd: "Watchdog", name: str):
            self._wd, self._name, self._tok = wd, name, None

        def __enter__(self):
            self._tok = self._wd._enter(self._name)
            return self

        def __exit__(self, *exc):
            self._wd._exit(self._tok)
            return False

    def section(self, name: str) -> "Watchdog._Section":
        return Watchdog._Section(self, name)

    def _enter(self, name: str) -> int:
        with self._lock:
            tok = self._next
            self._next += 1
            self._in_flight[tok] = (name, time.monotonic(), False)
            return tok

    def _exit(self, tok: int) -> None:
        with self._lock:
            self._in_flight.pop(tok, None)

    def _scan(self) -> None:
        now = time.monotonic()
        fire = []
        with self._lock:
            for tok, (name, t0, fired) in list(self._in_flight.items()):
                if not fired and now - t0 > self.stall_s:
                    self._in_flight[tok] = (name, t0, True)
                    self._stalls.append(
                        {"section": name, "after_s": now - t0,
                         "at": time.time()}
                    )
                    fire.append((name, now - t0))
        for name, dt in fire:
            cb = self.on_stall
            if cb is not None:
                try:
                    cb(name, dt)
                except Exception:
                    pass

    def start(self) -> "Watchdog":
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name="slam-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.wait(self.poll):
            self._scan()

    def stop(self) -> None:
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout=2.0)
        self._thread = None

    def health(self) -> dict:
        self._scan()
        with self._lock:
            now = time.monotonic()
            in_flight = {
                name: now - t0
                for (name, t0, _f) in self._in_flight.values()
            }
            stalled = any(f for (_n, _t, f) in self._in_flight.values())
            return {
                "status": "stalled" if stalled else "ok",
                "in_flight": in_flight,
                "stalls": list(self._stalls),
            }
