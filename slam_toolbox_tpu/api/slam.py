"""User-facing driver mirroring the reference's ROS node + service surface.

Re-expression of SlamToolbox (slam_toolbox_common.{hpp,cpp}) minus the ROS
transport: scan ingestion gates (shouldProcessScan,
slam_toolbox_common.cpp:740-786), mode dispatch (addScan, :798-859),
map->odom maintenance (setTransformFromPoses, :657-712), map rendering
(updateMap, :630-654), pose reporting with covariance scaling
(publishPose, :862-884), serialize/deserialize services (:928-1079) with the
DeserializePoseGraph match types, pause and reset. The sync/async mode
split (slam_toolbox_sync.cpp / slam_toolbox_async.cpp) is a queue policy
here: SlamSession.process_scan is synchronous; async behavior is obtained
with drop_when_busy by the caller.
"""
from __future__ import annotations

import enum
from typing import List, Optional, Tuple

import numpy as np

from slam_toolbox_tpu.core import geometry
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.kernels import occupancy
from slam_toolbox_tpu.mapper import Mapper


class ProcessType(enum.Enum):
    """toolbox_types.hpp:85-91."""

    PROCESS = 0
    PROCESS_FIRST_NODE = 1
    PROCESS_NEAR_REGION = 2
    PROCESS_LOCALIZATION = 3


class MatchType(enum.Enum):
    """DeserializePoseGraph.srv match types."""

    UNSET = 0
    START_AT_FIRST_NODE = 1
    START_AT_GIVEN_POSE = 2
    LOCALIZE_AT_POSE = 3


class PausedApplication(enum.Enum):
    """The three independent pause domains (toolbox_types.hpp:77-83):
    PROCESSING stops the sync queue's consumer (scans keep queueing,
    slam_toolbox_sync.cpp:40); VISUALIZING_GRAPH suppresses graph
    publishes (slam_toolbox_common.cpp:524); NEW_MEASUREMENTS drops
    incoming scans at the gate (slam_toolbox_common.cpp:762)."""

    PROCESSING = 0
    VISUALIZING_GRAPH = 1
    NEW_MEASUREMENTS = 2


class PausedState:
    """Thread-safe pause map (PausedState, toolbox_types.hpp:92-117)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._state = {app: False for app in PausedApplication}

    def set(self, app: PausedApplication, state: bool) -> None:
        with self._lock:
            self._state[app] = bool(state)

    def get(self, app: PausedApplication) -> bool:
        with self._lock:
            return self._state[app]


class SlamSession:
    def __init__(
        self,
        config: Optional[MapperConfig] = None,
        laser: Optional[LaserConfig] = None,
        mode: str = "mapping",  # "mapping" | "localization"
        throttle_scans: int = 1,
        minimum_time_interval: float = 0.0,
        position_covariance_scale: float = 1.0,
        yaw_covariance_scale: float = 1.0,
        streaming: bool = False,
        drain_every: int = 8,
    ):
        """streaming=True routes mapping-mode scans through the
        device-resident pipeline (mapper/streaming.py): process_scan then
        returns the propagated prior immediately and corrected poses land
        at drains (every `drain_every` scans or on flush()/accessors)."""
        self.config = config or MapperConfig()
        self.laser = laser
        self.mapper = Mapper(self.config)
        self.streaming = bool(streaming)
        self.drain_every = drain_every
        self._pipe = None
        self._grid_cache = None  # incremental occupancy (see get_occupancy_grid)
        import threading

        self._pipe_lock = threading.Lock()
        self._warm_thread = None
        self.mode = mode
        self.throttle_scans = max(int(throttle_scans), 1)
        self.minimum_time_interval = float(minimum_time_interval)
        self.position_covariance_scale = position_covariance_scale
        self.yaw_covariance_scale = yaw_covariance_scale

        self.processor_type = (
            ProcessType.PROCESS_LOCALIZATION
            if mode == "localization"
            else ProcessType.PROCESS
        )
        self.process_near_pose: Optional[np.ndarray] = None
        self.first_measurement = True
        self.paused_state = PausedState()
        self.interactive_mode = False
        self.scan_count = 0
        self.last_scan_time = -np.inf
        self.last_scan_odom: Optional[np.ndarray] = None
        self.map_to_odom = np.zeros(3)
        self.last_pose = np.zeros(3)
        self.last_covariance = np.eye(3)

        # managed-node lifecycle + bond heartbeat (utils/lifecycle.py;
        # slam_toolbox_common.cpp:72-96, :99-237). The session is usable
        # without ever touching these (state machine starts UNCONFIGURED
        # but process_scan doesn't consult it) — they exist for callers
        # that want the reference's managed/monitored deployment model.
        from slam_toolbox_tpu.utils.lifecycle import Lifecycle

        self._bond = None
        self._watchdog = None
        self.lifecycle = Lifecycle(hooks={
            "activate": self._on_activate,
            "deactivate": self._on_deactivate,
            "cleanup": self.reset,
            "shutdown": self._on_shutdown,
        })

    # -- gates (shouldProcessScan, slam_toolbox_common.cpp:740-786) ---------
    def _should_process(self, scan: LocalizedScan) -> bool:
        self.scan_count += 1
        if self.paused:
            return False
        if self.scan_count <= 5:  # always process the first 5 scans
            return True
        if self.scan_count % self.throttle_scans != 0:
            return False
        if scan.time - self.last_scan_time < self.minimum_time_interval:
            return False
        if self.last_scan_odom is not None:
            d = scan.odom_pose[:2] - self.last_scan_odom[:2]
            min_d2 = (0.8 * self.config.minimum_travel_distance) ** 2
            if d @ d < min_d2:
                return False
        return True

    # -- main entry (laserCallback + addScan, :798-859) ---------------------
    def process_scan(
        self, ranges, odom_pose, time: float = 0.0
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Feed one scan. Returns (corrected_robot_pose, covariance) if the
        scan was processed, else None."""
        if self.laser is None:
            raise ValueError("SlamSession requires a LaserConfig")
        scan = LocalizedScan(self.laser, ranges, odom_pose, time=time)
        if not self._should_process(scan):
            return None

        cov = np.eye(3)
        pt = self.processor_type
        streaming_path = self.streaming and (
            pt == ProcessType.PROCESS
            or (pt == ProcessType.PROCESS_LOCALIZATION
                and not self.first_measurement)
        )
        if not streaming_path and self._pipe is not None:
            # mode switch (relocalize / dock / initial pose): the classic
            # path must see fully drained + settled bookkeeping
            self._pipe.drain()
            self._pipe.settle()
        if pt == ProcessType.PROCESS and self.streaming:
            self._ensure_pipe()
            ok = self._pipe.process_scan(scan)
            if not ok:
                return None
            self.last_scan_time = scan.time
            self.last_scan_odom = np.array(scan.odom_pose)
            return self._streaming_online_pose(scan), cov
        elif pt == ProcessType.PROCESS:
            ok = self.mapper.process(scan, covariance_out=cov)
        elif pt == ProcessType.PROCESS_FIRST_NODE:
            ok = self.mapper.process_at_dock(scan, covariance_out=cov)
            self.processor_type = ProcessType.PROCESS
        elif pt == ProcessType.PROCESS_NEAR_REGION:
            if self.process_near_pose is not None:
                scan.set_corrected_pose(self.process_near_pose)
                self.process_near_pose = None
            ok = self.mapper.process_against_nodes_near_by(
                scan,
                add_to_buffer=self.mode == "localization",
                covariance_out=cov,
            )
            self.processor_type = (
                ProcessType.PROCESS_LOCALIZATION
                if self.mode == "localization"
                else ProcessType.PROCESS
            )
        elif pt == ProcessType.PROCESS_LOCALIZATION:
            if self.streaming and not self.first_measurement:
                # steady-state elastic localization through the streaming
                # pipeline: the rolling-buffer append/evict is host-side
                # bookkeeping hooked into the drain (post_finish)
                pipe = self._ensure_pipe()
                ok = pipe.process_scan(scan)
                if not ok:
                    return None
                self.last_scan_time = scan.time
                self.last_scan_odom = np.array(scan.odom_pose)
                return self._streaming_online_pose(scan), cov
            ok = self.mapper.process_localization(scan, covariance_out=cov)
        else:
            return None

        if not ok:
            return None
        self.first_measurement = False
        self.last_scan_time = scan.time
        self.last_scan_odom = np.array(scan.odom_pose)
        self._set_transform_from_poses(scan)
        self.last_pose = np.array(scan.corrected_pose)
        self.last_covariance = np.array(cov)
        self.last_covariance[:2, :2] *= self.position_covariance_scale
        self.last_covariance[2, 2] *= self.yaw_covariance_scale
        return scan.corrected_pose, self.last_covariance

    def _set_transform_from_poses(self, scan: LocalizedScan) -> None:
        """map->odom = corrected ⊕ odom^-1 (setTransformFromPoses,
        slam_toolbox_common.cpp:657-712)."""
        self.map_to_odom = np.asarray(
            geometry.compose(
                scan.corrected_pose, geometry.inverse(scan.odom_pose)
            )
        )

    def _ensure_pipe(self):
        with self._pipe_lock:
            if self._pipe is None:
                from slam_toolbox_tpu.mapper.streaming import (
                    StreamingPipeline,
                )

                self._pipe = StreamingPipeline(
                    self.mapper, self.laser, drain_every=self.drain_every
                )
                if self.mode == "localization":
                    self._pipe.post_finish = self._loc_post_finish
                if self._watchdog is not None:
                    self._pipe.watchdog = self._watchdog
            return self._pipe

    def _streaming_online_pose(self, scan) -> np.ndarray:
        """Online pose between drains: the last drained correction
        propagated through the odometry delta (the same prior the device
        uses; exact once the scan itself has drained). Also maintains
        map->odom like the classic path."""
        last = self.mapper.sensor_manager.get_last_scan(self.laser.name)
        if last is None:
            pose = np.array(scan.corrected_pose)
        else:
            pose = np.asarray(geometry.transform_pose_between(
                last.odom_pose, last.corrected_pose, scan.odom_pose
            ))
        self.map_to_odom = np.asarray(
            geometry.compose(pose, geometry.inverse(scan.odom_pose))
        )
        self.last_pose = np.array(pose)
        return pose

    def _loc_post_finish(self, scan) -> bool:
        """Elastic-buffer bookkeeping per drained scan
        (AddScanToLocalizationBuffer, Mapper.cpp:2911-2962). Returns True
        only when eviction removed a node that was still in the RUNNING
        buffer (the device ring mirrors the running buffer; evicting an
        old node elsewhere in the map does not touch it — a resync there
        costs a full ring re-upload per drain for nothing)."""
        m = self.mapper
        was_running = False
        if len(m.localization_buffer) >= m.config.scan_buffer_size:
            old = m.localization_buffer[0]
            was_running = old in m.sensor_manager.get_running_scans(
                old.laser.name
            )
        m.add_scan_to_localization_buffer(scan)
        return was_running

    def flush(self) -> None:
        """Drain the streaming pipeline (no-op otherwise) and complete any
        deferred loop closure, so every accessor behind flush() sees fully
        settled poses."""
        if self._pipe is not None:
            self._pipe.drain()
            self._pipe.settle()

    @property
    def stats(self):
        """Per-stage timing counters (utils/metrics.Stats); enable with
        `sess.stats.enabled = True`."""
        return self.mapper.stats

    # -- map rendering (updateMap, :630-654) --------------------------------
    def get_occupancy_grid(self, resolution: Optional[float] = None):
        """Occupancy map of all processed scans. Steady-state publishes
        are O(new scans): the session caches the grid + hit/pass counters
        and folds only newly added scans via add_scans_incremental
        (equivalence with the full rebuild is tested —
        test_incremental_equals_full_rebuild). A full re-raster happens
        only when poses were corrected / scans removed
        (graph.pose_revision), the resolution changed, or a new scan
        extends the map extent."""
        self.flush()
        scans = self.mapper.all_processed_scans()
        if not scans:
            return None
        res = float(resolution or self.config.map_resolution)
        g = self.mapper.graph
        rev = g.pose_revision if g is not None else 0
        c = self._grid_cache
        if (
            c is not None
            and c["res"] == res
            and c["rev"] == rev
            and len(scans) >= c["n"]
            and scans[c["n"] - 1].unique_id == c["last_uid"]
        ):
            new = scans[c["n"]:]
            if not new:
                return c["grid"]
            # incremental fold is exact only while the map extent is
            # unchanged (extent = union of scan bounding boxes)
            if all(
                np.all(s.bounding_box[0] >= c["mins"])
                and np.all(s.bounding_box[1] <= c["maxs"])
                for s in new
            ):
                grid = occupancy.add_scans_incremental(
                    c["grid"], new,
                    self.config.min_pass_through,
                    self.config.occupancy_threshold,
                )
                self._grid_cache = dict(
                    c, grid=grid, n=len(scans),
                    last_uid=scans[-1].unique_id,
                )
                return grid
        # full rebuild: multi-device meshes render big maps as row-band
        # shards with halo exchange (dist/submap.py; bit-exact vs the
        # single-device raster, auto-gated on topology + grid size)
        from slam_toolbox_tpu.dist.submap import (
            maybe_sharded_create_from_scans,
        )

        grid = maybe_sharded_create_from_scans(
            scans, res,
            self.config.min_pass_through,
            self.config.occupancy_threshold,
        )
        mins = np.full(2, np.inf)
        maxs = np.full(2, -np.inf)
        for s in scans:
            bb = s.bounding_box
            mins = np.minimum(mins, bb[0])
            maxs = np.maximum(maxs, bb[1])
        self._grid_cache = {
            "res": res, "rev": rev, "n": len(scans),
            "last_uid": scans[-1].unique_id,
            "mins": mins, "maxs": maxs, "grid": grid,
        }
        return grid

    # -- services -----------------------------------------------------------
    def serialize(self, path: str) -> None:
        from slam_toolbox_tpu.io.serialization import save_snapshot

        self.flush()
        save_snapshot(self.mapper, path)

    def deserialize(
        self,
        path: str,
        match_type: MatchType = MatchType.UNSET,
        initial_pose: Optional[np.ndarray] = None,
    ) -> None:
        """deserializePoseGraphCallback (slam_toolbox_common.cpp:1020-1079)."""
        from slam_toolbox_tpu.io.serialization import load_snapshot

        self.flush()
        self._pipe = None  # device state refers to the pre-load session
        self._grid_cache = None  # new graph object: pose_revision resets
        load_snapshot(path, self.mapper)
        scans = self.mapper.all_processed_scans()
        if scans:
            self.laser = scans[0].laser
        self.mapper.solver.compute()
        # prebuild the incremental query structure here (one-time load
        # cost) rather than on the first relocalization query — at a
        # 100k-node prior the rebuild + xy refresh dominated the
        # user-visible "where am I" latency (VERDICT r3 #5)
        if self.mapper.graph is not None:
            self.mapper.graph._query_structure()
        if match_type == MatchType.START_AT_FIRST_NODE:
            self.processor_type = ProcessType.PROCESS_FIRST_NODE
        elif match_type == MatchType.START_AT_GIVEN_POSE:
            self.processor_type = ProcessType.PROCESS_NEAR_REGION
            self.process_near_pose = np.asarray(initial_pose, np.float64)
        elif match_type == MatchType.LOCALIZE_AT_POSE:
            self.mode = "localization"
            self.processor_type = ProcessType.PROCESS_NEAR_REGION
            self.process_near_pose = np.asarray(initial_pose, np.float64)

    def toggle_mode(self, mode: str) -> None:
        """Runtime mapping<->localization switch (the map-and-localization
        node's toggle service, slam_toolbox_map_and_localization.cpp:82-115).
        Entering localization starts the elastic buffer from the next
        scan; returning to mapping folds the buffered scans into the
        permanent graph (they simply stop being evicted)."""
        if mode not in ("mapping", "localization"):
            raise ValueError(mode)
        if mode == self.mode:
            return
        self.flush()
        if mode == "mapping":
            # buffered scans become permanent graph nodes
            self.mapper.localization_buffer.clear()
            self.processor_type = ProcessType.PROCESS
        else:
            self.processor_type = ProcessType.PROCESS_LOCALIZATION
        self.mode = mode
        if self._pipe is not None:
            self._pipe.post_finish = (
                self._loc_post_finish if mode == "localization" else None
            )

    def set_initial_pose(self, pose) -> None:
        """/initialpose (localizePoseCallback,
        slam_toolbox_localization.cpp:240-270)."""
        self.process_near_pose = np.asarray(pose, np.float64)
        self.processor_type = ProcessType.PROCESS_NEAR_REGION
        self.first_measurement = True

    def clear_localization_buffer(self) -> None:
        self.mapper.clear_localization_buffer()

    # -- pause domains (toolbox_types.hpp:77-117) ---------------------------
    @property
    def paused(self) -> bool:
        """Legacy single-flag view = the NEW_MEASUREMENTS domain."""
        return self.paused_state.get(PausedApplication.NEW_MEASUREMENTS)

    @paused.setter
    def paused(self, value: bool) -> None:
        self.paused_state.set(PausedApplication.NEW_MEASUREMENTS, value)

    def is_paused(self, app: PausedApplication) -> bool:
        return self.paused_state.get(app)

    def pause(self) -> bool:
        """pause_new_measurements service toggle
        (slam_toolbox_common.cpp:905-919)."""
        cur = self.paused_state.get(PausedApplication.NEW_MEASUREMENTS)
        self.paused_state.set(PausedApplication.NEW_MEASUREMENTS, not cur)
        return not cur

    def pause_processing(self, state: bool) -> None:
        """Stop the sync consumer while letting scans queue
        (slam_toolbox_sync.cpp:40)."""
        self.paused_state.set(PausedApplication.PROCESSING, state)

    def toggle_interactive_mode(self) -> bool:
        """ToggleInteractive (slam_toolbox_common.cpp analog): entering
        interactive mode pauses processing + graph visualization so nodes
        can be inspected/moved (modify_node / manual_loop_closure);
        leaving resumes both."""
        self.interactive_mode = not self.interactive_mode
        self.pause_processing(self.interactive_mode)
        self.paused_state.set(
            PausedApplication.VISUALIZING_GRAPH, self.interactive_mode
        )
        return self.interactive_mode

    # -- lifecycle / failure detection (utils/lifecycle.py) -----------------
    def _on_activate(self) -> None:
        """on_activate (slam_toolbox_common.cpp:143-172): resume
        processing + start the bond heartbeat if one was requested."""
        self.paused_state.set(PausedApplication.NEW_MEASUREMENTS, False)
        self.paused_state.set(PausedApplication.PROCESSING, False)
        if self._bond is not None:
            self._bond.start()

    def _on_deactivate(self) -> None:
        """on_deactivate (:174-197): pause ingestion + stop heartbeating
        (the manager sees the bond break and may restart us)."""
        self.paused_state.set(PausedApplication.NEW_MEASUREMENTS, True)
        self.paused_state.set(PausedApplication.PROCESSING, True)
        if self._bond is not None:
            self._bond.break_bond()

    def _on_shutdown(self) -> None:
        self.destroy_bond()
        # settle BEFORE stopping the watchdog: the terminal drain/fetch is
        # exactly the tunnel-wedge-prone path the watchdog exists to flag
        if self._pipe is not None:
            self._settle_pipe()
        wd = self._watchdog
        if wd is not None:
            wd.stop()

    def configure(self):
        return self.lifecycle.configure()

    def activate(self):
        return self.lifecycle.activate()

    def deactivate(self):
        return self.lifecycle.deactivate()

    def cleanup(self):
        return self.lifecycle.cleanup()

    def shutdown(self):
        return self.lifecycle.shutdown()

    def create_bond(self, path: Optional[str] = None,
                    period: float = 0.10):
        """createBond (slam_toolbox_common.cpp:72-86): start a heartbeat
        an external manager can watch (in-process via the returned Bond,
        cross-process via `path`). Idempotent."""
        from slam_toolbox_tpu.utils.lifecycle import Bond

        if self._bond is None:
            self._bond = Bond("slam_session", period=period, path=path)
        elif (path, period) != (self._bond.path, self._bond.period):
            # a supervisor watching the NEW path would see silence forever
            raise ValueError(
                "create_bond called again with different parameters "
                f"(existing path={self._bond.path!r} period="
                f"{self._bond.period}); destroy_bond() first"
            )
        self._bond.start()
        return self._bond

    def destroy_bond(self) -> None:
        """destroyBond (:88-96)."""
        if self._bond is not None:
            self._bond.break_bond()
            self._bond = None

    def enable_watchdog(self, stall_s: float = 30.0, on_stall=None):
        """Flag remote-device sections (drain fetch etc.) in flight
        longer than `stall_s` — report-only tunnel-stall detection."""
        from slam_toolbox_tpu.utils.lifecycle import Watchdog

        if self._watchdog is None:
            self._watchdog = Watchdog(stall_s=stall_s, on_stall=on_stall)
            self._watchdog.start()
            if self._pipe is not None:
                self._pipe.watchdog = self._watchdog
        elif stall_s != self._watchdog.stall_s:
            raise ValueError(
                "enable_watchdog called again with a different stall_s "
                f"(existing {self._watchdog.stall_s})"
            )
        return self._watchdog

    def health(self) -> dict:
        """One-call liveness summary for supervisors."""
        h = {
            "lifecycle": self.lifecycle.state.name,
            "bond_alive": bool(self._bond is not None and self._bond.alive),
            "scan_count": self.scan_count,
        }
        if self._watchdog is not None:
            h.update(self._watchdog.health())
        else:
            h["status"] = "ok"
        return h

    def reset(self) -> None:
        self._pipe = None
        self.mapper.reset()
        self.scan_count = 0
        self.first_measurement = True
        self.map_to_odom = np.zeros(3)
        self.last_scan_odom = None
        self.last_scan_time = -np.inf

    def warm_all(self, big_buckets: bool = True) -> None:
        """Pre-compile every kernel variant the session can hit (the
        streaming batch program, matcher raster/score variants across
        point-pad buckets for both matchers, and the solver's first node/
        edge buckets), so steady-state throughput is compile-free. On the
        tunneled TPU each executable compiles remotely (15 s to minutes)
        and no persistent cache exists, so cold sessions otherwise stall
        mid-run. Prefer warm_async(): the same warming overlapped with
        live scan processing."""
        from slam_toolbox_tpu.core.scan import LocalizedScan

        if self.laser is None:
            return
        if not self.mapper.initialized:
            self.mapper.initialize(self.laser.range_threshold)
        B = self.laser.n_beams
        ranges = np.full(B, 2.0)
        dummy = LocalizedScan(self.laser, ranges, np.zeros(3))
        small = [
            LocalizedScan(self.laser, ranges, np.zeros(3))
            for _ in range(2)
        ]
        seq = self.mapper.sequential_matcher
        loop = self.mapper.loop_matcher

        # order matters under warm_async: compile what the live pipeline
        # needs soonest first
        if self.streaming:
            self._ensure_pipe().warm()
        # sequential matcher (16 Ki bucket; penalize rides as a traced
        # arg, so one refine=True executable covers near-chain links too)
        seq.match_scan(dummy, small, penalize=True, refine=True)
        # loop matcher coarse pass (16 Ki bucket)
        loop.match_scan(dummy, small, penalize=False, refine=False)
        if big_buckets:
            # long chains (loop candidates / fine verification) pad into
            # the 64 Ki bucket — a separate raster executable per matcher
            big = [
                LocalizedScan(self.laser, ranges, np.zeros(3))
                for _ in range(max(2, 16384 // B + 1))
            ]
            seq.match_scan(dummy, big, penalize=False, refine=True)
            loop.match_scan(dummy, big, penalize=False, refine=False)

        # solver buckets (lm_solve's jit cache is module-global): the
        # (256, 512) floor bucket, plus the next bucket under big_buckets
        from slam_toolbox_tpu.solver import PoseGraphSolver

        def warm_solver(n_nodes: int):
            s = PoseGraphSolver(self.config.solver)
            for i in range(n_nodes):
                s.add_node(i, [float(i), 0.0, 0.0])
            for i in range(n_nodes - 1):
                s.add_constraint(i, i + 1, [1, 0, 0], np.eye(3) * 1e-3)
            s.compute()

        warm_solver(3)
        if big_buckets:
            warm_solver(257)  # (512, 1024) bucket

    def warm_async(self) -> None:
        """Run warm_all on a daemon thread so compiles overlap live scan
        processing (jit caches are locked per entry: if the pipeline hits
        a program mid-compile it waits for that compile instead of
        duplicating it). CAUTION: on the tunneled TPU the remote compiler
        serializes requests, so warm compiles queue ahead of lazily-needed
        ones and can stall the pipeline longer than lazy compilation
        (measured 190 s vs 12 s for the loop fine-match program) — prefer
        lazy or synchronous warm_all there; use this where compilation is
        local."""
        import threading

        if getattr(self, "_warm_thread", None) is not None:
            return

        def work():
            try:
                self.warm_all(big_buckets=True)
            except Exception:  # warming is best-effort
                pass

        self._warm_thread = threading.Thread(target=work, daemon=True)
        self._warm_thread.start()

    # -- graph access for visualization / manual closure --------------------
    def _settle_pipe(self) -> None:
        if self._pipe is not None:
            self._pipe.settle()

    def get_graph(self):
        """Nodes + edges for visualization; returns None while the
        VISUALIZING_GRAPH domain is paused (publishGraph's
        `!isPaused(VISUALIZING_GRAPH)` gate,
        slam_toolbox_common.cpp:524)."""
        if self.is_paused(PausedApplication.VISUALIZING_GRAPH):
            return None
        self._settle_pipe()
        return self.mapper.solver.get_graph()

    def localization_buffer_uids(self) -> set:
        """Unique ids of the elastic localization-buffer scans — the
        vertices the assistant renders in a distinct color
        (loop_closure_assistant.cpp:157-273)."""
        return {
            s.unique_id for s in self.mapper.localization_buffer
        }

    def modify_node(self, unique_id: int, pose) -> None:
        self._settle_pipe()
        self.mapper.solver.modify_node(unique_id, pose)

    def manual_loop_closure(self, moved_nodes) -> None:
        """loop_closure_assistant.cpp:276-319: apply manual node moves then
        re-optimize and write back."""
        self._settle_pipe()
        for uid, pose in moved_nodes:
            self.mapper.solver.modify_node(uid, pose)
        self.mapper.graph.correct_poses()

    @property
    def trajectory(self) -> np.ndarray:
        self.flush()
        scans = self.mapper.all_processed_scans()
        if not scans:
            return np.zeros((0, 3))
        return np.stack([s.corrected_pose for s in scans])
