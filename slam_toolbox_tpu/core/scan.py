"""Sensor model and scan record.

Re-expression of LaserRangeFinder (Karto.h:3874-4369) and LocalizedRangeScan
(Karto.h:5411-5763) as array-first records: a scan is a fixed-width vector of
ranges plus poses; derived world points / barycenter / bounding box are
computed on demand (the reference's dirty-flag Update(), Karto.h:5644-5704).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from slam_toolbox_tpu.core import geometry


@dataclass(frozen=True)
class LaserConfig:
    """Laser intrinsics/extrinsics (LaserRangeFinder, Karto.h:3874-4369)."""

    name: str = "laser0"
    min_range: float = 0.0
    max_range: float = 20.0
    range_threshold: float = 12.0  # readings beyond are truncated for mapping
    min_angle: float = -np.pi
    max_angle: float = np.pi
    angular_resolution: float = 2.0 * np.pi / 360.0
    offset_pose: tuple = (0.0, 0.0, 0.0)  # sensor extrinsics in robot frame
    is_360: bool = True
    # explicit beam-count override (the reference factory sets
    # m_NumberOfRangeReadings directly for some presets, Karto.h:4228-4236)
    beam_count: Optional[int] = None

    @property
    def n_beams(self) -> int:
        if self.beam_count is not None:
            return int(self.beam_count)
        # beam-count calc per LaserRangeFinder::Update (Karto.h:4299-4310)
        return int(
            round((self.max_angle - self.min_angle) / self.angular_resolution)
        ) + 1

    @property
    def beam_angles(self) -> np.ndarray:
        """Beam angles in the sensor frame, (B,)."""
        return self.min_angle + self.angular_resolution * np.arange(
            self.n_beams, dtype=np.float64
        )

    def validate(self, ranges: np.ndarray) -> bool:
        """Scan must carry the expected beam count (Karto.cpp:209-221)."""
        return ranges.shape[-1] == self.n_beams

    # -- vendor presets (CreateLaserRangeFinder factory, Karto.h:4120-4262;
    # range thresholds from the factory's per-model comments) ---------------
    @classmethod
    def sick_lms100(cls, name: str = "Sick LMS 100") -> "LaserConfig":
        return cls(name=name, min_range=0.0, max_range=20.0,
                   range_threshold=18.0,
                   min_angle=np.deg2rad(-135.0), max_angle=np.deg2rad(135.0),
                   angular_resolution=np.deg2rad(0.25), is_360=False)

    @classmethod
    def sick_lms200(cls, name: str = "Sick LMS 200") -> "LaserConfig":
        return cls(name=name, min_range=0.0, max_range=80.0,
                   range_threshold=10.0,
                   min_angle=np.deg2rad(-90.0), max_angle=np.deg2rad(90.0),
                   angular_resolution=np.deg2rad(0.5), is_360=False)

    @classmethod
    def sick_lms291(cls, name: str = "Sick LMS 291") -> "LaserConfig":
        return cls(name=name, min_range=0.0, max_range=80.0,
                   range_threshold=30.0,
                   min_angle=np.deg2rad(-90.0), max_angle=np.deg2rad(90.0),
                   angular_resolution=np.deg2rad(0.5), is_360=False)

    @classmethod
    def hokuyo_utm_30lx(cls, name: str = "Hokuyo UTM-30LX") -> "LaserConfig":
        return cls(name=name, min_range=0.1, max_range=30.0,
                   range_threshold=30.0,
                   min_angle=np.deg2rad(-135.0), max_angle=np.deg2rad(135.0),
                   angular_resolution=np.deg2rad(0.25), is_360=False)

    @classmethod
    def hokuyo_urg_04lx(cls, name: str = "Hokuyo URG-04LX") -> "LaserConfig":
        return cls(name=name, min_range=0.02, max_range=4.0,
                   range_threshold=3.5,
                   min_angle=np.deg2rad(-120.0), max_angle=np.deg2rad(120.0),
                   angular_resolution=np.deg2rad(0.352), is_360=False,
                   beam_count=751)


import functools


@functools.lru_cache(maxsize=64)
def _beam_trig(laser: LaserConfig):
    """(cos, sin) of the beam angles — constant per laser model."""
    a = laser.beam_angles
    return np.cos(a), np.sin(a)


@functools.lru_cache(maxsize=64)
def _offset_np(laser: LaserConfig) -> np.ndarray:
    """The laser extrinsic offset pose as a reusable float64 array."""
    return np.asarray(laser.offset_pose, dtype=np.float64)


class LocalizedScan:
    """A lidar scan with odometric and corrected robot poses.

    Mirrors LocalizedRangeScan (Karto.h:5411-5763): `corrected_pose` is moved
    by the mapper/solver; world points, barycenter, and bounding box derive
    from the corrected sensor pose and are invalidated when it changes.
    """

    __slots__ = (
        "laser", "ranges", "odom_pose", "corrected_pose", "time",
        "state_id", "unique_id", "_points", "_valid", "_barycenter", "_bbox",
        "_fvp", "_dev_local", "_stream_arrays",
        "_local_pts", "_filtered", "_local_bary", "_sensor_pose",
        "_pack_dev", "_pool_slot", "_dev_pose", "__weakref__",
    )

    def __init__(self, laser: LaserConfig, ranges, odom_pose, time: float = 0.0):
        self.laser = laser
        self.ranges = np.asarray(ranges, dtype=np.float64)
        self.odom_pose = np.asarray(odom_pose, dtype=np.float64)
        self.corrected_pose = np.array(self.odom_pose)
        self.time = float(time)
        self.state_id = -1
        self.unique_id = -1
        self._points = None
        self._valid = None
        self._barycenter = None
        self._bbox = None
        self._fvp = None
        self._dev_local = None
        self._stream_arrays = None
        self._local_pts = None
        self._filtered = None
        self._local_bary = None
        self._sensor_pose = None
        self._pack_dev = None
        self._pool_slot = None
        self._dev_pose = None  # sensor pose the device ring believes

    # -- pose accessors (Karto.h:5536-5596) --------------------------------
    @property
    def sensor_pose(self) -> np.ndarray:
        if self._sensor_pose is None:
            self._sensor_pose = np.asarray(geometry.sensor_at(
                self.corrected_pose, _offset_np(self.laser)
            ))
        return self._sensor_pose

    def set_sensor_pose(self, sensor_pose) -> None:
        """Set corrected robot pose from a sensor pose (Karto.h:5551-5558)."""
        self.corrected_pose = np.asarray(
            geometry.corrected_at(
                np.asarray(sensor_pose, dtype=np.float64),
                _offset_np(self.laser),
            )
        )
        self._invalidate()

    def set_corrected_pose(self, pose) -> None:
        self.corrected_pose = np.asarray(pose, dtype=np.float64)
        self._invalidate()

    def sensor_at(self, robot_pose) -> np.ndarray:
        return np.asarray(
            geometry.sensor_at(np.asarray(robot_pose), _offset_np(self.laser))
        )

    def reference_pose(self, use_barycenter: bool) -> np.ndarray:
        return self.barycenter if use_barycenter else self.sensor_pose

    def _invalidate(self) -> None:
        self._points = None
        self._barycenter = None
        self._bbox = None
        self._fvp = None
        self._sensor_pose = None

    # -- derived quantities (the reference's Update(), Karto.h:5644-5704) --
    # ranges are immutable, so everything in the SENSOR frame is cached
    # once per scan; pose changes only invalidate the world-frame caches
    @property
    def local_points(self) -> np.ndarray:
        """(B, 2) beam endpoints in the sensor frame; NaN ranges give NaN."""
        if self._local_pts is None:
            ca, sa = _beam_trig(self.laser)
            self._local_pts = np.stack(
                [self.ranges * ca, self.ranges * sa], axis=-1
            )
        return self._local_pts

    @property
    def finite_mask(self) -> np.ndarray:
        return np.isfinite(self.ranges)

    @property
    def filtered_mask(self) -> np.ndarray:
        """Beams inside [min_range, range_threshold] (Karto.h:5660)."""
        if self._filtered is None:
            self._filtered = (
                np.isfinite(self.ranges)
                & (self.ranges >= self.laser.min_range)
                & (self.ranges <= self.laser.range_threshold)
            )
        return self._filtered

    def points_world(self, filtered: bool = False) -> np.ndarray:
        """(B, 2) world beam endpoints from the corrected sensor pose.

        filtered=False matches GetPointReadings(false): *all* beams project
        (out-of-threshold beams land at their true range) — the matcher
        consumes this unfiltered set (Mapper.cpp:1117, Karto.h:6812).
        """
        if self._points is None:
            sp = self.sensor_pose
            c, s = np.cos(sp[2]), np.sin(sp[2])
            lp = self.local_points
            self._points = np.stack(
                [
                    sp[0] + c * lp[:, 0] - s * lp[:, 1],
                    sp[1] + s * lp[:, 0] + c * lp[:, 1],
                ],
                axis=-1,
            )
        if filtered:
            return self._points[self.filtered_mask]
        return self._points

    @property
    def barycenter(self) -> np.ndarray:
        """Mean of filtered world points as a heading-0 pose (Karto.h:5687).

        The mean commutes with the rigid transform, so it is computed once
        over the (pose-independent) local points and re-projected per pose —
        pose updates (e.g. a whole-graph correction) do not force a full
        world-point recompute for every scan."""
        if self._barycenter is None:
            if self._local_bary is None:
                lp = self.local_points[self.filtered_mask]
                self._local_bary = (
                    lp.mean(axis=0) if len(lp) > 0 else False
                )
            sp = self.sensor_pose
            if self._local_bary is False:
                self._barycenter = np.array(sp)
            else:
                c, s = np.cos(sp[2]), np.sin(sp[2])
                mx, my = self._local_bary
                self._barycenter = np.array([
                    sp[0] + c * mx - s * my,
                    sp[1] + s * mx + c * my,
                    0.0,
                ])
        return self._barycenter

    @property
    def bounding_box(self) -> np.ndarray:
        """[[minx, miny], [maxx, maxy]] over sensor position + filtered points
        (Karto.h:5694-5700)."""
        if self._bbox is None:
            sp = self.sensor_pose[:2]
            pts = self.points_world(filtered=True)
            allp = np.concatenate([sp[None, :], pts], axis=0)
            self._bbox = np.stack([allp.min(axis=0), allp.max(axis=0)])
        return self._bbox


class LocalizedPointScan(LocalizedScan):
    """A scan whose beam endpoints are supplied directly, in the ROBOT
    frame (LocalizedRangeScanWithPoints, Karto.h:5777-5861) — for sensors
    whose driver already outputs cartesian points (e.g. converted point
    clouds with per-point corrections the polar model cannot express).

    Behavioral parity with the reference subclass's Update():
    - world points transform the given points by the CORRECTED ROBOT pose
      (Karto.h:5827-5830) — expressed here by storing the points rotated
      into the sensor frame once, so the base class's
      sensor_pose-composed projection yields the identical world result
      (corrected ∘ offset ∘ offset⁻¹ ∘ p == corrected ∘ p, exactly);
    - non-finite points are carried but excluded (Karto.h:5819-5824);
    - barycenter/bounding box use ALL finite points (no range-threshold
      filtering, unlike the base class: Karto.h:5838-5855) — overridden
      via filtered_mask.
    """

    __slots__ = ("robot_points",)

    def __init__(self, laser: LaserConfig, ranges, robot_points,
                 odom_pose, time: float = 0.0):
        super().__init__(laser, ranges, odom_pose, time=time)
        pts = np.asarray(robot_points, dtype=np.float64)
        if pts.shape != (laser.n_beams, 2):
            raise ValueError(
                f"robot_points must be ({laser.n_beams}, 2), got {pts.shape}"
            )
        self.robot_points = pts
        # rotate into the sensor frame: local = R(-oh) @ (p - ot)
        ox, oy, oh = _offset_np(laser)
        c, s = np.cos(oh), np.sin(oh)
        dx = pts[:, 0] - ox
        dy = pts[:, 1] - oy
        self._local_pts = np.stack(
            [c * dx + s * dy, -s * dx + c * dy], axis=-1
        )
        # Reconcile ranges with point finiteness so every downstream
        # validity mask (matcher/raster paths key off isfinite(ranges))
        # agrees with the reference's point-driven rule: WithPoints
        # Update() excludes non-finite POINTS regardless of range
        # (Karto.h:5819-5824) and admits finite points regardless of the
        # reported range. Without this, a finite range + non-finite point
        # injected a spurious (0,0) sensor-origin point into rasters.
        pt_ok = np.all(np.isfinite(self._local_pts), axis=1)
        r = np.where(pt_ok, self.ranges, np.nan)
        synth = pt_ok & ~np.isfinite(r)
        if synth.any():
            r = np.where(
                synth, np.hypot(self._local_pts[:, 0],
                                self._local_pts[:, 1]), r
            )
        self.ranges = r

    @property
    def filtered_mask(self) -> np.ndarray:
        """All finite points participate in barycenter/bbox — the
        WithPoints Update() applies no range filtering (Karto.h:5813)."""
        if self._filtered is None:
            self._filtered = np.all(np.isfinite(self.robot_points), axis=1)
        return self._filtered
