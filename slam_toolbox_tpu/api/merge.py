"""Multi-session map merge.

Re-expression of merge_maps_kinematic.cpp: load N serialized sessions as
submaps, apply a rigid correction transform per submap (interactive in the
reference, programmatic here), rewrite every scan's poses/readings into the
global frame (transformScan, merge_maps_kinematic.cpp:195-248), and
re-rasterize one global occupancy map (:294-310).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from slam_toolbox_tpu.core import geometry
from slam_toolbox_tpu.kernels import occupancy


class MapMerger:
    def __init__(self):
        self.submaps: List[list] = []   # list of scan lists
        self.corrections: List[np.ndarray] = []

    def add_submap(self, snapshot_path: str) -> int:
        """addSubmapCallback (:66-160): deserialize a session; returns the
        submap index."""
        from slam_toolbox_tpu.io.serialization import load_snapshot

        mapper = load_snapshot(snapshot_path)
        scans = mapper.all_processed_scans()
        self.submaps.append(scans)
        self.corrections.append(np.zeros(3))
        return len(self.submaps) - 1

    def add_scans(self, scans: list) -> int:
        self.submaps.append(list(scans))
        self.corrections.append(np.zeros(3))
        return len(self.submaps) - 1

    def set_correction(self, submap_idx: int, transform) -> None:
        """The reference accumulates interactive-marker deltas
        (processInteractiveFeedback :313-374); here the rigid SE(2)
        correction is set directly."""
        self.corrections[submap_idx] = np.asarray(transform, np.float64)

    def merged_scans(self) -> list:
        """Apply each submap's correction to its scans (transformScan)."""
        from slam_toolbox_tpu.core.scan import LocalizedScan

        out = []
        for scans, corr in zip(self.submaps, self.corrections):
            for s in scans:
                t = LocalizedScan(s.laser, s.ranges, s.odom_pose, s.time)
                t.state_id, t.unique_id = s.state_id, s.unique_id
                t.set_corrected_pose(
                    np.asarray(geometry.compose(corr, s.corrected_pose))
                )
                out.append(t)
        return out

    def merge(
        self, resolution: float = 0.05,
        min_pass_through: int = 2, occupancy_threshold: float = 0.1,
    ):
        """mergeMapCallback (:251-291): one global occupancy raster."""
        scans = self.merged_scans()
        return occupancy.create_from_scans(
            scans, resolution, min_pass_through, occupancy_threshold
        )
