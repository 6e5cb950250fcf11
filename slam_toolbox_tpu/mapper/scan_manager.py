"""Per-sensor scan storage: all scans, the running-scan matching window,
and the last processed scan.

Re-expression of ScanManager / MapperSensorManager
(Mapper.cpp:63-458, Mapper.h:1555-1767).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class ScanManager:
    def __init__(self, buffer_size: int, buffer_max_distance: float):
        self.scans: Dict[int, object] = {}
        self.running_scans: List[object] = []
        self.last_scan = None
        self.buffer_size = int(buffer_size)
        self.buffer_max_distance = float(buffer_max_distance)
        self.next_state_id = 0

    def add_scan(self, scan, unique_id: int) -> None:
        scan.state_id = self.next_state_id
        scan.unique_id = unique_id
        self.scans[scan.state_id] = scan
        self.next_state_id += 1

    def add_running_scan(self, scan) -> None:
        """Ring-buffer eviction by count AND front-to-back distance
        (Mapper.cpp:182-204)."""
        self.running_scans.append(scan)
        while len(self.running_scans) > 1:
            front = self.running_scans[0].sensor_pose[:2]
            back = self.running_scans[-1].sensor_pose[:2]
            d = front - back
            sq = d[0] * d[0] + d[1] * d[1]
            if (
                len(self.running_scans) > self.buffer_size
                or sq > self.buffer_max_distance**2 - 1e-6
            ):
                self.running_scans.pop(0)
            else:
                break

    def remove_scan(self, scan) -> None:
        self.scans.pop(scan.state_id, None)
        if scan in self.running_scans:
            self.running_scans.remove(scan)
        if self.last_scan is scan:
            self.last_scan = None


class MapperSensorManager:
    """Multi-sensor map of ScanManagers with a global unique-id registry
    (Mapper.h:1555-1767)."""

    def __init__(self, buffer_size: int, buffer_max_distance: float):
        self.buffer_size = int(buffer_size)
        self.buffer_max_distance = float(buffer_max_distance)
        self.managers: Dict[str, ScanManager] = {}
        self.by_unique_id: Dict[int, object] = {}
        self.next_unique_id = 0

    def _mgr(self, name: str) -> ScanManager:
        if name not in self.managers:
            self.managers[name] = ScanManager(
                self.buffer_size, self.buffer_max_distance
            )
        return self.managers[name]

    def sensor_names(self) -> List[str]:
        return list(self.managers.keys())

    def register_sensor(self, name: str) -> None:
        self._mgr(name)

    def add_scan(self, scan) -> None:
        self._mgr(scan.laser.name).add_scan(scan, self.next_unique_id)
        self.by_unique_id[scan.unique_id] = scan
        self.next_unique_id += 1

    def get_scan(self, name: str, state_id: int):
        return self._mgr(name).scans.get(state_id)

    def get_scan_by_unique_id(self, unique_id: int):
        return self.by_unique_id.get(unique_id)

    def get_scans(self, name: str) -> Dict[int, object]:
        return self._mgr(name).scans

    def get_all_scans(self) -> List[object]:
        out = []
        for m in self.managers.values():
            out.extend(s for _, s in sorted(m.scans.items()))
        return out

    def get_running_scans(self, name: str) -> List[object]:
        return self._mgr(name).running_scans

    def add_running_scan(self, scan) -> None:
        self._mgr(scan.laser.name).add_running_scan(scan)

    def clear_running_scans(self, name: str) -> None:
        self._mgr(name).running_scans = []

    def get_last_scan(self, name: str):
        return self._mgr(name).last_scan

    def set_last_scan(self, scan) -> None:
        self._mgr(scan.laser.name).last_scan = scan

    def clear_last_scan(self, name: str) -> None:
        self._mgr(name).last_scan = None

    def remove_scan(self, scan) -> None:
        self._mgr(scan.laser.name).remove_scan(scan)
        self.by_unique_id.pop(scan.unique_id, None)
