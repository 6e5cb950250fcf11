"""Lifelong mapping: scan-decay node removal to bound graph growth.

Re-expression of LifelongSlamToolbox
(/root/reference/src/experimental/slam_toolbox_lifelong.cpp): overlap
metrics (computeIntersectBounds :373, computeIntersect :404,
computeIntersectOverUnion :417, computeAreaOverlapRatio :437,
computeReadingOverlapRatio :455), the objective score
(computeObjectiveScore :201-253), candidate filtering (computeScores
:294-330) and node removal (:332-344). Metrics are vectorized NumPy —
they operate on scan bounding boxes/barycenters, not rasters.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class LifelongConfig:
    """Defaults from slam_toolbox_lifelong.cpp:49-114."""

    iou_thresh: float = 0.10          # lifelong_minimum_score
    iou_match: float = 0.85           # lifelong_iou_match
    removal_score: float = 0.10       # lifelong_node_removal_score
    overlap_scale: float = 0.06       # lifelong_overlap_score_scale
    constraint_scale: float = 0.08    # lifelong_constraint_multiplier
    nearby_penalty: float = 0.001     # lifelong_nearby_penalty
    candidates_scale: float = 0.03    # lifelong_candidates_scale
    use_tree: bool = False            # lifelong_search_use_tree
    # Steady-state extension (ours — documented in PARITY.md §Known):
    # the reference objective alone does not reach a plateau: a node with
    # >=3 constraints gets a constraint boost that cancels the overlap
    # subtraction, so it decays at only nearby_penalty (0.001) per
    # evaluation — on a 40-lap revisit workload removals ran ~0.2/scan
    # against 1.0 added (round-2 CONFIG3: "not yet plateaued"). When a
    # new scan's redundant-candidate count (already IOU- and
    # constraint-filtered) reaches steady_state_min_candidates, the area
    # is demonstrably over-covered: force-remove the worst-scoring
    # unprotected candidate so removals match additions on revisits
    # (net growth 0 by construction), with one extra removal per scan
    # above 3x the threshold to shrink over-dense regions.
    # DEFAULT 0 (off = exact reference behavior, like every other
    # extension knob): bounding the graph shortens the anchoring
    # horizon, and on drift-heavy workloads closures then re-anchor
    # against recent laps only — CONFIG3.json measures ATE 0.53 m
    # (reference decay, unbounded) vs 1.7 m (bounded) on a 40-lap
    # warehouse, while the low-drift CPU plateau test holds <0.30 m
    # (tests/test_lifelong_plateau.py). Opt in when bounded memory
    # matters more than absolute-frame accuracy.
    steady_state_min_candidates: int = 0
    # redundancy definition for the steady-state query: a node only
    # counts (and is only removable) when it overlaps the current scan
    # this strongly. The reference's iou_thresh (0.10) admits nodes a
    # dozen meters down the aisle — with a range-threshold-sized query
    # radius that made "over-covered" nearly global and decayed a
    # 4-aisle warehouse to ~90 nodes.
    steady_state_min_iou: float = 0.35
    # anchor lattice: before removing a redundant node, keep it FOREVER
    # if no anchor exists within this spacing (m). Recency-only decay
    # converges to the last laps' chains, so every closure re-anchors
    # against ~1-lap-old poses and the global frame random-walks
    # (measured survivors-ATE 1.7 m over 40 warehouse laps); a sparse
    # immortal lattice pins the frame everywhere while the graph stays
    # bounded by AREA, not time. 0 disables.
    steady_state_anchor_spacing: float = 4.0


def _half_extents(scan):
    bb = scan.bounding_box
    return (bb[1] - bb[0]) / 2.0  # (w/2, h/2)


def intersect_bounds(s1, s2):
    """(x_l, x_u, y_l, y_u) of the overlap of barycenter-centered boxes
    (computeIntersectBounds :373-397 — note the reference centers each
    bounding box on the scan *barycenter*, not the box center)."""
    h1, h2 = _half_extents(s1), _half_extents(s2)
    p1, p2 = s1.barycenter[:2], s2.barycenter[:2]
    x_u = min(p1[0] + h1[0], p2[0] + h2[0])
    y_u = min(p1[1] + h1[1], p2[1] + h2[1])
    x_l = max(p1[0] - h1[0], p2[0] - h2[0])
    y_l = max(p1[1] - h1[1], p2[1] - h2[1])
    return x_l, x_u, y_l, y_u


def intersect_area(s1, s2) -> float:
    x_l, x_u, y_l, y_u = intersect_bounds(s1, s2)
    area = (y_u - y_l) * (x_u - x_l)
    return area if area > 0.0 else 0.0


def iou(s1, s2) -> float:
    inter = intersect_area(s1, s2)
    b1 = _half_extents(s1) * 2.0
    b2 = _half_extents(s2) * 2.0
    union = b1[0] * b1[1] + b2[0] * b2[1] - inter
    return inter / union if union > 0 else 0.0


def area_overlap_ratio(ref_scan, candidate) -> float:
    inter = intersect_area(ref_scan, candidate)
    b = _half_extents(candidate) * 2.0
    area = b[0] * b[1]
    return inter / area if area > 0 else 0.0


def reading_overlap_ratio(ref_scan, candidate) -> float:
    pts = candidate.points_world(filtered=True)
    if len(pts) == 0:
        return 0.0
    x_l, x_u, y_l, y_u = intersect_bounds(ref_scan, candidate)
    inner = (
        (pts[:, 0] > x_l) & (pts[:, 0] < x_u)
        & (pts[:, 1] > y_l) & (pts[:, 1] < y_u)
    )
    return float(inner.sum()) / float(len(pts))


def objective_score(
    cfg: LifelongConfig,
    intersect_over_union: float,
    area_overlap: float,
    reading_overlap: float,
    num_constraints: int,
    initial_score: float,
    num_candidates: int,
) -> float:
    """computeObjectiveScore (:201-253)."""
    if intersect_over_union > cfg.iou_match and num_constraints < 3:
        return -1.0
    overlap = cfg.overlap_scale * min(area_overlap, reading_overlap)
    constraint_scale = min(
        1.0, max(0.0, cfg.constraint_scale * (num_constraints - 2))
    )
    constraint_scale = min(constraint_scale, overlap)
    score = (
        initial_score * (1.0 + constraint_scale)
        - overlap
        - cfg.nearby_penalty
    )
    return min(score, 1.0)


class LifelongMapper:
    """Wraps a Mapper with per-scan decay evaluation
    (evaluateNodeDepreciation, :149-178)."""

    def __init__(self, mapper, config: LifelongConfig = None):
        self.mapper = mapper
        self.cfg = config or LifelongConfig()

    @property
    def scores(self):
        """unique_id -> vertex score (Vertex::m_Score); lives on the
        mapper so snapshots persist it across sessions."""
        return self.mapper.vertex_scores

    def process(self, scan, covariance_out=None) -> bool:
        ok = self.mapper.process(scan, covariance_out=covariance_out)
        if ok:
            self.evaluate_node_depreciation(scan)
        return ok

    def evaluate_node_depreciation(self, scan) -> List[int]:
        mapper = self.mapper
        bb = scan.bounding_box
        size = bb[1] - bb[0]
        radius = float(np.hypot(*size) / 2.0)
        if self.cfg.use_tree:
            candidates = mapper.graph.find_nearby_vertices(
                scan.laser.name, scan.barycenter, radius
            )
        else:
            candidates = mapper.graph.find_near_linked_scans(scan, radius)

        # filter: minimum IOU + at least 2 constraints (computeScores)
        filtered = []
        for c in candidates:
            if c is scan:
                continue
            n_con = len(mapper.graph.adjacency.get(c.unique_id, []))
            if iou(scan, c) >= self.cfg.iou_thresh and n_con >= 2:
                filtered.append(c)

        removed = []
        anchors = self._anchor_xy()
        for c in filtered:
            score, protected = self._score(scan, c, len(filtered))
            protected = protected or c.unique_id in anchors
            if not protected and score < self.cfg.removal_score:
                mapper.remove_node_from_graph(c)
                self.scores.pop(c.unique_id, None)
                removed.append(c.unique_id)
            else:
                self.scores[c.unique_id] = score

        # steady-state top-up: in a well-covered area every added scan
        # must be paid for by a removal or the graph grows without bound
        if self.cfg.steady_state_min_candidates > 0:
            removed.extend(self._steady_state_topup(scan, len(removed)))
        return removed

    def _anchor_xy(self):
        if not hasattr(self, "_anchors"):
            self._anchors = {}  # uid -> xy
        return self._anchors

    def _steady_state_topup(self, scan, already_removed: int):
        """Force-remove the most redundant node(s) when the scan's area
        is demonstrably over-covered (PARITY.md §Known).

        Candidates come from a POSITION query over all vertices (the
        graph's vectorized query structure), NOT the linked BFS the
        reference scoring uses: removals thin link connectivity, so a
        BFS-scoped candidate set shrinks toward the trigger threshold
        while spatially-redundant but link-distant nodes become
        unremovable zombies — measured +37 nodes/lap of residual growth
        on a 6-lap loop with the BFS-scoped variant. Ranking prefers the
        lowest stored score, then the highest IOU with the current scan
        (most redundant coverage). The recent window and nodes 0/1 stay
        protected; n_con>=2 is NOT required here — a leaf node is the
        safest possible removal."""
        mapper = self.mapper
        cfg_m = mapper.config
        (scans_q, _, xy, present, _, _) = mapper.graph._query_structure()
        n = len(scans_q)
        if n == 0:
            return []
        bb = scan.bounding_box
        radius = float(np.hypot(*(bb[1] - bb[0])) / 2.0)
        center = scan.reference_pose(cfg_m.use_scan_barycenter)[:2]
        d2 = np.sum((xy[:n] - center) ** 2, axis=1)
        near = np.flatnonzero((d2 <= radius * radius) & (present[:n] > 0))
        buf = cfg_m.scan_buffer_size
        cands = []
        for i in near:
            c = scans_q[i]
            if c is None or c is scan:
                continue
            if (c.unique_id in (0, 1)
                    or scan.unique_id - c.unique_id < buf):
                continue
            v = iou(scan, c)
            if v >= self.cfg.steady_state_min_iou:
                # rank OLDEST-first (then score): lifelong replacement
                # should converge to the recent laps' CONTIGUOUS chains.
                # Age-agnostic max-IOU removal sprinkles holes across
                # every lap, fragmenting the state-id runs the loop
                # sweep needs (chains under the minimum size -> closures
                # starve -> odometry drift never corrected; measured
                # survivors-ATE 3.9 m on the 40-lap warehouse).
                cands.append((self.scores.get(c.unique_id, 1.0),
                              c.unique_id, c))
        f_min = self.cfg.steady_state_min_candidates
        if len(cands) < f_min:
            return []
        want = 1 + (len(cands) >= 3 * f_min) - already_removed
        if want <= 0:
            return []
        cands.sort(key=lambda t: (t[0], t[1]))
        anchors = self._anchor_xy()
        spacing = self.cfg.steady_state_anchor_spacing
        a_xy = (np.stack(list(anchors.values()))
                if anchors else np.zeros((0, 2)))
        out = []
        for _, _, c in cands:
            if len(out) >= want:
                break
            uid = c.unique_id
            if uid in anchors:
                continue  # immortal
            c_xy = np.asarray(c.corrected_pose[:2])
            if spacing > 0 and (
                len(a_xy) == 0
                or np.min(np.sum((a_xy - c_xy) ** 2, axis=1))
                > spacing * spacing
            ):
                # no anchor covers this cell yet: promote a CONTIGUOUS
                # state-id SEGMENT around this node instead of removing
                # it. A lone immortal node is useless — the loop sweep
                # only emits chains of >= loop_match_minimum_chain_size
                # consecutive surviving ids, so frame anchoring needs
                # whole runs (isolated anchors measured ATE 3.2 m, no
                # better than none).
                half = max(
                    2, self.mapper.config.loop_match_minimum_chain_size
                    // 2,
                )
                seg = []
                for du in range(-half, half + 1):
                    s2 = mapper.sensor_manager.get_scan_by_unique_id(
                        uid + du
                    )
                    if s2 is not None:
                        seg.append(s2)
                for s2 in seg:
                    anchors[s2.unique_id] = np.asarray(
                        s2.corrected_pose[:2]
                    )
                a_xy = np.concatenate(
                    [a_xy] + [np.asarray(
                        s2.corrected_pose[:2]
                    )[None] for s2 in seg],
                    axis=0,
                )
                continue
            mapper.remove_node_from_graph(c)
            self.scores.pop(uid, None)
            out.append(uid)
        return out

    def stream_hook(self, scan) -> bool:
        """post_finish hook for the streaming pipeline: run decay after
        each drained scan; True when nodes were removed (device ring must
        resync). Usage:
            sess = SlamSession(cfg, laser, streaming=True)
            ll = LifelongMapper(sess.mapper)
            sess._ensure_pipe().post_finish = ll.stream_hook

        The device ring mirrors only the RUNNING buffer; decay removals
        are protected out of the recent window (id_diff >=
        scan_buffer_size), so they normally don't touch it — resync only
        when one actually did (it would force a refresh + batch re-run
        per drain otherwise, the round-2 steady-state throughput tax)."""
        removed = self.evaluate_node_depreciation(scan)
        if not removed:
            return False
        sm = self.mapper.sensor_manager
        name = scan.laser.name
        running = {s.unique_id for s in sm.get_running_scans(name)}
        last = sm.get_last_scan(name)
        if last is not None:
            running.add(last.unique_id)
        return bool(set(removed) & running)

    def _score(self, ref_scan, candidate, num_candidates):
        """computeScore (:255-292): recent scans and the first two nodes
        are protected. Returns (score, protected)."""
        mapper = self.mapper
        initial = self.scores.get(candidate.unique_id, 1.0)
        critical = candidate.unique_id in (0, 1)
        id_diff = ref_scan.unique_id - candidate.unique_id
        if id_diff < mapper.config.scan_buffer_size or critical:
            return initial, True
        n_con = len(mapper.graph.adjacency.get(candidate.unique_id, []))
        return objective_score(
            self.cfg,
            iou(ref_scan, candidate),
            area_overlap_ratio(ref_scan, candidate),
            reading_overlap_ratio(ref_scan, candidate),
            n_con,
            initial,
            num_candidates,
        ), False
