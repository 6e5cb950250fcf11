"""Pipeline-level NumPy oracle: an independent, loop-based re-implementation
of the reference's full synchronous mapping pipeline, used to cross-check the
engine's *trajectory* (VERDICT r4 next #2).

Scope (reference semantics, straight from the sources):
  - Mapper::Process            (Mapper.cpp:2679-2749)
  - HasMovedEnough             (Mapper.cpp:3110-3141)
  - ScanMatcher::MatchScan / CorrelateScan / GetResponse / AddScan(s) /
    FindValidPoints / Compute{Positional,Angular}Covariance
                               (Mapper.cpp:477-1208)
  - CorrelationGrid smear      (Mapper.h:1074-1314)
  - ScanManager::AddRunningScan(Mapper.cpp:178-205)
  - MapperGraph::AddEdges / LinkScans / LinkChainToScan / FindNearChains /
    FindNearLinkedScans / ComputeWeightedMean / TryCloseLoop /
    FindPossibleLoopClosure / CorrectPoses
                               (Mapper.cpp:1434-2030)
  - the Ceres residual/gauge   (ceres_utils.h:74-121, ceres_solver.cpp)

Implementation rules: plain NumPy + SciPy only — no JAX, no Pallas, no code
from slam_toolbox_tpu.kernels / .mapper / .graph / .solver. The smear is a
per-point max-stamp (not the engine's separable max-times dilation), the
response is a direct per-angle gather-sum (not the engine's batched window
kernel), and the solver is a plain Gauss-Newton on scipy.sparse (not the
engine's LM tiers) — so an engine-level semantic drift that moves the
trajectory cannot be hidden by sharing kernels.

Deviations from the raw C++ (shared with the engine, PARITY.md §Known):
  - response lookups use 2-D bounds checks instead of the reference's
    flattened-index check (which wraps rows at grid edges);
  - grid/world conversions use round-half-away-from-zero exactly like
    karto::math::Round.
"""
from __future__ import annotations

import math

import numpy as np

KT_TOLERANCE = 1e-6
MAX_VARIANCE = 500.0
DISTANCE_PENALTY_GAIN = 0.2
ANGLE_PENALTY_GAIN = 0.2


# --------------------------------------------------------------------------
# SE(2) helpers (Karto.h:2963-3025, 5551-5586)
# --------------------------------------------------------------------------

def norm_ang(a):
    return math.atan2(math.sin(a), math.cos(a))


def rha(x):
    """Round half away from zero (karto::math::Round, Math.h:87-90)."""
    return np.where(np.asarray(x) >= 0, np.floor(np.asarray(x) + 0.5),
                    np.ceil(np.asarray(x) - 0.5))


def transform_pose(p1, p2, p):
    """Transform(p1, p2).TransformPose(p)."""
    dh = p2[2] - p1[2]
    c, s = math.cos(dh), math.sin(dh)
    tx = p2[0] - (c * p1[0] - s * p1[1])
    ty = p2[1] - (s * p1[0] + c * p1[1])
    return np.array([
        tx + c * p[0] - s * p[1],
        ty + s * p[0] + c * p[1],
        norm_ang(p[2] + dh),
    ])


def sensor_at(robot_pose, offset):
    c, s = math.cos(robot_pose[2]), math.sin(robot_pose[2])
    return np.array([
        robot_pose[0] + c * offset[0] - s * offset[1],
        robot_pose[1] + s * offset[0] + c * offset[1],
        norm_ang(robot_pose[2] + offset[2]),
    ])


def corrected_at(sensor_pose, offset):
    """Karto.h:5574-5586 (360-lidar frame fix)."""
    ox, oy, oh = offset
    length = math.hypot(ox, oy)
    alpha = math.atan2(oy, ox)
    hs = norm_ang(sensor_pose[2])
    a = hs + alpha - oh
    return np.array([
        sensor_pose[0] - length * math.cos(a),
        sensor_pose[1] - length * math.sin(a),
        norm_ang(sensor_pose[2] - oh),
    ])


def rel_pose(p1, p2):
    """Pose of p2 in the frame of p1 (LinkInfo pose difference)."""
    c, s = math.cos(p1[2]), math.sin(p1[2])
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    return np.array([
        c * dx + s * dy, -s * dx + c * dy, norm_ang(p2[2] - p1[2]),
    ])


def rot_cov(cov, theta):
    c, s = math.cos(theta), math.sin(theta)
    r = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return r @ cov @ r.T


# --------------------------------------------------------------------------
# Scan record (LocalizedRangeScan, Karto.h:5411-5763)
# --------------------------------------------------------------------------

class OScan:
    def __init__(self, laser, ranges, odom_pose, time):
        self.laser = laser
        self.ranges = np.asarray(ranges, np.float64)
        self.odom_pose = np.asarray(odom_pose, np.float64)
        self.corrected = np.array(self.odom_pose)
        self.time = float(time)
        self.state_id = -1
        self.unique_id = -1
        a = (laser.min_angle
             + laser.angular_resolution * np.arange(laser.n_beams))
        self._local = np.stack(
            [self.ranges * np.cos(a), self.ranges * np.sin(a)], axis=-1
        )
        self._filtered = (np.isfinite(self.ranges)
                          & (self.ranges >= laser.min_range)
                          & (self.ranges <= laser.range_threshold))
        self._world = None
        self._bary = None

    @property
    def sensor_pose(self):
        return sensor_at(self.corrected, self.laser.offset_pose)

    def set_sensor_pose(self, sp):
        self.corrected = corrected_at(np.asarray(sp, np.float64),
                                      self.laser.offset_pose)
        self._world = None
        self._bary = None

    def set_corrected(self, p):
        self.corrected = np.asarray(p, np.float64)
        self._world = None
        self._bary = None

    def world_points(self):
        """All beams at the corrected sensor pose (GetPointReadings(false),
        the matcher's input set — Mapper.cpp:1117)."""
        if self._world is None:
            sp = self.sensor_pose
            c, s = math.cos(sp[2]), math.sin(sp[2])
            lp = self._local
            self._world = np.stack([
                sp[0] + c * lp[:, 0] - s * lp[:, 1],
                sp[1] + s * lp[:, 0] + c * lp[:, 1],
            ], axis=-1)
        return self._world

    def barycenter(self):
        """Mean of filtered world points (Karto.h:5687)."""
        if self._bary is None:
            w = self.world_points()[self._filtered]
            if len(w) == 0:
                self._bary = np.array(self.sensor_pose)
            else:
                m = w.mean(axis=0)
                self._bary = np.array([m[0], m[1], 0.0])
        return self._bary

    def reference_pose(self, use_bc):
        return self.barycenter() if use_bc else self.sensor_pose


# --------------------------------------------------------------------------
# Scan matcher (ScanMatcher, Mapper.cpp:477-1208)
# --------------------------------------------------------------------------

class OracleMatcher:
    def __init__(self, cfg, laser, search_size, resolution, smear_dev):
        self.cfg = cfg
        self.laser = laser
        self.res = float(resolution)
        self.scale = 1.0 / self.res
        # ScanMatcher::Create (Mapper.cpp:495-510)
        self.side = int(rha(search_size / resolution)) + 1
        margin = int(math.ceil(laser.range_threshold / resolution))
        self.G = self.side + 2 * margin
        # CorrelationGrid::CalculateKernel (Mapper.h:1236-1280)
        self.hk = int(math.floor(2.0 * smear_dev / resolution + 0.5))
        k = np.zeros((2 * self.hk + 1, 2 * self.hk + 1), np.int32)
        for j in range(-self.hk, self.hk + 1):
            for i in range(-self.hk, self.hk + 1):
                d = math.hypot(i * self.res, j * self.res)
                z = math.exp(-0.5 * (d / smear_dev) ** 2)
                k[j + self.hk, i + self.hk] = int(rha(z * 100.0))
        self.kernel = k
        self.grid = np.zeros((self.G, self.G), np.int32)
        self.grid_offset = np.zeros(2)

    # -- grid building -----------------------------------------------------
    def _find_valid_points(self, world_pts, viewpoint):
        """FindValidPoints (Mapper.cpp:1113-1164), direct translation."""
        valid = np.zeros(len(world_pts), bool)
        first = None
        trailing = 0
        for i in range(len(world_pts)):
            cur = world_pts[i]
            if first is None and np.isfinite(cur).all():
                first = cur
            if first is None:
                continue
            d = first - cur
            if d[0] * d[0] + d[1] * d[1] > 0.01:
                a = viewpoint[1] - first[1]
                b = first[0] - viewpoint[0]
                c = first[1] * viewpoint[0] - first[0] * viewpoint[1]
                ss = cur[0] * a + cur[1] * b + c
                first = cur
                if ss < 0.0:
                    trailing = i
                else:
                    valid[trailing:i] = True
                    trailing = i
        return valid

    def add_scans(self, base_scans, viewpoint, grid_offset):
        """AddScans + AddScan + SmearPoint (Mapper.cpp:1032-1105)."""
        self.grid[:] = 0
        self.grid_offset = np.asarray(grid_offset, np.float64)
        hk = self.hk
        for s in base_scans:
            w = s.world_points()
            valid = self._find_valid_points(w, viewpoint)
            # a flushed run can contain non-finite beams (the reference
            # pushes them; their grid cast lands out of bounds) — drop
            # them explicitly here
            idx = np.flatnonzero(valid & np.isfinite(w).all(axis=1))
            gx = rha((w[idx, 0] - grid_offset[0]) * self.scale).astype(int)
            gy = rha((w[idx, 1] - grid_offset[1]) * self.scale).astype(int)
            for x, y in zip(gx, gy):
                if not (0 <= x < self.G and 0 <= y < self.G):
                    continue
                if self.grid[y, x] == 100:
                    continue
                self.grid[y, x] = 100
                if hk == 0:
                    continue
                y0, y1 = max(y - hk, 0), min(y + hk + 1, self.G)
                x0, x1 = max(x - hk, 0), min(x + hk + 1, self.G)
                ky0, kx0 = y0 - (y - hk), x0 - (x - hk)
                blk = self.grid[y0:y1, x0:x1]
                ker = self.kernel[ky0:ky0 + (y1 - y0),
                                  kx0:kx0 + (x1 - x0)]
                np.maximum(blk, ker, out=blk)
        # re-mark occupied (the smear never lowers 100, so nothing needed)

    # -- correlation -------------------------------------------------------
    def _correlate(self, scan, center, soffset, sres, aoffset, ares,
                   penalize, fine, cov_out):
        """CorrelateScan (Mapper.cpp:712-862), vectorized per angle."""
        B = self.laser.n_beams
        lp = scan._local
        finite = np.isfinite(scan.ranges)
        nX = int(rha(soffset[0] * 2.0 / sres[0])) + 1
        nY = int(rha(soffset[1] * 2.0 / sres[1])) + 1
        nA = int(rha(aoffset * 2.0 / ares)) + 1
        xs = -soffset[0] + np.arange(nX) * sres[0]
        ys = -soffset[1] + np.arange(nY) * sres[1]
        angs = (center[2] - aoffset) + np.arange(nA) * ares
        # grid coordinates of each search position
        cx = rha((center[0] + xs - self.grid_offset[0]) * self.scale
                 ).astype(int)
        cy = rha((center[1] + ys - self.grid_offset[1]) * self.scale
                 ).astype(int)
        resp = np.zeros((nA, nY, nX))
        gridf = self.grid.reshape(-1)
        fin_idx = np.flatnonzero(finite)
        lpf = lp[fin_idx]
        for ai, ang in enumerate(angs):
            c, s = math.cos(ang), math.sin(ang)
            dx = rha((c * lpf[:, 0] - s * lpf[:, 1]) * self.scale
                     ).astype(int)
            dy = rha((s * lpf[:, 0] + c * lpf[:, 1]) * self.scale
                     ).astype(int)
            gx = dx[:, None, None] + cx[None, None, :]   # (Bf, 1, nX)
            gy = dy[:, None, None] + cy[None, :, None]   # (Bf, nY, 1)
            ok = ((gx >= 0) & (gx < self.G) & (gy >= 0) & (gy < self.G))
            flat = np.where(ok, gy * self.G + gx, 0)
            vals = gridf[flat] * ok
            resp[ai] = vals.sum(axis=0) / (B * 100.0)
        if penalize:
            sqd = xs[None, None, :] ** 2 + ys[None, :, None] ** 2
            dp = np.maximum(
                1.0 - DISTANCE_PENALTY_GAIN * sqd
                / self.cfg.distance_variance_penalty,
                self.cfg.minimum_distance_penalty,
            )
            sqa = (angs - center[2]) ** 2
            ap = np.maximum(
                1.0 - ANGLE_PENALTY_GAIN * sqa
                / self.cfg.angle_variance_penalty,
                self.cfg.minimum_angle_penalty,
            )
            pen = dp * ap[:, None, None]
            resp = np.where(np.abs(resp) > KT_TOLERANCE, resp * pen, resp)

        best = resp.max()
        tie = np.abs(resp - best) < KT_TOLERANCE
        ati, yti, xti = np.nonzero(tie)
        mean = np.array([
            (center[0] + xs[xti]).mean(),
            (center[1] + ys[yti]).mean(),
            math.atan2(np.sin(angs[ati]).mean(), np.cos(angs[ati]).mean()),
        ])
        if not fine:
            self._positional_cov(resp, mean, center, xs, ys, sres, ares,
                                 best, cov_out)
        else:
            self._angular_cov(resp, mean, center, xs, ys, angs, ares,
                              best, cov_out)
        return min(best, 1.0), mean

    def _positional_cov(self, resp, best_pose, center, xs, ys, sres, ares,
                        best, cov):
        """ComputePositionalCovariance (Mapper.cpp:874-966). The search
        space probs grid = max response over angles per position."""
        cov[:] = np.eye(3)
        if best < KT_TOLERANCE:
            cov[0, 0] = MAX_VARIANCE
            cov[1, 1] = MAX_VARIANCE
            cov[2, 2] = 4.0 * ares * ares
            return
        probs = resp.max(axis=0)   # (nY, nX)
        dx = best_pose[0] - center[0]
        dy = best_pose[1] - center[1]
        keep = probs >= best - 0.1
        norm = probs[keep].sum()
        X = xs[None, :] - dx
        Y = ys[:, None] - dy
        vxx = (X * X * probs)[keep].sum()
        vxy = (X * Y * probs)[keep].sum()
        vyy = (Y * Y * probs)[keep].sum()
        if norm > KT_TOLERANCE:
            vxx = max(vxx / norm, 0.1 * sres[0] ** 2)
            vyy = max(vyy / norm, 0.1 * sres[1] ** 2)
            mult = 1.0 / best
            cov[0, 0] = vxx * mult
            cov[0, 1] = cov[1, 0] = (vxy / norm) * mult
            cov[1, 1] = vyy * mult
            cov[2, 2] = 4.0 * ares * ares
        if abs(cov[0, 0]) < KT_TOLERANCE:
            cov[0, 0] = MAX_VARIANCE
        if abs(cov[1, 1]) < KT_TOLERANCE:
            cov[1, 1] = MAX_VARIANCE

    def _angular_cov(self, resp, best_pose, center, xs, ys, angs, ares,
                     best, cov):
        """ComputeAngularCovariance (Mapper.cpp:977-1025): responses at
        the best POSITION across the fine angles. The reference re-reads
        GetResponse at the best pose's grid cell; the fine search
        positions are grid-cell-spaced, so the nearest search position is
        that cell."""
        best_angle = norm_ang(best_pose[2] - center[2]) + center[2]
        xi = int(np.argmin(np.abs(center[0] + xs - best_pose[0])))
        yi = int(np.argmin(np.abs(center[1] + ys - best_pose[1])))
        col = resp[:, yi, xi]
        keep = col >= best - 0.1
        norm = col[keep].sum()
        acc = ((angs - best_angle) ** 2 * col)[keep].sum()
        if norm > KT_TOLERANCE:
            if acc < KT_TOLERANCE:
                acc = ares * ares
            acc /= norm
        else:
            acc = 1000.0 * ares * ares
        cov[2, 2] = acc

    def match(self, scan, base_scans, penalize=True, refine=True):
        """MatchScan (Mapper.cpp:535-639)."""
        cov = np.eye(3)
        scan_pose = scan.sensor_pose
        if len(base_scans) == 0 or not np.isfinite(scan.ranges).any():
            cov[0, 0] = MAX_VARIANCE
            cov[1, 1] = MAX_VARIANCE
            cov[2, 2] = 4.0 * self.cfg.coarse_angle_resolution ** 2
            return 0.0, np.array(scan_pose), cov
        offset = scan_pose[:2] - 0.5 * (self.G - 1) * self.res
        self.add_scans(base_scans, scan_pose[:2], offset)
        coarse_off = 0.5 * (self.side - 1) * self.res
        coarse_res = 2.0 * self.res
        best, mean = self._correlate(
            scan, scan_pose, (coarse_off, coarse_off),
            (coarse_res, coarse_res),
            self.cfg.coarse_search_angle_offset,
            self.cfg.coarse_angle_resolution,
            penalize, False, cov,
        )
        if self.cfg.use_response_expansion and abs(best) < KT_TOLERANCE:
            new_off = self.cfg.coarse_search_angle_offset
            for _ in range(3):
                new_off += math.radians(20.0)
                best, mean = self._correlate(
                    scan, scan_pose, (coarse_off, coarse_off),
                    (coarse_res, coarse_res), new_off,
                    self.cfg.coarse_angle_resolution,
                    penalize, False, cov,
                )
                if abs(best) >= KT_TOLERANCE:
                    break
        if refine:
            fine_off = coarse_res * 0.5
            best, mean = self._correlate(
                scan, mean, (fine_off, fine_off), (self.res, self.res),
                0.5 * self.cfg.coarse_angle_resolution,
                self.cfg.fine_search_angle_offset,
                penalize, True, cov,
            )
        return best, mean, cov


# --------------------------------------------------------------------------
# Pose-graph solver (ceres analog): Gauss-Newton on scipy.sparse
# --------------------------------------------------------------------------

class OracleSolver:
    def __init__(self):
        self.ids = []
        self.id_to_idx = {}
        self.poses = []
        self.edges = {}   # (id1, id2) -> (rel (3,), sqrt_info (3,3))

    def add_node(self, nid, pose):
        if nid in self.id_to_idx:
            return
        self.id_to_idx[nid] = len(self.ids)
        self.ids.append(nid)
        self.poses.append(np.array(pose, np.float64))

    def add_constraint(self, id1, id2, rel, cov):
        if (id2, id1) in self.edges or (id1, id2) in self.edges:
            return
        info = np.linalg.inv(cov)
        info = 0.5 * (info + info.T)
        sqrt_info = np.linalg.cholesky(info).T
        self.edges[(id1, id2)] = (np.array(rel), sqrt_info)

    def compute(self):
        """Gauss-Newton with the ceres residual, first node fixed
        (ceres_solver.cpp:317-336 gauge)."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        n = len(self.ids)
        if n < 2 or not self.edges:
            return
        x = np.stack(self.poses)
        for _ in range(60):
            rows, cols, vals = [], [], []
            rhs = np.zeros(3 * n)
            for (a, b), (rel, sq) in self.edges.items():
                ia, ib = self.id_to_idx[a], self.id_to_idx[b]
                pa, pb = x[ia], x[ib]
                ca, sa = math.cos(pa[2]), math.sin(pa[2])
                dxy = pb[:2] - pa[:2]
                r = np.empty(3)
                r[0] = ca * dxy[0] + sa * dxy[1] - rel[0]
                r[1] = -sa * dxy[0] + ca * dxy[1] - rel[1]
                r[2] = norm_ang(pb[2] - pa[2] - rel[2])
                # jacobians wrt pa (x,y,h) and pb
                Ja = np.array([
                    [-ca, -sa, -sa * dxy[0] + ca * dxy[1]],
                    [sa, -ca, -ca * dxy[0] - sa * dxy[1]],
                    [0.0, 0.0, -1.0],
                ])
                Jb = np.array([
                    [ca, sa, 0.0],
                    [-sa, ca, 0.0],
                    [0.0, 0.0, 1.0],
                ])
                wr = sq @ r
                wJa = sq @ Ja
                wJb = sq @ Jb
                for (bi, bj, blk) in (
                    (ia, ia, wJa.T @ wJa), (ia, ib, wJa.T @ wJb),
                    (ib, ia, wJb.T @ wJa), (ib, ib, wJb.T @ wJb),
                ):
                    for i in range(3):
                        for j in range(3):
                            rows.append(3 * bi + i)
                            cols.append(3 * bj + j)
                            vals.append(blk[i, j])
                rhs[3 * ia:3 * ia + 3] -= wJa.T @ wr
                rhs[3 * ib:3 * ib + 3] -= wJb.T @ wr
            H = sp.coo_matrix(
                (vals, (rows, cols)), shape=(3 * n, 3 * n)
            ).tolil()
            # gauge: fix node 0 (identity rows, zeroed rhs)
            for i in (0, 1, 2):
                H.rows[i] = [i]
                H.data[i] = [1.0]
                rhs[i] = 0.0
            dx = spla.spsolve(
                H.tocsc() + 1e-9 * sp.eye(3 * n), rhs
            )
            x = x + dx.reshape(n, 3)
            if np.max(np.abs(dx)) < 1e-8:
                break
        for i in range(n):
            x[i, 2] = norm_ang(x[i, 2])
        self.poses = [x[i].copy() for i in range(n)]

    def get_corrections(self):
        return list(zip(self.ids, self.poses))


# --------------------------------------------------------------------------
# The mapper (Mapper::Process + MapperGraph)
# --------------------------------------------------------------------------

class OracleMapper:
    def __init__(self, cfg, laser):
        self.cfg = cfg
        self.laser = laser
        self.seq = OracleMatcher(
            cfg, laser, cfg.correlation_search_space_dimension,
            cfg.correlation_search_space_resolution,
            cfg.correlation_search_space_smear_deviation,
        )
        self.loop = OracleMatcher(
            cfg, laser, cfg.loop_search_space_dimension,
            cfg.loop_search_space_resolution,
            cfg.loop_search_space_smear_deviation,
        )
        self.scans = {}       # state_id -> OScan
        self.running = []
        self.last = None
        self.next_id = 0
        self.solver = OracleSolver()
        self.adjacency = {}   # unique_id -> set of neighbor unique_ids
        self.edge_set = set()
        self.n_loop_closures = 0
        self._by_uid = {}

    # -- scan manager ------------------------------------------------------
    def _add_running(self, scan):
        """ScanManager::AddRunningScan (Mapper.cpp:178-205)."""
        self.running.append(scan)
        while True:
            f = self.running[0].sensor_pose
            b = self.running[-1].sensor_pose
            d2 = (f[0] - b[0]) ** 2 + (f[1] - b[1]) ** 2
            if (len(self.running) > self.cfg.scan_buffer_size
                    or d2 > self.cfg.scan_buffer_maximum_scan_distance ** 2
                    - KT_TOLERANCE):
                self.running.pop(0)
            else:
                break

    def has_moved_enough(self, scan, last):
        if last is None:
            return True
        if scan.time - last.time >= self.cfg.minimum_time_interval:
            return True
        p1 = sensor_at(last.odom_pose, self.laser.offset_pose)
        p2 = sensor_at(scan.odom_pose, self.laser.offset_pose)
        if abs(norm_ang(p2[2] - p1[2])) >= self.cfg.minimum_travel_heading:
            return True
        d2 = (p1[0] - p2[0]) ** 2 + (p1[1] - p2[1]) ** 2
        return d2 >= self.cfg.minimum_travel_distance ** 2 - KT_TOLERANCE

    # -- graph helpers -----------------------------------------------------
    def _link_scans(self, sfrom, sto, mean_sensor_pose, cov):
        key = (sfrom.unique_id, sto.unique_id)
        if key in self.edge_set or key[::-1] in self.edge_set:
            return
        self.edge_set.add(key)
        self.adjacency.setdefault(sfrom.unique_id, set()).add(
            sto.unique_id)
        self.adjacency.setdefault(sto.unique_id, set()).add(
            sfrom.unique_id)
        p1 = sfrom.corrected
        p2 = corrected_at(np.asarray(mean_sensor_pose),
                          sto.laser.offset_pose)
        self.solver.add_constraint(
            sfrom.unique_id, sto.unique_id, rel_pose(p1, p2),
            rot_cov(cov, -p1[2]),
        )

    def _closest_scan(self, chain, pose):
        best, bd = None, np.inf
        for s in chain:
            sp = s.reference_pose(self.cfg.use_scan_barycenter)
            d = (pose[0] - sp[0]) ** 2 + (pose[1] - sp[1]) ** 2
            if d < bd:
                bd, best = d, s
        return best

    def _link_chain_to_scan(self, chain, scan, mean, cov):
        pose = scan.reference_pose(self.cfg.use_scan_barycenter)
        closest = self._closest_scan(chain, pose)
        cp = closest.reference_pose(self.cfg.use_scan_barycenter)
        d2 = (pose[0] - cp[0]) ** 2 + (pose[1] - cp[1]) ** 2
        if d2 < self.cfg.link_scan_maximum_distance ** 2 + KT_TOLERANCE:
            self._link_scans(closest, scan, mean, cov)

    def _find_near_linked(self, scan, max_distance):
        """BFS through adjacency, distance-gated (Mapper.cpp:1311-1348)."""
        by_uid = {s.unique_id: s for s in self.scans.values()}
        center = scan.reference_pose(self.cfg.use_scan_barycenter)[:2]
        max_sq = max_distance * max_distance - KT_TOLERANCE
        seen = {scan.unique_id}
        out = []
        queue = [scan]
        while queue:
            s = queue.pop(0)
            p = s.reference_pose(self.cfg.use_scan_barycenter)[:2]
            if (p[0] - center[0]) ** 2 + (p[1] - center[1]) ** 2 <= max_sq:
                out.append(s)
                for nb in sorted(self.adjacency.get(s.unique_id, ())):
                    if nb not in seen and nb in by_uid:
                        seen.add(nb)
                        queue.append(by_uid[nb])
        return out

    def _find_near_chains(self, scan):
        """FindNearChains (Mapper.cpp:1683-1793)."""
        cfg = self.cfg
        scan_pose = scan.reference_pose(cfg.use_scan_barycenter)
        max_sq = cfg.link_scan_maximum_distance ** 2 + KT_TOLERANCE
        chains = []
        processed = set()
        for near in self._find_near_linked(
                scan, cfg.link_scan_maximum_distance):
            if near is scan or near.unique_id in processed:
                continue
            processed.add(near.unique_id)
            ok = True
            chain = []
            for sid in range(near.state_id - 1, -1, -1):
                cand = self.scans.get(sid)
                if cand is scan:
                    ok = False
                if cand is None:
                    continue
                cp = cand.reference_pose(cfg.use_scan_barycenter)
                d2 = ((scan_pose[0] - cp[0]) ** 2
                      + (scan_pose[1] - cp[1]) ** 2)
                if d2 < max_sq:
                    chain.insert(0, cand)
                    processed.add(cand.unique_id)
                else:
                    break
            chain.append(near)
            for sid in range(near.state_id + 1, self.next_id):
                cand = self.scans.get(sid)
                if cand is scan:
                    ok = False
                if cand is None:
                    continue
                cp = cand.reference_pose(cfg.use_scan_barycenter)
                d2 = ((scan_pose[0] - cp[0]) ** 2
                      + (scan_pose[1] - cp[1]) ** 2)
                if d2 < max_sq:
                    chain.append(cand)
                    processed.add(cand.unique_id)
                else:
                    break
            if ok:
                chains.append(chain)
        return chains

    def _weighted_mean(self, means, covs):
        """ComputeWeightedMean (Mapper.cpp:1914-1958)."""
        inverses = [np.linalg.inv(c) for c in covs]
        inv_sum = np.linalg.inv(np.sum(inverses, axis=0))
        acc = np.zeros(3)
        tx = ty = 0.0
        for m, inv in zip(means, inverses):
            tx += math.cos(m[2])
            ty += math.sin(m[2])
            w = inv_sum @ inv
            acc += w @ m
        return np.array([acc[0], acc[1],
                         math.atan2(ty / len(means), tx / len(means))])

    def _add_edges(self, scan, cov):
        """MapperGraph::AddEdges (Mapper.cpp:1434-1498)."""
        cfg = self.cfg
        means, covs = [], []
        if self.last is not None:
            prev = self.scans.get(scan.state_id - 1)
            if prev is None:
                return
            self._link_scans(prev, scan, scan.sensor_pose, cov)
            sp = scan.sensor_pose
            means.append(np.array(sp))
            covs.append(np.array(cov))
            self._link_chain_to_scan(list(self.running), scan, sp, cov)
        # near chains
        for chain in self._find_near_chains(scan):
            if len(chain) < cfg.loop_match_minimum_chain_size:
                continue
            resp, mean, ccov = self.seq.match(scan, chain, penalize=False)
            if resp > cfg.link_match_minimum_response_fine - KT_TOLERANCE:
                means.append(mean)
                covs.append(ccov)
                self._link_chain_to_scan(chain, scan, mean, ccov)
        if means:
            scan.set_sensor_pose(self._weighted_mean(means, covs))

    def _find_possible_loop(self, scan, start):
        """FindPossibleLoopClosure (Mapper.cpp:1960-2010)."""
        cfg = self.cfg
        pose = scan.reference_pose(cfg.use_scan_barycenter)
        near = {s.unique_id for s in self._find_near_linked(
            scan, cfg.loop_search_maximum_distance)}
        chain = []
        while start < self.next_id:
            cand = self.scans.get(start)
            start += 1
            if cand is None:
                continue
            cp = cand.reference_pose(cfg.use_scan_barycenter)
            d2 = (cp[0] - pose[0]) ** 2 + (cp[1] - pose[1]) ** 2
            if d2 < cfg.loop_search_maximum_distance ** 2 + KT_TOLERANCE:
                if cand.unique_id in near:
                    chain = []
                else:
                    chain.append(cand)
            else:
                if len(chain) >= cfg.loop_match_minimum_chain_size:
                    return chain, start
                chain = []
        # trailing chain: returned WITHOUT the min-size check, exactly
        # like the reference (Mapper.cpp:2008 returns whatever remains)
        return chain, start

    def _try_close_loop(self, scan):
        """TryCloseLoop (Mapper.cpp:1500-1561)."""
        cfg = self.cfg
        closed = False
        start = 0
        while True:
            chain, start = self._find_possible_loop(scan, start)
            if not chain:
                break
            coarse, bpose, ccov = self.loop.match(
                scan, chain, penalize=False, refine=False)
            if (coarse > cfg.loop_match_minimum_response_coarse
                    and ccov[0, 0] < cfg.loop_match_maximum_variance_coarse
                    and ccov[1, 1]
                    < cfg.loop_match_maximum_variance_coarse):
                tmp = OScan(self.laser, scan.ranges, scan.odom_pose,
                            scan.time)
                tmp.state_id = scan.state_id
                tmp.unique_id = scan.unique_id
                tmp.set_corrected(scan.corrected)
                tmp.set_sensor_pose(bpose)
                fine, fpose, fcov = self.seq.match(
                    tmp, chain, penalize=False)
                if fine >= cfg.loop_match_minimum_response_fine:
                    scan.set_sensor_pose(fpose)
                    self._link_chain_to_scan(chain, scan, fpose, fcov)
                    self._correct_poses()
                    self.n_loop_closures += 1
                    closed = True
        return closed

    def _correct_poses(self):
        self.solver.compute()
        for uid, pose in self.solver.get_corrections():
            s = self._by_uid.get(uid)
            if s is not None:
                s.set_corrected(pose)

    # -- Process (Mapper.cpp:2679-2749) ------------------------------------
    def process(self, ranges, odom_pose, time):
        scan = OScan(self.laser, ranges, odom_pose, time)
        last = self.last
        if last is not None:
            scan.set_corrected(transform_pose(
                last.odom_pose, last.corrected, scan.odom_pose))
        if not self.has_moved_enough(scan, last):
            return None
        cov = np.eye(3)
        if self.cfg.use_scan_matching and last is not None:
            resp, mean, cov = self.seq.match(scan, list(self.running))
            scan.set_sensor_pose(mean)
        scan.state_id = self.next_id
        scan.unique_id = self.next_id
        self.next_id += 1
        self.scans[scan.state_id] = scan
        self._by_uid[scan.unique_id] = scan
        if self.cfg.use_scan_matching:
            self.solver.add_node(scan.unique_id, scan.corrected)
            self.adjacency.setdefault(scan.unique_id, set())
            self._add_edges(scan, cov)
            self._add_running(scan)
            if self.cfg.do_loop_closing:
                self._try_close_loop(scan)
        self.last = scan
        return scan
