"""Batched correlative scan matcher.

TPU-native re-design of karto::ScanMatcher (Mapper.h:1322-1544,
Mapper.cpp:477-1208). The reference scores candidate poses with a
TBB-parallel row loop over precomputed per-angle index offsets
(GridIndexLookup, Karto.h:6740-6963; GetResponse gather Mapper.cpp:1172-1208).
Here the full (n_angles, ny, nx) candidate tensor is evaluated in one jitted
pass: a (n_angles, B, 2) rotated-offset tensor is built with a small matmul,
turned into flat gather indices into an int8 correlation raster, and reduced
over beams; odometry penalties, tie-averaged best pose, and the
response-surface covariances (Mapper.cpp:641-694, 802-829, 874-1025) are
computed on-device.

Matching the reference's numerics:
  - raster values are round(100 * gaussian) like the int8 CorrelationGrid
    kernel (Mapper.h:1258-1260); response = sum / (B * 100)
    (Mapper.cpp:1204).
  - rounding is half-away-from-zero (Math.h:87-90).
  - ties within KT_TOLERANCE of the best response are averaged
    (Mapper.cpp:802-829), headings by circular mean.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolbox_tpu.core.geometry import KT_TOLERANCE, MAX_VARIANCE
from slam_toolbox_tpu.kernels import rasterize as rz

_DEG = np.pi / 180.0


@dataclass
class MatchResult:
    response: float
    sensor_pose: np.ndarray  # (3,) best sensor pose
    covariance: np.ndarray   # (3, 3)


def _search_offsets(extent: float, step: float) -> np.ndarray:
    """Candidate offsets -extent..extent at the given step
    (CorrelateScan, Mapper.cpp:736-752)."""
    n = int(np.floor(extent * 2.0 / step + 0.5)) + 1
    return -extent + step * np.arange(n, dtype=np.float64)


def _match_pass_impl(
    grid_flat,     # (G*G + 1,) int8; last element 0 = OOB/invalid sink
    g_size,        # () int32 grid side G
    offset,        # (2,) f32 world coords of cell (0,0)
    scale,         # () f32 = 1/resolution
    center,        # (3,) f32 search-center sensor pose
    x_offsets,     # (nx,) f32
    y_offsets,     # (ny,) f32
    angles,        # (na,) f32 absolute candidate headings
    d,             # (na,B,2) int32 rotated beam offsets in cells, f64 on host
    cand_x,        # (nx,) int32 candidate cells
    cand_y,        # (ny,) int32
    finite,        # (B,) bool
    step_xy,       # () f32 search-space resolution of this pass
    angle_step,    # () f32 angular resolution of this pass
    penalize,      # () bool — dynamic so coarse/fine share compiled code
    dist_var_penalty, ang_var_penalty, min_dist_pen, min_ang_pen,
    fine: bool,
):
    G = g_size
    sink = grid_flat.shape[0] - 1
    resp_p = _score_tensor(
        grid_flat, G, sink, cand_x, cand_y, d, finite,
        x_offsets, y_offsets, angles, center[2],
        penalize, dist_var_penalty, ang_var_penalty,
        min_dist_pen, min_ang_pen,
    )
    best, mean = _tie_average(
        resp_p, center[0] + x_offsets, center[1] + y_offsets, angles
    )

    if not fine:
        probs = jnp.max(resp_p, axis=0)
        cov = _positional_cov(
            probs, best, mean[0], mean[1], center, x_offsets, y_offsets,
            step_xy, angle_step,
        )
        return best, mean, cov
    else:
        var_th = _angular_cov(
            grid_flat, G, sink, offset, scale, d, finite,
            mean, best, center[2], angles, angle_step,
        )
        return best, mean, var_th


class _ScoreDispatch:
    """Keeps the `matcher._score_jit[(penalize, refine)]` call shape while
    penalize rides as a traced argument (one executable per refine)."""

    def __init__(self, matcher):
        self.matcher = matcher

    def __getitem__(self, key):
        pen, refine = key
        m = self.matcher

        def call(grid_flat, pgrid, center_off, local_pts, finite):
            return _score_jit(
                grid_flat, pgrid, center_off, local_pts, finite,
                penalize=jnp.bool_(pen), refine=refine,
                **m._score_args, **m._score_static,
            )

        return call


class Matcher:
    """One correlative matcher instance (sequential or loop).

    Mirrors ScanMatcher::Create (Mapper.cpp:477-522): the raster side length
    is the search extent plus a 2x range-threshold margin so base-scan points
    cannot fall off the grid.
    """

    def __init__(
        self,
        search_size: float,
        resolution: float,
        smear_deviation: float,
        range_threshold: float,
        coarse_angle_offset: float,
        coarse_angle_resolution: float,
        fine_angle_offset: float,
        dist_var_penalty: float,
        ang_var_penalty: float,
        min_dist_penalty: float,
        min_ang_penalty: float,
        use_response_expansion: bool = False,
    ):
        assert resolution > 0 and search_size > 0 and range_threshold > 0
        self.resolution = float(resolution)
        self.scale = 1.0 / self.resolution
        self.search_size = float(search_size)
        self.smear_deviation = float(smear_deviation)
        self.roi = int(np.floor(search_size / resolution + 0.5)) + 1
        margin = int(np.ceil(range_threshold / resolution))
        self.G = self.roi + 2 * margin
        self.half_kernel = rz.half_kernel_size(smear_deviation, resolution)
        self.sigma_cells = smear_deviation / resolution
        self.coarse_angle_offset = float(coarse_angle_offset)
        self.coarse_angle_resolution = float(coarse_angle_resolution)
        self.fine_angle_offset = float(fine_angle_offset)
        self.penalty_params = (
            np.float32(dist_var_penalty),
            np.float32(ang_var_penalty),
            np.float32(min_dist_penalty),
            np.float32(min_ang_penalty),
        )
        self.use_response_expansion = bool(use_response_expansion)
        # search offsets for the coarse pass: extent = half the (roi-1)
        # cells, stride = 2 cells (MatchScan, Mapper.cpp:577-585)
        self.coarse_extent = 0.5 * (self.roi - 1) * self.resolution
        self.coarse_step = 2.0 * self.resolution
        # static candidate sets for the fused path
        self._xy_coarse = _search_offsets(self.coarse_extent,
                                          self.coarse_step)
        self._xy_fine = _search_offsets(self.coarse_step * 0.5,
                                        self.resolution)
        self._na_coarse = int(np.floor(
            self.coarse_angle_offset * 2.0 / self.coarse_angle_resolution
            + 0.5)) + 1
        # fine pass angle args follow the reference's (swapped) call:
        # offset = 0.5*coarse resolution, step = FineSearchAngleOffset
        # (MatchScan, Mapper.cpp:625-628)
        self._fine_angle_offset = 0.5 * self.coarse_angle_resolution
        self._fine_angle_res = self.fine_angle_offset
        self._na_fine = int(np.floor(
            self._fine_angle_offset * 2.0 / self._fine_angle_res + 0.5)) + 1
        # two-program match pipeline chained asynchronously on device (see
        # _raster_quant_impl). Coarse scoring uses the Pallas window kernel
        # when the candidate count fits a lane block and the parity grid
        # fits VMEM. The jitted programs are MODULE-LEVEL with the
        # configuration as static arguments, so every Matcher instance
        # with the same geometry (all sessions in a process) shares one
        # compiled executable — on the tunneled TPU each distinct
        # executable is a 15 s - minutes remote compile.
        from slam_toolbox_tpu.kernels import match_pallas as mp

        n_cand = len(self._xy_coarse)
        self._acc_r = mp.acc_rows(n_cand)
        hp, wp = mp.parity_dims(self.G, self._acc_r)
        vmem_est = 4 * hp * wp + 32 * (self._acc_r + 32) * 128 * 4
        self.use_pallas = (
            n_cand <= 128
            and vmem_est < 12 * 2**20
            and jax.default_backend() == "tpu"
        )
        self._score_args = dict(
            x_off_c=jnp.asarray(self._xy_coarse, jnp.float32),
            y_off_c=jnp.asarray(self._xy_coarse, jnp.float32),
            x_off_f=jnp.asarray(self._xy_fine, jnp.float32),
            y_off_f=jnp.asarray(self._xy_fine, jnp.float32),
            scale=np.float32(self.scale),
            coarse_angle_offset=np.float32(self.coarse_angle_offset),
            coarse_angle_res=np.float32(self.coarse_angle_resolution),
            fine_angle_offset=np.float32(self._fine_angle_offset),
            fine_angle_res=np.float32(self._fine_angle_res),
            dist_var_penalty=self.penalty_params[0],
            ang_var_penalty=self.penalty_params[1],
            min_dist_pen=self.penalty_params[2],
            min_ang_pen=self.penalty_params[3],
        )
        self._score_static = dict(
            grid_size=self.G,
            na_coarse=self._na_coarse, na_fine=self._na_fine,
            acc_r=self._acc_r,
        )
        self._score_jit = _ScoreDispatch(self)

    def _raster_jit(self, pts, valid, offset):
        return _raster_jit(
            pts, valid, offset,
            scale=np.float32(self.scale),
            sigma_cells=np.float32(self.sigma_cells),
            grid_size=self.G, half_kernel=self.half_kernel,
            acc_r=self._acc_r, parity=self.use_pallas,
        )

    # -- raster construction ------------------------------------------------
    def build_grid(self, base_scans, viewpoint_pose: np.ndarray):
        """Rasterize base scans around the query scan pose; returns
        (grid_flat int8 (G*G+1,), offset (2,)) — AddScans (Mapper.cpp:1032)."""
        off = np.asarray(
            viewpoint_pose[:2] - 0.5 * (self.G - 1) * self.resolution,
            dtype=np.float64,
        )
        vp = np.asarray(viewpoint_pose[:2], dtype=np.float64)
        pts_p, valid_p = self._base_points(base_scans, vp)
        grid = rz.rasterize_smear(
            jnp.asarray(pts_p),
            jnp.asarray(valid_p),
            jnp.asarray(off, jnp.float32),
            jnp.float32(self.scale),
            jnp.float32(self.sigma_cells),
            self.G,
            self.half_kernel,
        )
        grid_i8 = _quantize_pad(grid)
        return grid_i8, off

    def _base_points(self, base_scans, viewpoint_xy):
        """Concatenated (padded) base-scan world points + validity mask."""
        pts_list, valid_list = [], []
        for sc in base_scans:
            if sc is None:
                continue
            pts = sc.points_world(filtered=False)
            struct = _fvp_structure(sc)
            valid = rz.find_valid_mask(pts, struct, viewpoint_xy)
            pts_list.append(pts)
            valid_list.append(valid)
        if not pts_list:
            pts = np.zeros((0, 2))
            valid = np.zeros((0,), bool)
        else:
            pts = np.concatenate(pts_list, axis=0)
            valid = np.concatenate(valid_list, axis=0)
        # TPU: exactly two pad buckets (16 Ki / 64 Ki points) — every
        # distinct shape is a separate ~30-60 s remote compile on the
        # tunneled TPU and padded scatter work is sub-ms there.
        # CPU backend: compiles are cheap but scatter work is not, so use
        # tight power-of-two buckets instead.
        if jax.default_backend() == "tpu":
            P = 16384 if len(pts) <= 16384 else 65536
        else:
            P = max(1024, 1 << int(np.ceil(np.log2(max(len(pts), 1)))))
        if len(pts) > P:  # enormous chains: keep the most recent points
            pts = pts[-P:]
            valid = valid[-P:]
        pts_p = np.zeros((P, 2), np.float32)
        pts_p[: len(pts)] = np.nan_to_num(pts, nan=-1e9)
        valid_p = np.zeros((P,), bool)
        valid_p[: len(valid)] = valid
        return pts_p, valid_p

    # -- full match (MatchScan, Mapper.cpp:534-639) -------------------------
    def match_scan(
        self, scan, base_scans, penalize: bool = True, refine: bool = True,
        exact: bool = False,
    ) -> MatchResult:
        """Fused single-call match by default; `exact=True` uses the
        two-call path with f64 host index tables (bit-matching the NumPy
        oracle) and is also the fallback that implements response
        expansion."""
        if not exact:
            center = np.asarray(scan.sensor_pose, dtype=np.float64)
            off = center[:2] - 0.5 * (self.G - 1) * self.resolution
            pts_p, valid_p = self._base_points(base_scans, center[:2])
            local_dev, finite_dev = _scan_device_cache(scan)
            center_off = np.concatenate([center, off]).astype(np.float32)
            grid_dev, pgrid_dev = self._raster_jit(
                jnp.asarray(pts_p), jnp.asarray(valid_p),
                jnp.asarray(center_off[3:5]),
            )
            packed = self._score_jit[(penalize, refine)](
                grid_dev, pgrid_dev, jnp.asarray(center_off),
                local_dev, finite_dev,
            )
            # sync before fetching: the PJRT tunnel's fetch path backs off
            # hard when the result is not yet ready (~150 ms), while
            # waiting for completion is sub-ms and a ready fetch ~5 ms
            packed.block_until_ready()
            packed = np.asarray(packed, np.float64)
            best = float(packed[0])
            if best <= KT_TOLERANCE and self.use_response_expansion:
                return self.match_scan(
                    scan, base_scans, penalize=penalize, refine=refine,
                    exact=True,
                )
            mean = packed[1:4]
            mean[2] = _normalize(mean[2])
            return MatchResult(
                response=best,
                sensor_pose=mean,
                covariance=packed[4:13].reshape(3, 3),
            )

        center = np.asarray(scan.sensor_pose, dtype=np.float64)
        grid_flat, off = self.build_grid(base_scans, center)

        local_pts = np.ascontiguousarray(scan.local_points, dtype=np.float32)
        finite = np.isfinite(scan.ranges)
        xy_off = _search_offsets(self.coarse_extent, self.coarse_step)

        best, mean, cov = self._run_pass(
            grid_flat, off, center, xy_off, xy_off,
            self.coarse_angle_offset, self.coarse_angle_resolution,
            local_pts, finite, self.coarse_step,
            penalize=penalize, fine=False,
        )

        if self.use_response_expansion and abs(best) <= KT_TOLERANCE:
            ang_off = self.coarse_angle_offset
            for _ in range(3):  # Mapper.cpp:594-619
                ang_off += 20.0 * _DEG
                best, mean, cov = self._run_pass(
                    grid_flat, off, center, xy_off, xy_off,
                    ang_off, self.coarse_angle_resolution,
                    local_pts, finite, self.coarse_step,
                    penalize=penalize, fine=False,
                )
                if abs(best) > KT_TOLERANCE:
                    break

        if refine:
            fine_xy = _search_offsets(
                self.coarse_step * 0.5, self.resolution
            )
            best, mean, var_th = self._run_pass(
                grid_flat, off, np.asarray(mean, np.float64),
                fine_xy, fine_xy,
                0.5 * self.coarse_angle_resolution, self.fine_angle_offset,
                local_pts, finite, self.resolution,
                penalize=penalize, fine=True,
            )
            cov = np.array(cov)
            cov[2, 2] = float(var_th)

        return MatchResult(
            response=float(best),
            sensor_pose=np.asarray(mean, dtype=np.float64),
            covariance=np.asarray(cov, dtype=np.float64),
        )

    def dispatch_scans_batch(
        self, scan, base_sets, penalize: bool = True, refine: bool = True,
    ):
        """Dispatch matches of one scan against several base sets without
        waiting: returns the list of in-flight packed device results.
        Convert with collect_batch (which pays the one sync/fetch)."""
        if not base_sets:
            return []
        center = np.asarray(scan.sensor_pose, dtype=np.float64)
        off = center[:2] - 0.5 * (self.G - 1) * self.resolution
        local_dev, finite_dev = _scan_device_cache(scan)
        center_off = jnp.asarray(
            np.concatenate([center, off]).astype(np.float32)
        )
        packs = []
        for base in base_sets:
            pts_p, valid_p = self._base_points(base, center[:2])
            grid_dev, pgrid_dev = self._raster_jit(
                jnp.asarray(pts_p), jnp.asarray(valid_p),
                center_off[3:5],
            )
            packs.append(self._score_jit[(penalize, refine)](
                grid_dev, pgrid_dev, center_off, local_dev, finite_dev,
            ))
        return packs

    @staticmethod
    def results_from_packed(rows) -> list:
        """Convert host (M, 13) packed rows to MatchResults."""
        out = []
        for packed in np.asarray(rows, np.float64).reshape(-1, 13):
            mean = packed[1:4].copy()
            mean[2] = _normalize(mean[2])
            out.append(MatchResult(
                response=float(packed[0]),
                sensor_pose=mean,
                covariance=packed[4:13].reshape(3, 3),
            ))
        return out

    @staticmethod
    def collect_batch(packs):
        """Wait for dispatched packs and convert to MatchResults (one
        completion wait + one stacked fetch for the whole batch)."""
        if not packs:
            return []
        stacked = jnp.stack(packs)
        stacked.block_until_ready()
        return Matcher.results_from_packed(np.asarray(stacked))

    def match_scans_batch(
        self, scan, base_sets, penalize: bool = True, refine: bool = True,
    ):
        """Match one scan against several base sets with all device work
        dispatched back-to-back and a single completion wait — the per-call
        sync/fetch cost is paid once per batch, not per set."""
        return self.collect_batch(self.dispatch_scans_batch(
            scan, base_sets, penalize=penalize, refine=refine,
        ))

    def _run_pass(
        self, grid_flat, off, center, x_off, y_off,
        angle_offset, angle_resolution, local_pts, finite, step_xy,
        penalize: bool, fine: bool,
    ):
        na = int(np.floor(angle_offset * 2.0 / angle_resolution + 0.5)) + 1
        angles = (
            center[2] - angle_offset
            + angle_resolution * np.arange(na, dtype=np.float64)
        )
        d, cand_x, cand_y = build_index_tables(
            angles, local_pts, center, off, self.scale, x_off, y_off
        )
        out = _match_pass(
            grid_flat,
            jnp.int32(self.G),
            jnp.asarray(off, jnp.float32),
            jnp.float32(self.scale),
            jnp.asarray(center, jnp.float32),
            jnp.asarray(x_off, jnp.float32),
            jnp.asarray(y_off, jnp.float32),
            jnp.asarray(angles, jnp.float32),
            jnp.asarray(d),
            jnp.asarray(cand_x),
            jnp.asarray(cand_y),
            jnp.asarray(finite),
            jnp.float32(step_xy),
            jnp.float32(angle_resolution),
            jnp.bool_(penalize),
            *self.penalty_params,
            fine=fine,
        )
        if fine:
            best, mean, var_th = out
            mean = np.asarray(mean, np.float64)
            mean[2] = _normalize(mean[2])
            return float(best), mean, float(var_th)
        best, mean, cov = out
        mean = np.asarray(mean, np.float64)
        mean[2] = _normalize(mean[2])
        return float(best), mean, np.asarray(cov, np.float64)


def _flat_parts(gy, gx, G, parity_acc_r):
    """Separable (y-part, x-part) of the flat gather index; sum gives the
    cell's index into grid_flat. parity_acc_r selects the parity layout
    (grid_flat = pgrid.reshape(-1)); None = plain row-major grid."""
    if parity_acc_r is None:
        return gy * G, gx
    from slam_toolbox_tpu.kernels import match_pallas as mp

    hp, wp = mp.parity_dims(G, parity_acc_r)
    ya = 2 * (gy & 1) * (hp * wp) + ((gy >> 1) + mp.PAD_TOP) * wp
    xa = (gx & 1) * (hp * wp) + (gx >> 1) + mp.PAD_LEFT
    return ya, xa


def _score_tensor(
    grid_flat, G, sink, cand_x, cand_y, d, finite,
    x_offsets, y_offsets, angles, center_h,
    penalize, dist_var_penalty, ang_var_penalty, min_dist_pen, min_ang_pen,
    parity_acc_r=None,
):
    """Response tensor (na, ny, nx) from integer gather tables — shared by
    the exact two-call path and the fused single-call path."""
    B = d.shape[1]
    gx = d[:, :, 0][:, :, None] + cand_x[None, None, :]
    gy = d[:, :, 1][:, :, None] + cand_y[None, None, :]
    okx = (gx >= 0) & (gx < G)
    oky = (gy >= 0) & (gy < G)
    ok = (
        oky[:, :, :, None] & okx[:, :, None, :]
        & finite[None, :, None, None]
    )
    ya, xa = _flat_parts(gy, gx, G, parity_acc_r)
    flat = jnp.where(ok, ya[:, :, :, None] + xa[:, :, None, :], sink)
    vals = jnp.take(grid_flat, flat, axis=0)
    resp = jnp.sum(vals.astype(jnp.int32), axis=1).astype(jnp.float32) / (
        jnp.float32(B) * 100.0
    )
    sq_xy = y_offsets[:, None] ** 2 + x_offsets[None, :] ** 2
    dist_pen = jnp.maximum(1.0 - 0.2 * sq_xy / dist_var_penalty, min_dist_pen)
    sq_ang = (angles - center_h) ** 2
    ang_pen = jnp.maximum(1.0 - 0.2 * sq_ang / ang_var_penalty, min_ang_pen)
    pen = dist_pen[None, :, :] * ang_pen[:, None, None]
    return jnp.where(
        penalize & (jnp.abs(resp) > KT_TOLERANCE), resp * pen, resp
    )


def _build_hrow3(pgrid):
    """Per parity cell, pack the +x row triple (G[c], G[c+1], G[c+2]) —
    full-grid columns — into one int32: byte j = cell (y, x+j).
    Full cell (y, x) lives at plane p = 2*(y&1)+(x&1), col t = x>>1;
    x+1 flips the col parity (plane p^1) at col t + (x&1); x+2 stays in
    plane p at col t+1. Shift-ins at the right edge read the zero pad."""
    g32 = pgrid.astype(jnp.int32)

    def sh(a):
        return jnp.concatenate(
            [a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1
        )

    out = []
    for p in range(4):
        px = p & 1
        b1 = g32[p ^ 1] if px == 0 else sh(g32[p ^ 1])
        b2 = sh(g32[p])
        out.append(g32[p] | (b1 << 8) | (b2 << 16))
    return jnp.stack(out)


def _score_fine3_parity(
    pgrid, G, cand_x, cand_y, d, finite,
    x_offsets, y_offsets, angles, center_h,
    penalize, dist_var_penalty, ang_var_penalty, min_dist_pen, min_ang_pen,
    acc_r,
):
    """Fine-pass response on the parity grid with packed-row gathers:
    the 3x3 candidate lattice is consecutive cells, so each (angle, beam,
    row) needs ONE int32 gather of a packed row triple instead of three
    scalar gathers (the XLA gather rate ~100M/s made the fine pass a
    dominant per-scan cost). Exact: out-of-grid cells read the zero pad
    (the parity layout maps any coordinate within the pad bounds into
    zeros), and rounding-edge candidate cells that duplicate the base
    select the same byte the scalar path would gather."""
    from slam_toolbox_tpu.kernels import match_pallas as mp

    hp, wp = mp.parity_dims(G, acc_r)
    hflat = _build_hrow3(pgrid).reshape(-1)
    B = d.shape[1]
    gx = d[:, :, 0] + cand_x[0]
    gy0 = d[:, :, 1] + cand_y[0]
    okx = (
        (gx >= -2 * mp.PAD_LEFT)
        & (gx < 2 * (wp - mp.PAD_LEFT - 1))
        & finite[None, :]
    )
    hs = []
    for k in range(3):
        gy = gy0 + k
        ok = okx & (gy >= -2 * mp.PAD_TOP) & (gy < 2 * (hp - mp.PAD_TOP))
        ya, xa = _flat_parts(gy, gx, G, acc_r)
        idx = jnp.where(ok, ya + xa, 0)
        hs.append(jnp.take(hflat, idx, axis=0))
    hs = jnp.stack(hs, axis=2)                       # (na, B, 3 rows)
    cy = jnp.clip(cand_y - cand_y[0], 0, 2)          # row select (3,)
    cx = jnp.clip(cand_x - cand_x[0], 0, 2)          # byte select (3,)
    hsel = jnp.take(hs, cy, axis=2)                  # (na, B, ny)
    vals = (hsel[..., None] >> (8 * cx)[None, None, None, :]) & 0xFF
    resp = jnp.sum(vals, axis=1).astype(jnp.float32) / (
        jnp.float32(B) * 100.0
    )
    sq_xy = y_offsets[:, None] ** 2 + x_offsets[None, :] ** 2
    dist_pen = jnp.maximum(1.0 - 0.2 * sq_xy / dist_var_penalty, min_dist_pen)
    sq_ang = (angles - center_h) ** 2
    ang_pen = jnp.maximum(1.0 - 0.2 * sq_ang / ang_var_penalty, min_ang_pen)
    pen = dist_pen[None, :, :] * ang_pen[:, None, None]
    return jnp.where(
        penalize & (jnp.abs(resp) > KT_TOLERANCE), resp * pen, resp
    )


def _tie_average(resp_p, wx, wy, angles):
    best = jnp.max(resp_p)
    tie = resp_p >= best - KT_TOLERANCE
    cnt = jnp.sum(tie)
    avg_x = jnp.sum(jnp.where(tie, wx[None, None, :], 0.0)) / cnt
    avg_y = jnp.sum(jnp.where(tie, wy[None, :, None], 0.0)) / cnt
    tx = jnp.sum(jnp.where(tie, jnp.cos(angles)[:, None, None], 0.0)) / cnt
    ty = jnp.sum(jnp.where(tie, jnp.sin(angles)[:, None, None], 0.0)) / cnt
    return jnp.minimum(best, 1.0), jnp.stack(
        [avg_x, avg_y, jnp.arctan2(ty, tx)]
    )


def _rotated_tables(angles, local_pts, scale):
    """In-kernel (f32) version of build_index_tables' rotated offsets; used
    by the fused path where the fine-pass angles depend on the coarse
    result (cell-boundary flips vs f64 are immaterial at runtime)."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    rx = (c[:, None] * local_pts[None, :, 0]
          - s[:, None] * local_pts[None, :, 1]) * scale
    ry = (s[:, None] * local_pts[None, :, 0]
          + c[:, None] * local_pts[None, :, 1]) * scale
    return jnp.stack(
        [rz.round_half_away(rx), rz.round_half_away(ry)], axis=-1
    ).astype(jnp.int32)


def _positional_cov(probs, best, avg_x, avg_y, center, x_offsets, y_offsets,
                    step_xy, angle_step):
    dx = avg_x - center[0]
    dy = avg_y - center[1]
    use = probs >= best - 0.1
    norm = jnp.sum(jnp.where(use, probs, 0.0))
    xm = x_offsets[None, :] - dx
    ym = y_offsets[:, None] - dy
    acc_xx = jnp.sum(jnp.where(use, xm**2 * probs, 0.0))
    acc_xy = jnp.sum(jnp.where(use, xm * ym * probs, 0.0))
    acc_yy = jnp.sum(jnp.where(use, ym**2 * probs, 0.0))
    var_th = 4.0 * angle_step**2
    min_var = 0.1 * step_xy**2
    mult = 1.0 / jnp.maximum(best, KT_TOLERANCE)
    vxx = jnp.maximum(acc_xx / norm, min_var) * mult
    vyy = jnp.maximum(acc_yy / norm, min_var) * mult
    vxy = (acc_xy / norm) * mult
    cov_ok = jnp.eye(3, dtype=jnp.float32)
    cov_ok = cov_ok.at[0, 0].set(vxx)
    cov_ok = cov_ok.at[0, 1].set(vxy)
    cov_ok = cov_ok.at[1, 0].set(vxy)
    cov_ok = cov_ok.at[1, 1].set(vyy)
    cov_ok = cov_ok.at[2, 2].set(var_th)
    cov_norm = jnp.where(norm > KT_TOLERANCE, cov_ok, jnp.eye(3))
    cov_low = jnp.diag(
        jnp.array([MAX_VARIANCE, MAX_VARIANCE, var_th], jnp.float32)
    )
    return jnp.where(best < KT_TOLERANCE, cov_low, cov_norm)


def _angular_cov(grid_flat, G, sink, offset, scale, d_fine, finite,
                 avg, best, center_h, angles, angle_step,
                 parity_acc_r=None):
    bx = rz.round_half_away((avg[0] - offset[0]) * scale).astype(jnp.int32)
    by = rz.round_half_away((avg[1] - offset[1]) * scale).astype(jnp.int32)
    agx = d_fine[:, :, 0] + bx
    agy = d_fine[:, :, 1] + by
    aok = (agx >= 0) & (agx < G) & (agy >= 0) & (agy < G) & finite[None, :]
    ya, xa = _flat_parts(agy, agx, G, parity_acc_r)
    aflat = jnp.where(aok, ya + xa, sink)
    avals = jnp.take(grid_flat, aflat, axis=0)
    B = d_fine.shape[1]
    resp_a = jnp.sum(avals.astype(jnp.int32), axis=1).astype(jnp.float32) / (
        jnp.float32(B) * 100.0
    )
    best_angle = avg[2] + 2 * jnp.pi * jnp.round(
        (center_h - avg[2]) / (2 * jnp.pi)
    )
    use = resp_a >= best - 0.1
    norm = jnp.sum(jnp.where(use, resp_a, 0.0))
    acc = jnp.sum(jnp.where(use, (angles - best_angle) ** 2 * resp_a, 0.0))
    acc = jnp.where(acc < KT_TOLERANCE, angle_step**2, acc)
    return jnp.where(norm > KT_TOLERANCE, acc / norm,
                     1000.0 * angle_step**2)


def _raster_quant_impl(
    pts, valid, offset, scale, sigma_cells,
    grid_size: int, half_kernel: int, acc_r: int, parity: bool,
):
    """Raster + smear + int8 quantize; returns (flat grid with zero sink
    cell, parity-split grid for the Pallas scorer or None).

    Kept as its OWN XLA program: compiling the scatter/smear producer and
    the scoring gathers into one module makes XLA's fusion planner blow up
    (compile minutes, ~150 ms/run vs ~1 ms split). The match pipeline
    chains the programs asynchronously on device — no host sync between —
    so the split costs only a dispatch.

    parity=True rasterizes DIRECTLY into the padded parity layout
    (match_pallas.rasterize_parity) and returns it both as the Pallas
    input and flattened for the fine/angular gathers (which then index it
    via parity_flat_index) — the full-grid raster + int8 parity
    reshape/transpose it replaces cost 2.7 ms/scan on TPU."""
    if parity:
        from slam_toolbox_tpu.kernels import match_pallas as mp

        pgrid = mp.rasterize_parity(
            pts, valid, offset, scale, sigma_cells,
            grid_size, half_kernel, acc_r,
        )
        return pgrid.reshape(-1), pgrid
    grid = rz.rasterize_smear(
        pts, valid, offset, scale, sigma_cells, grid_size, half_kernel
    )
    q2d = rz.round_half_away(grid * 100.0).astype(jnp.int8)
    q = q2d.reshape(-1)
    flat = jnp.concatenate([q, jnp.zeros((1,), jnp.int8)])
    return flat, None


def _score_impl(
    grid_flat,    # (G*G+1,) int8 from _raster_quant_impl
    pgrid,        # (4, HP, WP) int8 parity grid, or None (XLA path)
    center_off,   # (5,) [center_x, center_y, center_h, offset_x, offset_y]
    local_pts,    # (B,2)
    finite,       # (B,)
    x_off_c, y_off_c,          # coarse candidate offsets (constants)
    x_off_f, y_off_f,          # fine candidate offsets (constants)
    scale,
    coarse_angle_offset, coarse_angle_res,
    fine_angle_offset, fine_angle_res,
    penalize,
    dist_var_penalty, ang_var_penalty, min_dist_pen, min_ang_pen,
    grid_size: int, na_coarse: int, na_fine: int,
    refine: bool, acc_r: int = 32,
):
    """Coarse pass + (optional) fine pass + covariances on a prebuilt
    raster; returns the packed 13-float result.

    The coarse candidate tensor is scored by the Pallas window kernel when
    a parity grid is provided (coarse candidates are a stride-2 lattice);
    the tiny fine/angular passes stay on the XLA gather path."""
    G = grid_size
    center = center_off[:3]
    offset = center_off[3:5]
    # parity path: grid_flat is pgrid.reshape(-1); index 0 is a
    # guaranteed-zero border cell (the sink for invalid gathers)
    par = acc_r if pgrid is not None else None
    sink = 0 if pgrid is not None else G * G
    B = local_pts.shape[0]

    # coarse pass
    ang_c = (
        center[2] - coarse_angle_offset
        + coarse_angle_res
        * jnp.arange(na_coarse, dtype=jnp.float32)
    )
    d_c = _rotated_tables(ang_c, local_pts, scale)
    cand_x = rz.round_half_away(
        (center[0] + x_off_c - offset[0]) * scale
    ).astype(jnp.int32)
    cand_y = rz.round_half_away(
        (center[1] + y_off_c - offset[1]) * scale
    ).astype(jnp.int32)
    if pgrid is not None:
        from slam_toolbox_tpu.kernels import match_pallas as mp

        ny, nx = y_off_c.shape[0], x_off_c.shape[0]
        tbl = mp.prepare_tables(
            d_c, cand_x[0], cand_y[0], finite, G, acc_r
        )
        sums = mp.score_windows(pgrid, tbl, acc_r=acc_r)
        raw = sums[:, :ny, :nx].astype(jnp.float32) / (
            jnp.float32(B) * 100.0
        )
        sq_xy = y_off_c[:, None] ** 2 + x_off_c[None, :] ** 2
        dist_pen = jnp.maximum(
            1.0 - 0.2 * sq_xy / dist_var_penalty, min_dist_pen
        )
        sq_ang = (ang_c - center[2]) ** 2
        ang_pen = jnp.maximum(
            1.0 - 0.2 * sq_ang / ang_var_penalty, min_ang_pen
        )
        pen = dist_pen[None, :, :] * ang_pen[:, None, None]
        resp_c = jnp.where(
            penalize & (jnp.abs(raw) > KT_TOLERANCE), raw * pen, raw
        )
    else:
        resp_c = _score_tensor(
            grid_flat, G, sink, cand_x, cand_y, d_c, finite,
            x_off_c, y_off_c, ang_c, center[2],
            penalize, dist_var_penalty, ang_var_penalty,
            min_dist_pen, min_ang_pen,
        )
    best_c, mean_c = _tie_average(
        resp_c, center[0] + x_off_c, center[1] + y_off_c, ang_c
    )
    probs = jnp.max(resp_c, axis=0)
    cov = _positional_cov(
        probs, best_c, mean_c[0], mean_c[1], center, x_off_c, y_off_c,
        x_off_c[1] - x_off_c[0], coarse_angle_res,
    )

    if not refine:
        # pack into one vector: a single device->host transfer per match
        return jnp.concatenate(
            [best_c[None], mean_c, cov.reshape(-1)]
        )

    # fine pass centered at the coarse mean
    ang_f = (
        mean_c[2] - fine_angle_offset
        + fine_angle_res * jnp.arange(na_fine, dtype=jnp.float32)
    )
    d_f = _rotated_tables(ang_f, local_pts, scale)
    cand_xf = rz.round_half_away(
        (mean_c[0] + x_off_f - offset[0]) * scale
    ).astype(jnp.int32)
    cand_yf = rz.round_half_away(
        (mean_c[1] + y_off_f - offset[1]) * scale
    ).astype(jnp.int32)
    if pgrid is not None and x_off_f.shape[0] == 3 and y_off_f.shape[0] == 3:
        resp_f = _score_fine3_parity(
            pgrid, G, cand_xf, cand_yf, d_f, finite,
            x_off_f, y_off_f, ang_f, mean_c[2],
            penalize, dist_var_penalty, ang_var_penalty,
            min_dist_pen, min_ang_pen, acc_r,
        )
    else:
        resp_f = _score_tensor(
            grid_flat, G, sink, cand_xf, cand_yf, d_f, finite,
            x_off_f, y_off_f, ang_f, mean_c[2],
            penalize, dist_var_penalty, ang_var_penalty,
            min_dist_pen, min_ang_pen, parity_acc_r=par,
        )
    best_f, mean_f = _tie_average(
        resp_f, mean_c[0] + x_off_f, mean_c[1] + y_off_f, ang_f
    )
    var_th = _angular_cov(
        grid_flat, G, sink, offset, scale, d_f, finite,
        mean_f, best_f, mean_c[2], ang_f, fine_angle_res,
        parity_acc_r=par,
    )
    cov = cov.at[2, 2].set(var_th)
    return jnp.concatenate([best_f[None], mean_f, cov.reshape(-1)])


def _scan1(fn):
    """Length-1 lax.scan shell around a jittable impl.

    XLA TPU compiles big straight-line top-level programs pathologically
    (no cross-op buffer reuse / scheduling the loop path gets): the same
    raster+score match measured 74 ms straight-line vs 15.5 ms inside a
    length-1 scan (results bit-identical); the fused loop-verify program
    showed the same ~6x ratio. Wrap every top-level program whose body is
    also used inside real loops."""
    import functools as _ft

    @_ft.wraps(fn)
    def wrapped(*args, **kw):
        def step(c, _):
            return c, fn(*args, **kw)

        _, out = jax.lax.scan(step, 0, None, length=1)
        return jax.tree_util.tree_map(lambda x: x[0], out)

    return wrapped


# module-level jits: one executable per (geometry statics, shapes) shared
# by every Matcher / pipeline / session in the process
_score_jit = jax.jit(
    _scan1(_score_impl),
    static_argnames=("grid_size", "na_coarse", "na_fine", "refine",
                     "acc_r"),
)
_raster_jit = jax.jit(
    _scan1(_raster_quant_impl),
    static_argnames=("grid_size", "half_kernel", "acc_r", "parity"),
)
_match_pass = jax.jit(_scan1(_match_pass_impl), static_argnames=("fine",))


def build_index_tables(angles, local_pts, center, offset, scale, x_off, y_off):
    """Integer gather tables in float64 on the host: per-(angle, beam)
    rotated cell offsets (the GridIndexLookup idea, Karto.h:6797-6894) and
    candidate cells. Computing these in f64 makes the device pass exact —
    indices round identically to the reference regardless of on-device fp
    contraction. na*B is tiny (~20k ints)."""
    c, s = np.cos(angles), np.sin(angles)  # (na,)
    lx = local_pts[:, 0].astype(np.float64)
    ly = local_pts[:, 1].astype(np.float64)
    rx = (c[:, None] * lx[None, :] - s[:, None] * ly[None, :]) * scale
    ry = (s[:, None] * lx[None, :] + c[:, None] * ly[None, :]) * scale
    with np.errstate(invalid="ignore"):
        d = np.stack(
            [_round_ha_np(rx), _round_ha_np(ry)], axis=-1
        )
    d = np.nan_to_num(d, nan=1 << 28).astype(np.int32)  # NaN -> OOB sink
    cand_x = _round_ha_np(
        (center[0] + np.asarray(x_off) - offset[0]) * scale
    ).astype(np.int32)
    cand_y = _round_ha_np(
        (center[1] + np.asarray(y_off) - offset[1]) * scale
    ).astype(np.int32)
    return d, cand_x, cand_y


def _round_ha_np(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


@jax.jit
def _quantize_pad(grid):
    """int8 quantization round(100*z) exactly as the reference kernel values
    (Mapper.h:1258-1260), flattened with a zero sink cell appended."""
    q = rz.round_half_away(grid * 100.0).astype(jnp.int8).reshape(-1)
    return jnp.concatenate([q, jnp.zeros((1,), jnp.int8)])


def _normalize(a: float) -> float:
    return float(np.arctan2(np.sin(a), np.cos(a)))


def _scan_device_cache(scan):
    """Device-resident (local_pts, finite) for a scan — pose-independent,
    uploaded once per scan and reused across its sequential/loop matches."""
    cached = getattr(scan, "_dev_local", None)
    if cached is not None:
        return cached
    local_pts = np.nan_to_num(
        np.ascontiguousarray(scan.local_points, dtype=np.float32), nan=0.0
    )
    finite = np.isfinite(scan.ranges)
    out = (jnp.asarray(local_pts), jnp.asarray(finite))
    try:
        scan._dev_local = out
    except AttributeError:
        pass
    return out


def _fvp_structure(scan):
    """Cached FindValidPoints structure per scan (see rasterize.py)."""
    cached = getattr(scan, "_fvp", None)
    pts = scan.points_world(filtered=False)
    if cached is not None and cached[0] is scan._points:
        return cached[1]
    struct = rz.find_valid_points_structure(pts)
    try:
        scan._fvp = (scan._points, struct)
    except AttributeError:
        pass
    return struct
