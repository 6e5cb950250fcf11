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


@functools.partial(jax.jit, static_argnames=("fine",))
def _match_pass(
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
    B = d.shape[1]
    na, ny, nx = angles.shape[0], y_offsets.shape[0], x_offsets.shape[0]
    sink = grid_flat.shape[0] - 1

    gx = d[:, :, 0][:, :, None] + cand_x[None, None, :]  # (na,B,nx)
    gy = d[:, :, 1][:, :, None] + cand_y[None, None, :]  # (na,B,ny)
    okx = (gx >= 0) & (gx < G)
    oky = (gy >= 0) & (gy < G)
    ok = (
        oky[:, :, :, None]
        & okx[:, :, None, :]
        & finite[None, :, None, None]
    )  # (na,B,ny,nx)
    flat = jnp.where(
        ok,
        gy[:, :, :, None] * G + gx[:, :, None, :],
        sink,
    )
    vals = jnp.take(grid_flat, flat, axis=0)  # (na,B,ny,nx) int8
    resp = jnp.sum(vals.astype(jnp.int32), axis=1).astype(jnp.float32) / (
        jnp.float32(B) * 100.0
    )  # (na,ny,nx)

    # odometry-deviation penalty (Mapper.cpp:671-685)
    sq_xy = (
        y_offsets[:, None] ** 2 + x_offsets[None, :] ** 2
    )  # (ny,nx)
    dist_pen = jnp.maximum(
        1.0 - 0.2 * sq_xy / dist_var_penalty, min_dist_pen
    )
    sq_ang = (angles - center[2]) ** 2  # (na,)
    ang_pen = jnp.maximum(
        1.0 - 0.2 * sq_ang / ang_var_penalty, min_ang_pen
    )
    pen = dist_pen[None, :, :] * ang_pen[:, None, None]
    resp_p = jnp.where(
        penalize & (jnp.abs(resp) > KT_TOLERANCE), resp * pen, resp
    )

    # tie-averaged best pose (Mapper.cpp:775-829)
    best = jnp.max(resp_p)
    tie = resp_p >= best - KT_TOLERANCE  # DoubleEqual
    cnt = jnp.sum(tie)
    wx = center[0] + x_offsets  # (nx,)
    wy = center[1] + y_offsets  # (ny,)
    avg_x = jnp.sum(jnp.where(tie, wx[None, None, :], 0.0)) / cnt
    avg_y = jnp.sum(jnp.where(tie, wy[None, :, None], 0.0)) / cnt
    tx = jnp.sum(jnp.where(tie, jnp.cos(angles)[:, None, None], 0.0)) / cnt
    ty = jnp.sum(jnp.where(tie, jnp.sin(angles)[:, None, None], 0.0)) / cnt
    avg_h = jnp.arctan2(ty, tx)
    mean = jnp.stack([avg_x, avg_y, avg_h])

    best = jnp.minimum(best, 1.0)

    if not fine:
        # positional covariance from the response surface
        # (ComputePositionalCovariance, Mapper.cpp:874-966)
        probs = jnp.max(resp_p, axis=0)  # (ny,nx) best over angles per cell
        dx = avg_x - center[0]
        dy = avg_y - center[1]
        use = probs >= best - 0.1
        norm = jnp.sum(jnp.where(use, probs, 0.0))
        xm = x_offsets[None, :] - dx  # (1,nx)
        ym = y_offsets[:, None] - dy  # (ny,1)
        acc_xx = jnp.sum(jnp.where(use, xm**2 * probs, 0.0))
        acc_xy = jnp.sum(jnp.where(use, xm * ym * probs, 0.0))
        acc_yy = jnp.sum(jnp.where(use, ym**2 * probs, 0.0))
        var_th = 4.0 * angle_step**2
        min_var = 0.1 * step_xy**2
        mult = 1.0 / jnp.maximum(best, KT_TOLERANCE)
        vxx = jnp.maximum(acc_xx / norm, min_var) * mult
        vyy = jnp.maximum(acc_yy / norm, min_var) * mult
        vxy = (acc_xy / norm) * mult
        cov_ok = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
            jnp.float32,
        )
        cov_ok = cov_ok.at[0, 0].set(vxx)
        cov_ok = cov_ok.at[0, 1].set(vxy)
        cov_ok = cov_ok.at[1, 0].set(vxy)
        cov_ok = cov_ok.at[1, 1].set(vyy)
        cov_ok = cov_ok.at[2, 2].set(var_th)
        # norm <= tol -> covariance stays identity (reference resets to I
        # and only fills when norm > tolerance, Mapper.cpp:935-955)
        cov_norm = jnp.where(norm > KT_TOLERANCE, cov_ok, jnp.eye(3))
        cov_low = jnp.diag(
            jnp.array([MAX_VARIANCE, MAX_VARIANCE, var_th], jnp.float32)
        )
        cov = jnp.where(best < KT_TOLERANCE, cov_low, cov_norm)
        return best, mean, cov
    else:
        # angular covariance at the best position
        # (ComputeAngularCovariance, Mapper.cpp:977-1025) — unpenalized
        # responses at the tie-averaged best cell over the fine angles.
        bx = rz.round_half_away((avg_x - offset[0]) * scale).astype(jnp.int32)
        by = rz.round_half_away((avg_y - offset[1]) * scale).astype(jnp.int32)
        agx = d[:, :, 0] + bx  # (na,B)
        agy = d[:, :, 1] + by
        aok = (
            (agx >= 0) & (agx < G) & (agy >= 0) & (agy < G) & finite[None, :]
        )
        aflat = jnp.where(aok, agy * G + agx, sink)
        avals = jnp.take(grid_flat, aflat, axis=0)
        resp_a = jnp.sum(avals.astype(jnp.int32), axis=1).astype(
            jnp.float32
        ) / (jnp.float32(B) * 100.0)  # (na,)
        # NormalizeAngleDifference(avg_h, center_h)
        best_angle = avg_h + 2 * jnp.pi * jnp.round(
            (center[2] - avg_h) / (2 * jnp.pi)
        )
        use = resp_a >= best - 0.1
        norm = jnp.sum(jnp.where(use, resp_a, 0.0))
        acc = jnp.sum(
            jnp.where(use, (angles - best_angle) ** 2 * resp_a, 0.0)
        )
        acc = jnp.where(acc < KT_TOLERANCE, angle_step**2, acc)
        var_th = jnp.where(
            norm > KT_TOLERANCE, acc / norm, 1000.0 * angle_step**2
        )
        return best, mean, var_th


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

    # -- raster construction ------------------------------------------------
    def build_grid(self, base_scans, viewpoint_pose: np.ndarray):
        """Rasterize base scans around the query scan pose; returns
        (grid_flat int8 (G*G+1,), offset (2,)) — AddScans (Mapper.cpp:1032)."""
        off = np.asarray(
            viewpoint_pose[:2] - 0.5 * (self.G - 1) * self.resolution,
            dtype=np.float64,
        )
        vp = np.asarray(viewpoint_pose[:2], dtype=np.float64)
        pts_list, valid_list = [], []
        for sc in base_scans:
            if sc is None:
                continue
            pts = sc.points_world(filtered=False)
            struct = _fvp_structure(sc)
            valid = rz.find_valid_mask(pts, struct, vp)
            pts_list.append(pts)
            valid_list.append(valid)
        if not pts_list:
            pts = np.zeros((0, 2))
            valid = np.zeros((0,), bool)
        else:
            pts = np.concatenate(pts_list, axis=0)
            valid = np.concatenate(valid_list, axis=0)
        # pad to a power-of-two bucket to bound jit specializations
        P = max(1024, 1 << int(np.ceil(np.log2(max(len(pts), 1)))))
        pad = P - len(pts)
        pts_p = np.zeros((P, 2), np.float32)
        pts_p[: len(pts)] = np.nan_to_num(pts, nan=-1e9)
        valid_p = np.zeros((P,), bool)
        valid_p[: len(valid)] = valid
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

    # -- full match (MatchScan, Mapper.cpp:534-639) -------------------------
    def match_scan(
        self, scan, base_scans, penalize: bool = True, refine: bool = True
    ) -> MatchResult:
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
