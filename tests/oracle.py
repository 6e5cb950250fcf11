"""Slow, loop-based NumPy oracles mirroring the reference algorithms
(structure follows Mapper.cpp / Karto.h; used only to golden-test the JAX
kernels)."""
from __future__ import annotations

import numpy as np

KT_TOLERANCE = 1e-6
MAX_VARIANCE = 500.0


def round_half_away(x):
    x = np.asarray(x)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def rasterize_smear_oracle(points, valid, offset, scale, sigma_cells, G, hk):
    """Occupied-cell scatter + per-point Gaussian max-stamp, like
    CorrelationGrid::SmearPoint with the precomputed kernel
    (Mapper.h:1152-1183, 1213-1266). Returns int values 0..100."""
    grid = np.zeros((G, G), np.int32)
    occ = []
    for p, v in zip(points, valid):
        if not v or not np.isfinite(p).all():
            continue
        gx = int(round_half_away((p[0] - offset[0]) * scale))
        gy = int(round_half_away((p[1] - offset[1]) * scale))
        if 0 <= gx < G and 0 <= gy < G:
            if grid[gy, gx] != 100:
                grid[gy, gx] = 100
                occ.append((gy, gx))
    if hk == 0:
        return grid
    kernel = np.zeros((2 * hk + 1, 2 * hk + 1), np.int32)
    for i in range(-hk, hk + 1):
        for j in range(-hk, hk + 1):
            z = np.exp(-0.5 * (i * i + j * j) / sigma_cells**2)
            kernel[j + hk, i + hk] = int(round_half_away(z * 100.0))
    for (gy, gx) in occ:
        for j in range(-hk, hk + 1):
            for i in range(-hk, hk + 1):
                yy, xx = gy + j, gx + i
                if 0 <= yy < G and 0 <= xx < G:
                    kv = kernel[j + hk, i + hk]
                    if kv > grid[yy, xx]:
                        grid[yy, xx] = kv
    return grid


def correlate_oracle(
    grid, offset, scale, center, x_offsets, y_offsets, angles,
    local_pts, finite, penalize,
    dist_var_penalty, ang_var_penalty, min_dist_pen, min_ang_pen,
):
    """Full response tensor (na, ny, nx) like CorrelateScan + GetResponse
    (Mapper.cpp:641-694, 712-862, 1172-1208)."""
    G = grid.shape[0]
    B = len(local_pts)
    na, ny, nx = len(angles), len(y_offsets), len(x_offsets)
    resp = np.zeros((na, ny, nx))
    for ai, ang in enumerate(angles):
        c, s = np.cos(ang), np.sin(ang)
        d = np.zeros((B, 2), np.int64)
        for b in range(B):
            rx = c * local_pts[b, 0] - s * local_pts[b, 1]
            ry = s * local_pts[b, 0] + c * local_pts[b, 1]
            d[b, 0] = round_half_away(rx * scale)
            d[b, 1] = round_half_away(ry * scale)
        for yi, yo in enumerate(y_offsets):
            cy = int(round_half_away((center[1] + yo - offset[1]) * scale))
            for xi, xo in enumerate(x_offsets):
                cx = int(round_half_away((center[0] + xo - offset[0]) * scale))
                total = 0
                for b in range(B):
                    if not finite[b]:
                        continue
                    gx, gy = cx + d[b, 0], cy + d[b, 1]
                    if 0 <= gx < G and 0 <= gy < G:
                        total += grid[gy, gx]
                r = total / (B * 100.0)
                if penalize and abs(r) > KT_TOLERANCE:
                    sqd = xo * xo + yo * yo
                    dp = max(
                        1.0 - 0.2 * sqd / dist_var_penalty, min_dist_pen
                    )
                    sqa = (ang - center[2]) ** 2
                    ap = max(
                        1.0 - 0.2 * sqa / ang_var_penalty, min_ang_pen
                    )
                    r *= dp * ap
                resp[ai, yi, xi] = r
    return resp


def best_and_tie_average(resp, center, x_offsets, y_offsets, angles):
    best = resp.max()
    na, ny, nx = resp.shape
    sx = sy = tx = ty = 0.0
    cnt = 0
    for ai in range(na):
        for yi in range(ny):
            for xi in range(nx):
                if abs(resp[ai, yi, xi] - best) <= KT_TOLERANCE:
                    sx += center[0] + x_offsets[xi]
                    sy += center[1] + y_offsets[yi]
                    tx += np.cos(angles[ai])
                    ty += np.sin(angles[ai])
                    cnt += 1
    return min(best, 1.0), np.array(
        [sx / cnt, sy / cnt, np.arctan2(ty / cnt, tx / cnt)]
    )
