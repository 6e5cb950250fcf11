"""Correlation-raster construction: batched scatter + separable Gaussian smear.

TPU-native re-design of CorrelationGrid (Mapper.h:1074-1314) and
ScanMatcher::AddScans/AddScan/SmearPoint (Mapper.cpp:1032-1105,
Mapper.h:1152-1183): instead of per-point kernel stamping, all base-scan
points are scattered at once and the Gaussian max-blend is computed as a
separable max-times dilation (exp(-(dx^2+dy^2)/2s^2) = f(dx)*f(dy) with
f >= 0, so max over the window factors into two 1-D passes).

Quantization parity: the smear output is quantized to int8 round(z*100)
exactly like the reference (Mapper.h:1258-1260) before scoring — see
match._quantize_pad and match_pallas.smear_quantize_parity (bit-identical
paths; PARITY.md row 7). The continuous [0,1] values below are an
intermediate only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def round_half_away(x):
    """Round half away from zero, matching karto::math::Round (Math.h:87-90).

    (jnp.round rounds half-to-even, which would disagree on .5 boundaries.)
    """
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def half_kernel_size(smear_deviation: float, resolution: float) -> int:
    """Smear window half-size = round(2*sigma/res) (Mapper.h:1275-1280)."""
    return int(np.floor(2.0 * smear_deviation / resolution + 0.5))


@functools.partial(jax.jit, static_argnames=("grid_size", "half_kernel"))
def rasterize_smear(
    points: jax.Array,       # (P, 2) world xy of base-scan beam endpoints
    valid: jax.Array,        # (P,) bool
    offset: jax.Array,       # (2,) world coords of grid cell (0, 0)
    scale: jax.Array,        # scalar 1/resolution
    sigma_cells: jax.Array,  # scalar smear sigma in cell units
    grid_size: int,
    half_kernel: int,
):
    """Build the (G, G) correlation raster: 1.0 at occupied cells, Gaussian
    max-blend tails around them, 0 elsewhere."""
    g = round_half_away((points - offset[None, :]) * scale).astype(jnp.int32)
    ix, iy = g[:, 0], g[:, 1]
    inb = valid & (ix >= 0) & (ix < grid_size) & (iy >= 0) & (iy < grid_size)
    ix = jnp.where(inb, ix, grid_size)  # OOB dropped by scatter mode below
    iy = jnp.where(inb, iy, grid_size)
    occ = jnp.zeros((grid_size, grid_size), jnp.float32)
    occ = occ.at[iy, ix].max(1.0, mode="drop")

    if half_kernel == 0:
        return occ

    # separable max-times Gaussian dilation
    k = jnp.arange(-half_kernel, half_kernel + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (k / sigma_cells) ** 2)  # (K,)
    pad = half_kernel

    def smear_axis(a, axis):
        p = jnp.pad(
            a,
            [(pad, pad) if d == axis else (0, 0) for d in range(2)],
        )
        out = jnp.zeros_like(a)
        for j in range(2 * half_kernel + 1):
            sl = jax.lax.slice_in_dim(p, j, j + grid_size, axis=axis)
            out = jnp.maximum(out, w[j] * sl)
        return out

    return smear_axis(smear_axis(occ, 0), 1)


def find_valid_points_structure(points: np.ndarray):
    """Precompute the viewpoint-independent structure of
    ScanMatcher::FindValidPoints (Mapper.cpp:1113-1164).

    The reference walks the beam endpoints keeping a trailing anchor: every
    time the current point is > 0.1 m from the anchor it emits a "delimiter"
    and a side-of-viewpoint test there decides whether the run of points
    since the previous delimiter is kept. Anchors depend only on the points,
    so they are cached per scan; the per-match part (the determinant sign
    against the current viewpoint) is vectorized in find_valid_mask.

    Returns (delim_idx, anchor_xy, next_delim_of_point):
      delim_idx:  (D,) indices of delimiter points
      anchor_xy:  (D, 2) the anchor (previous firstPoint) at each delimiter
      next_delim: (B,) for each point, index into delim arrays of the
                  delimiter that flushes it, or -1 if never flushed.
    """
    from slam_toolbox_tpu import native

    out = native.fvp_structure(points)
    if out is not None:
        return out
    B = len(points)
    finite = np.isfinite(points).all(axis=1)
    delim_idx, anchors = [], []
    anchor = None
    for i in range(B):
        p = points[i]
        if anchor is None:
            if finite[i]:
                anchor = p
            continue
        d = anchor - p
        if d[0] * d[0] + d[1] * d[1] > 0.01:  # (0.1 m)^2, strict >
            delim_idx.append(i)
            anchors.append(anchor.copy())
            anchor = p.copy()
    delim_idx = np.asarray(delim_idx, dtype=np.int64)
    anchors = (
        np.asarray(anchors, dtype=np.float64)
        if anchors
        else np.zeros((0, 2))
    )
    next_delim = np.full(B, -1, dtype=np.int64)
    # points strictly before delimiter d (and at/after previous delimiter)
    # are flushed by d; the delimiter point itself belongs to the next run.
    prev = 0
    for k, di in enumerate(delim_idx):
        next_delim[prev:di] = k
        prev = di
    return delim_idx, anchors, next_delim


def find_valid_mask(points: np.ndarray, structure, viewpoint: np.ndarray):
    """Per-match validity of each beam endpoint for rasterization, given the
    cached structure and the current viewpoint (Mapper.cpp:1144-1159)."""
    delim_idx, anchors, next_delim = structure
    B = len(points)
    if len(delim_idx) == 0:
        return np.zeros(B, dtype=bool)
    first = anchors  # (D,2): firstPoint at test time
    cur = points[delim_idx]  # (D,2): currentPoint
    a = viewpoint[1] - first[:, 1]
    b = first[:, 0] - viewpoint[0]
    c = first[:, 1] * viewpoint[0] - first[:, 0] * viewpoint[1]
    ss = cur[:, 0] * a + cur[:, 1] * b + c
    keep_run = ss >= 0.0  # (D,)
    mask = np.zeros(B, dtype=bool)
    has = next_delim >= 0
    mask[has] = keep_run[next_delim[has]]
    # NaN endpoints are later bounds-rejected anyway, but be explicit:
    mask &= np.isfinite(points).all(axis=1)
    return mask
