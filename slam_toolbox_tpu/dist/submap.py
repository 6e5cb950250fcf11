"""Submap sharding with halo exchange (SURVEY §5 north star).

No reference counterpart (slam_toolbox renders one global occupancy grid
in-process, Karto.h:5947-6323); this is the TPU-native multi-chip design
from BASELINE.md: the global map is decomposed into per-device ROW BANDS,
each device rasterizes only the scans whose sensor sits in its band into
a local band+halo buffer, and the halo rows — the cells a scan paints
beyond its own band — are exchanged with `jax.lax.ppermute` ring shifts
and accumulated by their owners. Because pass/hit accumulation is an
integer sum, the sharded result is BIT-EXACTLY the single-device raster
(tests/test_submap.py asserts array equality on the 8-device CPU mesh).

Halo width = range_threshold / resolution (+rounding slack): no beam can
paint a cell further from its sensor row, so (a) every scatter lands in
the owner's buffer and (b) any matcher window around a pose inside a
band is fully covered by that band's buffer — cross-boundary MATCHING
needs no communication beyond the same halo (local_window below), since
the loop matcher's 8 m search window is narrower than the 10-12 m range
threshold that sizes the halo.

When the halo is wider than a band (small maps on big meshes) the
exchange runs ceil(halo/band) ppermute hops per direction; contributions
past the global grid edge are dropped at scatter time, so the ring
wraparound carries only zeros and the non-periodic domain stays exact.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_toolbox_tpu.kernels import occupancy as occ

AXIS = "submap"


def _band_geometry(height: int, n_dev: int, halo: int):
    band = -(-height // n_dev)  # ceil
    hops = -(-halo // band)
    return band, hops


def make_sharded_raster(
    mesh: Mesh, width: int, height: int, halo: int, max_steps: int,
    min_pass_through: int = 2, occupancy_threshold: float = 0.1,
):
    """Build the jitted sharded rasterizer.

    Input (per call): beam arrays sharded over the mesh axis — device d's
    shard holds the beams of the scans assigned to band d (padded;
    bvalid=False rows are inert). Output: (n_dev*band, W) uint8 occupancy
    rows sharded over the mesh (rows >= height are padding), plus the
    pass/hit count bands for incremental reuse.
    """
    n_dev = int(mesh.devices.size)
    band, hops = _band_geometry(height, n_dev, halo)
    lh = band + 2 * halo  # local buffer height

    def shard_fn(starts, ends, bvalid, evalid):
        d = jax.lax.axis_index(AXIS)
        row0 = d * band - halo  # global row of local buffer row 0

        # scatter this device's beams into its band+halo buffer; cells
        # outside the GLOBAL grid are dropped here, which is also what
        # keeps the ring wraparound zero-filled (module docstring)
        x0, y0 = starts[:, 0], starts[:, 1]
        x1g, y1g = ends[:, 0], ends[:, 1]
        y0l = y0 - row0
        y1l = y1g - row0

        steep = jnp.abs(y1l - y0l) > jnp.abs(x1g - x0)
        ax0 = jnp.where(steep, y0l, x0)
        ay0 = jnp.where(steep, x0, y0l)
        ax1 = jnp.where(steep, y1l, x1g)
        ay1 = jnp.where(steep, x1g, y1l)
        flip = ax0 > ax1
        bx0 = jnp.where(flip, ax1, ax0)
        by0 = jnp.where(flip, ay1, ay0)
        bx1 = jnp.where(flip, ax0, ax1)
        by1 = jnp.where(flip, ay0, ay1)
        dx = bx1 - bx0
        dy = jnp.abs(by1 - by0)
        ystep = jnp.where(by0 < by1, 1, -1)

        k = jnp.arange(max_steps, dtype=jnp.int32)[None, :]
        dx_safe = jnp.maximum(dx, 1)[:, None]
        minor_off = (2 * k * dy[:, None] + dx[:, None]) // (2 * dx_safe)
        maj = bx0[:, None] + k
        mnr = by0[:, None] + ystep[:, None] * minor_off
        px = jnp.where(steep[:, None], mnr, maj)
        pyl = jnp.where(steep[:, None], maj, mnr)
        pyg = pyl + row0  # back to global rows for the bounds check
        ok = (
            bvalid[:, None]
            & (k <= dx[:, None])
            & (px >= 0) & (px < width)
            & (pyg >= 0) & (pyg < height)
            & (pyl >= 0) & (pyl < lh)
        )
        flat = jnp.where(ok, pyl * width + px, lh * width)
        pass_flat = jnp.zeros((lh * width + 1,), jnp.int32)
        pass_flat = pass_flat.at[flat.ravel()].add(1, mode="drop")

        y1l_ok = (
            bvalid & evalid
            & (x1g >= 0) & (x1g < width)
            & (y1g >= 0) & (y1g < height)
            & (y1l >= 0) & (y1l < lh)
        )
        eflat = jnp.where(y1l_ok, y1l * width + x1g, lh * width)
        pass_flat = pass_flat.at[eflat].add(1, mode="drop")
        hit_flat = jnp.zeros((lh * width + 1,), jnp.int32)
        hit_flat = hit_flat.at[eflat].add(1, mode="drop")
        pass_l = pass_flat[:-1].reshape(lh, width)
        hit_l = hit_flat[:-1].reshape(lh, width)

        # halo exchange: every device keeps its own mid-band and absorbs
        # the overlapping halo rows of senders up to `hops` bands away
        def exchange(buf):
            owned = buf[halo:halo + band]
            for kk in range(1, hops + 1):
                # receive from band d-kk (its buffer shifted up): my
                # owned global row r maps to sender-buffer row
                # r - (d-kk)*band + halo = local + kk*band + halo
                up = jax.lax.ppermute(
                    buf, AXIS,
                    [(i, (i + kk) % n_dev) for i in range(n_dev)],
                )
                lo = kk * band + halo
                hi = min(lh, lo + band)
                if hi > lo:
                    owned = owned.at[0:hi - lo].add(up[lo:hi])
                # receive from band d+kk: sender-buffer row =
                # local + halo - kk*band
                down = jax.lax.ppermute(
                    buf, AXIS,
                    [(i, (i - kk) % n_dev) for i in range(n_dev)],
                )
                lo2 = halo - kk * band
                lo2c = max(lo2, 0)
                hi2c = min(lo2 + band, lh)
                if hi2c > lo2c:
                    owned = owned.at[lo2c - lo2:hi2c - lo2].add(
                        down[lo2c:hi2c]
                    )
            return owned

        pass_b = exchange(pass_l)
        hit_b = exchange(hit_l)
        cells_b = occ.update_cells(
            pass_b, hit_b, min_pass_through, occupancy_threshold
        )
        return cells_b, pass_b, hit_b

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded), band


def assign_scans_to_bands(
    scans: List, offset, scale, height: int, band: int, n_dev: int,
):
    """Host-side: group scans by the band owning their sensor row."""
    from slam_toolbox_tpu.kernels.rasterize import round_half_away

    groups = [[] for _ in range(n_dev)]
    for s in scans:
        if s is None:
            continue
        cy = int(round_half_away((s.sensor_pose[1] - offset[1]) * scale))
        d = min(max(cy, 0), height - 1) // band
        groups[int(min(d, n_dev - 1))].append(s)
    return groups


def sharded_occupancy(
    mesh: Mesh, scans: List, resolution: float,
    min_pass_through: int = 2, occupancy_threshold: float = 0.1,
):
    """End-to-end sharded render: compute dimensions, assign scans to
    bands, raster + halo-exchange on the mesh, return an OccupancyGrid
    equal to kernels.occupancy.create_from_scans (tests assert
    bit-exactness)."""
    n_dev = int(mesh.devices.size)
    width, height, offset = occ.compute_dimensions(scans, resolution)
    width, height = max(width, 1), max(height, 1)
    scale = 1.0 / resolution
    rt = max(
        s.laser.range_threshold for s in scans if s is not None
    )
    halo = int(np.ceil(rt * scale)) + 2
    band, _ = _band_geometry(height, n_dev, halo)

    groups = assign_scans_to_bands(
        scans, offset, scale, height, band, n_dev
    )
    per_dev = [occ._beam_cells(g, offset, scale) if g else None
               for g in groups]
    n_beams = max(
        (len(p[2]) for p in per_dev if p is not None), default=1
    )
    # one beam-count bucket (pow2) across devices per call
    nb = 1
    while nb < n_beams:
        nb <<= 1
    starts = np.zeros((n_dev, nb, 2), np.int32)
    ends = np.zeros((n_dev, nb, 2), np.int32)
    bvalid = np.zeros((n_dev, nb), bool)
    evalid = np.zeros((n_dev, nb), bool)
    for d, p in enumerate(per_dev):
        if p is None:
            continue
        st, en, bv, ev = p
        m = len(bv)
        starts[d, :m] = st
        ends[d, :m] = en
        bvalid[d, :m] = bv
        evalid[d, :m] = ev

    max_steps = int(np.ceil(rt * scale)) + 8  # matches occ._accumulate
    fn, band = make_sharded_raster(
        mesh, width, height, halo, max_steps,
        min_pass_through, occupancy_threshold,
    )
    cells, pass_b, hit_b = fn(
        jnp.asarray(starts.reshape(n_dev * nb, 2)),
        jnp.asarray(ends.reshape(n_dev * nb, 2)),
        jnp.asarray(bvalid.reshape(-1)),
        jnp.asarray(evalid.reshape(-1)),
    )
    cells = np.asarray(cells)[:height]
    grid = occ.OccupancyGrid(
        cells, offset, resolution,
        pass_cnt=np.asarray(pass_b)[:height],
        hit_cnt=np.asarray(hit_b)[:height],
    )
    return grid


def maybe_sharded_create_from_scans(
    scans: List, resolution: float,
    min_pass_through: int = 2, occupancy_threshold: float = 0.1,
):
    """Live-path entry (round-4 wiring): route big occupancy renders
    through the row-band sharded raster whenever more than one device is
    attached, falling back to the single-device
    kernels.occupancy.create_from_scans otherwise. Bit-exact either way
    (integer accumulation; tests/test_submap.py), so callers
    (SlamSession.get_occupancy_grid full rebuilds, MapMerger.merge) can
    switch on topology alone. SLAM_SHARDED_RASTER=1 forces the sharded
    path, =0 disables it; default 'auto' requires a multi-device mesh
    AND a grid big enough (> ~8M cells) that the per-geometry shard_map
    compile amortizes."""
    import os

    mode = os.environ.get("SLAM_SHARDED_RASTER", "auto")
    n_dev = jax.device_count()
    use = False
    if mode == "1":
        use = n_dev > 1
    elif mode != "0" and n_dev > 1 and (
        jax.devices()[0].platform != "cpu"
    ):
        # auto only on REAL accelerator meshes: a virtual CPU mesh is
        # one host — shard_map adds collectives without adding memory
        # bandwidth, and the single-host native Bresenham accumulator
        # (graph_ops.cpp, the documented choice for the 500k merge —
        # XLA scatter serializes at ~8M updates/s) stays faster
        live = [s for s in scans if s is not None]
        if live:
            w, h, _ = occ.compute_dimensions(live, resolution)
            use = w * h > 8_000_000
    if use:
        mesh = Mesh(np.array(jax.devices()), (AXIS,))
        return sharded_occupancy(
            mesh, scans, resolution, min_pass_through,
            occupancy_threshold,
        )
    return occ.create_from_scans(
        scans, resolution, min_pass_through, occupancy_threshold
    )


def make_halo_refresh(mesh: Mesh, band: int, halo: int, width: int):
    """After the owner accumulation each device holds COMPLETE counts
    for its own band only. This second ppermute round hands every device
    the adjacent rows of its neighbors' owned bands, yielding a complete
    (band + 2*halo, W) local view — after which any matcher window
    around a pose inside the band is a pure local slice (local_window),
    with zero per-query communication. One refresh per map epoch
    amortizes over every match against it."""
    n_dev = int(mesh.devices.size)
    hops = -(-halo // band)
    lh = band + 2 * halo

    def f(owned):
        d = jax.lax.axis_index(AXIS)
        full = jnp.zeros((lh, owned.shape[1]), owned.dtype)
        full = full.at[halo:halo + band].set(owned)
        for kk in range(1, hops + 1):
            up = jax.lax.ppermute(  # owned band of device d-kk
                owned, AXIS,
                [(i, (i + kk) % n_dev) for i in range(n_dev)],
            )
            # the ring wraps: device d receives (d-kk)%n_dev, which for
            # d < kk is a REAL band from the far edge, not the zero
            # padding the raster exchange could rely on — mask the paste
            # to senders that actually exist above/below
            up = jnp.where(d - kk >= 0, up, jnp.zeros_like(up))
            # sender's owned global rows [(d-kk)*band, ...) land at local
            # rows [halo - kk*band, halo - kk*band + band)
            lo = halo - kk * band
            lo_c, hi_c = max(lo, 0), min(lo + band, lh)
            if hi_c > lo_c:
                full = full.at[lo_c:hi_c].set(up[lo_c - lo:hi_c - lo])
            down = jax.lax.ppermute(
                owned, AXIS,
                [(i, (i - kk) % n_dev) for i in range(n_dev)],
            )
            down = jnp.where(
                d + kk < n_dev, down, jnp.zeros_like(down)
            )
            lo = halo + kk * band
            lo_c, hi_c = max(lo, 0), min(lo + band, lh)
            if hi_c > lo_c:
                full = full.at[lo_c:hi_c].set(down[lo_c - lo:hi_c - lo])
        return full

    return jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(AXIS),), out_specs=P(AXIS),
        check_vma=False,
    ))


def local_window(full_pass, full_hit, band: int, halo: int, d: int,
                 row_lo: int, row_hi: int):
    """Extract global rows [row_lo, row_hi) around a query pose from
    band d's refreshed (band + 2*halo) local view — the window any
    matcher needs around a pose inside band d (window half-height <=
    halo by construction: search windows are narrower than the range
    threshold that sizes the halo)."""
    r0 = d * band
    lo_l = row_lo - r0 + halo
    hi_l = row_hi - r0 + halo
    assert 0 <= lo_l and hi_l <= band + 2 * halo, (
        "window exceeds the halo — widen halo or shrink the window"
    )
    return full_pass[lo_l:hi_l], full_hit[lo_l:hi_l]
