"""Occupancy renderer tests: Bresenham closed form vs the literal reference
loop, plus a behavioral map test."""
import numpy as np
import jax.numpy as jnp

from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.kernels import occupancy as occ
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld


def bresenham_ref(x0, y0, x1, y1):
    """Literal re-simulation of Grid::TraceLine (Karto.h:4874-4927)."""
    cells = []
    steep = abs(y1 - y0) > abs(x1 - x0)
    if steep:
        x0, y0, x1, y1 = y0, x0, y1, x1
    if x0 > x1:
        x0, x1, y0, y1 = x1, x0, y1, y0
    dx = x1 - x0
    dy = abs(y1 - y0)
    error = 0
    ystep = 1 if y0 < y1 else -1
    y = y0
    for x in range(x0, x1 + 1):
        px, py = (y, x) if steep else (x, y)
        error += dy
        if 2 * error >= dx:
            y += ystep
            error -= dx
        cells.append((px, py))
    return cells


def test_trace_matches_bresenham():
    rng = np.random.default_rng(5)
    W = H = 64
    n = 200
    starts = rng.integers(0, W, size=(n, 2)).astype(np.int32)
    ends = rng.integers(0, W, size=(n, 2)).astype(np.int32)
    bvalid = np.ones(n, bool)
    evalid = np.zeros(n, bool)  # isolate the trace pass counts
    pass_cnt, hit_cnt = occ.trace_beams(
        jnp.zeros((H, W), jnp.int32), jnp.zeros((H, W), jnp.int32),
        jnp.asarray(starts), jnp.asarray(ends),
        jnp.asarray(bvalid), jnp.asarray(evalid),
        W, H, 128,
    )
    ref = np.zeros((H, W), np.int64)
    for (sx, sy), (ex, ey) in zip(starts, ends):
        for (px, py) in bresenham_ref(sx, sy, ex, ey):
            if 0 <= px < W and 0 <= py < H:
                ref[py, px] += 1
    np.testing.assert_array_equal(np.asarray(pass_cnt), ref)
    assert np.asarray(hit_cnt).sum() == 0


def test_map_of_square_room():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    world = SegmentWorld.box(4.0)
    sim = LidarSimulator(world, laser, range_noise=0.0, seed=1)
    scans = []
    for pose in [(-2, -2, 0.3), (2, -2, 1.2), (2, 2, -2.0), (-2, 2, 2.4),
                 (0, 0, 0.0)]:
        r = sim.scan_at(np.array(pose, dtype=np.float64))
        scans.append(LocalizedScan(laser, r, np.array(pose, np.float64)))
    grid = occ.create_from_scans(scans, 0.1, min_pass_through=1)
    cells = grid.cells
    # center should be free, walls occupied
    c = grid.world_to_grid((0.0, 0.0))
    assert cells[c[1], c[0]] == occ.FREE
    # right wall at bbox max rounds off-grid like the reference (endpoint
    # dropped, Karto.h:6233); probe the left wall which is on-grid
    w = grid.world_to_grid((-3.95, 0.0))
    patch = cells[w[1] - 2:w[1] + 3, max(w[0] - 2, 0):w[0] + 3]
    assert (patch == occ.OCCUPIED).any()
    occupied = (cells == occ.OCCUPIED).sum()
    free = (cells == occ.FREE).sum()
    assert occupied > 100
    assert free > 3000  # 8x8 m interior at 0.1 res


def test_incremental_equals_full_rebuild():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    sim = LidarSimulator(SegmentWorld.box(4.0), laser, range_noise=0.0,
                         seed=1)
    scans = []
    for pose in [(-2, -2, 0.3), (2, -2, 1.2), (2, 2, -2.0), (-2, 2, 2.4),
                 (0, 0, 0.0)]:
        r = sim.scan_at(np.array(pose, dtype=np.float64))
        scans.append(LocalizedScan(laser, r, np.array(pose, np.float64)))
    full = occ.create_from_scans(scans, 0.1, min_pass_through=1)
    base = occ.OccupancyGrid(
        np.zeros_like(full.cells), full.offset, full.resolution,
        pass_cnt=np.zeros_like(full.pass_cnt),
        hit_cnt=np.zeros_like(full.hit_cnt),
    )
    inc = occ.add_scans_incremental(base, scans[:3], min_pass_through=1)
    inc = occ.add_scans_incremental(inc, scans[3:], min_pass_through=1)
    np.testing.assert_array_equal(inc.pass_cnt, full.pass_cnt)
    np.testing.assert_array_equal(inc.hit_cnt, full.hit_cnt)
    np.testing.assert_array_equal(inc.cells, full.cells)


def test_ray_cast():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    world = SegmentWorld.box(4.0)
    sim = LidarSimulator(world, laser, range_noise=0.0, seed=1)
    scans = []
    for pose in [(-2, 0, 0.0), (2, 0, np.pi), (0, 0, 1.0)]:
        r = sim.scan_at(np.array(pose, dtype=np.float64))
        scans.append(LocalizedScan(laser, r, np.array(pose, np.float64)))
    grid = occ.create_from_scans(scans, 0.1, min_pass_through=1)
    d = grid.ray_cast(np.array([0.0, 0.0, 0.0]), 8.0)
    assert 3.4 < d < 4.4


def test_native_raster_matches_xla(monkeypatch):
    """The native host Bresenham (graph_ops.cpp occupancy_raster) must
    produce counters identical to the XLA trace_beams closed form."""
    from slam_toolbox_tpu import native
    from slam_toolbox_tpu.kernels import occupancy as occ

    if native.get_lib() is None or not hasattr(
        native.get_lib(), "occupancy_raster"
    ):
        import pytest

        pytest.skip("native lib unavailable")
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    sim = LidarSimulator(SegmentWorld.box(4.0), laser, range_noise=0.01,
                         seed=5)
    rng = np.random.default_rng(5)
    scans = []
    for k in range(24):
        pose = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                         rng.uniform(-np.pi, np.pi)])
        r = sim.scan_at(pose)
        scans.append(LocalizedScan(laser, r, pose))
    monkeypatch.setenv("SLAM_NATIVE_OCC", "0")
    g_xla = occ.create_from_scans(scans, 0.05)
    monkeypatch.setenv("SLAM_NATIVE_OCC", "1")
    g_nat = occ.create_from_scans(scans, 0.05)
    np.testing.assert_array_equal(g_nat.pass_cnt, g_xla.pass_cnt)
    np.testing.assert_array_equal(g_nat.hit_cnt, g_xla.hit_cnt)
    np.testing.assert_array_equal(g_nat.cells, g_xla.cells)
