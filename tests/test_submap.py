"""Submap sharding with halo exchange (dist/submap.py) — VERDICT r2 #5.

The sharded raster decomposes the map into per-device row bands; pass/hit
accumulation is an integer sum, so after the ppermute halo exchange the
concatenated owned bands must equal the single-device raster BIT-EXACTLY
— including when the halo spans multiple bands (multi-hop exchange) and
at the non-periodic edges (ring wraparound must carry zeros)."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.dist import submap
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
from slam_toolbox_tpu.kernels import occupancy as occ


@pytest.fixture(scope="module")
def posed_scans():
    """Ground-truth-posed scans across a tall world so every band owns
    some scans (bands split on rows = world y)."""
    from test_pipeline import sim_config

    laser, _ = sim_config()
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.0, 0.0), seed=3)
    waypoints = np.array([
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
        (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0),
    ])
    data = sim.simulate(waypoints, step=0.6)
    scans = []
    for i, (scan, tp) in enumerate(data):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        s.set_corrected_pose(tp)  # exact poses: rendering-only test
        scans.append(s)
    return scans


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    assert len(devices) >= 8
    return Mesh(np.array(devices[:8]), (submap.AXIS,))


def test_sharded_raster_bit_exact(posed_scans, mesh8):
    res = 0.05
    ref = occ.create_from_scans(posed_scans, res)
    got = submap.sharded_occupancy(mesh8, posed_scans, res)
    np.testing.assert_array_equal(got.pass_cnt, ref.pass_cnt)
    np.testing.assert_array_equal(got.hit_cnt, ref.hit_cnt)
    np.testing.assert_array_equal(got.cells, ref.cells)
    assert np.asarray(got.offset).tolist() == \
        np.asarray(ref.offset).tolist()
    # the exchange is multi-hop on this geometry (halo > band): assert
    # we exercised the hard case, not the trivial 1-hop one
    width, height, _ = occ.compute_dimensions(posed_scans, res)
    rt = posed_scans[0].laser.range_threshold
    halo = int(np.ceil(rt / res)) + 2
    band, hops = submap._band_geometry(height, 8, halo)
    assert hops >= 2, f"halo {halo} vs band {band}: 1-hop only"


def test_sharded_raster_coarse_resolution_single_hop(posed_scans, mesh8):
    """Coarser grid -> halo fits one band: the 1-hop path must also be
    exact (different clipping branches)."""
    res = 0.35
    ref = occ.create_from_scans(posed_scans, res)
    got = submap.sharded_occupancy(mesh8, posed_scans, res)
    np.testing.assert_array_equal(got.pass_cnt, ref.pass_cnt)
    np.testing.assert_array_equal(got.cells, ref.cells)


def test_halo_refresh_gives_local_matcher_windows(posed_scans, mesh8):
    """After halo_refresh every device holds a complete band+2*halo view:
    any matcher window around a pose inside its band equals the global
    counts slice, with no per-query communication."""
    res = 0.1
    ref = occ.create_from_scans(posed_scans, res)
    height = ref.pass_cnt.shape[0]
    rt = posed_scans[0].laser.range_threshold
    halo = int(np.ceil(rt / res)) + 2
    band, _ = submap._band_geometry(height, 8, halo)

    got = submap.sharded_occupancy(mesh8, posed_scans, res)
    pad_h = band * 8
    owned = np.zeros((pad_h, ref.pass_cnt.shape[1]), np.int32)
    owned[:height] = got.pass_cnt
    refresh = submap.make_halo_refresh(
        mesh8, band, halo, ref.pass_cnt.shape[1]
    )
    full = np.asarray(refresh(owned))  # (8*(band+2halo), W) stacked
    lh = band + 2 * halo
    ref_padded = np.zeros_like(owned)
    ref_padded[:height] = ref.pass_cnt
    for d in range(8):
        full_d = full[d * lh:(d + 1) * lh]
        # probe a window centered mid-band, clipped to the halo budget
        mid = d * band + band // 2
        w = min(halo, 40)
        lo, hi = mid - w, mid + w
        if lo < 0 or hi > pad_h:
            continue
        win_pass, _ = submap.local_window(
            full_d, full_d, band, halo, d, lo, hi
        )
        np.testing.assert_array_equal(
            win_pass, ref_padded[lo:hi],
            err_msg=f"band {d} window [{lo}:{hi}]",
        )


def test_wired_live_path_bit_exact(posed_scans, monkeypatch):
    """Round-4 wiring: the live entry (SlamSession.get_occupancy_grid /
    MapMerger.merge route through maybe_sharded_create_from_scans) must
    produce the single-device raster bit-exactly when forced onto the
    mesh."""
    res = 0.1
    monkeypatch.setenv("SLAM_SHARDED_RASTER", "1")
    sharded = submap.maybe_sharded_create_from_scans(posed_scans, res)
    monkeypatch.setenv("SLAM_SHARDED_RASTER", "0")
    single = submap.maybe_sharded_create_from_scans(posed_scans, res)
    np.testing.assert_array_equal(sharded.cells, single.cells)
    np.testing.assert_allclose(sharded.offset, single.offset)


def test_wired_auto_gate_small_grid(posed_scans, monkeypatch):
    """auto mode keeps small grids on the single-device path (the
    per-geometry shard_map compile only amortizes on big maps)."""
    monkeypatch.setenv("SLAM_SHARDED_RASTER", "auto")
    called = {}
    orig = submap.sharded_occupancy

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(submap, "sharded_occupancy", spy)
    submap.maybe_sharded_create_from_scans(posed_scans, 0.1)
    assert "yes" not in called  # ~200x160 cells: far below the gate
