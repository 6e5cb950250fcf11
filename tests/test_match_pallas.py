"""Pallas coarse-score kernel vs the XLA scalar-gather reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_toolbox_tpu.kernels import match_pallas as mp
from slam_toolbox_tpu.kernels.match import _score_tensor


@pytest.mark.parametrize("seed", [0, 1])
def test_score_windows_matches_scalar_gather(seed):
    rng = np.random.default_rng(seed)
    G, B, na, nxy = 257, 97, 5, 26
    grid2d = rng.integers(0, 101, (G, G)).astype(np.int8)
    grid_flat = np.concatenate(
        [grid2d.reshape(-1), np.zeros(1, np.int8)]
    )
    # candidate lattice: stride 2 starting at cand0
    cand0 = 31
    cand = (cand0 + 2 * np.arange(nxy)).astype(np.int32)
    d = rng.integers(-140, 140, (na, B, 2)).astype(np.int32)
    finite = rng.random(B) > 0.1

    # XLA reference: raw (unpenalized) response sums
    resp_ref = _score_tensor(
        jnp.asarray(grid_flat), G, G * G,
        jnp.asarray(cand), jnp.asarray(cand), jnp.asarray(d),
        jnp.asarray(finite),
        jnp.zeros(nxy, jnp.float32), jnp.zeros(nxy, jnp.float32),
        jnp.zeros(na, jnp.float32), jnp.float32(0.0),
        jnp.bool_(False),
        jnp.float32(1.0), jnp.float32(1.0),
        jnp.float32(0.5), jnp.float32(0.9),
    )
    sum_ref = np.asarray(resp_ref) * (B * 100.0)  # undo normalization

    pgrid = mp.prepare_parity_grid(jnp.asarray(grid2d))
    tbl = mp.prepare_tables(
        jnp.asarray(d), np.int32(cand0), np.int32(cand0),
        jnp.asarray(finite), G,
    )
    out = mp.score_windows(pgrid, tbl, interpret=True)
    sums = np.asarray(out)[:, :nxy, :nxy].astype(np.float64)
    np.testing.assert_allclose(sums, np.round(sum_ref), atol=0.5)


def test_prepare_tables_negative_coords():
    """Negative base cells must keep floor/parity semantics."""
    d = np.array([[[-3, -5]]], np.int32)  # dx=-3, dy=-5
    tbl = np.asarray(mp.prepare_tables(
        jnp.asarray(d), np.int32(0), np.int32(0),
        jnp.asarray(np.array([True])), 101,
    ))
    p, r, c, v = tbl[0, :, 0]  # layout (na, 4, B)
    assert p == 2 * 1 + 1  # row -5 odd, col -3 odd
    assert r == -3 + mp.PAD_TOP  # floor(-5/2) = -3
    assert c == -2 + mp.PAD_LEFT
    assert v == 1


@pytest.mark.parametrize("G,hk", [(101, 5), (100, 4), (257, 10)])
def test_rasterize_parity_matches_split_raster(G, hk):
    """Direct-parity scatter+smear+quantize must be bit-exact vs the
    full-grid raster followed by prepare_parity_grid."""
    from slam_toolbox_tpu.kernels import rasterize as rz
    from slam_toolbox_tpu.kernels.match import _raster_quant_impl

    rng = np.random.default_rng(G)
    P = 256
    pts = jnp.asarray(
        rng.uniform(-0.1 * G, 1.1 * G, (P, 2)).astype(np.float32) * 0.01
    )
    valid = jnp.asarray(rng.random(P) < 0.9)
    offset = jnp.zeros(2, jnp.float32)
    scale, sigma = np.float32(100.0), np.float32(hk / 2.0)

    grid = rz.rasterize_smear(pts, valid, offset, scale, sigma, G, hk)
    q2d = rz.round_half_away(grid * 100.0).astype(jnp.int8)
    ref = np.asarray(mp.prepare_parity_grid(q2d, 32))

    got = np.asarray(mp.rasterize_parity(
        pts, valid, offset, scale, sigma, G, hk, 32
    ))
    np.testing.assert_array_equal(got, ref)

    # and the fused producer returns (flat view, parity grid)
    flat, pgrid = _raster_quant_impl(
        pts, valid, offset, scale, sigma, G, hk, 32, True
    )
    np.testing.assert_array_equal(np.asarray(pgrid), ref)
    np.testing.assert_array_equal(
        np.asarray(flat), ref.reshape(-1)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_score_fine3_parity_matches_scalar_gather(seed):
    """Packed-row fine scorer vs the scalar-gather path, including
    candidates at and beyond the grid edges."""
    from slam_toolbox_tpu.kernels.match import (
        _score_tensor, _score_fine3_parity)

    rng = np.random.default_rng(seed)
    G, B, na = 257, 97, 7
    grid2d = rng.integers(0, 101, (G, G)).astype(np.int8)
    pgrid = mp.prepare_parity_grid(jnp.asarray(grid2d))
    pflat = jnp.asarray(np.asarray(pgrid).reshape(-1))
    # candidate bases spanning off-grid to far edge; consecutive cells
    base = rng.integers(-6, G + 3, 2)
    cand_x = jnp.asarray((base[0] + np.arange(3)).astype(np.int32))
    cand_y = jnp.asarray((base[1] + np.arange(3)).astype(np.int32))
    d = jnp.asarray(rng.integers(-200, 200, (na, B, 2)).astype(np.int32))
    finite = jnp.asarray(rng.random(B) > 0.1)
    args = (
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.zeros(na, jnp.float32), jnp.float32(0.0),
        jnp.bool_(True),
        jnp.float32(1.0), jnp.float32(1.0),
        jnp.float32(0.5), jnp.float32(0.9),
    )
    ref = _score_tensor(
        pflat, G, 0, cand_x, cand_y, d, finite, *args, parity_acc_r=32,
    )
    got = _score_fine3_parity(
        pgrid, G, cand_x, cand_y, d, finite, *args, acc_r=32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_parity_flat_index_gathers_match():
    """_flat_parts parity indexing reads the same cells as row-major."""
    from slam_toolbox_tpu.kernels.match import _flat_parts

    G, acc_r = 101, 32
    rng = np.random.default_rng(7)
    grid2d = rng.integers(0, 101, (G, G)).astype(np.int8)
    pgrid = np.asarray(mp.prepare_parity_grid(jnp.asarray(grid2d), acc_r))
    pflat = pgrid.reshape(-1)
    gy = jnp.asarray(rng.integers(0, G, 500).astype(np.int32))
    gx = jnp.asarray(rng.integers(0, G, 500).astype(np.int32))
    ya, xa = _flat_parts(gy, gx, G, acc_r)
    got = pflat[np.asarray(ya + xa)]
    np.testing.assert_array_equal(
        got, grid2d[np.asarray(gy), np.asarray(gx)]
    )
    # index 0 (the invalid-gather sink) is a zero border cell
    assert pflat[0] == 0
