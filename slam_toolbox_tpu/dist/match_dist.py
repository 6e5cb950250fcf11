"""Sharded loop-candidate matching over a device mesh.

Loop-closure candidate verification is embarrassingly parallel across
candidate chains: each chain has its own raster and the same query scan.
`match_chains_sharded` rasterizes + scores every chain concurrently, one
chain per mesh slot (shard_map over the chain axis), so N candidates cost
the wall time of ceil(N / n_devices) — the multi-chip analog of the
reference's one-at-a-time TryCloseLoop sweep (Mapper.cpp:1500-1561).

Integration: PoseGraph.try_close_loop routes its coarse candidate
fan-out here whenever more than one device is visible (the Pallas fused
verify stays the single-chip TPU path). Results are the same
`_raster_quant_impl` -> `_score_impl` pipeline the per-chain path runs,
vmapped — equivalence is tested (tests/test_dist.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_toolbox_tpu.kernels.match import (
    Matcher, _raster_quant_impl, _scan1, _score_impl,
)


def _pow2(n: int, floor: int = 1) -> int:
    p = floor
    while p < n:
        p <<= 1
    return p


def default_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()), ("cand",))


def _sharded_fn(matcher: Matcher, mesh: Mesh):
    """One jitted shard_map per (matcher geometry, mesh); shape buckets
    re-specialize under the same jit."""
    cache = getattr(matcher, "_dist_match_cache", None)
    if cache is None:
        cache = matcher._dist_match_cache = {}
    key = (id(mesh), mesh.devices.size)
    fn = cache.get(key)
    if fn is not None:
        return fn
    sa = dict(matcher._score_args)
    st = dict(matcher._score_static)
    scale = np.float32(matcher.scale)
    sigma = np.float32(matcher.sigma_cells)
    G, hk, acc_r = matcher.G, matcher.half_kernel, matcher._acc_r
    axis = mesh.axis_names[0]

    def one(pts, valid, center_off, local_pts, finite):
        grid_flat, _ = _raster_quant_impl(
            pts, valid, center_off[3:5], scale, sigma,
            grid_size=G, half_kernel=hk, acc_r=acc_r, parity=False,
        )
        return _score_impl(
            grid_flat, None, center_off, local_pts, finite,
            penalize=jnp.bool_(False), refine=False, **sa, **st,
        )

    def batch(pts, valid, center_off, local_pts, finite):
        return jax.vmap(one, in_axes=(0, 0, None, None, None))(
            pts, valid, center_off, local_pts, finite
        )

    fn = jax.jit(jax.shard_map(
        _scan1(batch),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    ))
    cache[key] = fn
    return fn


def match_chains_sharded(matcher: Matcher, scan, base_sets, mesh=None):
    """Coarse-match `scan` against every chain in `base_sets`
    concurrently across the mesh. Drop-in for
    `matcher.match_scans_batch(scan, base_sets, penalize=False,
    refine=False)` — same per-chain raster + score pipeline, one chain
    per device slot."""
    if not base_sets:
        return []
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    from slam_toolbox_tpu.kernels.match import _scan_device_cache

    center = np.asarray(scan.sensor_pose, dtype=np.float64)
    local_dev, finite_dev = _scan_device_cache(scan)
    off = center[:2] - 0.5 * (matcher.G - 1) * matcher.resolution
    center_off = jnp.asarray(
        np.concatenate([center, off]).astype(np.float32)
    )

    pts_list, valid_list = [], []
    for base in base_sets:
        pts_p, valid_p = matcher._base_points(base, center[:2])
        pts_list.append(np.asarray(pts_p))
        valid_list.append(np.asarray(valid_p))
    # common point bucket across chains (each _base_points output is
    # already bucketed; pad to the max, padding rows masked invalid)
    p_max = _pow2(max(p.shape[0] for p in pts_list), 64)
    S = len(base_sets)
    s_pad = ((_pow2(S, 1) + n_dev - 1) // n_dev) * n_dev
    pts = np.zeros((s_pad, p_max, 2), np.float32)
    valid = np.zeros((s_pad, p_max), bool)
    for i, (p, v) in enumerate(zip(pts_list, valid_list)):
        pts[i, : p.shape[0]] = p
        valid[i, : v.shape[0]] = v

    fn = _sharded_fn(matcher, mesh)
    rows = fn(
        jnp.asarray(pts), jnp.asarray(valid), center_off,
        local_dev, finite_dev,
    )
    rows.block_until_ready()
    return Matcher.results_from_packed(np.asarray(rows)[:S])
