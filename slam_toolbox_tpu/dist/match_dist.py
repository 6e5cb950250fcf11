"""Sharded batch correlative scoring over a device mesh.

Loop-closure candidate verification is embarrassingly parallel across
candidate chains: each candidate has its own raster and search center.
This shards the candidate batch across mesh devices (one batch entry per
shard slot) so N candidates score in the wall time of one — the
multi-chip analog of the reference's one-at-a-time TryCloseLoop sweep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_toolbox_tpu.kernels.match import _score_tensor

AXIS = "cand"


def make_sharded_scorer(mesh: Mesh, G: int):
    """Returns a jitted function scoring a sharded batch of candidates:
    grids (N, G*G+1) int8, cand_x/cand_y (N, nx), d (N, na, B, 2),
    finite (N, B) -> responses (N, na, ny, nx), all sharded on N."""

    def score_one(grid_flat, cand_x, cand_y, d, finite):
        na, nx = d.shape[0], cand_x.shape[0]
        zeros = jnp.zeros(nx, jnp.float32)
        zeros_a = jnp.zeros(na, jnp.float32)
        return _score_tensor(
            grid_flat, G, G * G, cand_x, cand_y, d, finite,
            zeros, zeros, zeros_a, jnp.float32(0.0),
            jnp.bool_(False),
            jnp.float32(1.0), jnp.float32(1.0),
            jnp.float32(0.5), jnp.float32(0.9),
        )

    def batch(grids, cand_x, cand_y, d, finite):
        return jax.vmap(score_one)(grids, cand_x, cand_y, d, finite)

    axis = mesh.axis_names[0]
    spec = P(axis)
    sharded = jax.shard_map(
        batch,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(sharded)
