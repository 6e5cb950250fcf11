"""Distributed SE(2) pose-graph solve over a device mesh.

No reference counterpart exists (slam_toolbox is single-process; SURVEY.md
§2.1 "parallelism"); this is the TPU-native design from BASELINE.json: edges
of the pose graph are sharded across devices, each device builds its local
contribution to the Gauss-Newton normal equations, the block-diagonal and
gradient are psum-reduced over ICI, and the PCG iteration runs with a
distributed Hx product (local off-diagonal scatter + psum per iteration).
Poses are replicated — at SLAM sizes (N <= 1e6 nodes, 36 B/node) the pose
vector is tiny; it is the per-edge work (residuals, 3x3 block products)
that scales, and that is what shards.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_toolbox_tpu.solver.se2_solver import (
    edge_jacobians, edge_residual,
)

AXIS = "graph"


def make_distributed_gn_step(mesh: Mesh, n_nodes: int, cg_iters: int = 50):
    """Returns a jitted, shard_mapped function computing one damped GN step.

    Inputs (global shapes):
      poses (N,3) replicated; src/dst (E,), rel (E,3), sqrt_info (E,3,3),
      emask (E,) sharded over the mesh axis; free (N,) replicated;
      lm_lambda scalar.
    Output: (new_poses (N,3), chi2 scalar) replicated.
    """

    def local_normal(poses, src, dst, rel, sqrt_info, emask):
        r = edge_residual(poses, src, dst, rel, sqrt_info, emask)
        ja, jb = edge_jacobians(poses, src, dst, rel, sqrt_info, emask)
        haa = jnp.einsum("eji,ejk->eik", ja, ja)
        hbb = jnp.einsum("eji,ejk->eik", jb, jb)
        hab = jnp.einsum("eji,ejk->eik", ja, jb)
        diag = jnp.zeros((n_nodes, 3, 3), poses.dtype)
        diag = diag.at[src].add(haa, mode="drop")
        diag = diag.at[dst].add(hbb, mode="drop")
        grad = jnp.zeros((n_nodes, 3), poses.dtype)
        grad = grad.at[src].add(
            -jnp.einsum("eji,ej->ei", ja, r), mode="drop"
        )
        grad = grad.at[dst].add(
            -jnp.einsum("eji,ej->ei", jb, r), mode="drop"
        )
        return diag, hab, grad, jnp.sum(r * r)

    def step(poses, src, dst, rel, sqrt_info, emask, free, lm_lambda):
        diag_l, hab, grad_l, chi2_l = local_normal(
            poses, src, dst, rel, sqrt_info, emask
        )
        # reduce the block-diagonal + gradient over the edge shards (ICI)
        diag = jax.lax.psum(diag_l, AXIS)
        grad = jax.lax.psum(grad_l, AXIS)
        chi2 = jax.lax.psum(chi2_l, AXIS)

        eye = jnp.eye(3, dtype=poses.dtype)
        damp = lm_lambda * jnp.einsum("nii->n", diag)[:, None, None] * eye / 3.0
        diag_d = diag + damp + 1e-8 * eye
        b = grad * free[:, None]

        # odometry-chain preconditioner: chain coupling blocks are built
        # from the local edge shard and psum-reduced, then every device
        # runs the same parallel-cyclic-reduction solve on the replicated
        # tridiagonal system (O(log n) depth)
        import math

        from slam_toolbox_tpu.solver import chain_precond as cp

        U_local = cp.build_chain_offdiag(hab, src, dst, n_nodes, free)
        U = jax.lax.psum(U_local, AXIS)
        pcr_steps = int(math.ceil(math.log2(max(n_nodes, 2)))) + 1

        def mv(x):
            x = x * free[:, None]
            local = jnp.zeros_like(x)
            local = local.at[src].add(
                jnp.einsum("eij,ej->ei", hab, x[dst]), mode="drop"
            )
            local = local.at[dst].add(
                jnp.einsum("eji,ej->ei", hab, x[src]), mode="drop"
            )
            # off-diagonal contributions live on edge shards -> psum;
            # the (replicated) damped diagonal is applied once.
            out = jnp.einsum("nij,nj->ni", diag_d, x) + jax.lax.psum(
                local, AXIS
            )
            return out * free[:, None]

        def prec(r):
            return cp.pcr_solve(diag_d, U, r, free, pcr_steps)

        x0 = jnp.zeros_like(b)
        r0 = b - mv(x0)
        z0 = prec(r0)
        rz0 = jnp.sum(r0 * z0)

        def body(state):
            i, x, r, p, rz = state
            hp = mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
            x = x + alpha * p
            # periodic true-residual restart against f32 recurrence drift
            restart = (i % 64) == 63
            r = jnp.where(restart, b - mv(x), r - alpha * hp)
            z = prec(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(
                restart, 0.0, rz_new / jnp.maximum(rz, 1e-30)
            )
            return i + 1, x, r, z + beta * p, rz_new

        def cond(state):
            i, _, r, _, _ = state
            return (i < cg_iters) & (jnp.sum(r * r) > 1e-12)

        _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, z0, rz0))

        new_poses = poses + x
        new_poses = new_poses.at[:, 2].set(
            jnp.arctan2(jnp.sin(new_poses[:, 2]), jnp.cos(new_poses[:, 2]))
        )
        return new_poses, chi2

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(),
                  P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_distributed_chi2(mesh: Mesh):
    """Replicated chi2 from edge shards (one psum) — the LM accept/reject
    probe, far cheaper than a full GN step."""

    def f(poses, src, dst, rel, sqrt_info, emask):
        r = edge_residual(poses, src, dst, rel, sqrt_info, emask)
        return jax.lax.psum(jnp.sum(r * r), AXIS)

    return jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(),
        check_vma=False,
    ))


def distributed_lm_solve(
    mesh: Mesh,
    poses: np.ndarray,       # (N,3)
    src: np.ndarray, dst: np.ndarray,
    rel: np.ndarray, sqrt_info: np.ndarray, emask: np.ndarray,
    free: np.ndarray,
    max_iterations: int = 50,
    initial_lambda: float = 1e-4,
    function_tolerance: float = 1e-3,
):
    """Host LM loop over the distributed GN step. Edge arrays must be
    padded to a multiple of the mesh size."""
    n_dev = mesh.devices.size
    e = len(src)
    assert e % n_dev == 0, "pad edges to a multiple of the mesh size"
    n_pad = len(poses)
    # CG needs ~O(n) iterations on chain-like graphs (see se2_solver)
    step = make_distributed_gn_step(mesh, n_pad, cg_iters=max(50, n_pad))

    poses_j = jnp.asarray(poses, jnp.float32)
    args = tuple(
        jnp.asarray(a)
        for a in (
            src.astype(np.int32), dst.astype(np.int32),
            rel.astype(np.float32), sqrt_info.astype(np.float32),
            emask,
        )
    )
    free_j = jnp.asarray(free, jnp.float32)

    chi2_fn = make_distributed_chi2(mesh)
    lam = initial_lambda
    chi2 = None
    for _ in range(max_iterations):
        new_poses, cur_chi2 = step(
            poses_j, *args, free_j, jnp.float32(lam)
        )
        cur_chi2 = float(cur_chi2)
        if chi2 is None:
            chi2 = cur_chi2
        # evaluate the proposal with the cheap chi2-only collective
        new_chi2 = float(chi2_fn(new_poses, *args))
        if new_chi2 <= chi2:
            rel_dec = (chi2 - new_chi2) / max(chi2, 1e-30)
            poses_j = new_poses
            chi2 = new_chi2
            lam = max(lam * 0.3, 1e-9)
            if rel_dec < function_tolerance:
                break
        else:
            lam = min(lam * 10.0, 1e6)
            if lam >= 1e6:
                break
    return np.asarray(poses_j), chi2
