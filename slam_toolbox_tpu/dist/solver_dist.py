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


def make_distributed_gn_step(
    mesh: Mesh, n_nodes: int, cg_iters: int = 50, schwarz: bool = True,
    block: int = 512, cblock: int = 64, cg_rtol: float = None,
    max_coarse: int = 2048,
):
    """Returns a jitted, shard_mapped function computing one damped GN step.

    Inputs (global shapes):
      poses (N,3) replicated; src/dst (E,), rel (E,3), sqrt_info (E,3,3),
      emask (E,), plocal (E,) sharded over the mesh axis; free (N,)
      replicated; lm_lambda scalar.
    Output: (new_poses (N,3), chi2 scalar, cg_iters_used) replicated.

    Preconditioner (schwarz=True, the default): TWO-LEVEL additive
    Schwarz. Level 1 is block-Jacobi over FIXED-size contiguous node
    blocks (`block` nodes; a device owns n/(n_dev*block) blocks and
    batch-Cholesky-factors them once per GN step — a batched
    (3*block)^3 dense factor that maps straight onto the MXU); every
    intra-block loop edge is inside the factor (`plocal` marks them).
    Level 2 is a COARSE-SPACE correction: one 3-dof aggregate per block
    (piecewise-constant restriction), with the (NB*3)^2 Galerkin coarse
    operator assembled from the edge shards (one psum), factored
    replicated, and applied multiplicatively after the fine sweep
    (z = z1 + R^T A_c^-1 R (r - A z1)). Single-level block Jacobi
    propagates information one block per iteration, so its PCG counts
    grow with n/block — the round-2 DIST_SCALING capped out at 200
    iterations by n=12k; the coarse solve carries the global (rigid-ish)
    modes directly, keeping iteration counts bounded and independent of
    BOTH graph size and device count (asserted in scripts/bench_dist.py).
    The odometry-chain PCR preconditioner (schwarz=False fallback)
    leaves 2D-grid-like loop coupling to CG and needs O(width^2)
    iterations on warehouse graphs."""

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

    n_dev = int(mesh.devices.size)
    nb = n_nodes // n_dev
    assert nb * n_dev == n_nodes, "pad nodes to a multiple of the mesh size"
    block = min(block, nb)
    assert nb % block == 0, "block size must divide the per-device slice"
    bpd = nb // block  # blocks per device

    def step(poses, src, dst, rel, sqrt_info, emask, plocal, free,
             lm_lambda):
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

        import math

        from slam_toolbox_tpu.solver import chain_precond as cp

        if schwarz:
            # build this device's block-diagonal dense factors: scatter
            # intra-block off-diagonal edge blocks into a (bpd, block,
            # block, 3, 3) tensor (block index bpd = drop sink for
            # crossing/foreign edges), overwrite each block's diagonal
            # with the globally-reduced damped diagonal, then one BATCHED
            # Cholesky over the device's blocks
            start = jnp.int32(jax.lax.axis_index(AXIS)) * jnp.int32(nb)
            _z = jnp.int32(0)
            rel_idx_s = src - start
            rel_idx_d = dst - start
            blk = jnp.where(plocal, rel_idx_s // block, bpd)
            s_off = jnp.where(plocal, rel_idx_s % block, 0)
            d_off = jnp.where(plocal, rel_idx_d % block, 0)
            H5 = jnp.zeros(
                (bpd + 1, block, block, 3, 3), poses.dtype
            )
            H5 = H5.at[blk, s_off, d_off].add(hab, mode="drop")
            H5 = H5.at[blk, d_off, s_off].add(
                jnp.swapaxes(hab, 1, 2), mode="drop"
            )
            H5 = H5[:bpd]
            rng = jnp.arange(block)
            diag_slice = jax.lax.dynamic_slice(
                diag_d, (start, _z, _z), (nb, 3, 3)
            ).reshape(bpd, block, 3, 3)
            H5 = H5.at[:, rng, rng].set(diag_slice)
            free_l = jax.lax.dynamic_slice(
                free, (start,), (nb,)
            ).reshape(bpd, block)
            # fixed/padding nodes: identity rows/cols keep each factor SPD
            H5 = (H5 * free_l[:, :, None, None, None]
                  * free_l[:, None, :, None, None])
            H5 = H5.at[:, rng, rng].add(
                eye * (1.0 - free_l)[:, :, None, None]
            )
            Hd = H5.transpose(0, 1, 3, 2, 4).reshape(
                bpd, block * 3, block * 3
            )
            chol = jnp.linalg.cholesky(Hd)  # batched over blocks

            # coarse space: per-block RIGID-BODY modes (GDSW-style).
            # The pose-graph Hessian's near-null space is the global
            # rigid motions — rotation couples theta with a SPATIALLY
            # VARYING xy displacement, so a piecewise-constant coarse
            # space cannot represent the low modes and CG still needed
            # O(n/block) iterations (round-2 DIST_SCALING saturated its
            # 200 cap by n=12k). Per-block prolongation at node i with
            # block centroid c:  P_i = [[1,0,-(py-cy)],
            #                           [0,1, px-cx ],
            #                           [0,0,   1   ]]
            # (coeffs = block translation + rotation about c). Galerkin
            # A_c = P^T F A F P: the off-diagonal part comes from this
            # device's edge shard (psum); the (replicated) damped
            # diagonal folds in locally.
            # coarse aggregates are FINER than the solve blocks: the
            # fine level solves each `block` exactly, so the coarse
            # level's job is the inter-block error — aggregate size sets
            # the two-level condition number (~H_c/h), so smaller is
            # better until the replicated dense coarse factor dominates;
            # clamp NB to keep that factor cheap at 500k+ nodes
            # max_coarse caps NB so the replicated dense coarse factor
            # ((3*NB)^3 flops, (3*NB)^2 memory per device) stays cheap;
            # the f64 49k matrix raises it to keep 16-node aggregates —
            # iteration counts track the aggregate size (two-level H/h),
            # so holding cb fixed keeps CG flat across graph sizes
            # (DIST_SCALING_F64, VERDICT r4 next #3)
            cb = cblock
            while n_nodes // cb > max_coarse:
                cb *= 2
            cb = min(cb, n_nodes)
            while n_nodes % cb:
                cb *= 2
            NB = n_nodes // cb
            blk_of = jnp.arange(n_nodes) // cb
            w_node = free  # fixed/padding nodes excluded from the space
            # per-block centroid of free nodes (poses replicated, so
            # every device computes the identical centroids — no psum)
            cent_n = jnp.zeros((NB, 2), poses.dtype).at[blk_of].add(
                poses[:, :2] * w_node[:, None], mode="drop"
            )
            cent_d = jnp.zeros((NB,), poses.dtype).at[blk_of].add(
                w_node, mode="drop"
            )
            cent = cent_n / jnp.maximum(cent_d, 1.0)[:, None]

            def p_node(idx):
                """(len(idx), 3, 3) prolongation blocks P_i."""
                rel_xy = poses[idx, :2] - cent[blk_of[idx]]
                z = jnp.zeros_like(rel_xy[:, 0])
                o = jnp.ones_like(z)
                return jnp.stack([
                    jnp.stack([o, z, -rel_xy[:, 1]], -1),
                    jnp.stack([z, o, rel_xy[:, 0]], -1),
                    jnp.stack([z, z, o], -1),
                ], axis=-2)

            all_idx = jnp.arange(n_nodes)
            P_all = p_node(all_idx)          # (n, 3, 3)
            wfree = (free[src] * free[dst]) * emask.astype(poses.dtype)
            # edge contribution: P_s^T hab P_d into block pair (bs, bd)
            Ps = P_all[src]
            Pd = P_all[dst]
            hab_c = jnp.einsum(
                "eji,ejk,ekl->eil", Ps, hab, Pd
            ) * wfree[:, None, None]
            cbs = jnp.where(emask, src // cb, NB)
            cbd = jnp.where(emask, dst // cb, NB)
            Ac = jnp.zeros((NB + 1, NB + 1, 3, 3), poses.dtype)
            Ac = Ac.at[cbs, cbd].add(hab_c, mode="drop")
            Ac = Ac.at[cbd, cbs].add(
                jnp.swapaxes(hab_c, 1, 2), mode="drop"
            )
            Ac = jax.lax.psum(Ac[:NB, :NB], AXIS)
            diag_c = jnp.einsum(
                "nji,njk,nkl->nil", P_all, diag_d, P_all
            ) * w_node[:, None, None]
            Ac = Ac.at[blk_of, blk_of].add(diag_c, mode="drop")
            Acd = Ac.transpose(0, 2, 1, 3).reshape(NB * 3, NB * 3)
            # tiny Tikhonov keeps empty/fixed-only aggregates SPD
            Acd = Acd + jnp.eye(NB * 3, dtype=poses.dtype) * (
                1e-8 * jnp.trace(Acd) / (NB * 3) + 1e-12
            )
            chol_c = jnp.linalg.cholesky(Acd)

            def fine(r):
                r_l = jax.lax.dynamic_slice(
                    r, (start, _z), (nb, 3)
                ).reshape(bpd, block * 3)
                z_l = jax.vmap(
                    lambda c, rr: jax.scipy.linalg.cho_solve(
                        (c, True), rr
                    )
                )(chol, r_l)
                z = jnp.zeros((n_nodes, 3), poses.dtype)
                z = jax.lax.dynamic_update_slice(
                    z,
                    z_l.reshape(nb, 3) * free_l.reshape(nb)[:, None],
                    (start, _z),
                )
                return jax.lax.psum(z, AXIS) * free[:, None]

            def coarse(r):
                # restrict: rc[b] = sum_{i in b} P_i^T r_i (free only)
                rn = jnp.einsum(
                    "nji,nj->ni", P_all, r * w_node[:, None]
                )
                rc = jnp.zeros((NB, 3), poses.dtype).at[blk_of].add(
                    rn, mode="drop"
                ).reshape(NB * 3)
                zc = jax.scipy.linalg.cho_solve(
                    (chol_c, True), rc
                ).reshape(NB, 3)
                # prolong: z_i = P_i zc[b(i)]
                z = jnp.einsum("nij,nj->ni", P_all, zc[blk_of])
                return z * w_node[:, None]

            def prec(r):
                # SYMMETRIZED multiplicative two-level (fine -> coarse
                # -> fine V-cycle). A one-sided multiplicative sweep is
                # a NON-SYMMETRIC operator and silently breaks CG's
                # recurrences (observed as saturation at the iteration
                # cap in late low-damping LM steps); the M1-Mc-M1
                # sandwich is SPD, so CG theory applies
                z1 = fine(r)
                z2 = z1 + coarse(r - mv(z1))
                return z2 + fine(r - mv(z2))
        else:
            # odometry-chain preconditioner: chain coupling blocks are
            # built from the local edge shard and psum-reduced, then
            # every device runs the same parallel-cyclic-reduction solve
            # on the replicated tridiagonal system (O(log n) depth)
            U_local = cp.build_chain_offdiag(hab, src, dst, n_nodes, free)
            U = jax.lax.psum(U_local, AXIS)
            pcr_steps = int(math.ceil(math.log2(max(n_nodes, 2)))) + 1

            def prec(r):
                return cp.pcr_solve(diag_d, U, r, free, pcr_steps)

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

        x0 = jnp.zeros_like(b)
        r0 = b - mv(x0)
        z0 = prec(r0)
        rz0 = jnp.sum(r0 * z0)
        # relative termination, dtype-aware: r stops being resolvable in
        # f32 around 1e-5 * ||b|| (1e-11 in f64); iterating past that
        # wastes collectives
        # default: r stops being resolvable in f32 around 1e-5*||b||
        # (1e-11 in f64); iterating past that wastes collectives
        rtol = cg_rtol if cg_rtol is not None else (
            1e-11 if poses.dtype == jnp.float64 else 1e-5
        )
        rr_stop = jnp.asarray(rtol * rtol, poses.dtype) * jnp.sum(b * b)

        def body(state):
            i, x, r, p, rz, rr_ckpt = state
            hp = mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
            x = x + alpha * p
            # periodic true-residual restart against recurrence drift;
            # doubles as a STAGNATION probe: near the optimum the
            # gradient is below the dtype's resolvable floor and CG
            # would otherwise spin at the cap doing nothing (observed:
            # late low-damping LM steps pinned at 200 with chi2 already
            # converged) — if a whole restart period bought less than a
            # 2x residual reduction, the floor is reached: stop
            restart = (i % 32) == 31
            r = jnp.where(restart, b - mv(x), r - alpha * hp)
            rr = jnp.sum(r * r)
            stalled = restart & (rr > 0.25 * rr_ckpt)
            rr_ckpt = jnp.where(restart, rr, rr_ckpt)
            z = prec(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(
                restart, 0.0, rz_new / jnp.maximum(rz, 1e-30)
            )
            i_next = jnp.where(stalled, cg_iters, i + 1)
            return i_next, x, r, z + beta * p, rz_new, rr_ckpt

        def cond(state):
            i, _, r, _, rz, _ = state
            # rz <= 0 means the preconditioned residual is at the dtype
            # noise floor (prec is SPD analytically)
            return ((i < cg_iters) & (jnp.sum(r * r) > rr_stop)
                    & (rz > 0))

        it, x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (0, x0, r0, z0, rz0, jnp.sum(r0 * r0))
        )

        new_poses = poses + x
        new_poses = new_poses.at[:, 2].set(
            jnp.arctan2(jnp.sin(new_poses[:, 2]), jnp.cos(new_poses[:, 2]))
        )
        return new_poses, chi2, it

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(AXIS), P(), P()),
        out_specs=(P(), P(), P()),
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
    cg_iters: int = 200,
    block: int = 512,
    cblock: int = None,
    cg_rtol: float = None,
    dtype=np.float32,
    max_coarse: int = None,
):
    """Host LM loop over the distributed GN step. Edge arrays must be
    padded to a multiple of the mesh size.

    cg_iters is a BOUNDED budget (default matches the single-device
    SolverConfig.cg_max_iterations): the two-level Schwarz preconditioner
    (intra-block dense factors + coarse aggregate solve) keeps the
    iteration count bounded independent of n and of the device count
    (asserted against 10k+ node spatially-local graphs in
    scripts/bench_dist.py). dtype=np.float64 runs the whole solve —
    residuals, psum reductions, CG recurrences — in f64 for sub-mm
    parity with the host solver (use on CPU meshes; real-TPU f64 is
    emulated and slow)."""
    n_dev = mesh.devices.size
    if cblock is None:
        # f64 runs CG to rtol 1e-11 (sub-mm host parity): the extra
        # decades of convergence need a RICHER coarse space to stay
        # <=30 iterations flat — 16-node aggregates measured
        # [22..30] vs [28..43] with the f32 default 64 at 12k nodes
        # (round-4 probes; f32's resolvability floor ~1e-5 never
        # exercises those decades, so 64 stays optimal there)
        cblock = 16 if np.dtype(dtype) == np.float64 else 64
    if max_coarse is None:
        # f64: let the 16-node aggregates survive to ~64k nodes (the
        # 12k-flat CG counts depend on the aggregate SIZE, not count;
        # 4096 aggregates = a (12288)^2 f64 replicated factor, ~1.2 GB
        # + a few seconds per LM step on a CPU mesh — the price of
        # keeping 49k <= 30 iterations like 12k). f32 keeps the cheap
        # 2048 cap (its rtol floor never exercises the extra decades).
        max_coarse = 4096 if np.dtype(dtype) == np.float64 else 2048
    e = len(src)
    assert e % n_dev == 0, "pad edges to a multiple of the mesh size"
    n_pad = len(poses)
    assert n_pad % n_dev == 0, "pad nodes to a multiple of the mesh size"
    nb = n_pad // n_dev
    block_g = min(block, nb)

    step = make_distributed_gn_step(
        mesh, n_pad, cg_iters=cg_iters, block=block_g, cblock=cblock,
        cg_rtol=cg_rtol, max_coarse=max_coarse,
    )

    # partition edges by owning node slice so each device's shard holds
    # the edges of its own subdomain (the Schwarz preconditioner factors
    # the intra-BLOCK ones; crossing edges stay in the shard of their
    # lower endpoint, marked plocal=False, and participate only in mv)
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    owner = np.where(emask, np.minimum(src, dst) // nb, 0).astype(np.int64)
    plocal = emask & ((src // block_g) == (dst // block_g))
    counts = np.bincount(owner[emask], minlength=n_dev)
    shard_e = int(max(1, counts.max()))
    e2 = shard_e * n_dev
    src2 = np.full(e2, n_pad - 1, np.int64)
    dst2 = np.full(e2, n_pad - 1, np.int64)
    rel2 = np.zeros((e2, 3), rel.dtype)
    si2 = np.zeros((e2, 3, 3), sqrt_info.dtype)
    em2 = np.zeros(e2, bool)
    pl2 = np.zeros(e2, bool)
    fill = np.zeros(n_dev, np.int64)
    for k in np.flatnonzero(emask):
        d = owner[k]
        pos = d * shard_e + fill[d]
        fill[d] += 1
        src2[pos], dst2[pos] = src[k], dst[k]
        rel2[pos] = rel[k]
        si2[pos] = sqrt_info[k]
        em2[pos] = True
        pl2[pos] = plocal[k]

    # explicit shardings (required under multi-process/multi-host: every
    # process holds the full arrays and contributes its addressable
    # shards; a plain jnp.asarray would be process-local)
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(AXIS))

    def put_sharded(a):
        # local_data is the FULL global array (every process builds the
        # same graph deterministically); jax slices each process's shards
        return jax.make_array_from_process_local_data(shd, a, a.shape)

    def put_rep(a):
        return jax.make_array_from_process_local_data(rep, a, a.shape)

    poses_j = put_rep(poses.astype(dtype))
    args = (
        put_sharded(src2.astype(np.int32)),
        put_sharded(dst2.astype(np.int32)),
        put_sharded(rel2.astype(dtype)),
        put_sharded(si2.astype(dtype)),
        put_sharded(em2),
    )
    plocal_j = put_sharded(pl2)
    free_j = put_rep(free.astype(dtype))

    chi2_fn = make_distributed_chi2(mesh)
    lam = initial_lambda
    chi2 = None
    cg_iter_log = []
    for _ in range(max_iterations):
        new_poses, cur_chi2, cg_used = step(
            poses_j, *args, plocal_j, free_j, jnp.asarray(lam, dtype)
        )
        cur_chi2 = float(cur_chi2)
        cg_iter_log.append(int(cg_used))
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
    distributed_lm_solve.last_cg_iters = cg_iter_log
    return np.asarray(poses_j), chi2
