"""SE(2) pose-graph optimizer: sparse Gauss-Newton / Levenberg-Marquardt in
JAX with block-Jacobi-preconditioned CG on the normal equations.

TPU-native replacement for the Ceres plugin (/root/reference/solvers/
ceres_solver.cpp). The measurement model matches PoseGraph2dErrorTerm
(ceres_utils.h:74-121):

    r = sqrt_info · [ R(yaw_a)^T (p_b - p_a) - p_ab ;
                      normalize(yaw_b - yaw_a - yaw_ab) ]

with sqrt_information the upper-triangular Cholesky factor of the inverse
edge covariance (ceres_solver.cpp:364-376), and the first node held constant
as the gauge (ceres_solver.cpp:228-241). The API mirrors the abstract
ScanSolver interface (Mapper.h:954-1066): AddNode / AddConstraint /
RemoveNode / RemoveConstraint / Compute / GetCorrections / ModifyNode /
Clear / Reset / GetGraph.

Design notes (TPU-first, not a port): the normal equations are never
materialized as a sparse matrix. Hx products are computed from per-node
diagonal blocks (segment-summed) plus per-edge off-diagonal blocks with
scatter-adds — all static-shaped, padded to power-of-two capacities so jit
specializations are bounded. Multi-device: see dist/ (edge-sharded Hx with
psum).
"""
from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_pow2(n: int, floor: int = 16) -> int:
    p = floor
    while p < n:
        p <<= 1
    return p


def edge_residual(poses, src, dst, rel, sqrt_info, emask):
    """Whitened residuals (E,3) for all edges."""
    pa = poses[src]  # (E,3)
    pb = poses[dst]
    ca, sa = jnp.cos(pa[:, 2]), jnp.sin(pa[:, 2])
    dx = pb[:, 0] - pa[:, 0]
    dy = pb[:, 1] - pa[:, 1]
    rx = ca * dx + sa * dy - rel[:, 0]
    ry = -sa * dx + ca * dy - rel[:, 1]
    dth = pb[:, 2] - pa[:, 2] - rel[:, 2]
    rth = jnp.arctan2(jnp.sin(dth), jnp.cos(dth))
    r = jnp.stack([rx, ry, rth], axis=-1)
    r = jnp.einsum("eij,ej->ei", sqrt_info, r)
    return jnp.where(emask[:, None], r, 0.0)


def edge_jacobians(poses, src, dst, rel, sqrt_info, emask):
    """Whitened Jacobian blocks (E,3,3) wrt pose a and pose b."""
    pa = poses[src]
    pb = poses[dst]
    ca, sa = jnp.cos(pa[:, 2]), jnp.sin(pa[:, 2])
    dx = pb[:, 0] - pa[:, 0]
    dy = pb[:, 1] - pa[:, 1]
    z = jnp.zeros_like(ca)
    o = jnp.ones_like(ca)
    # d r_xy / d theta_a : derivative of R(ha)^T applied to (pb-pa)
    dr_xy_dha_x = -sa * dx + ca * dy
    dr_xy_dha_y = -ca * dx - sa * dy
    ja = jnp.stack(
        [
            jnp.stack([-ca, -sa, dr_xy_dha_x], -1),
            jnp.stack([sa, -ca, dr_xy_dha_y], -1),
            jnp.stack([z, z, -o], -1),
        ],
        axis=-2,
    )  # (E,3,3)
    jb = jnp.stack(
        [
            jnp.stack([ca, sa, z], -1),
            jnp.stack([-sa, ca, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    ja = jnp.einsum("eij,ejk->eik", sqrt_info, ja)
    jb = jnp.einsum("eij,ejk->eik", sqrt_info, jb)
    m = emask[:, None, None]
    return jnp.where(m, ja, 0.0), jnp.where(m, jb, 0.0)


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def build_normal_blocks(poses, src, dst, rel, sqrt_info, emask, n_nodes: int):
    """Gauss-Newton normal equation pieces:
    diag blocks (N,3,3), per-edge off-diagonal blocks (E,3,3) = Ja^T Jb,
    gradient b = -J^T r (N,3), chi2."""
    r = edge_residual(poses, src, dst, rel, sqrt_info, emask)
    ja, jb = edge_jacobians(poses, src, dst, rel, sqrt_info, emask)
    haa = jnp.einsum("eji,ejk->eik", ja, ja)
    hbb = jnp.einsum("eji,ejk->eik", jb, jb)
    hab = jnp.einsum("eji,ejk->eik", ja, jb)
    diag = jnp.zeros((n_nodes, 3, 3), poses.dtype)
    diag = diag.at[src].add(haa, mode="drop")
    diag = diag.at[dst].add(hbb, mode="drop")
    grad = jnp.zeros((n_nodes, 3), poses.dtype)
    grad = grad.at[src].add(-jnp.einsum("eji,ej->ei", ja, r), mode="drop")
    grad = grad.at[dst].add(-jnp.einsum("eji,ej->ei", jb, r), mode="drop")
    chi2 = jnp.sum(r * r)
    return diag, hab, grad, chi2


@jax.jit
def chi2_only(poses, src, dst, rel, sqrt_info, emask):
    r = edge_residual(poses, src, dst, rel, sqrt_info, emask)
    return jnp.sum(r * r)


def _hx(x, diag_damped, hab, src, dst, free):
    """H @ x with the gauge row/col projected out."""
    x = x * free[:, None]
    out = jnp.einsum("nij,nj->ni", diag_damped, x)
    out = out.at[src].add(
        jnp.einsum("eij,ej->ei", hab, x[dst]), mode="drop"
    )
    out = out.at[dst].add(
        jnp.einsum("eji,ej->ei", hab, x[src]), mode="drop"
    )
    return out * free[:, None]


@functools.partial(jax.jit, static_argnames=("cg_iters",))
def solve_pcg(diag, hab, grad, src, dst, free, lm_lambda, cg_iters: int,
              cg_tol):
    """Block-Jacobi preconditioned CG on (H + λ·diagH) x = b."""
    eye = jnp.eye(3, dtype=diag.dtype)
    damp = lm_lambda * jnp.einsum("nii->n", diag)[:, None, None] * eye / 3.0
    diag_d = diag + damp + 1e-8 * eye
    # preconditioner: inverse of damped diagonal blocks
    minv = jnp.linalg.inv(diag_d + 1e-6 * eye)
    b = grad * free[:, None]

    def mv(x):
        return _hx(x, diag_d, hab, src, dst, free)

    def prec(r):
        return jnp.einsum("nij,nj->ni", minv, r) * free[:, None]

    x0 = jnp.zeros_like(b)
    r0 = b - mv(x0)
    z0 = prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.maximum(jnp.sum(b * b), 1e-30)

    def body(state):
        i, x, r, p, rz = state
        hp = mv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, p, rz_new

    def cond(state):
        i, x, r, p, rz = state
        return (i < cg_iters) & (jnp.sum(r * r) > cg_tol * bnorm)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0))
    return x


# ---------------------------------------------------------------------------
# Host sparse path (graphs past the dense-TPU ceiling).
#
# NumPy normal-equation assembly + the native block-sparse Cholesky
# (native/graph_ops.cpp sparse_block_solve — min-degree ordering, 3x3
# block up-looking factorization). This is the Ceres
# SPARSE_NORMAL_CHOLESKY analog (README.md:164 recommended config): at
# n > ~2k the dense MXU factorization is O(n^3) and the latency-bound
# chain-PCG needs O(n) iterations on loopy graphs, while the sparse
# factor of a SLAM graph stays near-linear (measured ~0.1 s at n=16k,
# ~0.5 s at n=65k including ordering). Entirely host-side: zero tunnel
# round-trips per LM iteration.


def _np_normal_blocks(poses, src, dst, rel, sqrt_info):
    """f64 NumPy twin of build_normal_blocks (unpadded)."""
    pa, pb = poses[src], poses[dst]
    ca, sa = np.cos(pa[:, 2]), np.sin(pa[:, 2])
    dx = pb[:, 0] - pa[:, 0]
    dy = pb[:, 1] - pa[:, 1]
    rx = ca * dx + sa * dy - rel[:, 0]
    ry = -sa * dx + ca * dy - rel[:, 1]
    dth = pb[:, 2] - pa[:, 2] - rel[:, 2]
    rth = np.arctan2(np.sin(dth), np.cos(dth))
    r = np.einsum("eij,ej->ei", sqrt_info, np.stack([rx, ry, rth], -1))
    z = np.zeros_like(ca)
    o = np.ones_like(ca)
    ja = np.stack(
        [
            np.stack([-ca, -sa, -sa * dx + ca * dy], -1),
            np.stack([sa, -ca, -ca * dx - sa * dy], -1),
            np.stack([z, z, -o], -1),
        ],
        axis=-2,
    )
    jb = np.stack(
        [
            np.stack([ca, sa, z], -1),
            np.stack([-sa, ca, z], -1),
            np.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    ja = np.einsum("eij,ejk->eik", sqrt_info, ja)
    jb = np.einsum("eij,ejk->eik", sqrt_info, jb)
    n = len(poses)
    diag = np.zeros((n, 3, 3))
    np.add.at(diag, src, np.einsum("eji,ejk->eik", ja, ja))
    np.add.at(diag, dst, np.einsum("eji,ejk->eik", jb, jb))
    hab = np.einsum("eji,ejk->eik", ja, jb)
    grad = np.zeros((n, 3))
    np.add.at(grad, src, -np.einsum("eji,ej->ei", ja, r))
    np.add.at(grad, dst, -np.einsum("eji,ej->ei", jb, r))
    return diag, hab, grad, float(np.sum(r * r))


def _np_chi2(poses, src, dst, rel, sqrt_info):
    pa, pb = poses[src], poses[dst]
    ca, sa = np.cos(pa[:, 2]), np.sin(pa[:, 2])
    dx = pb[:, 0] - pa[:, 0]
    dy = pb[:, 1] - pa[:, 1]
    rx = ca * dx + sa * dy - rel[:, 0]
    ry = -sa * dx + ca * dy - rel[:, 1]
    dth = pb[:, 2] - pa[:, 2] - rel[:, 2]
    rth = np.arctan2(np.sin(dth), np.cos(dth))
    r = np.einsum("eij,ej->ei", sqrt_info, np.stack([rx, ry, rth], -1))
    return float(np.sum(r * r))


def host_sparse_lm(poses, src, dst, rel, sqrt_info, free, cfg):
    """Levenberg-Marquardt on the host with the native sparse Cholesky.
    Same acceptance/termination logic as lm_solve. Returns (poses, chi2,
    iters) or None if the native lib is unavailable."""
    from slam_toolbox_tpu import native

    if native.get_lib() is None:
        return None
    free_b = free.astype(bool)
    # edges fully interior to the free set keep their off-diagonal block;
    # edges touching the gauge node only contribute to diag/grad, which
    # the row/col projection zeroes on the fixed side
    keep = free_b[src] & free_b[dst]
    # symbolic analysis (ordering + etree + pattern) once; only the
    # damped values change across LM iterations
    chol = native.SparseCholesky(len(poses), src[keep], dst[keep])
    lam = cfg.initial_lm_lambda
    chi2 = _np_chi2(poses, src, dst, rel, sqrt_info)
    iters = 0
    eye = np.eye(3)
    for _ in range(cfg.max_iterations):
        diag, hab, grad, _ = _np_normal_blocks(
            poses, src, dst, rel, sqrt_info
        )
        grad[~free_b] = 0.0
        gnorm = np.max(np.abs(grad)) if len(grad) else 0.0
        if gnorm < cfg.gradient_tolerance:
            break
        damp = lam * np.einsum("nii->n", diag)[:, None, None] * eye / 3.0
        diag_d = diag + damp + 1e-8 * eye
        diag_d[~free_b] = eye
        x = chol.factor_solve(diag_d, hab[keep], grad)
        if x is None:
            return None
        step = x * free_b[:, None]
        new_poses = poses + step
        new_poses[:, 2] = np.arctan2(
            np.sin(new_poses[:, 2]), np.cos(new_poses[:, 2])
        )
        new_chi2 = _np_chi2(new_poses, src, dst, rel, sqrt_info)
        iters += 1
        accept = new_chi2 <= chi2
        if accept:
            rel_dec = (chi2 - new_chi2) / max(chi2, 1e-30)
            step_norm = float(np.max(np.abs(step)))
            poses, chi2 = new_poses, new_chi2
            lam = max(lam * 0.3, 1e-9)
            if (
                rel_dec < cfg.function_tolerance
                or step_norm < cfg.parameter_tolerance * 1e-2
            ):
                break
        else:
            lam = min(lam * 10.0, 1e6)
            if lam >= 1e6:
                break
    return poses, chi2, iters


# below this node count the normal equations are solved DENSELY (one
# Cholesky per LM step): every CG iteration is latency-bound on TPU
# (~0.4-0.6 ms even for a block-Jacobi apply — tiny-op dispatch floor),
# while a dense (3n)^2 factorization is one fused MXU op and the exact
# step also cuts the LM iteration count. Measured on the lifelong-
# warehouse graph at n=1494: chain-PCG ~2 s per Compute vs dense ~0.2 s
# (Ceres similarly prefers dense solvers for small problems).
DENSE_MAX_NODES = 2048


@functools.partial(
    jax.jit,
    static_argnames=("n_nodes", "max_iterations", "cg_iters"),
)
def lm_solve(
    poses, src, dst, rel, sqrt_info, emask, free,
    initial_lambda, function_tolerance, gradient_tolerance,
    parameter_tolerance, cg_tol,
    n_nodes: int, max_iterations: int, cg_iters: int,
):
    """Full Levenberg-Marquardt loop on device: one host round-trip per
    Compute() instead of ~3 per LM iteration."""

    from slam_toolbox_tpu.solver import chain_precond as cp

    def dense_step(diag, hab, grad, lam):
        """Exact damped-normal-equations solve via dense Cholesky."""
        n3 = 3 * n_nodes
        eye = jnp.eye(3, dtype=poses.dtype)
        damp = lam * jnp.einsum("nii->n", diag)[:, None, None] * eye / 3.0
        diag_d = diag + damp + 1e-8 * eye
        ii = jnp.arange(3)
        H = jnp.zeros((n3, n3), poses.dtype)
        # block-diagonal: rows 3k+i, cols 3k+j
        nidx = jnp.arange(n_nodes)
        H = H.at[
            (nidx[:, None, None] * 3 + ii[None, :, None]),
            (nidx[:, None, None] * 3 + ii[None, None, :]),
        ].add(diag_d)
        # off-diagonal blocks hab at (src, dst) and habT at (dst, src)
        H = H.at[
            (src[:, None, None] * 3 + ii[None, :, None]),
            (dst[:, None, None] * 3 + ii[None, None, :]),
        ].add(hab, mode="drop")
        H = H.at[
            (dst[:, None, None] * 3 + ii[None, :, None]),
            (src[:, None, None] * 3 + ii[None, None, :]),
        ].add(jnp.swapaxes(hab, 1, 2), mode="drop")
        free3 = jnp.repeat(free, 3)
        # gauge: project fixed rows/cols out, unit diagonal keeps H SPD
        H = H * free3[:, None] * free3[None, :] + jnp.diag(1.0 - free3)
        b = (grad * free[:, None]).reshape(-1)
        L = jnp.linalg.cholesky(H)
        x = jax.scipy.linalg.cho_solve((L, True), b)
        return (x * free3).reshape(n_nodes, 3)

    def pcg(diag, hab, grad, lam):
        eye = jnp.eye(3, dtype=poses.dtype)
        damp = lam * jnp.einsum("nii->n", diag)[:, None, None] * eye / 3.0
        diag_d = diag + damp + 1e-8 * eye
        b = grad * free[:, None]

        def mv(x):
            return _hx(x, diag_d, hab, src, dst, free)

        # block-tridiagonal (odometry-chain) preconditioner: solves the
        # chain exactly so CG only iterates on the loop-closure coupling.
        # Small graphs: Thomas factorization (O(n) span, reused across CG
        # iterations). Large graphs: parallel cyclic reduction (O(log n)
        # depth, fully batched — the sequential scan span would dominate).
        U = cp.build_chain_offdiag(hab, src, dst, n_nodes, free)
        if n_nodes >= 4096:
            import math

            steps = int(math.ceil(math.log2(n_nodes))) + 1

            def prec(r):
                return cp.pcr_solve(diag_d, U, r, free, steps)
        else:
            Sinv, T, W = cp.factorize(diag_d, U, free)

            def prec(r):
                return cp.apply(Sinv, T, W, r, free)

        x0 = jnp.zeros_like(b)
        r0 = b - mv(x0)
        z0 = prec(r0)
        rz0 = jnp.sum(r0 * z0)
        bnorm = jnp.maximum(jnp.sum(b * b), 1e-30)

        def body(state):
            i, x, r, p, rz = state
            hp = mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
            x = x + alpha * p
            # periodic true-residual restart: f32 recurrence drift breaks
            # convergence over the O(n) iterations chain graphs need
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
            return (i < cg_iters) & (jnp.sum(r * r) > cg_tol * bnorm)

        _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, z0, rz0))
        return x

    solve_step = dense_step if n_nodes <= DENSE_MAX_NODES else pcg

    def lm_body(state):
        it, poses_c, chi2, lam, done = state
        diag, hab, grad, _ = build_normal_blocks(
            poses_c, src, dst, rel, sqrt_info, emask, n_nodes=n_nodes
        )
        gnorm = jnp.max(jnp.abs(grad * free[:, None]))
        step = solve_step(diag, hab, grad, lam)
        new_poses = poses_c + step
        new_poses = new_poses.at[:, 2].set(
            jnp.arctan2(jnp.sin(new_poses[:, 2]), jnp.cos(new_poses[:, 2]))
        )
        new_chi2 = jnp.sum(
            edge_residual(new_poses, src, dst, rel, sqrt_info, emask) ** 2
        )
        accept = new_chi2 <= chi2
        rel_dec = (chi2 - new_chi2) / jnp.maximum(chi2, 1e-30)
        step_norm = jnp.max(jnp.abs(step))
        poses_n = jnp.where(accept, new_poses, poses_c)
        chi2_n = jnp.where(accept, new_chi2, chi2)
        lam_n = jnp.where(
            accept, jnp.maximum(lam * 0.3, 1e-9),
            jnp.minimum(lam * 10.0, 1e6),
        )
        done_n = (
            (gnorm < gradient_tolerance)
            | (accept & (rel_dec < function_tolerance))
            | (accept & (step_norm < parameter_tolerance * 1e-2))
            | ((~accept) & (lam_n >= 1e6))
        )
        return it + 1, poses_n, chi2_n, lam_n, done | done_n

    def lm_cond(state):
        it, _, _, _, done = state
        return (it < max_iterations) & (~done)

    chi2_0 = jnp.sum(
        edge_residual(poses, src, dst, rel, sqrt_info, emask) ** 2
    )
    it, poses_out, chi2_out, _, _ = jax.lax.while_loop(
        lm_cond, lm_body,
        (0, poses, chi2_0, initial_lambda, jnp.bool_(False)),
    )
    return poses_out, chi2_out, it


def _sqrt_info_3x3(cov):
    """info = 0.5·(inv(cov) + inv(cov)^T), sqrt_info = chol(info)^T
    (upper factor, U^T U = info — ceres_solver.cpp:364-376), in closed
    form: the per-edge LAPACK inv+cholesky round trip cost ~35 us on the
    drain bookkeeping path (one call per graph edge). Falls back to the
    LAPACK path on any degenerate input (non-finite, non-SPD)."""
    (a, b, c), (d, e, f), (g, h, i) = cov.tolist()
    # adjugate inverse
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    if det > 0.0 and math.isfinite(det):
        inv_det = 1.0 / det
        m00 = A * inv_det
        m01 = -(b * i - c * h) * inv_det
        m02 = (b * f - c * e) * inv_det
        m10 = B * inv_det
        m11 = (a * i - c * g) * inv_det
        m12 = -(a * f - c * d) * inv_det
        m20 = C * inv_det
        m21 = -(a * h - b * g) * inv_det
        m22 = (a * e - b * d) * inv_det
        # symmetrize, then lower Cholesky (returned transposed = upper)
        s01 = 0.5 * (m01 + m10)
        s02 = 0.5 * (m02 + m20)
        s12 = 0.5 * (m12 + m21)
        if m00 > 0.0:
            l00 = math.sqrt(m00)
            l10 = s01 / l00
            l20 = s02 / l00
            t11 = m11 - l10 * l10
            if t11 > 0.0:
                l11 = math.sqrt(t11)
                l21 = (s12 - l20 * l10) / l11
                t22 = m22 - l20 * l20 - l21 * l21
                if t22 > 0.0 and math.isfinite(t22):
                    l22 = math.sqrt(t22)
                    return np.array([
                        [l00, l10, l20],
                        [0.0, l11, l21],
                        [0.0, 0.0, l22],
                    ])
    info = np.linalg.inv(cov)
    info = 0.5 * (info + info.T)
    return np.linalg.cholesky(info).T


class PoseGraphSolver:
    """Incremental SE(2) pose-graph solver (ScanSolver-equivalent)."""

    def __init__(self, config=None):
        from slam_toolbox_tpu.core.params import SolverConfig

        self.config = config or SolverConfig()
        self._ids: List[int] = []
        self._id_to_idx: Dict[int, int] = {}
        self._poses: List[np.ndarray] = []
        self._edges: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}
        self._first_id: Optional[int] = None
        self.corrections: List[Tuple[int, np.ndarray]] = []

    # -- ScanSolver API (Mapper.h:954-1066) ---------------------------------
    def add_node(self, node_id: int, pose) -> None:
        if node_id in self._id_to_idx:
            return
        if self._first_id is None:
            self._first_id = node_id  # gauge (ceres_solver.cpp:317-336)
        self._id_to_idx[node_id] = len(self._ids)
        self._ids.append(node_id)
        self._poses.append(np.asarray(pose, dtype=np.float64).copy())

    def add_constraint(
        self, id1: int, id2: int, rel_pose, covariance
    ) -> bool:
        """Edge with relative pose (in frame of node id1) and its covariance;
        information = cov^-1, whitening by its upper Cholesky factor
        (ceres_solver.cpp:364-376)."""
        if id1 not in self._id_to_idx or id2 not in self._id_to_idx:
            return False
        # the graph layer dedupes on the normal path, but merge /
        # deserialize feed the solver directly: a reversed duplicate
        # (id2,id1) would silently double-count the constraint
        if (id2, id1) in self._edges:
            return False
        sqrt_info = _sqrt_info_3x3(np.asarray(covariance, np.float64))
        self._edges[(id1, id2)] = (
            np.asarray(rel_pose, dtype=np.float64).copy(),
            sqrt_info,
        )
        return True

    def remove_node(self, node_id: int) -> None:
        """O(1) swap-with-last removal (the reference keeps Ceres
        enable_fast_removal for the same reason, ceres_solver.cpp:183-186;
        localization evicts one node per scan, so an O(n) reindex here is
        quadratic against BASELINE config-4's 100k-node graphs). Index
        order is not semantic: compute() maps ids through _id_to_idx and
        the host-sparse path reorders internally (the device chain
        preconditioner merely catches fewer consecutive-index edges after
        removals, costing CG iterations, never correctness)."""
        idx = self._id_to_idx.pop(node_id, None)
        if idx is None:
            return
        last = len(self._ids) - 1
        if idx != last:
            self._ids[idx] = self._ids[last]
            self._poses[idx] = self._poses[last]
            self._id_to_idx[self._ids[idx]] = idx
        self._ids.pop()
        self._poses.pop()
        if node_id == self._first_id:
            self._first_id = self._ids[0] if self._ids else None

    def remove_constraint(self, id1: int, id2: int) -> None:
        self._edges.pop((id1, id2), None)
        self._edges.pop((id2, id1), None)

    def modify_node(self, node_id: int, pose) -> None:
        """Manually move a node (loop_closure_assistant manual closure);
        note the reference *adds* the given yaw to the stored yaw
        (ceres_solver.cpp:451-461)."""
        if node_id not in self._id_to_idx:
            return
        cur = self._poses[self._id_to_idx[node_id]]
        pose = np.asarray(pose, dtype=np.float64)
        self._poses[self._id_to_idx[node_id]] = np.array(
            [pose[0], pose[1], cur[2] + pose[2]]
        )

    def get_node_pose(self, node_id: int) -> np.ndarray:
        return self._poses[self._id_to_idx[node_id]]

    def set_node_pose(self, node_id: int, pose) -> None:
        self._poses[self._id_to_idx[node_id]] = np.asarray(
            pose, dtype=np.float64
        ).copy()

    def get_graph(self):
        """(nodes dict id->pose, edge list) for visualization."""
        nodes = {i: p.copy() for i, p in zip(self._ids, self._poses)}
        return nodes, list(self._edges.keys())

    def clear(self) -> None:
        self.corrections = []

    def reset(self) -> None:
        self.__init__(self.config)

    @property
    def n_nodes(self) -> int:
        return len(self._ids)

    @property
    def n_edges(self) -> int:
        return len(self._edges)

    # -- Compute (ceres_solver.cpp:214-269 analog) --------------------------
    def compute(self) -> List[Tuple[int, np.ndarray]]:
        n, e = len(self._ids), len(self._edges)
        if n == 0 or e == 0:
            self.corrections = [
                (i, p.copy()) for i, p in zip(self._ids, self._poses)
            ]
            return self.corrections

        # large graphs on a multi-device mesh use the edge-sharded
        # distributed solve (dist/solver_dist.py)
        if (
            e >= self.config.dist_edge_threshold
            and jax.device_count() > 1
        ):
            try:
                return self._compute_distributed(n, e)
            except Exception:
                pass  # fall through to the single-device path

        import time as _time

        # native host sparse Cholesky (see host_sparse_lm): the default
        # everywhere (host_sparse_min_nodes=0) and mandatory past the
        # dense ceiling — the device paths remain for co-located-TPU
        # configs and as the fallback when the native lib is unavailable
        if n >= self.config.host_sparse_min_nodes or n > DENSE_MAX_NODES:
            res = self._compute_host_sparse(n, e)
            if res is not None:
                return res

        t_assemble = _time.perf_counter()
        cfg = self.config
        # generous pow2 floors: one executable covers the whole session
        # until the graph outgrows it (each (n_pad, e_pad) bucket is a
        # separate ~20 s remote compile on the tunneled TPU)
        n_pad, e_pad = _pad_pow2(n, 256), _pad_pow2(e, 512)
        poses = np.zeros((n_pad, 3), np.float32)
        poses[:n] = np.stack(self._poses)
        src = np.zeros(e_pad, np.int32)
        dst = np.zeros(e_pad, np.int32)
        rel = np.zeros((e_pad, 3), np.float32)
        sqrt_info = np.zeros((e_pad, 3, 3), np.float32)
        emask = np.zeros(e_pad, bool)
        for k, ((i1, i2), (rp, si)) in enumerate(self._edges.items()):
            src[k] = self._id_to_idx[i1]
            dst[k] = self._id_to_idx[i2]
            rel[k] = rp
            sqrt_info[k] = si
            emask[k] = True
        src[e:] = n_pad - 1  # harmless padding targets
        dst[e:] = n_pad - 1
        free = np.ones(n_pad, np.float32)
        free[n:] = 0.0
        if self._first_id in self._id_to_idx:
            free[self._id_to_idx[self._first_id]] = 0.0

        # the chain preconditioner solves the odometry backbone exactly,
        # so the CG budget no longer needs to scale with graph size
        cg_iters = cfg.cg_max_iterations
        t_device = _time.perf_counter()
        poses_out, chi2_out, iters = lm_solve(
            jnp.asarray(poses),
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(sqrt_info), jnp.asarray(emask), jnp.asarray(free),
            jnp.float32(cfg.initial_lm_lambda),
            jnp.float32(cfg.function_tolerance),
            jnp.float32(cfg.gradient_tolerance),
            jnp.float32(cfg.parameter_tolerance),
            jnp.float32(cfg.cg_tolerance),
            n_nodes=n_pad, max_iterations=cfg.max_iterations,
            cg_iters=cg_iters,
        )
        poses_out.block_until_ready()  # see match.py: fetch-backoff
        t_fetch = _time.perf_counter()
        # keep iters/chi2 as device scalars: each int()/float() here would
        # be its own ~25 ms tunnel fetch; they resolve lazily when the
        # stats are actually printed (off the hot path)
        self.last_stats = {
            "n": n, "e": e, "lm_iters": iters, "chi2": chi2_out,
        }
        result = np.asarray(poses_out[:n], dtype=np.float64)
        t_done = _time.perf_counter()
        self.last_stats.update(
            assemble_ms=round(1e3 * (t_device - t_assemble), 2),
            device_ms=round(1e3 * (t_fetch - t_device), 2),
            fetch_ms=round(1e3 * (t_done - t_fetch), 2),
        )
        self.corrections = [
            (node_id, result[i].copy()) for i, node_id in enumerate(self._ids)
        ]
        for i in range(n):
            self._poses[i] = result[i].copy()
        return self.corrections

    def compute_window(self, active_ids):
        """Windowed elastic solve: only `active_ids` move; every node
        they share an edge with (the window boundary) is held as a
        FIXED anchor, and the rest of the graph does not even enter the
        subproblem. Returns corrections for active nodes only (or None
        when the native sparse path is unavailable — callers fall back
        to the full compute()).

        Rationale (BASELINE config 4): an accepted localization closure
        against a converged 100k-node prior triggered a 2.9 s full
        elastic solve + a 100k-scan correction writeback — while the
        correction outside the query's neighborhood is ~zero (it decays
        exponentially with graph distance through well-constrained
        odometry chains). The boundary anchors make the window a strict
        approximation of the full solve; tests/test_windowed_solve.py
        bounds the in-window disagreement. No reference counterpart
        (Ceres always solves the whole problem, ceres_solver.cpp:214) —
        documented in PARITY.md §Known; radius 0 disables."""
        import time as _time

        t0 = _time.perf_counter()
        n_all = len(self._ids)
        act_idx = [
            self._id_to_idx[i] for i in active_ids
            if i in self._id_to_idx
        ]
        if not act_idx or n_all == 0:
            return []
        in_act = np.zeros(n_all, bool)
        in_act[act_idx] = True
        sub_edges = []
        sub_nodes = set(act_idx)
        for (i1, i2), (rp, si) in self._edges.items():
            a, b = self._id_to_idx[i1], self._id_to_idx[i2]
            if in_act[a] or in_act[b]:
                sub_edges.append((a, b, rp, si))
                sub_nodes.add(a)
                sub_nodes.add(b)
        if not sub_edges:
            return []
        order = sorted(sub_nodes)
        l_of = {g: k for k, g in enumerate(order)}
        m = len(order)
        poses = np.stack([self._poses[g] for g in order])
        e = len(sub_edges)
        src = np.fromiter((l_of[a] for a, _, _, _ in sub_edges),
                          np.int64, e)
        dst = np.fromiter((l_of[b] for _, b, _, _ in sub_edges),
                          np.int64, e)
        rel = np.stack([rp for _, _, rp, _ in sub_edges])
        si = np.stack([s for _, _, _, s in sub_edges])
        free = np.fromiter((in_act[g] for g in order), np.float64, m)
        if free.min() > 0.0:
            # window swallowed its whole component: gauge-fix one node
            gk = (l_of[self._id_to_idx[self._first_id]]
                  if self._first_id in self._id_to_idx
                  and self._id_to_idx[self._first_id] in l_of
                  else 0)
            free[gk] = 0.0
        res = host_sparse_lm(poses, src, dst, rel, si, free, self.config)
        if res is None:
            return None
        poses_out, chi2, iters = res
        free_b = free.astype(bool)
        for k, g in enumerate(order):
            if free_b[k]:
                self._poses[g] = poses_out[k].copy()
        self.corrections = [
            (self._ids[g], poses_out[l_of[g]].copy())
            for g in act_idx
        ]
        self.last_stats = {
            "n": m, "n_active": len(act_idx), "e": e,
            "lm_iters": iters, "chi2": chi2, "window": True,
            "host_sparse_ms": round(
                1e3 * (_time.perf_counter() - t0), 2),
        }
        return self.corrections

    def _compute_host_sparse(self, n: int, e: int):
        """Unpadded f64 host LM with the native block-sparse Cholesky."""
        import time as _time

        t0 = _time.perf_counter()
        poses = np.stack(self._poses)
        src = np.zeros(e, np.int64)
        dst = np.zeros(e, np.int64)
        rel = np.zeros((e, 3))
        sqrt_info = np.zeros((e, 3, 3))
        for k, ((i1, i2), (rp, si)) in enumerate(self._edges.items()):
            src[k] = self._id_to_idx[i1]
            dst[k] = self._id_to_idx[i2]
            rel[k] = rp
            sqrt_info[k] = si
        free = np.ones(n, np.float64)
        if self._first_id in self._id_to_idx:
            free[self._id_to_idx[self._first_id]] = 0.0
        res = host_sparse_lm(
            poses, src, dst, rel, sqrt_info, free, self.config
        )
        if res is None:
            return None
        poses_out, chi2, iters = res
        self.last_stats = {
            "n": n, "e": e, "lm_iters": iters, "chi2": chi2,
            "host_sparse_ms": round(1e3 * (_time.perf_counter() - t0), 2),
        }
        self.corrections = [
            (nid, poses_out[i].copy()) for i, nid in enumerate(self._ids)
        ]
        for i in range(n):
            self._poses[i] = poses_out[i].copy()
        return self.corrections

    def _compute_distributed(self, n: int, e: int):
        """Edge-sharded multi-device solve for large graphs."""
        from jax.sharding import Mesh

        from slam_toolbox_tpu.dist import distributed_lm_solve

        cfg = self.config
        devices = jax.devices()
        n_dev = len(devices)
        mesh = Mesh(np.array(devices), ("graph",))
        n_pad = _pad_pow2(n)
        e_pad = ((_pad_pow2(e) + n_dev - 1) // n_dev) * n_dev
        poses = np.zeros((n_pad, 3), np.float32)
        poses[:n] = np.stack(self._poses)
        src = np.full(e_pad, n_pad - 1, np.int64)
        dst = np.full(e_pad, n_pad - 1, np.int64)
        rel = np.zeros((e_pad, 3), np.float64)
        sqrt_info = np.zeros((e_pad, 3, 3), np.float64)
        emask = np.zeros(e_pad, bool)
        for k, ((i1, i2), (rp, si)) in enumerate(self._edges.items()):
            src[k] = self._id_to_idx[i1]
            dst[k] = self._id_to_idx[i2]
            rel[k] = rp
            sqrt_info[k] = si
            emask[k] = True
        free = np.ones(n_pad, np.float32)
        free[n:] = 0.0
        if self._first_id in self._id_to_idx:
            free[self._id_to_idx[self._first_id]] = 0.0
        out, _ = distributed_lm_solve(
            mesh, poses, src, dst, rel, sqrt_info, emask, free,
            max_iterations=cfg.max_iterations,
            initial_lambda=cfg.initial_lm_lambda,
            function_tolerance=cfg.function_tolerance,
            cg_iters=cfg.cg_max_iterations,
        )
        result = np.asarray(out[:n], dtype=np.float64)
        self.corrections = [
            (nid, result[i].copy()) for i, nid in enumerate(self._ids)
        ]
        for i in range(n):
            self._poses[i] = result[i].copy()
        return self.corrections
