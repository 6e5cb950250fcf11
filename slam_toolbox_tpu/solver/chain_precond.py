"""Block-tridiagonal (odometry-chain) preconditioner for the pose-graph
normal equations.

With a block-Jacobi preconditioner, CG propagates information roughly one
graph hop per iteration, so chain-like pose graphs need O(n) iterations
for a loop closure to traverse the chain — prohibitive at 10^5+ nodes.
Pose graphs are odometry chains plus sparse loop edges, so the
tridiagonal part of H (consecutive-node couplings + the damped diagonal)
is an excellent preconditioner: it solves the chain exactly, leaving CG
to handle only the loop edges (~tens of iterations regardless of n).

Factorization is a block Thomas/LDL^T pass; both it and the two solve
sweeps are sequential lax.scans of 3x3 block ops (O(n) span — an
associative-scan parallelization is a known follow-up for multi-host
scale).

No reference counterpart: Ceres uses sparse Cholesky
(/root/reference/solvers/ceres_solver.cpp README recommendation); this is
the TPU-native equivalent structure-exploiting solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv3(m):
    """Explicit 3x3 inverse (adjugate / det) — cheaper and scan-friendly
    vs linalg.inv inside a scan."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.array([
        [A, -(b * i - c * h), (b * f - c * e)],
        [B, (a * i - c * g), -(a * f - c * d)],
        [C, -(a * h - b * g), (a * e - b * d)],
    ])
    return adj / det


def build_chain_offdiag(hab, src, dst, n_nodes, free):
    """U (n-1, 3, 3): coupling H[i, i+1] restricted to consecutive solver
    indices; edges touching gauge-fixed nodes are dropped so the
    preconditioner respects the projection."""
    e_free = free[src] * free[dst]  # (E,)
    fwd = (dst == src + 1)
    bwd = (src == dst + 1)
    U = jnp.zeros((n_nodes - 1, 3, 3), hab.dtype)
    contrib_f = hab * (fwd * e_free)[:, None, None]
    U = U.at[jnp.where(fwd, src, n_nodes - 1)].add(
        contrib_f, mode="drop"
    )
    contrib_b = jnp.swapaxes(hab, -1, -2) * (bwd * e_free)[:, None, None]
    U = U.at[jnp.where(bwd, dst, n_nodes - 1)].add(
        contrib_b, mode="drop"
    )
    return U


def factorize(diag_damped, U, free):
    """Block Thomas factorization. Returns (Sinv (n,3,3), T (n-1,3,3),
    V (n-1,3,3)) where S_i = D_i - U_{i-1}^T Sinv_{i-1} U_{i-1},
    T_i = U_i^T Sinv_i (forward sweep operator), V_i = Sinv_i U_i."""
    eye = jnp.eye(3, dtype=diag_damped.dtype)
    # project fixed nodes to identity rows
    D = jnp.where(
        free[:, None, None] > 0, diag_damped, eye[None]
    )

    def fac_step(Sinv_prev, u_and_d):
        u_prev, d_i = u_and_d
        S_i = d_i - u_prev.T @ Sinv_prev @ u_prev
        Sinv_i = _inv3(S_i)
        return Sinv_i, Sinv_i

    Sinv0 = _inv3(D[0])
    _, Sinv_rest = jax.lax.scan(fac_step, Sinv0, (U, D[1:]))
    Sinv = jnp.concatenate([Sinv0[None], Sinv_rest], axis=0)
    # forward sweep operator T_i = U_i^T Sinv_i (applied at step i+1);
    # backward sweep operator W_i = Sinv_i U_i (applied at step i)
    T = jnp.einsum("nji,njk->nik", U, Sinv[:-1])
    W = jnp.einsum("nij,njk->nik", Sinv[:-1], U)
    return Sinv, T, W


def pcr_solve(D, U, r, free, n_steps: int):
    """Parallel cyclic reduction solve of the block-tridiagonal system
    (D_i diagonal blocks, U_i = M[i, i+1]) — O(log n) depth with fully
    batched 3x3 block ops, vs the O(n) span of the Thomas sweeps. Used for
    large graphs where the sequential scan would dominate.

    a_i z_{i-1} + b_i z_i + c_i z_{i+1} = r_i with a_i = U_{i-1}^T,
    c_i = U_i; each PCR step eliminates neighbors at distance 2^k.
    """
    n = D.shape[0]
    eye = jnp.eye(3, dtype=D.dtype)
    B = jnp.where(free[:, None, None] > 0, D, eye[None])
    zero_blk = jnp.zeros((3, 3), D.dtype)
    A = jnp.concatenate(
        [zero_blk[None], jnp.swapaxes(U, 1, 2)], axis=0
    )  # (n,3,3) sub-diagonal
    C = jnp.concatenate([U, zero_blk[None]], axis=0)  # super-diagonal
    R = r * free[:, None]

    def shift_up(x, s):  # x[i - s] with identity/zero padding
        pad = [(s, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)[:n]

    def shift_down(x, s):  # x[i + s]
        pad = [(0, s)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)[s:]

    for k in range(n_steps):
        s = 1 << k
        if s >= n:
            break
        Bm = shift_up(B, s)
        Bm = Bm + jnp.where(
            (jnp.arange(n) < s)[:, None, None], eye[None], 0.0
        )  # out-of-range neighbors get identity diag
        Bp = shift_down(B, s)
        Bp = Bp + jnp.where(
            (jnp.arange(n) >= n - s)[:, None, None], eye[None], 0.0
        )
        Am, Cp = shift_up(A, s), shift_down(C, s)
        Rm, Rp = shift_up(R, s), shift_down(R, s)
        Cm, Ap = shift_up(C, s), shift_down(A, s)
        Bm_inv = jax.vmap(_inv3)(Bm)
        Bp_inv = jax.vmap(_inv3)(Bp)
        alpha = -jnp.einsum("nij,njk->nik", A, Bm_inv)
        gamma = -jnp.einsum("nij,njk->nik", C, Bp_inv)
        B = (
            B + jnp.einsum("nij,njk->nik", alpha, Cm)
            + jnp.einsum("nij,njk->nik", gamma, Ap)
        )
        R = (
            R + jnp.einsum("nij,nj->ni", alpha, Rm)
            + jnp.einsum("nij,nj->ni", gamma, Rp)
        )
        A = jnp.einsum("nij,njk->nik", alpha, Am)
        C = jnp.einsum("nij,njk->nik", gamma, Cp)

    z = jnp.einsum("nij,nj->ni", jax.vmap(_inv3)(B), R)
    return z * free[:, None]


def apply(Sinv, T, W, r, free):
    """Solve M z = r with the factorization (two sequential sweeps)."""
    r = r * free[:, None]

    def fwd(y_prev, inputs):
        t_i, r_i = inputs
        y_i = r_i - t_i @ y_prev
        return y_i, y_i

    y0 = r[0]
    _, y_rest = jax.lax.scan(fwd, y0, (T, r[1:]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)
    w = jnp.einsum("nij,nj->ni", Sinv, y)

    def bwd(z_next, inputs):
        w_i, wop_i = inputs
        z_i = w_i - wop_i @ z_next
        return z_i, z_i

    zn = w[-1]
    _, z_rest = jax.lax.scan(
        bwd, zn, (w[:-1][::-1], W[::-1])
    )
    z = jnp.concatenate([z_rest[::-1], zn[None]], axis=0)
    return z * free[:, None]
