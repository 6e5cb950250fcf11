"""Block-tridiagonal preconditioner: exactness on pure chains + solver
convergence on large rings."""
import numpy as np
import jax.numpy as jnp

from slam_toolbox_tpu.solver import chain_precond as cp


def random_spd_chain(n, seed=0):
    rng = np.random.default_rng(seed)
    U = rng.normal(0, 0.3, (n - 1, 3, 3))
    D = np.zeros((n, 3, 3))
    for i in range(n):
        a = rng.normal(0, 1, (3, 3))
        D[i] = a @ a.T + 4.0 * np.eye(3)
    # assemble dense tridiagonal M
    M = np.zeros((3 * n, 3 * n))
    for i in range(n):
        M[3 * i:3 * i + 3, 3 * i:3 * i + 3] = D[i]
    for i in range(n - 1):
        M[3 * i:3 * i + 3, 3 * i + 3:3 * i + 6] = U[i]
        M[3 * i + 3:3 * i + 6, 3 * i:3 * i + 3] = U[i].T
    return D, U, M


def test_apply_solves_tridiagonal_exactly():
    n = 40
    D, U, M = random_spd_chain(n, seed=3)
    free = np.ones(n, np.float64)
    Sinv, T, W = cp.factorize(jnp.asarray(D), jnp.asarray(U),
                              jnp.asarray(free))
    rng = np.random.default_rng(1)
    r = rng.normal(0, 1, (n, 3))
    z = np.asarray(cp.apply(Sinv, T, W, jnp.asarray(r),
                            jnp.asarray(free)))
    z_ref = np.linalg.solve(M, r.reshape(-1)).reshape(n, 3)
    np.testing.assert_allclose(z, z_ref, rtol=1e-5, atol=1e-6)


def test_pcr_matches_dense_solve():
    import math

    n = 37  # non-power-of-two on purpose
    D, U, M = random_spd_chain(n, seed=7)
    free = np.ones(n, np.float64)
    r = np.random.default_rng(4).normal(0, 1, (n, 3))
    z = np.asarray(cp.pcr_solve(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(r),
        jnp.asarray(free), n_steps=int(math.ceil(math.log2(n))) + 1,
    ))
    z_ref = np.linalg.solve(M, r.reshape(-1)).reshape(n, 3)
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-5)


def test_pcr_matches_thomas():
    import math

    n = 64
    D, U, M = random_spd_chain(n, seed=8)
    free = np.ones(n, np.float64)
    free[0] = 0.0
    r = np.random.default_rng(5).normal(0, 1, (n, 3))
    Um = U * (free[:-1] * free[1:])[:, None, None]
    Sinv, T, W = cp.factorize(jnp.asarray(D), jnp.asarray(Um),
                              jnp.asarray(free))
    z_thomas = np.asarray(cp.apply(Sinv, T, W, jnp.asarray(r),
                                   jnp.asarray(free)))
    z_pcr = np.asarray(cp.pcr_solve(
        jnp.asarray(D), jnp.asarray(Um),
        jnp.asarray(r), jnp.asarray(free),
        n_steps=int(math.ceil(math.log2(n))) + 1,
    ))
    np.testing.assert_allclose(z_pcr, z_thomas, rtol=1e-4, atol=1e-5)


def test_apply_respects_fixed_nodes():
    n = 10
    D, U, M = random_spd_chain(n, seed=5)
    free = np.ones(n, np.float64)
    free[0] = 0.0
    Sinv, T, W = cp.factorize(jnp.asarray(D), jnp.asarray(U),
                              jnp.asarray(free))
    r = np.random.default_rng(2).normal(0, 1, (n, 3))
    z = np.asarray(cp.apply(Sinv, T, W, jnp.asarray(r),
                            jnp.asarray(free)))
    np.testing.assert_allclose(z[0], 0.0, atol=1e-12)


def test_large_ring_converges_fast():
    """A 2000-node noisy ring with one loop closure must close tightly
    with the fixed CG budget (no O(n) iteration scaling)."""
    from slam_toolbox_tpu.solver import PoseGraphSolver
    from slam_toolbox_tpu.core.params import SolverConfig

    n = 2000
    s = PoseGraphSolver(SolverConfig(dist_edge_threshold=10**9))
    cov = np.diag([1e-4, 1e-4, 1e-5])
    rng = np.random.default_rng(0)
    pose = np.zeros(3)
    s.add_node(0, pose)
    step = np.array([0.5, 0.0, 2 * np.pi / n])
    for i in range(1, n):
        noisy = step + rng.normal(0, 0.01, 3)
        c, sn = np.cos(pose[2]), np.sin(pose[2])
        pose = np.array([
            pose[0] + c * noisy[0] - sn * noisy[1],
            pose[1] + sn * noisy[0] + c * noisy[1],
            pose[2] + noisy[2],
        ])
        s.add_node(i, pose)
        s.add_constraint(i - 1, i, step, cov)
    s.add_constraint(n - 1, 0, step, cov)
    corr = dict(s.compute())
    d = np.hypot(*(corr[n - 1][:2] - corr[0][:2]))
    assert d < 1.0, f"loop gap {d}"
