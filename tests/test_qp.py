"""QP layer tests: Riccati vs dense KKT; barrier QP vs scipy on box problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from dnn_mppi_mpc_tpu.solvers.qp import (
    BoxedQPData,
    LQRData,
    barrier_qp_solve,
    relaxed_barrier,
    riccati_solve,
    riccati_solve_parallel,
)


def _random_lqr(N=8, nx=3, nu=2, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) + 0.1 * rng.normal(size=(N, nx, nx))
    B = 0.3 * rng.normal(size=(N, nx, nu))
    c = 0.1 * rng.normal(size=(N, nx))
    Q = np.stack([np.eye(nx) * (1.0 + 0.1 * i) for i in range(N + 1)])
    qx = 0.2 * rng.normal(size=(N + 1, nx))
    R = np.stack([np.eye(nu) * 0.5 for _ in range(N)])
    ru = 0.1 * rng.normal(size=(N, nu))
    return A, B, c, Q, qx, R, ru


def _dense_kkt_solution(A, B, c, Q, qx, R, ru, dx0):
    """Reference solution of the affine LQR by dense KKT factorization."""
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]
    # variables: dx_1..dx_N (N*nx), du_0..du_{N-1} (N*nu)
    nz = N * nx + N * nu

    def ix(i):  # dx_i for i>=1
        return (i - 1) * nx

    def iu(i):
        return N * nx + i * nu

    H = np.zeros((nz, nz))
    h = np.zeros(nz)
    for i in range(1, N + 1):
        H[ix(i) : ix(i) + nx, ix(i) : ix(i) + nx] = Q[i]
        h[ix(i) : ix(i) + nx] = qx[i]
    for i in range(N):
        H[iu(i) : iu(i) + nu, iu(i) : iu(i) + nu] = R[i]
        h[iu(i) : iu(i) + nu] = ru[i]

    E = np.zeros((N * nx, nz))
    e = np.zeros(N * nx)
    for i in range(N):
        row = i * nx
        if i == 0:
            e[row : row + nx] = -(A[0] @ dx0 + c[0])
        else:
            E[row : row + nx, ix(i) : ix(i) + nx] = A[i]
            e[row : row + nx] = -c[i]
        E[row : row + nx, iu(i) : iu(i) + nu] = B[i]
        E[row : row + nx, ix(i + 1) : ix(i + 1) + nx] -= np.eye(nx)

    KKT = np.block([[H, E.T], [E, np.zeros((N * nx, N * nx))]])
    rhs = np.concatenate([-h, e])
    sol = np.linalg.solve(KKT, rhs)
    z = sol[:nz]
    dX = np.concatenate([dx0[None], z[: N * nx].reshape(N, nx)], axis=0)
    dU = z[N * nx :].reshape(N, nu)
    return dX, dU


def test_riccati_matches_dense_kkt():
    A, B, c, Q, qx, R, ru = _random_lqr()
    dx0 = np.array([0.1, -0.2, 0.05])
    want_X, want_U = _dense_kkt_solution(A, B, c, Q, qx, R, ru, dx0)
    data = LQRData(
        A=jnp.asarray(A),
        B=jnp.asarray(B),
        c=jnp.asarray(c),
        Qxx=jnp.asarray(Q),
        qx=jnp.asarray(qx),
        Ruu=jnp.asarray(R),
        ru=jnp.asarray(ru),
    )
    dX, dU = riccati_solve(data, jnp.asarray(dx0))
    np.testing.assert_allclose(np.asarray(dU), want_U, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dX), want_X, rtol=1e-6, atol=1e-8)


def test_relaxed_barrier_smooth_and_convex():
    w = jnp.linspace(-0.5, 2.0, 200)
    val, grad, hess = relaxed_barrier(w, mu=0.1, delta=1e-2)
    assert np.all(np.isfinite(np.asarray(val)))
    assert np.all(np.asarray(hess) > 0)
    # numerical gradient check
    eps = 1e-5
    v1, _, _ = relaxed_barrier(w + eps, 0.1, 1e-2)
    v0, _, _ = relaxed_barrier(w - eps, 0.1, 1e-2)
    np.testing.assert_allclose((np.asarray(v1 - v0)) / (2 * eps), np.asarray(grad), atol=1e-4)


def _solve_qp_scipy(A, B, c, Q, qx, R, ru, dx0, lbx, ubx, lbu, ubu):
    """Reference: scipy trust-constr on the dense QP with bounds."""
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]

    def unpack(z):
        dX = np.concatenate([dx0[None], z[: N * nx].reshape(N, nx)], axis=0)
        dU = z[N * nx :].reshape(N, nu)
        return dX, dU

    def fun(z):
        dX, dU = unpack(z)
        f = 0.0
        for i in range(1, N + 1):
            f += 0.5 * dX[i] @ Q[i] @ dX[i] + qx[i] @ dX[i]
        for i in range(N):
            f += 0.5 * dU[i] @ R[i] @ dU[i] + ru[i] @ dU[i]
        return f

    cons = []

    def dyn_con(z):
        dX, dU = unpack(z)
        res = []
        for i in range(N):
            res.append(A[i] @ dX[i] + B[i] @ dU[i] + c[i] - dX[i + 1])
        return np.concatenate(res)

    cons.append({"type": "eq", "fun": dyn_con})
    nz = N * nx + N * nu
    lo = np.concatenate([np.tile(lbx, N), np.tile(lbu, N)])
    hi = np.concatenate([np.tile(ubx, N), np.tile(ubu, N)])
    res = scipy.optimize.minimize(
        fun,
        np.zeros(nz),
        method="SLSQP",
        bounds=list(zip(lo, hi)),
        constraints=cons,
        options={"maxiter": 500, "ftol": 1e-12},
    )
    assert res.success, res.message
    return unpack(res.x)


def test_barrier_qp_matches_scipy_with_active_bounds():
    N, nx, nu = 6, 2, 1
    rng = np.random.default_rng(3)
    A = np.tile(np.array([[1.0, 0.1], [0.0, 1.0]]), (N, 1, 1))
    B = np.tile(np.array([[0.005], [0.1]]), (N, 1, 1))
    c = np.zeros((N, nx))
    Q = np.tile(np.eye(nx), (N + 1, 1, 1))
    # pull the state hard toward +1 so the control bound activates
    qx = np.tile(np.array([-2.0, 0.0]), (N + 1, 1))
    R = np.tile(np.eye(nu) * 0.01, (N, 1, 1))
    ru = np.zeros((N, nu))
    dx0 = np.zeros(nx)
    lbx, ubx = np.array([-10.0, -10.0]), np.array([10.0, 10.0])
    lbu, ubu = np.array([-0.5]), np.array([0.5])

    want_X, want_U = _solve_qp_scipy(A, B, c, Q, qx, R, ru, dx0, lbx, ubx, lbu, ubu)

    qp = BoxedQPData(
        A=jnp.asarray(A),
        B=jnp.asarray(B),
        c=jnp.asarray(c),
        Q=jnp.asarray(Q),
        qx_base=jnp.asarray(qx),
        R=jnp.asarray(R),
        ru_base=jnp.asarray(ru),
        lbx=jnp.asarray(np.tile(-lbx, (N + 1, 1))),  # margins at δ=0: 0 − lbx
        ubx=jnp.asarray(np.tile(ubx, (N + 1, 1))),
        lbu=jnp.asarray(np.tile(-lbu, (N, 1))),
        ubu=jnp.asarray(np.tile(ubu, (N, 1))),
        Jh=None,
        h0=None,
    )
    dX, dU = barrier_qp_solve(qp, jnp.asarray(dx0), num_iters=25, mu0=1e-1, kappa=0.4)
    # active bound must be found and respected (to barrier tolerance)
    assert np.max(np.asarray(dU)) <= 0.5 + 1e-3
    np.testing.assert_allclose(np.asarray(dU), want_U, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dX), want_X, atol=5e-3)


def test_barrier_qp_unconstrained_matches_kkt():
    A, B, c, Q, qx, R, ru = _random_lqr(seed=5)
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]
    dx0 = np.zeros(nx)
    want_X, want_U = _dense_kkt_solution(A, B, c, Q, qx, R, ru, dx0)
    big = 1e6
    qp = BoxedQPData(
        A=jnp.asarray(A),
        B=jnp.asarray(B),
        c=jnp.asarray(c),
        Q=jnp.asarray(Q),
        qx_base=jnp.asarray(qx),
        R=jnp.asarray(R),
        ru_base=jnp.asarray(ru),
        lbx=jnp.full((N + 1, nx), big),
        ubx=jnp.full((N + 1, nx), big),
        lbu=jnp.full((N, nu), big),
        ubu=jnp.full((N, nu), big),
        Jh=None,
        h0=None,
    )
    dX, dU = barrier_qp_solve(qp, jnp.asarray(dx0), num_iters=15)
    np.testing.assert_allclose(np.asarray(dU), want_U, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dX), want_X, atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_riccati_fuzz_vs_dense_kkt(seed):
    """Randomized LQR problems: Riccati must equal the dense KKT solution."""
    rng = np.random.default_rng(100 + seed)
    N = int(rng.integers(3, 12))
    nx = int(rng.integers(2, 5))
    nu = int(rng.integers(1, 4))
    A = np.eye(nx) + 0.1 * rng.normal(size=(N, nx, nx))
    B = 0.3 * rng.normal(size=(N, nx, nu))
    c = 0.1 * rng.normal(size=(N, nx))
    Q = np.stack([np.eye(nx) * rng.uniform(0.5, 3.0) for _ in range(N + 1)])
    qx = 0.3 * rng.normal(size=(N + 1, nx))
    R = np.stack([np.eye(nu) * rng.uniform(0.1, 1.0) for _ in range(N)])
    ru = 0.2 * rng.normal(size=(N, nu))
    dx0 = rng.normal(size=nx) * 0.2

    want_X, want_U = _dense_kkt_solution(A, B, c, Q, qx, R, ru, dx0)
    data = LQRData(
        A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c),
        Qxx=jnp.asarray(Q), qx=jnp.asarray(qx),
        Ruu=jnp.asarray(R), ru=jnp.asarray(ru),
    )
    dX, dU = riccati_solve(data, jnp.asarray(dx0))
    np.testing.assert_allclose(np.asarray(dU), want_U, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dX), want_X, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", range(3))
def test_barrier_qp_fuzz_vs_scipy(seed):
    """Randomized box-constrained QPs with active bounds vs scipy SLSQP."""
    rng = np.random.default_rng(200 + seed)
    N, nx, nu = 5, 2, 1
    A = np.stack([np.eye(nx) + 0.1 * rng.normal(size=(nx, nx)) for _ in range(N)])
    B = 0.3 * rng.normal(size=(N, nx, nu))
    c = 0.05 * rng.normal(size=(N, nx))
    Q = np.tile(np.eye(nx), (N + 1, 1, 1))
    qx = rng.normal(size=(N + 1, nx)) * 1.5  # strong pull → bounds activate
    R = np.tile(np.eye(nu) * 0.05, (N, 1, 1))
    ru = np.zeros((N, nu))
    dx0 = np.zeros(nx)
    lbx, ubx = np.full(nx, -5.0), np.full(nx, 5.0)
    lbu, ubu = np.array([-0.6]), np.array([0.6])

    want_X, want_U = _solve_qp_scipy(A, B, c, Q, qx, R, ru, dx0, lbx, ubx, lbu, ubu)
    qp = BoxedQPData(
        A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c),
        Q=jnp.asarray(Q), qx_base=jnp.asarray(qx),
        R=jnp.asarray(R), ru_base=jnp.asarray(ru),
        lbx=jnp.asarray(np.tile(-lbx, (N + 1, 1))),
        ubx=jnp.asarray(np.tile(ubx, (N + 1, 1))),
        lbu=jnp.asarray(np.tile(-lbu, (N, 1))),
        ubu=jnp.asarray(np.tile(ubu, (N, 1))),
        Jh=None, h0=None,
    )
    dX, dU = barrier_qp_solve(qp, jnp.asarray(dx0), num_iters=30, mu0=1e-1, kappa=0.4)
    np.testing.assert_allclose(np.asarray(dU), want_U, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dX), want_X, atol=1e-2)


@pytest.mark.parametrize(
    "seed",
    # 2 seeds in the fast set; the full sweep stays in the slow suite
    # (each case costs ~20-30 s of CPU compile — verdict r3 #9)
    [0] + [pytest.param(s, marks=pytest.mark.slow) for s in (1, 2, 3, 4, 5)],
)
def test_parallel_riccati_matches_sequential(seed):
    """Associative-scan LQR (O(log N) depth) vs the sequential Riccati sweep:
    identical minimizer on random horizons/dimensions (incl. N=1)."""
    rng = np.random.default_rng(400 + seed)
    N = int(rng.integers(1, 60))
    nx = int(rng.integers(2, 6))
    nu = int(rng.integers(1, 4))
    A = rng.normal(0, 0.5, (N, nx, nx)) + np.eye(nx) * 0.5
    B = rng.normal(0, 0.5, (N, nx, nu))
    c = rng.normal(0, 0.1, (N, nx))
    Qh = rng.normal(0, 1, (N + 1, nx, nx))
    Q = np.einsum("iax,iay->ixy", Qh, Qh) + np.eye(nx)[None] * 0.1
    qx = rng.normal(0, 1, (N + 1, nx))
    Rh = rng.normal(0, 1, (N, nu, nu))
    R = np.einsum("iau,iav->iuv", Rh, Rh) + np.eye(nu)[None] * 0.5
    ru = rng.normal(0, 1, (N, nu))
    dx0 = rng.normal(0, 1, (nx,))
    data = LQRData(
        A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c),
        Qxx=jnp.asarray(Q), qx=jnp.asarray(qx),
        Ruu=jnp.asarray(R), ru=jnp.asarray(ru),
    )
    X1, U1 = riccati_solve(data, jnp.asarray(dx0))
    X2, U2 = riccati_solve_parallel(data, jnp.asarray(dx0))
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U1), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X1), rtol=1e-8, atol=1e-9)


def test_barrier_qp_parallel_and_kkt():
    """parallel=True reproduces the sequential barrier solve; the KKT step
    norm certificate shrinks as qp_iters grows (convergence visible)."""
    rng = np.random.default_rng(77)
    N, nx, nu = 8, 3, 2
    A = np.stack([np.eye(nx) + 0.1 * rng.normal(size=(nx, nx)) for _ in range(N)])
    B = 0.3 * rng.normal(size=(N, nx, nu))
    c = 0.05 * rng.normal(size=(N, nx))
    Q = np.tile(np.eye(nx), (N + 1, 1, 1))
    qx = rng.normal(size=(N + 1, nx))
    R = np.tile(np.eye(nu) * 0.1, (N, 1, 1))
    ru = np.zeros((N, nu))
    qp = BoxedQPData(
        A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c),
        Q=jnp.asarray(Q), qx_base=jnp.asarray(qx),
        R=jnp.asarray(R), ru_base=jnp.asarray(ru),
        lbx=jnp.full((N + 1, nx), 5.0), ubx=jnp.full((N + 1, nx), 5.0),
        lbu=jnp.full((N, nu), 0.8), ubu=jnp.full((N, nu), 0.8),
        Jh=None, h0=None,
    )
    dx0 = jnp.zeros(nx)
    dX_s, dU_s = barrier_qp_solve(qp, dx0, num_iters=20)
    dX_p, dU_p, kkt20 = barrier_qp_solve(
        qp, dx0, num_iters=20, parallel=True, return_kkt=True
    )
    np.testing.assert_allclose(np.asarray(dU_p), np.asarray(dU_s), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dX_p), np.asarray(dX_s), rtol=1e-6, atol=1e-8)
    *_, kkt4 = barrier_qp_solve(qp, dx0, num_iters=4, parallel=True, return_kkt=True)
    assert float(kkt20) < float(kkt4)
    assert float(kkt20) < 1e-3
