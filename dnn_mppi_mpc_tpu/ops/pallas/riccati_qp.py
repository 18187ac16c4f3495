"""Fused barrier-Riccati QP kernel — the whole NMPC QP solve in one launch.

The stage-structured barrier QP of solvers/qp.py::barrier_qp_solve is
latency-bound, not FLOP-bound (docs/PERF.md): qp_iters × (backward + forward)
Riccati sweeps over N stages of 3×3/5×5 matrices are ~10³ *sequential* tiny
XLA ops, each paying per-op dispatch — 3.6 ms for N=30 where the arithmetic
is microseconds. HPIPM wins on CPU precisely by keeping the whole solve in
one hot loop; this kernel is the TPU equivalent: every Newton iteration —
relaxed-barrier derivative folds, the backward Riccati recursion, the forward
rollout, fraction-to-boundary damping, the iterate update — runs in one
launch against on-chip problem data, with zero kernel-launch or op boundaries
inside the solve.

Two instantiations of the SAME kernel body (``_qp_kernel``):

* **per-problem** (``pallas_barrier_qp_solve``): every element access is an
  SMEM scalar; the solve runs on the scalar core. Lowest latency for a
  single controller tick.
* **lane-batched** (``pallas_batched_barrier_qp_solve``): a fleet of B
  independent QPs rides the 128 VPU lanes — each "scalar" of the algorithm
  becomes a (128,)-lane vector over fleet members, so one launch with the
  identical sequential schedule solves up to 128 problems (grid over
  ⌈B/128⌉ lane blocks beyond that). This is the TPU-native answer to fleet
  NMPC serving (SURVEY §2.10(c)): where the reference would run one acados
  process per robot, here the fleet dimension is a vector lane.

Semantics are bit-for-bit those of ``barrier_qp_solve`` (same μ-schedule,
same regularization, same damping rule, same final condensing roll);
parity-tested against it in tests/test_riccati_qp.py, including the
h-constraint and cross-term (S) paths, in both instantiations. Replaces
acados' FULL_CONDENSING_HPIPM step
(mpc_differential_drive_obstacle_static.py:237) at the kernel level.

All matrices are small and static (nx, nu, n_h ≤ ~8): loops over matrix
dimensions are Python-unrolled into straight-line code; loops over stages
and Newton iterations are ``fori_loop``s with dynamic indexing on the
(untiled) stage dimension. Stage-stacked inputs are flattened to
(stage, row·col) tables — SMEM in the per-problem kernel, VMEM with a
trailing lane dimension in the batched one.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38
_LANES = 128  # fleet members per lane block in the batched kernel


def _qp_kernel(
    mus_ref,  # SMEM (num_iters,) barrier μ schedule (shared across lanes)
    misc_ref,  # SMEM (5,) δ, κ_bound, κ_h, h_slope, reg (shared)
    A_ref,  # (N, nx·nx[, B])
    B_ref,  # (N, nx·nu[, B])
    c_ref,  # (N, nx[, B])
    Q_ref,  # (N+1, nx·nx[, B])
    qxb_ref,  # (N+1, nx[, B])
    R_ref,  # (N, nu·nu[, B])
    rub_ref,  # (N, nu[, B])
    lbx_ref,  # (N+1, nx[, B]) margins at δ=0
    ubx_ref,  # (N+1, nx[, B])
    lbu_ref,  # (N, nu[, B])
    ubu_ref,  # (N, nu[, B])
    Jh_ref,  # (N+1, n_h·nx[, B]) (dummy (1,1[,B]) when n_h=0)
    h0_ref,  # (N+1, n_h[, B])
    S_ref,  # (N, nu·nx[, B]) (dummy when has_S=False)
    dx0_ref,  # (nx[, B])
    dX_ref,  # out (N+1, nx[, B])
    dU_ref,  # out (N, nu[, B])
    kkt_ref,  # out (1[, B])
    K_s,  # scratch (N, nu·nx[, B]) feedback gains
    k_s,  # scratch (N, nu[, B])
    ddX_s,  # scratch (N+1, nx[, B]) Newton step
    ddU_s,  # scratch (N, nu[, B])
    cres_s,  # scratch (N, nx[, B]) dynamics residual at the iterate
    *,
    N: int,
    nx: int,
    nu: int,
    n_h: int,
    num_iters: int,
    has_S: bool,
    batched: bool,
):
    f32 = jnp.float32

    # Element access adapter: per-problem = SMEM scalars on the scalar core;
    # lane-batched = one (LANES,) VPU vector per algorithmic "scalar", the
    # fleet dimension riding the lanes. The algorithm below is written once
    # against these five primitives.
    if batched:

        def ld(ref, i, j):
            return ref[i, j, :]

        def st(ref, i, j, v):
            ref[i, j, :] = v

        def ld1(ref, i):
            return ref[i, :]

        def st1(ref, i, v):
            ref[i, :] = v

        # Laneful zero derived from runtime data — a replicated constant
        # would fold back to scalar and break fori_loop carries (PERF.md
        # Mosaic lessons).
        _zero = A_ref[0, 0, :] * f32(0.0)

        def const(x):
            return _zero + f32(x)

    else:

        def ld(ref, i, j):
            return ref[i, j]

        def st(ref, i, j, v):
            ref[i, j] = v

        def ld1(ref, i):
            return ref[i]

        def st1(ref, i, v):
            ref[i] = v

        const = f32

    delta = misc_ref[0]
    stiff = misc_ref[1]
    h_stiff = misc_ref[2]
    h_slope = misc_ref[3]
    reg = misc_ref[4]

    def rb(w, mu, kappa):
        """(ψ', ψ'') of the relaxed log barrier (solvers/qp.py::relaxed_barrier)."""
        use_log = w > delta
        w_safe = jnp.maximum(w, delta)
        g = jnp.where(use_log, -mu / w_safe, -mu / delta - kappa * (delta - w))
        h = jnp.where(use_log, mu / (w_safe * w_safe), kappa)
        return g, h

    def lu_solve(M, rhs_cols):
        """Solve M X = rhs for unrolled M (nu×nu nested lists) via
        partial-pivot LU; rhs is a list of columns (each a list of nu
        elements). Returns list of columns. Pivoted LU rather than Cholesky:
        f32 cancellation under barrier stiffness can leave Luu indefinite,
        where Cholesky pivot clamping explodes the gain but LU returns the
        same bounded step as jnp.linalg.solve (see
        ops/sampling.py::small_lu_solve). In the batched kernel the pivot
        choice is per-lane (each fleet member pivots independently)."""
        m = len(rhs_cols)
        w = nu + m
        rows = [
            [M[i][j] for j in range(nu)] + [col[i] for col in rhs_cols]
            for i in range(nu)
        ]
        for i in range(nu):
            # bubble the max-|column i| row into position i
            for j in range(i + 1, nu):
                swap = jnp.abs(rows[j][i]) > jnp.abs(rows[i][i])
                for t in range(w):
                    hi = jnp.where(swap, rows[j][t], rows[i][t])
                    lo = jnp.where(swap, rows[i][t], rows[j][t])
                    rows[i][t], rows[j][t] = hi, lo
            inv_p = f32(1.0) / rows[i][i]
            for j in range(i + 1, nu):
                f = rows[j][i] * inv_p
                for t in range(i, w):
                    rows[j][t] = rows[j][t] - f * rows[i][t]
        out = []
        for ci in range(m):
            x = [None] * nu
            for i in reversed(range(nu)):
                s = rows[i][nu + ci]
                for t in range(i + 1, nu):
                    s = s - rows[i][t] * x[t]
                x[i] = s / rows[i][i]
            out.append(x)
        return out

    def load_mat(ref, i, rows, cols):
        return [[ld(ref, i, r * cols + c) for c in range(cols)] for r in range(rows)]

    def fold_x(i, mu):
        """Folded state Hessian/gradient at stage i for the current iterate:
        Q + barrier diag + Jhᵀ·h''·Jh ;  qx_base + Q·δx + barrier + Jhᵀ·h'."""
        dXi = [ld(dX_ref, i, d) for d in range(nx)]
        Qxx = load_mat(Q_ref, i, nx, nx)
        qx = [
            ld(qxb_ref, i, d) + sum(Qxx[d][e] * dXi[e] for e in range(nx))
            for d in range(nx)
        ]
        for d in range(nx):
            wl = ld(lbx_ref, i, d) + dXi[d]
            wu = ld(ubx_ref, i, d) - dXi[d]
            gl, hl = rb(wl, mu, stiff)
            gu, hu = rb(wu, mu, stiff)
            qx[d] = qx[d] + gl - gu
            Qxx[d][d] = Qxx[d][d] + hl + hu
        for r in range(n_h):
            Jr = [ld(Jh_ref, i, r * nx + d) for d in range(nx)]
            wh = ld(h0_ref, i, r) + sum(Jr[d] * dXi[d] for d in range(nx))
            gh, hh = rb(wh, mu, h_stiff)
            gh = gh - h_slope * jnp.where(wh < 0, f32(1.0), f32(0.0))
            for d in range(nx):
                qx[d] = qx[d] + Jr[d] * gh
                for e in range(nx):
                    Qxx[d][e] = Qxx[d][e] + Jr[d] * hh * Jr[e]
        return Qxx, qx, dXi

    def newton_iter(it, _):
        mu = mus_ref[it]

        # ---- terminal value function --------------------------------------
        QxxN, qxN, _ = fold_x(N, mu)
        P = QxxN
        p = qxN

        # ---- backward sweep ------------------------------------------------
        def backward(j, carry):
            i = N - 1 - j
            Pf = [[carry[r * nx + c] for c in range(nx)] for r in range(nx)]
            pf = [carry[nx * nx + r] for r in range(nx)]

            Qxx, qx, dXi = fold_x(i, mu)
            dUi = [ld(dU_ref, i, a) for a in range(nu)]
            Ruu = load_mat(R_ref, i, nu, nu)
            ru = [
                ld(rub_ref, i, a) + sum(Ruu[a][b] * dUi[b] for b in range(nu))
                for a in range(nu)
            ]
            for a in range(nu):
                wl = ld(lbu_ref, i, a) + dUi[a]
                wu = ld(ubu_ref, i, a) - dUi[a]
                gl, hl = rb(wl, mu, stiff)
                gu, hu = rb(wu, mu, stiff)
                ru[a] = ru[a] + gl - gu
                Ruu[a][a] = Ruu[a][a] + hl + hu
            if has_S:
                Sm = load_mat(S_ref, i, nu, nx)
                for d in range(nx):
                    qx[d] = qx[d] + sum(Sm[a][d] * dUi[a] for a in range(nu))
                for a in range(nu):
                    ru[a] = ru[a] + sum(Sm[a][d] * dXi[d] for d in range(nx))
            else:
                Sm = [[f32(0.0)] * nx for _ in range(nu)]

            Am = load_mat(A_ref, i, nx, nx)
            Bm = load_mat(B_ref, i, nx, nu)
            cres = [
                sum(Am[d][e] * dXi[e] for e in range(nx))
                + sum(Bm[d][a] * dUi[a] for a in range(nu))
                + ld(c_ref, i, d)
                - ld(dX_ref, i + 1, d)
                for d in range(nx)
            ]
            for d in range(nx):
                st(cres_s, i, d, cres[d])

            PA = [
                [sum(Pf[r][e] * Am[e][c] for e in range(nx)) for c in range(nx)]
                for r in range(nx)
            ]
            PB = [
                [sum(Pf[r][e] * Bm[e][a] for e in range(nx)) for a in range(nu)]
                for r in range(nx)
            ]
            Pc = [sum(Pf[r][e] * cres[e] for e in range(nx)) for r in range(nx)]

            Luu_raw = [
                [
                    Ruu[a][b] + sum(Bm[r][a] * PB[r][b] for r in range(nx))
                    for b in range(nu)
                ]
                for a in range(nu)
            ]
            Luu = [
                [
                    0.5 * (Luu_raw[a][b] + Luu_raw[b][a])
                    + (reg if a == b else f32(0.0))
                    for b in range(nu)
                ]
                for a in range(nu)
            ]
            Lux = [
                [
                    Sm[a][c] + sum(Bm[r][a] * PA[r][c] for r in range(nx))
                    for c in range(nx)
                ]
                for a in range(nu)
            ]
            lu = [
                ru[a] + sum(Bm[r][a] * (pf[r] + Pc[r]) for r in range(nx))
                for a in range(nu)
            ]

            cols = [[Lux[a][c] for a in range(nu)] for c in range(nx)]
            cols.append(lu)
            sol = lu_solve(Luu, cols)
            Kg = [[-sol[c][a] for c in range(nx)] for a in range(nu)]  # (nu, nx)
            kg = [-sol[nx][a] for a in range(nu)]
            for a in range(nu):
                st(k_s, i, a, kg[a])
                for c in range(nx):
                    st(K_s, i, a * nx + c, Kg[a][c])

            Pn_raw = [
                [
                    Qxx[r][c]
                    + sum(Am[e][r] * PA[e][c] for e in range(nx))
                    + sum(Lux[a][r] * Kg[a][c] for a in range(nu))
                    for c in range(nx)
                ]
                for r in range(nx)
            ]
            pn = [
                qx[r]
                + sum(Am[e][r] * (pf[e] + Pc[e]) for e in range(nx))
                + sum(Lux[a][r] * kg[a] for a in range(nu))
                for r in range(nx)
            ]
            flat = []
            for r in range(nx):
                for c in range(nx):
                    flat.append(0.5 * (Pn_raw[r][c] + Pn_raw[c][r]))
            flat.extend(pn)
            return tuple(flat)

        init = []
        for r in range(nx):
            for c in range(nx):
                init.append(P[r][c])
        init.extend(p)
        jax.lax.fori_loop(0, N, backward, tuple(init))

        # ---- forward sweep (residual problem: ddx₀ = 0) --------------------
        for d in range(nx):
            st(ddX_s, 0, d, const(0.0))

        def forward(i, carry):
            ddx = list(carry)
            ddu = [
                ld(k_s, i, a)
                + sum(ld(K_s, i, a * nx + c) * ddx[c] for c in range(nx))
                for a in range(nu)
            ]
            for a in range(nu):
                st(ddU_s, i, a, ddu[a])
            Am = load_mat(A_ref, i, nx, nx)
            Bm = load_mat(B_ref, i, nx, nu)
            nxt = [
                sum(Am[d][e] * ddx[e] for e in range(nx))
                + sum(Bm[d][a] * ddu[a] for a in range(nu))
                + ld(cres_s, i, d)
                for d in range(nx)
            ]
            for d in range(nx):
                st(ddX_s, i + 1, d, nxt[d])
            return tuple(nxt)

        jax.lax.fori_loop(0, N, forward, tuple(const(0.0) for _ in range(nx)))

        # ---- fraction-to-boundary damping ---------------------------------
        def ftb(w, dw, amin):
            shrink = jnp.logical_and(dw < 0, w > delta)
            a = jnp.where(
                shrink, (w - 0.5 * delta) / jnp.maximum(-dw, f32(1e-30)), f32(_INF)
            )
            return jnp.minimum(amin, a)

        def alpha_x(i, amin):
            for d in range(nx):
                dxv = ld(dX_ref, i, d)
                ddv = ld(ddX_s, i, d)
                amin = ftb(ld(lbx_ref, i, d) + dxv, ddv, amin)
                amin = ftb(ld(ubx_ref, i, d) - dxv, -ddv, amin)
            for r in range(n_h):
                wh = ld(h0_ref, i, r)
                dwh = const(0.0)
                for d in range(nx):
                    wh = wh + ld(Jh_ref, i, r * nx + d) * ld(dX_ref, i, d)
                    dwh = dwh + ld(Jh_ref, i, r * nx + d) * ld(ddX_s, i, d)
                amin = ftb(wh, dwh, amin)
            return amin

        def alpha_u(i, amin):
            for a in range(nu):
                duv = ld(dU_ref, i, a)
                ddv = ld(ddU_s, i, a)
                amin = ftb(ld(lbu_ref, i, a) + duv, ddv, amin)
                amin = ftb(ld(ubu_ref, i, a) - duv, -ddv, amin)
            return amin

        amin = jax.lax.fori_loop(0, N + 1, alpha_x, const(_INF))
        amin = jax.lax.fori_loop(0, N, alpha_u, amin)
        alpha = jnp.minimum(f32(1.0), amin)

        # ---- update + step norm -------------------------------------------
        def update(i, mx):
            for d in range(nx):
                s = alpha * ld(ddX_s, i, d)
                st(dX_ref, i, d, ld(dX_ref, i, d) + s)
                mx = jnp.maximum(mx, jnp.abs(s))
            return mx

        def update_u(i, mx):
            for a in range(nu):
                s = alpha * ld(ddU_s, i, a)
                st(dU_ref, i, a, ld(dU_ref, i, a) + s)
                mx = jnp.maximum(mx, jnp.abs(s))
            return mx

        mx = jax.lax.fori_loop(0, N + 1, update, const(0.0))
        mx = jax.lax.fori_loop(0, N, update_u, mx)
        st1(kkt_ref, 0, mx)
        return 0

    # initial iterate: δX = 0 except δx₀ = dx0, δU = 0
    for d in range(nx):
        st(dX_ref, 0, d, ld1(dx0_ref, d))

    def zero_x(i, _):
        for d in range(nx):
            st(dX_ref, i + 1, d, const(0.0))
        return 0

    def zero_u(i, _):
        for a in range(nu):
            st(dU_ref, i, a, const(0.0))
        return 0

    jax.lax.fori_loop(0, N, zero_x, 0)
    jax.lax.fori_loop(0, N, zero_u, 0)

    jax.lax.fori_loop(0, num_iters, newton_iter, 0)

    # ---- condensing roll: exact linear-dynamics propagation of δU ---------
    def roll(i, carry):
        dx = list(carry)
        Am = load_mat(A_ref, i, nx, nx)
        Bm = load_mat(B_ref, i, nx, nu)
        nxt = [
            sum(Am[d][e] * dx[e] for e in range(nx))
            + sum(Bm[d][a] * ld(dU_ref, i, a) for a in range(nu))
            + ld(c_ref, i, d)
            for d in range(nx)
        ]
        for d in range(nx):
            st(dX_ref, i + 1, d, nxt[d])
        return tuple(nxt)

    jax.lax.fori_loop(
        0, N, roll, tuple(ld1(dx0_ref, d) for d in range(nx))
    )


def _mu_schedule(num_iters, mu0, kappa):
    f = jnp.float32
    return (f(mu0) * (f(kappa) ** jnp.arange(num_iters, dtype=jnp.float32))).astype(
        jnp.float32
    )


def _misc(delta, stiffness, h_stiffness, h_slope):
    f = jnp.float32
    if stiffness is None:
        stiffness = 1.0 / (delta * delta)
    if h_stiffness is None:
        h_stiffness = stiffness
    return jnp.stack(
        [
            jnp.asarray(delta, f),
            jnp.asarray(stiffness, f),
            jnp.asarray(h_stiffness, f),
            jnp.asarray(h_slope, f),
            jnp.asarray(1e-9, f),  # Luu regularization (barrier_qp_solve)
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "interpret"),
)
def pallas_barrier_qp_solve(
    qp,  # solvers.qp.BoxedQPData
    dx0: jnp.ndarray,
    num_iters: int = 12,
    mu0: float = 1.0e-1,
    kappa: float = 0.35,
    delta: float = 1.0e-3,
    stiffness: Optional[float] = None,
    h_stiffness: Optional[float] = None,
    h_slope: float = 0.0,
    *,
    interpret: bool = False,
):
    """Drop-in fused-kernel replacement for ``barrier_qp_solve`` (always
    returns the KKT step norm): (δX (N+1,nx), δU (N,nu), kkt ())."""
    N, nx = qp.A.shape[0], qp.A.shape[1]
    nu = qp.B.shape[2]
    n_h = qp.Jh.shape[1] if qp.Jh is not None else 0
    has_S = qp.S is not None

    f = jnp.float32
    mus = _mu_schedule(num_iters, mu0, kappa)
    misc = _misc(delta, stiffness, h_stiffness, h_slope)

    def flat(a, rows):
        return a.astype(f).reshape(rows, -1)

    Jh = (
        flat(qp.Jh, N + 1)
        if qp.Jh is not None
        else jnp.zeros((1, 1), f)
    )
    h0 = qp.h0.astype(f) if qp.h0 is not None else jnp.zeros((1, 1), f)
    S = flat(qp.S, N) if has_S else jnp.zeros((1, 1), f)

    kernel = functools.partial(
        _qp_kernel,
        N=N,
        nx=nx,
        nu=nu,
        n_h=n_h,
        num_iters=num_iters,
        has_S=has_S,
        batched=False,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    dX, dU, kkt = pl.pallas_call(
        kernel,
        in_specs=[smem() for _ in range(17)],
        out_specs=(smem(), smem(), smem()),
        out_shape=(
            jax.ShapeDtypeStruct((N + 1, nx), f),
            jax.ShapeDtypeStruct((N, nu), f),
            jax.ShapeDtypeStruct((1,), f),
        ),
        scratch_shapes=[
            pltpu.SMEM((N, nu * nx), f),
            pltpu.SMEM((N, nu), f),
            pltpu.SMEM((N + 1, nx), f),
            pltpu.SMEM((N, nu), f),
            pltpu.SMEM((N, nx), f),
        ],
        interpret=interpret,
    )(
        mus,
        misc,
        flat(qp.A, N),
        flat(qp.B, N),
        qp.c.astype(f),
        flat(qp.Q, N + 1),
        qp.qx_base.astype(f),
        flat(qp.R, N),
        qp.ru_base.astype(f),
        qp.lbx.astype(f),
        qp.ubx.astype(f),
        qp.lbu.astype(f),
        qp.ubu.astype(f),
        Jh,
        h0,
        S,
        dx0.astype(f),
    )
    return dX, dU, kkt[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "interpret"),
)
def pallas_batched_barrier_qp_solve(
    qp,  # BoxedQPData with a leading fleet dim B on every present leaf
    dx0: jnp.ndarray,  # (B, nx)
    num_iters: int = 12,
    mu0: float = 1.0e-1,
    kappa: float = 0.35,
    delta: float = 1.0e-3,
    stiffness: Optional[float] = None,
    h_stiffness: Optional[float] = None,
    h_slope: float = 0.0,
    *,
    interpret: bool = False,
):
    """Lane-batched fleet QP solve: B independent problems, the fleet
    dimension on the 128 VPU lanes — one launch per 128 members (grid
    beyond). Returns (δX (B,N+1,nx), δU (B,N,nu), kkt (B,)); per-member
    results match ``pallas_barrier_qp_solve`` on that member's problem."""
    Bf = dx0.shape[0]
    N, nx = qp.A.shape[1], qp.A.shape[2]
    nu = qp.B.shape[3]
    n_h = qp.Jh.shape[2] if qp.Jh is not None else 0
    has_S = qp.S is not None

    f = jnp.float32
    mus = _mu_schedule(num_iters, mu0, kappa)
    misc = _misc(delta, stiffness, h_stiffness, h_slope)

    # On hardware the lane block is the 128-wide VPU lane dim; the
    # interpreter has no lane constraint, so size the block to the actual
    # fleet and skip the up-to-43× padded arithmetic a 128-lane block would
    # cost a small CPU fleet (review finding). min() keeps >128 fleets on
    # the same grid-spill path the hardware kernel takes.
    lanes = _LANES if not interpret else min(Bf, _LANES)
    grid = -(-Bf // lanes)
    Bp = grid * lanes

    def prep(a, rows):
        """(B, rows, ...) → (rows, row·col, Bp): batch to the lane dim,
        padding lanes by replicating the last member (well-conditioned
        padding — those lanes solve a real problem and are discarded)."""
        a = a.astype(f).reshape(Bf, rows, -1)
        if Bp != Bf:
            pad = jnp.broadcast_to(a[-1:], (Bp - Bf,) + a.shape[1:])
            a = jnp.concatenate([a, pad], axis=0)
        return jnp.transpose(a, (1, 2, 0))

    Jh = prep(qp.Jh, N + 1) if qp.Jh is not None else jnp.zeros((1, 1, Bp), f)
    h0 = prep(qp.h0, N + 1) if qp.h0 is not None else jnp.zeros((1, 1, Bp), f)
    S = prep(qp.S, N) if has_S else jnp.zeros((1, 1, Bp), f)
    dx0_t = prep(dx0, 1)[0]  # (nx, Bp)

    kernel = functools.partial(
        _qp_kernel,
        N=N,
        nx=nx,
        nu=nu,
        n_h=n_h,
        num_iters=num_iters,
        has_S=has_S,
        batched=True,
    )

    def smem_spec(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.SMEM)

    def lane_spec(shape):
        # full stage/row dims, one lane block of the fleet dim per cell
        block = shape[:-1] + (lanes,)
        nlead = len(shape) - 1
        return pl.BlockSpec(block, lambda g: (0,) * nlead + (g,))

    inputs = [
        mus,
        misc,
        prep(qp.A, N),
        prep(qp.B, N),
        prep(qp.c, N),
        prep(qp.Q, N + 1),
        prep(qp.qx_base, N + 1),
        prep(qp.R, N),
        prep(qp.ru_base, N),
        prep(qp.lbx, N + 1),
        prep(qp.ubx, N + 1),
        prep(qp.lbu, N),
        prep(qp.ubu, N),
        Jh,
        h0,
        S,
        dx0_t,
    ]
    in_specs = [smem_spec(mus.shape), smem_spec(misc.shape)] + [
        lane_spec(a.shape) for a in inputs[2:]
    ]
    dX, dU, kkt = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(
            lane_spec((N + 1, nx, Bp)),
            lane_spec((N, nu, Bp)),
            lane_spec((1, Bp)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N + 1, nx, Bp), f),
            jax.ShapeDtypeStruct((N, nu, Bp), f),
            jax.ShapeDtypeStruct((1, Bp), f),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, nu * nx, lanes), f),
            pltpu.VMEM((N, nu, lanes), f),
            pltpu.VMEM((N + 1, nx, lanes), f),
            pltpu.VMEM((N, nu, lanes), f),
            pltpu.VMEM((N, nx, lanes), f),
        ],
        interpret=interpret,
    )(*inputs)
    return (
        jnp.transpose(dX, (2, 0, 1))[:Bf],
        jnp.transpose(dU, (2, 0, 1))[:Bf],
        kkt[0, :Bf],
    )


@functools.lru_cache(maxsize=None)
def make_vmappable_pallas_qp(
    num_iters: int,
    mu0: float,
    kappa: float,
    h_stiffness: Optional[float],
    h_slope: float,
    interpret: bool,
    backward: str = "ift",
    delta: float = 1.0e-3,
):
    """The fused QP solve as a ``custom_vmap``- and ``custom_vjp``-wrapped
    callable.

    Unbatched calls run the per-problem scalar-core kernel; under ``vmap``
    (NMPCSolver.batched_solve fleets) the batch rule dispatches the
    lane-batched kernel instead — the fleet dimension becomes VPU lanes in
    ONE launch rather than B sequential launches or a fall-back to the XLA
    Riccati path.

    Differentiation: a Pallas kernel has no autodiff rule; two backward
    modes are provided (round-2 verdict #7):

    * ``backward="ift"`` (default) — implicit-function-theorem VJP at the
      solution (solvers.qp.ift_qp_vjp): ONE extra Riccati factorized solve
      against the barrier-augmented Hessians plus two objective-gradient
      VJPs, instead of reverse-mode through the whole unrolled forward.
      Exact for a converged solve; the kkt output gets zero cotangent (it
      is a convergence certificate, not a differentiable quantity).
    * ``backward="recompute"`` — re-runs the XLA ``barrier_qp_solve`` (the
      same algorithm, parity-tested in tests/test_riccati_qp.py) and pulls
      the cotangent through that graph: the exact gradient of the
      *algorithm*, at ~num_iters× the backward cost.

    Forward stays at kernel speed either way. Cached per static config so
    repeated traces share the wrapper."""
    kw = dict(
        num_iters=num_iters,
        mu0=mu0,
        kappa=kappa,
        h_stiffness=h_stiffness,
        h_slope=h_slope,
        delta=delta,
    )

    @custom_vmap
    def _primal(qp, dx0):
        return pallas_barrier_qp_solve(qp, dx0, interpret=interpret, **kw)

    @_primal.def_vmap
    def _batched_rule(axis_size, in_batched, qp, dx0):
        qp_flags, dx0_flag = in_batched

        def bcast(leaf, flag):
            return leaf if flag else jnp.broadcast_to(leaf, (axis_size,) + leaf.shape)

        qp_b = jax.tree.map(bcast, qp, qp_flags)
        dx0_b = bcast(dx0, dx0_flag)
        out = pallas_batched_barrier_qp_solve(qp_b, dx0_b, interpret=interpret, **kw)
        return out, (True, True, True)

    @jax.custom_vjp
    def solve(qp, dx0):
        return _primal(qp, dx0)

    if backward == "ift":

        def _fwd(qp, dx0):
            out = _primal(qp, dx0)
            # residuals: inputs + the solution itself (IFT differentiates
            # the stationarity condition AT the solution — no recompute)
            return out, (qp, dx0, out[0], out[1])

        def _bwd(res, ct):
            qp, dx0, dX, dU = res
            ct_X, ct_U, _ct_kkt = ct  # kkt: certificate only, no gradient
            from ...solvers.qp import ift_qp_vjp  # local: avoid import cycle

            return ift_qp_vjp(
                qp, dx0, dX, dU, ct_X, ct_U,
                num_iters=num_iters, mu0=mu0, kappa=kappa,
                h_stiffness=h_stiffness, h_slope=h_slope,
            )

    else:  # "recompute"

        def _fwd(qp, dx0):
            return _primal(qp, dx0), (qp, dx0)

        def _bwd(res, ct):
            qp, dx0 = res
            from ...solvers.qp import barrier_qp_solve  # avoid import cycle

            def xla_solve(qp_, dx0_):
                return barrier_qp_solve(qp_, dx0_, return_kkt=True, **kw)

            _, vjp = jax.vjp(xla_solve, qp, dx0)
            # kernel outputs are f32 regardless of qp dtype — align cotangents
            ct = tuple(c.astype(qp.A.dtype) for c in ct)
            return vjp(ct)

    solve.defvjp(_fwd, _bwd)
    return solve


__all__ = [
    "pallas_barrier_qp_solve",
    "pallas_batched_barrier_qp_solve",
    "make_vmappable_pallas_qp",
]
