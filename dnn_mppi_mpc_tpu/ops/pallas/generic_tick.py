"""Fully-fused MPPI control tick for *arbitrary* dynamics (any nx, nu).

The hand-specialized kernels (mppi_tick.py — diff-drive, bicycle_tick.py —
race car) fuse one model family each. This module generalizes the same
single-program tick — on-chip ε ~ N(0, Σ), K-wide rollout + cost, softmax,
weighted-noise reduce — over a *user-supplied dynamics callable*, so every
model family (four-wheel torque, dynamic bicycle with tire slip, learned
residuals, custom user models) gets the single-launch fast path instead of
falling back to the XLA scan engine.

Dynamics enter the kernel as a **tile step**: a Python callable

    step_tile(xs: tuple[nx arrays], vs: tuple[nu arrays]) -> tuple[nx arrays]

operating elementwise on ``(R_BLK, 128)`` sample tiles — one array per state
/ control dimension, dt and model parameters baked in as Python constants by
the factory (see models/tile.py for the built-in families and
``lift_dynamics`` for adapting any ``(..., nx)``-style discrete step). The
callable is traced *into* the kernel, so its ops run on the VPU inside the
fused T-loop exactly like the hand-written kernels' dynamics.

Cost semantics are the engine's ``make_tracking_costs`` (solvers/mppi.py),
i.e. the reference structure shared by every controller script
(mppi_differential_drive.py:222-249, mppi_race_car_obstacle.py:147-159):

  * nearest-waypoint window lookup over (x, y) = dims (0, 1), first-argmin
    tie rule, refs taken for the first ``n_track`` state dims;
  * optional wrap-yaw on dim 2 (yaw mapped to [0, 2π) before differencing —
    the race car's rule; the reference path yaw is NOT wrapped);
  * γ·uᵀΣ⁻¹v energy term, exploration split, in-rollout clamp;
  * obstacles: hard robot-circle ×1e7 (mppi_differential_drive_obs.py:301-313)
    or soft exponential (test/test_mppi_diff_obs.py:59-64), optionally
    drifting at per-obstacle velocities during the rollout;
  * SUM or LAST accumulation (the reference overwrite quirk).

Polygon (9-point vehicle outline) collision stays in the specialized bicycle
kernel — it is race-car-specific geometry.

Noise modes as in mppi_tick.py: ``gen_noise=True`` (on-chip PRNG, TPU-only)
or injected ε (bit-identical compute path; CPU interpret-mode parity tests —
tests/test_generic_tick.py). Coloring uses the full lower-triangular
Cholesky factor of Σ for any nu. Single-device by construction (global
softmax over K), same as the other fused ticks.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mppi_tick import (
    effective_robot_radius,
    _TWO_PI,
    LANES,
    fused_epilogue_block,
    pack_obstacles as _pack_obstacles,
    pick_r_blk,
    standard_normal_pair,
)

TileStep = Callable[[Sequence[jnp.ndarray], Sequence[jnp.ndarray]], Sequence[jnp.ndarray]]


def _tick_kernel(
    seed_ref,  # SMEM (1,) int32 PRNG seed (unused when gen_noise=False)
    scal_ref,  # SMEM (n_scal,) packed f32 scalars (layout in _pack_scalars)
    u_ref,  # VMEM (T, nu) nominal controls
    a_ref,  # VMEM (T, nu) γ·u_tᵀΣ⁻¹ rows (energy-term coefficients)
    win_ref,  # SMEM (W, n_track) waypoint window (dynamic reads at W>32)
    obs_ref,  # VMEM (n_obs, 5) obstacles (x, y, r, vx, vy)
    *rest,  # [eps inputs ×nu] | outputs | [eps scratch ×nu]
    step_tile: TileStep,
    nx: int,
    nu: int,
    n_track: int,
    T: int,
    W: int,
    R: int,
    R_BLK: int,
    n_obs: int,
    wrap_yaw: bool,
    last_only: bool,
    gen_noise: bool,
    emit_eps: bool,
    gaussian: str,
    obs_mode: str,  # "circle" | "soft"
    moving_obs: bool,
    rollout_only: bool = False,  # S only — the sharded rollout_fn path
    fuse_epilogue: bool = False,  # filter matmul + update + hold + shift
    step_takes_t: bool = False,  # step_tile is F(xs, vs, t) — time-varying
    rollout_carry: bool = False,  # per-sample monotone waypoint-window carry
    carry_W: int = 0,  # per-step search span in carry mode
):
    rest = list(rest)
    if fuse_epilogue:
        ft_ref = rest.pop(0)  # VMEM (T, T) transposed filter matrix Fᵀ
        urows_ref = rest.pop(0)  # VMEM (nu, T) nominal controls, row layout
    if not gen_noise:
        eps = [rest.pop(0) for _ in range(nu)]  # (T, R, 128) inputs
    S_ref = rest.pop(0)
    if not rollout_only:
        w_ref, weps_ref = rest.pop(0), rest.pop(0)
    if rollout_carry:
        wpadv_ref = rest.pop(0)  # SMEM (1,) int32: max carried advance
    if fuse_epilogue:
        unew_ref, ushift_ref = rest.pop(0), rest.pop(0)  # (nu, T) each
        ok_ref = rest.pop(0)  # SMEM (1,) f32 finite flag
    if emit_eps:
        eps_out = [rest.pop(0) for _ in range(nu)]
    if gen_noise:
        eps = [rest.pop(0) for _ in range(nu)]  # (T, R, 128) scratch

    # Scalar layout (must match _pack_scalars)
    dt = scal_ref[0]
    n_exploit = scal_ref[1]
    inv_temp = scal_ref[2]
    obs_pen_radius = scal_ref[3]
    soft_dist, soft_w = scal_ref[4], scal_ref[5]
    k_offset = scal_ref[6]
    o = 7
    umin = [scal_ref[o + j] for j in range(nu)]
    o += nu
    umax = [scal_ref[o + j] for j in range(nu)]
    o += nu
    sw = [scal_ref[o + i] for i in range(n_track)]
    o += n_track
    tw = [scal_ref[o + i] for i in range(n_track)]
    o += n_track
    x0 = [scal_ref[o + i] for i in range(nx)]
    o += nx
    chol = []  # lower-tri rows: chol[j][i] = L[j, i], i <= j
    for j in range(nu):
        chol.append([scal_ref[o + i] for i in range(j + 1)])
        o += j + 1

    if gen_noise:
        # On-chip ε ~ N(0, Σ): ceil(nu/2) bulk PRNG pair-draws of standard
        # normals, then coloring by the lower-triangular Cholesky factor.
        pltpu.prng_seed(seed_ref[0])
        z = []
        for _ in range((nu + 1) // 2):
            z0, z1 = standard_normal_pair((T, R, LANES), gaussian)
            z.extend([z0, z1])
        for j in range(nu):
            acc = chol[j][0] * z[0]
            for i in range(1, j + 1):
                acc = acc + chol[j][i] * z[i]
            eps[j][:, :, :] = acc
            if emit_eps:
                eps_out[j][:, :, :] = eps[j][:, :, :]

    # Hoist small-window waypoint / obstacle scalars out of the T loop
    # (scalar reads inside the loop cost thousands of scalar loads —
    # docs/PERF.md). Large windows (> _UNROLL_W) instead run a stride-1
    # fori_loop reading win_ref in-body with *traced* indices — which is why
    # the window lives in SMEM (Mosaic requires SMEM for dynamic scalar
    # reads; the bicycle_tick.py pattern, hardware-measured at W=200). Full
    # unroll at W≈200 × T would explode compile time.
    _UNROLL_W = 32
    win = (
        [tuple(win_ref[w, i] for i in range(n_track)) for w in range(W)]
        if W <= _UNROLL_W
        else None
    )
    obs = [
        (obs_ref[q, 0], obs_ref[q, 1], obs_ref[q, 2], obs_ref[q, 3], obs_ref[q, 4])
        for q in range(n_obs)
    ]
    shape = (R_BLK, LANES)

    assert R % R_BLK == 0
    for blk in range(R // R_BLK):
        r0 = blk * R_BLK
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        k_idx = ((r0 + rows) * LANES + cols).astype(jnp.float32) + k_offset
        exploit = k_idx < n_exploit

        # Laneful zero (see bicycle_tick.py / ops/pallas/rollout.py): Mosaic
        # fori_loop carries must not start lane-replicated — a jnp.full /
        # jnp.zeros splat init triggers "Invalid relayout: … replicated in
        # destination but not in source" once carried state feeds multiplies
        # of other carried state. Derive the zero from runtime data instead.
        zero_l = jnp.minimum(jnp.abs(eps[0][0, r0 : r0 + R_BLK]), 0.0)

        def window_refs(xc, yc, zero_l=zero_l):
            """Running-min nearest-waypoint lookup (first-argmin tie rule),
            returning the reference tuple for all n_track dims."""
            if win is not None:  # unrolled, hoisted scalars
                w0 = win[0]
                dmin = (xc - w0[0]) * (xc - w0[0]) + (yc - w0[1]) * (yc - w0[1])
                refs = [zero_l + w0[i] for i in range(n_track)]
                for w in range(1, W):
                    ww = win[w]
                    d = (xc - ww[0]) * (xc - ww[0]) + (yc - ww[1]) * (yc - ww[1])
                    better = d < dmin
                    dmin = jnp.where(better, d, dmin)
                    refs = [
                        jnp.where(better, ww[i], refs[i]) for i in range(n_track)
                    ]
                return refs

            wx0, wy0 = win_ref[0, 0], win_ref[0, 1]
            d0 = (xc - wx0) * (xc - wx0) + (yc - wy0) * (yc - wy0)
            init = (d0,) + tuple(zero_l + win_ref[0, i] for i in range(n_track))

            def wbody(w, carry):
                dmin, refs = carry[0], list(carry[1:])
                wx, wy = win_ref[w, 0], win_ref[w, 1]
                d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
                better = d < dmin
                return (jnp.where(better, d, dmin),) + tuple(
                    jnp.where(better, win_ref[w, i], refs[i])
                    for i in range(n_track)
                )

            out = jax.lax.fori_loop(1, W, wbody, init)
            return list(out[1:])

        def window_refs_carried(xc, yc, idx, zero_l=zero_l):
            """Per-sample monotone window lookup (waypoint_carry="rollout"):
            masked running-min over [idx, idx+carry_W) — see
            ops/pallas/mppi_tick.py::window_refs_carried for the contract."""
            big = jnp.float32(1.0e30)
            dmin = zero_l + big
            refs = [zero_l for _ in range(n_track)]
            idx_new = idx
            if win is not None:  # unrolled, hoisted scalars
                for w_i in range(W):
                    ww = win[w_i]
                    d = (xc - ww[0]) * (xc - ww[0]) + (yc - ww[1]) * (yc - ww[1])
                    valid = (idx <= w_i) & (idx > jnp.int32(w_i - carry_W))
                    better = valid & (d < dmin)
                    dmin = jnp.where(better, d, dmin)
                    idx_new = jnp.where(better, jnp.int32(w_i), idx_new)
                    refs = [
                        jnp.where(better, ww[i], refs[i]) for i in range(n_track)
                    ]
                return refs, idx_new

            def wbody(w, carry):
                dmin, idx_new = carry[0], carry[1]
                refs = list(carry[2:])
                wx, wy = win_ref[w, 0], win_ref[w, 1]
                d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
                valid = (idx <= w) & (idx > w - carry_W)
                better = valid & (d < dmin)
                return (
                    jnp.where(better, d, dmin),
                    jnp.where(better, w, idx_new),
                ) + tuple(
                    jnp.where(better, win_ref[w, i], refs[i])
                    for i in range(n_track)
                )

            init = (dmin, idx_new) + tuple(refs)
            out = jax.lax.fori_loop(0, W, wbody, init)
            return list(out[2:]), out[1]

        def tracking_carried(xs, weights, idx, zero_l=zero_l):
            refs, idx_new = window_refs_carried(xs[0], xs[1], idx)
            c = zero_l
            for i in range(n_track):
                xi = xs[i]
                if wrap_yaw and i == 2:
                    xi = xi - jnp.float32(_TWO_PI) * jnp.floor(
                        xi * jnp.float32(1.0 / _TWO_PI)
                    )
                c = c + weights[i] * (xi - refs[i]) * (xi - refs[i])
            return c, idx_new

        def tracking(xs, weights, zero_l=zero_l):
            refs = window_refs(xs[0], xs[1])
            c = zero_l
            for i in range(n_track):
                xi = xs[i]
                if wrap_yaw and i == 2:
                    # yaw → [0, 2π) before differencing; ref NOT wrapped
                    # (mppi_race_car_obstacle.py:151, make_tracking_costs).
                    xi = xi - jnp.float32(_TWO_PI) * jnp.floor(
                        xi * jnp.float32(1.0 / _TWO_PI)
                    )
                c = c + weights[i] * (xi - refs[i]) * (xi - refs[i])
            return c

        def obstacle_penalty(xc, yc, t_f=None, zero_l=zero_l):
            """t_f=None → initial obstacle positions (the terminal-cost rule)."""
            pen = zero_l
            for ox, oy, orad, ovx, ovy in obs:
                if moving_obs and t_f is not None:
                    ox = ox + ovx * t_f
                    oy = oy + ovy * t_f
                dxo = xc - ox
                dyo = yc - oy
                d2 = dxo * dxo + dyo * dyo
                if obs_mode == "circle":
                    rr = orad + obs_pen_radius
                    pen = jnp.where(d2 < rr * rr, jnp.float32(1.0), pen)
                else:  # soft exponential
                    d = jnp.sqrt(d2 + jnp.float32(1e-12))
                    pen = pen + jnp.where(
                        d < soft_dist, jnp.exp(soft_dist - d), jnp.float32(0.0)
                    )
            if obs_mode == "circle":
                return pen * jnp.float32(1.0e7)
            return pen * soft_w

        def body(t, carry, exploit=exploit, r0=r0):
            xs = list(carry[:nx])
            S = carry[nx]
            vs = []
            energy = None
            for j in range(nu):
                e = eps[j][t, r0 : r0 + R_BLK]
                v = jnp.where(exploit, u_ref[t, j] + e, e)
                v = jnp.clip(v, umin[j], umax[j])
                vs.append(v)
                term = a_ref[t, j] * v
                energy = term if energy is None else energy + term
            if step_takes_t:
                # time-varying tile dynamics F(x, u, t): t is the int32 step
                # index (the pytorch_mppi convention, test_mppi_diff_obs.py:28-42)
                xs = list(step_tile(tuple(xs), tuple(vs), t))
            else:
                xs = list(step_tile(tuple(xs), tuple(vs)))
            assert len(xs) == nx, (
                f"step_tile returned {len(xs)} state dims, expected {nx}"
            )
            if rollout_carry:
                idx = carry[nx + 1]
                c, idx = tracking_carried(xs, sw, idx)
                c = c + energy
            else:
                c = tracking(xs, sw) + energy
            if n_obs > 0:
                c = c + obstacle_penalty(xs[0], xs[1], t.astype(jnp.float32) * dt)
            if last_only:
                S = c  # reference overwrite quirk (mppi_differential_drive.py:124)
            else:
                S = S + c
            if rollout_carry:
                return tuple(xs) + (S, idx)
            return tuple(xs) + (S,)

        init = tuple(zero_l + x0[i] for i in range(nx)) + (zero_l,)
        if rollout_carry:
            init = init + (zero_l.astype(jnp.int32),)
        carry = jax.lax.fori_loop(0, T, body, init)
        xs, S = list(carry[:nx]), carry[nx]

        if rollout_carry:
            idx = carry[nx + 1]
            blk_max = jnp.max(idx)
            if blk == 0:
                wpadv_ref[0] = blk_max
            else:
                wpadv_ref[0] = jnp.maximum(wpadv_ref[0], blk_max)
            c_term, _ = tracking_carried(xs, tw, idx)
            S = S + c_term
        else:
            S = S + tracking(xs, tw)
        if n_obs > 0:
            S = S + obstacle_penalty(xs[0], xs[1])
        S_ref[r0 : r0 + R_BLK, :] = S

    if rollout_only:
        # Sharded execution: softmax normalization and the weighted-noise
        # reduce are *global* over K, so they happen outside the kernel via
        # pmin/psum collectives (solvers/mppi.py::mppi_step).
        return

    # Softmax with ρ = min S (mppi_differential_drive.py:167-180).
    S = S_ref[:, :]
    rho = jnp.min(S)
    m = jnp.exp(-inv_temp * (S - rho))
    eta = jnp.sum(m)
    w = m / eta
    w_ref[:, :] = w

    # Weighted-noise reduction Σₖ wₖ εₖ over the *unclamped* ε (…:132-135).
    wb = w[None, :, :]
    for j in range(nu):
        weps_ref[j, :] = jnp.sum(jnp.sum(eps[j][:, :, :] * wb, axis=2), axis=1)

    if fuse_epilogue:
        fused_epilogue_block(
            weps_ref, ft_ref, urows_ref, unew_ref, ushift_ref, ok_ref, T
        )


def _pack_scalars(
    dt, n_exploit, inv_temperature, robot_radius, soft_dist, soft_w,
    u_min, u_max, stage_w, term_w, x0, chol_sigma, nu, n_track, nx,
    obstacles_on, k_offset=0.0,
):
    tri = [chol_sigma[j, i] for j in range(nu) for i in range(j + 1)]
    return jnp.concatenate(
        [
            jnp.asarray([dt], jnp.float32),
            jnp.asarray([n_exploit], jnp.float32),
            jnp.reshape(jnp.asarray(inv_temperature, jnp.float32), (1,)),
            jnp.asarray([robot_radius if obstacles_on else -1.0], jnp.float32),
            jnp.asarray([soft_dist, soft_w], jnp.float32),
            jnp.reshape(jnp.asarray(k_offset, jnp.float32), (1,)),
            u_min.astype(jnp.float32)[:nu],
            u_max.astype(jnp.float32)[:nu],
            stage_w.astype(jnp.float32)[:n_track],
            term_w.astype(jnp.float32)[:n_track],
            x0.astype(jnp.float32)[:nx],
            jnp.stack([jnp.asarray(t, jnp.float32) for t in tri]),
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_tile",
        "nx",
        "nu",
        "n_track",
        "K",
        "T",
        "W",
        "wrap_yaw",
        "last_only",
        "emit_eps",
        "interpret",
        "gaussian",
        "collision",
        "fuse_epilogue",
        "step_takes_t",
        "rollout_carry",
        "carry_W",
    ),
)
def generic_mppi_tick(
    seed: jnp.ndarray,  # () int32 — ignored when eps is given
    u: jnp.ndarray,  # (T, nu) nominal sequence
    a: jnp.ndarray,  # (T, nu) γ·u_tᵀΣ⁻¹
    chol_sigma: jnp.ndarray,  # (nu, nu) lower-triangular Cholesky factor of Σ
    x0: jnp.ndarray,  # (nx,)
    window: jnp.ndarray,  # (W, ≥n_track) waypoint window
    stage_w: jnp.ndarray,  # (n_track,)
    term_w: jnp.ndarray,  # (n_track,)
    u_min: jnp.ndarray,  # (nu,)
    u_max: jnp.ndarray,  # (nu,)
    dt: float,
    n_exploit: float,
    inv_temperature: jnp.ndarray,
    obstacles: Optional[jnp.ndarray] = None,  # (n_obs, 2|3)
    robot_radius: float = 0.5,  # PHYSICAL radius; margin applied in-wrapper
    safety_margin_rate: float = 1.5,
    eps: Optional[jnp.ndarray] = None,  # (K, T, nu) injected ε (parity mode)
    obstacle_velocities: Optional[jnp.ndarray] = None,  # (n_obs, 2)
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    filter_t: Optional[jnp.ndarray] = None,  # (T, T) Fᵀ — fused-epilogue mode
    *,
    step_tile: TileStep,
    nx: int,
    nu: int,
    n_track: int,
    K: int,
    T: int,
    W: int,
    wrap_yaw: bool = False,
    last_only: bool = False,
    emit_eps: bool = False,
    interpret: bool = False,
    gaussian: str = "popcount",
    collision: str = "circle",
    fuse_epilogue: bool = False,
    step_takes_t: bool = False,
    rollout_carry: bool = False,
    carry_W: int = 0,
) -> Tuple[jnp.ndarray, ...]:
    """One fused MPPI tick for arbitrary tile dynamics. Returns
    ``(S (K,), w (K,), w_eps (T, nu))`` — plus ``eps (K, T, nu)`` when
    ``emit_eps`` — with K on a single (K/128, 128) block.

    See the module docstring for semantics; ``step_tile`` must be a *stable*
    callable (construct once, reuse — it is a static jit argument).
    """
    assert gaussian in ("popcount", "box_muller"), gaussian
    assert collision in ("circle", "soft"), collision
    assert K % LANES == 0, f"K={K} must be a multiple of {LANES}"
    assert n_track >= 2, "tracking needs at least (x, y) — n_track >= 2"
    assert window.shape[1] >= n_track, (
        f"window has {window.shape[1]} cols < n_track={n_track}"
    )
    R = K // LANES
    R_BLK = pick_r_blk(R)
    gen_noise = eps is None
    emit = bool(emit_eps and gen_noise)
    if fuse_epilogue and filter_t is None:
        raise ValueError("fuse_epilogue=True requires the (T, T) filter_t matrix")

    scal = _pack_scalars(
        dt,
        n_exploit,
        inv_temperature,
        effective_robot_radius(robot_radius, safety_margin_rate),
        soft_safety_distance,
        soft_weight,
        u_min,
        u_max,
        stage_w,
        term_w,
        x0,
        chol_sigma.astype(jnp.float32),
        nu,
        n_track,
        nx,
        obstacles is not None,
    )
    obs, n_obs = _pack_obstacles(obstacles, obstacle_velocities)

    kernel = functools.partial(
        _tick_kernel,
        step_tile=step_tile,
        nx=nx,
        nu=nu,
        n_track=n_track,
        T=T,
        W=W,
        R=R,
        R_BLK=R_BLK,
        n_obs=n_obs,
        wrap_yaw=wrap_yaw,
        last_only=last_only,
        gen_noise=gen_noise,
        emit_eps=emit,
        gaussian=gaussian,
        obs_mode=collision,
        moving_obs=obstacle_velocities is not None,
        fuse_epilogue=fuse_epilogue,
        step_takes_t=step_takes_t,
        rollout_carry=rollout_carry,
        carry_W=carry_W,
    )

    out_shape = [
        jax.ShapeDtypeStruct((R, LANES), jnp.float32),  # S
        jax.ShapeDtypeStruct((R, LANES), jnp.float32),  # w
        jax.ShapeDtypeStruct((nu, T), jnp.float32),  # w_eps (rows)
    ]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape]
    if rollout_carry:
        out_shape += [jax.ShapeDtypeStruct((1,), jnp.int32)]  # max carried idx
        out_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if fuse_epilogue:
        out_shape += [
            jax.ShapeDtypeStruct((nu, T), jnp.float32),  # u_new rows
            jax.ShapeDtypeStruct((nu, T), jnp.float32),  # u_shift rows
            jax.ShapeDtypeStruct((1,), jnp.float32),  # finite flag
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    if emit:
        out_shape += [
            jax.ShapeDtypeStruct((T, R, LANES), jnp.float32) for _ in range(nu)
        ]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(nu)]
    out_specs = tuple(out_specs)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        pl.BlockSpec(memory_space=pltpu.VMEM),  # u
        pl.BlockSpec(memory_space=pltpu.VMEM),  # a
        pl.BlockSpec(memory_space=pltpu.SMEM),  # window: dynamic scalar reads
        pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles
    ]
    args = [
        jnp.reshape(seed.astype(jnp.int32), (1,)),
        scal,
        u.astype(jnp.float32),
        a.astype(jnp.float32),
        window[:, :n_track].astype(jnp.float32),
        obs,
    ]
    if fuse_epilogue:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Fᵀ
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u rows
        ]
        args += [filter_t.astype(jnp.float32), u.astype(jnp.float32).T]
    scratch_shapes = []
    if gen_noise:
        scratch_shapes += [
            pltpu.VMEM((T, R, LANES), jnp.float32) for _ in range(nu)
        ]
    else:
        # (K, T, nu) → nu (T, R, 128) planes with k = r·128 + lane
        eps_t = jnp.transpose(
            eps.astype(jnp.float32).reshape(R, LANES, T, nu), (2, 3, 0, 1)
        )
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(nu)]
        args += [eps_t[:, j] for j in range(nu)]

    result = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)

    result = list(result)
    S = result.pop(0).reshape(K)
    w = result.pop(0).reshape(K)
    w_eps = result.pop(0).T  # (T, nu)
    wp_adv = result.pop(0)[0] if rollout_carry else None
    epi = None
    if fuse_epilogue:
        u_new = result.pop(0).T  # (T, nu)
        u_shift = result.pop(0).T
        finite = result.pop(0)[0]
        epi = (u_new, u_shift, finite)
    if emit:
        eps_out = jnp.stack(result[:nu], axis=1)  # (T, nu, R, L)
        eps_out = jnp.transpose(eps_out, (2, 3, 0, 1)).reshape(K, T, nu)
        if fuse_epilogue:
            if rollout_carry:
                return S, w, w_eps, epi, eps_out, wp_adv
            return S, w, w_eps, epi, eps_out
        if rollout_carry:
            return S, w, w_eps, eps_out, wp_adv
        return S, w, w_eps, eps_out
    if fuse_epilogue:
        if rollout_carry:
            return S, w, w_eps, epi, wp_adv
        return S, w, w_eps, epi
    if rollout_carry:
        return S, w, w_eps, wp_adv
    return S, w, w_eps


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_tile",
        "nx",
        "nu",
        "n_track",
        "T",
        "W",
        "wrap_yaw",
        "last_only",
        "interpret",
        "collision",
        "step_takes_t",
    ),
)
def generic_rollout_costs(
    eps: jnp.ndarray,  # (K_local, T, nu) injected ε (the sharded path samples
    #                    per shard via jax.random outside the kernel)
    u: jnp.ndarray,  # (T, nu)
    a: jnp.ndarray,  # (T, nu) γ·u_tᵀΣ⁻¹
    x0: jnp.ndarray,  # (nx,)
    window: jnp.ndarray,  # (W, ≥n_track)
    stage_w: jnp.ndarray,
    term_w: jnp.ndarray,
    u_min: jnp.ndarray,
    u_max: jnp.ndarray,
    dt: float,
    n_exploit: float,
    obstacles: Optional[jnp.ndarray] = None,
    robot_radius: float = 0.5,  # PHYSICAL radius; margin applied in-wrapper
    safety_margin_rate: float = 1.5,
    obstacle_velocities: Optional[jnp.ndarray] = None,
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    k_offset: jnp.ndarray | float = 0.0,
    *,
    step_tile: TileStep,
    nx: int,
    nu: int,
    n_track: int,
    T: int,
    W: int,
    wrap_yaw: bool = False,
    last_only: bool = False,
    interpret: bool = False,
    collision: str = "circle",
    step_takes_t: bool = False,
) -> jnp.ndarray:
    """Rollout + cost only (no softmax/weighted reduce): the sample-sharded
    counterpart of ``generic_mppi_tick``, bound as the engine's ``rollout_fn``
    (solvers/mppi.py::make_generic_pallas_rollout).

    ``k_offset`` is the global sample-index offset of this shard so the
    exploration split stays a property of the *global* K (SURVEY §2.10). The
    global reductions (ρ via pmin, η and w·ε via psum) happen outside via XLA
    collectives. Returns ``S (K_local,)``.
    """
    assert collision in ("circle", "soft"), collision
    K = eps.shape[0]
    assert K % LANES == 0, f"local K={K} must be a multiple of {LANES}"
    assert n_track >= 2, "tracking needs at least (x, y) — n_track >= 2"
    assert window.shape[1] >= n_track
    R = K // LANES
    R_BLK = pick_r_blk(R)

    scal = _pack_scalars(
        dt,
        n_exploit,
        0.0,  # inv_temperature unused in rollout-only mode
        effective_robot_radius(robot_radius, safety_margin_rate),
        soft_safety_distance,
        soft_weight,
        u_min,
        u_max,
        stage_w,
        term_w,
        x0,
        jnp.zeros((nu, nu), jnp.float32),  # chol unused (ε injected)
        nu,
        n_track,
        nx,
        obstacles is not None,
        k_offset=k_offset,
    )
    obs, n_obs = _pack_obstacles(obstacles, obstacle_velocities)

    kernel = functools.partial(
        _tick_kernel,
        step_tile=step_tile,
        nx=nx,
        nu=nu,
        n_track=n_track,
        T=T,
        W=W,
        R=R,
        R_BLK=R_BLK,
        n_obs=n_obs,
        wrap_yaw=wrap_yaw,
        last_only=last_only,
        gen_noise=False,
        emit_eps=False,
        gaussian="popcount",
        obs_mode=collision,
        moving_obs=obstacle_velocities is not None,
        rollout_only=True,
        step_takes_t=step_takes_t,
    )

    eps_t = jnp.transpose(
        eps.astype(jnp.float32).reshape(R, LANES, T, nu), (2, 3, 0, 1)
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        pl.BlockSpec(memory_space=pltpu.VMEM),  # u
        pl.BlockSpec(memory_space=pltpu.VMEM),  # a
        pl.BlockSpec(memory_space=pltpu.SMEM),  # window: dynamic scalar reads
        pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nu
    args = [
        jnp.zeros((1,), jnp.int32),  # seed unused
        scal,
        u.astype(jnp.float32),
        a.astype(jnp.float32),
        window[:, :n_track].astype(jnp.float32),
        obs,
    ] + [eps_t[:, j] for j in range(nu)]

    S = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        out_shape=(jax.ShapeDtypeStruct((R, LANES), jnp.float32),),
        interpret=interpret,
    )(*args)[0]
    return S.reshape(K)


__all__ = ["generic_mppi_tick", "generic_rollout_costs", "TileStep"]
