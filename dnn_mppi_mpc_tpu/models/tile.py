"""Tile-form discrete dynamics for the generic fused MPPI tick kernel.

A *tile step* operates elementwise on ``(R_BLK, 128)`` sample tiles — one
array per state/control dimension — so it can be traced into a Pallas kernel
without any layout changes:

    step(xs: tuple[nx arrays], vs: tuple[nu arrays]) -> tuple[nx arrays]

dt and model parameters are baked in as Python floats by each factory (they
are static per controller, exactly like the hand-specialized kernels in
ops/pallas/mppi_tick.py / bicycle_tick.py). Every factory here is the Euler
discretization of the matching continuous model in models/dynamics.py, so
``euler_step(f, x, u, dt)`` on the scan path and the tile step on the fused
path are the same function — parity is tested in tests/test_generic_tick.py.

``lift_dynamics`` adapts any ``(..., nx)``-indexed discrete step F(x, u) to
tile form automatically (stack on the minormost axis inside the kernel).
It is numerically identical everywhere; on TPU Mosaic it may insert layout
changes for the (tile, tile, nx) stack, so prefer a handwritten tile step
for the hot path.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp

from .dynamics import DynamicBicycleParams, FourWheelParams

Tiles = Tuple[jnp.ndarray, ...]
TileStep = Callable[[Sequence[jnp.ndarray], Sequence[jnp.ndarray]], Tiles]

# Odd minimax polynomial for atan on [-1, 1] (Abramowitz & Stegun 4.4.49,
# |err| ≤ 2e-8) — Mosaic has no atan lowering, so tile steps needing arctan
# (the dynamic bicycle's sideslip/tire-force terms) use this instead.
_ATAN_C = (
    0.9999993329,
    -0.3332985605,
    0.1994653599,
    -0.1390853351,
    0.0964200441,
    -0.0559098861,
    0.0218612288,
    -0.0040540580,
)


def atan_tile(x: jnp.ndarray) -> jnp.ndarray:
    """arctan as a Pallas-TPU-lowerable polynomial (|err| ≤ ~2e-8).

    Range-reduced to |t| ≤ 1 via atan(x) = sign(x)·π/2 − atan(1/x) for
    |x| > 1; the core is the A&S 4.4.49 odd minimax polynomial.
    """
    ax = jnp.abs(x)
    big = ax > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(ax, 1e-30), ax)
    t2 = t * t
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * t2 + jnp.float32(c)
    r = t * p
    r = jnp.where(big, jnp.float32(jnp.pi / 2) - r, r)
    return jnp.where(x < 0.0, -r, r)


def _sincos(yaw, sincos: str):
    """sin/cos pair for tile steps: "poly" (default — ~21% faster fused
    ticks, ops/pallas/mathx.py, |err| ≤ 9e-8) or "native" transcendentals."""
    if sincos == "poly":
        from ..ops.pallas.mathx import sincos_poly

        return sincos_poly(yaw)
    return jnp.sin(yaw), jnp.cos(yaw)


def unicycle_tile(dt: float, sincos: str = "poly") -> TileStep:
    """Euler diff-drive: state (x, y, yaw); control (v, ω).

    Matches euler_step(unicycle, ·, ·, dt) — the update of
    controllers/mppi_differential_drive.py:182-198.
    """
    dt = float(dt)

    def step(xs, vs):
        x, y, yaw = xs
        v, w = vs
        sin_y, cos_y = _sincos(yaw, sincos)
        return (
            x + v * cos_y * dt,
            y + v * sin_y * dt,
            yaw + w * dt,
        )

    return step


def kinematic_bicycle_tile(
    dt: float, wheel_base: float = 2.5, sincos: str = "poly"
) -> TileStep:
    """Euler kinematic bicycle: state (x, y, yaw, v); control (δ, a).

    Matches euler_step(kinematic_bicycle, ·, ·, dt) — the update of
    controllers/mppi_race_car_obstacle.py:200-214.
    """
    dt, inv_L = float(dt), 1.0 / float(wheel_base)

    def step(xs, vs):
        x, y, yaw, v = xs
        steer, accel = vs
        sin_y, cos_y = _sincos(yaw, sincos)
        if sincos == "poly":
            sin_s, cos_s = _sincos(steer, sincos)
            tan_s = sin_s / cos_s  # steer bounded inside (−π/2, π/2)
        else:
            tan_s = jnp.tan(steer)
        return (
            x + v * cos_y * dt,
            y + v * sin_y * dt,
            yaw + v * tan_s * inv_L * dt,
            v + accel * dt,
        )

    return step


def four_wheel_torque_tile(
    dt: float, params: Optional[FourWheelParams] = None, sincos: str = "poly"
) -> TileStep:
    """Euler four-wheel torque model: state (x, y, θ, v, ω); control
    (τ_fr, τ_fl, τ_rr, τ_rl).

    Matches euler_step(four_wheel_torque, ·, ·, dt) — the continuous model of
    controllers/mpc_differential_dynamics.py:98-105.
    """
    if params is None:
        params = FourWheelParams.default()
    dt = float(dt)
    r, m = float(params.wheel_radius), float(params.mass)
    L, inertia = float(params.wheel_sep), float(params.inertia)
    cv = r / (4.0 * m)
    cw = r / (L * inertia) * 0.5

    def step(xs, vs):
        x, y, theta, v, omega = xs
        t_fr, t_fl, t_rr, t_rl = vs
        sin_t, cos_t = _sincos(theta, sincos)
        return (
            x + v * cos_t * dt,
            y + v * sin_t * dt,
            theta + omega * dt,
            v + cv * (t_fr + t_fl + t_rr + t_rl) * dt,
            omega + cw * ((t_fr + t_rr) - (t_fl + t_rl)) * dt,
        )

    return step


def dynamic_bicycle_tile(
    dt: float, params: Optional[DynamicBicycleParams] = None
) -> TileStep:
    """Euler dynamic bicycle with tire slip: state (x, y, yaw, v);
    control (a, δ).

    Matches euler_step(dynamic_bicycle, ·, ·, dt) — the single-track model of
    controllers/mpc_racecar_class.py:34-44, including the vx≈0 epsilon guard.
    arctan is the A&S polynomial (atan_tile, |err| ≤ ~2e-8) because Mosaic
    has no atan lowering.
    """
    if params is None:
        params = DynamicBicycleParams.default()
    dt = float(dt)
    lf, lr = float(params.lf), float(params.lr)
    cf, cr = float(params.cornering_front), float(params.cornering_rear)
    inv_m = 1.0 / float(params.mass)
    beta_gain = lr / (lf + lr)

    def step(xs, vs):
        x, y, yaw, v = xs
        a, steer = vs
        beta = atan_tile(beta_gain * jnp.tan(steer))
        vx = v * jnp.cos(beta)
        vx_safe = jnp.where(jnp.abs(vx) < 1e-6, jnp.float32(1e-6), vx)
        fy = 2.0 * (
            cf * jnp.sin(atan_tile((v * jnp.sin(beta) + lf * yaw) / vx_safe))
            * jnp.cos(steer)
            + cr * jnp.sin(atan_tile((v * jnp.sin(beta) - lr * yaw) / vx_safe))
        )
        return (
            x + v * jnp.cos(yaw + beta) * dt,
            y + v * jnp.sin(yaw + beta) * dt,
            yaw + v * jnp.sin(beta) / lr * dt,
            v + (a - fy * jnp.sin(steer)) * inv_m * dt,
        )

    return step


def lift_dynamics(
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> TileStep:
    """Adapt an ``(..., nx)``-style *discrete* step F(x, u) to tile form.

    Stacks the per-dimension tiles on the minormost axis, calls the user
    function once, and unstacks — numerically identical to calling F on a
    (K, nx) batch. In CPU interpret mode this always works (parity:
    tests/test_generic_tick.py). Inside a *compiled* TPU kernel the
    (R_BLK, 128, nx) minormost stack needs Mosaic relayouts that the current
    compiler rejects for some dynamics — if ``pallas_call`` fails to compile,
    write a tile step instead (typically < 10 lines; see the factories above
    for every reference model family).
    """

    def step(xs, vs):
        x = jnp.stack(xs, axis=-1)
        u = jnp.stack(vs, axis=-1)
        y = dynamics_step(x, u)
        return tuple(y[..., i] for i in range(len(xs)))

    return step


def lift_dynamics_time_varying(
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> TileStep:
    """:func:`lift_dynamics` for a step-indexed F(x, u, t) — the pytorch_mppi
    `dynamics(states, actions, t)` signature (test/test_mppi_diff_obs.py:28-42).
    ``t`` arrives as the kernel's int32 rollout step index. Pair with
    ``MPPIConfig.time_varying_dynamics=True`` (the generic tick then calls the
    tile step with three arguments)."""

    def step(xs, vs, t):
        x = jnp.stack(xs, axis=-1)
        u = jnp.stack(vs, axis=-1)
        y = dynamics_step(x, u, t)
        return tuple(y[..., i] for i in range(len(xs)))

    return step


__all__ = [
    "TileStep",
    "lift_dynamics_time_varying",
    "atan_tile",
    "unicycle_tile",
    "kinematic_bicycle_tile",
    "four_wheel_torque_tile",
    "dynamic_bicycle_tile",
    "lift_dynamics",
]
