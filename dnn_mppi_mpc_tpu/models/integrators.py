"""Explicit integrators for discretizing continuous dynamics.

Replaces the reference's per-script Euler updates
(controllers/mppi_differential_drive.py:182-198), the hand-rolled RK4
(controllers/mpc_differential_drive_obstacle_static.py:334-356), and the
acados ERK integrator configuration (sim_method_num_stages=4, num_steps=3 at
controllers/mpc_differential_drive_obstacle_static.py:241-242).

All integrators are pure and broadcast over leading batch dims, so the same
code path serves single-state plants, K-sample MPPI rollouts and N-node
shooting discretizations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def euler_step(f: Dynamics, x: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Forward-Euler step — the MPPI rollout integrator
    (controllers/mppi_differential_drive.py:194-196)."""
    return x + f(x, u) * dt


def rk4_step(f: Dynamics, x: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Classic RK4 step (controllers/mpc_differential_drive_obstacle_static.py:334-340)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def erk_step(
    f: Dynamics, x: jnp.ndarray, u: jnp.ndarray, dt: float, num_steps: int = 3
) -> jnp.ndarray:
    """RK4 with ``num_steps`` substeps over one control interval — matches acados
    ERK with sim_method_num_stages=4, sim_method_num_steps=3
    (controllers/mpc_differential_drive_obstacle_static.py:241-242).

    The substep loop is unrolled (num_steps is small and static) so XLA fuses
    the whole interval into one kernel.
    """
    h = dt / num_steps
    for _ in range(num_steps):
        x = rk4_step(f, x, u, h)
    return x


def discretize(
    f: Dynamics, dt: float, method: str = "euler", num_steps: int = 1
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Return a discrete transition ``F(x, u) -> x_next`` for the given method."""
    if method == "euler":
        return lambda x, u: euler_step(f, x, u, dt)
    if method == "rk4":
        return lambda x, u: rk4_step(f, x, u, dt)
    if method == "erk":
        return lambda x, u: erk_step(f, x, u, dt, num_steps=num_steps)
    raise ValueError(f"unknown integrator method: {method!r}")


def rollout(
    step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    u_seq: jnp.ndarray,
) -> jnp.ndarray:
    """Roll a discrete transition over a control sequence with ``lax.scan``.

    ``u_seq`` has shape (T, ..., dim_u) with time leading; returns the (T, ..., dim_x)
    trajectory of visited states (x1..xT). Batch dims ride along unvectorized —
    the batched MPPI rollout keeps K in the trailing batch axes of the carry.
    """

    def body(x, u):
        x_next = step(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, u_seq)
    return xs


__all__ = ["euler_step", "rk4_step", "erk_step", "discretize", "rollout"]
