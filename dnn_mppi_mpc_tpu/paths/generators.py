"""Analytic reference-trajectory generators (lemniscate / circle / line).

JAX implementations (jit/vmap-able, so randomized scenario batches can be
generated on-device for data collection) of the inline generators scattered
through the reference:

* lemniscate (gradient yaw)   — controllers/mppi_differential_drive.py:374-383
* straight line to a point    — controllers/mppi_differential_drive.py:385-389
* circle with ref speed       — controllers/mppi_race_car_obstacle.py:276-286
* lemniscate with ref speed   — controllers/mppi_race_car_obstacle.py:288-299

All return a (P, d) waypoint table with columns (x, y, yaw[, v]).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gradient(y: jnp.ndarray) -> jnp.ndarray:
    """np.gradient for 1-D arrays: central differences, one-sided at the ends."""
    interior = (y[2:] - y[:-2]) / 2.0
    return jnp.concatenate([y[1:2] - y[0:1], interior, y[-1:] - y[-2:-1]])


def lemniscate(a: float, num_points: int = 100, t0: float = -jnp.pi, t1: float = jnp.pi) -> jnp.ndarray:
    """Lemniscate of Bernoulli, yaw from the numerical gradient
    (mppi_differential_drive.py:374-383)."""
    t = jnp.linspace(t0, t1, num_points)
    denom = 1.0 + jnp.sin(t) ** 2
    x = a * jnp.cos(t) / denom
    y = a * jnp.sin(t) * jnp.cos(t) / denom
    yaw = jnp.arctan2(_gradient(y), _gradient(x))
    return jnp.stack([x, y, yaw], axis=1)


def line(start: jnp.ndarray, end: jnp.ndarray, num_points: int = 100) -> jnp.ndarray:
    """Straight-line course with constant heading (mppi_differential_drive.py:385-389)."""
    x = jnp.linspace(start[0], end[0], num_points)
    y = jnp.linspace(start[1], end[1], num_points)
    yaw = jnp.arctan2(end[1] - start[1], end[0] - start[0]) * jnp.ones(num_points)
    return jnp.stack([x, y, yaw], axis=1)


def circle_with_speed(
    radius: float, num_points: int = 100, speed: float = 5.0
) -> jnp.ndarray:
    """Circular course with tangent yaw and constant reference speed
    (mppi_race_car_obstacle.py:276-286)."""
    ang = jnp.linspace(0.0, 2.0 * jnp.pi, num_points)
    x = radius * jnp.cos(ang)
    y = radius * jnp.sin(ang)
    yaw = ang + jnp.pi / 2.0
    v = jnp.full_like(ang, speed)
    return jnp.stack([x, y, yaw, v], axis=1)


def lemniscate_with_speed(
    radius: float, num_points: int = 100, speed: float = 5.0
) -> jnp.ndarray:
    """Lemniscate over t∈[0,2π] with gradient yaw and constant speed
    (mppi_race_car_obstacle.py:288-299)."""
    t = jnp.linspace(0.0, 2.0 * jnp.pi, num_points)
    denom = 1.0 + jnp.sin(t) ** 2
    x = radius * jnp.cos(t) / denom
    y = radius * jnp.sin(t) * jnp.cos(t) / denom
    yaw = jnp.arctan2(_gradient(y), _gradient(x))
    v = jnp.full_like(t, speed)
    return jnp.stack([x, y, yaw, v], axis=1)


__all__ = ["lemniscate", "line", "circle_with_speed", "lemniscate_with_speed"]
