"""Moving-obstacle models for dynamic scenarios.

Covers the reference's three obstacle motion patterns:
* constant-velocity drift — test/test_mppi_diff_obs.py:14-20
  (positions = initial + velocity·t)
* goal-chasing cubes — simulation/bullet_differential_drive_dnn.py:398-408
  (velocity toward a chase target each tick)
* scripted sinusoid paths — controllers/mpc_differential_dynamics.py:296-315
"""

from __future__ import annotations

import jax.numpy as jnp


def drift_obstacles(
    initial: jnp.ndarray, velocities: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Constant-velocity obstacles: (n, 2|3) positions at time t
    (test_mppi_diff_obs.py:17-20). Extra columns (radii) pass through."""
    out = initial.at[..., :2].add(velocities[..., :2] * t)
    return out


def chase_obstacles(
    positions: jnp.ndarray, target: jnp.ndarray, speed: float, dt: float
) -> jnp.ndarray:
    """Advance obstacles one step toward a chase target
    (bullet_differential_drive_dnn.py:398-408)."""
    d = target[..., :2] - positions[..., :2]
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    step = jnp.where(norm > 1e-6, d / jnp.maximum(norm, 1e-6), 0.0) * speed * dt
    return positions.at[..., :2].add(step)


def sinusoid_obstacles(
    centers: jnp.ndarray, amplitudes: jnp.ndarray, omegas: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Scripted oscillating obstacles (mpc_differential_dynamics.py:296-315).

    ``amplitudes``/``omegas`` may be per-axis ``(n, 2)`` or per-obstacle
    scalars ``(n,)`` (applied to both axes). A bare ``(n,)`` must broadcast
    across obstacles, NOT across x/y — the naive trailing-axis broadcast was
    silently wrong at n == 2 and crashed otherwise (round-2 review finding).
    """
    amplitudes = jnp.asarray(amplitudes)
    omegas = jnp.asarray(omegas)
    if amplitudes.ndim == centers.ndim - 1:
        amplitudes = amplitudes[..., None]
    if omegas.ndim == centers.ndim - 1:
        omegas = omegas[..., None]
    offs = amplitudes * jnp.sin(omegas * t)  # (n, 1|2) per-obstacle offsets
    offs = jnp.broadcast_to(offs, centers[..., :2].shape)
    return centers.at[..., :2].add(offs)


__all__ = ["drift_obstacles", "chase_obstacles", "sinusoid_obstacles"]
