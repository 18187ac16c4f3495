"""Simple exteroceptive sensor models (pure JAX, batched).

Covers the reference's sensing experiments:
* 2-D lidar ray casting against circular obstacles — the PyBullet
  ``rayTestBatch`` sweep of test/test_husky.py:45-69, as a closed-form
  ray/circle intersection (vectorized over beams × obstacles × batch).
* goal-relative observation features for RL policies (test_rl_bullet.py uses
  camera images; the vector-observation path feeds the same PPO trainer).
"""

from __future__ import annotations

import jax.numpy as jnp


def lidar_scan(
    pose: jnp.ndarray,
    obstacles: jnp.ndarray,
    num_beams: int = 36,
    max_range: float = 10.0,
    fov: float = 2.0 * jnp.pi,
) -> jnp.ndarray:
    """Range per beam from pose (x, y, yaw) against circle obstacles (n, 3).

    Beams span ``fov`` centered on the heading; a full-circle fov excludes
    the duplicate endpoint (−π and +π are the same direction — including
    both double-counted the rearward beam and left a ~fov/B blind gap,
    round-2 review finding). A ray p + t·d intersects a
    circle |q + t·d|² = r² (q = p − c) at t = −q·d − sqrt((q·d)² − |q|² + r²);
    the smallest positive root within range wins, else ``max_range``
    (the miss convention of PyBullet's rayTest fraction=1).
    """
    x, y, yaw = pose[..., 0], pose[..., 1], pose[..., 2]
    full_circle = abs(float(fov) - 2.0 * 3.141592653589793) < 1e-6
    angles = yaw[..., None] + jnp.linspace(
        -fov / 2.0, fov / 2.0, num_beams, endpoint=not full_circle
    )
    dx = jnp.cos(angles)  # (..., B)
    dy = jnp.sin(angles)

    qx = x[..., None, None] - obstacles[..., :, 0]  # (..., 1, n_obs) − broadcast
    qy = y[..., None, None] - obstacles[..., :, 1]
    r = obstacles[..., :, 2]

    # per (beam, obstacle): b = q·d, c0 = |q|² − r²
    b = dx[..., :, None] * qx + dy[..., :, None] * qy  # (..., B, n_obs)
    c0 = qx * qx + qy * qy - r * r
    disc = b * b - c0
    hit = disc >= 0.0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(hit & (t > 0.0), t, jnp.inf)
    ranges = jnp.min(t, axis=-1)  # closest obstacle per beam
    return jnp.minimum(ranges, max_range)


def goal_relative_obs(pose: jnp.ndarray, goal: jnp.ndarray) -> jnp.ndarray:
    """(distance, bearing, heading-error) features for goal-seeking policies."""
    d = goal[..., :2] - pose[..., :2]
    dist = jnp.linalg.norm(d, axis=-1)
    bearing = jnp.arctan2(d[..., 1], d[..., 0]) - pose[..., 2]
    bearing = jnp.arctan2(jnp.sin(bearing), jnp.cos(bearing))
    heading_err = (
        jnp.arctan2(
            jnp.sin(goal[..., 2] - pose[..., 2]), jnp.cos(goal[..., 2] - pose[..., 2])
        )
        if goal.shape[-1] > 2
        else jnp.zeros_like(dist)
    )
    return jnp.stack([dist, bearing, heading_err], axis=-1)


__all__ = ["lidar_scan", "goal_relative_obs"]
