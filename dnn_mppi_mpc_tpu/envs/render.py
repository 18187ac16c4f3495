"""Pure-JAX scene rasterizer — the camera stand-in for pixel-input RL.

The reference's RL experiments run a ResNet actor-critic on PyBullet camera
images (train/pybullet_mlp.py:25-52 consumes images; test/test_camera.py:32-58
captures p.getCameraImage). This image has no physics renderer, so the
equivalent observation is produced by rasterizing the planar scene directly on
device: a top-down multi-channel image of (robot, goal, obstacles). Everything
is jnp, static-shaped, and vmaps over environment batches, so rendering lives
*inside* the jitted PPO rollout — zero host round-trips per frame (the
reference fetches every camera frame through PyBullet's C API instead).

Channels: 0 = robot body + heading marker, 1 = goal, 2 = obstacles.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _blob(xg: jnp.ndarray, yg: jnp.ndarray, cx, cy, radius) -> jnp.ndarray:
    """Soft disk of given radius — smooth so policies see gradients of
    position rather than aliased edges."""
    d2 = (xg - cx) ** 2 + (yg - cy) ** 2
    return jnp.exp(-0.5 * d2 / (radius * radius))


def raster_scene(
    pose: jnp.ndarray,  # (3,) x, y, yaw
    goal: jnp.ndarray,  # (2,)
    obstacles: Optional[jnp.ndarray] = None,  # (n_obs, 3) x, y, r
    *,
    size: int = 48,
    extent: float = 5.0,
) -> jnp.ndarray:
    """Render one (size, size, 3) world-frame frame in [0, 1]."""
    lin = jnp.linspace(-extent, extent, size)
    xg, yg = jnp.meshgrid(lin, lin, indexing="xy")

    body = _blob(xg, yg, pose[0], pose[1], 0.35)
    # heading marker: a smaller blob ahead of the body so orientation is
    # observable from a single frame (the camera sees the chassis direction)
    hx = pose[0] + 0.55 * jnp.cos(pose[2])
    hy = pose[1] + 0.55 * jnp.sin(pose[2])
    robot = jnp.clip(body + 0.7 * _blob(xg, yg, hx, hy, 0.18), 0.0, 1.0)

    goal_ch = _blob(xg, yg, goal[0], goal[1], 0.4)

    if obstacles is not None and obstacles.shape[0] > 0:
        obs_ch = jnp.zeros_like(xg)
        for i in range(obstacles.shape[0]):  # static, tiny n_obs — unrolled
            d = jnp.sqrt(
                (xg - obstacles[i, 0]) ** 2 + (yg - obstacles[i, 1]) ** 2
            )
            obs_ch = jnp.maximum(
                obs_ch, jnp.clip(1.0 - (d - obstacles[i, 2]) / 0.3, 0.0, 1.0)
            )
    else:
        obs_ch = jnp.zeros_like(xg)

    return jnp.stack([robot, goal_ch, obs_ch], axis=-1)


__all__ = ["raster_scene"]
