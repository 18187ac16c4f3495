"""Actuator-level inverse kinematics (wheel commands from body commands).

JAX ports of the host-side actuation math the reference applies before
``setJointMotorControl2``:

* diff-drive / skid-steer wheel speeds — simulation/bullet_differential_drive_dnn.py:20-34
  (Husky wheel separation L=0.5708)
* Ackermann drive+steer wheel speeds — controllers/bullet_mpc_race_car_obstacle.py:384-394

Batched over leading dims so a whole scenario fleet converts in one call.
"""

from __future__ import annotations

import jax.numpy as jnp

HUSKY_WHEEL_SEP = 0.5708


def diff_drive_wheel_speeds(
    v: jnp.ndarray, omega: jnp.ndarray, wheel_sep: float = HUSKY_WHEEL_SEP
) -> jnp.ndarray:
    """(..., 4) wheel speeds (front-left, front-right, rear-left, rear-right)
    from body speed v and yaw rate ω (bullet_differential_drive_dnn.py:20-34)."""
    v_left = v - omega * wheel_sep / 2.0
    v_right = v + omega * wheel_sep / 2.0
    return jnp.stack([v_left, v_right, v_left, v_right], axis=-1)


def ackermann_wheel_speeds(
    v: jnp.ndarray, steer: jnp.ndarray, wheel_base: float, track_width: float
) -> jnp.ndarray:
    """(..., 4) wheel speeds (left-rear, right-rear, left-front, right-front)
    for an Ackermann car (bullet_mpc_race_car_obstacle.py:384-394)."""
    t = jnp.tan(steer)
    v_lrw = v * (1.0 - track_width * t / (2.0 * wheel_base))
    v_rrw = v * (1.0 + track_width * t / (2.0 * wheel_base))
    v_lfw = jnp.sqrt(
        v**2 + ((v * t / 2.0) - (v * track_width * t / (2.0 * wheel_base))) ** 2
    )
    v_rfw = jnp.sqrt(
        v**2 + ((v * t / 2.0) + (v * track_width * t / (2.0 * wheel_base))) ** 2
    )
    return jnp.stack([v_lrw, v_rrw, v_lfw, v_rfw], axis=-1)


__all__ = ["diff_drive_wheel_speeds", "ackermann_wheel_speeds", "HUSKY_WHEEL_SEP"]
