"""Plants: pure-JAX simulated vehicles closing the control loop.

Replaces the reference's three plant flavors with one jitted integrator plant:
* hand-rolled Euler/RK4 plants (controllers/mppi_differential_drive.py:33-40,
  mpc_differential_drive_obstacle_static.py:334-356)
* the AcadosSimSolver ERK plant (…:259-278)
* the gym-style ``Vehicle`` env with input-delay buffer and noise hooks
  (models/vehicle.py:85-115)

All features are batched — a (B, nx) scenario batch steps in one call.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..models.integrators import erk_step, euler_step, rk4_step

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@register_pytree_node_class
@dataclasses.dataclass
class PlantState:
    """x: (..., nx) state; u_buffer: (delay, ..., nu) pending inputs; key."""

    x: jnp.ndarray
    u_buffer: jnp.ndarray
    key: jax.Array

    def tree_flatten(self):
        return (self.x, self.u_buffer, self.key), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class Plant:
    """Integrator plant with optional input delay and additive noise.

    ``delay_steps`` reproduces models/vehicle.py:99-104 (inputs act after a
    fixed buffer delay); ``measurement_noise_std``/``process_noise_std`` mirror
    its noise hooks (:93-97). ``method`` 'euler' matches the MPPI demos,
    'erk' (RK4 × substeps) matches AcadosSimSolver (num_stages=4, num_steps=3).
    """

    def __init__(
        self,
        dynamics: Dynamics,
        dt: float,
        method: str = "euler",
        num_steps: int = 3,
        delay_steps: int = 0,
        process_noise_std: Optional[jnp.ndarray] = None,
        measurement_noise_std: Optional[jnp.ndarray] = None,
    ) -> None:
        self.dynamics = dynamics
        self.dt = dt
        self.delay_steps = delay_steps
        self.process_noise_std = process_noise_std
        self.measurement_noise_std = measurement_noise_std
        if method == "euler":
            self._step = lambda x, u: euler_step(dynamics, x, u, dt)
        elif method == "rk4":
            self._step = lambda x, u: rk4_step(dynamics, x, u, dt)
        elif method == "erk":
            self._step = lambda x, u: erk_step(dynamics, x, u, dt, num_steps=num_steps)
        else:
            raise ValueError(f"unknown integrator {method!r}")
        self.step = jax.jit(self._step_impl)
        self.measure = jax.jit(self._measure_impl)

    def init(
        self, x0: jnp.ndarray, dim_u: int, key: Optional[jax.Array] = None
    ) -> PlantState:
        buf = jnp.zeros((max(self.delay_steps, 1),) + x0.shape[:-1] + (dim_u,), x0.dtype)
        return PlantState(
            x=x0, u_buffer=buf, key=key if key is not None else jax.random.PRNGKey(0)
        )

    def _step_impl(self, state: PlantState, u: jnp.ndarray) -> PlantState:
        if self.delay_steps > 0:
            u_applied = state.u_buffer[0]
            buf = jnp.concatenate([state.u_buffer[1:], u[None]], axis=0)
        else:
            u_applied = u
            buf = state.u_buffer
        x = self._step(state.x, u_applied)
        key = state.key
        if self.process_noise_std is not None:
            key, sub = jax.random.split(key)
            x = x + self.process_noise_std * jax.random.normal(sub, x.shape, x.dtype)
        return PlantState(x=x, u_buffer=buf, key=key)

    def _measure_impl(self, state: PlantState) -> Tuple[jnp.ndarray, PlantState]:
        if self.measurement_noise_std is None:
            return state.x, state
        key, sub = jax.random.split(state.key)
        y = state.x + self.measurement_noise_std * jax.random.normal(
            sub, state.x.shape, state.x.dtype
        )
        return y, PlantState(x=state.x, u_buffer=state.u_buffer, key=key)


@register_pytree_node_class
@dataclasses.dataclass
class WheelPlantState:
    """pose (..., 3); wheel_speeds (..., 4) lag state; pending commands; key."""

    x: jnp.ndarray
    wheel_speeds: jnp.ndarray
    u_buffer: jnp.ndarray
    key: jax.Array

    def tree_flatten(self):
        return (self.x, self.wheel_speeds, self.u_buffer, self.key), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class WheelPlant:
    """Actuation-level diff-drive plant: WHEEL-speed commands → body pose.

    Every reference deployment loop actuates wheels, not body twist: the
    controller's (v, ω) goes through inverse kinematics to four wheel-speed
    targets which PyBullet's velocity-controlled joints then track
    (simulation/bullet_differential_drive_dnn.py:20-34, 419-467;
    train/bullet_mpc_differential_drive.py:40-86). This is the pure-JAX
    forward twin of :mod:`..envs.kinematics`'s ``diff_drive_wheel_speeds``:

    * per-wheel first-order lag with time constant ``tau`` (velocity-control
      joints track their target with finite force);
    * per-wheel command ``delay_steps`` and speed ``cap``;
    * multiplicative ``slip`` on the differential (turning) mode and
      separate ``common_gain``/``diff_gain`` execution gains — the recorded
      acados run's plant executed the common mode at ~1.8× (real-time
      physics advancing more than one control period per tick,
      train/bullet_mpc_differential_drive.py:248 setRealTimeSimulation)
      while the differential mode was nearly dead (~0.005×, the
      wheel-speed/joint-velocity unit confusion at :81-85) — these gains
      let tests calibrate the plant to the measured input→output response
      of ``saved_data/states_diff.npy`` (tests/test_golden_nmpc.py);
    * additive pose process noise.

    Forward kinematics: left = (fl + rl)/2, right = (fr + rr)/2,
    v = common_gain·(left + right)/2, ω = diff_gain·slip·(right − left)/L.
    """

    def __init__(
        self,
        dt: float,
        wheel_sep: float = 0.5708,
        tau: float = 0.0,
        delay_steps: int = 0,
        wheel_speed_cap: Optional[float] = None,
        slip: float = 1.0,
        common_gain: float = 1.0,
        diff_gain: float = 1.0,
        process_noise_std: Optional[jnp.ndarray] = None,
        wrap_yaw: bool = True,
    ) -> None:
        self.dt = dt
        self.wheel_sep = wheel_sep
        self.tau = tau
        self.delay_steps = delay_steps
        self.wheel_speed_cap = wheel_speed_cap
        self.slip = slip
        self.common_gain = common_gain
        self.diff_gain = diff_gain
        self.process_noise_std = process_noise_std
        # PyBullet reports yaw via getEulerFromQuaternion — wrapped to
        # (-pi, pi] (train/bullet_mpc_differential_drive.py:64-67); this
        # plant uses the [-pi, pi) mod form (see the wrap comment). Matching
        # that matters in closed loop: an unbounded integrated yaw walks out
        # of the controller's +-3.14 yaw box and the qp barrier's quadratic
        # extension then dominates. (Wrapped yaw in (3.14, pi] still grazes
        # the box by <2e-3 rad — inherent to the reference's own protocol,
        # whose bounds are +-3.14 against PyBullet's +-pi yaw.) The barrier's
        # extension then dominates every solve.
        self.wrap_yaw = wrap_yaw
        self.step = jax.jit(self._step_impl)
        self.step_body = jax.jit(self._step_body_impl)

    def init(self, x0: jnp.ndarray, key: Optional[jax.Array] = None) -> WheelPlantState:
        shape = x0.shape[:-1] + (4,)
        return WheelPlantState(
            x=x0,
            wheel_speeds=jnp.zeros(shape, x0.dtype),
            u_buffer=jnp.zeros((max(self.delay_steps, 1),) + shape, x0.dtype),
            key=key if key is not None else jax.random.PRNGKey(0),
        )

    def _step_impl(self, state: WheelPlantState, wheel_cmds: jnp.ndarray) -> WheelPlantState:
        if self.delay_steps > 0:
            cmd = state.u_buffer[0]
            buf = jnp.concatenate([state.u_buffer[1:], wheel_cmds[None]], axis=0)
        else:
            cmd = wheel_cmds
            buf = state.u_buffer
        if self.wheel_speed_cap is not None:
            cmd = jnp.clip(cmd, -self.wheel_speed_cap, self.wheel_speed_cap)
        if self.tau > 0.0:
            import math

            alpha = 1.0 - math.exp(-self.dt / self.tau)
            w = state.wheel_speeds + alpha * (cmd - state.wheel_speeds)
        else:
            w = cmd
        # FK (wheel order fl, fr, rl, rr — kinematics.diff_drive_wheel_speeds)
        left = 0.5 * (w[..., 0] + w[..., 2])
        right = 0.5 * (w[..., 1] + w[..., 3])
        v = self.common_gain * 0.5 * (left + right)
        omega = self.diff_gain * self.slip * (right - left) / self.wheel_sep
        yaw = state.x[..., 2]
        x = state.x + self.dt * jnp.stack(
            [v * jnp.cos(yaw), v * jnp.sin(yaw), omega], axis=-1
        )
        if self.wrap_yaw:
            # [-π, π): one boundary point differs from PyBullet's (-π, π]
            # (measure zero — yaw lands exactly on ±π with probability 0).
            # Deliberately NOT the algebraically-equivalent π−mod(π−x, 2π)
            # form: the two differ by ~1 ulp per wrap, and the golden
            # protocol's closed loop is chaotic enough that the calibrated
            # setpoint-convergence gate (test_golden_nmpc) swings 42 → 21
            # converged under that ulp-level perturbation (round-4 review
            # follow-up — doc fixed instead of the formula).
            wrapped = jnp.mod(x[..., 2] + jnp.pi, 2.0 * jnp.pi) - jnp.pi
            x = x.at[..., 2].set(wrapped)
        key = state.key
        if self.process_noise_std is not None:
            key, sub = jax.random.split(key)
            x = x + self.process_noise_std * jax.random.normal(sub, x.shape, x.dtype)
        return WheelPlantState(x=x, wheel_speeds=w, u_buffer=buf, key=key)

    def _step_body_impl(self, state: WheelPlantState, u: jnp.ndarray) -> WheelPlantState:
        """Convenience: body-twist command (v, ω) → IK → wheel step — the
        exact shape of the reference's control loop (solve → IK → joints)."""
        from .kinematics import diff_drive_wheel_speeds

        cmds = diff_drive_wheel_speeds(u[..., 0], u[..., 1], self.wheel_sep)
        return self._step_impl(state, cmds)


__all__ = ["Plant", "PlantState", "WheelPlant", "WheelPlantState"]
