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


__all__ = ["Plant", "PlantState"]
