"""Unit tests: dynamics, integrators vs closed forms and the scalar reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.models import (
    BicycleParams,
    DynamicBicycleParams,
    FourWheelParams,
    dynamic_bicycle,
    erk_step,
    euler_step,
    four_wheel_torque,
    kinematic_bicycle,
    rk4_step,
    rollout,
    unicycle,
)


def test_unicycle_matches_scalar_form():
    # controllers/mppi_differential_drive.py:182-198 Euler form
    x = jnp.array([1.0, 2.0, 0.3])
    u = jnp.array([1.5, 0.4])
    dt = 0.1
    nxt = euler_step(unicycle, x, u, dt)
    expected = np.array(
        [1.0 + 1.5 * np.cos(0.3) * dt, 2.0 + 1.5 * np.sin(0.3) * dt, 0.3 + 0.4 * dt]
    )
    np.testing.assert_allclose(np.asarray(nxt), expected, rtol=1e-6)


def test_unicycle_batched_broadcasts():
    x = jnp.ones((7, 5, 3))
    u = jnp.ones((7, 5, 2))
    assert unicycle(x, u).shape == (7, 5, 3)


def test_kinematic_bicycle_matches_scalar_form():
    # controllers/mppi_race_car_obstacle.py:200-214 (Euler with dt)
    params = BicycleParams(wheel_base=jnp.asarray(2.5))
    x = jnp.array([0.0, 0.0, 0.1, 3.0])
    u = jnp.array([0.2, 1.0])
    dt = 0.05
    nxt = euler_step(lambda s, a: kinematic_bicycle(s, a, params), x, u, dt)
    expected = np.array(
        [
            0.0 + 3.0 * np.cos(0.1) * dt,
            0.0 + 3.0 * np.sin(0.1) * dt,
            0.1 + 3.0 / 2.5 * np.tan(0.2) * dt,
            3.0 + 1.0 * dt,
        ]
    )
    np.testing.assert_allclose(np.asarray(nxt), expected, rtol=1e-6)


def test_four_wheel_torque_accelerations():
    # controllers/mpc_differential_dynamics.py:98-105
    p = FourWheelParams.default()
    x = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0])
    u = jnp.array([1.0, 2.0, 3.0, 4.0])
    dx = four_wheel_torque(x, u, p)
    r, m = float(p.wheel_radius), float(p.mass)
    L, inertia = float(p.wheel_sep), float(p.inertia)
    assert np.isclose(float(dx[3]), r / (4 * m) * 10.0)
    assert np.isclose(float(dx[4]), r / (L * inertia) * ((1 + 3) - (2 + 4)) / 2)


def test_dynamic_bicycle_finite_at_rest():
    x = jnp.zeros((4,))
    u = jnp.array([1.0, 0.3])
    dx = dynamic_bicycle(x, u, DynamicBicycleParams.default())
    assert np.all(np.isfinite(np.asarray(dx)))


def test_rk4_matches_analytic_exponential():
    # dx/dt = -x has exact solution x0 * exp(-t); RK4 error O(dt^5) per step.
    f = lambda x, u: -x
    x = jnp.array([1.0])
    u = jnp.zeros((1,))
    dt = 0.1
    nxt = rk4_step(f, x, u, dt)
    np.testing.assert_allclose(float(nxt[0]), np.exp(-dt), rtol=1e-7)


def test_erk_substeps_improve_accuracy():
    f = lambda x, u: -x
    x = jnp.array([1.0])
    u = jnp.zeros((1,))
    dt = 1.0
    err1 = abs(float(rk4_step(f, x, u, dt)[0]) - np.exp(-1.0))
    err3 = abs(float(erk_step(f, x, u, dt, num_steps=3)[0]) - np.exp(-1.0))
    assert err3 < err1


def test_rollout_scan_matches_loop():
    step = lambda x, u: euler_step(unicycle, x, u, 0.1)
    x0 = jnp.array([0.0, 0.0, 0.0])
    us = jnp.array([[1.0, 0.1]] * 5)
    traj = rollout(step, x0, us)
    x = x0
    for t in range(5):
        x = step(x, us[t])
        np.testing.assert_allclose(np.asarray(traj[t]), np.asarray(x), rtol=1e-6)
