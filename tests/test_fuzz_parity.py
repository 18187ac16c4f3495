"""Randomized-configuration parity fuzzing: engine vs scalar oracle.

Each case draws random hyperparameters (weights, Σ, bounds, path, start pose)
and checks the jitted engine against the numpy oracle under identical injected
noise — broad-spectrum evidence beyond the fixed reference configs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.config import (
    CostAccumulation,
    MPPIConfig,
    MPPIParams,
    SmoothingFilter,
    Temperature,
)
from dnn_mppi_mpc_tpu.models.dynamics import unicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.solvers.mppi import MPPISolver, make_tracking_costs
from dnn_mppi_mpc_tpu.testing.oracle import OracleMPPI


@pytest.mark.parametrize("seed", range(6))
def test_random_config_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    K = int(rng.choice([32, 64, 128]))
    T = int(rng.choice([5, 10, 15]))
    dt = float(rng.uniform(0.03, 0.15))
    lam = float(rng.uniform(0.5, 3.0))
    alpha = float(rng.uniform(0.0, 0.9))
    exploration = float(rng.choice([0.0001, 0.1, 0.3]))
    s1, s2 = rng.uniform(0.05, 0.6, 2)
    rho = rng.uniform(-0.5, 0.5) * np.sqrt(s1 * s2)
    sigma = np.array([[s1, rho], [rho, s2]])
    weights = rng.uniform(0.5, 20.0, 3)
    tweights = rng.uniform(0.5, 20.0, 3)
    vmax = float(rng.uniform(1.0, 6.0))
    wmax = float(rng.uniform(0.5, 4.0))
    n_pts = int(rng.choice([40, 100]))
    # random smooth path
    t_path = np.linspace(0, 2 * np.pi, n_pts)
    px = np.cumsum(rng.uniform(0.05, 0.2, n_pts))
    py = np.sin(t_path * rng.uniform(0.5, 2.0)) * rng.uniform(0.5, 3.0)
    yaw = np.arctan2(np.gradient(py), np.gradient(px))
    path = np.stack([px, py, yaw], axis=1)
    x0 = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5)])
    search_len = int(rng.choice([10, 20, 50]))

    cfg = MPPIConfig(
        num_samples=K,
        horizon=T,
        dim_x=3,
        dim_u=2,
        dt=dt,
        lam=lam,
        alpha=alpha,
        exploration=exploration,
        temperature=Temperature.EXPLORATION,
        accumulation=CostAccumulation.SUM,
        filter=SmoothingFilter.MOVING_AVERAGE_EDGE,
        filter_window=min(10, T),
        waypoint_search_len=search_len,
    )
    params = MPPIParams(
        sigma=jnp.asarray(sigma),
        stage_weight=jnp.asarray(weights),
        terminal_weight=jnp.asarray(tweights),
        u_min=jnp.array([-vmax, -wmax]),
        u_max=jnp.array([vmax, wmax]),
        ref_path=jnp.asarray(path),
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, dt)
    solver = MPPISolver(cfg, step_fn, *make_tracking_costs(cfg))

    oracle = OracleMPPI(
        ref_path=path,
        dt=dt,
        K=K,
        T=T,
        lam=lam,
        alpha=alpha,
        exploration=exploration,
        sigma=sigma,
        stage_weight=weights,
        terminal_weight=tweights,
        max_speed=vmax,
        max_omega=wmax,
        search_len=search_len,
        faithful=False,
        filter_window=min(10, T),
    )

    state = solver.init()
    x_j = jnp.asarray(x0)
    x_o = x0.copy()
    for tick in range(4):
        eps = rng.multivariate_normal(np.zeros(2), sigma, size=(K, T))
        u0_o, _, S_o = oracle.step(x_o, eps)
        u0_j, state, aux = solver.step(params, state, x_j, noise=jnp.asarray(eps, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(aux.costs), S_o, rtol=5e-4, atol=5e-3,
            err_msg=f"seed={seed} tick={tick} costs",
        )
        np.testing.assert_allclose(
            np.asarray(u0_j), u0_o, rtol=5e-3, atol=1e-3,
            err_msg=f"seed={seed} tick={tick} u0",
        )
        x_o = x_o + np.array(
            [u0_o[0] * np.cos(x_o[2]), u0_o[0] * np.sin(x_o[2]), u0_o[1]]
        ) * dt
        x_j = step_fn(x_j, u0_j)
