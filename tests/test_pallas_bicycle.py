"""Bicycle Pallas kernel vs the engine scan path (interpret mode on CPU)."""

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
from dnn_mppi_mpc_tpu.models.dynamics import BicycleParams, kinematic_bicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.ops.pallas.rollout_bicycle import bicycle_rollout_costs
from dnn_mppi_mpc_tpu.ops.sampling import sigma_inverse
from dnn_mppi_mpc_tpu.paths.generators import lemniscate_with_speed
from dnn_mppi_mpc_tpu.solvers.mppi import MPPIState, make_tracking_costs, mppi_step

K, T, DT = 1024, 10, 0.05


@pytest.mark.parametrize(
    "with_obstacles,alpha", [(False, 1.0), (True, 1.0), (False, 0.8)]
)
def test_bicycle_kernel_matches_engine(with_obstacles, alpha):
    ref = np.asarray(lemniscate_with_speed(10.0, 100), dtype=np.float32)
    W = ref.shape[0]
    obstacles = (
        jnp.array([[5.0, 5.0, 1.0], [7.0, 7.0, 1.0]], jnp.float32)
        if with_obstacles
        else None
    )
    cfg = MPPIConfig(
        num_samples=K,
        horizon=T,
        dim_x=4,
        dim_u=2,
        dt=DT,
        lam=50.0,
        alpha=alpha,  # α<1 exercises the γ·uᵀΣ⁻¹v energy term in the kernel
        exploration=0.01,
        temperature=Temperature.LAMBDA,
        accumulation=CostAccumulation.SUM,
        filter=SmoothingFilter.MOVING_AVERAGE_PADDED,
        waypoint_search_len=200,
    )
    params = MPPIParams(
        sigma=jnp.array([[0.5, 0.0], [0.0, 0.1]], jnp.float32),
        stage_weight=jnp.array([50.0, 50.0, 1.0, 20.0], jnp.float32),
        terminal_weight=jnp.array([50.0, 50.0, 1.0, 20.0], jnp.float32),
        u_min=jnp.array([-0.523, -2.0], jnp.float32),
        u_max=jnp.array([0.523, 2.0], jnp.float32),
        ref_path=jnp.asarray(ref),
        obstacles=obstacles,
    )
    bp = BicycleParams(wheel_base=jnp.asarray(2.5, jnp.float32))
    step_fn = lambda x, u: euler_step(lambda s, a: kinematic_bicycle(s, a, bp), x, u, DT)
    stage, terminal = make_tracking_costs(
        cfg, wrap_yaw=True, collision="polygon" if with_obstacles else "none"
    )

    rng = np.random.default_rng(0)
    eps = jnp.asarray(
        rng.multivariate_normal(np.zeros(2), np.asarray(params.sigma), (K, T)),
        jnp.float32,
    )
    x0 = jnp.asarray([10.0, 0.5, np.pi / 2, 3.0], jnp.float32)
    u_nom = jnp.asarray(rng.normal(scale=0.1, size=(T, 2)), jnp.float32)
    state = MPPIState(u_prev=u_nom, waypoint_idx=jnp.int32(0), key=jax.random.PRNGKey(0))

    _, _, aux = mppi_step(cfg, step_fn, stage, terminal, params, state, x0, noise=eps)

    a = cfg.gamma * (u_nom @ sigma_inverse(params.sigma))
    S = bicycle_rollout_costs(
        eps,
        u_nom,
        a.astype(jnp.float32),
        x0,
        jnp.asarray(ref),
        params.stage_weight,
        params.terminal_weight,
        params.u_min,
        params.u_max,
        DT,
        (1.0 - cfg.exploration) * K,
        wheel_base=2.5,
        obstacles=obstacles,
        T=T,
        W=W,
        interpret=True,
    )
    got = np.asarray(S)
    want = np.asarray(aux.costs)
    # collision penalties are 1e7 — compare with scale-aware tolerance
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-2)
