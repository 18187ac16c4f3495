"""Lane-batched MPPI fleet tick (round-2 verdict #6).

CPU-runnable: construction guards. TPU (tpu_hw, DMM_TPU_TESTS=1):

* kernel parity — member b of ``fleet_mppi_tick`` equals
  ``diffdrive_mppi_tick_blocked`` run standalone with member b's seed/inputs
  (identical (seed, block 0) PRNG streams by construction);
* engine parity — ``make_fleet_fused_mppi_step`` equals per-member
  ``mppi_step`` with the blocked tick on the same carried keys;
* closed loop — a B-member fleet tracks B different references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.config import (
    MPPIConfig,
    MPPIParams,
    SmoothingFilter,
    Temperature,
)
from dnn_mppi_mpc_tpu.models.dynamics import unicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.solvers.mppi import (
    MPPIState,
    make_fleet_fused_mppi_step,
    make_pallas_diffdrive_tick_blocked,
    make_tracking_costs,
    mppi_step,
)

B, K, T, DT, W = 8, 1024, 20, 0.05, 8
on_tpu = jax.devices()[0].platform == "tpu"


@pytest.fixture(autouse=True)
def _f32_mode():
    # gridded pallas + x64: see tests/test_mppi_tick_blocked.py::_f32_mode
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


def _setup(**cfg_kw):
    kw = dict(
        num_samples=K, horizon=T, dim_x=3, dim_u=2, dt=DT,
        lam=0.8, alpha=0.3, exploration=0.2,
        temperature=Temperature.LAMBDA,
        filter=SmoothingFilter.MOVING_AVERAGE_EDGE, filter_window=5,
        waypoint_search_len=W,
    )
    kw.update(cfg_kw)
    cfg = MPPIConfig(**kw)
    n = 40
    path = np.stack(
        [np.linspace(0, 4, n), np.sin(np.linspace(0, 2, n)),
         np.linspace(0.1, 0.5, n)], axis=1,
    ).astype(np.float32)
    params = MPPIParams(
        sigma=jnp.array([[0.09, 0.0], [0.0, 0.04]], jnp.float32),
        stage_weight=jnp.array([3.0, 3.0, 1.0], jnp.float32),
        terminal_weight=jnp.array([5.0, 5.0, 2.0], jnp.float32),
        u_min=jnp.array([-2.0, -1.5], jnp.float32),
        u_max=jnp.array([2.0, 1.5], jnp.float32),
        ref_path=jnp.asarray(path),
        obstacles=jnp.array([[1.5, 0.5, 0.3]], jnp.float32),
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg, collision="circle")
    return cfg, params, step_fn, stage, terminal


def test_fleet_guards():
    import dataclasses

    cfg, params, step_fn, stage, terminal = _setup()
    with pytest.raises(ValueError, match="num_rollout_repeats"):
        make_fleet_fused_mppi_step(
            dataclasses.replace(cfg, num_rollout_repeats=2), step_fn
        )


@pytest.mark.tpu_hw
@pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only")
def test_fleet_engine_matches_per_member_blocked_tick():
    cfg, params, step_fn, stage, terminal = _setup()
    fleet = make_fleet_fused_mppi_step(cfg, step_fn)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 3)), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    states = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    u0s, new_states, auxs = fleet(params, states, x0s)
    assert u0s.shape == (B, 2)

    tick = make_pallas_diffdrive_tick_blocked(cfg, k_block=K)
    single = jax.jit(
        lambda p, s, x: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, None, tick_fn=tick
        )
    )
    for b in (0, 3, B - 1):
        st_b = MPPIState(
            u_prev=states.u_prev[b],
            waypoint_idx=states.waypoint_idx[b],
            key=keys[b],
        )
        u0_r, st_r, aux_r = single(params, st_b, x0s[b])
        np.testing.assert_allclose(
            np.asarray(u0s[b]), np.asarray(u0_r), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(auxs.costs[b]), np.asarray(aux_r.costs), rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_states.u_prev[b]), np.asarray(st_r.u_prev),
            rtol=1e-4, atol=1e-5,
        )


@pytest.mark.tpu_hw
@pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only")
def test_fleet_closed_loop_per_member_paths():
    """B members track B different reference lines simultaneously — the
    multi-robot collection scenario (train/bullet_mpc_differential_drive.py
    :119-157) as one on-chip fleet."""
    import dataclasses

    from dnn_mppi_mpc_tpu.paths import line

    cfg, params, step_fn, _, _ = _setup()
    rng = np.random.default_rng(2)
    goals = rng.uniform(-3, 3, (B, 2)).astype(np.float32)
    paths = jnp.stack(
        [line(jnp.zeros(2), jnp.asarray(g), num_points=40) for g in goals]
    )  # (B, 40, 3)
    params = dataclasses.replace(params, ref_path=paths, obstacles=None)
    fleet = make_fleet_fused_mppi_step(cfg, step_fn)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    states = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    xs = jnp.zeros((B, 3), jnp.float32)
    d0 = None
    for i in range(50):
        u0s, states, auxs = fleet(params, states, xs)
        xs = jax.vmap(step_fn)(xs, u0s)
        if i == 0:
            d0 = np.linalg.norm(np.asarray(xs[:, :2]) - goals, axis=1)
    assert bool(jnp.all(jnp.isfinite(xs)))
    # every member moved toward ITS goal (distinct references actually used)
    d1 = np.array(
        [
            np.linalg.norm(
                np.asarray(paths[b][:, :2]) - np.asarray(xs[b, :2]), axis=1
            ).min()
            for b in range(B)
        ]
    )
    assert float(d1.max()) < 0.3, d1
