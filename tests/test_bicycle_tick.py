"""Parity tests for the fused race-car tick kernel (ops/pallas/bicycle_tick.py).

Same strategy as tests/test_mppi_tick.py: the ε-injection mode runs the
kernel's exact compute path in the CPU interpreter and must reproduce the
scan engine (solvers/mppi.py) on the race-car config — 4-state bicycle,
wrap-yaw 4-term cost, W=200 whole-path window, polygon collision. The on-chip
PRNG path is TPU-only (no interpreter lowering for the Mosaic PRNG).
"""

from __future__ import annotations

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
from dnn_mppi_mpc_tpu.models.dynamics import BicycleParams, kinematic_bicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.paths.generators import lemniscate_with_speed
from dnn_mppi_mpc_tpu.solvers.mppi import (
    MPPIState,
    make_pallas_bicycle_tick,
    make_tracking_costs,
    mppi_step,
)

K, T, DT = 512, 8, 0.05


def _setup(obstacles=False, alpha=0.8):
    ref = np.asarray(lemniscate_with_speed(10.0, 100), dtype=np.float32)
    cfg = MPPIConfig(
        num_samples=K,
        horizon=T,
        dim_x=4,
        dim_u=2,
        dt=DT,
        lam=50.0,
        alpha=alpha,
        exploration=0.01,
        temperature=Temperature.LAMBDA,
        accumulation=CostAccumulation.SUM,
        filter=SmoothingFilter.MOVING_AVERAGE_PADDED,
        filter_window=5,
        waypoint_search_len=200,
    )
    params = MPPIParams(
        sigma=jnp.array([[0.5, 0.0], [0.0, 0.1]], jnp.float32),
        stage_weight=jnp.array([50.0, 50.0, 1.0, 20.0], jnp.float32),
        terminal_weight=jnp.array([50.0, 50.0, 1.0, 20.0], jnp.float32),
        u_min=jnp.array([-0.523, -2.0], jnp.float32),
        u_max=jnp.array([0.523, 2.0], jnp.float32),
        ref_path=jnp.asarray(ref),
        obstacles=(
            jnp.array([[5.0, 5.0, 1.0], [7.0, 7.0, 1.0]], jnp.float32)
            if obstacles
            else None
        ),
    )
    bp = BicycleParams(wheel_base=jnp.asarray(2.5, jnp.float32))
    step_fn = lambda x, u: euler_step(
        lambda s, a: kinematic_bicycle(s, a, bp), x, u, DT
    )
    stage, terminal = make_tracking_costs(
        cfg, wrap_yaw=True, collision="polygon" if obstacles else "none"
    )
    return cfg, params, step_fn, stage, terminal


def _noise(cfg, params, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.multivariate_normal(
            np.zeros(2), np.asarray(params.sigma), (cfg.num_samples, cfg.horizon)
        ),
        jnp.float32,
    )


@pytest.mark.parametrize("obstacles", [False, True])
def test_bicycle_tick_matches_scan_engine(obstacles):
    cfg, params, step_fn, stage, terminal = _setup(obstacles=obstacles)
    eps = _noise(cfg, params)
    x0 = jnp.asarray([10.0, 0.5, np.pi / 2, 3.0], jnp.float32)
    state = MPPIState.init(cfg)
    state = dataclasses.replace(
        state,
        u_prev=jnp.asarray(
            np.random.default_rng(0).normal(0, 0.1, (T, 2)), jnp.float32
        ),
    )

    tick = make_pallas_bicycle_tick(cfg, interpret=True)
    u0_t, st_t, aux_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )(params, state, x0, eps)
    u0_r, st_r, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )(params, state, x0, eps)

    np.testing.assert_allclose(
        np.asarray(aux_t.costs), np.asarray(aux_r.costs), rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux_t.weights), np.asarray(aux_r.weights), rtol=3e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(u0_t), np.asarray(u0_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_t.u_prev), np.asarray(st_r.u_prev), rtol=1e-4, atol=1e-5
    )


def test_bicycle_tick_closed_loop_matches_scan():
    """10-tick closed loop with injected noise per tick: trajectories match."""
    cfg, params, step_fn, stage, terminal = _setup()
    tick = make_pallas_bicycle_tick(cfg, interpret=True)
    step_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )
    step_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )
    x_t = x_r = jnp.asarray([10.0, 0.5, np.pi / 2, 3.0], jnp.float32)
    st_t = st_r = MPPIState.init(cfg)
    for i in range(10):
        eps = _noise(cfg, params, seed=100 + i)
        u_t, st_t, _ = step_t(params, st_t, x_t, eps)
        u_r, st_r, _ = step_r(params, st_r, x_r, eps)
        x_t = step_fn(x_t, u_t)
        x_r = step_fn(x_r, u_r)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_r), rtol=1e-3, atol=1e-4)


def test_bicycle_tick_guards():
    cfg, params, step_fn, stage, terminal = _setup()
    with pytest.raises(ValueError, match="SUM accumulation"):
        make_pallas_bicycle_tick(
            dataclasses.replace(cfg, accumulation=CostAccumulation.LAST)
        )
    with pytest.raises(ValueError, match="num_rollout_repeats"):
        make_pallas_bicycle_tick(
            dataclasses.replace(cfg, num_rollout_repeats=3)
        )
    tick = make_pallas_bicycle_tick(cfg, interpret=True)
    bad = dataclasses.replace(
        params,
        obstacles=jnp.zeros((1, 3), jnp.float32),
        obstacle_velocities=jnp.ones((1, 2), jnp.float32),
    )
    with pytest.raises(ValueError, match="obstacle_velocities"):
        jax.eval_shape(
            lambda p: mppi_step(
                cfg,
                step_fn,
                stage,
                terminal,
                p,
                MPPIState.init(cfg),
                jnp.zeros(4),
                _noise(cfg, params),
                tick_fn=tick,
            ),
            bad,
        )


def test_racecar_preset_fused_tick_wiring(monkeypatch):
    """presets.racecar_mppi(fused_tick=True) must actually bind the bicycle
    tick factory with the preset's arguments (wiring verified via factory
    capture — the compiled kernel itself is TPU-only; round-2 review: the
    old test never passed fused_tick=True), and the manually-bound
    interpret-mode tick matches the scan-path preset."""
    import dnn_mppi_mpc_tpu.solvers.mppi as m
    from dnn_mppi_mpc_tpu.presets import racecar_mppi

    ref = np.asarray(lemniscate_with_speed(10.0, 100), dtype=np.float32)

    captured = {}

    def fake_factory(cfg_, wheel_base=2.5, **kw):
        captured.update(kw, wheel_base=wheel_base, K=cfg_.num_samples)
        return lambda *a, **k: None

    monkeypatch.setattr(m, "make_pallas_bicycle_tick", fake_factory)
    racecar_mppi(
        jnp.asarray(ref), num_samples=200, horizon=T,
        fused_tick=True, wheel_base=2.5, gaussian="box_muller",
    )
    monkeypatch.undo()
    assert captured["wheel_base"] == 2.5
    assert captured["gaussian"] == "box_muller"
    assert captured["K"] == 256  # lane-rounded from 200

    sol_t, params = racecar_mppi(jnp.asarray(ref), num_samples=K, horizon=T)
    # interpret-mode tick (the preset binds the compiled kernel; rebuild with
    # interpret=True for the CPU run)
    from dnn_mppi_mpc_tpu.solvers.mppi import MPPISolver

    tick = make_pallas_bicycle_tick(sol_t.cfg, interpret=True)
    cfg = sol_t.cfg
    _, params2 = racecar_mppi(jnp.asarray(ref), num_samples=K, horizon=T)
    sol_k = MPPISolver(cfg, sol_t.dynamics_step, *_setup()[3:5], tick_fn=tick)

    eps = _noise(cfg, params)
    x0 = jnp.asarray([10.0, 0.5, np.pi / 2, 3.0], jnp.float32)
    st = sol_t.init()
    u0_a, _, _ = sol_t.step(params, st, x0, noise=eps)
    u0_b, _, _ = sol_k.step(params2, st, x0, noise=eps)
    np.testing.assert_allclose(np.asarray(u0_a), np.asarray(u0_b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("obstacles", [False, True])
def test_bicycle_tick_iso_xy_matches_scan_engine(obstacles):
    """iso_xy=True (symmetric x/y weights — the reference's own (50, 50, …)
    defaults) must reproduce the scan engine like the general kernel: the
    cost from the running min distance is algebraically identical."""
    cfg, params, step_fn, stage, terminal = _setup(obstacles=obstacles)
    eps = _noise(cfg, params, seed=9)
    x0 = jnp.asarray([10.0, 0.5, np.pi / 2, 3.0], jnp.float32)
    state = MPPIState.init(cfg)
    state = dataclasses.replace(
        state,
        u_prev=jnp.asarray(
            np.random.default_rng(1).normal(0, 0.1, (T, 2)), jnp.float32
        ),
    )

    tick = make_pallas_bicycle_tick(cfg, interpret=True, iso_xy=True)
    u0_t, st_t, aux_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )(params, state, x0, eps)
    u0_r, st_r, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )(params, state, x0, eps)

    np.testing.assert_allclose(
        np.asarray(aux_t.costs), np.asarray(aux_r.costs), rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux_t.weights), np.asarray(aux_r.weights), rtol=3e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(u0_t), np.asarray(u0_r), rtol=1e-4, atol=1e-5)


def test_bicycle_tick_iso_xy_rejects_asymmetric_weights():
    """Concrete (un-jitted) weights are validated at call time; traced
    weights are the caller's responsibility (documented in the binder)."""
    cfg, params, step_fn, stage, terminal = _setup()
    params = dataclasses.replace(
        params, stage_weight=jnp.array([50.0, 40.0, 1.0, 20.0], jnp.float32)
    )
    tick = make_pallas_bicycle_tick(cfg, interpret=True, iso_xy=True)
    with pytest.raises(ValueError, match="symmetric"):
        mppi_step(
            cfg, step_fn, stage, terminal, params, MPPIState.init(cfg),
            jnp.zeros(4, jnp.float32), _noise(cfg, params), tick_fn=tick,
        )
