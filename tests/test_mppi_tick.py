"""Parity tests for the fully-fused MPPI tick kernel (ops/pallas/mppi_tick.py).

The ε-injection mode runs the kernel's exact compute path in the CPU
interpreter and must reproduce the scan engine (solvers/mppi.py) bit-closely:
costs S, softmax weights w, the weighted-noise sequence, and the full tick
output (u0, shifted nominal sequence). The on-chip PRNG path is TPU-only and
covered by tests in examples/bench (statistical + self-consistency); here we
verify everything around it.
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
from dnn_mppi_mpc_tpu.models.dynamics import unicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.solvers.mppi import (
    MPPIState,
    make_pallas_diffdrive_tick,
    make_tracking_costs,
    mppi_step,
)

K, T, DT = 512, 12, 0.05


def _setup(obstacles=False, exploration=0.2, last=False):
    cfg = MPPIConfig(
        num_samples=K,
        horizon=T,
        dim_x=3,
        dim_u=2,
        dt=DT,
        lam=0.8,
        alpha=0.3,
        exploration=exploration,
        temperature=Temperature.LAMBDA,
        accumulation=CostAccumulation.LAST if last else CostAccumulation.SUM,
        filter=SmoothingFilter.MOVING_AVERAGE_EDGE,
        filter_window=5,
        waypoint_search_len=8,
        compute_optimal_traj=True,  # compared tick-vs-scan below
    )
    n = 40
    path = np.stack(
        [
            np.linspace(0.0, 4.0, n),
            np.sin(np.linspace(0.0, 2.0, n)),
            np.linspace(0.1, 0.5, n),
        ],
        axis=1,
    ).astype(np.float32)
    params = MPPIParams(
        sigma=jnp.array([[0.2, 0.05], [0.05, 0.1]], jnp.float32),
        stage_weight=jnp.array([4.0, 4.0, 0.5], jnp.float32),
        terminal_weight=jnp.array([9.0, 9.0, 2.0], jnp.float32),
        u_min=jnp.array([-1.5, -2.0], jnp.float32),
        u_max=jnp.array([1.5, 2.0], jnp.float32),
        ref_path=jnp.asarray(path),
        obstacles=(
            jnp.array([[1.0, 0.4, 0.3], [2.5, 0.8, 0.4]], jnp.float32)
            if obstacles
            else None
        ),
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(
        cfg, collision="circle" if obstacles else "none", robot_radius=0.5
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
@pytest.mark.parametrize("last", [False, True])
def test_tick_kernel_matches_scan_engine(obstacles, last):
    cfg, params, step_fn, stage, terminal = _setup(obstacles=obstacles, last=last)
    eps = _noise(cfg, params)
    x0 = jnp.array([0.1, -0.05, 0.2], jnp.float32)
    state = MPPIState.init(cfg)
    # advance the nominal sequence so u ≠ 0 exercises the energy term
    state = MPPIState(
        u_prev=jnp.asarray(
            np.random.default_rng(0).normal(0, 0.3, (T, 2)), jnp.float32
        ),
        waypoint_idx=state.waypoint_idx,
        key=state.key,
    )

    tick = make_pallas_diffdrive_tick(cfg, robot_radius=0.5, interpret=True)
    u0_t, st_t, aux_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )(params, state, x0, eps)
    u0_r, st_r, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )(params, state, x0, eps)

    np.testing.assert_allclose(
        np.asarray(aux_t.costs), np.asarray(aux_r.costs), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux_t.weights), np.asarray(aux_r.weights), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(u0_t), np.asarray(u0_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_t.u_prev), np.asarray(st_r.u_prev), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_t.optimal_traj),
        np.asarray(aux_r.optimal_traj),
        rtol=1e-4,
        atol=1e-5,
    )


def test_tick_kernel_exploration_split():
    """Global exploration split: pure-noise samples must differ from exploit
    samples exactly as in the scan engine."""
    cfg, params, step_fn, stage, terminal = _setup(exploration=0.5)
    eps = _noise(cfg, params, seed=11)
    x0 = jnp.zeros(3, jnp.float32)
    state = MPPIState.init(cfg)
    state = dataclasses.replace(
        state, u_prev=jnp.full((T, 2), 0.4, jnp.float32)
    )

    tick = make_pallas_diffdrive_tick(cfg, interpret=True)
    _, _, aux_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )(params, state, x0, eps)
    _, _, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )(params, state, x0, eps)
    np.testing.assert_allclose(
        np.asarray(aux_t.costs), np.asarray(aux_r.costs), rtol=2e-4, atol=2e-4
    )


def test_tick_closed_loop_matches_scan():
    """15-tick closed loop with injected noise per tick: trajectories match."""
    cfg, params, step_fn, stage, terminal = _setup()
    tick = make_pallas_diffdrive_tick(cfg, interpret=True)
    step_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )
    step_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )
    x_t = x_r = jnp.array([0.0, 0.2, 0.0], jnp.float32)
    st_t = st_r = MPPIState.init(cfg)
    for i in range(15):
        eps = _noise(cfg, params, seed=100 + i)
        u_t, st_t, _ = step_t(params, st_t, x_t, eps)
        u_r, st_r, _ = step_r(params, st_r, x_r, eps)
        x_t = step_fn(x_t, u_t)
        x_r = step_fn(x_r, u_r)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_r), rtol=1e-3, atol=1e-4)


def test_tick_guards():
    cfg, params, step_fn, stage, terminal = _setup()
    with pytest.raises(ValueError, match="num_rollout_repeats"):
        make_pallas_diffdrive_tick(
            dataclasses.replace(cfg, num_rollout_repeats=3)
        )


def _compare_tick_vs_scan(cfg, params, step_fn, stage, terminal, tick, seed=3):
    eps = _noise(cfg, params, seed=seed)
    x0 = jnp.array([0.1, -0.05, 0.2], jnp.float32)
    state = MPPIState.init(cfg)
    u0_t, st_t, aux_t = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )(params, state, x0, eps)
    u0_r, st_r, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n)
    )(params, state, x0, eps)
    np.testing.assert_allclose(
        np.asarray(aux_t.costs), np.asarray(aux_r.costs), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux_t.weights), np.asarray(aux_r.weights), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(u0_t), np.asarray(u0_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_t.u_prev), np.asarray(st_r.u_prev), rtol=1e-4, atol=1e-5
    )


def test_tick_kernel_moving_obstacles_matches_scan():
    """In-rollout obstacle drift (vel·t·dt in stage, initial at terminal —
    test_mppi_diff_obs.py:17-20 semantics) in the circle collision mode."""
    cfg, params, step_fn, stage, terminal = _setup(obstacles=True)
    params = dataclasses.replace(
        params,
        obstacle_velocities=jnp.array([[0.8, -0.5], [-0.6, 0.4]], jnp.float32),
    )
    tick = make_pallas_diffdrive_tick(cfg, robot_radius=0.5, interpret=True)
    _compare_tick_vs_scan(cfg, params, step_fn, stage, terminal, tick)


@pytest.mark.parametrize("moving", [False, True])
def test_tick_kernel_goal_seeking_soft_matches_scan(moving):
    """The pytorch_mppi goal-seeking family fused: single-goal window (W=1),
    soft exponential obstacle cost, optional in-rollout obstacle motion
    (presets.goal_seeking_mppi / test_mppi_diff_obs.py:631-667)."""
    from dnn_mppi_mpc_tpu.config import SmoothingFilter, Temperature

    cfg = MPPIConfig(
        num_samples=K,
        horizon=T,
        dim_x=3,
        dim_u=2,
        dt=DT,
        lam=1.0,
        alpha=1.0,
        exploration=0.0,
        temperature=Temperature.LAMBDA,
        filter=SmoothingFilter.SAVGOL,
        filter_window=min(11, T),
        savgol_polyorder=3,
        waypoint_search_len=1,
    )
    params = MPPIParams(
        sigma=jnp.array([[0.5, 0.0], [0.0, 0.3]], jnp.float32),
        stage_weight=jnp.array([30.0, 5.0, 9.0], jnp.float32),
        terminal_weight=jnp.array([30.0, 5.0, 9.0], jnp.float32),
        u_min=jnp.array([-2.0, -2.0], jnp.float32),
        u_max=jnp.array([2.0, 2.0], jnp.float32),
        ref_path=jnp.array([[3.0, 2.0, 0.0]], jnp.float32),
        obstacles=jnp.array([[1.2, 0.9, 0.3], [2.2, 1.6, 0.4]], jnp.float32),
        obstacle_velocities=(
            jnp.array([[0.5, 0.3], [-0.4, 0.2]], jnp.float32) if moving else None
        ),
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(
        cfg, collision="soft", soft_safety_distance=2.0, soft_weight=100.0
    )
    tick = make_pallas_diffdrive_tick(
        cfg,
        interpret=True,
        collision="soft",
        soft_safety_distance=2.0,
        soft_weight=100.0,
    )
    _compare_tick_vs_scan(cfg, params, step_fn, stage, terminal, tick)


@pytest.mark.parametrize("filt", ["ma_edge", "savgol", "none"])
def test_tick_fused_epilogue_matches_scan(filt):
    """fuse_epilogue=True: the in-kernel filter matmul + nominal update +
    finite-hold + horizon shift must reproduce the XLA tail exactly (the
    round-2 verdict #4 epilogue fusion)."""
    cfg, params, step_fn, stage, terminal = _setup(obstacles=True)
    cfg = dataclasses.replace(
        cfg,
        filter=SmoothingFilter(filt),
        filter_window=5 if filt != "none" else 1,
        compute_optimal_traj=True,
    )
    tick = make_pallas_diffdrive_tick(cfg, interpret=True, fuse_epilogue=True)
    assert tick.fused_epilogue
    _compare_tick_vs_scan(cfg, params, step_fn, stage, terminal, tick)


def test_tick_fused_epilogue_nonfinite_holds_previous():
    """A non-finite update (NaN nominal sequence → NaN u_new) must hold the
    previous sequence and set status bit 2 — the warn-and-continue failure
    semantics of SURVEY §5.3, now applied inside the kernel."""
    cfg, params, step_fn, stage, terminal = _setup()
    tick = make_pallas_diffdrive_tick(cfg, interpret=True, fuse_epilogue=True)
    eps = _noise(cfg, params, seed=9)
    bad = eps.at[0, 0, 0].set(jnp.nan)
    state = MPPIState.init(cfg)
    x0 = jnp.array([0.1, -0.05, 0.2], jnp.float32)
    u0, st, aux = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
        )
    )(params, state, x0, bad)
    assert int(aux.status) & 2
    np.testing.assert_allclose(
        np.asarray(st.u_prev),
        np.concatenate(
            [np.asarray(state.u_prev)[1:], np.asarray(state.u_prev)[-1:]]
        ),
    )


def test_tick_iso_xy_matches_scan():
    """iso_xy=True (symmetric x/y tracking weights → cost from the min
    distance directly, rx/ry select chains eliminated) must match the scan
    engine exactly — the flagship-bench specialization."""
    cfg, params, step_fn, stage, terminal = _setup(obstacles=True)
    # _setup weights are (3,3,1)/(5,5,2): x/y-symmetric by construction
    tick = make_pallas_diffdrive_tick(
        cfg, interpret=True, fuse_epilogue=True, iso_xy=True
    )
    _compare_tick_vs_scan(cfg, params, step_fn, stage, terminal, tick)


def test_tick_sincos_poly_matches_native():
    """sincos="poly" (ops/pallas/mathx.py) must agree with the native
    transcendentals to f32 tolerance — same kernel, same injected ε. Poly is
    the DEFAULT (sync-mode interleaved A/B measured it ~21% faster at the
    flagship shape, docs/PERF.md); "native" remains available for hardware
    where the balance differs."""
    cfg, params, step_fn, stage, terminal = _setup(obstacles=True)
    eps = _noise(cfg, params)
    x0 = jnp.array([0.1, -0.05, 2.8], jnp.float32)  # yaw near the π/2·k seam
    state = MPPIState.init(cfg)

    outs = {}
    for mode in ("native", "poly"):
        tick = make_pallas_diffdrive_tick(
            cfg, robot_radius=0.5, interpret=True, sincos=mode
        )
        outs[mode] = jax.jit(
            lambda p, s, x, n, tick=tick: mppi_step(
                cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
            )
        )(params, state, x0, eps)

    u0_n, st_n, aux_n = outs["native"]
    u0_p, st_p, aux_p = outs["poly"]
    np.testing.assert_allclose(
        np.asarray(aux_p.costs), np.asarray(aux_n.costs), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(u0_p), np.asarray(u0_n), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_p.u_prev), np.asarray(st_n.u_prev), rtol=1e-5, atol=1e-5
    )


def test_sincos_poly_accuracy():
    """Standalone |err| bound of the polynomial over ±100 rad (covers any
    unwrapped-yaw rollout)."""
    from dnn_mppi_mpc_tpu.ops.pallas.mathx import sincos_poly

    x = np.random.default_rng(0).uniform(-100, 100, 100_000).astype(np.float32)
    s, c = sincos_poly(jnp.asarray(x))
    assert np.abs(np.asarray(s) - np.sin(x.astype(np.float64))).max() < 3e-7
    assert np.abs(np.asarray(c) - np.cos(x.astype(np.float64))).max() < 3e-7


def test_tick_fold_anchor_matches_baseline():
    """fold_anchor=True (in-kernel tick-level anchor search + window gather,
    an off-by-default A/B mode — docs/PERF.md) must match the baseline tick
    per tick AND advance state.waypoint_idx identically, including the
    path-end window clip. Pins the flag-dependent positional output protocol
    (prev SMEM input / anchor SMEM output) against silent reorders."""
    cfg, params, step_fn, stage, terminal = _setup(obstacles=True)
    eps = _noise(cfg, params)
    state = MPPIState.init(cfg)

    def run(fold, x0, wp0):
        tick = make_pallas_diffdrive_tick(
            cfg, robot_radius=0.5, interpret=True, fold_anchor=fold
        )
        st = MPPIState(
            u_prev=state.u_prev, waypoint_idx=jnp.int32(wp0), key=state.key
        )
        return jax.jit(
            lambda p, s, x, n, tick=tick: mppi_step(
                cfg, step_fn, stage, terminal, p, s, x, n, tick_fn=tick
            )
        )(params, st, x0, eps)

    # mid-path anchor and a state near the path end (window start clips to
    # P - W; nearest_waypoint clips the SEARCH start to P - span too)
    P = params.ref_path.shape[0]
    cases = [
        (jnp.array([0.6, 0.35, 0.1], jnp.float32), 3),
        (jnp.asarray(params.ref_path[-1, :3]), P - 2),
    ]
    for x0, wp0 in cases:
        u0_f, st_f, aux_f = run(True, x0, wp0)
        u0_b, st_b, aux_b = run(False, x0, wp0)
        np.testing.assert_array_equal(
            np.asarray(st_f.waypoint_idx), np.asarray(st_b.waypoint_idx)
        )
        np.testing.assert_allclose(
            np.asarray(aux_f.costs), np.asarray(aux_b.costs), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(u0_f), np.asarray(u0_b), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st_f.u_prev), np.asarray(st_b.u_prev), rtol=1e-5, atol=1e-6
        )
