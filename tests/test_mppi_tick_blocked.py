"""K-blocked fused tick: parity + online-softmax correctness.

CPU-runnable parts: block-size selection and the engine guards. The kernel
itself is PRNG-mode only (per-block on-chip ε — no CPU lowering), so the
exact-parity checks run under DMM_TPU_TESTS=1 like tests/test_tick_prng.py:

* regenerated-ε exactness — :func:`weighted_noise_reduce` re-derives the same
  per-(seed, block) streams the tick consumed, verified by feeding the
  emitted ε through the scan engine and matching S, w, and w·ε;
* online softmax — ρ/η/w·ε from the running-rescale accumulation equal the
  single-pass values computed from the full S in float32;
* engine integration — ``mppi_step`` with the blocked tick matches the
  scan engine fed the regenerated ε, over a closed loop.
"""

import dataclasses

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
    _pick_k_block,
    make_pallas_diffdrive_tick_blocked,
    make_tracking_costs,
    mppi_step,
)

K, T, DT, W = 2048, 20, 0.05, 8
KB = 1024

on_tpu = jax.devices()[0].platform == "tpu"
# tpu_hw tests run under DMM_TPU_TESTS=1 (conftest skips unmarked tests there
# and tpu_hw ones everywhere else — convention of tests/test_tick_prng.py)


@pytest.fixture(autouse=True)
def _f32_mode():
    """Gridded pallas_call (BlockSpec index maps) fails Mosaic legalization
    under jax_enable_x64 on this jax version ('func.return' legalize error,
    reproduced on a trivial 2-step grid kernel) — scope the suite-wide x64
    flag off here; the blocked kernel and these tests are explicit-f32."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


def _setup(**cfg_kw):
    kw = dict(
        num_samples=K,
        horizon=T,
        dim_x=3,
        dim_u=2,
        dt=DT,
        lam=0.8,
        alpha=0.3,
        exploration=0.2,
        temperature=Temperature.LAMBDA,
        filter=SmoothingFilter.MOVING_AVERAGE_EDGE,
        filter_window=5,
        waypoint_search_len=W,
    )
    kw.update(cfg_kw)
    cfg = MPPIConfig(**kw)
    n = 40
    path = np.stack(
        [
            np.linspace(0, 4, n),
            np.sin(np.linspace(0, 2, n)),
            np.linspace(0.1, 0.5, n),
        ],
        axis=1,
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


def test_pick_k_block():
    assert _pick_k_block(102_400, 50) == 10_240
    assert _pick_k_block(10_240, 50) == 10_240
    assert 16 * 50 * _pick_k_block(204_800, 50) <= 10 * 2**20
    with pytest.raises(ValueError, match="multiple of 1024"):
        _pick_k_block(1000, 50)


def test_blocked_tick_guards():
    cfg, params, step_fn, stage, terminal = _setup()
    with pytest.raises(ValueError, match="num_rollout_repeats"):
        make_pallas_diffdrive_tick_blocked(
            dataclasses.replace(cfg, num_rollout_repeats=2)
        )
    with pytest.raises(ValueError, match="multiple"):
        make_pallas_diffdrive_tick_blocked(cfg, k_block=1536)
    tick = make_pallas_diffdrive_tick_blocked(cfg, k_block=KB)
    state = MPPIState.init(cfg)
    eps = jnp.zeros((K, T, 2), jnp.float32)
    with pytest.raises(ValueError, match="PRNG-mode only"):
        mppi_step(
            cfg, step_fn, stage, terminal, params, state,
            jnp.zeros(3, jnp.float32), eps, tick_fn=tick,
        )


@pytest.mark.tpu_hw
@pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only")
def test_blocked_tick_matches_scan_on_regenerated_noise():
    """Exact parity: blocked-kernel S/w/w·ε equal the scan engine fed the
    kernel's own regenerated ε (the noise-regeneration contract that the
    two-phase sharded tick also relies on)."""
    from dnn_mppi_mpc_tpu.ops.pallas.mppi_tick_blocked import (
        diffdrive_mppi_tick_blocked,
        weighted_noise_reduce,
    )
    from dnn_mppi_mpc_tpu.ops.sampling import sigma_inverse, small_cholesky
    from dnn_mppi_mpc_tpu.ops.waypoints import nearest_waypoint

    cfg, params, step_fn, stage, terminal = _setup(
        filter=SmoothingFilter.NONE, filter_window=1
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(0, 0.3, (T, 2)), jnp.float32)
    x0 = jnp.concatenate(
        [params.ref_path[0, :2], jnp.asarray([0.2], jnp.float32)]
    )
    wp_idx, _ = nearest_waypoint(
        params.ref_path, x0[:2], jnp.zeros((), jnp.int32), W
    )
    start = int(jnp.clip(wp_idx, 0, params.ref_path.shape[0] - W))
    window = params.ref_path[start : start + W, :3]
    a = cfg.gamma * (u @ sigma_inverse(params.sigma))
    chol = small_cholesky(params.sigma)
    seed = jnp.asarray(1234, jnp.int32)

    S, rho, eta, weps = diffdrive_mppi_tick_blocked(
        seed, u, a, chol, x0, window,
        params.stage_weight, params.terminal_weight,
        params.u_min, params.u_max, cfg.dt,
        (1.0 - cfg.exploration) * K, cfg.inv_temperature,
        obstacles=params.obstacles, robot_radius=0.5,
        K=K, T=T, W=W, K_BLK=KB,
    )
    # online ρ/η must equal the one-pass values from the emitted S
    np.testing.assert_allclose(float(rho), float(jnp.min(S)), rtol=1e-6)
    m = np.exp(-cfg.inv_temperature * (np.asarray(S) - float(rho)))
    np.testing.assert_allclose(float(eta), m.sum(), rtol=1e-5)

    w = jnp.exp(-cfg.inv_temperature * (S - rho)) / eta
    weps2, eps = weighted_noise_reduce(
        seed, w, chol, K=K, T=T, K_BLK=KB, emit_eps=True
    )
    np.testing.assert_allclose(
        np.asarray(weps), np.asarray(weps2), rtol=1e-5, atol=1e-6
    )

    state = MPPIState(
        u_prev=u, waypoint_idx=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0)
    )
    _, _, aux = jax.jit(
        lambda p, s, x, n_: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n_)
    )(params, state, x0, eps)
    np.testing.assert_allclose(
        np.asarray(S), np.asarray(aux.costs), rtol=2e-5, atol=2e-4
    )
    wr = np.exp(
        -cfg.inv_temperature * (np.asarray(aux.costs) - np.asarray(aux.costs).min())
    )
    wr = wr / wr.sum()
    np.testing.assert_allclose(np.asarray(w), wr, rtol=1e-4, atol=1e-6)
    we_r = np.einsum("k,ktu->tu", wr, np.asarray(eps))
    np.testing.assert_allclose(
        np.asarray(weps), we_r, rtol=1e-4, atol=1e-5
    )


@pytest.mark.tpu_hw
@pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only")
def test_blocked_tick_closed_loop_tracks():
    """mppi_step with the blocked tick drives the plant toward the path —
    behavioral check of the full engine integration (PRNG noise, so compared
    against tracking-error bounds rather than a twin run)."""
    cfg, params, step_fn, stage, terminal = _setup()
    tick = make_pallas_diffdrive_tick_blocked(cfg, k_block=KB)
    step = jax.jit(
        lambda p, s, x: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, None, tick_fn=tick
        )
    )
    x = jnp.array([0.0, 0.3, 0.1], jnp.float32)
    st = MPPIState.init(cfg)
    d0 = float(jnp.min(jnp.linalg.norm(params.ref_path[:, :2] - x[:2], axis=1)))
    for _ in range(40):
        u0, st, aux = step(params, st, x)
        x = step_fn(x, u0)
    assert bool(jnp.all(jnp.isfinite(x)))
    d1 = float(jnp.min(jnp.linalg.norm(params.ref_path[:, :2] - x[:2], axis=1)))
    assert d1 < max(0.15, d0)  # converged onto the path band


@pytest.mark.tpu_hw
@pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only")
def test_blocked_tick_iso_xy_matches_general():
    """iso_xy=True on symmetric x/y weights equals the general blocked kernel
    at equal seeds (identical ε streams; the cost from the running min
    distance is algebraically identical — sw0·dmin vs sw0·dx²+sw1·dy²)."""
    from dnn_mppi_mpc_tpu.ops.pallas.mppi_tick_blocked import (
        diffdrive_mppi_tick_blocked,
    )
    from dnn_mppi_mpc_tpu.ops.sampling import sigma_inverse, small_cholesky

    cfg, params, step_fn, stage, terminal = _setup(
        filter=SmoothingFilter.NONE, filter_window=1
    )
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(0, 0.3, (T, 2)), jnp.float32)
    x0 = jnp.concatenate(
        [params.ref_path[0, :2], jnp.asarray([0.2], jnp.float32)]
    )
    window = params.ref_path[:W, :3]
    a = cfg.gamma * (u @ sigma_inverse(params.sigma))
    chol = small_cholesky(params.sigma)
    seed = jnp.asarray(77, jnp.int32)

    outs = {}
    for iso in (False, True):
        S, rho, eta, weps = diffdrive_mppi_tick_blocked(
            seed, u, a, chol, x0, window,
            params.stage_weight, params.terminal_weight,
            params.u_min, params.u_max, cfg.dt,
            (1.0 - cfg.exploration) * K, cfg.inv_temperature,
            obstacles=params.obstacles, robot_radius=0.5,
            K=K, T=T, W=W, K_BLK=KB, iso_xy=iso,
        )
        outs[iso] = (np.asarray(S), np.asarray(weps))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-4, atol=1e-5)


def test_blocked_tick_hash_mode_matches_scan_on_cpu():
    """CPU twin of the TPU-only regenerated-noise parity test: with
    gaussian='hash' (counter-based stand-in, same (seed, block) stream
    contract as the hardware PRNG) the blocked kernel runs under interpret
    mode, so the S/ρ/η/w·ε semantics and the phase-2 stream-regeneration
    contract get DIRECT not-slow CI coverage (round-4 weak item: the
    PRNG-path CPU signal was indirect)."""
    from dnn_mppi_mpc_tpu.ops.pallas.mppi_tick_blocked import (
        diffdrive_mppi_tick_blocked,
        weighted_noise_reduce,
    )
    from dnn_mppi_mpc_tpu.ops.sampling import sigma_inverse, small_cholesky
    from dnn_mppi_mpc_tpu.ops.waypoints import nearest_waypoint

    cfg, params, step_fn, stage, terminal = _setup(
        filter=SmoothingFilter.NONE, filter_window=1
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(0, 0.3, (T, 2)), jnp.float32)
    x0 = jnp.concatenate(
        [params.ref_path[0, :2], jnp.asarray([0.2], jnp.float32)]
    )
    wp_idx, _ = nearest_waypoint(
        params.ref_path, x0[:2], jnp.zeros((), jnp.int32), W
    )
    start = int(jnp.clip(wp_idx, 0, params.ref_path.shape[0] - W))
    window = params.ref_path[start : start + W, :3]
    a = cfg.gamma * (u @ sigma_inverse(params.sigma))
    chol = small_cholesky(params.sigma)
    seed = jnp.asarray(1234, jnp.int32)

    S, rho, eta, weps = diffdrive_mppi_tick_blocked(
        seed, u, a, chol, x0, window,
        params.stage_weight, params.terminal_weight,
        params.u_min, params.u_max, cfg.dt,
        (1.0 - cfg.exploration) * K, cfg.inv_temperature,
        obstacles=params.obstacles, robot_radius=0.5,
        K=K, T=T, W=W, K_BLK=KB, gaussian="hash", interpret=True,
    )
    np.testing.assert_allclose(float(rho), float(jnp.min(S)), rtol=1e-6)
    w = jnp.exp(-cfg.inv_temperature * (S - rho)) / eta
    weps2, eps = weighted_noise_reduce(
        seed, w, chol, K=K, T=T, K_BLK=KB, emit_eps=True,
        gaussian="hash", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(weps), np.asarray(weps2), rtol=1e-5, atol=1e-6
    )
    # the scan engine fed the regenerated ε reproduces the kernel's S
    state = MPPIState(
        u_prev=u, waypoint_idx=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0)
    )
    _, _, aux = jax.jit(
        lambda p, s, x, n_: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n_)
    )(params, state, x0, eps)
    np.testing.assert_allclose(
        np.asarray(S), np.asarray(aux.costs), rtol=2e-5, atol=2e-4
    )
