"""Round-5 lean fused-tick modes (TPU hardware; PRNG-mode kernels).

``lean`` moves the XLA prologue/epilogue remnants of the flagship tick
in-kernel (seed chain, scalar packing, Cholesky/Σ⁻¹, energy rows) and
unlocks three further levers: the vectorized lane-anchor fold
(``fold_anchor`` via masked lane-min + pltpu.roll), the 3-word popcount
Gaussian (``gaussian="popcount3"``) and the incremental-rotation sincos
(``sincos="rot"``). These tests pin them against the classic kernel:

* lean vs classic on IDENTICAL streams must match to ~1 ulp (the lean
  kernel's in-kernel seed = xor of the key words = the classic XLA seed;
  the adjugate Σ⁻¹ differs from the Cholesky route by ~1 ulp);
* the in-kernel Weyl key advance must equal the XLA advance;
* the lane-anchor fold must track the classic tick-level anchor exactly as
  the state marches down the path;
* popcount3 ε moments (mean/var/corr) on hardware;
* sincos="rot" agrees with the polynomial pair to rollout-precision at a
  moderate softmax temperature (the flagship's λ⁻¹ = 10⁴ is effectively
  argmax, where ulp-level cost changes legitimately switch the winning
  sample — checked separately as closed-loop equivalence-in-distribution).
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
    MPPISolver,
    make_pallas_diffdrive_tick,
)

on_tpu = jax.devices()[0].platform == "tpu"
pytestmark = [
    pytest.mark.tpu_hw,
    pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only"),
]

K, T, DT, W = 2048, 30, 0.05, 12


@pytest.fixture(autouse=True)
def _f32_mode():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


def _setup(lam=1.0, exploration=1e-4):
    cfg = MPPIConfig(
        num_samples=K, horizon=T, dim_x=3, dim_u=2, dt=DT,
        lam=lam, alpha=0.3, exploration=exploration,
        temperature=Temperature.LAMBDA,
        filter=SmoothingFilter.MOVING_AVERAGE_EDGE, filter_window=6,
        waypoint_search_len=W,
    )
    n = 60
    path = np.stack(
        [np.linspace(0, 6, n), 0.4 * np.sin(np.linspace(0, 3, n)),
         np.linspace(0.0, 0.5, n)], axis=1,
    ).astype(np.float32)
    params = MPPIParams(
        sigma=jnp.array([[0.08, 0.01], [0.01, 0.05]], jnp.float32),
        stage_weight=jnp.array([4.0, 4.0, 1.5], jnp.float32),
        terminal_weight=jnp.array([6.0, 6.0, 2.0], jnp.float32),
        u_min=jnp.array([-2.0, -1.5], jnp.float32),
        u_max=jnp.array([2.0, 1.5], jnp.float32),
        ref_path=jnp.asarray(path),
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    from dnn_mppi_mpc_tpu.solvers.mppi import make_tracking_costs

    return cfg, params, step_fn, make_tracking_costs(cfg)


def _solver(cfg, params, step_fn, costs, **kw):
    tick = make_pallas_diffdrive_tick(cfg, fuse_epilogue=True, iso_xy=True, **kw)
    return MPPISolver(cfg, step_fn, *costs, tick_fn=tick, iso_xy=True)


def test_lean_matches_classic_same_streams():
    """Same carried key → same hardware streams → lean must reproduce the
    classic kernel's u0/state to within 1-2 ulp (the in-kernel seed-xor and
    Weyl advance are bit-twins of the XLA chain; the only arithmetic
    difference is the in-kernel adjugate Σ⁻¹ vs XLA's Cholesky-route
    sigma_inverse, ~1 ulp on a non-diagonal Σ)."""
    cfg, params, step_fn, costs = _setup()
    sa = _solver(cfg, params, step_fn, costs, lean=False)
    sb = _solver(cfg, params, step_fn, costs, lean=True)
    x = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    st_a, st_b = sa.init(), sb.init()
    for _ in range(20):
        ua, st_a, _ = sa.step(params, st_a, x)
        ub, st_b, _ = sb.step(params, st_b, x)
        np.testing.assert_allclose(
            np.asarray(ua), np.asarray(ub), rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st_a.u_prev), np.asarray(st_b.u_prev), rtol=0, atol=1e-6
        )
        ka = np.asarray(jax.random.key_data(st_a.key)) if jnp.issubdtype(
            st_a.key.dtype, jax.dtypes.prng_key) else np.asarray(st_a.key)
        kb = np.asarray(jax.random.key_data(st_b.key)) if jnp.issubdtype(
            st_b.key.dtype, jax.dtypes.prng_key) else np.asarray(st_b.key)
        np.testing.assert_array_equal(ka, kb)
        x = step_fn(x, ua)


def test_lane_anchor_fold_tracks_classic_anchor():
    """March the measured state along the path: the lane-anchor fold's
    in-kernel advance must equal the classic XLA nearest_waypoint at every
    tick, and the whole tick must stay bit-identical (same streams)."""
    cfg, params, step_fn, costs = _setup()
    sa = _solver(cfg, params, step_fn, costs, lean=True, fold_anchor=False)
    sb = _solver(cfg, params, step_fn, costs, lean=True, fold_anchor=True)
    st_a, st_b = sa.init(), sb.init()
    path = np.asarray(params.ref_path)
    advanced = 0
    for i in range(0, 55, 1):
        # ride the path with some lateral noise (forces real window searches)
        x = jnp.asarray(
            path[i] + np.array([0.03 * np.sin(i), 0.05 * np.cos(2 * i), 0.1]),
            jnp.float32,
        )
        ua, st_a, auxa = sa.step(params, st_a, x)
        ub, st_b, auxb = sb.step(params, st_b, x)
        assert int(st_a.waypoint_idx) == int(st_b.waypoint_idx), i
        assert int(auxa.status) == int(auxb.status)
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
        if int(st_b.waypoint_idx) > advanced:
            advanced = int(st_b.waypoint_idx)
    assert advanced > 30  # the anchor really marched down the path
    # end-of-path status fires identically (wp reaches P-1)
    x_end = jnp.asarray(path[-1] + np.array([0.01, 0.0, 0.0]), jnp.float32)
    _, st_a, auxa = sa.step(params, st_a, x_end)
    _, st_b, auxb = sb.step(params, st_b, x_end)
    assert int(auxa.status) == int(auxb.status) == 1


def test_popcount3_moments_and_pair_independence():
    """The 3-word popcount Gaussian: exact-moment construction still holds
    (mean 0, var 1, |corr(z0, z1)| tiny) when the two smoothing uniforms
    share one rotated word."""
    from dnn_mppi_mpc_tpu.ops.pallas.mppi_tick import diffdrive_mppi_tick
    from dnn_mppi_mpc_tpu.ops.sampling import small_cholesky

    cfg, params, step_fn, costs = _setup()
    chol = small_cholesky(jnp.eye(2, dtype=jnp.float32))  # identity → raw z
    u = jnp.zeros((T, 2), jnp.float32)
    out = diffdrive_mppi_tick(
        jnp.asarray(7, jnp.int32), u, u, chol,
        jnp.zeros(3, jnp.float32), params.ref_path[:W, :3],
        params.stage_weight, params.terminal_weight,
        params.u_min, params.u_max, DT,
        float(K), 1.0,
        emit_eps=True, K=K, T=T, W=W, gaussian="popcount3",
    )
    eps = np.asarray(out[-1])  # (K, T, 2) raw normals (identity Σ)
    z0, z1 = eps[..., 0].ravel(), eps[..., 1].ravel()
    for z in (z0, z1):
        assert abs(z.mean()) < 0.01, z.mean()
        assert abs(z.std() - 1.0) < 0.01, z.std()
        assert abs(((z - z.mean()) ** 3).mean()) < 0.02  # skew
    corr = np.corrcoef(z0, z1)[0, 1]
    assert abs(corr) < 0.01, corr


def test_sincos_rot_matches_poly_at_moderate_temperature():
    """At λ = 1 (a genuinely mixing softmax) the incremental-rotation sincos
    must give the same weighted update as the polynomial pair to rollout
    precision — same streams, so the only difference is the ~1e-7 angular
    drift of the rotation recurrence."""
    cfg, params, step_fn, costs = _setup(lam=1.0)
    sa = _solver(cfg, params, step_fn, costs, lean=True, fold_anchor=True,
                 sincos="poly")
    sb = _solver(cfg, params, step_fn, costs, lean=True, fold_anchor=True,
                 sincos="rot")
    x = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    st_a, st_b = sa.init(), sb.init()
    for _ in range(10):
        ua, st_a, auxa = sa.step(params, st_a, x)
        ub, st_b, auxb = sb.step(params, st_b, x)
        np.testing.assert_allclose(
            np.asarray(auxa.costs), np.asarray(auxb.costs), rtol=2e-4, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(ua), np.asarray(ub), rtol=1e-3, atol=2e-4
        )
        x = step_fn(x, ua)
