"""Sample-sharded MPPI on the virtual 8-device CPU mesh must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.parallel.sharding import (
    make_batched_mppi_step,
    make_mesh,
    make_sharded_mppi_step,
)
from dnn_mppi_mpc_tpu.models.dynamics import unicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.solvers.mppi import MPPIState, make_tracking_costs, mppi_step

from test_mppi_parity import _make_pair, DT, K, T


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_unsharded():
    cfg, params, solver, _ = _make_pair()
    # rebuild with K divisible by the 8-device mesh
    import dataclasses

    cfg8 = dataclasses.replace(cfg, num_samples=96)
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg8)

    mesh = make_mesh(("k",))
    sharded = make_sharded_mppi_step(cfg8, step_fn, stage, terminal, mesh)

    rng = np.random.default_rng(5)
    eps = jnp.asarray(
        rng.multivariate_normal(np.zeros(2), np.asarray(params.sigma), size=(96, T)),
        jnp.float32,
    )
    x0 = jnp.array([0.0, 0.0, 0.0])
    state = MPPIState.init(cfg8)

    u0_s, state_s, aux_s = sharded(params, state, x0, eps)
    u0_r, state_r, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(cfg8, step_fn, stage, terminal, p, s, x, n)
    )(params, state, x0, eps)

    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_s.u_prev), np.asarray(state_r.u_prev), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(aux_s.costs), np.asarray(aux_r.costs), rtol=1e-4, atol=1e-5
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_scenario_batched_step():
    cfg, params, _, _ = _make_pair()
    import dataclasses

    cfg_b = dataclasses.replace(cfg, num_samples=64)
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg_b)
    mesh = make_mesh(("batch",))
    step = make_batched_mppi_step(cfg_b, step_fn, stage, terminal, mesh)

    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: MPPIState.init(cfg_b, k))(keys)
    # broadcast params across the batch
    batched_params = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape) if a is not None else None, params
    )
    x0s = jnp.zeros((B, 3))
    u0, new_states, aux = step(batched_params, states, x0s)
    assert u0.shape == (B, 2)
    assert new_states.u_prev.shape == (B, T, 2)
    assert np.all(np.isfinite(np.asarray(u0)))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_scaling_efficiency_on_virtual_mesh():
    """Weak-scaling sanity on the virtual mesh: 8 devices with 8x the samples
    must not cost dramatically more wall-clock than 1 device with K samples.
    (True scaling numbers come from real multi-chip hardware; this guards the
    collective structure — only pmin/psum scalars + one (T,nu) psum per tick.)"""
    import time
    import dataclasses

    cfg, params, _, _ = _make_pair()
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)

    def run(cfg_n, mesh=None):
        stage, terminal = make_tracking_costs(cfg_n)
        if mesh is None:
            step = jax.jit(
                lambda p, s, x, n: mppi_step(cfg_n, step_fn, stage, terminal, p, s, x, n)
            )
        else:
            step = make_sharded_mppi_step(cfg_n, step_fn, stage, terminal, mesh)
        state = MPPIState.init(cfg_n)
        x0 = jnp.zeros(3)
        out = step(params, state, x0, None)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = step(params, state, x0, None)
        jax.block_until_ready(out[0])
        return (time.perf_counter() - t0) / 5

    K1 = 2048
    cfg1 = dataclasses.replace(cfg, num_samples=K1)
    cfg8 = dataclasses.replace(cfg, num_samples=K1 * 8)
    t1 = run(cfg1)
    t8 = run(cfg8, make_mesh(("k",)))
    # Weak scaling: 8x the work sharded over 8 virtual devices must not cost
    # more than the serial 8x plus the legitimate core-oversubscription factor
    # (8 virtual devices time-slice os.cpu_count() cores) — a serialized /
    # non-overlapping collective layout lands well beyond that. (Wall-clock on
    # shared cores is noisy; the structural guard below is the real check.)
    import os

    oversub = max(1.0, 8.0 / (os.cpu_count() or 1))
    assert t8 < t1 * 7 * oversub, (t1, t8, oversub)

    # Structural guard (load-independent): the sharded tick must compile to a
    # handful of scalar/(T,nu) cross-device reductions — ρ (pmin), η (psum),
    # w·ε (psum) — not per-sample communication. A layout regression that
    # gathers the K dimension would add large all-gathers/all-reduces.
    stage, terminal = make_tracking_costs(cfg8)
    step = make_sharded_mppi_step(cfg8, step_fn, stage, terminal, make_mesh(("k",)))
    hlo = jax.jit(step).lower(
        params, MPPIState.init(cfg8), jnp.zeros(3), None
    ).compile().as_text()
    n_ar = hlo.count("all-reduce")
    assert 0 < n_ar <= 8, f"unexpected collective structure: {n_ar} all-reduces"
    assert "all-to-all" not in hlo


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pallas_rollout_matches_unsharded():
    """Pallas rollout under shard_map (interpret mode on CPU): the global
    exploration-split offset must make sharded == unsharded."""
    import dataclasses

    from dnn_mppi_mpc_tpu.solvers.mppi import make_pallas_diffdrive_rollout

    cfg, params, _, _ = _make_pair()
    cfg8 = dataclasses.replace(cfg, num_samples=2048, exploration=0.25)
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg8)
    rollout = make_pallas_diffdrive_rollout(cfg8, interpret=True)

    mesh = make_mesh(("k",))
    sharded = make_sharded_mppi_step(
        cfg8, step_fn, stage, terminal, mesh, rollout_fn=rollout
    )
    rng = np.random.default_rng(9)
    eps = jnp.asarray(
        rng.multivariate_normal(np.zeros(2), np.asarray(params.sigma), (2048, T)),
        jnp.float32,
    )
    x0 = jnp.zeros(3)
    state = MPPIState.init(cfg8)

    u0_s, state_s, aux_s = sharded(params, state, x0, eps)
    u0_r, state_r, aux_r = jax.jit(
        lambda p, s, x, n: mppi_step(
            cfg8, step_fn, stage, terminal, p, s, x, n, rollout_fn=rollout
        )
    )(params, state, x0, eps)
    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(aux_s.costs), np.asarray(aux_r.costs), rtol=1e-4, atol=1e-4
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sharded_nmpc_fleet_matches_unsharded(backend):
    """A mesh-sharded NMPC fleet (fleet axis partitioned over devices, zero
    collectives) must equal the single-device vmapped fleet exactly —
    SURVEY §2.10(c) at pod scale. shard_map (per-device program, not GSPMD)
    means the pallas backend keeps the lane-batched fused QP kernel on each
    shard — the fleet-serving production path."""
    from dnn_mppi_mpc_tpu.config import SQPConfig
    from dnn_mppi_mpc_tpu.models.dynamics import unicycle as uni
    from dnn_mppi_mpc_tpu.parallel.sharding import make_sharded_nmpc_fleet
    from dnn_mppi_mpc_tpu.solvers.sqp import NMPCSolver, NMPCState, OCPParams

    cfg = SQPConfig(
        N=8, dim_x=3, dim_u=2, dt=0.1, sqp_iters=2, qp_iters=8,
        qp_backend=backend,
    )
    solver = NMPCSolver(cfg, uni)
    B = 8
    rng = np.random.default_rng(5)
    goals = jnp.asarray(
        np.concatenate([rng.uniform(-2, 2, (B, 2)), np.zeros((B, 1))], axis=1),
        jnp.float32,
    )

    def make_params(goal):
        return OCPParams(
            Q=jnp.diag(jnp.array([10.0, 10.0, 0.1])),
            R=jnp.diag(jnp.array([0.5, 0.05])),
            Qe=jnp.diag(jnp.array([10.0, 10.0, 0.1])),
            yref=jnp.concatenate([goal, jnp.zeros(2)])[None, :].repeat(8, axis=0),
            yref_e=goal,
            lbx=jnp.full(3, -10.0),
            ubx=jnp.full(3, 10.0),
            lbu=jnp.full(2, -1.0),
            ubu=jnp.full(2, 1.0),
        )

    bparams = jax.vmap(make_params)(goals)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)), jnp.float32)
    bstates = jax.vmap(lambda x: NMPCState.init(cfg, x))(x0s)

    mesh = make_mesh(("batch",))
    sharded = make_sharded_nmpc_fleet(solver, mesh, axis="batch")
    u_s, st_s, aux_s = sharded(bparams, bstates, x0s)
    u_r, st_r, aux_r = solver.batched_solve()(bparams, bstates, x0s)
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(aux_s.X), np.asarray(aux_r.X), rtol=1e-5, atol=1e-6
    )
    # the fleet really is partitioned: each device holds B/8 problems
    shard_devs = {s.device for s in u_s.addressable_shards}
    assert len(shard_devs) == 8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("per_member_path", [False, True])
def test_sharded_mppi_fleet_matches_unsharded(per_member_path):
    """A mesh-sharded MPPI fleet (fleet axis partitioned over devices, zero
    collectives) must equal the single-device vmapped fleet exactly —
    SURVEY §2.10(b) scenario parallelism at pod scale. On TPU the same
    builder with fused=True keeps the lane-batched fused fleet tick on each
    shard (tests/test_fleet_tick.py pins per-member kernel parity)."""
    import dataclasses

    from dnn_mppi_mpc_tpu.parallel.sharding import make_sharded_mppi_fleet

    cfg, params, _, _ = _make_pair()
    cfg = dataclasses.replace(cfg, num_samples=64)
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg)
    B = 8

    if per_member_path:
        # each member tracks its own rotated copy of the reference path
        angles = jnp.linspace(0.0, 0.6, B)

        def rotate(path, a):
            c, s = jnp.cos(a), jnp.sin(a)
            xy = path[:, :2] @ jnp.array([[c, s], [-s, c]])
            return jnp.concatenate([xy, path[:, 2:] + a], axis=1)

        params = dataclasses.replace(
            params, ref_path=jax.vmap(lambda a: rotate(params.ref_path, a))(angles)
        )

    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(
        np.concatenate([rng.uniform(-0.5, 0.5, (B, 2)), np.zeros((B, 1))], 1),
        jnp.float32,
    )

    mesh = make_mesh(("batch",))
    sharded = make_sharded_mppi_fleet(
        cfg, step_fn, stage, terminal, mesh, axis="batch"
    )
    u_s, st_s, aux_s = sharded(params, states, x0s)

    # single-device reference: per-member mppi_step on the same keys
    def one(p_ref, s, x):
        p = dataclasses.replace(params, ref_path=p_ref)
        return mppi_step(cfg, step_fn, stage, terminal, p, s, x, None)

    ref_paths = (
        params.ref_path
        if per_member_path
        else jnp.broadcast_to(params.ref_path, (B,) + params.ref_path.shape)
    )
    u_r, st_r, aux_r = jax.vmap(one)(ref_paths, states, x0s)

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_s.u_prev), np.asarray(st_r.u_prev), rtol=1e-5, atol=1e-6
    )
    # the fleet really is partitioned: each device holds B/8 members
    shard_devs = {s.device for s in u_s.addressable_shards}
    assert len(shard_devs) == 8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_mppi_fleet_divisibility_error():
    import dataclasses

    from dnn_mppi_mpc_tpu.parallel.sharding import make_sharded_mppi_fleet

    cfg, params, _, _ = _make_pair()
    cfg = dataclasses.replace(cfg, num_samples=64)
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg)
    mesh = make_mesh(("batch",))
    step = make_sharded_mppi_fleet(cfg, step_fn, stage, terminal, mesh, axis="batch")
    B = 6  # not divisible by 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    with pytest.raises(ValueError, match="divisible"):
        step(params, states, jnp.zeros((B, 3), jnp.float32))
