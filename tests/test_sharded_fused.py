"""Two-phase sharded fused MPPI tick (on-chip noise, SURVEY §2.10(a)).

The real kernels are TPU-only (Mosaic PRNG), so coverage is split:

* **virtual-mesh structural test** (CPU, 8 shards) — injects pure-JAX
  ``phase1``/``phase2`` stand-ins honoring the exact contract (deterministic
  per-(seed, offset) noise, local S, local w·ε partial) and asserts the whole
  sharded step — seed derivation, per-shard offsets, pmin/psum collectives,
  tail — equals the single-device scan engine fed the concatenated noise.
* **TPU 1-shard A/B** (tpu_hw) — the real two-phase kernels under shard_map
  on a 1-device mesh vs the single-device blocked tick: identical streams
  (same seed, block offset 0) must give identical outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dnn_mppi_mpc_tpu.config import (
    MPPIConfig,
    MPPIParams,
    SmoothingFilter,
    Temperature,
)
from dnn_mppi_mpc_tpu.models.dynamics import unicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.parallel.sharding import make_sharded_fused_mppi_step
from dnn_mppi_mpc_tpu.solvers.mppi import (
    MPPIState,
    make_tracking_costs,
    mppi_step,
)

K, T, DT, W = 1024, 10, 0.05, 8
on_tpu = jax.devices()[0].platform == "tpu"


def _setup():
    cfg = MPPIConfig(
        num_samples=K, horizon=T, dim_x=3, dim_u=2, dt=DT,
        lam=0.8, alpha=0.3, exploration=0.2,
        temperature=Temperature.LAMBDA,
        filter=SmoothingFilter.MOVING_AVERAGE_EDGE, filter_window=4,
        waypoint_search_len=W,
    )
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
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, DT)
    stage, terminal = make_tracking_costs(cfg)
    return cfg, params, step_fn, stage, terminal


def _fake_noise(seed, offset, local_K, chol):
    """Deterministic per-(seed, offset) colored noise — the stand-in for the
    kernels' per-(seed, block) on-chip streams."""
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(7), seed), offset
    )
    z = jax.random.normal(key, (local_K, T, 2), jnp.float32)
    return z @ chol.T


def _make_fakes(cfg):
    """phase1/phase2 stand-ins implementing the scan engine's semantics."""
    n_exploit = (1.0 - cfg.exploration) * cfg.num_samples

    def rollout_S(eps, u, a, x0, window, params, k_offset):
        local_K = eps.shape[0]
        k_idx = k_offset + jnp.arange(local_K, dtype=jnp.float32)
        exploit = (k_idx < n_exploit)[:, None, None]
        v = jnp.clip(jnp.where(exploit, u[None] + eps, eps), params.u_min, params.u_max)

        def track(x, wgt):
            d = jnp.sum(
                (x[..., None, :2] - window[None, :, :2]) ** 2, axis=-1
            )
            ref = window[jnp.argmin(d, axis=-1)]
            err = x - ref
            return jnp.sum(wgt * err * err, axis=-1)

        def body(carry, v_t):
            x, S = carry
            x = x + jnp.stack(
                [v_t[:, 0] * jnp.cos(x[:, 2]), v_t[:, 0] * jnp.sin(x[:, 2]), v_t[:, 1]],
                axis=-1,
            ) * cfg.dt
            S = S + track(x, params.stage_weight)
            return (x, S), None

        x_init = jnp.broadcast_to(x0, (local_K, 3))
        S = jnp.zeros((local_K,), jnp.float32)
        (x_fin, S), _ = jax.lax.scan(
            body, (x_init, S), jnp.swapaxes(v, 0, 1)
        )
        energy = jnp.einsum("ti,kti->k", a, v)
        return S + energy + track(x_fin, params.terminal_weight)

    def phase1(seed, block_offset, u, a, chol, x0, window, params, k_offset):
        eps = _fake_noise(seed, block_offset, K // _N_SHARDS[0], chol)
        return rollout_S(eps, u, a, x0, window, params, k_offset)

    def phase2(seed, block_offset, w_local, chol):
        eps = _fake_noise(seed, block_offset, K // _N_SHARDS[0], chol)
        return jnp.einsum("k,ktu->tu", w_local, eps)

    return phase1, phase2


_N_SHARDS = [8]  # mutated per test so the fakes know the local size


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_sharded_fused_structure_matches_scan_engine():
    """8 virtual shards with injected phases == single-device scan engine on
    the concatenated noise: validates seed derivation, per-shard offsets,
    ρ/η/w·ε collectives and the shared tail."""
    cfg, params, step_fn, stage, terminal = _setup()
    _N_SHARDS[0] = 8
    phase1, phase2 = _make_fakes(cfg)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("k",))
    sharded = make_sharded_fused_mppi_step(
        cfg, step_fn, mesh, axis="k", phase1=phase1, phase2=phase2
    )
    state = MPPIState.init(cfg)
    x0 = jnp.array([0.05, 0.1, 0.2], jnp.float32)
    u0_s, st_s, aux_s = sharded(params, state, x0)

    # reference: regenerate what the 8 shards drew, run the plain engine
    kd = state.key if not jnp.issubdtype(
        state.key.dtype, jax.dtypes.prng_key
    ) else jax.random.key_data(state.key)
    seed = jax.lax.bitcast_convert_type(kd[0] ^ kd[1], jnp.int32)
    from dnn_mppi_mpc_tpu.ops.sampling import small_cholesky

    chol = small_cholesky(params.sigma)
    eps_full = jnp.concatenate(
        [_fake_noise(seed, i, K // 8, chol) for i in range(8)], axis=0
    )
    u0_r, st_r, aux_r = jax.jit(
        lambda p, s, x, n_: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n_)
    )(params, state, x0, eps_full)

    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_s.u_prev), np.asarray(st_r.u_prev), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aux_s.costs), np.asarray(aux_r.costs), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(aux_s.weights), np.asarray(aux_r.weights), rtol=1e-3, atol=1e-6
    )
    assert int(aux_s.status) == int(aux_r.status)


@pytest.mark.tpu_hw
@pytest.mark.skipif(not on_tpu, reason="Mosaic PRNG is TPU-only")
def test_sharded_fused_real_kernels_one_shard_matches_blocked_tick():
    """Real two-phase kernels under shard_map (1-device mesh) vs the
    single-device blocked tick: same seed + block offset 0 → identical
    streams → identical S, weights, and updated sequence."""
    from dnn_mppi_mpc_tpu.solvers.mppi import make_pallas_diffdrive_tick_blocked

    jax.config.update("jax_enable_x64", False)  # gridded pallas + x64: see
    # tests/test_mppi_tick_blocked.py::_f32_mode
    cfg, params, step_fn, stage, terminal = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("k",))
    sharded = make_sharded_fused_mppi_step(cfg, step_fn, mesh, axis="k")
    state = MPPIState.init(cfg)
    x0 = jnp.array([0.05, 0.1, 0.2], jnp.float32)
    u0_s, st_s, aux_s = sharded(params, state, x0)

    tick = make_pallas_diffdrive_tick_blocked(cfg, k_block=1024)
    u0_r, st_r, aux_r = jax.jit(
        lambda p, s, x: mppi_step(
            cfg, step_fn, stage, terminal, p, s, x, None, tick_fn=tick
        )
    )(params, state, x0)

    np.testing.assert_allclose(
        np.asarray(aux_s.costs), np.asarray(aux_r.costs), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_s.u_prev), np.asarray(st_r.u_prev), rtol=1e-4, atol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_production_phases_interpret_invariance_and_scan_truth():
    """The PRODUCTION kernel pair (blocked tick s_only + weighted_noise_reduce)
    executed off-TPU: gaussian='hash' (counter-hash stand-in, same
    (seed, global block) stream contract as the Mosaic PRNG) under Pallas
    interpret mode. Certifies (a) shard-count invariance of u0 with the
    global block partition pinned via k_blk, and (b) numerical agreement
    with the unsharded scan engine fed the kernels' own regenerated ε —
    the round-4 verdict #4 gap (dryrun ran injected closures, not this code).
    """
    from dnn_mppi_mpc_tpu.ops.pallas.mppi_tick_blocked import (
        weighted_noise_reduce,
    )
    from dnn_mppi_mpc_tpu.ops.sampling import small_cholesky

    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)  # explicit-f32 kernels
    try:
        cfg, params, step_fn, stage, terminal = _setup()
        KB = 128
        state = MPPIState.init(cfg)
        x0 = jnp.array([0.05, 0.1, 0.2], jnp.float32)
        sweep = []
        for n_sh in (2, 4, 8):
            mesh = Mesh(np.asarray(jax.devices()[:n_sh]), ("k",))
            f2 = make_sharded_fused_mppi_step(
                cfg, step_fn, mesh, axis="k",
                gaussian="hash", interpret=True, k_blk=KB,
            )
            u0_s, _, _ = f2(params, state, x0)
            sweep.append(np.asarray(jax.block_until_ready(u0_s)))
        np.testing.assert_allclose(sweep[1], sweep[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(sweep[2], sweep[0], rtol=1e-4, atol=1e-5)

        # scan-engine truth on the kernels' own ε (same seed derivation as
        # the sharded inner: XOR of the carried key words)
        kd = (
            jax.random.key_data(state.key)
            if jnp.issubdtype(state.key.dtype, jax.dtypes.prng_key)
            else state.key
        )
        seed = jax.lax.bitcast_convert_type(kd[0] ^ kd[1], jnp.int32)
        chol = small_cholesky(params.sigma)
        _, eps = weighted_noise_reduce(
            seed, jnp.zeros((K,), jnp.float32), chol, 0,
            K=K, T=T, K_BLK=KB, interpret=True, gaussian="hash",
            emit_eps=True,
        )
        u0_r, _, _ = jax.jit(
            lambda p, s, x, n_: mppi_step(cfg, step_fn, stage, terminal, p, s, x, n_)
        )(params, state, x0, eps)
        np.testing.assert_allclose(
            sweep[0], np.asarray(u0_r), rtol=1e-4, atol=1e-4
        )
    finally:
        jax.config.update("jax_enable_x64", old_x64)
