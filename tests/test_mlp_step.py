"""Fused residual-MLP dynamics step (ops/pallas/mlp_step.py) vs the plain
in-graph path (models/learned.py make_residual_fn + models/dynamics.py
residual_dynamics + euler_step) — same numbers, one Pallas launch.

Interpret mode on the CPU mesh; the compiled-kernel path is covered by the
tpu_hw-marked test at the bottom (DMM_TPU_TESTS=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.models import euler_step, unicycle
from dnn_mppi_mpc_tpu.models.dynamics import residual_dynamics
from dnn_mppi_mpc_tpu.models.learned import MLP, Standardizer, make_residual_fn
from dnn_mppi_mpc_tpu.ops.pallas.mlp_step import (
    fold_residual_mlp,
    fused_mlp_apply,
    make_fused_residual_step,
)

DT = 0.05


def _setup(hidden, depth, seed=0, with_scalers=True):
    model = MLP(out_dim=3, hidden=hidden, depth=depth, zero_init_head=False)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 5), jnp.float32))
    rng = np.random.default_rng(seed)
    if with_scalers:
        in_s = Standardizer(
            mean=jnp.asarray(rng.normal(size=5), jnp.float32),
            std=jnp.asarray(rng.uniform(0.5, 2.0, size=5), jnp.float32),
        )
        out_s = Standardizer(
            mean=jnp.asarray(rng.normal(size=3), jnp.float32),
            std=jnp.asarray(rng.uniform(0.5, 2.0, size=3), jnp.float32),
        )
    else:
        in_s = out_s = None
    return model, params, in_s, out_s


def _oracle_step(model, params, in_s, out_s):
    net = make_residual_fn(model, params, in_s, out_s)
    f = residual_dynamics(unicycle, net)
    return lambda x, u: euler_step(f, x, u, DT)


@pytest.mark.parametrize(
    "hidden,depth,K,with_scalers",
    [
        (16, 2, 100, True),  # sub-lane widths + odd K: padding paths
        (128, 2, 256, True),  # the dnn_mppi example's deployment size
        (64, 1, 8, False),  # no scalers, single tanh layer
    ],
)
def test_fused_step_matches_residual_dynamics(hidden, depth, K, with_scalers):
    model, params, in_s, out_s = _setup(hidden, depth, with_scalers=with_scalers)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(K, 2)), jnp.float32)

    want = _oracle_step(model, params, in_s, out_s)(x, u)
    step = make_fused_residual_step(
        unicycle, params, DT, in_s, out_s, interpret=True, block_rows=64
    )
    got = step(x, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-6)


def test_fused_step_broadcasts_leading_batch_dims():
    """num_rollout_repeats>1 hands the step (M, K, nx) batches."""
    model, params, in_s, out_s = _setup(16, 2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 24, 3)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(2, 24, 2)), jnp.float32)
    step = make_fused_residual_step(
        unicycle, params, DT, in_s, out_s, interpret=True, block_rows=16
    )
    got = step(x, u)
    want = _oracle_step(model, params, in_s, out_s)(x, u)
    assert got.shape == (2, 24, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-6)


def test_fused_step_discrete_residual_scale():
    """residual_scale=1: the one-step-error convention of the reference's
    dataset (train/train_diff_mlp.py — errors are next-state deltas, not
    rates), used by examples/dnn_mppi.py's deployment."""
    model, params, in_s, out_s = _setup(32, 2, seed=5)
    net = make_residual_fn(model, params, in_s, out_s)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(40, 2)), jnp.float32)

    want = euler_step(unicycle, x, u, DT) + net(jnp.concatenate([x, u], -1))
    step = make_fused_residual_step(
        unicycle, params, DT, in_s, out_s,
        interpret=True, block_rows=64, residual_scale=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(step(x, u)), np.asarray(want), rtol=3e-5, atol=3e-6
    )


def test_fold_residual_mlp_matches_unfused_net():
    """Scaler/dt folding alone (no Pallas): affine-exact up to reassociation."""
    model, params, in_s, out_s = _setup(32, 2, seed=3)
    net = make_residual_fn(model, params, in_s, out_s)
    ws, bs = fold_residual_mlp(params, in_s, out_s, DT)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(17, 5)), jnp.float32)

    h = feats
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = h @ w + b
        if 1 <= i <= len(ws) - 2:
            h = jnp.tanh(h)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(net(feats)) * DT, rtol=3e-5, atol=3e-6
    )


def test_fused_mlp_apply_shape_validation():
    ws, bs = (jnp.zeros((5, 8)),), (jnp.zeros((8,)),)
    with pytest.raises(AssertionError, match="features"):
        fused_mlp_apply(jnp.zeros((4, 6)), ws, bs, interpret=True)


def test_mppi_tick_with_fused_step_matches_plain():
    """One full MPPI tick (injected noise) with the fused step vs the plain
    residual dynamics — the integration point the kernel exists for."""
    from dnn_mppi_mpc_tpu.config import MPPIConfig, MPPIParams
    from dnn_mppi_mpc_tpu.solvers.mppi import (
        MPPIState,
        make_tracking_costs,
        mppi_step,
    )

    model, params, in_s, out_s = _setup(16, 2, seed=4)
    cfg = MPPIConfig(
        num_samples=32, horizon=6, dim_x=3, dim_u=2, dt=DT, lam=1.0,
        exploration=0.0, filter_window=3, waypoint_search_len=5,
    )
    n_pts = 30
    path = jnp.stack(
        [
            jnp.linspace(0.0, 3.0, n_pts),
            jnp.zeros(n_pts),
            jnp.zeros(n_pts),
        ],
        axis=1,
    ).astype(jnp.float32)
    mparams = MPPIParams(
        sigma=jnp.array([[0.1, 0.0], [0.0, 0.05]], jnp.float32),
        stage_weight=jnp.array([1.0, 1.0, 0.1], jnp.float32),
        terminal_weight=jnp.array([1.0, 1.0, 0.1], jnp.float32),
        u_min=jnp.array([-2.0, -2.0], jnp.float32),
        u_max=jnp.array([2.0, 2.0], jnp.float32),
        ref_path=path,
    )
    stage, terminal = make_tracking_costs(cfg)
    eps = jnp.asarray(
        np.random.default_rng(5).normal(size=(32, 6, 2)) * 0.1, jnp.float32
    )
    x0 = jnp.zeros((3,), jnp.float32)

    plain = _oracle_step(model, params, in_s, out_s)
    fused = make_fused_residual_step(
        unicycle, params, DT, in_s, out_s, interpret=True, block_rows=32
    )
    outs = []
    for step_fn in (plain, fused):
        st = MPPIState.init(cfg)
        u0, _, _ = mppi_step(
            cfg, step_fn, stage, terminal, mparams, st, x0, noise=eps
        )
        outs.append(np.asarray(u0))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-4, atol=1e-5)


@pytest.mark.tpu_hw
@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU hardware"
)
def test_fused_step_compiles_on_tpu(f32_mode):
    """Compiled Mosaic path (DMM_TPU_TESTS=1): parity at f32 on hardware."""
    model, params, in_s, out_s = _setup(128, 2, seed=6)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(1024, 2)), jnp.float32)
    step = make_fused_residual_step(unicycle, params, DT, in_s, out_s)
    got = np.asarray(step(x, u))
    want = np.asarray(_oracle_step(model, params, in_s, out_s)(x, u))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
