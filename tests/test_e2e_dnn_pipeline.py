"""Flagship end-to-end DNN-NMPC pipeline (SURVEY §3.5, BASELINE config 4).

Replicates the reference's data → train → deploy chain entirely on-device:
  1. collect residual-error data by driving the *nominal*-model NMPC on a
     plant with systematic model error (train/bullet_mpc_differential_drive.py)
  2. train the MLP residual with in-graph scalers (train/train_diff_mlp.py)
  3. close the loop with NMPC over analytic+MLP dynamics — the l4casadi path
     (simulation/bullet_differential_drive_dnn.py) with zero library boundaries
and asserts the learned model explains the plant's residual >3x better than
the nominal model while the deployed DNN-NMPC loop reaches the goal.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.config import SQPConfig
from dnn_mppi_mpc_tpu.envs.closed_loop import collect_residual_dataset, run_closed_loop
from dnn_mppi_mpc_tpu.models.dynamics import residual_dynamics, unicycle
from dnn_mppi_mpc_tpu.models.integrators import erk_step, euler_step
from dnn_mppi_mpc_tpu.models.learned import MLP, make_residual_fn
from dnn_mppi_mpc_tpu.solvers.sqp import NMPCSolver, OCPParams
from dnn_mppi_mpc_tpu.train.training import TrainConfig, train_residual_model

DT = 0.1
N = 10


def _true_dynamics(x, u):
    """The 'real robot': wheel-scale mismatch + yaw-dependent drift the
    nominal unicycle model doesn't know about."""
    v_eff = 0.8 * u[..., 0]
    w_eff = 0.9 * u[..., 1] + 0.08 * u[..., 0]
    yaw = x[..., 2]
    return jnp.stack(
        [v_eff * jnp.cos(yaw), v_eff * jnp.sin(yaw), w_eff], axis=-1
    )


def _nmpc_params(goal):
    return OCPParams(
        Q=jnp.diag(jnp.array([10.0, 10.0, 0.5])),
        R=jnp.diag(jnp.array([0.2, 0.05])),
        Qe=jnp.diag(jnp.array([10.0, 10.0, 0.5])),
        yref=jnp.concatenate([goal, jnp.zeros(2)])[None, :].repeat(N, axis=0),
        yref_e=goal,
        lbx=jnp.full(3, -20.0),
        ubx=jnp.full(3, 20.0),
        lbu=jnp.array([-2.0, -2.0]),
        ubu=jnp.array([2.0, 2.0]),
    )


def _track_error(dyn_for_controller, goal, ticks=60):
    cfg = SQPConfig(N=N, dim_x=3, dim_u=2, dt=DT, sqp_iters=2, qp_iters=10)
    solver = NMPCSolver(cfg, dyn_for_controller)
    params = _nmpc_params(goal)
    plant_step = lambda x, u: erk_step(_true_dynamics, x, u, DT, num_steps=3)
    x = jnp.zeros(3)
    state = solver.init(x)
    errs = []
    for _ in range(ticks):
        u0, state, _ = solver.solve(params, state, x)
        x = plant_step(x, u0)
        errs.append(float(jnp.linalg.norm(x[:2] - goal[:2])))
    return errs[-1], min(errs)


@pytest.mark.slow
def test_collect_train_deploy_improves_tracking():
    key = jax.random.PRNGKey(0)

    # ---- 1. collect residual data with randomized scenario controllers ----
    nominal_step = lambda x, u: erk_step(unicycle, x, u, DT, num_steps=3)
    plant_step = lambda x, u: erk_step(_true_dynamics, x, u, DT, num_steps=3)

    def controller_factory(k):
        # persistent-excitation: smooth random controls per scenario
        ks = jax.random.split(k, 3)
        amp = jax.random.uniform(ks[0], (2,), minval=0.3, maxval=1.5)
        freq = jax.random.uniform(ks[1], (2,), minval=0.2, maxval=1.0)
        phase = jax.random.uniform(ks[2], (2,), minval=0.0, maxval=6.28)

        def controller(t, x):
            u = amp * jnp.sin(freq * t.astype(jnp.float32) + phase)
            return u, t + 1

        return controller, jnp.int32(0)

    def x0_sampler(k):
        return jax.random.uniform(k, (3,), minval=-2.0, maxval=2.0)

    ep = collect_residual_dataset(
        controller_factory, plant_step, nominal_step, x0_sampler, key, 24, 50
    )
    assert ep.states.shape[0] == 24 * 50
    # keep the learned stack in f32 (x64 test mode would otherwise promote the
    # whole trained model to f64 via jax.random.uniform defaults)
    ep = jax.tree.map(lambda a: a.astype(jnp.float32), ep)

    # residual target per *continuous-time* rate: error/dt approximates the
    # rate residual the NMPC dynamics composition expects
    errors_rate = ep.errors / DT

    # ---- 2. train MLP residual (features = state+control, scalers in-graph) --
    model = MLP(out_dim=3, hidden=64, depth=2)
    tstate, hist = train_residual_model(
        model,
        ep.states,
        ep.controls,
        errors_rate,
        TrainConfig(num_epochs=60, batch_size=256, learning_rate=2e-3),
    )
    assert hist["val_mse"][-1] < hist["val_mse"][0]

    # ---- 3. deploy: NMPC over analytic + learned residual --------------------
    feats = jnp.concatenate([ep.states, ep.controls], axis=-1)
    # rebuild the residual fn with the scalers the training run fitted
    net = make_residual_fn(
        model, tstate.params, in_scaler=tstate.in_scaler, out_scaler=tstate.out_scaler
    )
    learned_dyn = residual_dynamics(unicycle, net)

    # Model quality: the learned dynamics must explain the plant's rate
    # residual far better than the nominal model (which predicts residual 0).
    rms = lambda a: float(np.sqrt(np.mean(np.asarray(a, np.float64) ** 2)))
    pred_ratio = rms(errors_rate - net(feats)) / rms(errors_rate)
    assert pred_ratio < 0.3, pred_ratio  # measured ≈0.09 — a >10× better model

    goal = jnp.array([2.0, 1.5, 0.0])
    err_nominal, _ = _track_error(unicycle, goal)
    err_learned, _ = _track_error(learned_dyn, goal)

    # Closed-loop note: point stabilization is NOT where the model shows up —
    # replanning feedback rejects any model error in the control span, and
    # both models agree at u=0, so the nominal controller reaches the goal
    # too (this test originally asserted learned < 0.7·nominal, which only
    # held while the SQP merit lacked the initial-condition residual and so
    # artificially lagged the nominal controller; with the corrected merit
    # both land within ~0.1 of the goal and the comparison is noise). The
    # deploy-phase guarantee is absolute success of the DNN-NMPC loop:
    assert err_learned < 0.15, err_learned
    assert err_nominal < 0.15, err_nominal
