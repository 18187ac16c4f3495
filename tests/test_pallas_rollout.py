"""Pallas fused rollout kernel vs the engine's scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_mppi_mpc_tpu.ops.pallas.rollout import diffdrive_rollout_costs
from dnn_mppi_mpc_tpu.ops.sampling import sigma_inverse
from dnn_mppi_mpc_tpu.testing.oracle import OracleMPPI

K, T, W = 1024, 10, 20
DT = 0.1


def _line_path(n=100):
    x = np.linspace(0.0, 10.0, n)
    y = np.linspace(0.0, -5.0, n)
    yaw = np.arctan2(-5.0, 10.0) * np.ones(n)
    return np.stack([x, y, yaw], axis=1).astype(np.float32)


def _reference_costs(eps, u, x0, window, stage_w, term_w, u_min, u_max, gamma, sig_inv, n_exploit, obstacles=None, last_only=False):
    """Straightforward numpy recomputation of the fused kernel semantics."""
    Kn, Tn, _ = eps.shape
    S = np.zeros(Kn)
    a = gamma * (u @ sig_inv)
    for k in range(Kn):
        x, y, yaw = x0
        s = 0.0
        for t in range(Tn):
            if k < n_exploit:
                v = u[t] + eps[k, t]
            else:
                v = eps[k, t].copy()
            v[0] = np.clip(v[0], u_min[0], u_max[0])
            v[1] = np.clip(v[1], u_min[1], u_max[1])
            x += v[0] * np.cos(yaw) * DT
            y += v[0] * np.sin(yaw) * DT
            yaw += v[1] * DT
            d = (x - window[:, 0]) ** 2 + (y - window[:, 1]) ** 2
            j = int(np.argmin(d))
            c = (
                stage_w[0] * (x - window[j, 0]) ** 2
                + stage_w[1] * (y - window[j, 1]) ** 2
                + stage_w[2] * (yaw - window[j, 2]) ** 2
            )
            c += a[t, 0] * v[0] + a[t, 1] * v[1]
            if obstacles is not None:
                for ox, oy, orad in obstacles:
                    if (x - ox) ** 2 + (y - oy) ** 2 < (orad + 0.5) ** 2:
                        c += 1.0e7
                        break
            s = c if last_only else s + c
        d = (x - window[:, 0]) ** 2 + (y - window[:, 1]) ** 2
        j = int(np.argmin(d))
        s += (
            term_w[0] * (x - window[j, 0]) ** 2
            + term_w[1] * (y - window[j, 1]) ** 2
            + term_w[2] * (yaw - window[j, 2]) ** 2
        )
        if obstacles is not None:
            for ox, oy, orad in obstacles:
                if (x - ox) ** 2 + (y - oy) ** 2 < (orad + 0.5) ** 2:
                    s += 1.0e7
                    break
        S[k] = s
    return S


@pytest.mark.parametrize("last_only", [False, True])
def test_kernel_matches_numpy_reference(last_only):
    rng = np.random.default_rng(0)
    path = _line_path()
    window = path[:W]
    eps = rng.multivariate_normal(
        np.zeros(2), np.array([[0.1, 0.0], [0.0, 0.01]]), size=(K, T)
    ).astype(np.float32)
    u = rng.normal(scale=0.3, size=(T, 2)).astype(np.float32)
    x0 = np.array([0.3, -0.1, 0.1], np.float32)
    stage_w = np.array([5.0, 5.0, 10.0], np.float32)
    term_w = np.array([5.0, 5.0, 10.0], np.float32)
    u_min = np.array([-5.0, -3.14], np.float32)
    u_max = np.array([5.0, 3.14], np.float32)
    gamma = 0.8
    sig_inv = np.linalg.inv(np.array([[0.1, 0.0], [0.0, 0.01]]))
    n_exploit = (1.0 - 0.0001) * K

    a = gamma * (u @ sig_inv)
    S = diffdrive_rollout_costs(
        jnp.asarray(eps),
        jnp.asarray(u),
        jnp.asarray(a.astype(np.float32)),
        jnp.asarray(x0),
        jnp.asarray(window),
        jnp.asarray(stage_w),
        jnp.asarray(term_w),
        jnp.asarray(u_min),
        jnp.asarray(u_max),
        DT,
        n_exploit,
        T=T,
        W=W,
        last_only=last_only,
        interpret=True,
    )
    want = _reference_costs(
        eps.astype(np.float64),
        u.astype(np.float64),
        x0,
        window.astype(np.float64),
        stage_w,
        term_w,
        u_min,
        u_max,
        gamma,
        sig_inv,
        n_exploit,
        last_only=last_only,
    )
    np.testing.assert_allclose(np.asarray(S), want, rtol=2e-4, atol=1e-3)


def test_kernel_with_obstacles():
    rng = np.random.default_rng(1)
    path = _line_path()
    window = path[:W]
    eps = rng.normal(scale=0.3, size=(K, T, 2)).astype(np.float32)
    u = np.tile(np.array([2.0, 0.0], np.float32), (T, 1))
    x0 = np.array([0.0, 0.0, -0.45], np.float32)
    obstacles = np.array([[1.0, -0.5, 0.3]], np.float32)
    sig_inv = np.linalg.inv(np.array([[0.1, 0.0], [0.0, 0.01]]))
    gamma = 0.8
    a = (gamma * (u @ sig_inv)).astype(np.float32)
    stage_w = np.array([5.0, 5.0, 10.0], np.float32)
    u_min = np.array([-5.0, -3.14], np.float32)
    u_max = np.array([5.0, 3.14], np.float32)
    S = diffdrive_rollout_costs(
        jnp.asarray(eps),
        jnp.asarray(u),
        jnp.asarray(a),
        jnp.asarray(x0),
        jnp.asarray(window),
        jnp.asarray(stage_w),
        jnp.asarray(stage_w),
        jnp.asarray(u_min),
        jnp.asarray(u_max),
        DT,
        (1.0 - 0.0001) * K,
        obstacles=jnp.asarray(obstacles),
        T=T,
        W=W,
        interpret=True,
    )
    S = np.asarray(S)
    # driving at the obstacle: a large share of samples must be penalized
    assert (S > 1e6).sum() > K // 10
    assert np.all(np.isfinite(S))
