"""Control-noise sampling with explicit PRNG keys.

Replaces the reference's global-RNG multivariate normal draw
(controllers/mppi_differential_drive.py:273-283,
``np.random.multivariate_normal(mu, sigma, (K, T))``) with key-threaded
sampling: standard normals are colored by the Cholesky factor of Σ. For
oracle-parity testing the solvers also accept a pre-drawn noise tensor, so
identical ε can be injected into both the numpy oracle and the TPU engine
(SURVEY §7 "Noise/RNG parity").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_noise(
    key: jax.Array,
    sigma: jnp.ndarray,
    num_samples: int,
    horizon: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Draw ε ~ N(0, Σ) with shape (K, T, dim_u).

    Equivalent in distribution to ``np.random.multivariate_normal`` at
    controllers/mppi_differential_drive.py:282 but deterministic under a key.
    """
    dim_u = sigma.shape[-1]
    chol = small_cholesky(sigma.astype(_hi_dtype())).astype(dtype)
    z = jax.random.normal(key, (num_samples, horizon, dim_u), dtype=dtype)
    return z @ chol.T


def small_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky–Crout for tiny static dims (control spaces, n ≤ ~8).

    jnp.linalg.cholesky lowers to a heavyweight XLA path that costs ~1 ms on
    TPU even for a 2×2 — three orders of magnitude more than the arithmetic.
    The control-noise Σ is (dim_u × dim_u) with dim_u ∈ {2, 4}, so a fully
    unrolled scalar recurrence compiles to a handful of fused ops.
    """
    n = a.shape[-1]
    rows = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[i, j]
            for k in range(j):
                s = s - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(s)
            else:
                rows[i][j] = s / rows[j][j]
        for j in range(i + 1, n):
            rows[i][j] = jnp.zeros_like(a[0, 0])
    return jnp.stack([jnp.stack(r) for r in rows])


def _hi_dtype():
    """f64 when enabled (tests), else f32 — avoids noisy truncation warnings."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def sigma_inverse(sigma: jnp.ndarray) -> jnp.ndarray:
    """Σ⁻¹ for the control-energy term — unrolled SPD inverse via Cholesky
    (jnp.linalg.inv has the same heavyweight lowering as cholesky; see
    :func:`small_cholesky`)."""
    a = sigma.astype(_hi_dtype())
    n = a.shape[-1]
    L = small_cholesky(a)
    # unrolled forward substitution: L X = I  →  X = L⁻¹
    X = [[None] * n for _ in range(n)]
    for j in range(n):
        for i in range(n):
            if i < j:
                X[i][j] = jnp.zeros_like(a[0, 0])
            else:
                s = jnp.ones_like(a[0, 0]) if i == j else jnp.zeros_like(a[0, 0])
                for k in range(j, i):
                    s = s - L[i, k] * X[k][j]
                X[i][j] = s / L[i, i]
    Linv = jnp.stack([jnp.stack(r) for r in X])
    return (Linv.T @ Linv).astype(sigma.dtype)


__all__ = ["sample_noise", "sigma_inverse"]
