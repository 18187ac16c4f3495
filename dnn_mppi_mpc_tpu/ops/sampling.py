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
    chol = jnp.linalg.cholesky(sigma.astype(_hi_dtype())).astype(dtype)
    z = jax.random.normal(key, (num_samples, horizon, dim_u), dtype=dtype)
    return z @ chol.T


def _hi_dtype():
    """f64 when enabled (tests), else f32 — avoids noisy truncation warnings."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def sigma_inverse(sigma: jnp.ndarray) -> jnp.ndarray:
    """Σ⁻¹ for the control-energy term; solved at max available precision."""
    return jnp.linalg.inv(sigma.astype(_hi_dtype())).astype(sigma.dtype)


__all__ = ["sample_noise", "sigma_inverse"]
