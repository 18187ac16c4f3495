"""System-identification excitation signals and space-filling sampling.

Covers the reference's data-excitation toolbox:
* step / sine / ramp / random input sequences at a fixed rate
  — test/data_collection.py:26-41 (Husky wheel-velocity excitation @240 Hz)
* Latin-hypercube sampling of initial conditions / parameters
  — test/test_datahusky.py:41 (pyDOE ``lhs``), reimplemented on jax.random
* smooth random multisine excitation for persistent excitation
  — the randomized series of train/bullet_mpc_differential_drive.py:119-157

All return (T, dim) control sequences (or (n, dim) samples) and are pure in a
PRNG key, so scenario fleets can be generated on-device under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def step_sequence(
    num_steps: int, amplitudes: jnp.ndarray, period: int
) -> jnp.ndarray:
    """Square-wave excitation: ±amplitude alternating every ``period`` ticks
    (test/data_collection.py step input)."""
    t = jnp.arange(num_steps)
    sign = jnp.where((t // period) % 2 == 0, 1.0, -1.0)
    return sign[:, None] * amplitudes[None, :]


def ramp_sequence(num_steps: int, slopes: jnp.ndarray, u_max: jnp.ndarray) -> jnp.ndarray:
    """Saturating ramp (test/data_collection.py ramp input)."""
    t = jnp.arange(num_steps, dtype=jnp.float32)[:, None]
    return jnp.clip(t * slopes[None, :], -u_max, u_max)


def sine_sequence(
    num_steps: int, amplitudes: jnp.ndarray, freqs_hz: jnp.ndarray, dt: float
) -> jnp.ndarray:
    """Sine excitation (test/data_collection.py sine input)."""
    t = jnp.arange(num_steps, dtype=jnp.float32)[:, None] * dt
    return amplitudes[None, :] * jnp.sin(2.0 * jnp.pi * freqs_hz[None, :] * t)


def random_sequence(
    key: jax.Array, num_steps: int, u_min: jnp.ndarray, u_max: jnp.ndarray, hold: int = 1
) -> jnp.ndarray:
    """Uniform random excitation with optional zero-order hold
    (test/data_collection.py random input; pybullet/synth_data.py)."""
    n = -(-num_steps // hold)
    u = jax.random.uniform(
        key, (n, u_min.shape[0]), minval=u_min, maxval=u_max
    )
    return jnp.repeat(u, hold, axis=0)[:num_steps]


def multisine_sequence(
    key: jax.Array,
    num_steps: int,
    dim_u: int,
    amp_range=(0.3, 1.5),
    freq_range=(0.2, 1.0),
    n_tones: int = 3,
) -> jnp.ndarray:
    """Sum-of-sines persistent excitation with random amplitudes/phases."""
    ka, kf, kp = jax.random.split(key, 3)
    amps = jax.random.uniform(ka, (n_tones, dim_u), minval=amp_range[0], maxval=amp_range[1])
    freqs = jax.random.uniform(kf, (n_tones, dim_u), minval=freq_range[0], maxval=freq_range[1])
    phases = jax.random.uniform(kp, (n_tones, dim_u), minval=0.0, maxval=2.0 * jnp.pi)
    t = jnp.arange(num_steps, dtype=jnp.float32)[:, None, None]
    return jnp.sum(amps * jnp.sin(freqs * t + phases), axis=1) / n_tones


def latin_hypercube(key: jax.Array, n_samples: int, bounds: jnp.ndarray) -> jnp.ndarray:
    """Latin-hypercube samples in a box (test_datahusky.py:41 pyDOE parity).

    ``bounds`` is (dim, 2) = (low, high). Each dimension is divided into
    n_samples strata; one uniform draw per stratum, strata order permuted
    independently per dimension.
    """
    dim = bounds.shape[0]
    k1, k2 = jax.random.split(key)
    # stratified u in [0, 1): (i + U)/n with per-dim permutation of i
    u = jax.random.uniform(k1, (n_samples, dim))
    perms = jax.vmap(lambda k: jax.random.permutation(k, n_samples))(
        jax.random.split(k2, dim)
    ).T  # (n_samples, dim)
    z = (perms.astype(u.dtype) + u) / n_samples
    return bounds[:, 0] + z * (bounds[:, 1] - bounds[:, 0])


__all__ = [
    "step_sequence",
    "ramp_sequence",
    "sine_sequence",
    "random_sequence",
    "multisine_sequence",
    "latin_hypercube",
]
