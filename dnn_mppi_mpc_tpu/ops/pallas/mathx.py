"""Polynomial math helpers for Pallas-TPU kernels.

Mosaic lowers ``jnp.sin``/``jnp.cos`` to the VPU's transcendental path; for
kernels that need BOTH on the same angle every rollout step (all the vehicle
dynamics tiles), one shared Cody–Waite range reduction plus two short
minimax polynomials can beat two native evaluations. Opt in per kernel via
``sincos="poly"`` (A/B rows in docs/PERF.md); numerically |err| ≤ ~2 ulp
over |x| ≤ 100 rad, parity-tested against the XLA scan path in
tests/test_mppi_tick.py.

The reference has no analogue (CUDA ``sincosf`` does this in hardware); the
pattern follows the existing ``models/tile.py::atan_tile`` (Mosaic has no
atan lowering at all).
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as _np

# 3-term Cody–Waite split of pi/2, all f32: A has only 7 significand bits so
# k·A is EXACT for |k| ≤ ~2000; B and C mop up the residual. Everything is
# f32 because Mosaic has no f64. Max reduction error ≈ 1 ulp of r.
_PIO2_A = float(_np.float32(1.5703125))
_PIO2_B = float(_np.float32(_np.pi / 2 - _PIO2_A))
_PIO2_C = float(_np.float32(_np.pi / 2 - _PIO2_A - _PIO2_B))
_TWO_OVER_PI = 0.6366197723675814

_SIN_C = (-1.6666654611e-01, 8.3321608736e-03, -1.9515295891e-04)
# Cephes cosf kernel: cos r = 1 − r²/2 + r⁴·P(r²)
_COS_C = (4.166664568298827e-2, -1.388731625493765e-3, 2.443315711809948e-5)


def sincos_poly(x: jnp.ndarray):
    """(sin x, cos x) with one shared quadrant reduction, VPU-only ops.

    Quadrant index k = round(x·2/π); r = x − k·π/2 (Cody–Waite two-step);
    then (sin, cos) of r are mapped through the quadrant by two selects and
    a sign flip each — no table, no gather, fully vectorizable on (8, 128)
    tiles.
    """
    x = x.astype(jnp.float32)
    kf = jnp.round(x * jnp.float32(_TWO_OVER_PI))
    r = x - kf * jnp.float32(_PIO2_A)
    r = r - kf * jnp.float32(_PIO2_B)
    r = r - kf * jnp.float32(_PIO2_C)
    r2 = r * r

    # sin(r): r·(1 + c1 r² + c2 r⁴ + c3 r⁶)
    sp = jnp.float32(_SIN_C[2])
    sp = sp * r2 + jnp.float32(_SIN_C[1])
    sp = sp * r2 + jnp.float32(_SIN_C[0])
    sin_r = r + r * r2 * sp

    # cos(r): 1 − r²/2 + r⁴·P(r²)  (Cephes cosf)
    cp = jnp.float32(_COS_C[2])
    cp = cp * r2 + jnp.float32(_COS_C[1])
    cp = cp * r2 + jnp.float32(_COS_C[0])
    cos_r = 1.0 - 0.5 * r2 + r2 * r2 * cp

    # quadrant map: k mod 4 ∈ {0: (s, c), 1: (c, −s), 2: (−s, −c), 3: (−c, s)}
    # Signs are computed arithmetically from the two low bits — a boolean
    # XOR here compiles fine in f32 mode but SIGABRTs the Mosaic compiler
    # when jax_enable_x64 is on (round-4 hardware bisection; the x64 test
    # suite drives every kernel through this path).
    k = kf.astype(jnp.int32)
    b0 = (k & 1).astype(jnp.float32)  # swap bit
    b1 = ((k >> 1) & 1).astype(jnp.float32)  # sin-sign bit
    swap = b0 > 0.5
    s_abs = jnp.where(swap, cos_r, sin_r)
    c_abs = jnp.where(swap, sin_r, cos_r)
    sin_sign = 1.0 - 2.0 * b1
    cos_sign = 1.0 - 2.0 * (b0 + b1 - 2.0 * b0 * b1)  # b0 XOR b1
    return s_abs * sin_sign, c_abs * cos_sign


__all__ = ["sincos_poly"]


# ---------------------------------------------------------------------------
# Counter-based Gaussian stand-in for the Mosaic hardware PRNG.
# ---------------------------------------------------------------------------


def _splitmix32(x: jnp.ndarray) -> jnp.ndarray:
    """SplitMix-style u32 finalizer (avalanche hash; plain VPU/CPU ops)."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def hash_normal_pair(seed, block_id, shape):
    """Two N(0,1) tensors as a pure function of (seed, block_id, position).

    The blocked fused tick's stream contract is "ε depends only on
    (seed, global block id)" — phase 2 of the sharded tick regenerates
    phase 1's noise from the same pair, and shard-count invariance follows
    because the global block partition is mesh-independent. The hardware
    path (``pltpu.prng_seed(seed, block) + prng_random_bits``) honors this
    contract but has no CPU lowering, so the virtual-mesh dryrun could
    never execute the production kernels. This stand-in honors the SAME
    contract with a counter-based splitmix hash + Box-Muller — ordinary
    jnp ops only, so it runs under Pallas interpret mode on CPU (and
    compiles on TPU for contract A/B). Select with ``gaussian="hash"``;
    the hardware modes ("popcount"/"box_muller") remain the perf path.
    """
    import jax

    s = jnp.asarray(seed).astype(jnp.uint32)
    b = jnp.asarray(block_id).astype(jnp.uint32)
    base = _splitmix32(
        s * jnp.uint32(0x9E3779B9) ^ _splitmix32(b + jnp.uint32(0x85EBCA6B))
    )
    t = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    l = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    ctr = (t * jnp.uint32(shape[1]) + r) * jnp.uint32(shape[2]) + l
    bits1 = _splitmix32(base ^ (ctr * jnp.uint32(0x9E3779B1)))
    bits2 = _splitmix32(base ^ (ctr * jnp.uint32(0xC2B2AE35) + jnp.uint32(0x1234567)))
    # top 24 bits -> (0, 1]: u = 1 - k/2^24 with k in [0, 2^24)
    scale = jnp.float32(1.0 / 16777216.0)
    u1 = 1.0 - (bits1 >> jnp.uint32(8)).astype(jnp.float32) * scale
    u2 = (bits2 >> jnp.uint32(8)).astype(jnp.float32) * scale
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = jnp.float32(2.0 * _np.pi) * u2
    return rad * jnp.cos(ang), rad * jnp.sin(ang)
