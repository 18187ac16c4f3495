"""Fused Pallas rollout + stage-cost kernel for diff-drive MPPI.

The MPPI hot loop (sample K noise sequences, roll T dynamics steps, accumulate
tracking + energy + obstacle costs — controllers/mppi_differential_drive.py:111-126)
as one TPU kernel: K is laid out on (sublane, lane) tiles of (R_BLK, 128), T is
an in-register sequential ``fori_loop``, and the per-step nearest-waypoint
window search (…:201-220) is an unrolled running-min over the static W window.
Trajectories are never materialized (SURVEY §7 roofline note): the only HBM
traffic is the ε tensor read once and the (K,) cost vector written once.

Layouts:
  eps   (T, 2, R, 128)   sample k = r·128 + lane
  out S (R, 128)
The host wrapper reshapes from/to the engine's (K, T, nu) convention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mppi_tick import effective_robot_radius, LANES



def _diffdrive_kernel(
    scal_ref,  # SMEM (17,) packed scalars (k_offset at index 16)
    u_ref,  # VMEM (T, 2) nominal controls
    a_ref,  # VMEM (T, 2) γ·u_tᵀΣ⁻¹ rows (energy-term coefficients)
    win_ref,  # VMEM (W, 3) waypoint window (x, y, yaw)
    obs_ref,  # VMEM (n_obs, 3) obstacle circles (x, y, r) — may be zero rows
    eps_ref,  # VMEM (T, 2, R_BLK, 128) noise block
    S_ref,  # VMEM (R_BLK, 128) out: per-sample cost
    *,
    T: int,
    W: int,
    R_BLK: int,
    n_obs: int,
    last_only: bool,
):
    dt = scal_ref[0]
    umin0, umax0 = scal_ref[1], scal_ref[2]
    umin1, umax1 = scal_ref[3], scal_ref[4]
    n_exploit = scal_ref[5]
    sw0, sw1, sw2 = scal_ref[6], scal_ref[7], scal_ref[8]
    tw0, tw1, tw2 = scal_ref[9], scal_ref[10], scal_ref[11]
    x0, y0, yaw0 = scal_ref[12], scal_ref[13], scal_ref[14]
    obs_pen_radius = scal_ref[15]  # robot radius for circle collision; <0 → off
    k_offset = scal_ref[16]  # global sample-index offset (sharded execution)

    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLK, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R_BLK, LANES), 1)
    k_idx = ((i * R_BLK + rows) * LANES + cols).astype(jnp.float32) + k_offset
    exploit = k_idx < n_exploit

    shape = (R_BLK, LANES)
    x = jnp.full(shape, x0, dtype=jnp.float32)
    y = jnp.full(shape, y0, dtype=jnp.float32)
    yaw = jnp.full(shape, yaw0, dtype=jnp.float32)
    S = jnp.zeros(shape, dtype=jnp.float32)

    # Hoist all waypoint/obstacle scalars out of the T-loop (they are
    # invariant across timesteps — re-reading VMEM scalars per (t, w) costs
    # thousands of scalar loads per block).
    win = [(win_ref[w, 0], win_ref[w, 1], win_ref[w, 2]) for w in range(W)]
    obs = [(obs_ref[o, 0], obs_ref[o, 1], obs_ref[o, 2]) for o in range(n_obs)]

    def window_refs(xc, yc):
        """Running-min nearest-waypoint lookup (first-argmin tie rule)."""
        wx0, wy0, wyaw0 = win[0]
        dmin = (xc - wx0) * (xc - wx0) + (yc - wy0) * (yc - wy0)
        rx = jnp.full(shape, wx0, dtype=jnp.float32)
        ry = jnp.full(shape, wy0, dtype=jnp.float32)
        ryaw = jnp.full(shape, wyaw0, dtype=jnp.float32)
        for w in range(1, W):
            wx, wy, wyaw = win[w]
            d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
            better = d < dmin
            dmin = jnp.where(better, d, dmin)
            rx = jnp.where(better, wx, rx)
            ry = jnp.where(better, wy, ry)
            ryaw = jnp.where(better, wyaw, ryaw)
        return rx, ry, ryaw

    def obstacle_penalty(xc, yc):
        pen = jnp.zeros(shape, dtype=jnp.float32)
        for ox, oy, orad in obs:
            d2 = (xc - ox) * (xc - ox) + (yc - oy) * (yc - oy)
            rr = orad + obs_pen_radius
            pen = jnp.where(d2 < rr * rr, jnp.float32(1.0), pen)
        return pen * jnp.float32(1.0e7)

    def body(t, carry):
        x, y, yaw, S = carry
        e0 = eps_ref[t, 0]
        e1 = eps_ref[t, 1]
        u0 = u_ref[t, 0]
        u1 = u_ref[t, 1]
        v0 = jnp.where(exploit, u0 + e0, e0)
        v1 = jnp.where(exploit, u1 + e1, e1)
        v0 = jnp.clip(v0, umin0, umax0)
        v1 = jnp.clip(v1, umin1, umax1)

        x = x + v0 * jnp.cos(yaw) * dt
        y = y + v0 * jnp.sin(yaw) * dt
        yaw = yaw + v1 * dt

        rx, ry, ryaw = window_refs(x, y)
        c = (
            sw0 * (x - rx) * (x - rx)
            + sw1 * (y - ry) * (y - ry)
            + sw2 * (yaw - ryaw) * (yaw - ryaw)
        )
        c = c + a_ref[t, 0] * v0 + a_ref[t, 1] * v1
        if n_obs > 0:
            c = c + obstacle_penalty(x, y)
        if last_only:
            S = c  # reference overwrite quirk (mppi_differential_drive.py:124)
        else:
            S = S + c
        return x, y, yaw, S

    x, y, yaw, S = jax.lax.fori_loop(0, T, body, (x, y, yaw, S))

    rx, ry, ryaw = window_refs(x, y)
    term = (
        tw0 * (x - rx) * (x - rx)
        + tw1 * (y - ry) * (y - ry)
        + tw2 * (yaw - ryaw) * (yaw - ryaw)
    )
    if n_obs > 0:
        term = term + obstacle_penalty(x, y)
    S_ref[:, :] = S + term


@functools.partial(
    jax.jit,
    static_argnames=("T", "W", "R_BLK", "last_only", "interpret"),
)
def diffdrive_rollout_costs(
    eps: jnp.ndarray,  # (K, T, 2) noise
    u: jnp.ndarray,  # (T, 2) nominal sequence
    a: jnp.ndarray,  # (T, 2) γ·u_tᵀΣ⁻¹
    x0: jnp.ndarray,  # (3,)
    window: jnp.ndarray,  # (W, 3) waypoint window
    stage_w: jnp.ndarray,  # (3,)
    term_w: jnp.ndarray,  # (3,)
    u_min: jnp.ndarray,  # (2,)
    u_max: jnp.ndarray,  # (2,)
    dt: float,
    n_exploit: float,
    obstacles: Optional[jnp.ndarray] = None,  # (n_obs, 3) or None
    robot_radius: float = 0.5,  # PHYSICAL radius; margin applied in-wrapper
    safety_margin_rate: float = 1.5,
    k_offset: jnp.ndarray | float = 0.0,
    *,
    T: int,
    W: int,
    R_BLK: Optional[int] = None,
    last_only: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused rollout: returns per-sample costs S (K,). K must divide R_BLK·128."""
    K = eps.shape[0]
    assert K % LANES == 0, f"K={K} must be a multiple of {LANES}"
    R = K // LANES
    if R_BLK is None:
        from .mppi_tick import pick_r_blk

        # ~40-row blocks (hardware sweep, mppi_tick.py), capped so the
        # double-buffered (T, 2, R_BLK, 128) f32 eps grid block stays within
        # a ~4 MiB VMEM budget at long horizons.
        max_rows = max(8, (4 << 20) // (T * 2 * LANES * 4))
        R_BLK = pick_r_blk(R, target=min(40, max_rows))
    R_BLK = min(R_BLK, R)  # small shards (sharded execution) shrink the block
    assert R % R_BLK == 0, f"rows {R} must divide by block {R_BLK}"
    n_blocks = R // R_BLK

    # (K, T, 2) → (T, 2, R, 128) with k = r·128 + lane
    eps_t = jnp.transpose(eps.reshape(R, LANES, T, 2), (2, 3, 0, 1))

    scal = jnp.concatenate(
        [
            jnp.asarray([dt], jnp.float32),
            jnp.asarray([u_min[0], u_max[0], u_min[1], u_max[1]], jnp.float32),
            jnp.asarray([n_exploit], jnp.float32),
            stage_w.astype(jnp.float32),
            term_w.astype(jnp.float32),
            x0.astype(jnp.float32),
            jnp.asarray(
                [
                    effective_robot_radius(robot_radius, safety_margin_rate)
                    if obstacles is not None
                    else -1.0
                ],
                jnp.float32,
            ),
            jnp.reshape(jnp.asarray(k_offset, jnp.float32), (1,)),
        ]
    )
    obs = (
        obstacles.astype(jnp.float32)
        if obstacles is not None
        else jnp.zeros((1, 3), jnp.float32)
    )
    n_obs = obstacles.shape[0] if obstacles is not None else 0

    kernel = functools.partial(
        _diffdrive_kernel,
        T=T,
        W=W,
        R_BLK=R_BLK,
        n_obs=n_obs,
        last_only=last_only,
    )
    S = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles
            pl.BlockSpec(
                (T, 2, R_BLK, LANES),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((R_BLK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        interpret=interpret,
    )(scal, u.astype(jnp.float32), a.astype(jnp.float32), window.astype(jnp.float32), obs, eps_t)

    return S.reshape(K)


__all__ = ["diffdrive_rollout_costs"]
