"""Fused Pallas rollout + stage-cost kernel for the race-car MPPI (config 3).

Kinematic-bicycle counterpart of ops/pallas/rollout.py, implementing the
semantics of controllers/mppi_race_car_obstacle.py:65-131 as one kernel:
Euler bicycle step (:200-214), yaw wrapped to [0, 2π) in the 4-term tracking
cost (:147-159), 9-point vehicle-polygon vs circle collision with safety
margin (:255-274), γ·uᵀΣ⁻¹v energy term, SUM accumulation (:94).

The waypoint window here is typically the *whole* path (SEARCH_INDEX_LEN=200
over ≤200 points), so the running-min loop uses an in-kernel ``fori_loop``
with dynamically indexed scalar loads instead of full unrolling — compile time
stays flat in W at the cost of per-iteration scalar reads.

Layouts as in the diff-drive kernel: eps (T, 2, R, 128), S out (R, 128),
sample k = r·128 + lane.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..costs import (
    VEHICLE_OUTLINE_X as _OUT_X,
    VEHICLE_OUTLINE_Y as _OUT_Y,
)
from .mppi_tick import LANES


def _bicycle_kernel(
    scal_ref,  # SMEM (24,) packed scalars
    u_ref,  # VMEM (T, 2) nominal (steer, accel)
    a_ref,  # VMEM (T, 2) γ·u_tᵀΣ⁻¹
    win_ref,  # SMEM (W, 4) waypoint window (x, y, yaw, v)
    obs_ref,  # SMEM (n_obs, 3) obstacle circles
    eps_ref,  # VMEM (T, 2, R_BLK, 128)
    S_ref,  # VMEM (R_BLK, 128)
    *,
    T: int,
    W: int,
    R_BLK: int,
    n_obs: int,
):
    dt = scal_ref[0]
    smin0, smax0 = scal_ref[1], scal_ref[2]  # steer bounds
    smin1, smax1 = scal_ref[3], scal_ref[4]  # accel bounds
    n_exploit = scal_ref[5]
    sw = [scal_ref[6 + i] for i in range(4)]
    tw = [scal_ref[10 + i] for i in range(4)]
    x0, y0, yaw0, v0 = scal_ref[14], scal_ref[15], scal_ref[16], scal_ref[17]
    inv_L = scal_ref[18]  # 1 / wheel_base
    half_l = scal_ref[19]  # 0.5·vehicle_length·margin_rate
    half_w = scal_ref[20]  # 0.5·vehicle_width·margin_rate
    penalty = scal_ref[21]
    k_offset = scal_ref[22]  # global sample-index offset (sharded execution)

    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R_BLK, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R_BLK, LANES), 1)
    k_idx = ((i * R_BLK + rows) * LANES + cols).astype(jnp.float32) + k_offset
    exploit = k_idx < n_exploit

    shape = (R_BLK, LANES)
    two_pi = jnp.float32(2.0 * 3.14159265358979)
    # Laneful zero: fori_loop carries must not start in a lane-replicated
    # layout (Mosaic cannot relayout laneful → replicated on the backedge).
    # An iota-based zero constant-folds back to a replicated constant, so the
    # zero is derived from runtime data (min(|ε₀|, 0) == 0 but unprovable).
    zero_l = jnp.minimum(jnp.abs(eps_ref[0, 0]), 0.0)

    def window_refs(xc, yc):
        """fori_loop running-min over the (possibly whole-path) window."""
        wx0, wy0 = win_ref[0, 0], win_ref[0, 1]
        d0 = (xc - wx0) * (xc - wx0) + (yc - wy0) * (yc - wy0)
        init = (
            d0,
            zero_l + wx0,
            zero_l + wy0,
            zero_l + win_ref[0, 2],
            zero_l + win_ref[0, 3],
        )

        def body(w, carry):
            dmin, rx, ry, ryaw, rv = carry
            wx, wy = win_ref[w, 0], win_ref[w, 1]
            d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
            better = d < dmin
            return (
                jnp.where(better, d, dmin),
                jnp.where(better, wx, rx),
                jnp.where(better, wy, ry),
                jnp.where(better, win_ref[w, 2], ryaw),
                jnp.where(better, win_ref[w, 3], rv),
            )

        _, rx, ry, ryaw, rv = jax.lax.fori_loop(1, W, body, init)
        return rx, ry, ryaw, rv

    def collision(xc, yc, cos_y, sin_y):
        # float accumulation with statically unrolled loops: bool-carry
        # fori_loops nested inside the T-loop fail to legalize in Mosaic
        hit = zero_l
        for pxb, pyb in zip(_OUT_X, _OUT_Y):
            bx = jnp.float32(pxb) * half_l
            by = jnp.float32(pyb) * half_w
            px = bx * cos_y - by * sin_y + xc
            py = bx * sin_y + by * cos_y + yc
            for o in range(n_obs):
                dx = px - obs_ref[o, 0]
                dy = py - obs_ref[o, 1]
                r = obs_ref[o, 2]
                hit = jnp.maximum(
                    hit, jnp.where(dx * dx + dy * dy < r * r, 1.0, 0.0)
                )
        return hit * penalty

    def cost(xc, yc, yawc, vc, weights, cos_y, sin_y):
        rx, ry, ryaw, rv = window_refs(xc, yc)
        yaw_wrapped = yawc - two_pi * jnp.floor(yawc / two_pi)  # mod to [0, 2π)
        c = (
            weights[0] * (xc - rx) * (xc - rx)
            + weights[1] * (yc - ry) * (yc - ry)
            + weights[2] * (yaw_wrapped - ryaw) * (yaw_wrapped - ryaw)
            + weights[3] * (vc - rv) * (vc - rv)
        )
        if n_obs > 0:
            c = c + collision(xc, yc, cos_y, sin_y)
        return c

    def body(t, carry):
        x, y, yaw, v, S = carry
        e0 = eps_ref[t, 0]
        e1 = eps_ref[t, 1]
        st = jnp.where(exploit, u_ref[t, 0] + e0, e0)
        ac = jnp.where(exploit, u_ref[t, 1] + e1, e1)
        st = jnp.clip(st, smin0, smax0)
        ac = jnp.clip(ac, smin1, smax1)

        cos_y = jnp.cos(yaw)
        sin_y = jnp.sin(yaw)
        x = x + v * cos_y * dt
        y = y + v * sin_y * dt
        yaw = yaw + v * inv_L * jnp.tan(st) * dt
        v = v + ac * dt

        cos_n = jnp.cos(yaw)
        sin_n = jnp.sin(yaw)
        c = cost(x, y, yaw, v, sw, cos_n, sin_n)
        c = c + a_ref[t, 0] * st + a_ref[t, 1] * ac
        return x, y, yaw, v, S + c

    init = (
        zero_l + x0,
        zero_l + y0,
        zero_l + yaw0,
        zero_l + v0,
        zero_l,
    )
    x, y, yaw, v, S = jax.lax.fori_loop(0, T, body, init)
    cos_y = jnp.cos(yaw)
    sin_y = jnp.sin(yaw)
    S_ref[:, :] = S + cost(x, y, yaw, v, tw, cos_y, sin_y)


@functools.partial(jax.jit, static_argnames=("T", "W", "R_BLK", "interpret"))
def bicycle_rollout_costs(
    eps: jnp.ndarray,  # (K, T, 2)
    u: jnp.ndarray,  # (T, 2) nominal (steer, accel)
    a: jnp.ndarray,  # (T, 2) γ·u_tᵀΣ⁻¹
    x0: jnp.ndarray,  # (4,) (x, y, yaw, v)
    window: jnp.ndarray,  # (W, 4)
    stage_w: jnp.ndarray,  # (4,)
    term_w: jnp.ndarray,  # (4,)
    u_min: jnp.ndarray,
    u_max: jnp.ndarray,
    dt: float,
    n_exploit: float,
    wheel_base: float = 2.5,
    vehicle_length: float = 4.0,
    vehicle_width: float = 3.0,
    margin_rate: float = 1.5,
    penalty: float = 1.0e7,
    obstacles: Optional[jnp.ndarray] = None,
    k_offset: jnp.ndarray | float = 0.0,
    *,
    T: int,
    W: int,
    R_BLK: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
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
                    1.0 / wheel_base,
                    0.5 * vehicle_length * margin_rate,
                    0.5 * vehicle_width * margin_rate,
                    penalty,
                ],
                jnp.float32,
            ),
            jnp.reshape(jnp.asarray(k_offset, jnp.float32), (1,)),
            jnp.zeros((1,), jnp.float32),  # padding
        ]
    )
    obs = (
        obstacles.astype(jnp.float32)
        if obstacles is not None and obstacles.shape[0] > 0
        else jnp.zeros((1, 3), jnp.float32)
    )
    n_obs = obstacles.shape[0] if obstacles is not None else 0

    kernel = functools.partial(
        _bicycle_kernel, T=T, W=W, R_BLK=R_BLK, n_obs=n_obs
    )
    S = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # window: dynamic scalar reads
            pl.BlockSpec(memory_space=pltpu.SMEM),  # obstacles: dynamic scalar reads
            pl.BlockSpec((T, 2, R_BLK, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_BLK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        interpret=interpret,
    )(scal, u.astype(jnp.float32), a.astype(jnp.float32), window.astype(jnp.float32), obs, eps_t)
    return S.reshape(K)


__all__ = ["bicycle_rollout_costs"]
