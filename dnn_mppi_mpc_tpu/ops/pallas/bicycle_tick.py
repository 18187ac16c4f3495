"""Fully-fused MPPI control-tick kernel for the race-car (kinematic bicycle).

Bicycle counterpart of ops/pallas/mppi_tick.py: one single-program kernel
covering the whole sample-space part of a race-car MPPI tick with the
semantics of controllers/mppi_race_car_obstacle.py:65-131 —

  1. ε ~ N(0, Σ) on-chip (`pltpu.prng_random_bits` → popcount-Gaussian or
     Box-Muller (mppi_tick.standard_normal_pair) → Cholesky coloring), so
     the (K, T, 2) noise tensor never exists in HBM (round-1
     profiling showed host-side sampling + layout transpose cost ~1.2 ms of
     the 1.63 ms race-car solve — docs/PERF.md);
  2. Euler kinematic-bicycle rollout (:200-214) with in-rollout clamp and the
     exploration split, the 4-term wrap-yaw tracking cost (:147-159) against
     the running-min nearest waypoint over the (typically whole-path) W≈200
     window (:173-191, first-argmin tie rule), 9-point vehicle polygon vs
     circle collision with safety margin (:255-274), γ·uᵀΣ⁻¹v energy term,
     SUM accumulation (:94);
  3. softmax weights with ρ = min S (:216-226);
  4. the weighted-noise reduction Σₖ wₖ·εₖ.

Layouts as in mppi_tick.py: K on (R, 128) blocks rolled out in R_BLK rows of
vector registers, T an in-register ``fori_loop``, ε in two (T, R, 128) VMEM
scratch planes. The waypoint window lives in SMEM and is scanned with an
unrolled ``fori_loop`` (dynamic scalar reads — W is too large to hoist into
registers; compile time stays flat in W).

Noise modes as in mppi_tick.py: ``gen_noise=True`` (TPU-only PRNG) or
injected-ε (bit-identical compute path, CPU interpret-mode parity tests).
Single-device by construction — the in-kernel softmax is a global reduction;
sharded execution keeps the split bicycle rollout kernel + XLA collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mathx import sincos_poly
from .mppi_tick import _TWO_PI, LANES, pick_r_blk, standard_normal_pair

# canonical body-frame vehicle outline (order per
# mppi_race_car_obstacle.py:263-264) — shared with the XLA cost path
from ..costs import (  # noqa: E402
    VEHICLE_OUTLINE_X as _OUT_X,
    VEHICLE_OUTLINE_Y as _OUT_Y,
)


def _bicycle_tick_kernel(
    seed_ref,  # SMEM (1,) int32 PRNG seed (unused when gen_noise=False)
    scal_ref,  # SMEM (28,) packed f32 scalars (layout below)
    u_ref,  # VMEM (T, 2) nominal (steer, accel)
    a_ref,  # VMEM (T, 2) γ·u_tᵀΣ⁻¹ rows
    win_ref,  # SMEM (W, 4) waypoint window (x, y, yaw, v)
    obs_ref,  # SMEM (n_obs, 3) obstacle circles
    *rest,  # [eps0_in, eps1_in] | outputs | [eps scratch ×2]
    T: int,
    W: int,
    R: int,
    R_BLK: int,
    n_obs: int,
    gen_noise: bool,
    emit_eps: bool,
    gaussian: str,
    iso_xy: bool,
    sincos: str = "native",
):
    rest = list(rest)
    if not gen_noise:
        eps0, eps1 = rest.pop(0), rest.pop(0)  # (T, R, 128) inputs
    S_ref, w_ref, weps_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if emit_eps:
        eps0_out, eps1_out = rest.pop(0), rest.pop(0)
    if gen_noise:
        eps0, eps1 = rest.pop(0), rest.pop(0)  # (T, R, 128) scratch

    # scalar layout
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
    k_offset = scal_ref[22]
    inv_temp = scal_ref[23]
    l00, l10, l11 = scal_ref[24], scal_ref[25], scal_ref[26]  # chol(Σ)

    if gen_noise:
        pltpu.prng_seed(seed_ref[0])
        z0, z1 = standard_normal_pair((T, R, LANES), gaussian)
        eps0[:, :, :] = l00 * z0
        eps1[:, :, :] = l10 * z0 + l11 * z1
        if emit_eps:
            eps0_out[:, :, :] = eps0[:, :, :]
            eps1_out[:, :, :] = eps1[:, :, :]

    obs = [(obs_ref[o, 0], obs_ref[o, 1], obs_ref[o, 2]) for o in range(n_obs)]
    shape = (R_BLK, LANES)

    assert R % R_BLK == 0
    for blk in range(R // R_BLK):
        r0 = blk * R_BLK
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        k_idx = ((r0 + rows) * LANES + cols).astype(jnp.float32) + k_offset
        exploit = k_idx < n_exploit

        # Laneful zero (see ops/pallas/rollout.py): fori_loop carries must not
        # start lane-replicated; derive the zero from runtime data.
        zero_l = jnp.minimum(jnp.abs(eps0[0, r0 : r0 + R_BLK]), 0.0)

        def window_refs(xc, yc, zero_l=zero_l):
            """Running-min over the SMEM window (first-argmin tie rule).

            ``iso_xy`` mode returns (dmin, ryaw, rv) instead of the
            (rx, ry, ryaw, rv) reference point: with symmetric x/y tracking
            weights the cost is sw0·dmin + sw2·(yaw−ryaw)² + sw3·(v−rv)²
            EXACTLY, so the rx/ry select chains — 2 of the 5 selects in the
            kernel's dominant W-deep loop — vanish (the diff-drive kernel's
            iso_xy lever, ops/pallas/mppi_tick.py)."""
            wx0, wy0 = win_ref[0, 0], win_ref[0, 1]
            d0 = (xc - wx0) * (xc - wx0) + (yc - wy0) * (yc - wy0)
            init = (
                d0,
                zero_l + win_ref[0, 2],
                zero_l + win_ref[0, 3],
            )
            if not iso_xy:
                init = init + (zero_l + wx0, zero_l + wy0)

            def body(w, carry):
                dmin, ryaw, rv = carry[:3]
                wx, wy = win_ref[w, 0], win_ref[w, 1]
                d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
                better = d < dmin
                out = (
                    jnp.where(better, d, dmin),
                    jnp.where(better, win_ref[w, 2], ryaw),
                    jnp.where(better, win_ref[w, 3], rv),
                )
                if not iso_xy:
                    rx, ry = carry[3], carry[4]
                    out = out + (
                        jnp.where(better, wx, rx),
                        jnp.where(better, wy, ry),
                    )
                return out

            # Mosaic supports only unroll=1 or full unroll for fori_loop;
            # full unroll at W≈200 × T explodes compile time, so stride 1.
            res = jax.lax.fori_loop(1, W, body, init)
            if iso_xy:
                dmin, ryaw, rv = res
                return dmin, ryaw, rv
            dmin, ryaw, rv, rx, ry = res
            return rx, ry, ryaw, rv

        def collision(xc, yc, cos_y, sin_y, zero_l=zero_l):
            hit = zero_l
            for pxb, pyb in zip(_OUT_X, _OUT_Y):
                bx = jnp.float32(pxb) * half_l
                by = jnp.float32(pyb) * half_w
                px = bx * cos_y - by * sin_y + xc
                py = bx * sin_y + by * cos_y + yc
                for ox, oy, orad in obs:
                    dx = px - ox
                    dy = py - oy
                    hit = jnp.maximum(
                        hit, jnp.where(dx * dx + dy * dy < orad * orad, 1.0, 0.0)
                    )
            return hit * penalty

        def cost(xc, yc, yawc, vc, weights, cos_y, sin_y):
            yaw_wrapped = yawc - jnp.float32(_TWO_PI) * jnp.floor(
                yawc / jnp.float32(_TWO_PI)
            )
            if iso_xy:
                dmin, ryaw, rv = window_refs(xc, yc)
                c = (
                    weights[0] * dmin
                    + weights[2] * (yaw_wrapped - ryaw) * (yaw_wrapped - ryaw)
                    + weights[3] * (vc - rv) * (vc - rv)
                )
            else:
                rx, ry, ryaw, rv = window_refs(xc, yc)
                c = (
                    weights[0] * (xc - rx) * (xc - rx)
                    + weights[1] * (yc - ry) * (yc - ry)
                    + weights[2] * (yaw_wrapped - ryaw) * (yaw_wrapped - ryaw)
                    + weights[3] * (vc - rv) * (vc - rv)
                )
            if n_obs > 0:
                c = c + collision(xc, yc, cos_y, sin_y)
            return c

        def body(t, carry, exploit=exploit):
            x, y, yaw, v, S = carry
            e0 = eps0[t, r0 : r0 + R_BLK]
            e1 = eps1[t, r0 : r0 + R_BLK]
            st = jnp.where(exploit, u_ref[t, 0] + e0, e0)
            ac = jnp.where(exploit, u_ref[t, 1] + e1, e1)
            st = jnp.clip(st, smin0, smax0)
            ac = jnp.clip(ac, smin1, smax1)

            if sincos == "poly":
                sin_y, cos_y = sincos_poly(yaw)
                # tan(steer) = sin/cos via the same polynomial pair — the
                # steer is clipped well inside (−π/2, π/2), no pole risk
                sin_s, cos_s = sincos_poly(st)
                tan_s = sin_s / cos_s
            else:
                cos_y = jnp.cos(yaw)
                sin_y = jnp.sin(yaw)
                tan_s = jnp.tan(st)
            x = x + v * cos_y * dt
            y = y + v * sin_y * dt
            yaw = yaw + v * inv_L * tan_s * dt
            v = v + ac * dt

            if sincos == "poly":
                sin_n, cos_n = sincos_poly(yaw)
            else:
                cos_n = jnp.cos(yaw)
                sin_n = jnp.sin(yaw)
            c = cost(x, y, yaw, v, sw, cos_n, sin_n)
            c = c + a_ref[t, 0] * st + a_ref[t, 1] * ac
            return x, y, yaw, v, S + c

        init = (zero_l + x0, zero_l + y0, zero_l + yaw0, zero_l + v0, zero_l)
        x, y, yaw, v, S = jax.lax.fori_loop(0, T, body, init)
        if sincos == "poly":
            sin_y, cos_y = sincos_poly(yaw)
        else:
            cos_y = jnp.cos(yaw)
            sin_y = jnp.sin(yaw)
        S_ref[r0 : r0 + R_BLK, :] = S + cost(x, y, yaw, v, tw, cos_y, sin_y)

    # Softmax weights with ρ = min S (mppi_race_car_obstacle.py:216-226).
    S = S_ref[:, :]
    rho = jnp.min(S)
    m = jnp.exp(-inv_temp * (S - rho))
    eta = jnp.sum(m)
    w_ref[:, :] = m / eta

    # Weighted-noise reduction over the unclamped ε; rows (2, T).
    wb = (m / eta)[None, :, :]
    weps_ref[0, :] = jnp.sum(jnp.sum(eps0[:, :, :] * wb, axis=2), axis=1)
    weps_ref[1, :] = jnp.sum(jnp.sum(eps1[:, :, :] * wb, axis=2), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "T", "W", "emit_eps", "interpret", "gaussian", "iso_xy", "sincos"
    ),
)
def bicycle_mppi_tick(
    seed: jnp.ndarray,  # () int32 — ignored when eps is given
    u: jnp.ndarray,  # (T, 2) nominal (steer, accel)
    a: jnp.ndarray,  # (T, 2) γ·u_tᵀΣ⁻¹
    chol_sigma: jnp.ndarray,  # (2, 2) lower-triangular Cholesky of Σ
    x0: jnp.ndarray,  # (4,) (x, y, yaw, v)
    window: jnp.ndarray,  # (W, 4) waypoint window (x, y, yaw, v)
    stage_w: jnp.ndarray,  # (4,)
    term_w: jnp.ndarray,  # (4,)
    u_min: jnp.ndarray,  # (2,)
    u_max: jnp.ndarray,  # (2,)
    dt: float,
    n_exploit: float,
    inv_temperature: jnp.ndarray,
    obstacles: Optional[jnp.ndarray] = None,  # (n_obs, 3) or None
    wheel_base: float = 2.5,
    vehicle_length: float = 4.0,
    vehicle_width: float = 3.0,
    margin_rate: float = 1.5,
    penalty: float = 1.0e7,
    eps: Optional[jnp.ndarray] = None,  # (K, T, 2) injected ε (parity mode)
    *,
    K: int,
    T: int,
    W: int,
    emit_eps: bool = False,
    interpret: bool = False,
    gaussian: str = "popcount",
    iso_xy: bool = False,
    sincos: str = "native",
):
    """One fused race-car MPPI tick → ``(S (K,), w (K,), w_eps (T, 2))``
    (plus ``eps (K, T, 2)`` when ``emit_eps``). ``gaussian`` as in
    mppi_tick.standard_normal_pair. ``iso_xy`` specializes for SYMMETRIC x/y
    tracking weights (stage_w[0]==stage_w[1], term_w[0]==term_w[1] — the
    reference race car's own (50, 50, 1, 20) defaults,
    mppi_race_car_obstacle.py:22-26): the cost uses the running min distance
    directly, dropping the rx/ry select chains from the W-deep window loop.
    The caller must guarantee the symmetry (asserted in
    solvers.mppi.make_pallas_bicycle_tick at bind time)."""
    assert gaussian in ("popcount", "box_muller"), gaussian
    assert K % LANES == 0, f"K={K} must be a multiple of {LANES}"
    R = K // LANES
    R_BLK = pick_r_blk(R)
    gen_noise = eps is None
    emit = bool(emit_eps and gen_noise)

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
            jnp.asarray([0.0], jnp.float32),  # k_offset (single-device: 0)
            jnp.reshape(jnp.asarray(inv_temperature, jnp.float32), (1,)),
            jnp.reshape(chol_sigma.astype(jnp.float32), (4,))[
                jnp.asarray([0, 2, 3])
            ],  # l00, l10, l11
            jnp.zeros((1,), jnp.float32),  # pad
        ]
    )
    obs = (
        obstacles.astype(jnp.float32)
        if obstacles is not None and obstacles.shape[0] > 0
        else jnp.zeros((1, 3), jnp.float32)
    )
    n_obs = obstacles.shape[0] if obstacles is not None else 0

    kernel = functools.partial(
        _bicycle_tick_kernel,
        T=T,
        W=W,
        R=R,
        R_BLK=R_BLK,
        n_obs=n_obs,
        gen_noise=gen_noise,
        emit_eps=emit,
        gaussian=gaussian,
        iso_xy=iso_xy,
        sincos=sincos,
    )

    out_shape = [
        jax.ShapeDtypeStruct((R, LANES), jnp.float32),  # S
        jax.ShapeDtypeStruct((R, LANES), jnp.float32),  # w
        jax.ShapeDtypeStruct((2, T), jnp.float32),  # w_eps (rows)
    ]
    if emit:
        out_shape += [
            jax.ShapeDtypeStruct((T, R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, R, LANES), jnp.float32),
        ]
    out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        pl.BlockSpec(memory_space=pltpu.VMEM),  # u
        pl.BlockSpec(memory_space=pltpu.VMEM),  # a
        pl.BlockSpec(memory_space=pltpu.SMEM),  # window: dynamic scalar reads
        pl.BlockSpec(memory_space=pltpu.SMEM),  # obstacles
    ]
    args = [
        jnp.reshape(seed.astype(jnp.int32), (1,)),
        scal,
        u.astype(jnp.float32),
        a.astype(jnp.float32),
        window.astype(jnp.float32),
        obs,
    ]
    scratch_shapes = []
    if gen_noise:
        scratch_shapes += [
            pltpu.VMEM((T, R, LANES), jnp.float32),
            pltpu.VMEM((T, R, LANES), jnp.float32),
        ]
    else:
        eps_t = jnp.transpose(
            eps.astype(jnp.float32).reshape(R, LANES, T, 2), (2, 3, 0, 1)
        )
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [eps_t[:, 0], eps_t[:, 1]]

    result = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)

    S = result[0].reshape(K)
    w = result[1].reshape(K)
    w_eps = result[2].T  # (T, 2)
    if emit:
        eps_out = jnp.stack([result[3], result[4]], axis=1)  # (T, 2, R, L)
        eps_out = jnp.transpose(eps_out, (2, 3, 0, 1)).reshape(K, T, 2)
        return S, w, w_eps, eps_out
    return S, w, w_eps


__all__ = ["bicycle_mppi_tick"]
