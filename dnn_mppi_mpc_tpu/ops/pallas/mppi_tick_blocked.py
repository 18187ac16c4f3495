"""K-blocked fused MPPI tick — pod-scale sample counts on one chip.

The single-block fused tick (ops/pallas/mppi_tick.py) holds the full ε tensor
in VMEM scratch: 2 × (T, K/128, 128) f32 = 2·T·K·4 bytes, which crosses the
~16 MB VMEM budget near K ≈ 40 000 at T = 50. This kernel removes that ceiling
with a sequential Pallas grid over K blocks and an **online softmax**
(running-ρ rescaling — the flash-attention normalizer trick applied to the
MPPI weight reduction):

  per grid step b (one K_BLK = RB·128 sample block):
    1. ε_b ~ N(0, Σ) regenerated on-chip from (seed, b) — per-block scratch
       only, never materialized for the full K;
    2. rollout + cost (identical semantics to mppi_tick.py: exploration split
       over *global* sample indices, in-rollout clamp, γ·uᵀΣ⁻¹v energy,
       nearest-waypoint window, circle/soft obstacles incl. drift, LAST quirk
       — mppi_differential_drive.py:111-126);
    3. online update of (ρ, η, Σₖ m·ε) with rescale exp(-λ·(ρ_old − ρ_new))
       when a new block lowers ρ — exact up to FP reassociation vs the
       single-block kernel (parity: tests/test_mppi_tick_blocked.py);
    4. last block divides the ε-accumulator by η.

Outputs (S, ρ, η, w_eps); the per-sample weights w = exp(-λ(S−ρ))/η are one
cheap XLA elementwise pass over S (K floats — negligible next to the rollout).

The same machinery provides the **two-phase sharded tick** (SURVEY §2.10(a),
round-2 verdict #3): phase 1 = this kernel in ``s_only`` mode per shard
(on-chip ε from (seed, global block offset)); the global softmax reductions
ρ = pmin, η = psum ride XLA collectives; phase 2 = :func:`weighted_noise_reduce`
regenerates the *same* ε from the same seeds and reduces Σ w·ε in-kernel —
the (K, T, nu) HBM noise tensor of the round-1/2 sharded path never exists.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mathx import hash_normal_pair, sincos_poly
from .mppi_tick import (
    LANES,
    effective_robot_radius,
    pack_obstacles,
    pick_r_blk,
    standard_normal_pair,
)

_NEG_BIG = -3.0e38  # sentinel for "no rho yet" (−inf-free: inf−inf traps)


def _read_scalars(scal_ref):
    """Unpack the 24-float SMEM scalar block (layout of mppi_tick.py)."""
    return dict(
        dt=scal_ref[0],
        umin0=scal_ref[1], umax0=scal_ref[2],
        umin1=scal_ref[3], umax1=scal_ref[4],
        n_exploit=scal_ref[5],
        sw=(scal_ref[6], scal_ref[7], scal_ref[8]),
        tw=(scal_ref[9], scal_ref[10], scal_ref[11]),
        x0=(scal_ref[12], scal_ref[13], scal_ref[14]),
        obs_radius=scal_ref[15],
        k_offset=scal_ref[16],
        inv_temp=scal_ref[17],
        chol=(scal_ref[18], scal_ref[19], scal_ref[20]),
        soft=(scal_ref[21], scal_ref[22]),
    )


def _gen_eps_block(seed, block_id, T, RB, chol, gaussian, eps0, eps1):
    """Seed the per-block PRNG stream and fill the two ε scratch planes.

    Seeding with (seed, block_id) gives each K block an independent,
    *reproducible* stream — phase 2 of the sharded tick regenerates identical
    ε by reusing the same pair. ``gaussian="hash"`` draws from the
    counter-based splitmix stand-in (mathx.hash_normal_pair) instead of the
    hardware PRNG: same (seed, block) stream contract, but CPU-lowerable, so
    the production kernels run under interpret mode on the virtual mesh
    (__graft_entry__.dryrun_multichip's shard-count invariance sweep).
    """
    l00, l10, l11 = chol
    if gaussian == "hash":
        z0, z1 = hash_normal_pair(seed, block_id, (T, RB, LANES))
    else:
        pltpu.prng_seed(seed, block_id)
        z0, z1 = standard_normal_pair((T, RB, LANES), gaussian)
    eps0[:, :, :] = l00 * z0
    eps1[:, :, :] = l10 * z0 + l11 * z1


def _rollout_block(
    sc, u_at, a_at, win, obs, eps0, eps1, k_base,
    *, T, RB, R_BLK, n_obs, last_only, obs_mode, moving_obs, iso_xy=False,
    sincos="native",
):
    """Roll out one (RB, 128) sample block, returning its cost surface S.

    Same loop as mppi_tick.py's kernel body (provenance there); factored here
    for the grid-blocked and fleet kernels. ``u_at(t, j)``/``a_at(t, j)`` are
    scalar accessors for the nominal controls / energy rows (the fleet kernel
    reads them through a leading member index — Mosaic cannot slice the
    member dim off a (1, T, 2) block as a sub-ref view). ``k_base`` is the
    global index of the block's first sample (exploration split over global
    K)."""
    shape = (R_BLK, LANES)
    soft_dist, soft_w = sc["soft"]

    def window_refs(xc, yc):
        # ``iso_xy``: symmetric x/y weights → cost from the running min
        # distance directly, dropping the rx/ry select chains (the
        # single-block kernel's lever, ops/pallas/mppi_tick.py)
        wx0, wy0, wyaw0 = win[0]
        dmin = (xc - wx0) * (xc - wx0) + (yc - wy0) * (yc - wy0)
        if not iso_xy:
            rx = jnp.full(shape, wx0, dtype=jnp.float32)
            ry = jnp.full(shape, wy0, dtype=jnp.float32)
        ryaw = jnp.full(shape, wyaw0, dtype=jnp.float32)
        for w in range(1, len(win)):
            wx, wy, wyaw = win[w]
            d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
            better = d < dmin
            dmin = jnp.where(better, d, dmin)
            if not iso_xy:
                rx = jnp.where(better, wx, rx)
                ry = jnp.where(better, wy, ry)
            ryaw = jnp.where(better, wyaw, ryaw)
        if iso_xy:
            return dmin, ryaw
        return rx, ry, ryaw

    def obstacle_penalty(xc, yc, t_f=None):
        pen = jnp.zeros(shape, dtype=jnp.float32)
        for ox, oy, orad, ovx, ovy in obs:
            if moving_obs and t_f is not None:
                ox = ox + ovx * t_f
                oy = oy + ovy * t_f
            dxo = xc - ox
            dyo = yc - oy
            d2 = dxo * dxo + dyo * dyo
            if obs_mode == "circle":
                rr = orad + sc["obs_radius"]
                pen = jnp.where(d2 < rr * rr, jnp.float32(1.0), pen)
            else:
                d = jnp.sqrt(d2 + jnp.float32(1e-12))
                pen = pen + jnp.where(
                    d < soft_dist, jnp.exp(soft_dist - d), jnp.float32(0.0)
                )
        return pen * (jnp.float32(1.0e7) if obs_mode == "circle" else soft_w)

    sw0, sw1, sw2 = sc["sw"]
    tw0, tw1, tw2 = sc["tw"]
    S_parts = []
    assert RB % R_BLK == 0
    for blk in range(RB // R_BLK):
        r0 = blk * R_BLK
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        k_idx = ((r0 + rows) * LANES + cols).astype(jnp.float32) + k_base
        exploit = k_idx < sc["n_exploit"]

        def body(t, carry, exploit=exploit, r0=r0):
            x, y, yaw, S = carry
            e0 = eps0[t, r0 : r0 + R_BLK]
            e1 = eps1[t, r0 : r0 + R_BLK]
            v0 = jnp.where(exploit, u_at(t, 0) + e0, e0)
            v1 = jnp.where(exploit, u_at(t, 1) + e1, e1)
            v0 = jnp.clip(v0, sc["umin0"], sc["umax0"])
            v1 = jnp.clip(v1, sc["umin1"], sc["umax1"])
            if sincos == "poly":
                sin_y, cos_y = sincos_poly(yaw)
            else:
                sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)
            x = x + v0 * cos_y * sc["dt"]
            y = y + v0 * sin_y * sc["dt"]
            yaw = yaw + v1 * sc["dt"]
            if iso_xy:
                dmin, ryaw = window_refs(x, y)
                c = sw0 * dmin + sw2 * (yaw - ryaw) * (yaw - ryaw)
            else:
                rx, ry, ryaw = window_refs(x, y)
                c = (
                    sw0 * (x - rx) * (x - rx)
                    + sw1 * (y - ry) * (y - ry)
                    + sw2 * (yaw - ryaw) * (yaw - ryaw)
                )
            c = c + a_at(t, 0) * v0 + a_at(t, 1) * v1
            if n_obs > 0:
                c = c + obstacle_penalty(x, y, t.astype(jnp.float32) * sc["dt"])
            S = c if last_only else S + c
            return x, y, yaw, S

        x0c, y0c, yaw0c = sc["x0"]
        x = jnp.full(shape, x0c, dtype=jnp.float32)
        y = jnp.full(shape, y0c, dtype=jnp.float32)
        yaw = jnp.full(shape, yaw0c, dtype=jnp.float32)
        S = jnp.zeros(shape, dtype=jnp.float32)
        x, y, yaw, S = jax.lax.fori_loop(0, T, body, (x, y, yaw, S))
        if iso_xy:
            dmin, ryaw = window_refs(x, y)
            S = S + tw0 * dmin + tw2 * (yaw - ryaw) * (yaw - ryaw)
        else:
            rx, ry, ryaw = window_refs(x, y)
            S = S + (
                tw0 * (x - rx) * (x - rx)
                + tw1 * (y - ry) * (y - ry)
                + tw2 * (yaw - ryaw) * (yaw - ryaw)
            )
        if n_obs > 0:
            S = S + obstacle_penalty(x, y)
        S_parts.append(S)
    return S_parts


def _blocked_kernel(
    seed_ref, scal_ref, u_ref, a_ref, win_ref, obs_ref,
    S_ref, stat_ref, weps_ref,
    eps0, eps1, acc_ref, neg_rho_ref, eta_ref,
    *, T, W, RB, R_BLK, NB, n_obs, last_only, gaussian, obs_mode, moving_obs,
    s_only, iso_xy, sincos="native",
):
    b = pl.program_id(0)
    sc = _read_scalars(scal_ref)
    win = [(win_ref[w, 0], win_ref[w, 1], win_ref[w, 2]) for w in range(W)]
    obs = [
        (obs_ref[o, 0], obs_ref[o, 1], obs_ref[o, 2], obs_ref[o, 3], obs_ref[o, 4])
        for o in range(n_obs)
    ]

    # seed_ref = (seed, block_offset): the offset shifts this program's PRNG
    # stream ids so different shards draw disjoint blocks (traced, not
    # static — shard_map runs ONE program with a dynamic axis_index)
    _gen_eps_block(
        seed_ref[0], b + seed_ref[1], T, RB, sc["chol"], gaussian, eps0, eps1
    )
    k_base = sc["k_offset"] + b.astype(jnp.float32) * jnp.float32(RB * LANES)
    S_parts = _rollout_block(
        sc, lambda t, j: u_ref[t, j], lambda t, j: a_ref[t, j],
        win, obs, eps0, eps1, k_base,
        T=T, RB=RB, R_BLK=R_BLK, n_obs=n_obs, last_only=last_only,
        obs_mode=obs_mode, moving_obs=moving_obs, iso_xy=iso_xy,
        sincos=sincos,
    )
    for i, S in enumerate(S_parts):
        S_ref[i * R_BLK : (i + 1) * R_BLK, :] = S

    if s_only:
        return

    # --- online softmax update (running ρ with rescale) -------------------
    @pl.when(b == 0)
    def _init():
        # track −ρ as a *max* so the empty-state sentinel is a large negative
        # finite float (inf − inf ⇒ NaN under the rescale otherwise)
        neg_rho_ref[0] = jnp.float32(_NEG_BIG)
        eta_ref[0] = jnp.float32(0.0)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    S_all = S_ref[:, :]  # this block's (RB, 128) costs, just written
    inv_temp = sc["inv_temp"]
    neg_rho_old = neg_rho_ref[0]
    neg_rho_new = jnp.maximum(neg_rho_old, -jnp.min(S_all))
    # old accumulators were relative to ρ_old; re-reference them to ρ_new:
    # exp(-λ(S−ρ_new)) = exp(-λ(S−ρ_old))·exp(λ(ρ_new−ρ_old)), and with
    # n = −ρ the factor is exp(λ(n_old − n_new)) ≤ 1.
    scale = jnp.exp(inv_temp * (neg_rho_old - neg_rho_new))
    m = jnp.exp(-inv_temp * (S_all + neg_rho_new))  # = exp(-λ(S − ρ_new))
    eta_new = eta_ref[0] * scale + jnp.sum(m)
    mb = m[None, :, :]
    w0 = jnp.sum(jnp.sum(eps0[:, :, :] * mb, axis=2), axis=1)  # (T,)
    w1 = jnp.sum(jnp.sum(eps1[:, :, :] * mb, axis=2), axis=1)
    acc_ref[0, :] = acc_ref[0, :] * scale + w0
    acc_ref[1, :] = acc_ref[1, :] * scale + w1
    neg_rho_ref[0] = neg_rho_new
    eta_ref[0] = eta_new

    @pl.when(b == NB - 1)
    def _finalize():
        stat_ref[0] = -neg_rho_ref[0]  # ρ
        stat_ref[1] = eta_ref[0]  # η
        weps_ref[:, :] = acc_ref[:, :] / eta_ref[0]


def _pack_scalars(
    u_min, u_max, n_exploit, stage_w, term_w, x0, robot_radius, obstacles,
    k_offset, inv_temperature, chol_sigma, soft_safety_distance, soft_weight, dt,
):
    return jnp.concatenate(
        [
            jnp.asarray([dt], jnp.float32),
            jnp.asarray([u_min[0], u_max[0], u_min[1], u_max[1]], jnp.float32),
            jnp.asarray([n_exploit], jnp.float32),
            stage_w.astype(jnp.float32),
            term_w.astype(jnp.float32),
            x0.astype(jnp.float32),
            jnp.asarray(
                [robot_radius if obstacles is not None else -1.0], jnp.float32
            ),
            jnp.reshape(jnp.asarray(k_offset, jnp.float32), (1,)),
            jnp.reshape(jnp.asarray(inv_temperature, jnp.float32), (1,)),
            jnp.reshape(chol_sigma.astype(jnp.float32), (4,))[jnp.asarray([0, 2, 3])],
            jnp.asarray([soft_safety_distance, soft_weight], jnp.float32),
            jnp.zeros((1,), jnp.float32),
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "T", "W", "K_BLK", "last_only", "s_only", "interpret", "gaussian",
        "collision", "iso_xy", "sincos",
    ),
)
def diffdrive_mppi_tick_blocked(
    seed: jnp.ndarray,
    u: jnp.ndarray,
    a: jnp.ndarray,
    chol_sigma: jnp.ndarray,
    x0: jnp.ndarray,
    window: jnp.ndarray,
    stage_w: jnp.ndarray,
    term_w: jnp.ndarray,
    u_min: jnp.ndarray,
    u_max: jnp.ndarray,
    dt: float,
    n_exploit: float,
    inv_temperature,
    obstacles: Optional[jnp.ndarray] = None,
    robot_radius: float = 0.5,  # PHYSICAL radius; margin applied in-wrapper
    safety_margin_rate: float = 1.5,
    obstacle_velocities: Optional[jnp.ndarray] = None,
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    k_offset: float = 0.0,
    block_offset=0,
    *,
    K: int,
    T: int,
    W: int,
    K_BLK: int = 10240,
    last_only: bool = False,
    s_only: bool = False,
    interpret: bool = False,
    gaussian: str = "popcount",
    collision: str = "circle",
    iso_xy: bool = False,
    sincos: str = "native",
):
    """Fused MPPI tick for K beyond the single-block VMEM budget.

    Returns ``(S (K,), rho (), eta (), w_eps (T, 2))`` — or just ``S`` when
    ``s_only`` (phase 1 of the sharded tick). ε is regenerated per (seed,
    block) on-chip; the traced ``block_offset`` operand offsets the per-block
    PRNG stream ids so different shards draw disjoint streams inside one
    shard_map program.

    PRNG-mode only (no injected-ε path — parity with the single-block kernel
    is established by emitting its ε at equal seeds is impossible across
    different stream layouts; instead the *blocked vs single-block* parity is
    tested by comparing against the scan engine fed this kernel's own
    regenerated noise via ``weighted_noise_reduce``'s emit mode, and by
    distributional closed-loop checks; see tests/test_mppi_tick_blocked.py).
    """
    assert gaussian in ("popcount", "popcount3", "box_muller", "hash"), gaussian
    assert collision in ("circle", "soft"), collision
    assert K % K_BLK == 0, f"K={K} must be a multiple of K_BLK={K_BLK}"
    assert K_BLK % LANES == 0
    RB = K_BLK // LANES
    NB = K // K_BLK
    R_BLK = pick_r_blk(RB)

    scal = _pack_scalars(
        u_min, u_max, n_exploit, stage_w, term_w, x0,
        effective_robot_radius(robot_radius, safety_margin_rate), obstacles,
        k_offset, inv_temperature, chol_sigma, soft_safety_distance,
        soft_weight, dt,
    )
    obs, n_obs = pack_obstacles(obstacles, obstacle_velocities)

    kernel = functools.partial(
        _blocked_kernel,
        T=T, W=W, RB=RB, R_BLK=R_BLK, NB=NB, n_obs=n_obs,
        last_only=last_only, gaussian=gaussian, obs_mode=collision,
        moving_obs=obstacle_velocities is not None, s_only=s_only,
        iso_xy=iso_xy, sincos=sincos,
    )

    grid = (NB,)
    out_shape = [
        jax.ShapeDtypeStruct((K // LANES, LANES), jnp.float32),  # S
        jax.ShapeDtypeStruct((2,), jnp.float32),  # (rho, eta)
        jax.ShapeDtypeStruct((2, T), jnp.float32),  # w_eps rows
    ]
    out_specs = [
        pl.BlockSpec((RB, LANES), lambda b: (b, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        pl.BlockSpec(memory_space=pltpu.VMEM),  # u
        pl.BlockSpec(memory_space=pltpu.VMEM),  # a
        pl.BlockSpec(memory_space=pltpu.VMEM),  # window
        pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles
    ]
    scratch_shapes = [
        pltpu.VMEM((T, RB, LANES), jnp.float32),  # eps0
        pltpu.VMEM((T, RB, LANES), jnp.float32),  # eps1
        pltpu.VMEM((2, T), jnp.float32),  # weps accumulator
        pltpu.SMEM((1,), jnp.float32),  # −ρ running
        pltpu.SMEM((1,), jnp.float32),  # η running
    ]
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        jnp.stack(
            [
                jnp.reshape(seed, ()).astype(jnp.int32),
                jnp.reshape(jnp.asarray(block_offset), ()).astype(jnp.int32),
            ]
        ),
        scal,
        u.astype(jnp.float32),
        a.astype(jnp.float32),
        window.astype(jnp.float32),
        obs,
    )
    S = result[0].reshape(K)
    if s_only:
        return S
    rho, eta = result[1][0], result[1][1]
    return S, rho, eta, result[2].T  # w_eps (T, 2)


def _weighted_reduce_kernel(
    seed_ref, scal_ref, w_ref, weps_ref, eps0, eps1, acc_ref,
    *, T, RB, NB, gaussian, eps_outs=None,
):
    b = pl.program_id(0)
    chol = (scal_ref[0], scal_ref[1], scal_ref[2])
    _gen_eps_block(seed_ref[0], b + seed_ref[1], T, RB, chol, gaussian, eps0, eps1)

    @pl.when(b == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    wb = w_ref[:, :][None, :, :]  # this block's (RB, 128) weights
    acc_ref[0, :] = acc_ref[0, :] + jnp.sum(jnp.sum(eps0[:, :, :] * wb, axis=2), axis=1)
    acc_ref[1, :] = acc_ref[1, :] + jnp.sum(jnp.sum(eps1[:, :, :] * wb, axis=2), axis=1)
    if eps_outs is not None:
        eps_outs[0][0, :, :, :] = eps0[:, :, :]
        eps_outs[1][0, :, :, :] = eps1[:, :, :]

    @pl.when(b == NB - 1)
    def _finalize():
        weps_ref[:, :] = acc_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "T", "K_BLK", "interpret", "gaussian", "emit_eps",
    ),
)
def weighted_noise_reduce(
    seed: jnp.ndarray,
    w: jnp.ndarray,  # (K,) weights (already normalized, or m/η partials)
    chol_sigma: jnp.ndarray,
    block_offset=0,
    *,
    K: int,
    T: int,
    K_BLK: int = 10240,
    interpret: bool = False,
    gaussian: str = "popcount",
    emit_eps: bool = False,
):
    """Σₖ wₖ·εₖ with ε regenerated on-chip — phase 2 of the sharded tick.

    Regenerates the exact per-(seed, block) streams of
    :func:`diffdrive_mppi_tick_blocked` (same ``block_offset``) and
    reduces against the supplied weights; returns ``w_eps (T, nu=2)``.
    ``emit_eps`` additionally returns ε as (K, T, 2) — used only by the
    parity tests to cross-check the regenerated streams against the scan
    engine (never on the hot path: it materializes the tensor this kernel
    exists to avoid).
    """
    assert K % K_BLK == 0 and K_BLK % LANES == 0
    RB = K_BLK // LANES
    NB = K // K_BLK
    chol3 = jnp.reshape(chol_sigma.astype(jnp.float32), (4,))[jnp.asarray([0, 2, 3])]

    out_shape = [jax.ShapeDtypeStruct((2, T), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if emit_eps:
        out_shape += [
            jax.ShapeDtypeStruct((NB, T, RB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((NB, T, RB, LANES), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, T, RB, LANES), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, T, RB, LANES), lambda b: (b, 0, 0, 0)),
        ]

    def kernel(seed_ref, scal_ref, w_ref, *rest):
        if emit_eps:
            weps_ref, e0o, e1o = rest[0], rest[1], rest[2]
            eps0, eps1, acc_ref = rest[3], rest[4], rest[5]
            eps_outs = (e0o, e1o)  # (1, T, RB, L) blocks, one per grid step
        else:
            weps_ref, eps0, eps1, acc_ref = rest[0], rest[1], rest[2], rest[3]
            eps_outs = None
        _weighted_reduce_kernel(
            seed_ref, scal_ref, w_ref, weps_ref, eps0, eps1, acc_ref,
            T=T, RB=RB, NB=NB, gaussian=gaussian,
            eps_outs=eps_outs,
        )

    result = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, LANES), lambda b: (b, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T, RB, LANES), jnp.float32),
            pltpu.VMEM((T, RB, LANES), jnp.float32),
            pltpu.VMEM((2, T), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.stack(
            [
                jnp.reshape(seed, ()).astype(jnp.int32),
                jnp.reshape(jnp.asarray(block_offset), ()).astype(jnp.int32),
            ]
        ),
        chol3,
        w.astype(jnp.float32).reshape(K // LANES, LANES),
    )
    w_eps = result[0].T
    if emit_eps:
        # (NB, T, RB, L) → (K, T, 2) with k = (b·RB + r)·128 + lane
        e0 = jnp.transpose(result[1], (0, 2, 3, 1)).reshape(K, T)
        e1 = jnp.transpose(result[2], (0, 2, 3, 1)).reshape(K, T)
        return w_eps, jnp.stack([e0, e1], axis=-1)
    return w_eps


def _fleet_kernel(
    seed_ref, scal_ref, x0_ref, u_ref, a_ref, win_ref, obs_ref,
    S_ref, w_ref, weps_ref,
    eps0, eps1,
    *, T, W, RB, R_BLK, n_obs, last_only, gaussian, obs_mode, moving_obs,
    iso_xy, sincos="native",
):
    """One fleet member per grid step: complete tick (gen ε → rollout →
    softmax → weighted reduce) on member b's own u/x0/window/obstacles.

    seeds/x0 live whole in SMEM (dynamic scalar reads by member id); the
    vector operands (u, a, window, obstacles) are grid-blocked VMEM."""
    b = pl.program_id(0)
    sc = _read_scalars(scal_ref)
    sc["x0"] = (x0_ref[b, 0], x0_ref[b, 1], x0_ref[b, 2])  # per-member x0
    win = [(win_ref[0, w, 0], win_ref[0, w, 1], win_ref[0, w, 2]) for w in range(W)]
    obs = [
        (
            obs_ref[0, o, 0], obs_ref[0, o, 1], obs_ref[0, o, 2],
            obs_ref[0, o, 3], obs_ref[0, o, 4],
        )
        for o in range(n_obs)
    ]
    _gen_eps_block(
        seed_ref[b], jnp.int32(0), T, RB, sc["chol"], gaussian, eps0, eps1
    )
    S_parts = _rollout_block(
        sc, lambda t, j: u_ref[0, t, j], lambda t, j: a_ref[0, t, j],
        win, obs, eps0, eps1, jnp.float32(0.0),
        T=T, RB=RB, R_BLK=R_BLK, n_obs=n_obs, last_only=last_only,
        obs_mode=obs_mode, moving_obs=moving_obs, iso_xy=iso_xy,
        sincos=sincos,
    )
    for i, S in enumerate(S_parts):
        S_ref[0, i * R_BLK : (i + 1) * R_BLK, :] = S

    S_all = S_ref[0, :, :]
    rho = jnp.min(S_all)
    m = jnp.exp(-sc["inv_temp"] * (S_all - rho))
    eta = jnp.sum(m)
    w = m / eta
    w_ref[0, :, :] = w
    wb = w[None, :, :]
    weps_ref[0, 0, :] = jnp.sum(jnp.sum(eps0[:, :, :] * wb, axis=2), axis=1)
    weps_ref[0, 1, :] = jnp.sum(jnp.sum(eps1[:, :, :] * wb, axis=2), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "K", "T", "W", "last_only", "interpret", "gaussian", "collision",
        "iso_xy", "sincos",
    ),
)
def fleet_mppi_tick(
    seeds: jnp.ndarray,  # (B,) int32 per-member PRNG seeds
    u: jnp.ndarray,  # (B, T, 2) per-member nominal sequences
    a: jnp.ndarray,  # (B, T, 2) per-member γ·uᵀΣ⁻¹
    chol_sigma: jnp.ndarray,  # (2, 2) shared Cholesky factor of Σ
    x0: jnp.ndarray,  # (B, 3) per-member states
    windows: jnp.ndarray,  # (B, W, 3) per-member waypoint windows
    stage_w: jnp.ndarray,  # (3,) shared
    term_w: jnp.ndarray,
    u_min: jnp.ndarray,
    u_max: jnp.ndarray,
    dt: float,
    n_exploit: float,  # per-member exploration split over K
    inv_temperature,
    obstacles: Optional[jnp.ndarray] = None,  # (B, n_obs, 3) per-member
    robot_radius: float = 0.5,  # PHYSICAL radius; margin applied in-wrapper
    safety_margin_rate: float = 1.5,
    obstacle_velocities: Optional[jnp.ndarray] = None,  # (B, n_obs, 2)
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    *,
    B: int,
    K: int,  # samples PER MEMBER (one VMEM block: K ≤ ~15k at T=50)
    T: int,
    W: int,
    last_only: bool = False,
    interpret: bool = False,
    gaussian: str = "popcount",
    collision: str = "circle",
    iso_xy: bool = False,
    sincos: str = "native",
):
    """Lane-batched MPPI fleet tick: B independent controllers, one Pallas
    launch — the MPPI analog of the lane-batched NMPC QP fleet (round-2
    verdict #6; reference multi-robot collection,
    train/bullet_mpc_differential_drive.py:119-157).

    Grid over members; each grid step runs member b's complete tick (on-chip
    ε from seeds[b], rollout over its own u/x0/window/obstacles, softmax,
    weighted reduce) with only that member's ε in VMEM. Member b's streams
    equal ``diffdrive_mppi_tick_blocked(seed=seeds[b], K_BLK=K)`` — the
    per-member parity oracle (tests/test_fleet_tick.py). Returns
    ``(S (B, K), w (B, K), w_eps (B, T, 2))``.
    """
    assert gaussian in ("popcount", "popcount3", "box_muller", "hash"), gaussian
    assert collision in ("circle", "soft"), collision
    assert K % LANES == 0
    RB = K // LANES
    R_BLK = pick_r_blk(RB)

    scal = _pack_scalars(
        u_min, u_max, n_exploit, stage_w, term_w,
        jnp.zeros((3,), jnp.float32),  # x0 slot unused (per-member input)
        effective_robot_radius(robot_radius, safety_margin_rate), obstacles,
        0.0, inv_temperature, chol_sigma,
        soft_safety_distance, soft_weight, dt,
    )
    if obstacles is None:
        obs = jnp.zeros((B, 1, 5), jnp.float32)
        n_obs = 0
    else:
        ob = obstacles.astype(jnp.float32)
        if ob.shape[-1] == 2:
            ob = jnp.concatenate(
                [ob, jnp.zeros(ob.shape[:-1] + (1,), jnp.float32)], axis=-1
            )
        vel = (
            obstacle_velocities[..., :2].astype(jnp.float32)
            if obstacle_velocities is not None
            else jnp.zeros(ob.shape[:-1] + (2,), jnp.float32)
        )
        obs = jnp.concatenate([ob[..., :3], vel], axis=-1)
        n_obs = obstacles.shape[-2]

    kernel = functools.partial(
        _fleet_kernel,
        T=T, W=W, RB=RB, R_BLK=R_BLK, n_obs=n_obs,
        last_only=last_only, gaussian=gaussian, obs_mode=collision,
        moving_obs=obstacle_velocities is not None, iso_xy=iso_xy,
        sincos=sincos,
    )
    result = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shared scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0 (B, 3)
            pl.BlockSpec((1, T, 2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, 2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, W, 3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, max(n_obs, 1), 5), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RB, LANES), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, RB, LANES), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 2, T), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, RB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, RB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, RB, LANES), jnp.float32),
            pltpu.VMEM((T, RB, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        seeds.astype(jnp.int32),
        scal,
        x0.astype(jnp.float32),
        u.astype(jnp.float32),
        a.astype(jnp.float32),
        windows.astype(jnp.float32),
        obs,
    )
    S = result[0].reshape(B, K)
    w = result[1].reshape(B, K)
    w_eps = jnp.swapaxes(result[2], 1, 2)  # (B, T, 2)
    return S, w, w_eps


__all__ = [
    "diffdrive_mppi_tick_blocked",
    "weighted_noise_reduce",
    "fleet_mppi_tick",
]
