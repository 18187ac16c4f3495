"""Fully-fused MPPI control-tick kernel for the diff-drive flagship.

One single-program Pallas kernel implements the whole sample-space part of an
MPPI tick (the hot 99% of controllers/mppi_differential_drive.py:87-165):

  1. ε ~ N(0, Σ) generated **on-chip** (`pltpu.prng_random_bits` → Box-Muller
     → Cholesky coloring), eliminating the (K, T, nu) HBM noise tensor, the
     host-side transpose, and the separate w·ε einsum re-read that made the
     round-1 path (ops/pallas/rollout.py + XLA pre/post ops) dispatch- and
     HBM-bound;
  2. the K-wide rollout + stage/terminal cost accumulation (semantics of
     mppi_differential_drive.py:111-126, identical to ops/pallas/rollout.py:
     exploration split, in-rollout clamp, γ·uᵀΣ⁻¹v energy term, unrolled
     nearest-waypoint window, optional circle obstacles, LAST quirk);
  3. the softmax weights with ρ = min S (…:167-180);
  4. the weighted-noise reduction Σₖ wₖ·εₖ (…:132-135).

The only HBM traffic of a tick is a handful of (T, nu)/scalar parameters in
and (S, w, w_eps) out. K lives on a single (R, 128) register block (K = R·128;
K = 10 240 → (80, 128), ~40 KB — far under VMEM), T is an in-register
sequential ``fori_loop``, and ε lives in two (T, R, 128) VMEM scratch buffers
(2 × 2 MB at the flagship scale).

Noise modes (static):
  * ``gen_noise=True``  — on-chip PRNG from an int32 seed (TPU-only; the
    Mosaic PRNG primitives have no CPU interpreter lowering).
  * ``gen_noise=False`` — ε supplied as an input in (T, nu, R, 128) layout;
    bit-identical compute path, used for CPU interpret-mode parity tests and
    for the on-TPU PRNG self-consistency test (generated ε is emitted via
    ``emit_eps=True`` and fed back through this mode).

This kernel is single-device by construction: the softmax normalization is a
*global* reduction over K, so the sample-sharded path (SURVEY §2.10) keeps
using the split rollout kernel + XLA `pmin`/`psum` collectives
(solvers/mppi.py::make_pallas_diffdrive_rollout).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mathx import sincos_poly

LANES = 128
_TWO_PI = 6.283185307179586


def _uniform_01(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits → uniform float32 in (0, 1].

    Top 23 bits into the mantissa of [1, 2), then 2 − x ∈ (0, 1] — strictly
    positive so log() below is safe (tail truncates at √(−2·ln 2⁻²³) ≈ 5.6σ).
    """
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f


def standard_normal_pair(shape, gaussian: str):
    """Two independent N(0,1) tensors from the seeded on-chip PRNG.

    ``"popcount"``: transcendental-free — popcount of a random u32 is
    Binomial(32, ½) ≈ N(16, 8); convolving with an independent U(0,1] smooths
    the lattice: z = (pc − 16.5 + u)/√(8 + 1/12). Exact mean/variance by
    construction, excess kurtosis −0.062, support ±5.8σ. Box-Muller costs 2
    transcendental evals per normal on the VPU — the single largest cost of a
    fused MPPI tick at W ≤ 20 (slope-measured 114 → 95 µs/solve at K=10 240,
    T=50; docs/PERF.md) — while this path is adds/shifts/popcounts only.

    ``"box_muller"``: the classical exact transform (5.6σ mantissa
    truncation), kept for A/B comparison.

    Both modes' moments and the tick self-consistency (emit ε → re-inject →
    identical outputs) are verified on hardware by tests/test_tick_prng.py.
    """
    if gaussian in ("popcount", "popcount3"):
        inv_sig = jnp.float32(1.0 / 2.8431203515386634)  # 1/√(8 + 1/12)

        def pc_f32(b):
            return pltpu.bitcast(
                jax.lax.population_count(b), jnp.int32
            ).astype(jnp.float32)

        if gaussian == "popcount3":
            # 3 PRNG words per normal PAIR instead of 4: the two smoothing
            # uniforms come from ONE word and its 16-bit rotation. The
            # shared bits land in disjoint significance ranges (low mantissa
            # of u1 vs high of u2 and vice versa), so corr(u1, u2) ≈ 2^-18
            # and corr(z0, z1) ≈ 2^-21 — far below the estimator noise any
            # MPPI reduction sees. Saves one (T, R, 128) hardware-PRNG draw
            # per pair (~4% of the lean flagship kernel, A/B in
            # docs/PERF.md); moments/independence spot-checked on hardware
            # in tests/test_tick_prng.py.
            b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            b3 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            b3r = (b3 << jnp.uint32(16)) | (b3 >> jnp.uint32(16))
            z0 = (pc_f32(b1) - 16.5 + _uniform_01(b3)) * inv_sig
            z1 = (pc_f32(b2) - 16.5 + _uniform_01(b3r)) * inv_sig
            return z0, z1

        def normal():
            b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            bu = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            return (pc_f32(b) - 16.5 + _uniform_01(bu)) * inv_sig

        return normal(), normal()
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_01(b1)
    u2 = _uniform_01(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = jnp.float32(_TWO_PI) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)




def effective_robot_radius(robot_radius, safety_margin_rate):
    """The reference's circle-collision rule: the ROBOT radius is inflated by
    the safety margin (mppi_differential_drive_obs.py:303-305; 0.5 × 1.5 =
    0.75 effective). Defined ONCE here; every circle-mode kernel wrapper
    applies it so a caller passing the physical radius gets the reference
    semantics by default (round-4 margin-bug class). Works on python floats
    and traced values alike."""
    return robot_radius * safety_margin_rate


def pack_obstacles(obstacles, obstacle_velocities):
    """(n_obs, 2|3) centers(+radii) + optional velocities → (n_obs, 5) rows.

    Rows are (x, y, r, vx, vy): zero drift when static, zero radius when only
    centers are given (soft mode ignores r). Shared by every fused tick
    kernel so the packing layout is defined once. Returns ``(rows, n_obs)``
    with a single zero row when there are no obstacles.
    """
    if obstacles is None:
        return jnp.zeros((1, 5), jnp.float32), 0
    ob = obstacles.astype(jnp.float32)
    if ob.shape[1] == 2:
        ob = jnp.concatenate([ob, jnp.zeros((ob.shape[0], 1), jnp.float32)], axis=1)
    vel = (
        obstacle_velocities[..., :2].astype(jnp.float32)
        if obstacle_velocities is not None
        else jnp.zeros((ob.shape[0], 2), jnp.float32)
    )
    return jnp.concatenate([ob[:, :3], vel], axis=1), obstacles.shape[0]


def fused_epilogue_block(
    weps_ref, ft_ref, urows_ref, unew_ref, ushift_ref, ok_ref, T: int
) -> None:
    """The whole XLA tick tail in-kernel (round-2 verdict #4), shared by the
    fused tick kernels: smoothing filter as one (nu,T)@(T,T) matmul against
    Fᵀ (filters.filter_matrix), nominal update u+F·wε
    (mppi_differential_drive.py:136-141), non-finite rejection with
    hold-previous (SURVEY §5.3), and the receding-horizon shift (…:162-163)
    — removing the chain of tiny sequential XLA ops that cost ~30% of a
    flagship tick (docs/PERF.md)."""
    wr = weps_ref[:, :]  # (nu, T)
    un = jax.lax.dot_general(
        wr,
        ft_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # match apply_filter's f32
        # matmul — the TPU default would drop to bf16 passes
    )
    un = urows_ref[:, :] + un
    # isfinite without relying on an isfinite lowering: NaN fails x==x,
    # ±inf fails |x| < 3.4e38
    finite_mask = (un == un) & (jnp.abs(un) < jnp.float32(3.4e38))
    finite = jnp.min(finite_mask.astype(jnp.float32))
    un = jnp.where(finite > 0.5, un, urows_ref[:, :])
    unew_ref[:, :] = un
    ushift_ref[:, 0 : T - 1] = un[:, 1:T]
    ushift_ref[:, T - 1 : T] = un[:, T - 1 : T]
    ok_ref[0] = finite


def pick_r_blk(R: int, target: int = 40) -> int:
    """Rollout block rows: the tile-aligned (multiple-of-8) divisor of R
    closest to ``target``.

    Measured on the chip at the flagship K=10 240 (R=80), T=50, W=20 —
    R_BLK 8: 88.8 µs/tick, 16: 52.6, 40: 41.9–47.0, 80: 54.7. Wider blocks
    amortize fori_loop overhead and expose ILP across rows until the
    4×(R_BLK,128) carry overflows vector registers; non-multiple-of-8 blocks
    at non-zero offsets (e.g. 20 of R=80) are slower than either neighbor
    because every eps slice then crosses sublane-tile boundaries.

    When R has no multiple-of-8 divisor (K not a multiple of 1024), fall back
    to R_BLK=R: a single block always starts at offset 0, so no slice crosses
    a tile boundary (only the ragged final tile pads).
    """
    best = 0
    for c in range(8, R + 1, 8):
        if R % c == 0 and abs(c - target) < abs(best - target):
            best = c
    return best if best else R


def _tick_kernel(
    seed_ref,  # SMEM (1,) int32 PRNG seed — LEAN: (2,) uint32 carried key
    scal_ref,  # SMEM (26,) packed f32 scalars — LEAN: (2, 2) f32 Σ
    u_ref,  # VMEM (T, 2) nominal controls — LEAN: (2, T) row layout
    a_ref,  # VMEM (T, 2) γ·u_tᵀΣ⁻¹ rows — LEAN: SMEM (3,) x0
    win_ref,  # VMEM (W, 3) waypoint window (x, y, yaw)
    obs_ref,  # VMEM (n_obs, 5) obstacles (x, y, r, vx, vy) — may be zero rows
    *rest,  # [ft, u_rows] | [eps0_in, eps1_in] | outputs | [eps scratch ×2]
    T: int,
    W: int,
    R: int,
    R_BLK: int,
    n_obs: int,
    last_only: bool,
    gen_noise: bool,
    emit_eps: bool,
    gaussian: str,
    obs_mode: str,  # "circle" (hard ×1e7) | "soft" (exp penalty)
    moving_obs: bool,  # obstacles drift at (vx, vy) during the rollout
    fuse_epilogue: bool,  # smoothing matmul + update + finite-hold + shift
    iso_xy: bool,  # sw0==sw1 and tw0==tw1 specialization (see wrapper doc)
    rollout_carry: bool = False,  # per-sample monotone waypoint-window carry
    carry_W: int = 0,  # per-step search span in carry mode (the scan path's
    # waypoint_search_len; W is then the larger pre-gathered window)
    sincos: str = "native",  # "native" VPU transcendentals | "poly" (mathx)
    control_cost: bool = False,  # + Σⱼ rcⱼ·vⱼ² per stage (pytorch_mppi spec)
    fold_anchor: bool = False,  # tick-level anchor search runs IN-kernel
    P: int = 0,  # path length (fold_anchor mode: win_ref is the full path)
    span: int = 0,  # anchor search span (ops/waypoints.nearest_waypoint)
    lean: bool = False,  # minimum-prologue mode (see wrapper docstring)
    lean_consts: tuple = (),  # (dt, n_exploit, inv_temp, gamma) statics
):
    rest = list(rest)
    if lean:
        # Lean slot map (docstring of diffdrive_mppi_tick): the XLA-side
        # scalar packing, Cholesky/Σ⁻¹, energy rows and threefry/Weyl seed
        # chain all collapse into in-kernel scalar work, so the per-tick
        # device program is [anchor ops, transpose, kernel] only.
        key_ref = seed_ref  # (2,) uint32 carried key words
        sig_ref = scal_ref  # (2, 2) f32 Σ
        x0_ref = a_ref  # (3,) x0  (u_ref keeps the classic (T, 2) layout)
        umin_ref = rest.pop(0)  # SMEM (2,)
        umax_ref = rest.pop(0)  # SMEM (2,)
        sw_ref = rest.pop(0)  # SMEM (3,)
        tw_ref = rest.pop(0)  # SMEM (3,)
    if fold_anchor:
        prev_ref = rest.pop(0)  # SMEM (1,) int32: previous tick anchor
    if fuse_epilogue:
        ft_ref = rest.pop(0)  # VMEM (T, T) transposed filter matrix Fᵀ
        urows_ref = rest.pop(0)  # VMEM (2, T) nominal controls, rows
    if not gen_noise:
        eps0, eps1 = rest.pop(0), rest.pop(0)  # (T, R, 128) inputs
    S_ref, w_ref, weps_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if fold_anchor:
        anchor_ref = rest.pop(0)  # SMEM (1,) int32: new tick anchor (wp_idx)
    if rollout_carry:
        wpadv_ref = rest.pop(0)  # SMEM (1,) int32: max carried advance over K
    if fuse_epilogue:
        unew_ref, ushift_ref = rest.pop(0), rest.pop(0)  # (2, T) each
        ok_ref = rest.pop(0)  # SMEM (1,) f32: 1.0 = finite update applied
    if lean:
        knext_ref = rest.pop(0)  # SMEM (2,) uint32: Weyl-advanced key out
    if emit_eps:
        eps0_out, eps1_out = rest.pop(0), rest.pop(0)
    if gen_noise:
        eps0, eps1 = rest.pop(0), rest.pop(0)  # (T, R, 128) scratch
    if lean and fold_anchor:
        win_scr = rest.pop(0)  # VMEM (3, PL) rolled-window scratch

    if lean:
        dt_c, n_exploit_c, inv_temp_c, gamma_c = lean_consts
        dt = jnp.float32(dt_c)
        n_exploit = jnp.float32(n_exploit_c)
        inv_temp = jnp.float32(inv_temp_c)
        umin0, umax0 = umin_ref[0], umax_ref[0]
        umin1, umax1 = umin_ref[1], umax_ref[1]
        sw0, sw1, sw2 = sw_ref[0], sw_ref[1], sw_ref[2]
        tw0, tw1, tw2 = tw_ref[0], tw_ref[1], tw_ref[2]
        x0, y0, yaw0 = x0_ref[0], x0_ref[1], x0_ref[2]
        obs_pen_radius = jnp.float32(-1.0)  # lean mode: no obstacles
        k_offset = jnp.float32(0.0)
        soft_dist = soft_w = jnp.float32(0.0)
        rc0 = rc1 = jnp.float32(0.0)
        # 2×2 Cholesky + inverse from Σ, in-kernel (scalar unit)
        s00, s01, s11 = sig_ref[0, 0], sig_ref[0, 1], sig_ref[1, 1]
        l00 = jnp.sqrt(s00)
        l10 = s01 / l00
        l11 = jnp.sqrt(s11 - l10 * l10)
        det = s00 * s11 - s01 * s01
        i00, i01, i11 = s11 / det, -s01 / det, s00 / det
        gam = jnp.float32(gamma_c)
    else:
        # scalar layout
        dt = scal_ref[0]
        umin0, umax0 = scal_ref[1], scal_ref[2]
        umin1, umax1 = scal_ref[3], scal_ref[4]
        n_exploit = scal_ref[5]
        sw0, sw1, sw2 = scal_ref[6], scal_ref[7], scal_ref[8]
        tw0, tw1, tw2 = scal_ref[9], scal_ref[10], scal_ref[11]
        x0, y0, yaw0 = scal_ref[12], scal_ref[13], scal_ref[14]
        obs_pen_radius = scal_ref[15]  # robot radius; < 0 → obstacles off
        k_offset = scal_ref[16]  # global sample-index offset
        inv_temp = scal_ref[17]
        l00, l10, l11 = scal_ref[18], scal_ref[19], scal_ref[20]  # chol(Σ)
        soft_dist, soft_w = scal_ref[21], scal_ref[22]  # soft obstacle params
        rc0, rc1 = scal_ref[23], scal_ref[24]  # diag action-cost weights

    if gen_noise:
        # On-chip ε ~ N(0, Σ): standard normals colored by the
        # lower-triangular Cholesky factor of Σ. Bulk PRNG calls; all
        # transforms are full-tensor VPU ops over (T, R, 128).
        if lean:
            # seed = XOR of the carried key words; the Weyl advance writes
            # the next key out — the whole XLA seed chain of mppi_step
            # (xor/bitcast/add fusions) collapses to 4 scalar ops here
            pltpu.prng_seed(key_ref[0] ^ key_ref[1])
            knext_ref[0] = key_ref[0] + jnp.uint32(0x9E3779B9)
            knext_ref[1] = key_ref[1] + jnp.uint32(0x85EBCA6B)
        else:
            pltpu.prng_seed(seed_ref[0])
        z0, z1 = standard_normal_pair((T, R, LANES), gaussian)
        eps0[:, :, :] = l00 * z0
        eps1[:, :, :] = l10 * z0 + l11 * z1
        if emit_eps:
            eps0_out[:, :, :] = eps0[:, :, :]
            eps1_out[:, :, :] = eps1[:, :, :]

    # Hoist waypoint/obstacle scalars out of the T loop (VMEM scalar reads in
    # the loop cost thousands of scalar loads — docs/PERF.md Mosaic lessons).
    if fold_anchor and lean:
        # VECTORIZED in-kernel anchor advance (round-5). The scalar-serial
        # fold below costs ~2.7 µs at the flagship shape (≈100 dynamic SMEM
        # loads) — more than the XLA ops it removes. This path instead gets
        # the path in LANE layout (win_ref is (3, PL): x/y/yaw rows, one
        # waypoint per lane) and runs the whole search on the VPU:
        # masked-distance min over lanes → first-argmin extraction →
        # pltpu.roll so the clipped W-window starts at lane 0 → one scratch
        # store, after which the cost chain reads the SAME static-index
        # scalars as the classic mode. Semantics identical to
        # ops/waypoints.nearest_waypoint + the wrapper clip.
        assert not rollout_carry, "fold_anchor is tick-anchored by definition"
        PL = win_ref.shape[1]
        prev = prev_ref[0]
        s0 = jnp.clip(prev, jnp.int32(0), jnp.int32(max(P - span, 0)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, PL), 1)
        px = win_ref[0:1, :]
        py = win_ref[1:2, :]
        dxv = px - x0
        dyv = py - y0
        d2 = dxv * dxv + dyv * dyv
        inwin = (lane >= s0) & (lane < s0 + jnp.int32(span))
        d2m = jnp.where(inwin, d2, jnp.float32(3.0e38))
        dmin_v = jnp.min(d2m)
        anchor = jnp.min(
            jnp.where((d2m == dmin_v) & inwin, lane, jnp.int32(PL))
        )
        anchor_ref[0] = anchor
        wstart = jnp.clip(anchor, jnp.int32(0), jnp.int32(max(P - W, 0)))
        win_scr[:, :] = pltpu.roll(win_ref[:, :], -wstart, 1)
        win = [(win_scr[0, w], win_scr[1, w], win_scr[2, w]) for w in range(W)]
    elif fold_anchor:
        # The tick-level anchor advance (ops/waypoints.nearest_waypoint +
        # the wrapper's window clip) runs HERE, killing two XLA ops + their
        # launch gaps per tick (docs/PERF.md trace attribution). win_ref is
        # the FULL (P, 3) path; ~ (span·2 + W·3) dynamic scalar reads once
        # per launch. Semantics replicated exactly:
        #   s0     = clip(prev, 0, max(P−span, 0))       [search window]
        #   anchor = s0 + first-argmin d²(x0, path[s0+w]) (w < span)
        #   wstart = clip(anchor, 0, max(P−W, 0))        [rollout window]
        assert not rollout_carry, "fold_anchor is tick-anchored by definition"
        prev = prev_ref[0]
        s0 = jnp.clip(prev, jnp.int32(0), jnp.int32(max(P - span, 0)))
        dx0 = x0 - win_ref[s0, 0]
        dy0 = y0 - win_ref[s0, 1]
        dbest = dx0 * dx0 + dy0 * dy0
        local = jnp.int32(0)
        for w in range(1, span):
            dx = x0 - win_ref[s0 + w, 0]
            dy = y0 - win_ref[s0 + w, 1]
            d = dx * dx + dy * dy
            better = d < dbest
            dbest = jnp.where(better, d, dbest)
            local = jnp.where(better, jnp.int32(w), local)
        anchor = s0 + local
        anchor_ref[0] = anchor
        wstart = jnp.clip(anchor, jnp.int32(0), jnp.int32(max(P - W, 0)))
        win = [
            (win_ref[wstart + w, 0], win_ref[wstart + w, 1], win_ref[wstart + w, 2])
            for w in range(W)
        ]
    else:
        win = [(win_ref[w, 0], win_ref[w, 1], win_ref[w, 2]) for w in range(W)]
    obs = [
        (obs_ref[o, 0], obs_ref[o, 1], obs_ref[o, 2], obs_ref[o, 3], obs_ref[o, 4])
        for o in range(n_obs)
    ]
    shape = (R_BLK, LANES)

    if lean:
        # Expanded-distance coefficients, precomputed ONCE per launch
        # (scalar unit): ‖p − q_w‖² = (xc²+yc²) + (−2wx)·xc + (−2wy)·yc
        # + (wx²+wy²). The base xc²+yc² is w-independent, so it cancels in
        # every comparison of the running-min chain — each waypoint costs
        # TWO fused multiply-adds instead of the 4-5 sub/mul ops of the
        # naive form, in the loop that dominates the whole kernel
        # (W·T·K evaluations). The base is re-added once per step for the
        # cost value. Rounding differs from the naive form by ~1 ulp of
        # |p|² (tie-break flips possible on exact ties) — lean mode is
        # PRNG-only, where parity is tolerance-based by construction.
        win2 = [
            (-2.0 * wx, -2.0 * wy, wx * wx + wy * wy, wyaw)
            for (wx, wy, wyaw) in win
        ]

    def window_refs(xc, yc):
        """Running-min nearest-waypoint lookup (first-argmin tie rule).

        ``iso_xy`` mode returns (dmin, ryaw) instead of the (rx, ry, ryaw)
        reference point: with symmetric x/y tracking weights the stage cost
        is sw0·dmin + sw2·(yaw−ryaw)² EXACTLY, so the rx/ry select chains —
        2 of the 4 selects in the kernel's dominant W-deep loop — vanish.
        """
        if lean:
            wx2, wy2, r2, wyaw0 = win2[0]
            dmin = wx2 * xc + (wy2 * yc + r2)
            ryaw = jnp.full(shape, wyaw0, dtype=jnp.float32)
            if not iso_xy:
                rx = jnp.full(shape, win[0][0], dtype=jnp.float32)
                ry = jnp.full(shape, win[0][1], dtype=jnp.float32)
            for w in range(1, W):
                wx2, wy2, r2, wyaw = win2[w]
                d = wx2 * xc + (wy2 * yc + r2)
                better = d < dmin
                dmin = jnp.where(better, d, dmin)
                ryaw = jnp.where(better, wyaw, ryaw)
                if not iso_xy:
                    rx = jnp.where(better, win[w][0], rx)
                    ry = jnp.where(better, win[w][1], ry)
            if iso_xy:
                return dmin + (xc * xc + yc * yc), ryaw
            return rx, ry, ryaw
        wx0, wy0, wyaw0 = win[0]
        dmin = (xc - wx0) * (xc - wx0) + (yc - wy0) * (yc - wy0)
        ryaw = jnp.full(shape, wyaw0, dtype=jnp.float32)
        if not iso_xy:
            rx = jnp.full(shape, wx0, dtype=jnp.float32)
            ry = jnp.full(shape, wy0, dtype=jnp.float32)
        for w in range(1, W):
            wx, wy, wyaw = win[w]
            d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
            better = d < dmin
            dmin = jnp.where(better, d, dmin)
            ryaw = jnp.where(better, wyaw, ryaw)
            if not iso_xy:
                rx = jnp.where(better, wx, rx)
                ry = jnp.where(better, wy, ry)
        if iso_xy:
            return dmin, ryaw
        return rx, ry, ryaw

    def obstacle_penalty(xc, yc, t_f=None):
        """Per-sample obstacle cost at rollout time ``t_f`` (None → initial
        positions, the terminal-cost rule of solvers/mppi.py collision_cost:
        obstacles drift vel·(t·dt) during the rollout, terminal uses t=0)."""
        pen = jnp.zeros(shape, dtype=jnp.float32)
        for ox, oy, orad, ovx, ovy in obs:
            if moving_obs and t_f is not None:
                ox = ox + ovx * t_f
                oy = oy + ovy * t_f
            dxo = xc - ox
            dyo = yc - oy
            d2 = dxo * dxo + dyo * dyo
            if obs_mode == "circle":
                rr = orad + obs_pen_radius
                pen = jnp.where(d2 < rr * rr, jnp.float32(1.0), pen)
            else:  # soft exponential (test_mppi_diff_obs.py:59-64)
                d = jnp.sqrt(d2 + jnp.float32(1e-12))
                pen = pen + jnp.where(
                    d < soft_dist, jnp.exp(soft_dist - d), jnp.float32(0.0)
                )
        if obs_mode == "circle":
            return pen * jnp.float32(1.0e7)
        return pen * soft_w

    def window_refs_carried(xc, yc, idx):
        """Per-sample monotone window lookup (waypoint_carry="rollout").

        ``idx`` is the per-lane carried window start (int32, local row into
        the pre-gathered W rows). The search span is [idx, idx + carry_W) —
        the pure form of the reference's stateful [prev, prev+W) slice
        (mppi_differential_drive.py:201-228) — realized as a masked
        running-min over all W rows: rows outside the span never win. The
        first-strict-< tie rule matches argmin, and duplicate end rows
        (path-end clamp in the gather) resolve to the genuine first index.
        Returns the refs plus the advanced idx (monotone: idx_new ≥ idx).
        """
        big = jnp.float32(1.0e30)
        dmin = jnp.full(shape, big, dtype=jnp.float32)
        ryaw = jnp.zeros(shape, dtype=jnp.float32)
        if not iso_xy:
            rx = jnp.zeros(shape, dtype=jnp.float32)
            ry = jnp.zeros(shape, dtype=jnp.float32)
        idx_new = idx
        for w_i in range(W):
            wx, wy, wyaw = win[w_i]
            d = (xc - wx) * (xc - wx) + (yc - wy) * (yc - wy)
            valid = (idx <= w_i) & (idx > jnp.int32(w_i - carry_W))
            better = valid & (d < dmin)
            dmin = jnp.where(better, d, dmin)
            ryaw = jnp.where(better, wyaw, ryaw)
            idx_new = jnp.where(better, jnp.int32(w_i), idx_new)
            if not iso_xy:
                rx = jnp.where(better, wx, rx)
                ry = jnp.where(better, wy, ry)
        if iso_xy:
            return dmin, ryaw, idx_new
        return rx, ry, ryaw, idx_new

    # Rollout in (R_BLK, 128) row blocks: the T-loop carry must fit vector
    # registers — a full (R, 128) carry (R = 80 at the flagship scale) spills
    # to VMEM on every loop-op, which measured ~2× slower end-to-end.
    assert R % R_BLK == 0
    for blk in range(R // R_BLK):
        r0 = blk * R_BLK
        # lean mode: k_offset and n_exploit are compile-time constants, so
        # blocks that sit entirely below the exploration split skip the
        # per-step exploit mask and its two selects (the flagship's
        # exploration=1e-4 leaves every block but the last fully exploiting)
        all_exploit = lean and (r0 + R_BLK) * LANES <= lean_consts[1]
        if all_exploit:
            exploit = None
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            k_idx = ((r0 + rows) * LANES + cols).astype(jnp.float32) + k_offset
            exploit = k_idx < n_exploit

        def body(t, carry, exploit=exploit):
            if sincos == "rot":
                # incremental rotation (lean-only): carry (cos, sin) of yaw
                # and rotate by the small per-step increment b = v1·dt with
                # 3rd/2nd-order minimax-free Taylor kernels — |b| ≤
                # |u_max[1]|·dt is small at control rates (flagship ≤ 0.063
                # rad → error ≤ b^5/120 ≈ 8e-9), replacing the per-step
                # shared-reduction polynomial pair (~4 fewer VPU ops in the
                # dominant loop). Drift over T steps is ~T·ulp — far inside
                # the fused tick's f32 parity tolerances.
                x, y, yaw, cos_y, sin_y, S = carry
            elif rollout_carry:
                x, y, yaw, S, idx = carry
            else:
                x, y, yaw, S = carry
            e0 = eps0[t, r0 : r0 + R_BLK]
            e1 = eps1[t, r0 : r0 + R_BLK]
            u0 = u_ref[t, 0]
            u1 = u_ref[t, 1]
            if exploit is None:
                v0 = u0 + e0
                v1 = u1 + e1
            else:
                v0 = jnp.where(exploit, u0 + e0, e0)
                v1 = jnp.where(exploit, u1 + e1, e1)
            v0 = jnp.clip(v0, umin0, umax0)
            v1 = jnp.clip(v1, umin1, umax1)

            if sincos == "rot":
                pass  # carried cos_y/sin_y are already cos/sin(yaw_t)
            elif sincos == "poly":
                sin_y, cos_y = sincos_poly(yaw)
            else:
                sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)
            x = x + v0 * cos_y * dt
            y = y + v0 * sin_y * dt
            if sincos == "rot":
                b = v1 * dt
                yaw = yaw + b
                b2 = b * b
                sb = b * (1.0 - b2 * jnp.float32(1.0 / 6.0))
                cb = 1.0 - 0.5 * b2
                cos_y, sin_y = (
                    cos_y * cb - sin_y * sb,
                    sin_y * cb + cos_y * sb,
                )
            else:
                yaw = yaw + v1 * dt

            if rollout_carry:
                if iso_xy:
                    dmin, ryaw, idx = window_refs_carried(x, y, idx)
                    c = sw0 * dmin + sw2 * (yaw - ryaw) * (yaw - ryaw)
                else:
                    rx, ry, ryaw, idx = window_refs_carried(x, y, idx)
                    c = (
                        sw0 * (x - rx) * (x - rx)
                        + sw1 * (y - ry) * (y - ry)
                        + sw2 * (yaw - ryaw) * (yaw - ryaw)
                    )
            elif iso_xy:
                dmin, ryaw = window_refs(x, y)
                c = sw0 * dmin + sw2 * (yaw - ryaw) * (yaw - ryaw)
            else:
                rx, ry, ryaw = window_refs(x, y)
                c = (
                    sw0 * (x - rx) * (x - rx)
                    + sw1 * (y - ry) * (y - ry)
                    + sw2 * (yaw - ryaw) * (yaw - ryaw)
                )
            if lean:
                # energy row γ·u_tᵀΣ⁻¹ computed from the (already-read)
                # nominal controls — the XLA-side a-matmul disappears
                c = c + (gam * (u0 * i00 + u1 * i01)) * v0 + (
                    gam * (u0 * i01 + u1 * i11)
                ) * v1
            else:
                c = c + a_ref[t, 0] * v0 + a_ref[t, 1] * v1
            if control_cost:
                # pytorch_mppi spec: + vᵀRv of the clamped action
                # (test/test_mppi_diff_obs.py:48-53)
                c = c + rc0 * v0 * v0 + rc1 * v1 * v1
            if n_obs > 0:
                c = c + obstacle_penalty(x, y, t.astype(jnp.float32) * dt)
            if last_only:
                S = c  # reference overwrite quirk (mppi_differential_drive.py:124)
            else:
                S = S + c
            if sincos == "rot":
                return x, y, yaw, cos_y, sin_y, S
            if rollout_carry:
                return x, y, yaw, S, idx
            return x, y, yaw, S

        x = jnp.full(shape, x0, dtype=jnp.float32)
        y = jnp.full(shape, y0, dtype=jnp.float32)
        yaw = jnp.full(shape, yaw0, dtype=jnp.float32)
        S = jnp.zeros(shape, dtype=jnp.float32)
        if rollout_carry:
            idx0 = jnp.zeros(shape, dtype=jnp.int32)
            x, y, yaw, S, idx = jax.lax.fori_loop(
                0, T, body, (x, y, yaw, S, idx0)
            )
            # persist="max" carry: max final per-sample index over the block
            # (the terminal lookup below does not advance it — scan-path rule,
            # solvers/mppi.py: wpi_final is the post-rollout carry)
            blk_max = jnp.max(idx)
            if blk == 0:
                wpadv_ref[0] = blk_max
            else:
                wpadv_ref[0] = jnp.maximum(wpadv_ref[0], blk_max)
            if iso_xy:
                dmin, ryaw, _ = window_refs_carried(x, y, idx)
                S = S + tw0 * dmin + tw2 * (yaw - ryaw) * (yaw - ryaw)
            else:
                rx, ry, ryaw, _ = window_refs_carried(x, y, idx)
                S = S + (
                    tw0 * (x - rx) * (x - rx)
                    + tw1 * (y - ry) * (y - ry)
                    + tw2 * (yaw - ryaw) * (yaw - ryaw)
                )
        else:
            if sincos == "rot":
                cy0 = jnp.cos(jnp.full(shape, yaw0, dtype=jnp.float32))
                sy0 = jnp.sin(jnp.full(shape, yaw0, dtype=jnp.float32))
                x, y, yaw, _, _, S = jax.lax.fori_loop(
                    0, T, body, (x, y, yaw, cy0, sy0, S)
                )
            else:
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
        S_ref[r0 : r0 + R_BLK, :] = S

    # Softmax weights with ρ = min S (mppi_differential_drive.py:167-180),
    # streaming over the full (R, 128) block.
    S = S_ref[:, :]
    rho = jnp.min(S)
    m = jnp.exp(-inv_temp * (S - rho))
    eta = jnp.sum(m)
    w = m / eta
    w_ref[:, :] = w

    # Weighted-noise reduction Σₖ wₖ εₖ over the *unclamped* ε (…:132-135);
    # output rows (2, T): row 0 = Σ w ε₀(t), row 1 = Σ w ε₁(t).
    wb = w[None, :, :]
    weps_ref[0, :] = jnp.sum(jnp.sum(eps0[:, :, :] * wb, axis=2), axis=1)
    weps_ref[1, :] = jnp.sum(jnp.sum(eps1[:, :, :] * wb, axis=2), axis=1)

    if fuse_epilogue:
        fused_epilogue_block(
            weps_ref, ft_ref, urows_ref, unew_ref, ushift_ref, ok_ref, T
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "K",
        "T",
        "W",
        "last_only",
        "emit_eps",
        "interpret",
        "gaussian",
        "collision",
        "fuse_epilogue",
        "iso_xy",
        "rollout_carry",
        "carry_W",
        "sincos",
        "fold_anchor",
        "span",
        "lean",
        "lean_consts",
    ),
)
def diffdrive_mppi_tick(
    seed: jnp.ndarray,  # () int32 — ignored when eps is given
    u: jnp.ndarray,  # (T, 2) nominal sequence
    a: jnp.ndarray,  # (T, 2) γ·u_tᵀΣ⁻¹
    chol_sigma: jnp.ndarray,  # (2, 2) lower-triangular Cholesky factor of Σ
    x0: jnp.ndarray,  # (3,)
    window: jnp.ndarray,  # (W, 3) waypoint window
    stage_w: jnp.ndarray,  # (3,)
    term_w: jnp.ndarray,  # (3,)
    u_min: jnp.ndarray,  # (2,)
    u_max: jnp.ndarray,  # (2,)
    dt: float,
    n_exploit: float,
    inv_temperature: jnp.ndarray,
    obstacles: Optional[jnp.ndarray] = None,  # (n_obs, 3) or None
    robot_radius: float = 0.5,  # PHYSICAL radius; margin applied below
    safety_margin_rate: float = 1.5,
    eps: Optional[jnp.ndarray] = None,  # (K, T, 2) injected ε (parity mode)
    obstacle_velocities: Optional[jnp.ndarray] = None,  # (n_obs, 2) drift
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    filter_t: Optional[jnp.ndarray] = None,  # (T, T) Fᵀ — fused-epilogue mode
    control_weight: Optional[jnp.ndarray] = None,  # (2,) diag action cost
    *,
    K: int,
    T: int,
    W: int,
    last_only: bool = False,
    emit_eps: bool = False,
    interpret: bool = False,
    gaussian: str = "popcount",
    collision: str = "circle",
    fuse_epilogue: bool = False,
    iso_xy: bool = False,
    rollout_carry: bool = False,
    carry_W: int = 0,
    sincos: str = "native",
    fold_anchor: bool = False,
    span: int = 0,
    prev_idx: Optional[jnp.ndarray] = None,  # () int32 (fold_anchor mode)
    lean: bool = False,
    lean_consts: Optional[tuple] = None,  # (dt, n_exploit, inv_temp, gamma)
):
    """One fused MPPI tick. Returns ``(S (K,), w (K,), w_eps (T, 2))`` — plus
    ``eps (K, T, 2)`` when ``emit_eps`` — with K on a single (K/128, 128) block.

    ``lean`` (round-5): minimum-prologue mode for the obstacle-free
    fused-epilogue tick. The XLA-side scalar concatenate, Cholesky/Σ⁻¹, the
    γ·uᵀΣ⁻¹ energy matmul, and the whole threefry/Weyl seed chain move
    in-kernel (scalar-unit work), cutting the per-tick device program to
    [anchor ops, u-transpose, kernel] — each removed XLA op costs ~0.3-1.5 µs
    plus a ~1 µs launch gap on v5e (docs/PERF.md round-5 trace). Argument
    reinterpretation in this mode: ``seed`` is the (2,) uint32 carried key
    (the kernel XORs the words to seed the Mosaic PRNG and returns the
    Weyl-advanced next key as an extra trailing output); ``chol_sigma`` is
    Σ ITSELF (not its factor); ``a`` is ignored. Requires fuse_epilogue +
    PRNG mode + no obstacles / control cost / emit / fold_anchor /
    rollout_carry; ``lean_consts`` pins (dt, n_exploit, inv_temperature,
    gamma) as compile-time constants.

    ``gaussian`` selects the on-chip normal generator (PRNG mode only):
    ``"popcount"`` (default — transcendental-free binomial+uniform, see the
    kernel) or ``"box_muller"``. Both are exact-moment Gaussians verified by
    ``tests/test_tick_prng.py``; injected-ε parity paths are unaffected.

    ``collision`` picks the obstacle stage/terminal cost: ``"circle"`` — the
    hard robot-circle test ×1e7 (mppi_differential_drive_obs.py:301-313) —
    or ``"soft"`` — the exponential penalty Σ exp(d_safe−d)·[d<d_safe]·w of
    test/test_mppi_diff_obs.py:59-64 (the pytorch_mppi goal-seeking spec).
    ``obstacle_velocities`` makes obstacles drift vel·(t·dt) inside the
    rollout (stage costs; terminal uses initial positions — the scan-engine
    rule in solvers/mppi.py::make_tracking_costs).
    """
    assert gaussian in ("popcount", "popcount3", "box_muller"), gaussian
    assert collision in ("circle", "soft"), collision
    assert sincos in ("native", "poly", "rot"), sincos
    if sincos == "rot":
        assert lean and not rollout_carry, "sincos=rot is a lean-mode option"
    if fold_anchor:
        # ``window`` is then the FULL (P, ≥3) path and ``W`` the rollout
        # window length; the anchor search (span) + window clip run in-kernel.
        assert not rollout_carry and prev_idx is not None and span > 0
    assert K % LANES == 0, f"K={K} must be a multiple of {LANES}"
    R = K // LANES
    R_BLK = pick_r_blk(R)
    gen_noise = eps is None
    emit = bool(emit_eps and gen_noise)
    if lean:
        assert (
            fuse_epilogue and gen_noise and not emit
            and not rollout_carry and obstacles is None
            and control_weight is None and lean_consts is not None
        ), "lean mode: fuse_epilogue + PRNG + no obstacles/cw/emit/carry"

    scal = None if lean else jnp.concatenate(
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
                jnp.float32
            ),
            jnp.asarray([0.0], jnp.float32),  # k_offset (single-device: 0)
            jnp.reshape(jnp.asarray(inv_temperature, jnp.float32), (1,)),
            jnp.reshape(chol_sigma.astype(jnp.float32), (4,))[
                jnp.asarray([0, 2, 3])
            ],  # l00, l10, l11
            jnp.asarray([soft_safety_distance, soft_weight], jnp.float32),
            (
                jnp.zeros((2,), jnp.float32)
                if control_weight is None
                else jnp.reshape(control_weight.astype(jnp.float32), (2,))
            ),  # diag action-cost weights (pytorch_mppi spec)
            jnp.zeros((1,), jnp.float32),  # pad
        ]
    )
    obs, n_obs = pack_obstacles(obstacles, obstacle_velocities)

    if fuse_epilogue and filter_t is None:
        raise ValueError("fuse_epilogue=True requires the (T, T) filter_t matrix")

    kernel = functools.partial(
        _tick_kernel,
        T=T,
        W=W,
        R=R,
        R_BLK=R_BLK,
        n_obs=n_obs,
        last_only=last_only,
        gen_noise=gen_noise,
        emit_eps=emit,
        gaussian=gaussian,
        obs_mode=collision,
        moving_obs=obstacle_velocities is not None,
        fuse_epilogue=fuse_epilogue,
        iso_xy=iso_xy,
        rollout_carry=rollout_carry,
        carry_W=carry_W,
        sincos=sincos,
        control_cost=control_weight is not None,
        fold_anchor=fold_anchor,
        P=window.shape[0] if fold_anchor else 0,
        span=span,
        lean=lean,
        lean_consts=tuple(float(c) for c in lean_consts) if lean else (),
    )

    out_shape = [
        jax.ShapeDtypeStruct((R, LANES), jnp.float32),  # S
        jax.ShapeDtypeStruct((R, LANES), jnp.float32),  # w
        jax.ShapeDtypeStruct((2, T), jnp.float32),  # w_eps (rows)
    ]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape]
    if fold_anchor:
        out_shape += [jax.ShapeDtypeStruct((1,), jnp.int32)]  # new anchor
        out_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if rollout_carry:
        out_shape += [jax.ShapeDtypeStruct((1,), jnp.int32)]  # max carried idx
        out_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if fuse_epilogue:
        out_shape += [
            jax.ShapeDtypeStruct((2, T), jnp.float32),  # u_new rows
            jax.ShapeDtypeStruct((2, T), jnp.float32),  # u_shift rows
            jax.ShapeDtypeStruct((1,), jnp.float32),  # finite flag
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    if lean:
        out_shape += [jax.ShapeDtypeStruct((2,), jnp.uint32)]  # next key
        out_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if emit:
        out_shape += [
            jax.ShapeDtypeStruct((T, R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, R, LANES), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    out_specs = tuple(out_specs)

    if lean:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (2,) uint32 key words
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (2, 2) Σ
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (T, 2) u
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (3,) x0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles (zero row)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # u_min
            pl.BlockSpec(memory_space=pltpu.SMEM),  # u_max
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stage_w
            pl.BlockSpec(memory_space=pltpu.SMEM),  # term_w
        ]
        if fold_anchor:
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]  # prev idx
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Fᵀ
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u rows (epilogue)
        ]
        uf = u.astype(jnp.float32)
        if fold_anchor:
            # lane layout: (3, PL) with one waypoint per lane, PL = P padded
            # to a lane-tile multiple (the kernel masks lanes >= P)
            PL = -(-window.shape[0] // LANES) * LANES
            win_arg = jnp.pad(
                window[:, :3].astype(jnp.float32),
                ((0, PL - window.shape[0]), (0, 0)),
            ).T
        else:
            win_arg = window.astype(jnp.float32)
        args = [
            jnp.reshape(seed, (2,)).astype(jnp.uint32),
            chol_sigma.astype(jnp.float32),  # Σ itself in lean mode
            uf,
            x0.astype(jnp.float32),
            win_arg,
            obs,
            u_min.astype(jnp.float32),
            u_max.astype(jnp.float32),
            stage_w.astype(jnp.float32),
            term_w.astype(jnp.float32),
        ]
        if fold_anchor:
            args += [jnp.reshape(prev_idx.astype(jnp.int32), (1,))]
        args += [
            filter_t.astype(jnp.float32),
            uf.T,
        ]
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a
            # fold_anchor reads the path with DYNAMIC row indices (prev-anchor
            # search + clipped window gather). From VMEM each such read lowers
            # to a vector dynamic-slice (+~10 µs/tick at the flagship shape —
            # the round-4 negative A/B); from SMEM they are scalar-core loads,
            # which is what makes in-kernel anchor folding profitable (round-5
            # A/B: see docs/PERF.md). Static-index reads (normal mode) stay in
            # VMEM.
            pl.BlockSpec(memory_space=pltpu.SMEM if fold_anchor else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # obstacles
        ]
        args = [
            jnp.reshape(seed.astype(jnp.int32), (1,)),
            scal,
            u.astype(jnp.float32),
            a.astype(jnp.float32),
            window.astype(jnp.float32),
            obs,
        ]
        if fold_anchor:
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
            args += [jnp.reshape(prev_idx.astype(jnp.int32), (1,))]
        if fuse_epilogue:
            in_specs += [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Fᵀ
                pl.BlockSpec(memory_space=pltpu.VMEM),  # u rows
            ]
            args += [filter_t.astype(jnp.float32), u.astype(jnp.float32).T]
    scratch_shapes = []
    if gen_noise:
        scratch_shapes += [
            pltpu.VMEM((T, R, LANES), jnp.float32),
            pltpu.VMEM((T, R, LANES), jnp.float32),
        ]
    else:
        # (K, T, 2) → two (T, R, 128) planes with k = r·128 + lane
        eps_t = jnp.transpose(
            eps.astype(jnp.float32).reshape(R, LANES, T, 2), (2, 3, 0, 1)
        )
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [eps_t[:, 0], eps_t[:, 1]]
    if lean and fold_anchor:
        PL = -(-window.shape[0] // LANES) * LANES
        scratch_shapes += [pltpu.VMEM((3, PL), jnp.float32)]

    result = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)

    result = list(result)
    S = result.pop(0).reshape(K)
    w = result.pop(0).reshape(K)
    w_eps = result.pop(0).T  # (T, 2)
    anchor = result.pop(0)[0] if fold_anchor else None
    wp_adv = result.pop(0)[0] if rollout_carry else None
    epi = None
    if fuse_epilogue:
        u_new = result.pop(0).T  # (T, 2)
        u_shift = result.pop(0).T  # (T, 2)
        finite = result.pop(0)[0]
        epi = (u_new, u_shift, finite)
    knext = result.pop(0) if lean else None  # (2,) uint32
    out = [S, w, w_eps]
    if fuse_epilogue:
        out.append(epi)
    if emit:
        eps_out = jnp.stack([result.pop(0), result.pop(0)], axis=1)  # (T, 2, R, L)
        out.append(jnp.transpose(eps_out, (2, 3, 0, 1)).reshape(K, T, 2))
    if rollout_carry:
        out.append(wp_adv)
    if fold_anchor:
        out.append(anchor)
    if lean:
        out.append(knext)
    return tuple(out)


__all__ = ["diffdrive_mppi_tick"]
