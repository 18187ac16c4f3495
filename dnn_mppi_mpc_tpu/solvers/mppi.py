"""Batched information-theoretic MPPI engine (Williams et al.) — the product core.

One solver replaces all eight reference MPPI variants (numpy/torch/cupy,
diff-drive/race-car, with/without obstacles — SURVEY §2.1): the K·T scalar
Python loops of controllers/mppi_differential_drive.py:111-126 become a single
``lax.scan`` over the horizon whose carry holds all K rollout states, so every
step is a wide VPU op over the sample dimension. The derivation being
implemented is the information-theoretic MPPI of notebook/mppi_note.ipynb.

Semantics preserved (with file:line provenance):
* exploration split: first ⌊(1−explore)·K⌋ samples perturb the nominal sequence,
  the rest are pure noise            — mppi_differential_drive.py:116-119
* in-rollout control clamp ``_g``     — mppi_differential_drive.py:285-289
  (the clamped value also enters the control-energy term, as the reference's
  in-place ``_g(v[k,t-1])`` mutation does)
* stage cost + γ·uᵀΣ⁻¹v               — mppi_differential_drive.py:124
* softmax weights with ρ=min S        — mppi_differential_drive.py:167-180 and
  the vectorized λ-convention at mppi_race_car_obstacle.py:216-226
* weighted-noise update over the *unclamped* ε, then smoothing filter
                                      — mppi_differential_drive.py:132-141
* receding-horizon shift              — mppi_differential_drive.py:162-163
* returned u0 is the updated, unclamped first control
                                      — mppi_differential_drive.py:165

The nearest-waypoint search is made pure: the window start is fixed per control
tick and carried in :class:`MPPIState` (the reference mutates it per cost call,
mppi_differential_drive.py:228 — an order-dependent quirk deliberately not
replicated; see SURVEY §7).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..config import CostAccumulation, MPPIConfig, MPPIParams
from ..ops.costs import (
    COLLISION_PENALTY,
    circle_robot_collision,
    soft_obstacle_cost,
    vehicle_polygon_collision,
)
from ..ops.filters import apply_filter
from ..ops.sampling import sample_noise, sigma_inverse
from ..ops.waypoints import nearest_waypoint, nearest_waypoint_carried


@register_pytree_node_class
@dataclasses.dataclass
class MPPIState:
    """Per-controller carry: nominal sequence, waypoint window start, PRNG key."""

    u_prev: jnp.ndarray  # (T, dim_u)
    waypoint_idx: jnp.ndarray  # scalar int32
    key: jax.Array

    def tree_flatten(self):
        return (self.u_prev, self.waypoint_idx, self.key), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def init(cls, cfg: MPPIConfig, key: Optional[jax.Array] = None) -> "MPPIState":
        return cls(
            u_prev=jnp.zeros((cfg.horizon, cfg.dim_u), dtype=jnp.float32),
            waypoint_idx=jnp.zeros((), dtype=jnp.int32),
            key=key if key is not None else jax.random.PRNGKey(0),
        )


class CostContext(NamedTuple):
    """Tick-level context threaded to stage/terminal cost functions."""

    params: MPPIParams
    waypoint_start: jnp.ndarray  # int32 window start for this control tick
    waypoint_ref: Optional[jnp.ndarray] = None  # precomputed nearest-waypoint
    # rows (..., d) — set by the rollout-carry scan body so the tracking cost
    # reuses the body's single lookup instead of repeating the gather+argmin


# stage_cost(x: (..., nx), t: int32, ctx) -> (...,); terminal likewise without t.
StageCost = Callable[[jnp.ndarray, jnp.ndarray, CostContext], jnp.ndarray]
TerminalCost = Callable[[jnp.ndarray, CostContext], jnp.ndarray]


class MPPIAux(NamedTuple):
    """Diagnostics returned by one MPPI step (cheap; no [K,T,nx] buffers)."""

    costs: jnp.ndarray  # (K,) sample costs S
    weights: jnp.ndarray  # (K,) softmax weights
    optimal_traj: jnp.ndarray  # (T, dim_x) rollout of the updated sequence
    waypoint_idx: jnp.ndarray  # int32 tick window start after update
    status: jnp.ndarray  # int32 bitmask: 1 = end of reference path reached
    # (mppi_differential_drive.py:97-100), 2 = non-finite detected (solve
    # rejected, previous sequence held — the warn-and-continue failure handling
    # of SURVEY §5.3)


def make_tracking_costs(
    cfg: MPPIConfig,
    *,
    wrap_yaw: bool = False,
    collision: str = "none",
    robot_radius: float = 0.5,
    vehicle_length: float = 4.0,
    vehicle_width: float = 3.0,
    safety_margin_rate: float = 1.5,
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
) -> Tuple[StageCost, TerminalCost]:
    """Build the reference's waypoint-tracking stage/terminal costs.

    ``collision``:
      * 'none'    — plain tracking (mppi_differential_drive.py:222-249)
      * 'circle'  — +1e10-style penalty on circle-robot overlap
                    (mppi_differential_drive_obs.py:242,301-313)
      * 'polygon' — 9-point vehicle outline vs circles
                    (mppi_race_car_obstacle.py:157,255-274)
      * 'soft'    — exponential soft penalty (test_mppi_diff_obs.py:59-64)
    """

    def tracking(x: jnp.ndarray, weight: jnp.ndarray, ctx: CostContext) -> jnp.ndarray:
        if ctx.waypoint_ref is not None:
            # rollout-carry scan body already did this lookup (one semantic
            # lookup per (k, t) — see mppi_step)
            ref = ctx.waypoint_ref
        elif ctx.waypoint_start.ndim > 0:
            # waypoint_carry="rollout": per-sample window starts carried by the
            # scan (ops/waypoints.nearest_waypoint_carried)
            _, ref = nearest_waypoint_carried(
                ctx.params.ref_path,
                x[..., :2],
                ctx.waypoint_start,
                cfg.waypoint_search_len,
            )
        else:
            _, ref = nearest_waypoint(
                ctx.params.ref_path,
                x[..., :2],
                ctx.waypoint_start,
                cfg.waypoint_search_len,
            )
        n = weight.shape[-1]
        err = x[..., :n] - ref[..., :n]
        if wrap_yaw:
            # yaw wrapped to [0, 2π) before differencing (mppi_race_car_obstacle.py:151)
            yaw = jnp.mod(x[..., 2] + 2.0 * jnp.pi, 2.0 * jnp.pi)
            err = err.at[..., 2].set(yaw - ref[..., 2])
        return jnp.sum(weight * err * err, axis=-1)

    def collision_cost(
        x: jnp.ndarray, ctx: CostContext, t: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        obs = ctx.params.obstacles
        if collision == "none" or obs is None:
            return jnp.zeros(x.shape[:-1], dtype=x.dtype)
        if ctx.params.obstacle_velocities is not None and t is not None:
            # obstacles drift during the rollout at their velocities, measured
            # from rollout start (test_mppi_diff_obs.py:17-20, :133-134 —
            # positions = initial + velocity·(t·dt); terminal uses initial).
            obs = obs.at[..., :2].add(
                ctx.params.obstacle_velocities[..., :2]
                * (t.astype(x.dtype) * cfg.dt)
            )
        if collision == "circle":
            # the reference's circle test inflates the ROBOT radius by the
            # safety margin (mppi_differential_drive_obs.py:303-305) — a
            # round-4 strict crosscheck against that class caught this
            # factor missing here (tests/test_reference_crosscheck.py)
            return (
                circle_robot_collision(
                    x[..., :2], obs, robot_radius * safety_margin_rate
                )
                * COLLISION_PENALTY
            )
        if collision == "polygon":
            return (
                vehicle_polygon_collision(
                    x, obs, vehicle_length, vehicle_width, safety_margin_rate
                )
                * COLLISION_PENALTY
            )
        if collision == "soft":
            return soft_obstacle_cost(x[..., :2], obs, soft_safety_distance, soft_weight)
        raise ValueError(f"unknown collision mode: {collision!r}")

    def stage(x, t, ctx):
        return tracking(x, ctx.params.stage_weight, ctx) + collision_cost(x, ctx, t)

    def terminal(x, ctx):
        return tracking(x, ctx.params.terminal_weight, ctx) + collision_cost(x, ctx)

    return stage, terminal


def unify_float_dtype(tree, dtype):
    """Cast floating *array* leaves of a params pytree to ``dtype``.

    Integer/bool arrays and non-array leaves (Python scalars or arbitrary
    objects inside ``MPPIParams.model_params``) pass through untouched —
    weakly-typed Python floats don't promote the scan carry, and assuming
    every leaf has ``.dtype`` crashed on them (round-2 review finding).
    """

    def cast(a):
        if not hasattr(a, "dtype"):
            return a
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(cast, tree)


def _time_indexed(cfg, dynamics_step):
    """Uniform 3-arg view of the discrete transition.

    With ``cfg.time_varying_dynamics`` the user's F(x, u, t) is called as-is
    (t = int32 rollout step index, the pytorch_mppi `dynamics(states,
    actions, t)` convention, test/test_mppi_diff_obs.py:28-42); otherwise the
    2-arg F(x, u) is wrapped and t ignored.
    """
    if cfg.time_varying_dynamics:
        return dynamics_step
    return lambda x, v, t: dynamics_step(x, v)


def mppi_step(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stage_cost: StageCost,
    terminal_cost: TerminalCost,
    params: MPPIParams,
    state: MPPIState,
    x0: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    rollout_fn: Optional[Callable] = None,
    tick_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, MPPIState, MPPIAux]:
    """One MPPI control tick: sample → rollout → weight → update → shift.

    ``rollout_fn(params, ctx, u, eps) -> S`` overrides the scan rollout with a
    fused kernel (the Pallas path); it must implement the same semantics
    (clamped v, stage+energy+terminal accumulation).

    ``tick_fn(params, ctx, u, x0, seed, eps) -> (S, w, w_eps)`` overrides the
    *entire* sample-space computation — noise generation, rollout, softmax and
    weighted-noise reduction — with one fused kernel
    (ops/pallas/mppi_tick.py). When ``noise`` is None the noise is generated
    on-chip from a seed derived from the carried key; injected ``noise`` takes
    the kernel's bit-identical ε-input path. Single-device only (the in-kernel
    softmax is a global reduction; sharded execution uses ``rollout_fn``).

    ``dynamics_step`` is the *discrete* transition F(x, u) (Euler by default,
    matching mppi_differential_drive.py:182-198). ``noise`` injects a fixed ε
    (K, T, dim_u) for oracle parity; otherwise ε is drawn from the carried key.

    ``axis_name`` enables sample-sharded execution under ``shard_map``: each
    device rolls out its K/n shard and the three cross-sample reductions —
    ρ = min S (pmin), η = Σ exp (psum), and the weighted-noise sum (psum) —
    ride the ICI mesh (SURVEY §2.10). cfg.num_samples stays the *global* K.
    """
    K, T = cfg.num_samples, cfg.horizon
    u = state.u_prev
    x0 = x0.astype(u.dtype)
    n_shards = 1 if axis_name is None else jax.lax.axis_size(axis_name)
    local_K = K // n_shards
    # Keep the whole tick in one dtype (f32 on the hot path); under x64 test
    # mode, float64 params would otherwise promote the scan carry.
    params = unify_float_dtype(params, u.dtype)

    # Advance the waypoint window to the vehicle position (tick-level, pure).
    # A tick_fn with ``folds_anchor`` runs this search INSIDE its kernel
    # (make_pallas_diffdrive_tick fold_anchor mode): it gets the previous
    # anchor and returns the advanced one as an extra output.
    folds_anchor = tick_fn is not None and getattr(tick_fn, "folds_anchor", False)
    if folds_anchor:
        wp_idx = None
        ctx = CostContext(params=params, waypoint_start=state.waypoint_idx)
    else:
        wp_idx, _ = nearest_waypoint(
            params.ref_path, x0[:2], state.waypoint_idx, cfg.waypoint_search_len
        )
        ctx = CostContext(params=params, waypoint_start=wp_idx)

    if cfg.waypoint_carry not in ("tick", "rollout"):
        raise ValueError(f"waypoint_carry must be 'tick' or 'rollout': {cfg.waypoint_carry!r}")
    if cfg.waypoint_persist not in ("none", "max"):
        raise ValueError(f"waypoint_persist must be 'none' or 'max': {cfg.waypoint_persist!r}")
    if cfg.waypoint_carry == "rollout" and rollout_fn is not None:
        raise ValueError(
            "waypoint_carry='rollout' is not supported by the sharded "
            "rollout_fn path (per-lane carry is kernel-local; the persisted "
            "max would need an extra collective) — use the fused tick or scan"
        )
    if params.control_weight is not None and (
        rollout_fn is not None
        or (tick_fn is not None and not getattr(tick_fn, "supports_control_cost", False))
    ):
        raise ValueError(
            "params.control_weight (the pytorch_mppi action-cost term) is "
            "implemented in the scan path and the single-block diff-drive "
            "fused tick — this rollout_fn/tick_fn does not support it"
        )
    if (
        cfg.waypoint_carry == "rollout"
        and tick_fn is not None
        and not getattr(tick_fn, "supports_rollout_carry", False)
    ):
        raise ValueError(
            "this tick_fn anchors its waypoint window per tick — build it "
            "with a cfg whose waypoint_carry='rollout' "
            "(make_pallas_diffdrive_tick / make_generic_fused_tick)"
        )

    if tick_fn is not None:
        if axis_name is not None:
            raise ValueError(
                "tick_fn (fully-fused tick kernel) is single-device only — "
                "use rollout_fn for sample-sharded execution"
            )
        # int32 seed for the in-kernel PRNG (ignored when ε is injected).
        # Derived from the carried key WITHOUT threefry: a split+bits pair
        # costs ~7 µs/tick on TPU — 15% of a flagship tick (docs/PERF.md) —
        # while the Mosaic PRNG re-hashes whatever seed it gets, so a Weyl
        # advance of the raw key words is statistically adequate here and
        # nearly free. The scan path below keeps real threefry sampling.
        typed = jnp.issubdtype(state.key.dtype, jax.dtypes.prng_key)
        kd = jax.random.key_data(state.key) if typed else state.key
        lean_tick = getattr(tick_fn, "lean", False)
        if lean_tick:
            # lean tick: the kernel XORs the key words itself and returns
            # the Weyl-advanced next key — no XLA seed chain at all
            seed = kd
            key = None  # filled from the kernel's trailing output below
        else:
            seed = jax.lax.bitcast_convert_type(kd[0] ^ kd[1], jnp.int32)
            kd_next = kd + jnp.asarray([0x9E3779B9, 0x85EBCA6B], jnp.uint32)
            key = (
                jax.random.wrap_key_data(kd_next, impl="threefry2x32")
                if typed
                else kd_next
            )
        kernel_carry = cfg.waypoint_carry == "rollout"
        if getattr(tick_fn, "fused_epilogue", False):
            # Kernel already applied filter + update + finite-hold + shift;
            # only diagnostics and the waypoint/status carry remain in XLA.
            out = tick_fn(params, ctx, u, x0, seed, noise)
            if lean_tick:
                out = list(out)
                kd_next = out.pop()  # (2,) uint32 from the kernel
                key = (
                    jax.random.wrap_key_data(kd_next, impl="threefry2x32")
                    if typed
                    else kd_next
                )
            if folds_anchor:
                out = list(out)
                wp_idx = out.pop()  # the in-kernel-advanced anchor
            if kernel_carry:
                S, w, _, (u_new, u_shift, finite), wp_carried = out
            else:
                S, w, _, (u_new, u_shift, finite) = out
                wp_carried = None
            wp_next, status_idx = wp_idx, None
            if kernel_carry and cfg.waypoint_persist == "max":
                # persisted lookahead (scan-path rule at the bottom of this
                # function): status keeps judging the tick-level index
                wp_next, status_idx = wp_carried, wp_idx
            return _mppi_tail_fused(
                cfg, dynamics_step, params, state, x0, key, wp_next,
                S, w, u_new, u_shift, finite, status_idx=status_idx,
            )
        out = tick_fn(params, ctx, u, x0, seed, noise)
        if folds_anchor:
            out = list(out)
            wp_idx = out.pop()
            ctx = CostContext(params=params, waypoint_start=wp_idx)
        if kernel_carry:
            S, w, w_eps, wp_carried = out
        else:
            S, w, w_eps = out
            wp_carried = None
        wp_next, status_idx = wp_idx, None
        if kernel_carry and cfg.waypoint_persist == "max":
            wp_next, status_idx = wp_carried, wp_idx
        return _mppi_tail(
            cfg, dynamics_step, params, state, ctx, x0, u, key, wp_next,
            S, w, w_eps, status_idx=status_idx,
        )

    key, sub = jax.random.split(state.key)
    if noise is None:
        if axis_name is not None:
            sub = jax.random.fold_in(sub, jax.lax.axis_index(axis_name))
        eps = sample_noise(sub, params.sigma, local_K, T, dtype=u.dtype)
    else:
        eps = noise.astype(u.dtype)

    wp_status = None  # non-None only when the carry is a persisted lookahead
    if rollout_fn is not None:
        S = rollout_fn(params, ctx, u, eps, x0, axis_name=axis_name)
    else:
        # Exploration split (mppi_differential_drive.py:116-119): sample index
        # mask over *global* sample indices so sharding preserves semantics.
        k_idx = jnp.arange(local_K, dtype=jnp.float32)
        if axis_name is not None:
            k_idx = k_idx + jax.lax.axis_index(axis_name).astype(jnp.float32) * local_K
        exploit = (k_idx < (1.0 - cfg.exploration) * K)[:, None, None]
        v = jnp.where(exploit, u[None] + eps, eps)  # (K, T, nu)
        v = jnp.clip(v, params.u_min, params.u_max)  # _g, applied to the buffer

        sig_inv = sigma_inverse(params.sigma)
        gamma = jnp.asarray(cfg.gamma, dtype=u.dtype)
        # γ·u_tᵀΣ⁻¹v_{k,t} for all (k, t) in one einsum (MXU-friendly).
        energy = gamma * jnp.einsum("ti,ij,ktj->kt", u, sig_inv, v)

        v_time = jnp.swapaxes(v, 0, 1)  # (T, K, nu) — time-leading for scan

        # M-repeat rollouts (pytorch_mppi rollout_samples, test_mppi_diff_obs.py
        # :122-151): the same action sequence is rolled M times — meaningful
        # when dynamics_step is stochastic — with cost averaged over M and a
        # discounted rollout-variance penalty added.
        M = max(1, cfg.num_rollout_repeats)

        rollout_carry = cfg.waypoint_carry == "rollout"
        dyn_t = _time_indexed(cfg, dynamics_step)

        def body(carry, inp):
            x, s, var, wpi = carry
            v_t, e_t, t = inp
            if M > 1:  # repeat the same actions across the M rollouts
                v_t = jnp.broadcast_to(v_t[None], (M,) + v_t.shape)
            x = dyn_t(x, v_t, t)  # (K, nx) or (M, K, nx)
            if rollout_carry:
                # per-rollout monotone window advance — the pure form of the
                # reference's stateful in-cost lookup (see MPPIConfig.
                # waypoint_carry). One lookup per (k, t), anchored at the
                # PRE-update carry exactly like the reference's
                # _get_nearest_waypoint(update_prev_idx=True) at :228: its
                # ref rows feed the cost (via ctx.waypoint_ref) and its
                # argmin becomes the next carry.
                idx_new, ref = nearest_waypoint_carried(
                    params.ref_path, x[..., :2], wpi, cfg.waypoint_search_len
                )
                ctx_t = ctx._replace(waypoint_start=wpi, waypoint_ref=ref)
                wpi = idx_new
            else:
                ctx_t = ctx
            c = stage_cost(x, t, ctx_t) + e_t
            if params.control_weight is not None:
                # pytorch_mppi spec action cost aᵀRa on the CLAMPED action
                # (test/test_mppi_diff_obs.py:48-53; pytorch_mppi passes the
                # bounded perturbed action into running_cost)
                c = c + jnp.sum(params.control_weight * v_t * v_t, axis=-1)
            if M > 1:
                disc = jnp.asarray(cfg.rollout_var_discount, u.dtype) ** t.astype(u.dtype)
                var = var + jnp.var(c, axis=0) * disc
            if cfg.accumulation == CostAccumulation.SUM:
                s = s + c
            else:  # LAST: reference overwrite quirk (mppi_differential_drive.py:124)
                s = c
            return (x, s, var, wpi), None

        batch = (local_K,) if M == 1 else (M, local_K)
        x_init = jnp.broadcast_to(x0, batch + x0.shape)
        s_init = jnp.zeros(batch, dtype=u.dtype)
        var_init = jnp.zeros((local_K,), dtype=u.dtype)
        wpi_init = jnp.broadcast_to(wp_idx, batch).astype(jnp.int32)
        ts = jnp.arange(T, dtype=jnp.int32)
        (x_final, S, cost_var, wpi_final), _ = jax.lax.scan(
            body,
            (x_init, s_init, var_init, wpi_init),
            (v_time, jnp.swapaxes(energy, 0, 1), ts),
        )
        term_ctx = ctx._replace(waypoint_start=wpi_final) if rollout_carry else ctx
        S = S + terminal_cost(x_final, term_ctx)
        if M > 1:
            S = jnp.mean(S, axis=0) + cfg.rollout_var_cost * cost_var
        if rollout_carry and cfg.waypoint_persist == "max":
            # persist the furthest carried index into the next tick's window
            # (the pure analog of the reference's prev_way_point_idx retaining
            # the last sample's final index, mppi_differential_drive.py:218).
            # The end-of-path status keeps judging the TICK-level index — the
            # persisted one is a lookahead that reaches the end early.
            wp_status = wp_idx
            wp_next = jnp.max(wpi_final)
            if axis_name is not None:
                wp_next = jax.lax.pmax(wp_next, axis_name)
            wp_idx = wp_next

    # Softmax weights with ρ = min S (mppi_differential_drive.py:167-180).
    # Sharded: ρ via pmin, normalizer η via psum — the only cross-chip scalars.
    inv_temp = jnp.asarray(cfg.inv_temperature, dtype=u.dtype)
    rho = jnp.min(S)
    if axis_name is not None:
        rho = jax.lax.pmin(rho, axis_name)
    m = jnp.exp(-inv_temp * (S - jax.lax.stop_gradient(rho)))
    eta = jnp.sum(m)
    if axis_name is not None:
        eta = jax.lax.psum(eta, axis_name)
    w = m / eta

    # Weighted noise over the unclamped ε (…:132-135).
    w_eps = jnp.einsum("k,ktu->tu", w, eps)
    if axis_name is not None:
        w_eps = jax.lax.psum(w_eps, axis_name)
    return _mppi_tail(
        cfg, dynamics_step, params, state, ctx, x0, u, key, wp_idx, S, w, w_eps,
        status_idx=wp_status,
    )


def _mppi_tail(
    cfg, dynamics_step, params, state, ctx, x0, u, key, wp_idx, S, w, w_eps,
    status_idx=None,
):
    """Shared tick tail: smoothing, update, shift, diagnostics, failure flags.

    ``status_idx`` (default: ``wp_idx``) is the index the end-of-path flag is
    judged against — with ``waypoint_persist="max"`` the carried ``wp_idx`` is
    a deliberate LOOKAHEAD (it can sit near the path end many ticks before the
    robot does), so the status bit uses the tick-level robot-position index
    instead."""
    T = cfg.horizon
    # Smoothing filter on the weighted noise (…:136-141).
    w_eps = apply_filter(w_eps, cfg.filter, cfg.filter_window, cfg.savgol_polyorder)
    u_new = u + w_eps

    # Optimal trajectory of the updated (clamped-in-rollout) sequence (…:144-149).
    # Provenance note: the reference's viz loop applies u[t-1] starting with
    # u[-1] (mppi_differential_drive.py:144-149, an off-by-one in a
    # diagnostic-only path); here u_new[0..T-1] is applied in order — the
    # off-by-one is deliberately not replicated (same policy as the other
    # documented quirks in the module docstring).
    if cfg.compute_optimal_traj:
        dyn_t = _time_indexed(cfg, dynamics_step)

        def opt_body(x, inp):
            u_t, t = inp
            x = dyn_t(x, jnp.clip(u_t, params.u_min, params.u_max), t)
            return x, x

        _, optimal_traj = jax.lax.scan(
            opt_body, x0, (u_new, jnp.arange(T, dtype=jnp.int32))
        )
    else:
        optimal_traj = jnp.zeros((T,) + x0.shape, dtype=u.dtype)

    # Failure detection (SURVEY §5.3): reject non-finite updates, holding the
    # previous sequence (warn-and-continue semantics); flag end-of-path.
    finite = jnp.all(jnp.isfinite(u_new))
    u_new = jnp.where(finite, u_new, u)
    sidx = wp_idx if status_idx is None else status_idx
    end_of_path = sidx >= params.ref_path.shape[0] - 1
    status = (
        end_of_path.astype(jnp.int32)
        + 2 * jnp.logical_not(finite).astype(jnp.int32)
    )

    # Receding-horizon shift (…:162-163).
    u_shift = jnp.concatenate([u_new[1:], u_new[-1:]], axis=0)
    new_state = MPPIState(u_prev=u_shift, waypoint_idx=wp_idx, key=key)
    aux = MPPIAux(
        costs=S,
        weights=w,
        optimal_traj=optimal_traj,
        waypoint_idx=wp_idx,
        status=status,
    )
    return u_new[0], new_state, aux


def _mppi_tail_fused(
    cfg, dynamics_step, params, state, x0, key, wp_idx, S, w, u_new, u_shift,
    finite, status_idx=None,
):
    """Tick tail when the kernel already fused filter/update/hold/shift.
    ``status_idx`` — see _mppi_tail (persisted-lookahead carries judge the
    end-of-path flag against the tick-level index instead)."""
    T = cfg.horizon
    if cfg.compute_optimal_traj:
        dyn_t = _time_indexed(cfg, dynamics_step)

        def opt_body(x, inp):
            u_t, t = inp
            x = dyn_t(x, jnp.clip(u_t, params.u_min, params.u_max), t)
            return x, x

        _, optimal_traj = jax.lax.scan(
            opt_body, x0, (u_new, jnp.arange(T, dtype=jnp.int32))
        )
    else:
        optimal_traj = jnp.zeros((T,) + x0.shape, dtype=u_new.dtype)

    sidx = wp_idx if status_idx is None else status_idx
    end_of_path = sidx >= params.ref_path.shape[0] - 1
    status = (
        end_of_path.astype(jnp.int32)
        + 2 * (finite < 0.5).astype(jnp.int32)
    )
    new_state = MPPIState(u_prev=u_shift, waypoint_idx=wp_idx, key=key)
    aux = MPPIAux(
        costs=S,
        weights=w,
        optimal_traj=optimal_traj,
        waypoint_idx=wp_idx,
        status=status,
    )
    return u_new[0], new_state, aux


def sampled_trajectories(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: MPPIParams,
    state: MPPIState,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    costs: jnp.ndarray,
    top_fraction: float = 1.0,
) -> jnp.ndarray:
    """Re-roll sampled sequences for visualization, cost-sorted (best first).

    Separate from the hot path so [K,T,nx] is only materialized on demand —
    mirrors the viz re-rollout at mppi_differential_drive.py:151-159 and the
    top-10% extraction of test/test_mppi_diff_obs.py:102-110.
    """
    K = cfg.num_samples
    u = state.u_prev
    k_idx = jnp.arange(K, dtype=jnp.float32)
    exploit = (k_idx < (1.0 - cfg.exploration) * K)[:, None, None]
    v = jnp.where(exploit, u[None] + noise, noise)
    v = jnp.clip(v, params.u_min, params.u_max)

    dyn_t = _time_indexed(cfg, dynamics_step)

    def body(x, inp):
        v_t, t = inp
        x = dyn_t(x, v_t, t)
        return x, x

    x_init = jnp.broadcast_to(x0, (K,) + x0.shape)
    _, trajs = jax.lax.scan(
        body,
        x_init,
        (jnp.swapaxes(v, 0, 1), jnp.arange(cfg.horizon, dtype=jnp.int32)),
    )  # (T, K, nx)
    trajs = jnp.swapaxes(trajs, 0, 1)  # (K, T, nx)
    order = jnp.argsort(costs)
    n_top = max(1, int(K * top_fraction))
    return jnp.take(trajs, order[:n_top], axis=0)


def make_pallas_diffdrive_rollout(
    cfg: MPPIConfig,
    robot_radius: float = 0.5,
    interpret: bool = False,
    safety_margin_rate: float = 1.5,
):
    """Bind the fused Pallas rollout kernel as the engine's rollout_fn.

    Only valid for the diff-drive tracking problem (unicycle Euler dynamics +
    nearest-waypoint quadratic cost + optional circle obstacles) — exactly the
    semantics of ops/pallas/rollout.py, which are bit-matched against the scan
    path in tests/test_pallas_rollout.py.

    Raises ValueError for config the kernel does not implement (M-repeat
    rollouts, in-rollout moving obstacles) rather than silently diverging from
    the scan path's semantics.
    """
    from ..ops.pallas.rollout import diffdrive_rollout_costs

    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the fused diff-drive kernel does not implement num_rollout_repeats>1 "
            "(M-repeat variance cost) — use the scan path (rollout_fn=None)"
        )

    def rollout(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        eps: jnp.ndarray,
        x0: jnp.ndarray,
        axis_name=None,
    ):
        if params.obstacle_velocities is not None:
            raise ValueError(
                "the fused diff-drive kernel does not implement in-rollout "
                "moving obstacles (obstacle_velocities) — use the scan path"
            )
        P = params.ref_path.shape[0]
        Wlen = min(cfg.waypoint_search_len, P)
        start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
        window = jax.lax.dynamic_slice_in_dim(params.ref_path, start, Wlen, axis=0)
        sig_inv = sigma_inverse(params.sigma)
        a = cfg.gamma * (u @ sig_inv)
        # sharded execution: global sample index = shard offset + local index,
        # so the exploration split stays a property of the *global* K
        k_offset = 0.0
        if axis_name is not None:
            k_offset = (
                jax.lax.axis_index(axis_name).astype(jnp.float32) * eps.shape[0]
            )
        return diffdrive_rollout_costs(
            eps,
            u,
            a,
            x0,
            window[:, :3],
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            obstacles=params.obstacles,
            robot_radius=robot_radius,
            safety_margin_rate=safety_margin_rate,
            k_offset=k_offset,
            T=cfg.horizon,
            W=Wlen,
            last_only=(cfg.accumulation == CostAccumulation.LAST),
            interpret=interpret,
        )

    return rollout


def _check_iso_weights(params: MPPIParams) -> None:
    """Call-time guard for the iso_xy kernel specialization: symmetric x/y
    tracking weights are what makes the dmin form exact. Concrete weights are
    validated; traced weights (inside a jit of the whole binder) are the
    caller's responsibility (presets validate at build time)."""
    for wgt in (params.stage_weight, params.terminal_weight):
        try:
            w0, w1 = float(wgt[0]), float(wgt[1])
        except TypeError:
            continue
        if w0 != w1:
            raise ValueError(
                f"iso_xy=True requires symmetric x/y weights, got "
                f"({w0}, {w1}) — drop iso_xy or symmetrize"
            )


def make_pallas_diffdrive_tick(
    cfg: MPPIConfig,
    robot_radius: float = 0.5,
    interpret: bool = False,
    gaussian: str = "popcount",
    collision: str = "circle",
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    fuse_epilogue: bool = False,
    iso_xy: bool = False,
    sincos: str = "poly",
    fold_anchor: Optional[bool] = None,
    safety_margin_rate: float = 1.5,
    lean: Optional[bool] = None,
):
    """Bind the fully-fused tick kernel (ops/pallas/mppi_tick.py) as tick_fn.

    ``sincos="poly"`` (default) evaluates the rollout's sin/cos pair via one
    shared-reduction polynomial (ops/pallas/mathx.py, |err| ≤ 9e-8): measured
    ~21% faster per solve than the native transcendentals at the flagship
    shape (interleaved slope A/B, docs/PERF.md). "native" restores
    ``jnp.sin/cos``.

    One kernel per tick: on-chip ε ~ N(0, Σ), rollout + cost, softmax,
    weighted-noise reduce — the ε tensor never exists in HBM. Only valid for
    single-device diff-drive problems (same semantics as
    make_pallas_diffdrive_rollout; parity-tested in tests/test_mppi_tick.py).
    ``gaussian`` picks the on-chip normal generator ("popcount" default /
    "box_muller"; see ops/pallas/mppi_tick.py). ``collision`` must match the
    bound cost functions: "circle" (hard ×penalty,
    mppi_differential_drive_obs.py) or "soft" (exponential,
    test_mppi_diff_obs.py — the goal-seeking preset with W=1). In-rollout
    moving obstacles (params.obstacle_velocities) are supported in both.

    ``iso_xy=True`` specializes the kernel for SYMMETRIC x/y tracking
    weights (stage_weight[0]==stage_weight[1] and likewise terminal — the
    reference's own defaults, e.g. (5, 5, 10) at
    mppi_differential_drive.py:405-408): the stage cost becomes
    sw0·min-distance² + sw2·(yaw−ryaw)² EXACTLY, eliminating the rx/ry
    select chains from the kernel's dominant per-waypoint loop (~10%
    faster flagship tick). The caller must guarantee the symmetry — the
    weights are runtime arrays, so it cannot be checked at trace time;
    with asymmetric weights this mode silently computes the wrong cost.
    """
    from ..ops.filters import filter_matrix
    from ..ops.pallas.mppi_tick import diffdrive_mppi_tick
    from ..ops.sampling import small_cholesky

    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the fused tick kernel does not implement num_rollout_repeats>1 "
            "(M-repeat variance cost) — use the scan path"
        )

    import numpy as _np

    from ..config import SmoothingFilter

    filter_t = None
    if fuse_epilogue:
        # Fᵀ for the in-kernel smoothing matmul (identity for NONE) — the
        # epilogue fusion of round-2 verdict #4.
        if cfg.filter == SmoothingFilter.NONE:
            F = _np.eye(cfg.horizon)
        else:
            F = filter_matrix(
                cfg.filter.value, cfg.horizon, cfg.filter_window, cfg.savgol_polyorder
            )
        # Keep Fᵀ as a HOST (numpy) constant: a jit-captured *device* array
        # constant permanently degrades every host↔device sync in the process
        # to ~30 ms through the remote-attach tunnel (measured, docs/PERF.md
        # "closure-constant sync cliff"); a numpy constant folds into the
        # executable with no such cost.
        filter_t = _np.asarray(F.T, _np.float32)

    rollout_carry = cfg.waypoint_carry == "rollout"
    # fold_anchor moves the tick-level anchor search + window gather INTO
    # the kernel (one XLA op per tick). Measured A/B at the flagship shape
    # (docs/PERF.md): ~10 µs/solve SLOWER than the XLA prologue — the ~100
    # dynamically-indexed scalar VMEM reads cost more than the op-launch
    # overhead they remove — so the default is OFF; the mode is kept
    # (parity-tested: tests/test_mppi_tick.py::
    # test_tick_fold_anchor_matches_baseline) for problems with larger K
    # where the fixed
    # prologue amortizes differently. ``mppi_step`` detects it via
    # ``tick.folds_anchor`` and passes the PREVIOUS anchor through ctx.
    fold_anchor = False if fold_anchor is None else fold_anchor
    if fold_anchor and rollout_carry:
        raise ValueError(
            "fold_anchor is tick-anchored; waypoint_carry='rollout' carries "
            "in-kernel already"
        )
    # lean mode (round-5): minimum-prologue tick — seed chain, scalar
    # packing, Cholesky/Σ⁻¹ and the energy matmul all move in-kernel (see
    # diffdrive_mppi_tick's docstring). Auto-enabled where applicable; the
    # per-call fallback below keeps injected-ε parity and obstacle/control-
    # cost configs on the classic path (the None-ness of params fields is
    # static at trace time).
    lean_mode = (
        (fuse_epilogue and not rollout_carry) if lean is None else lean
    )
    if lean_mode and not (fuse_epilogue and not rollout_carry):
        raise ValueError(
            "lean=True requires fuse_epilogue and excludes "
            "waypoint_carry='rollout'"
        )

    def tick(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        x0: jnp.ndarray,
        seed: jnp.ndarray,
        noise: Optional[jnp.ndarray],
    ):
        P = params.ref_path.shape[0]
        if rollout_carry:
            # pre-gather the carry window from the tick anchor with CLAMPED
            # indices (path-end rows duplicate P−1, resolved to the genuine
            # first index by the kernel's first-tie rule — the same clip rule
            # as ops/waypoints.nearest_waypoint_carried)
            span = min(cfg.waypoint_search_len, P)
            Wlen = min(
                cfg.carry_window_len
                if cfg.carry_window_len is not None
                else cfg.waypoint_search_len + cfg.horizon,
                P,
            )
            start = jnp.clip(ctx.waypoint_start, 0, P - 1)
            gidx = jnp.minimum(
                start + jnp.arange(Wlen, dtype=jnp.int32), P - 1
            )
            window = jnp.take(params.ref_path, gidx, axis=0)
        elif fold_anchor:
            # the kernel runs the whole tick-level anchor advance itself:
            # ctx.waypoint_start is the PREVIOUS tick's anchor and the full
            # path goes in; the new anchor comes back as an extra output
            # (mppi_step cooperates via tick.folds_anchor)
            span = min(cfg.waypoint_search_len, P)
            Wlen = min(cfg.waypoint_search_len, P)
            window = params.ref_path
        else:
            span = 0
            Wlen = min(cfg.waypoint_search_len, P)
            start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
            window = jax.lax.dynamic_slice_in_dim(
                params.ref_path, start, Wlen, axis=0
            )
        use_lean = (
            lean_mode
            and noise is None
            and params.obstacles is None
            and params.control_weight is None
        )
        if use_lean:
            # ``seed`` is the (2,) uint32 carried key in this mode (mppi_step
            # cooperates via tick.lean); Σ goes in raw, everything else the
            # kernel derives itself. Returns (..., key_next).
            return diffdrive_mppi_tick(
                seed,
                u,
                u,  # a-slot unused in lean mode
                params.sigma,  # Σ itself (kernel runs the 2x2 Cholesky)
                x0,
                window[:, :3],
                params.stage_weight,
                params.terminal_weight,
                params.u_min,
                params.u_max,
                cfg.dt,
                (1.0 - cfg.exploration) * cfg.num_samples,
                cfg.inv_temperature,
                filter_t=filter_t,
                K=cfg.num_samples,
                T=cfg.horizon,
                W=Wlen,
                last_only=(cfg.accumulation == CostAccumulation.LAST),
                interpret=interpret,
                gaussian=gaussian,
                collision=collision,
                fuse_epilogue=True,
                iso_xy=iso_xy,
                sincos=sincos,
                lean=True,
                lean_consts=(
                    cfg.dt,
                    (1.0 - cfg.exploration) * cfg.num_samples,
                    cfg.inv_temperature,
                    cfg.gamma,
                ),
                fold_anchor=fold_anchor,
                span=span if fold_anchor else 0,
                prev_idx=ctx.waypoint_start if fold_anchor else None,
            )
        a = cfg.gamma * (u @ sigma_inverse(params.sigma))
        if lean_mode:
            # fallback inside a lean tick (injected ε / obstacles / control
            # cost): derive the classic i32 seed from the key words and
            # advance the key XLA-side so the return shape stays uniform
            kd = seed
            seed = jax.lax.bitcast_convert_type(kd[0] ^ kd[1], jnp.int32)
            kd_next = kd + jnp.asarray(
                [0x9E3779B9, 0x85EBCA6B], jnp.uint32
            )
        out = diffdrive_mppi_tick(
            seed,
            u,
            a,
            small_cholesky(params.sigma),
            x0,
            window[:, :3],
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            cfg.inv_temperature,
            obstacles=params.obstacles,
            robot_radius=robot_radius,
            safety_margin_rate=safety_margin_rate,
            eps=noise,
            obstacle_velocities=params.obstacle_velocities,
            soft_safety_distance=soft_safety_distance,
            soft_weight=soft_weight,
            filter_t=filter_t,
            K=cfg.num_samples,
            T=cfg.horizon,
            W=Wlen,
            last_only=(cfg.accumulation == CostAccumulation.LAST),
            interpret=interpret,
            gaussian=gaussian,
            collision=collision,
            fuse_epilogue=fuse_epilogue,
            iso_xy=iso_xy,
            rollout_carry=rollout_carry,
            carry_W=0 if fold_anchor else span,
            sincos=sincos,
            control_weight=params.control_weight,
            fold_anchor=fold_anchor,
            span=span if fold_anchor else 0,
            prev_idx=ctx.waypoint_start if fold_anchor else None,
        )
        if lean_mode:
            out = tuple(out) + (kd_next,)
        if not rollout_carry:
            return out
        # kernel returns the max LOCAL carried row; map to a global path
        # index (clamped rows can't exceed P−1 by construction)
        out = list(out)
        wp_adv = out.pop()
        wp_global = jnp.minimum(start + wp_adv, P - 1)
        return tuple(out) + (wp_global,)

    tick.fused_epilogue = fuse_epilogue
    tick.supports_rollout_carry = rollout_carry
    tick.folds_anchor = fold_anchor
    tick.supports_control_cost = True
    tick.lean = lean_mode
    return tick


def make_pallas_diffdrive_tick_blocked(
    cfg: MPPIConfig,
    robot_radius: float = 0.5,
    k_block: int = 10240,
    collision: str = "circle",
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    iso_xy: bool = False,
    sincos: str = "poly",
    safety_margin_rate: float = 1.5,
):
    """Bind the K-blocked fused tick (ops/pallas/mppi_tick_blocked.py) as
    tick_fn — pod-scale sample counts (K ≥ ~40k at T=50) on one chip.

    A sequential Pallas grid over K/k_block sample blocks with an online
    softmax (running-ρ rescale) regenerates ε per block on-chip, so VMEM
    holds one block's noise instead of all of K. PRNG-mode only (injected ε
    would defeat the purpose — the engine raises if parity noise is passed);
    TPU-only like the other PRNG kernels. Semantics identical to the
    single-block tick / scan engine (exact-parity via regenerated ε:
    tests/test_mppi_tick_blocked.py).
    """
    from ..ops.pallas.mppi_tick_blocked import diffdrive_mppi_tick_blocked
    from ..ops.sampling import small_cholesky

    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the blocked fused tick does not implement num_rollout_repeats>1 "
            "— use the scan path"
        )
    if cfg.num_samples % k_block != 0:
        raise ValueError(
            f"num_samples={cfg.num_samples} must be a multiple of "
            f"k_block={k_block}"
        )

    def tick(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        x0: jnp.ndarray,
        seed: jnp.ndarray,
        noise: Optional[jnp.ndarray],
    ):
        if noise is not None:
            raise ValueError(
                "the blocked fused tick is PRNG-mode only (per-block on-chip "
                "ε) — use the single-block tick or scan path for injected "
                "noise"
            )
        if iso_xy:
            _check_iso_weights(params)
        P = params.ref_path.shape[0]
        Wlen = min(cfg.waypoint_search_len, P)
        start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
        window = jax.lax.dynamic_slice_in_dim(params.ref_path, start, Wlen, axis=0)
        a = cfg.gamma * (u @ sigma_inverse(params.sigma))
        S, rho, eta, w_eps = diffdrive_mppi_tick_blocked(
            seed,
            u,
            a,
            small_cholesky(params.sigma),
            x0,
            window[:, :3],
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            cfg.inv_temperature,
            obstacles=params.obstacles,
            robot_radius=robot_radius,
            safety_margin_rate=safety_margin_rate,
            obstacle_velocities=params.obstacle_velocities,
            soft_safety_distance=soft_safety_distance,
            soft_weight=soft_weight,
            K=cfg.num_samples,
            T=cfg.horizon,
            W=Wlen,
            K_BLK=k_block,
            last_only=(cfg.accumulation == CostAccumulation.LAST),
            collision=collision,
            iso_xy=iso_xy,
            sincos=sincos,
        )
        # per-sample weights: one cheap elementwise pass over S in XLA
        inv_t = jnp.asarray(cfg.inv_temperature, S.dtype)
        w = jnp.exp(-inv_t * (S - rho)) / eta
        return S, w, w_eps

    return tick


def make_pallas_bicycle_tick(
    cfg: MPPIConfig,
    wheel_base: float = 2.5,
    vehicle_length: float = 4.0,
    vehicle_width: float = 3.0,
    margin_rate: float = 1.5,
    interpret: bool = False,
    gaussian: str = "popcount",
    iso_xy: bool = False,
    sincos: str = "poly",
):
    """Bind the fully-fused race-car tick kernel (ops/pallas/bicycle_tick.py).

    One kernel per tick: on-chip ε ~ N(0, Σ), bicycle rollout + wrap-yaw
    tracking + polygon collision over the W≈200 window, softmax, weighted
    reduce — the ε tensor never exists in HBM. Single-device; semantics of
    make_pallas_bicycle_rollout (parity: tests/test_bicycle_tick.py).
    ``iso_xy`` specializes for symmetric x/y tracking weights — the reference
    race car's own (50, 50, 1, 20) defaults (mppi_race_car_obstacle.py:22-26)
    — dropping the rx/ry select chains from the dominant W-deep window loop
    (checked against params at call time).
    """
    from ..ops.pallas.bicycle_tick import bicycle_mppi_tick
    from ..ops.sampling import small_cholesky

    if cfg.accumulation == CostAccumulation.LAST:
        raise ValueError(
            "the fused bicycle tick implements SUM accumulation only "
            "(mppi_race_car_obstacle.py:94) — use the scan path"
        )
    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the fused bicycle tick does not implement num_rollout_repeats>1 "
            "— use the scan path"
        )

    def tick(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        x0: jnp.ndarray,
        seed: jnp.ndarray,
        noise: Optional[jnp.ndarray],
    ):
        if params.obstacle_velocities is not None:
            raise ValueError(
                "the fused bicycle tick does not implement in-rollout moving "
                "obstacles (obstacle_velocities) — use the scan path"
            )
        if iso_xy:
            _check_iso_weights(params)
        P = params.ref_path.shape[0]
        Wlen = min(cfg.waypoint_search_len, P)
        start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
        window = jax.lax.dynamic_slice_in_dim(params.ref_path, start, Wlen, axis=0)
        a = cfg.gamma * (u @ sigma_inverse(params.sigma))
        return bicycle_mppi_tick(
            seed,
            u,
            a,
            small_cholesky(params.sigma),
            x0,
            window[:, :4],
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            cfg.inv_temperature,
            obstacles=params.obstacles,
            wheel_base=wheel_base,
            vehicle_length=vehicle_length,
            vehicle_width=vehicle_width,
            margin_rate=margin_rate,
            eps=noise,
            K=cfg.num_samples,
            T=cfg.horizon,
            W=Wlen,
            interpret=interpret,
            gaussian=gaussian,
            iso_xy=iso_xy,
            sincos=sincos,
        )

    return tick


def make_generic_fused_tick(
    cfg: MPPIConfig,
    step_tile: Callable,
    nx: Optional[int] = None,
    *,
    wrap_yaw: bool = False,
    collision: str = "circle",
    robot_radius: float = 0.5,
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    interpret: bool = False,
    gaussian: str = "popcount",
    fuse_epilogue: bool = False,
    safety_margin_rate: float = 1.5,
):
    """Bind the generic fused tick kernel (ops/pallas/generic_tick.py) as
    tick_fn for *arbitrary* dynamics.

    ``step_tile`` is a tile-form discrete step (models/tile.py — built-in
    families, or ``lift_dynamics`` around any F(x, u)). It is traced into one
    Pallas kernel per tick with the engine's tracking-cost semantics
    (make_tracking_costs: nearest-waypoint window, optional wrap-yaw,
    circle/soft obstacles incl. in-rollout drift, exploration split, energy
    term, SUM/LAST accumulation). Single-device, like the other fused ticks.

    The number of tracked dims comes from ``params.stage_weight`` at trace
    time; ``nx`` defaults to ``cfg.dim_x``. Construct once and reuse — the
    returned closure holds the static kernel arguments.
    """
    from ..ops.pallas.generic_tick import generic_mppi_tick
    from ..ops.sampling import small_cholesky

    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the generic fused tick does not implement num_rollout_repeats>1 "
            "(M-repeat variance cost) — use the scan path"
        )
    nx = cfg.dim_x if nx is None else nx
    nu = cfg.dim_u

    filter_t = None
    if fuse_epilogue:
        import numpy as _np

        from ..config import SmoothingFilter
        from ..ops.filters import filter_matrix

        if cfg.filter == SmoothingFilter.NONE:
            F = _np.eye(cfg.horizon)
        else:
            F = filter_matrix(
                cfg.filter.value, cfg.horizon, cfg.filter_window,
                cfg.savgol_polyorder,
            )
        # numpy, NOT jnp — see make_pallas_diffdrive_tick (sync cliff).
        filter_t = _np.asarray(F.T, _np.float32)

    rollout_carry = cfg.waypoint_carry == "rollout"

    def tick(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        x0: jnp.ndarray,
        seed: jnp.ndarray,
        noise: Optional[jnp.ndarray],
    ):
        P = params.ref_path.shape[0]
        if rollout_carry:
            # carry window: clamped gather from the tick anchor (see
            # make_pallas_diffdrive_tick's rollout_carry branch)
            span = min(cfg.waypoint_search_len, P)
            Wlen = min(
                cfg.carry_window_len
                if cfg.carry_window_len is not None
                else cfg.waypoint_search_len + cfg.horizon,
                P,
            )
            start = jnp.clip(ctx.waypoint_start, 0, P - 1)
            gidx = jnp.minimum(start + jnp.arange(Wlen, dtype=jnp.int32), P - 1)
            window = jnp.take(params.ref_path, gidx, axis=0)
        else:
            span = 0
            Wlen = min(cfg.waypoint_search_len, P)
            start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
            window = jax.lax.dynamic_slice_in_dim(
                params.ref_path, start, Wlen, axis=0
            )
        a = cfg.gamma * (u @ sigma_inverse(params.sigma))
        if params.terminal_weight.shape[0] != params.stage_weight.shape[0]:
            raise ValueError(
                "the generic fused tick tracks one n_track for both costs — "
                f"stage_weight has {params.stage_weight.shape[0]} dims, "
                f"terminal_weight {params.terminal_weight.shape[0]}; "
                "use the scan path for asymmetric weights"
            )
        out = generic_mppi_tick(
            seed,
            u,
            a,
            small_cholesky(params.sigma),
            x0,
            window,
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            cfg.inv_temperature,
            obstacles=params.obstacles,
            robot_radius=robot_radius,
            safety_margin_rate=safety_margin_rate,
            eps=noise,
            obstacle_velocities=params.obstacle_velocities,
            soft_safety_distance=soft_safety_distance,
            soft_weight=soft_weight,
            filter_t=filter_t,
            step_tile=step_tile,
            nx=nx,
            nu=nu,
            n_track=int(params.stage_weight.shape[0]),
            K=cfg.num_samples,
            T=cfg.horizon,
            W=Wlen,
            wrap_yaw=wrap_yaw,
            last_only=(cfg.accumulation == CostAccumulation.LAST),
            interpret=interpret,
            gaussian=gaussian,
            step_takes_t=cfg.time_varying_dynamics,
            collision=collision,
            fuse_epilogue=fuse_epilogue,
            rollout_carry=rollout_carry,
            carry_W=span,
        )
        if not rollout_carry:
            return out
        out = list(out)
        wp_adv = out.pop()
        wp_global = jnp.minimum(start + wp_adv, P - 1)
        return tuple(out) + (wp_global,)

    tick.fused_epilogue = fuse_epilogue
    tick.supports_rollout_carry = rollout_carry
    return tick


def make_generic_pallas_rollout(
    cfg: MPPIConfig,
    step_tile: Callable,
    nx: Optional[int] = None,
    *,
    wrap_yaw: bool = False,
    collision: str = "circle",
    robot_radius: float = 0.5,
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    interpret: bool = False,
    safety_margin_rate: float = 1.5,
):
    """Bind the generic rollout+cost kernel as rollout_fn for *arbitrary*
    dynamics — the sample-sharded counterpart of ``make_generic_fused_tick``.

    Each shard rolls out its local K/n samples in one Pallas launch with the
    global sample-index offset (exploration split over the *global* K); the
    three cross-sample reductions (ρ, η, w·ε) ride XLA collectives in
    ``mppi_step`` (SURVEY §2.10). Same cost semantics as the fused tick.
    """
    from ..ops.pallas.generic_tick import generic_rollout_costs

    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the generic rollout kernel does not implement "
            "num_rollout_repeats>1 (M-repeat variance cost) — use the scan path"
        )
    nx = cfg.dim_x if nx is None else nx
    nu = cfg.dim_u

    def rollout(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        eps: jnp.ndarray,
        x0: jnp.ndarray,
        axis_name=None,
    ):
        P = params.ref_path.shape[0]
        Wlen = min(cfg.waypoint_search_len, P)
        start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
        window = jax.lax.dynamic_slice_in_dim(params.ref_path, start, Wlen, axis=0)
        a = cfg.gamma * (u @ sigma_inverse(params.sigma))
        if params.terminal_weight.shape[0] != params.stage_weight.shape[0]:
            raise ValueError(
                "the generic rollout kernel tracks one n_track for both costs "
                "— stage/terminal weight lengths must match; use the scan path"
            )
        k_offset = 0.0
        if axis_name is not None:
            k_offset = (
                jax.lax.axis_index(axis_name).astype(jnp.float32) * eps.shape[0]
            )
        return generic_rollout_costs(
            eps,
            u,
            a,
            x0,
            window,
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            obstacles=params.obstacles,
            robot_radius=robot_radius,
            safety_margin_rate=safety_margin_rate,
            obstacle_velocities=params.obstacle_velocities,
            soft_safety_distance=soft_safety_distance,
            soft_weight=soft_weight,
            k_offset=k_offset,
            step_tile=step_tile,
            nx=nx,
            nu=nu,
            n_track=int(params.stage_weight.shape[0]),
            T=cfg.horizon,
            W=Wlen,
            wrap_yaw=wrap_yaw,
            last_only=(cfg.accumulation == CostAccumulation.LAST),
            interpret=interpret,
            collision=collision,
            step_takes_t=cfg.time_varying_dynamics,
        )

    return rollout


def make_pallas_bicycle_rollout(
    cfg: MPPIConfig,
    wheel_base: float = 2.5,
    vehicle_length: float = 4.0,
    vehicle_width: float = 3.0,
    margin_rate: float = 1.5,
    interpret: bool = False,
):
    """Bind the fused bicycle kernel (race-car config 3) as rollout_fn.

    Semantics: Euler kinematic bicycle + wrap-yaw 4-term tracking + polygon
    collision — ops/pallas/rollout_bicycle.py, parity-tested against the scan
    path in tests/test_pallas_bicycle.py.

    Raises ValueError for config the kernel does not implement (LAST
    accumulation, M-repeat rollouts, moving obstacles) rather than silently
    diverging from the scan path's semantics.
    """
    from ..ops.pallas.rollout_bicycle import bicycle_rollout_costs

    if cfg.accumulation == CostAccumulation.LAST:
        raise ValueError(
            "the fused bicycle kernel implements SUM accumulation only "
            "(mppi_race_car_obstacle.py:94); accumulation=LAST needs the scan path"
        )
    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the fused bicycle kernel does not implement num_rollout_repeats>1 "
            "— use the scan path (rollout_fn=None)"
        )

    def rollout(
        params: MPPIParams,
        ctx: CostContext,
        u: jnp.ndarray,
        eps: jnp.ndarray,
        x0: jnp.ndarray,
        axis_name=None,
    ):
        if params.obstacle_velocities is not None:
            raise ValueError(
                "the fused bicycle kernel does not implement in-rollout "
                "moving obstacles (obstacle_velocities) — use the scan path"
            )
        P = params.ref_path.shape[0]
        Wlen = min(cfg.waypoint_search_len, P)
        start = jnp.clip(ctx.waypoint_start, 0, max(P - Wlen, 0))
        window = jax.lax.dynamic_slice_in_dim(params.ref_path, start, Wlen, axis=0)
        a = cfg.gamma * (u @ sigma_inverse(params.sigma))
        k_offset = 0.0
        if axis_name is not None:
            k_offset = (
                jax.lax.axis_index(axis_name).astype(jnp.float32) * eps.shape[0]
            )
        return bicycle_rollout_costs(
            eps,
            u,
            a,
            x0,
            window[:, :4],
            params.stage_weight,
            params.terminal_weight,
            params.u_min,
            params.u_max,
            cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            wheel_base=wheel_base,
            vehicle_length=vehicle_length,
            vehicle_width=vehicle_width,
            margin_rate=margin_rate,
            obstacles=params.obstacles,
            k_offset=k_offset,
            T=cfg.horizon,
            W=Wlen,
            interpret=interpret,
        )

    return rollout


def make_fleet_fused_mppi_step(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    robot_radius: float = 0.5,
    collision: str = "circle",
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    iso_xy: bool = False,
    sincos: str = "poly",
    safety_margin_rate: float = 1.5,
):
    """Lane-batched MPPI fleet: B independent controllers per Pallas launch.

    The MPPI analog of the lane-batched NMPC QP fleet (584k-solves/s row,
    docs/PERF.md): ``tick_fn`` kernels are un-vmappable, so a fleet of B
    controllers previously fell back to the vmapped scan path. This binds
    ops/pallas/mppi_tick_blocked.fleet_mppi_tick — a grid over members, each
    grid step running one member's complete tick (on-chip ε, rollout,
    softmax, weighted reduce) — and vmaps only the tiny XLA tail.

    Returns ``step(params, states, x0s) -> (u0s, states, auxs)``:
    ``params`` is one shared :class:`MPPIParams` whose ``ref_path`` (and
    optional ``obstacles``/``obstacle_velocities``) may carry a leading
    member axis for per-member references; ``states`` is a batched
    :class:`MPPIState` (leading B); ``x0s`` is (B, dim_x). PRNG-mode only
    and TPU-only, like the other fused ticks; per-member parity vs the
    blocked tick is pinned in tests/test_fleet_tick.py. Reference analog:
    the multi-robot data-collection fleets of
    train/bullet_mpc_differential_drive.py:119-157.
    """
    from ..ops.pallas.mppi_tick_blocked import fleet_mppi_tick
    from ..ops.sampling import small_cholesky

    if cfg.num_rollout_repeats > 1:
        raise ValueError(
            "the fleet fused tick does not implement num_rollout_repeats>1 "
            "— use the vmapped scan path"
        )
    T = cfg.horizon

    @jax.jit
    def step(params: MPPIParams, states: MPPIState, x0s: jnp.ndarray):
        if params.control_weight is not None:
            raise ValueError(
                "params.control_weight (pytorch_mppi action cost) is not "
                "implemented in the fleet tick — use per-member MPPISolver "
                "steps (scan path / single-block tick)"
            )
        B = x0s.shape[0]
        u = states.u_prev  # (B, T, nu)
        x0s_f = x0s.astype(u.dtype)
        params_f = unify_float_dtype(params, u.dtype)
        per_member_path = params_f.ref_path.ndim == 3

        def advance(ref_path, x0, wp):
            idx, _ = nearest_waypoint(ref_path, x0[:2], wp, cfg.waypoint_search_len)
            P = ref_path.shape[0]
            Wlen = min(cfg.waypoint_search_len, P)
            start = jnp.clip(idx, 0, max(P - Wlen, 0))
            win = jax.lax.dynamic_slice_in_dim(ref_path, start, Wlen, axis=0)
            return idx, win

        if per_member_path:
            wp_idx, windows = jax.vmap(advance)(
                params_f.ref_path, x0s_f, states.waypoint_idx
            )
        else:
            wp_idx, windows = jax.vmap(lambda x, w: advance(params_f.ref_path, x, w))(
                x0s_f, states.waypoint_idx
            )

        # per-member Weyl seed advance (same rule as the single-device tick)
        typed = jnp.issubdtype(states.key.dtype, jax.dtypes.prng_key)
        kd = jax.random.key_data(states.key) if typed else states.key  # (B, 2)
        seeds = jax.lax.bitcast_convert_type(kd[:, 0] ^ kd[:, 1], jnp.int32)
        kd_next = kd + jnp.asarray([[0x9E3779B9, 0x85EBCA6B]], jnp.uint32)
        keys = (
            jax.random.wrap_key_data(kd_next, impl="threefry2x32")
            if typed
            else kd_next
        )

        a = cfg.gamma * jnp.einsum(
            "btu,uv->btv", u, sigma_inverse(params_f.sigma)
        )
        obstacles = params_f.obstacles
        obstacle_velocities = params_f.obstacle_velocities
        if obstacles is not None and obstacles.ndim == 2:
            obstacles = jnp.broadcast_to(
                obstacles, (B,) + obstacles.shape
            )
        if obstacle_velocities is not None and obstacle_velocities.ndim == 2:
            obstacle_velocities = jnp.broadcast_to(
                obstacle_velocities, (B,) + obstacle_velocities.shape
            )
        S, w, w_eps = fleet_mppi_tick(
            seeds, u, a, small_cholesky(params_f.sigma), x0s_f,
            windows[..., :3],
            params_f.stage_weight, params_f.terminal_weight,
            params_f.u_min, params_f.u_max, cfg.dt,
            (1.0 - cfg.exploration) * cfg.num_samples,
            cfg.inv_temperature,
            obstacles=obstacles,
            robot_radius=robot_radius,
            safety_margin_rate=safety_margin_rate,
            obstacle_velocities=obstacle_velocities,
            soft_safety_distance=soft_safety_distance,
            soft_weight=soft_weight,
            sincos=sincos,
            B=B, K=cfg.num_samples, T=T,
            W=windows.shape[1],
            last_only=(cfg.accumulation == CostAccumulation.LAST),
            collision=collision,
            iso_xy=iso_xy,
        )

        # _mppi_tail only uses ref_path for its LENGTH (end-of-path bit) and
        # u_min/u_max for the optional optimal-traj clip — hand it a 2-D path
        # so the per-member (B, P, d) stack doesn't read B as the length.
        tail_params = params_f
        if per_member_path:
            tail_params = dataclasses.replace(
                params_f, ref_path=params_f.ref_path[0]
            )

        def tail(u_b, w_eps_b, x0_b, key_b, wp_b, S_b, w_b):
            state_b = MPPIState(u_prev=u_b, waypoint_idx=wp_b, key=key_b)
            ctx = CostContext(params=tail_params, waypoint_start=wp_b)
            return _mppi_tail(
                cfg, dynamics_step, tail_params, state_b, ctx, x0_b, u_b,
                key_b, wp_b, S_b, w_b, w_eps_b,
            )

        return jax.vmap(tail)(u, w_eps, x0s_f, keys, wp_idx, S, w)

    return step


_SINGLE_BLOCK_VMEM_BUDGET = 10 * 2**20
# peak live bytes of the PRNG+ε stage: two (T, K/128, 128) f32 ε planes PLUS
# the two standard-normal temporaries they are colored from — 16·T·K bytes
# (the 2-plane estimate OOMed the 16 MB scoped-vmem limit at K=25 600, T=50)
_EPS_BYTES_PER_SAMPLE_STEP = 16


def _pick_k_block(K: int, T: int) -> int:
    """Largest multiple-of-1024 divisor of K whose ε stage fits the budget."""
    best = 0
    for blk in range(1024, K + 1, 1024):
        if (
            K % blk == 0
            and _EPS_BYTES_PER_SAMPLE_STEP * T * blk <= _SINGLE_BLOCK_VMEM_BUDGET
        ):
            best = blk
    if not best:
        raise ValueError(
            f"no multiple-of-1024 block divides K={K} within the VMEM budget "
            f"at T={T} — pick K a multiple of 1024 (e.g. 102 400)"
        )
    return best


class MPPISolver:
    """Convenience wrapper: binds config + dynamics + costs, jits the step.

    Covers the constructor surface of MPPIAlgorithms
    (mppi_differential_drive.py:44-85) / MPPIRacecarController
    (mppi_race_car_obstacle.py:11-62) with explicit state instead of mutation.
    """

    def __init__(
        self,
        cfg: MPPIConfig,
        dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        stage_cost: StageCost,
        terminal_cost: TerminalCost,
        use_pallas: Optional[bool] = None,
        robot_radius: float = 0.5,
        safety_margin_rate: float = 1.5,
        rollout_fn: Optional[Callable] = None,
        fused_tick: bool = False,
        tick_fn: Optional[Callable] = None,
        gaussian: str = "popcount",
        tile_dynamics: Optional[Callable] = None,
        wrap_yaw: bool = False,
        collision: str = "circle",
        soft_safety_distance: float = 2.0,
        soft_weight: float = 100.0,
        fuse_epilogue: bool = True,
        iso_xy: bool = False,
        fold_anchor: Optional[bool] = None,
        lean: Optional[bool] = None,
    ) -> None:
        self.cfg = cfg
        self.dynamics_step = dynamics_step
        use_pallas = cfg.use_pallas if use_pallas is None else use_pallas
        if cfg.time_varying_dynamics and (use_pallas or fused_tick) and (
            tile_dynamics is None and tick_fn is None and rollout_fn is None
        ):
            # a caller-supplied rollout_fn (e.g. make_generic_pallas_rollout,
            # which threads step_takes_t) handles t itself — only the
            # model-specialized diff-drive kernels, whose dynamics compile
            # in, cannot (round-4 review: the old guard also rejected valid
            # rollout_fn configs and named a non-existent lift_dynamics kwarg)
            raise ValueError(
                "time_varying_dynamics needs the scan path, a generic "
                "rollout_fn, or the generic tick (pass tile_dynamics built "
                "with models.tile.lift_dynamics_time_varying); the "
                "model-specialized diff-drive kernels compile their "
                "dynamics in"
            )
        if tile_dynamics is not None and not fused_tick and tick_fn is None:
            raise ValueError(
                "tile_dynamics is only used by the fused tick kernel — pass "
                "fused_tick=True (or bind make_generic_pallas_rollout as "
                "rollout_fn for the sharded path)"
            )
        if tick_fn is None and fused_tick:
            if tile_dynamics is not None:
                # Generic fused tick: any model family in one Pallas launch
                # (tile_dynamics from models/tile.py or lift_dynamics).
                tick_fn = make_generic_fused_tick(
                    cfg,
                    tile_dynamics,
                    wrap_yaw=wrap_yaw,
                    collision=collision,
                    robot_radius=robot_radius,
                    soft_safety_distance=soft_safety_distance,
                    soft_weight=soft_weight,
                    gaussian=gaussian,
                    fuse_epilogue=fuse_epilogue,
                    safety_margin_rate=safety_margin_rate,
                )
            elif (
                _EPS_BYTES_PER_SAMPLE_STEP * cfg.horizon * cfg.num_samples
                > _SINGLE_BLOCK_VMEM_BUDGET
            ):
                # Past ~K=25k at T=50 the single-block kernel's two (T, K/128,
                # 128) ε scratch planes overflow VMEM — switch to the
                # K-blocked grid kernel with per-block ε regeneration.
                if cfg.waypoint_carry == "rollout":
                    raise ValueError(
                        "waypoint_carry='rollout' is implemented in the "
                        "single-block fused tick (K·T under the VMEM budget) "
                        "and the generic tick — reduce num_samples/horizon "
                        "or use the scan path at this scale"
                    )
                tick_fn = make_pallas_diffdrive_tick_blocked(
                    cfg,
                    robot_radius,
                    k_block=_pick_k_block(cfg.num_samples, cfg.horizon),
                    collision=collision,
                    soft_safety_distance=soft_safety_distance,
                    soft_weight=soft_weight,
                    iso_xy=iso_xy,
                    safety_margin_rate=safety_margin_rate,
                )
            else:
                # collision/soft settings must reach the kernel — dropping
                # them here silently changed the cost semantics (round-2
                # review finding).
                tick_fn = make_pallas_diffdrive_tick(
                    cfg,
                    robot_radius,
                    gaussian=gaussian,
                    collision=collision,
                    soft_safety_distance=soft_safety_distance,
                    soft_weight=soft_weight,
                    fuse_epilogue=fuse_epilogue,
                    iso_xy=iso_xy,
                    safety_margin_rate=safety_margin_rate,
                    fold_anchor=fold_anchor,
                    lean=lean,
                )
        if rollout_fn is None and use_pallas and tick_fn is None:
            rollout_fn = make_pallas_diffdrive_rollout(
                cfg, robot_radius, safety_margin_rate=safety_margin_rate
            )
        self._step = jax.jit(
            functools.partial(
                mppi_step,
                cfg,
                dynamics_step,
                stage_cost,
                terminal_cost,
                rollout_fn=rollout_fn,
                tick_fn=tick_fn,
            )
        )
        self._sampled = jax.jit(
            functools.partial(sampled_trajectories, cfg, dynamics_step),
            static_argnames=("top_fraction",),
        )

    def init(self, key: Optional[jax.Array] = None) -> MPPIState:
        return MPPIState.init(self.cfg, key)

    def step(
        self,
        params: MPPIParams,
        state: MPPIState,
        x0: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, MPPIState, MPPIAux]:
        return self._step(params, state, x0, noise)

    def sampled_trajectories(self, params, state, x0, noise, costs, top_fraction=1.0):
        return self._sampled(params, state, x0, noise, costs, top_fraction=top_fraction)


__all__ = [
    "MPPIState",
    "MPPIAux",
    "CostContext",
    "make_tracking_costs",
    "make_pallas_diffdrive_rollout",
    "make_pallas_diffdrive_tick",
    "make_pallas_diffdrive_tick_blocked",
    "make_fleet_fused_mppi_step",
    "make_pallas_bicycle_rollout",
    "make_pallas_bicycle_tick",
    "make_generic_fused_tick",
    "make_generic_pallas_rollout",
    "mppi_step",
    "sampled_trajectories",
    "MPPISolver",
]
