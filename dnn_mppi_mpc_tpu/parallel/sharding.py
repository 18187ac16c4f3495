"""Multi-chip execution: sample-sharded MPPI and scenario batching over a Mesh.

The reference has no multi-device code at all (SURVEY §2.10) — these are the
TPU-native scaling dimensions defined by the north-star metric:

* **sample sharding** — the K rollout dimension is split across mesh devices
  with ``shard_map``; the only cross-chip traffic per control tick is
  ρ = pmin(S), η = psum(Σexp) and the psum of the (T, dim_u) weighted-noise
  update — a few hundred bytes riding ICI.
* **scenario batching** — independent control problems (multi-robot / multi-goal
  data collection, train/bullet_mpc_differential_drive.py:119-157) are vmapped
  and sharded over a 'batch' mesh axis.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MPPIConfig, MPPIParams
from ..solvers.mppi import MPPIState, StageCost, TerminalCost, mppi_step


def make_mesh(
    axis_names: Sequence[str] = ("k",), shape: Optional[Sequence[int]] = None
) -> Mesh:
    """Build a Mesh over all local devices; default: 1-D sample axis."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    import numpy as np

    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def make_sharded_mppi_step(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stage_cost: StageCost,
    terminal_cost: TerminalCost,
    mesh: Mesh,
    axis: str = "k",
    rollout_fn: Optional[Callable] = None,
) -> Callable:
    """jit(shard_map(mppi_step)) with K sharded over ``axis``.

    Controller state / params / x0 are replicated; injected noise (if any) is
    sharded on its K axis. cfg.num_samples must divide evenly by the axis size.
    """
    n = mesh.shape[axis]
    if cfg.num_samples % n != 0:
        raise ValueError(
            f"num_samples={cfg.num_samples} must be divisible by mesh axis {axis}={n}"
        )

    inner = functools.partial(
        mppi_step,
        cfg,
        dynamics_step,
        stage_cost,
        terminal_cost,
        axis_name=axis,
        rollout_fn=rollout_fn,
    )

    from ..solvers.mppi import MPPIAux

    aux_specs = MPPIAux(
        costs=P(axis),
        weights=P(axis),
        optimal_traj=P(),
        waypoint_idx=P(),
        status=P(),
    )
    # check_vma=False: inputs mix replicated pytrees (params/state/x0) with
    # the K-sharded noise; mppi_step's outputs become replicated only through
    # pmin/psum, which the varying-axis checker cannot always prove through
    # the filter/shift epilogue. Divisibility is validated above, and parity
    # vs the single-device step is asserted in tests/test_sharding.py.
    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=(P(), P(), aux_specs),
        check_vma=False,
    )

    @jax.jit
    def step(params: MPPIParams, state: MPPIState, x0: jnp.ndarray, noise=None):
        if noise is None:
            # shard_map needs a concrete operand; sample per-shard inside by
            # passing a zero-size marker is messy — instead pre-sample sharded
            # noise outside via the carried key. Simplest robust path: draw the
            # full (K, T, nu) noise here; XLA shards the generation.
            from ..ops.sampling import sample_noise

            key = jax.random.fold_in(state.key, 1)
            noise = sample_noise(key, params.sigma, cfg.num_samples, cfg.horizon)
            noise = jax.lax.with_sharding_constraint(
                noise, NamedSharding(mesh, P(axis))
            )
        return sharded(params, state, x0, noise)

    return step


def make_batched_mppi_step(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stage_cost: StageCost,
    terminal_cost: TerminalCost,
    mesh: Mesh,
    axis: str = "batch",
) -> Callable:
    """vmapped MPPI over a scenario batch, sharded over ``axis``.

    Each scenario has its own params/state/x0 (leading batch dim); sampling
    uses each scenario's carried key. Used for fleet-scale data collection
    (the TPU equivalent of running many train/bullet_* collection loops).
    """
    inner = functools.partial(mppi_step, cfg, dynamics_step, stage_cost, terminal_cost)
    batched = jax.vmap(lambda p, s, x: inner(p, s, x, None))
    spec = NamedSharding(mesh, P(axis))

    @jax.jit
    def step(params: MPPIParams, states: MPPIState, x0s: jnp.ndarray):
        x0s = jax.lax.with_sharding_constraint(x0s, spec)
        return batched(params, states, x0s)

    return step


def make_sharded_fused_mppi_step(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    axis: str = "k",
    robot_radius: float = 0.5,
    safety_margin_rate: float = 1.5,
    collision: str = "circle",
    soft_safety_distance: float = 2.0,
    soft_weight: float = 100.0,
    phase1: Optional[Callable] = None,
    phase2: Optional[Callable] = None,
    iso_xy: bool = False,
    gaussian: str = "popcount",
    interpret: bool = False,
    k_blk: Optional[int] = None,
) -> Callable:
    """Sample-sharded MPPI tick with per-shard ON-CHIP noise (two-phase).

    The round-1/2 sharded path materialized ε as a (K, T, nu) HBM tensor per
    tick (solvers/mppi.py ``sample_noise`` + split rollout kernel) — measured
    ~8–10× the per-sample cost of the fused single-chip tick (docs/PERF.md).
    This path never creates that tensor (round-2 verdict #3, SURVEY §2.10(a)):

      phase 1  each shard runs the K-blocked fused kernel in ``s_only`` mode —
               ε regenerated on-chip per (seed, global block id) — yielding its
               local cost surface S;
      between  the ONLY cross-chip traffic: ρ = pmin(min S), η = psum(Σ exp),
               and the psum of the (T, nu) weighted-noise partials — a few
               hundred bytes on ICI;
      phase 2  each shard regenerates the SAME ε streams
               (ops/pallas/mppi_tick_blocked.weighted_noise_reduce) and
               reduces Σ w·ε in-kernel.

    Shards share one seed (derived from the replicated carried key); stream
    disjointness comes from the traced global block offset
    ``axis_index · blocks_per_shard``. Diff-drive tracking semantics (the
    kernels embed the cost). The hardware PRNG modes are TPU-only (no
    Mosaic-PRNG CPU lowering); ``gaussian="hash"`` + ``interpret=True``
    runs the SAME production kernel pair off-TPU with the counter-hash
    stand-in honoring the identical (seed, global block) stream contract —
    this is what ``__graft_entry__.dryrun_multichip`` certifies on the
    virtual mesh (shard-count invariance of the real phases). Injected
    pure-JAX ``phase1``/``phase2`` closures remain supported for
    structural tests (tests/test_sharded_fused.py). ``k_blk`` overrides
    the per-shard K block size — the invariance sweep pins it so the
    global block partition (and thus every (seed, block) stream) is
    identical across mesh factorizations.

    ``phase1(seed, block_offset, u, a, chol, x0, window, params, k_offset)``
    → local ``S (K/n,)``; ``phase2(seed, block_offset, w_local, chol)`` →
    local unreduced ``w_eps (T, nu)`` partial.
    """
    import dataclasses as _dc

    from ..ops.sampling import sigma_inverse, small_cholesky
    from ..ops.waypoints import nearest_waypoint
    from ..solvers.mppi import (
        CostContext,
        MPPIAux,
        _mppi_tail,
        _pick_k_block,
        unify_float_dtype,
    )

    n = mesh.shape[axis]
    K, T = cfg.num_samples, cfg.horizon
    if K % n != 0:
        raise ValueError(f"num_samples={K} must be divisible by mesh axis {axis}={n}")
    local_K = K // n

    if phase1 is None or phase2 is None:
        from ..ops.pallas.mppi_tick_blocked import (
            diffdrive_mppi_tick_blocked,
            weighted_noise_reduce,
        )

        kb = k_blk if k_blk is not None else _pick_k_block(local_K, T)
        if local_K % kb != 0:
            raise ValueError(
                f"k_blk={kb} must divide the per-shard sample count {local_K}"
            )
        blocks_per_shard = local_K // kb

        def phase1(seed, block_offset, u, a, chol, x0, window, params, k_offset):
            return diffdrive_mppi_tick_blocked(
                seed, u, a, chol, x0, window,
                params.stage_weight, params.terminal_weight,
                params.u_min, params.u_max, cfg.dt,
                (1.0 - cfg.exploration) * K, cfg.inv_temperature,
                obstacles=params.obstacles,
                robot_radius=robot_radius,
                safety_margin_rate=safety_margin_rate,
                obstacle_velocities=params.obstacle_velocities,
                soft_safety_distance=soft_safety_distance,
                soft_weight=soft_weight,
                k_offset=k_offset,
                block_offset=block_offset,
                K=local_K, T=T, W=window.shape[0], K_BLK=kb,
                last_only=False, s_only=True, collision=collision,
                iso_xy=iso_xy, gaussian=gaussian, interpret=interpret,
            )

        def phase2(seed, block_offset, w_local, chol):
            return weighted_noise_reduce(
                seed, w_local, chol, block_offset,
                K=local_K, T=T, K_BLK=kb,
                gaussian=gaussian, interpret=interpret,
            )
    else:
        blocks_per_shard = 1  # injected stand-ins define their own layout

    def inner(params: MPPIParams, state: MPPIState, x0: jnp.ndarray):
        if getattr(params, "control_weight", None) is not None:
            raise ValueError(
                "params.control_weight (pytorch_mppi action cost) is not "
                "implemented in the sharded two-phase tick — use the scan "
                "path (make_sharded_mppi_step) or the single-block fused tick"
            )
        u = state.u_prev
        x0f = x0.astype(u.dtype)
        params_f = unify_float_dtype(params, u.dtype)
        wp_idx, _ = nearest_waypoint(
            params_f.ref_path, x0f[:2], state.waypoint_idx, cfg.waypoint_search_len
        )
        P = params_f.ref_path.shape[0]
        Wlen = min(cfg.waypoint_search_len, P)
        start = jnp.clip(wp_idx, 0, max(P - Wlen, 0))
        window = jax.lax.dynamic_slice_in_dim(params_f.ref_path, start, Wlen, axis=0)

        # replicated cheap seed advance (same Weyl rule as the single-device
        # tick path in solvers/mppi.py — shards share the seed, streams
        # diverge via the block offset)
        typed = jnp.issubdtype(state.key.dtype, jax.dtypes.prng_key)
        kd = jax.random.key_data(state.key) if typed else state.key
        seed = jax.lax.bitcast_convert_type(kd[0] ^ kd[1], jnp.int32)
        kd_next = kd + jnp.asarray([0x9E3779B9, 0x85EBCA6B], jnp.uint32)
        key = (
            jax.random.wrap_key_data(kd_next, impl="threefry2x32")
            if typed
            else kd_next
        )

        i = jax.lax.axis_index(axis)
        block_offset = (i * blocks_per_shard).astype(jnp.int32)
        k_offset = (i * local_K).astype(jnp.float32)
        a = cfg.gamma * (u @ sigma_inverse(params_f.sigma))
        chol = small_cholesky(params_f.sigma)

        S_local = phase1(
            seed, block_offset, u, a, chol, x0f, window[:, :3], params_f, k_offset
        )
        inv_t = jnp.asarray(cfg.inv_temperature, u.dtype)
        rho = jax.lax.pmin(jnp.min(S_local), axis)
        m = jnp.exp(-inv_t * (S_local - rho))
        eta = jax.lax.psum(jnp.sum(m), axis)
        w_local = m / eta
        w_eps = jax.lax.psum(phase2(seed, block_offset, w_local, chol), axis)

        ctx = CostContext(params=params_f, waypoint_start=wp_idx)
        return _mppi_tail(
            cfg, dynamics_step, params_f, state, ctx, x0f, u, key, wp_idx,
            S_local, w_local, w_eps,
        )

    aux_specs = MPPIAux(
        costs=P(axis),
        weights=P(axis),
        optimal_traj=P(),
        waypoint_idx=P(),
        status=P(),
    )
    # check_vma=False for the same reason as make_sharded_mppi_step above.
    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), aux_specs),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_nmpc_fleet(solver, mesh: Mesh, axis: str = "batch") -> Callable:
    """Fleet of independent NMPC problems sharded over a mesh axis.

    The fleet (multi-robot / multi-scenario) dimension has NO cross-problem
    reductions — each device runs its B/n slice of the batched Riccati
    program, zero collectives (SURVEY §2.10(c) at pod scale). Built on
    ``shard_map`` (per-device program, not GSPMD auto-partitioning), so a
    solver with ``qp_backend="pallas"`` keeps the **lane-batched fused QP
    kernel** on every device: each shard's fleet slice rides the 128 VPU
    lanes of one barrier-Riccati launch per tick (the custom_vmap rule of
    ops/pallas/riccati_qp.py dispatches inside the per-device trace —
    measured 0.218 ms per 128-member tick vs 347 ms for the vmapped XLA
    backend, docs/PERF.md). The XLA backend shards the same way. Fleet size
    must be a multiple of the axis size.
    """
    n = mesh.shape[axis]
    batched = jax.vmap(solver._core)
    spec = P(axis)
    # check_vma=False: OCPParams/NMPCAux pytrees carry every leaf with a
    # leading fleet dim here, but blanket P(axis) specs over whole pytrees
    # trip shard_map's varying-axis validation on jax 0.9 for the aux pytree
    # (solver status scalars); divisibility is validated explicitly below
    # instead, so a mis-sized fleet fails with a clear error rather than a
    # cryptic shard_map trace (round-2 advisor findings).
    sharded = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(params, states, x0s):
        B = jax.tree.leaves(x0s)[0].shape[0]
        if B % n != 0:
            raise ValueError(
                f"fleet size {B} must be divisible by mesh axis {axis!r}={n} "
                "(shard_map partitions the fleet dimension evenly)"
            )
        return jitted(params, states, x0s)

    return step


def make_sharded_mppi_fleet(
    cfg: MPPIConfig,
    dynamics_step: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stage_cost: Optional[StageCost] = None,
    terminal_cost: Optional[TerminalCost] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "batch",
    fused: bool = False,
    **fleet_kwargs,
) -> Callable:
    """Fleet of independent MPPI controllers sharded over a mesh axis.

    The MPPI analog of :func:`make_sharded_nmpc_fleet` (SURVEY §2.10(b)
    scenario parallelism at pod scale — the multi-robot collection fleets of
    train/bullet_mpc_differential_drive.py:119-157): the fleet dimension has
    no cross-member reductions, so each device runs its B/n slice with zero
    collectives. Built on ``shard_map`` (per-device program), so with
    ``fused=True`` every device runs the **lane-batched fused fleet tick**
    (ops/pallas/mppi_tick_blocked.fleet_mppi_tick — one Pallas launch per
    fleet slice per tick, 28× the vmapped scan fleet on one chip,
    docs/PERF.md) on its own slice; PRNG-mode kernels are TPU-only, so the
    virtual-mesh CI path uses ``fused=False`` (vmapped ``mppi_step``, same
    semantics — per-member parity pinned in tests/test_fleet_tick.py).

    Returns ``step(params, states, x0s) -> (u0s, states, auxs)`` with the
    same calling convention as :func:`solvers.mppi.make_fleet_fused_mppi_step`:
    shared ``params`` (replicated to every device), optionally carrying a
    leading member axis on ``ref_path``/``obstacles``/``obstacle_velocities``
    (those leaves are then sharded with the fleet). Fleet size must be a
    multiple of the mesh axis size.
    """
    if mesh is None:
        raise ValueError("make_sharded_mppi_fleet requires a mesh")
    n = mesh.shape[axis]

    if fused:
        from ..solvers.mppi import make_fleet_fused_mppi_step

        inner = make_fleet_fused_mppi_step(cfg, dynamics_step, **fleet_kwargs)
    else:
        if stage_cost is None or terminal_cost is None:
            raise ValueError("the scan-path fleet needs stage_cost/terminal_cost")
        core = functools.partial(
            mppi_step, cfg, dynamics_step, stage_cost, terminal_cost
        )
        inner = jax.vmap(
            lambda p, s, x: core(p, s, x, None), in_axes=(0, 0, 0)
        )

    spec = P(axis)
    jitted_cache: dict = {}

    def step(params: MPPIParams, states: MPPIState, x0s: jnp.ndarray):
        B = x0s.shape[0]
        if B % n != 0:
            raise ValueError(
                f"fleet size {B} must be divisible by mesh axis {axis!r}={n} "
                "(shard_map partitions the fleet dimension evenly)"
            )
        # Per-member leaves (leading fleet axis) shard with the fleet; shared
        # leaves replicate. Detected from ranks: ref_path (P, d) vs (B, P, d),
        # obstacles/velocities (n, 3) vs (B, n, 3).
        member_leaves = tuple(
            name
            for name, a in (
                ("ref_path", params.ref_path),
                ("obstacles", params.obstacles),
                ("obstacle_velocities", params.obstacle_velocities),
            )
            if a is not None and a.ndim == 3
        )
        # key must include the pytree STRUCTURE: a params whose optional
        # leaves appear/disappear (obstacles None → shared 2-D array) maps to
        # the same member_leaves but needs different shard_map in_specs
        cache_key = (member_leaves, jax.tree.structure(params))
        if cache_key not in jitted_cache:
            pspec = jax.tree.map(lambda _: P(), params)
            import dataclasses as _dc

            pspec = _dc.replace(
                pspec, **{name: spec for name in member_leaves}
            )
            if fused:
                fn = inner  # takes shared params + batched states/x0s
            else:
                # the vmapped scan core wants per-member params: broadcast
                # shared leaves to the local slice inside the shard
                def fn(p, s, x, _member=member_leaves):
                    b = x.shape[0]
                    p_local = jax.tree.map(
                        lambda a: jnp.broadcast_to(a, (b,) + a.shape), p
                    )
                    import dataclasses as _dc2

                    p_local = _dc2.replace(
                        p_local, **{name: getattr(p, name) for name in _member}
                    )
                    return inner(p_local, s, x)

            jitted_cache[cache_key] = jax.jit(
                jax.shard_map(
                    fn,
                    mesh=mesh,
                    in_specs=(pspec, spec, spec),
                    out_specs=spec,
                    # same rationale as make_sharded_nmpc_fleet: blanket
                    # P(axis) over the aux pytree trips varying-axis
                    # validation on jax 0.9; divisibility checked above
                    check_vma=False,
                )
            )
        return jitted_cache[cache_key](params, states, x0s)

    return step


__all__ = [
    "make_mesh",
    "make_sharded_mppi_step",
    "make_sharded_fused_mppi_step",
    "make_batched_mppi_step",
    "make_sharded_nmpc_fleet",
    "make_sharded_mppi_fleet",
]
