"""One-command reproduction of every docs/PERF.md headline row.

``python bench.py --suite`` measures each headline workload in a single
process/session and checks the raw rows in as a JSON artifact
(docs/assets/bench_suite_r5.json), so cross-row comparisons are not
session-to-session tunnel artifacts and every number the docs claim is
reproducible from the repo (the round-2 advisor finding about unreproducible
fleet-serving claims, generalized to the whole table).

Each row uses the same methodology as the flagship metric: the full control
tick chained on-device (``lax.scan`` over the solver step + plant step) at
two chain lengths, per-solve = slope (docs/PERF.md "Measuring through the
remote-attach tunnel"; estimator in :mod:`.benchtime`).

On CPU the rows shrink to smoke shapes and are labeled ``cpu_smoke`` — the
code paths are identical, the numbers are not measurements. The artifact is
only (over)written on TPU.

Workload ↔ PERF.md row map:

===============  ======================================================
``flagship``     diff-drive MPPI K=10 240 T=50, fused tick + epilogue
``pod_k``        K=102 400 K-blocked fused tick (BASELINE "100k+ rollouts")
``racecar``      bicycle MPPI K=10 240 T=20 W=200 + polygon collision
``goal_seeking`` pytorch_mppi spec: soft cost, moving obstacles, SavGol
``mppi_fleet``   B=16 lane-batched fused fleet tick (K=1 024 T=50 each)
``dnn_mppi``     MLP-residual MPPI K=1 024 T=25 (XLA scan / MXU path)
``nmpc_rti``     diff-drive NMPC RTI N=30, 2 obstacle rows, pallas QP
``nmpc_fleet``   B=128 N=30 fleet on the lane-batched barrier-Riccati QP
``sharded_tick``      two-phase on-chip-ε sample-sharded tick (1-shard A/B)
``sharded_mppi_fleet`` mesh-sharded fleet, fused fleet tick per shard
===============  ======================================================
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .benchtime import scan_chain_runner, slope_timing

ROWS = (
    "flagship",
    "pod_k",
    "racecar",
    "goal_seeking",
    "mppi_fleet",
    "dnn_mppi",
    "nmpc_rti",
    "nmpc_fleet",
    "sharded_tick",
    "sharded_mppi_fleet",
)


def _sync(*arrays) -> None:
    """Trustworthy barrier: device-side reduce + host fetch of one scalar.

    The fetch is REQUIRED: in the tunnel's initial async mode
    ``block_until_ready`` is only a dispatch ack, so a block-only barrier
    yields meaningless slopes; the first fetch switches the process to sync
    mode (true completion waits) and the slope cancels the constant RTT —
    docs/PERF.md "tunnel modes".
    """
    total = sum(jnp.sum(a) for a in arrays)
    float(total)


@dataclasses.dataclass
class Workload:
    name: str
    make_runner: Callable[[int], Callable[[], None]]
    n1: int
    n2: int
    solves_per_tick: int  # fleet rows: members per tick; else 1
    meta: Dict


def _mppi_workload(
    name: str,
    solver,
    params,
    x0: jnp.ndarray,
    n1: int,
    n2: int,
    meta: Dict,
) -> Workload:
    """Single-controller MPPI chain: solver step + plant step per tick."""
    st0 = solver.init()
    core, step_fn = solver._step, solver.dynamics_step

    def body(params, state, x):
        u0, state, aux = core(params, state, x, None)
        return (state, step_fn(x, u0)), aux.costs[0]

    def make_runner(n):
        return scan_chain_runner(body, params, st0, x0, n, _sync)

    return Workload(name, make_runner, n1, n2, 1, meta)


def _build_flagship(on_tpu: bool) -> Workload:
    from __graft_entry__ import _flagship

    from ..solvers.mppi import MPPISolver

    K, T = (10_240, 50) if on_tpu else (512, 25)
    cfg, params, step_fn, stage, terminal = _flagship(K, T)
    solver = MPPISolver(
        cfg, step_fn, stage, terminal, use_pallas=False, fused_tick=on_tpu,
        iso_xy=True,
    )
    n1, n2 = (200, 1000) if on_tpu else (4, 12)
    return _mppi_workload(
        "flagship", solver, params, jnp.zeros(3, jnp.float32), n1, n2,
        {"K": K, "T": T, "kernel": "fused_tick" if on_tpu else "xla_scan"},
    )


def _build_pod_k(on_tpu: bool) -> Workload:
    from __graft_entry__ import _flagship

    from ..solvers.mppi import MPPISolver

    K, T = (102_400, 50) if on_tpu else (1024, 25)
    cfg, params, step_fn, stage, terminal = _flagship(K, T)
    solver = MPPISolver(
        cfg, step_fn, stage, terminal, use_pallas=False, fused_tick=on_tpu,
        iso_xy=True,
    )
    n1, n2 = (25, 125) if on_tpu else (4, 12)
    return _mppi_workload(
        "pod_k", solver, params, jnp.zeros(3, jnp.float32), n1, n2,
        {"K": K, "T": T, "kernel": "k_blocked" if on_tpu else "xla_scan"},
    )


def _build_racecar(on_tpu: bool) -> Workload:
    from .. import presets
    from ..paths.generators import lemniscate_with_speed

    K = 10_240 if on_tpu else 256
    ref = lemniscate_with_speed(10.0, 200, speed=5.0)
    solver, params = presets.racecar_mppi(
        ref,
        num_samples=K,
        horizon=20,
        obstacles=jnp.array([[5.0, 5.0, 1.0], [7.0, 7.0, 1.0]]),
        fused_tick=on_tpu,
    )
    # device-side cast: np.asarray(ref[0]) here was a device→host fetch,
    # poisoning every later sync in the suite process (docs/PERF.md)
    x0 = ref[0].astype(jnp.float32)
    n1, n2 = (50, 250) if on_tpu else (2, 6)
    return _mppi_workload(
        "racecar", solver, params, x0, n1, n2,
        {"K": K, "T": 20, "W": 200, "n_obs": 2,
         "kernel": "fused_bicycle_tick" if on_tpu else "xla_scan"},
    )


def _build_goal_seeking(on_tpu: bool) -> Workload:
    from .. import presets

    K = 1536 if on_tpu else 256
    solver, params = presets.goal_seeking_mppi(
        jnp.array([6.0, 6.0, 1.57]),
        num_samples=K,
        obstacles=jnp.array(
            [[5.0, 4.0, 0.5], [3.5, 3.5, 0.5], [2.0, 5.0, 0.5]]
        ),
        obstacle_velocities=0.09
        * jnp.array([[0.2, 0.1], [-0.1, 0.1], [0.1, -0.2]]),
        fused_tick=on_tpu,
    )
    n1, n2 = (200, 1000) if on_tpu else (2, 6)
    return _mppi_workload(
        "goal_seeking", solver, params, jnp.zeros(3, jnp.float32), n1, n2,
        {"K": K, "T": solver.cfg.horizon, "n_obs": 3, "collision": "soft",
         "kernel": "fused_tick" if on_tpu else "xla_scan"},
    )


def _build_dnn_mppi(on_tpu: bool) -> Workload:
    from .. import presets
    from ..models.learned import MLP, make_residual_fn
    from ..paths.generators import line

    K = 1024 if on_tpu else 256
    # 5→128→128→3 (examples/dnn_mppi.py default; PERF DNN-MPPI row)
    model = MLP(out_dim=3, hidden=128, depth=1)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5), jnp.float32))
    learned = make_residual_fn(model, mp)
    ref = line(jnp.zeros(2), jnp.array([4.0, 4.0]), num_points=100)
    solver, params = presets.dnn_mppi(ref, learned, num_samples=K, horizon=25)
    n1, n2 = (50, 250) if on_tpu else (2, 6)
    return _mppi_workload(
        "dnn_mppi", solver, params, jnp.zeros(3, jnp.float32), n1, n2,
        {"K": K, "T": 25, "net": "mlp_5_128_128_3", "kernel": "xla_scan"},
    )


def _build_mppi_fleet(on_tpu: bool) -> Workload:
    import functools

    from ..config import MPPIConfig, MPPIParams
    from ..models.dynamics import unicycle
    from ..models.integrators import euler_step
    from ..paths.generators import line
    from ..solvers.mppi import (
        MPPIState,
        make_fleet_fused_mppi_step,
        make_tracking_costs,
        mppi_step,
    )

    B, K, T = (16, 1024, 50) if on_tpu else (4, 128, 10)
    dt = 0.05
    cfg = MPPIConfig(
        num_samples=K, horizon=T, dim_x=3, dim_u=2, dt=dt,
        waypoint_search_len=20,
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, dt)
    rng = np.random.default_rng(0)
    goals = rng.uniform(-4, 4, (B, 2)).astype(np.float32)
    paths = jnp.stack(
        [line(jnp.zeros(2), jnp.asarray(g), num_points=80) for g in goals]
    )
    params = MPPIParams(
        sigma=jnp.array([[0.2, 0.0], [0.0, 0.1]], jnp.float32),
        stage_weight=jnp.array([8.0, 8.0, 2.0], jnp.float32),
        terminal_weight=jnp.array([8.0, 8.0, 2.0], jnp.float32),
        u_min=jnp.array([-3.0, -3.14], jnp.float32),
        u_max=jnp.array([3.0, 3.14], jnp.float32),
        ref_path=paths,  # (B, P, 3) per-member references
    )
    if on_tpu:
        fleet = make_fleet_fused_mppi_step(cfg, step_fn)
    else:
        stage, terminal = make_tracking_costs(cfg)
        inner = functools.partial(mppi_step, cfg, step_fn, stage, terminal)

        def fleet(p, states, xs):
            def member(path, st, x):
                pm = dataclasses.replace(p, ref_path=path)
                return inner(pm, st, x, None)

            return jax.vmap(member)(p.ref_path, states, xs)

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    st0 = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    x0 = jnp.zeros((B, 3), jnp.float32)

    def body(params, st, x):
        u0s, st, auxs = fleet(params, st, x)
        return (st, jax.vmap(step_fn)(x, u0s)), auxs.costs[:, 0]

    def make_runner(n):
        return scan_chain_runner(body, params, st0, x0, n, _sync)

    n1, n2 = (50, 250) if on_tpu else (2, 6)
    return Workload(
        "mppi_fleet", make_runner, n1, n2, B,
        {"B": B, "K": K, "T": T,
         "kernel": "fleet_fused_tick" if on_tpu else "vmapped_scan"},
    )


def _nmpc_chain_workload(
    name: str, solver, params, st0, x0, n1: int, n2: int,
    solves_per_tick: int, meta: Dict, fleet: bool,
) -> Workload:
    core = jax.vmap(solver._core) if fleet else solver._core
    plant = jax.vmap(solver.dyn_step) if fleet else solver.dyn_step

    def body(params, st, x):
        u0, st, _ = core(params, st, x)
        return (st, plant(x, u0)), (u0[0, 0] if fleet else u0[0])

    def make_runner(n):
        return scan_chain_runner(body, params, st0, x0, n, _sync)

    return Workload(name, make_runner, n1, n2, solves_per_tick, meta)


def _build_nmpc_rti(on_tpu: bool) -> Workload:
    from .. import presets

    backend = "pallas" if on_tpu else "xla"
    obstacles = jnp.array([[1.5, 1.0, 0.3], [2.5, 1.8, 0.3]])
    solver, params = presets.diff_drive_nmpc(
        jnp.array([3.0, 2.0, 0.0]), N=30, obstacles=obstacles,
        sqp_iters=1, qp_backend=backend,
    )
    x0 = jnp.zeros(3, jnp.float32)
    n1, n2 = (30, 150) if on_tpu else (2, 6)
    return _nmpc_chain_workload(
        "nmpc_rti", solver, params, solver.init(x0), x0, n1, n2, 1,
        {"N": 30, "n_obs": 2, "sqp_iters": 1, "qp_backend": backend},
        fleet=False,
    )


def _build_nmpc_fleet(on_tpu: bool) -> Workload:
    from .. import presets
    from ..models.dynamics import unicycle
    from ..solvers.sqp import NMPCSolver, NMPCState, circle_obstacle_h

    B, N = (128, 30) if on_tpu else (8, 10)
    backend = "pallas" if on_tpu else "xla"
    # preset defaults (sqp_iters=2) — exactly examples/nmpc_fleet_serving.py's
    # build_fleet, so the row reproduces bench_fleet_serving_r3.json
    base_solver, base_params = presets.diff_drive_nmpc(
        jnp.zeros(3, jnp.float32), N=N,
        obstacles=jnp.array([[1.0, 0.0, 0.3]], jnp.float32),
        qp_backend=backend,
    )
    solver = NMPCSolver(base_solver.cfg, unicycle, h_fn=circle_obstacle_h)

    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, B)
    goals = np.stack([3.0 * np.cos(ang), 3.0 * np.sin(ang), ang], axis=1)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)), jnp.float32)
    obs = np.concatenate(
        [0.55 * goals[:, :2], np.full((B, 1), 0.25)], axis=1
    )[:, None, :]

    def member_params(goal, ob):
        yref = jnp.concatenate([goal, jnp.zeros(2, jnp.float32)])
        return dataclasses.replace(
            base_params,
            yref=jnp.broadcast_to(yref, (N, 5)),
            yref_e=goal,
            p=ob,
        )

    params = jax.vmap(member_params)(
        jnp.asarray(goals, jnp.float32), jnp.asarray(obs, jnp.float32)
    )
    st0 = jax.vmap(lambda x: NMPCState.init(solver.cfg, x))(x0s)
    n1, n2 = (10, 50) if on_tpu else (2, 6)
    return _nmpc_chain_workload(
        "nmpc_fleet", solver, params, st0, x0s, n1, n2, B,
        {"B": B, "N": N, "qp_backend": backend,
         "kernel": "lane_batched_qp" if on_tpu else "vmapped_xla_riccati"},
        fleet=True,
    )


def _build_sharded_tick(on_tpu: bool) -> Workload:
    """Sample-sharded flagship tick over the full device mesh.

    On the single attached chip this is the 1-shard A/B of PERF.md's
    "two-phase on-chip ε" row (the shard_map wrapper + collectives at mesh
    size 1); on the CPU test mesh it exercises the HBM-ε scan path
    (make_sharded_mppi_step — the Mosaic PRNG has no CPU lowering).
    """
    from __graft_entry__ import _flagship

    from jax.sharding import NamedSharding, PartitionSpec

    from ..parallel.sharding import (
        make_mesh,
        make_sharded_fused_mppi_step,
        make_sharded_mppi_step,
    )
    from ..solvers.mppi import MPPIState

    n_dev = len(jax.devices())
    K, T = (10_240 * n_dev, 50) if on_tpu else (1024 * n_dev, 25)
    cfg, params, step_fn, stage, terminal = _flagship(K, T)
    mesh = make_mesh(("k",))
    if on_tpu:
        step = make_sharded_fused_mppi_step(cfg, step_fn, mesh, iso_xy=True)
    else:
        step = make_sharded_mppi_step(cfg, step_fn, stage, terminal, mesh)

    rep = NamedSharding(mesh, PartitionSpec())
    st0 = jax.device_put(MPPIState.init(cfg), rep)
    x0 = jax.device_put(jnp.zeros(3, jnp.float32), rep)
    params = jax.device_put(params, rep)

    def body(params, state, x):
        u0, state, aux = step(params, state, x)
        # state-dependent chaining so ticks cannot be overlapped
        return (state, x.at[0].add(u0[0] * 1e-6)), aux.costs.min()

    def make_runner(n):
        return scan_chain_runner(body, params, st0, x0, n, _sync)

    n1, n2 = (200, 1000) if on_tpu else (2, 6)
    return Workload(
        "sharded_tick", make_runner, n1, n2, 1,
        {"K": K, "T": T, "devices": n_dev,
         "kernel": "two_phase_onchip_eps" if on_tpu else "sharded_scan"},
    )


def _build_sharded_mppi_fleet(on_tpu: bool) -> Workload:
    """Mesh-sharded MPPI fleet (fleet axis partitioned, zero collectives)."""
    from ..config import MPPIConfig, MPPIParams
    from ..models.dynamics import unicycle
    from ..models.integrators import euler_step
    from ..parallel.sharding import make_mesh, make_sharded_mppi_fleet
    from ..paths.generators import line
    from ..solvers.mppi import MPPIState, make_tracking_costs

    n_dev = len(jax.devices())
    if on_tpu:
        B, K, T = 16 * n_dev, 1024, 50
    else:
        B, K, T = n_dev, 128, 10
    dt = 0.05
    cfg = MPPIConfig(
        num_samples=K, horizon=T, dim_x=3, dim_u=2, dt=dt,
        waypoint_search_len=20,
    )
    step_fn = lambda x, u: euler_step(unicycle, x, u, dt)
    rng = np.random.default_rng(0)
    goals = rng.uniform(-4, 4, (B, 2)).astype(np.float32)
    paths = jnp.stack(
        [line(jnp.zeros(2), jnp.asarray(g), num_points=80) for g in goals]
    )
    params = MPPIParams(
        sigma=jnp.array([[0.2, 0.0], [0.0, 0.1]], jnp.float32),
        stage_weight=jnp.array([8.0, 8.0, 2.0], jnp.float32),
        terminal_weight=jnp.array([8.0, 8.0, 2.0], jnp.float32),
        u_min=jnp.array([-3.0, -3.14], jnp.float32),
        u_max=jnp.array([3.0, 3.14], jnp.float32),
        ref_path=paths,
    )
    mesh = make_mesh(("batch",))
    stage, terminal = make_tracking_costs(cfg)
    fleet = make_sharded_mppi_fleet(
        cfg, step_fn, stage, terminal, mesh, axis="batch", fused=on_tpu
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    st0 = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    x0 = jnp.zeros((B, 3), jnp.float32)

    def body(params, st, x):
        u0s, st, auxs = fleet(params, st, x)
        return (st, jax.vmap(step_fn)(x, u0s)), auxs.costs[:, 0]

    def make_runner(n):
        return scan_chain_runner(body, params, st0, x0, n, _sync)

    n1, n2 = (50, 250) if on_tpu else (2, 6)
    return Workload(
        "sharded_mppi_fleet", make_runner, n1, n2, B,
        {"B": B, "K": K, "T": T, "devices": n_dev,
         "kernel": "sharded_fleet_fused_tick" if on_tpu
         else "sharded_fleet_scan"},
    )


_BUILDERS = {
    "flagship": _build_flagship,
    "pod_k": _build_pod_k,
    "racecar": _build_racecar,
    "goal_seeking": _build_goal_seeking,
    "mppi_fleet": _build_mppi_fleet,
    "dnn_mppi": _build_dnn_mppi,
    "nmpc_rti": _build_nmpc_rti,
    "nmpc_fleet": _build_nmpc_fleet,
    "sharded_tick": _build_sharded_tick,
    "sharded_mppi_fleet": _build_sharded_mppi_fleet,
}


def run_suite(
    rows: Optional[Tuple[str, ...]] = None,
    reps: Optional[int] = None,
    artifact: Optional[str] = None,
) -> list:
    """Measure the selected rows; print one JSON line each; return the rows.

    On TPU the full-row run also writes ``artifact`` (default
    docs/assets/bench_suite_r5.json). CPU runs never touch the artifact.
    """
    on_tpu = jax.devices()[0].platform != "cpu"
    if reps is None:
        reps = 10 if on_tpu else 3
    names = ROWS if rows is None else tuple(rows)
    unknown = [n for n in names if n not in _BUILDERS]
    if unknown:
        raise ValueError(f"unknown suite rows {unknown}; available: {list(ROWS)}")

    results = []
    for name in names:
        w = _BUILDERS[name](on_tpu)
        t = slope_timing(w.make_runner, w.n1, w.n2, reps=reps)
        # benchtime floors a jitter-inverted slope at 1e-9 s; a floored tau
        # would read as a billions-of-solves rate — fall back to p50 and say so
        floored = t.tau <= 2e-9
        per_tick = t.p50 if floored else t.tau
        row = {
            "workload": name,
            "per_tick_ms_best": round(t.tau * 1e3, 4),
            "per_tick_ms_p50": round(t.p50 * 1e3, 4),
            "per_tick_ms_p99": round(t.p99 * 1e3, 4),
            "solves_per_s": round(w.solves_per_tick / max(per_tick, 1e-9), 1),
            "chain_lengths": [w.n1, w.n2],
            **w.meta,
        }
        if floored:
            row["slope_floored"] = True
        if not on_tpu:
            row["cpu_smoke"] = True  # smoke shapes — not a measurement
        results.append(row)
        print(json.dumps(row), flush=True)

    if on_tpu and rows is None:
        if artifact is None:
            artifact = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "docs", "assets", "bench_suite_r5.json",
            )
        out = {
            "device": str(jax.devices()[0]),
            "rows": results,
            "sync": "two-length on-device chains, slope estimator "
                    "(docs/PERF.md)",
        }
        with open(artifact, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"# wrote {artifact}")
    return results
