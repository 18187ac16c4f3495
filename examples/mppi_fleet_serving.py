"""Fleet MPPI serving: B controllers per chip on the lane-batched fleet tick.

The MPPI counterpart of examples/nmpc_fleet_serving.py — a whole fleet of
independent diff-drive MPPI controllers (per-member reference path, state,
and PRNG stream) ticks as ONE Pallas launch per control step
(solvers.make_fleet_fused_mppi_step → ops/pallas/mppi_tick_blocked.
fleet_mppi_tick). The reference's analog runs one controller process per
robot (train/bullet_mpc_differential_drive.py:119-157 collects series
sequentially); measured 28× over the vmapped-scan fleet at B=16, K=1024
(docs/PERF.md).

On CPU (no Mosaic PRNG) the example falls back to the vmapped scan engine —
same semantics, same closed loop — so the smoke tests exercise the full
pipeline.

    python examples/mppi_fleet_serving.py --fleet 16 --samples 1024 --bench
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from dnn_mppi_mpc_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()
import jax.numpy as jnp
import numpy as np

from dnn_mppi_mpc_tpu.config import MPPIConfig, MPPIParams
from dnn_mppi_mpc_tpu.models.dynamics import unicycle
from dnn_mppi_mpc_tpu.models.integrators import euler_step
from dnn_mppi_mpc_tpu.paths import line
from dnn_mppi_mpc_tpu.solvers.mppi import (
    MPPIState,
    make_fleet_fused_mppi_step,
    make_tracking_costs,
    mppi_step,
)
from dnn_mppi_mpc_tpu.utils.benchtime import slope_timing


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleet", type=int, default=16)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--bench", action="store_true")
    ap.add_argument(
        "--sharded",
        action="store_true",
        help="partition the fleet over a device mesh (make_sharded_mppi_fleet; "
        "zero collectives, fused fleet tick kept per shard on TPU) — on one "
        "chip this is the 1-shard A/B vs the unsharded launch",
    )
    args = ap.parse_args()

    B, dt = args.fleet, 0.05
    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = MPPIConfig(
        num_samples=args.samples, horizon=args.horizon,
        dim_x=3, dim_u=2, dt=dt, waypoint_search_len=20,
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
        ref_path=paths,  # (B, P, 3): per-member references
    )

    if args.sharded:
        from dnn_mppi_mpc_tpu.parallel import make_mesh, make_sharded_mppi_fleet

        mesh = make_mesh(("batch",))
        stage, terminal = make_tracking_costs(cfg)
        fleet = make_sharded_mppi_fleet(
            cfg, step_fn, stage, terminal, mesh, axis="batch", fused=on_tpu
        )
        mode = (
            f"mesh-sharded fleet over {mesh.shape['batch']} device(s) — "
            + ("fused fleet tick per shard" if on_tpu else "scan path per shard")
        )
    elif on_tpu:
        fleet = make_fleet_fused_mppi_step(cfg, step_fn)
        mode = "fused fleet tick (one Pallas launch per control step)"
    else:
        stage, terminal = make_tracking_costs(cfg)
        inner = functools.partial(mppi_step, cfg, step_fn, stage, terminal)

        @jax.jit
        def fleet(p, states, xs):
            import dataclasses

            def member(path, st, x):
                pm = dataclasses.replace(p, ref_path=path)
                return inner(pm, st, x, None)

            return jax.vmap(member)(p.ref_path, states, xs)

        mode = "vmapped scan fallback (CPU: Mosaic PRNG unavailable)"

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    states = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)
    xs = jnp.zeros((B, 3), jnp.float32)

    for _ in range(args.ticks):
        u0s, states, auxs = fleet(params, states, xs)
        xs = jax.vmap(step_fn)(xs, u0s)
    d = np.array(
        [
            np.linalg.norm(
                np.asarray(paths[b][:, :2]) - np.asarray(xs[b, :2]), axis=1
            ).min()
            for b in range(B)
        ]
    )
    print(
        f"fleet={B} [{mode}]: max distance-to-path after {args.ticks} ticks "
        f"= {d.max():.3f} m (median {np.median(d):.3f})"
    )

    if args.bench:
        st0 = jax.vmap(lambda k: MPPIState.init(cfg, k))(keys)

        def mk(n):
            @jax.jit
            def chain(st, x):
                def body(carry, _):
                    st, x = carry
                    u0s, st, auxs = fleet(params, st, x)
                    x = jax.vmap(step_fn)(x, u0s)
                    return (st, x), auxs.costs[:, 0]

                (st, x), ys = jax.lax.scan(body, (st, x), None, length=n)
                return x, ys

            def run():
                out = chain(st0, jnp.zeros((B, 3), jnp.float32))
                float(sum(jnp.sum(a) for a in jax.tree.leaves(out)))

            return run

        n1, n2 = (50, 250) if on_tpu else (2, 6)
        t = slope_timing(mk, n1, n2, reps=10 if on_tpu else 3)
        print(
            json.dumps(
                {
                    "metric": f"mppi_fleet_tick_B{B}_K{args.samples}"
                    + ("_fused" if on_tpu else "_cpu_scan")
                    + ("_sharded" if args.sharded else ""),
                    "fleet_ticks_per_s": round(1.0 / t.tau, 2),
                    "member_solves_per_s": round(B / t.tau, 1),
                    "per_tick_ms_p50": round(t.p50 * 1e3, 4),
                    "device": str(jax.devices()[0]),
                }
            )
        )


if __name__ == "__main__":
    main()
