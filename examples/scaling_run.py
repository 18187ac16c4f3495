"""One-command scaling harness: solves/s at 1 device → all local devices → hosts.

Measures the sample-sharded MPPI (parallel/sharding.py) at increasing mesh
sizes and emits one efficiency JSON line per scale plus a summary — the
push-button measurement for the BASELINE scaling gate (≥80 % efficiency
1 chip → 1 host → N hosts) once a pod slice exists.

Weak-scaling protocol (the north-star metric is solves/s/chip at fixed
K/device): each scale runs K = k_per_device × n_devices so per-chip work is
constant; efficiency(n) = throughput(n) / (n × throughput(1)). The only
cross-device traffic per tick is the three softmax/weighted-noise reductions
(SURVEY §2.10), so efficiency should track ICI latency, not bandwidth.

Timing uses chained on-device ticks with the slope estimator from
``bench.py`` (two chain lengths; fixed dispatch/fetch costs cancel — see
docs/PERF.md "Measuring through the remote-attach tunnel").

Local (virtual CPU mesh, CI path):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/scaling_run.py --k-per-device 256 --horizon 20

Real hardware, single host: ``python examples/scaling_run.py``.

Multi-host pod slice (run the same command on every worker; jax.distributed
auto-configures on Cloud TPU):

    python examples/scaling_run.py --coordinator <host0>:8476 \
        --num-processes <P> --process-id <i>

Process 0 prints the results; scales are powers of two up to the global
device count, so a v5e-64 run reports 1, 2, 4, … 64 chips in one invocation.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from __graft_entry__ import _flagship
from dnn_mppi_mpc_tpu.parallel.distributed import initialize_distributed
from dnn_mppi_mpc_tpu.parallel.sharding import (
    make_sharded_fused_mppi_step,
    make_sharded_mppi_step,
)
from dnn_mppi_mpc_tpu.solvers.mppi import MPPIState
from dnn_mppi_mpc_tpu.utils.benchtime import slope_timing
from dnn_mppi_mpc_tpu.utils.platform import honor_jax_platforms_env

# The image's sitecustomize pins the TPU plugin after import — flip the
# config so the virtual --xla_force_host_platform_device_count mesh works.
honor_jax_platforms_env()


def measure(step, params, state0, x0, n1, n2, reps):
    """Slope-estimated per-tick seconds for a jitted sharded step."""

    def make_runner(n):
        def body(carry, _):
            state, x = carry
            u0, state, aux = step(params, state, x)
            # state-dependent chaining so ticks cannot be overlapped
            x = x.at[0].add(u0[0] * 1e-6)
            return (state, x), aux.costs.min()

        @jax.jit
        def chain(state, x):
            (_, _), ys = jax.lax.scan(body, (state, x), None, length=n)
            return ys

        def run():
            float(jnp.sum(chain(state0, x0)))  # device reduce + host fetch

        return run

    return slope_timing(make_runner, n1, n2, reps).tau


def measure_collectives(mesh, local_K, horizon, n1, n2, reps):
    """Per-tick cost of JUST the sharded tick's cross-device exchanges.

    The two-phase tick's only cross-chip traffic is ρ = pmin(min S),
    η = psum(Σ exp) and one psum of a (T, nu) partial (SURVEY §2.10); this
    times that exact pattern on synthetic per-shard data so the scaling
    artifact separates collective latency from rollout compute — the number
    a real-pod run diffs against the virtual-mesh rehearsal.
    """
    axis = "k"
    spec_s = PartitionSpec(axis)

    def tick(S_local, carry):
        rho = jax.lax.pmin(jnp.min(S_local), axis)
        eta = jax.lax.psum(jnp.sum(jnp.exp(rho - S_local)), axis)
        weps = jax.lax.psum(
            jnp.full((horizon, 2), eta / local_K, S_local.dtype), axis
        )
        return S_local + carry * 1e-9 + weps[0, 0] * 1e-9

    inner = jax.shard_map(
        lambda S, c: tick(S, c), mesh=mesh,
        in_specs=(spec_s, PartitionSpec()), out_specs=spec_s,
    )

    n_dev = mesh.devices.size
    S0 = jax.device_put(
        jnp.linspace(0.0, 1.0, local_K * n_dev, dtype=jnp.float32),
        NamedSharding(mesh, spec_s),
    )

    def make_runner(n):
        def body(S, _):
            S = inner(S, S[0])
            return S, S[0]

        @jax.jit
        def chain(S):
            _, ys = jax.lax.scan(body, S, None, length=n)
            return jnp.sum(ys)

        def run():
            float(chain(S0))

        return run

    return slope_timing(make_runner, n1, n2, reps).tau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k-per-device", type=int, default=1280)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--chain", type=int, nargs=2, default=None,
                    metavar=("N1", "N2"), help="chain lengths for the slope")
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument(
        "--fused-tick", action="store_true",
        help="use the two-phase on-chip-eps sharded tick "
        "(make_sharded_fused_mppi_step) — TPU-only (Mosaic PRNG); the "
        "default HBM-eps path runs everywhere incl. the virtual CPU mesh",
    )
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--out", type=str, default=None,
                    help="also write the summary JSON to this path "
                    "(process 0 only) — the checked-in scaling artifact")
    args = ap.parse_args()

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    devices = jax.devices()
    on_tpu = devices[0].platform != "cpu"
    n1, n2 = args.chain or ((20, 100) if on_tpu else (3, 9))
    reps = args.reps or (10 if on_tpu else 3)

    # powers of two up to the global device count: 1, 2, 4, ...
    scales = []
    n = 1
    while n <= len(devices):
        scales.append(n)
        n *= 2
    if scales[-1] != len(devices):
        scales.append(len(devices))

    # Multi-process: every process must own a slice of each mesh (a mesh of
    # only process-0 devices leaves the other controllers without addressable
    # shards), so sweep only multiples of process_count and take n/P devices
    # from every process.
    n_proc = jax.process_count()
    if n_proc > 1:
        scales = [s for s in scales if s % n_proc == 0]
        by_proc: dict = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)

        def pick(n_dev):
            per = n_dev // n_proc
            sel = []
            for p in sorted(by_proc):
                sel.extend(by_proc[p][:per])
            return sel
    else:
        pick = lambda n_dev: devices[:n_dev]

    results = []
    taus = []
    for n_dev in scales:
        K = args.k_per_device * n_dev
        cfg, params, step_fn, stage, terminal = _flagship(K, args.horizon)
        mesh = Mesh(np.asarray(pick(n_dev)), ("k",))
        if args.fused_tick:
            # two-phase on-chip-ε tick (round-3): per-shard blocked kernel +
            # ρ/η collectives + same-stream weighted reduce — 28× the HBM-ε
            # path on one shard (docs/PERF.md); requires K/device a multiple
            # of 1024 (kernel lane layout)
            step = make_sharded_fused_mppi_step(cfg, step_fn, mesh)
        else:
            step = make_sharded_mppi_step(cfg, step_fn, stage, terminal, mesh)
        # Commit the replicated inputs to the mesh: uncommitted arrays make
        # jit resolve a *default* device via get_backend(), which on images
        # with an accelerator plugin dials the accelerator even under
        # JAX_PLATFORMS=cpu (observed hang in the 2-process run); committed
        # inputs fix the device assignment up front.
        rep = NamedSharding(mesh, PartitionSpec())
        state0 = jax.device_put(MPPIState.init(cfg), rep)
        x0 = jax.device_put(jnp.zeros(3, jnp.float32), rep)
        params = jax.device_put(params, rep)
        tau = measure(step, params, state0, x0, n1, n2, reps)
        tau_coll = measure_collectives(
            mesh, args.k_per_device, args.horizon, n1, n2, reps
        )
        taus.append(tau)
        results.append({"devices": n_dev, "K": K, "per_solve_ms": round(tau * 1e3, 4),
                        "solves_per_s": round(1 / tau, 1),
                        "collective_per_tick_ms": round(tau_coll * 1e3, 4)})
        if jax.process_index() == 0:
            print(json.dumps(results[-1]), flush=True)

    if jax.process_index() == 0:
        base = taus[0]  # unrounded: per_solve_ms rounds tiny taus to 0.0
        summary = {
            "metric": "mppi_weak_scaling_efficiency"
            + ("_fused" if args.fused_tick else ""),
            "k_per_device": args.k_per_device,
            "horizon": args.horizon,
            "device": str(devices[0]),
            "n_hosts": jax.process_count(),
            "scales": results,
            # weak scaling: constant work/device → efficiency = t(1)/t(n)
            "efficiency": {str(r["devices"]): round(base / t, 3)
                           for r, t in zip(results, taus)},
        }
        print(json.dumps(summary))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
