"""Benchmark: MPPI solves/s/chip at K≈10k, T=50 (diff-drive) + p99 latency.

Prints ONE JSON line with the driver-defined primary metric (BASELINE.json).
``vs_baseline`` is the ratio of achieved control rate to the 50 Hz real-time
budget (the reference publishes no absolute numbers — BASELINE.md).

Uses the fused Pallas rollout kernel (ops/pallas/rollout.py) on TPU, falling
back to the XLA scan path elsewhere. Latency is measured with full blocking on
every output (controls, carried state, diagnostics).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from __graft_entry__ import _flagship
    from dnn_mppi_mpc_tpu.solvers.mppi import MPPISolver

    K, T = 10240, 50
    cfg, params, step_fn, stage, terminal = _flagship(K, T)

    on_tpu = jax.devices()[0].platform != "cpu"
    solver = MPPISolver(cfg, step_fn, stage, terminal, use_pallas=on_tpu)

    st = solver.init()
    x0 = jnp.zeros((3,), jnp.float32)

    # Warm-up / compile.
    u0, st, aux = solver.step(params, st, x0)
    jax.block_until_ready((u0, st, aux))

    # Throughput: chained (state-dependent) solves in batches, blocked per
    # batch — robust to per-dispatch host/tunnel jitter.
    batch, n_batches = 20, 8
    per_solve = []
    for _ in range(n_batches):
        stt = st
        t0 = time.perf_counter()
        for _ in range(batch):
            u0, stt, aux = solver.step(params, stt, x0)
        jax.block_until_ready(u0)
        per_solve.append((time.perf_counter() - t0) / batch)
    solves_per_s = 1.0 / min(per_solve)

    # Latency: fully blocked per call (what a robot control loop observes).
    n_iters = 100
    lat = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        u0, st, aux = solver.step(params, st, x0)
        jax.block_until_ready((u0, st, aux))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]

    budget_hz = 50.0
    result = {
        "metric": "mppi_solves_per_s_per_chip_K10240_T50_diffdrive",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / budget_hz, 3),
        "p50_ms": round(p50 * 1e3, 3),
        "p99_ms": round(p99 * 1e3, 3),
        "p99_meets_50hz_budget": bool(p99 < 1.0 / budget_hz),
        "pallas": on_tpu,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
