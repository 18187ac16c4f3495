"""Benchmark: MPPI solves/s/chip at K=10 000, T=50 (diff-drive) + p99 latency.

Prints ONE JSON line with the driver-defined primary metric (BASELINE.json).
``vs_baseline`` is the ratio of achieved control rate to the 50 Hz real-time
budget (the reference publishes no absolute numbers — BASELINE.md).

Run on the real chip: ``python bench.py`` (honors JAX_PLATFORMS from the env).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import entry


def main() -> None:
    fn, (params, state, x0) = entry()
    step = jax.jit(fn)

    # Warm-up / compile.
    u0, st, aux = step(params, state, x0)
    jax.block_until_ready(u0)

    # Closed-loop timing: feed the state back like a real control loop.
    n_iters = 50
    lat = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        u0, st, aux = step(params, st, x0)
        u0.block_until_ready()
        lat.append(time.perf_counter() - t0)

    lat_sorted = sorted(lat)
    p50 = lat_sorted[len(lat) // 2]
    p99 = lat_sorted[min(len(lat) - 1, int(len(lat) * 0.99))]
    solves_per_s = 1.0 / p50

    budget_hz = 50.0
    result = {
        "metric": "mppi_solves_per_s_per_chip_K10000_T50_diffdrive",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / budget_hz, 3),
        "p50_ms": round(p50 * 1e3, 3),
        "p99_ms": round(p99 * 1e3, 3),
        "p99_meets_50hz_budget": bool(p99 < 1.0 / budget_hz),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
