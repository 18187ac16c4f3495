"""Benchmark: MPPI solves/s/chip at K=10 240, T=50 (diff-drive).

Prints ONE JSON line with the driver-defined primary metric (BASELINE.json).
``vs_baseline`` is the ratio of achieved control rate to the 50 Hz real-time
budget (the reference publishes no absolute numbers — BASELINE.md).

Methodology (docs/PERF.md): chained state-dependent solves, synchronized by a
device-side reduction + scalar fetch (on remote-attached runtimes
``block_until_ready`` can return before execution completes, so fetch-based
syncs are the only trustworthy barrier). Throughput = N / wall over the best
of several chains; per-batch times also give a conservative p99.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _sync(*arrays) -> None:
    """Trustworthy barrier: device-side reduce + host fetch of one scalar."""
    total = sum(jnp.sum(a) for a in arrays)
    float(total)


def main() -> None:
    from __graft_entry__ import _flagship
    from dnn_mppi_mpc_tpu.solvers.mppi import MPPISolver

    K, T = 10240, 50
    cfg, params, step_fn, stage, terminal = _flagship(K, T)

    on_tpu = jax.devices()[0].platform != "cpu"
    solver = MPPISolver(cfg, step_fn, stage, terminal, use_pallas=on_tpu)

    st0 = solver.init()
    x0 = jnp.zeros((3,), jnp.float32)

    # Warm-up / compile with a true sync, plus one untimed throwaway batch so
    # stragglers from initialization don't land in the first timed batch.
    u0, st, aux = solver.step(params, st0, x0)
    _sync(u0, aux.costs)
    st = st0
    for _ in range(10):
        u0, st, aux = solver.step(params, st, x0)
    _sync(u0, aux.costs)

    batch, n_batches = 50, 6
    per_solve = []
    for _ in range(n_batches):
        st = st0
        t0 = time.perf_counter()
        for _ in range(batch):
            u0, st, aux = solver.step(params, st, x0)
        _sync(u0, st.u_prev, aux.costs)
        per_solve.append((time.perf_counter() - t0) / batch)

    per_solve.sort()
    best = per_solve[0]
    worst = per_solve[-1]
    solves_per_s = 1.0 / best

    budget_hz = 50.0
    result = {
        "metric": "mppi_solves_per_s_per_chip_K10240_T50_diffdrive",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / budget_hz, 3),
        "per_solve_ms_best": round(best * 1e3, 3),
        "per_solve_ms_worst_batch": round(worst * 1e3, 3),
        "meets_50hz_budget": bool(worst < 1.0 / budget_hz),
        "pallas": on_tpu,
        "device": str(jax.devices()[0]),
        "sync": "reduction+fetch per batch (see docs/PERF.md)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
