"""One-process end-to-end realtime pipeline measurement.

The BASELINE latency metric measured for real: a single process drives

    native RatePacer (absolute deadlines, runtime/src/dmmrt.cpp)
      → flagship MPPI tick (fused Pallas on TPU, XLA scan on CPU)
      → JAX plant step (the AcadosSim/PyBullet role)

for N ticks at a fixed rate, recording TRUE per-tick end-to-end solve
latency and per-deadline lateness — not chain slopes (docs/PERF.md's slope
estimator deliberately averages away per-tick tails; this module does the
opposite). Replaces the reference's deployment loop
simulation/bullet_differential_drive_dnn.py:419-467 (read state → solve →
actuate → sleep).

Remote-attach note: state and control stay ON DEVICE
(RealtimeLoop(convert_arrays=False) — the loop never needs a host copy);
the controller wrapper blocks until its result is ready so ``solve_ns`` is
genuine dispatch+compute+ready latency. Rounds 1–3 believed per-call syncs
cost a flat ~25–30 ms through the tunnel; that was the closure-constant
sync cliff (docs/PERF.md) — with every device array passed as a jit
argument, a fully synced flagship solve measures ~0.15 ms.

Outputs one JSON-able dict (see ``run_realtime_e2e``), persisted by
``python -m dnn_mppi_mpc_tpu realtime`` and checked in under docs/assets/.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def run_realtime_e2e(
    hz: float = 50.0,
    ticks: int = 10_000,
    K: int = 10_240,
    T: int = 50,
    seed: int = 0,
) -> dict:
    """Drive pacer + controller + plant in this process; return miss stats.

    A deadline miss is a tick whose pacer wake-up was late by more than 10%
    of the period (the pacer sleeps on absolute deadlines, so lateness > 0
    means the previous tick's work overran its slot; the 10% guard separates
    genuine overruns from scheduler wake-up jitter). ``misses_per_10k`` is
    that count normalized to 10 000 ticks — the regression-bound metric.
    """
    from ..utils.platform import enable_compilation_cache, honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu smoke must not dial the TPU
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ..solvers.mppi import MPPISolver
    from .loop import RealtimeLoop

    on_tpu = jax.devices()[0].platform != "cpu"

    import importlib.util
    import os
    import sys

    # flagship config lives next to the repo root (driver contract)
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, root)
    try:
        from __graft_entry__ import _flagship
    finally:
        sys.path.pop(0)

    cfg, params, step_fn, stage, terminal = _flagship(K, T)
    solver = MPPISolver(
        cfg, step_fn, stage, terminal, use_pallas=False, fused_tick=on_tpu,
        iso_xy=True,
    )

    plant_step = jax.jit(step_fn)

    state_holder = [solver.init()]
    x_holder = [jnp.zeros((3,), jnp.float32)]

    def read_state():
        return x_holder[0]

    def controller(x):
        u0, st, _ = solver.step(params, state_holder[0], x)
        state_holder[0] = st
        u0.block_until_ready()  # solve_ns = dispatch + compute + ready
        return u0

    def apply_control(u):
        # async enqueue; its readiness folds into the next tick's block
        x_holder[0] = plant_step(x_holder[0], u)

    cap = 1 << max(14, int(np.ceil(np.log2(max(ticks, 2)))))
    loop = RealtimeLoop(
        controller, read_state, apply_control, hz=hz,
        telemetry_capacity=cap, convert_arrays=False,
        warmup_apply=True,  # plant is a simulator — compile it pre-pacing
    )
    try:
        pacer_stats = loop.run(ticks)
        rec = loop.drain_telemetry()
    finally:
        loop.close()

    period_ns = 1e9 / hz
    solve_ms = rec["solve_ns"] / 1e6
    late_ns = rec["late_ns"]
    misses = int(np.sum(late_ns > 0.1 * period_ns))
    return {
        "metric": "realtime_e2e",
        "hz": hz,
        "ticks": int(rec.shape[0]),
        "K": K,
        "T": T,
        "device": str(jax.devices()[0]),
        "solver_path": "pallas_fused_tick" if on_tpu else "xla_scan",
        "e2e_p50_ms": round(float(np.percentile(solve_ms, 50)), 4),
        "e2e_p99_ms": round(float(np.percentile(solve_ms, 99)), 4),
        "e2e_max_ms": round(float(solve_ms.max()), 4),
        "late_p50_ms": round(float(np.percentile(late_ns, 50)) / 1e6, 4),
        "late_p99_ms": round(float(np.percentile(late_ns, 99)) / 1e6, 4),
        "late_max_ms": round(float(late_ns.max()) / 1e6, 4),
        "misses_per_10k": round(misses * 10_000 / max(rec.shape[0], 1), 1),
        "pacer_overruns": int(pacer_stats["overruns"]),
        "rt_scheduling": bool(pacer_stats.get("rt_scheduling", False)),
        # diagnosis aid: where the >5 ms solve spikes landed (tick indices;
        # a fixed spacing implicates a periodic host/tunnel event, not load)
        "spike_ticks": [int(t) for t in rec["tick"][solve_ms > 5.0][:20]],
        "meets_budget_p99": bool(
            np.percentile(solve_ms, 99) < 1e3 / hz
            and np.percentile(late_ns, 99) < 0.1 * period_ns
        ),
    }


def main(argv: Optional[list] = None) -> dict:
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--hz", type=float, default=50.0)
    ap.add_argument("--ticks", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=10_240)
    ap.add_argument("--t", type=int, default=50)
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args(argv)
    out = run_realtime_e2e(hz=args.hz, ticks=args.ticks, K=args.k, T=args.t)
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    return out


if __name__ == "__main__":
    main()


__all__ = ["run_realtime_e2e", "main"]
