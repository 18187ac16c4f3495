"""Benchmark: MPPI solves/s/chip at K=10 240, T=50 (diff-drive flagship).

Prints ONE JSON line with the driver-defined primary metric (BASELINE.json).
``vs_baseline`` is the ratio of achieved control rate to the 50 Hz real-time
budget (the reference publishes no absolute numbers — BASELINE.md).

Methodology (docs/PERF.md "tunnel modes"): two measurements in two tunnel
modes.

**Phase 1 — dispatch ack** (``dispatch_ack_p*``, async mode, before the
process's first device→host fetch): the host-side cost to enqueue one solve
and receive the ack (~0.1 ms). NOT a completion wait — in async mode
``block_until_ready`` returns at enqueue. This is what a deployment loop's
host pays per tick.

**Phase 2 — device throughput** (the headline solves/s, sync mode): after an
explicit fetch switches the tunnel to synchronous mode (true completion
waits), the **slope** estimator runs the full control tick chained on-device
(``lax.scan`` over ``mppi_step``) at two chain lengths and takes

    per_solve = (wall(n2) − wall(n1)) / (n2 − n1)

which cancels the constant tunnel RTT and measures real sustained device
throughput (validated against the checked-in profiler trace: slope ~40–48 µs
vs 54.5 µs single-shot program span).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from dnn_mppi_mpc_tpu.utils.platform import (
    enable_compilation_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu smoke must not dial the TPU
# Persist XLA executables across runs: the flagship program's first compile
# through the remote-attach tunnel costs minutes; a warm re-run skips it
# entirely. Timing is unaffected (slope estimator warms up first).
enable_compilation_cache()


def _sync(*arrays) -> None:
    """Trustworthy barrier: device-side reduce + host fetch of one scalar.

    The remote-attach tunnel has two modes (docs/PERF.md "tunnel modes",
    round-4 bisection): before the process's first device→host data fetch,
    ``block_until_ready`` is only a dispatch ACK (a 250-tick chain "blocks"
    in 0.2 ms); after one fetch the tunnel switches to synchronous mode
    permanently and blocks are true completion waits (+ up to one ~30 ms
    RTT). A fetch is therefore BOTH the only true barrier and a deliberate
    one-way switch — `_poison()` flips it explicitly before any slope
    timing, and the slope cancels the constant RTT.
    """
    total = sum(jnp.sum(a) for a in arrays)
    float(total)


def _poison() -> None:
    """Explicitly switch the tunnel to synchronous mode (docs/PERF.md).

    Must run BEFORE any slope timing (true completion waits) and AFTER the
    dispatch-ack measurement (which needs the initial async mode).
    """
    import numpy as _np

    _np.asarray(jnp.zeros((1,)) + 1.0)


def _make_runner(solver, params, st0, x0, n):
    """n control ticks chained on-device, via the one shared chain builder
    (utils/benchtime.scan_chain_runner — params rides through jit as an
    argument; the sync is the fetch barrier `_sync`)."""
    from dnn_mppi_mpc_tpu.utils.benchtime import scan_chain_runner

    step_fn = solver.dynamics_step
    core = solver._step

    def body(params, state, x):
        u0, state, aux = core(params, state, x, None)
        return (state, step_fn(x, u0)), aux.costs[0]

    return scan_chain_runner(body, params, st0, x0, n, _sync)


def _bench_tick_kwargs(K: int, T: int, on_tpu: bool) -> dict:
    """Fastest validated tick config for the flagship rows (round 5).

    Single-block shapes get the lean kernel (auto via fuse_epilogue) plus
    the lane-anchor fold and the 3-word popcount Gaussian — all
    parity-gated on hardware in tests/test_lean_tick.py. The K-blocked
    kernel (pod-scale K) takes neither knob."""
    from dnn_mppi_mpc_tpu.solvers.mppi import (
        _EPS_BYTES_PER_SAMPLE_STEP,
        _SINGLE_BLOCK_VMEM_BUDGET,
    )

    blocked = _EPS_BYTES_PER_SAMPLE_STEP * T * K > _SINGLE_BLOCK_VMEM_BUDGET
    if on_tpu and not blocked:
        return dict(fold_anchor=True, gaussian="popcount3")
    return {}


def _measure_k(K: int, T: int, on_tpu: bool, reps: int):
    """Slope-time the flagship tick at one K; returns a result row dict."""
    from __graft_entry__ import _flagship
    from dnn_mppi_mpc_tpu.solvers.mppi import MPPISolver
    from dnn_mppi_mpc_tpu.utils.benchtime import slope_timing

    cfg, params, step_fn, stage, terminal = _flagship(K, T)
    solver = MPPISolver(
        cfg, step_fn, stage, terminal, use_pallas=False, fused_tick=on_tpu,
        iso_xy=True, **_bench_tick_kwargs(K, T, on_tpu),
    )
    st0 = solver.init()
    x0 = jnp.zeros((3,), jnp.float32)

    def make_runner(n):
        return _make_runner(solver, params, st0, x0, n)

    # keep the measured device-time delta well above tunnel jitter at every
    # K: ~0.05 ms/solve at K=10k scales ≈ linearly with K
    per_solve_guess_ms = 0.05 * K / 10240
    n2 = max(40, min(1000, int(100.0 / per_solve_guess_ms)))
    n1 = max(8, n2 // 5)
    t = slope_timing(make_runner, n1, n2, reps=reps)
    # label from the SAME constants MPPISolver's kernel selector uses —
    # a duplicated threshold here mislabeled rows for K·T in (13107, 25000]·50
    from dnn_mppi_mpc_tpu.solvers.mppi import (
        _EPS_BYTES_PER_SAMPLE_STEP,
        _SINGLE_BLOCK_VMEM_BUDGET,
    )

    blocked = _EPS_BYTES_PER_SAMPLE_STEP * T * K > _SINGLE_BLOCK_VMEM_BUDGET
    return {
        "K": K,
        "T": T,
        "solves_per_s": round(t.ticks_per_s, 1),
        "per_solve_ms_best": round(t.tau * 1e3, 4),
        "p50_ms": round(t.p50 * 1e3, 4),
        "p99_ms": round(t.p99 * 1e3, 4),
        "sample_steps_per_s": round(t.ticks_per_s * K * T, 0),
        "kernel": ("blocked" if blocked else "single_block") if on_tpu else "xla_scan",
        "chain_lengths": [n1, n2],
    }


def _run_sweep(ks, T: int) -> None:
    """Measure the flagship tick across K and record the scaling curve.

    One process, one device: each K compiles its own fused tick (the blocked
    kernel past ~K=25k at T=50) and is slope-timed like the headline number.
    Artifact: docs/assets/bench_k_sweep.json (device, rows per K).
    """
    import os

    on_tpu = jax.devices()[0].platform != "cpu"
    rows = []
    for requested in ks:
        K = requested if on_tpu else min(requested, 2048)
        row = _measure_k(K, T, on_tpu, reps=10 if on_tpu else 3)
        if K != requested:  # CPU smoke clamp must not read as measured data
            row["requested_K"] = requested
            row["cpu_smoke_clamped"] = True
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {
        "device": str(jax.devices()[0]),
        "pallas_fused_tick": on_tpu,
        "horizon": T,
        "rows": rows,
        "sync": "two-length on-device chains, slope estimator (docs/PERF.md)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "assets", "bench_k_sweep.json")
    if on_tpu:  # CPU smoke must not overwrite the recorded chip curve
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"# wrote {path}")


def main() -> None:
    import argparse

    from __graft_entry__ import _flagship
    from dnn_mppi_mpc_tpu.solvers.mppi import MPPISolver
    from dnn_mppi_mpc_tpu.utils.benchtime import slope_timing

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--k", type=int, default=10240,
        help="rollout count (pod-scale K≥~25k routes to the K-blocked fused "
        "tick with per-block on-chip ε, e.g. --k 102400)",
    )
    ap.add_argument("--t", type=int, default=50, help="horizon")
    ap.add_argument(
        "--sweep", default=None,
        help="comma-separated K list; measures each and writes the scaling "
        "curve to docs/assets/bench_k_sweep.json (default single-K contract "
        "— ONE JSON line — is unchanged when omitted)",
    )
    ap.add_argument(
        "--suite", nargs="?", const="all", default=None,
        help="measure every docs/PERF.md headline row in one session (one "
        "JSON line per row; artifact docs/assets/bench_suite_r4.json). "
        "Optionally a comma-separated subset, e.g. --suite racecar,nmpc_rti "
        "(subsets print rows but do not write the artifact)",
    )
    ap.add_argument(
        "--reps", type=int, default=None,
        help="timing repetitions per suite row (default 10 on TPU, 3 on CPU)",
    )
    args = ap.parse_args()

    if args.suite:
        from dnn_mppi_mpc_tpu.utils.benchsuite import run_suite

        rows = None if args.suite == "all" else tuple(args.suite.split(","))
        run_suite(rows=rows, reps=args.reps)
        return

    if args.sweep:
        _run_sweep([int(s) for s in args.sweep.split(",")], args.t)
        return

    K, T = args.k, args.t
    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        K = min(K, 1024)  # CPU smoke: same code path, tractable size

    cfg, params, step_fn, stage, terminal = _flagship(K, T)
    solver = MPPISolver(
        cfg, step_fn, stage, terminal, use_pallas=False, fused_tick=on_tpu,
        # the flagship tracking weights are x/y-symmetric ((5, 5, 10) —
        # the reference's own defaults), so the exact iso_xy kernel
        # specialization applies (parity: tests/test_mppi_tick.py)
        iso_xy=True, **_bench_tick_kwargs(K, T, on_tpu),
    )
    st0 = solver.init()
    x0 = jnp.zeros((3,), jnp.float32)

    # Phase 1 (async tunnel mode, BEFORE any fetch): per-call dispatch-ack —
    # the host-side cost a deployment loop pays per tick to enqueue + get
    # the ack. NOT a completion wait (docs/PERF.md "tunnel modes"); the
    # device-side per-solve time is the slope below and the checked-in
    # profiler trace (54.5 µs/solve program span).
    import time as _time

    def one_call():
        u0, _st, _aux = solver.step(params, st0, x0)
        jax.block_until_ready(u0)

    one_call()
    call_ts = []
    for _ in range(200 if on_tpu else 20):
        t0 = _time.perf_counter()
        one_call()
        call_ts.append(_time.perf_counter() - t0)
    call_ts = np.asarray(call_ts)

    # Phase 2 (sync tunnel mode): true-completion slope throughput.
    _poison()

    def make_runner(n):
        return _make_runner(solver, params, st0, x0, n)

    # Chain lengths sized so the n2−n1 device-time delta (≈50 ms at the
    # flagship rate) clearly dominates the constant tunnel RTT — at
    # (40, 200) the 10 ms delta made the slope estimate noisy (round 3).
    n1, n2 = (200, 1000) if on_tpu else (4, 12)
    timing = slope_timing(make_runner, n1, n2, reps=20 if on_tpu else 5)
    tau, p50, p99 = timing.tau, timing.p50, timing.p99
    solves_per_s = timing.ticks_per_s

    budget_hz = 50.0
    # The metric id names the measured configuration; the CPU smoke path
    # measures a smaller scan-path problem and must not report under a TPU
    # name (round-2 review finding).
    metric = (
        f"mppi_solves_per_s_per_chip_K{K}_T{T}_diffdrive"
        if on_tpu
        else f"mppi_solves_per_s_cpu_smoke_K{K}_T{T}_diffdrive"
    )
    result = {
        "metric": metric,
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / budget_hz, 3),
        "per_solve_ms_best": round(tau * 1e3, 4),
        "p50_ms": round(p50 * 1e3, 4),
        "p99_ms": round(p99 * 1e3, 4),
        "dispatch_ack_p50_ms": round(float(np.percentile(call_ts, 50)) * 1e3, 4),
        "dispatch_ack_p99_ms": round(float(np.percentile(call_ts, 99)) * 1e3, 4),
        "meets_50hz_budget": bool(
            p99 < 1.0 / budget_hz
            and np.percentile(call_ts, 99) < 1.0 / budget_hz
        ),
        "K": K,
        "pallas_fused_tick": bool(on_tpu),
        "device": str(jax.devices()[0]),
        "sync": "slope estimator (sync tunnel mode) for device throughput; "
        "dispatch_ack_p* = per-call host enqueue cost (async mode); see "
        "docs/PERF.md tunnel modes",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
