"""One-process end-to-end realtime pipeline measurement.

The BASELINE latency metric measured for real: a single process drives

    native RatePacer (absolute deadlines, runtime/src/dmmrt.cpp)
      → flagship MPPI tick (fused Pallas on TPU, XLA scan on CPU)
      → JAX plant step (the AcadosSim/PyBullet role)

for N ticks at a fixed rate, recording per-tick host cost and per-deadline
lateness — not chain slopes (docs/PERF.md's slope estimator deliberately
averages away per-tick tails; this module does the opposite). Replaces the
reference's deployment loop
simulation/bullet_differential_drive_dnn.py:419-467 (read state → solve →
actuate → sleep).

Remote-attach note (docs/PERF.md "tunnel modes"): the loop runs fetch-free,
so the tunnel stays in ASYNC mode — ``block_until_ready`` is a dispatch
ACK, and the tunnel BUFFERS dispatches, executing them on the device in
deferred bursts (measured: 24 ms host dispatch gaps → 0.43 ms device
execution gaps). On-tunnel realtime *device* execution is therefore not
demonstrable from this machine; the artifact decomposes what IS measurable:

* ``ack_p*``/``late_*``/``misses_per_10k`` — the host realtime loop: pacer
  wake-up discipline and per-tick enqueue cost (real);
* ``device_pace`` — a profiler-traced paced segment: every tick executes on
  the device (``device_ticks``), each costing ``device_tick_us`` (~46 µs,
  0.2% of the 50 Hz period) — the device-side budget claim (real);
* ``tunnel_defers_execution`` — flags the burst pattern so nobody reads
  this artifact as an on-tunnel end-to-end realtime demonstration. On
  co-located hardware dispatch→execute is immediate and the same loop is
  realtime with ~400× device margin.

Outputs one JSON-able dict (see ``run_realtime_e2e``), persisted by
``python -m dnn_mppi_mpc_tpu realtime`` and checked in under docs/assets/.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _traced_pace_check(loop, n: int) -> dict:
    """Profile ``n`` paced ticks and read the DEVICE timeline.

    Returns device-side evidence that the control loop executes in real
    time: the number of device executions of the solve program during the
    window and the p50 spacing between their start timestamps (should equal
    the control period). This is the only pace check that works through the
    async tunnel — host-side blocking is an ack, and a fetch would switch
    modes and replay history (docs/PERF.md tunnel modes).
    """
    import collections
    import glob
    import gzip
    import json as _json
    import os as _os
    import tempfile

    import jax

    by_name = collections.defaultdict(lambda: ([], []))  # name -> starts, durs
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            loop.run(n)
        for path in glob.glob(
            _os.path.join(td, "plugins", "profile", "*", "*.trace.json.gz")
        ):
            with gzip.open(path) as fh:
                data = _json.load(fh)
            ev = data.get("traceEvents", [])
            pids = {
                e["pid"]: e["args"].get("name", "")
                for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
            }
            for e in ev:
                if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
                    s, d = by_name[e.get("name", "")]
                    s.append(e["ts"])  # µs
                    d.append(e.get("dur", 0.0))
    # each paced tick dispatches solve + plant; the solve program is the
    # per-tick-frequency event with the largest median duration
    candidates = [
        (float(np.median(d)), name)
        for name, (s, d) in by_name.items()
        if len(s) >= 0.5 * n
    ]
    if not candidates:
        return {
            "expected_ticks": int(n),
            "device_ticks": 0,
            "device_period_p50_ms": None,
            "device_tick_us": None,
        }
    _, solve_name = max(candidates)
    starts, durs = by_name[solve_name]
    starts = np.sort(np.asarray(starts, np.float64))
    gaps_ms = np.diff(starts) / 1e3 if starts.size > 1 else np.asarray([])
    return {
        "expected_ticks": int(n),
        "device_ticks": int(starts.size),
        "device_period_p50_ms": (
            round(float(np.percentile(gaps_ms, 50)), 3) if gaps_ms.size else None
        ),
        "device_tick_us": round(float(np.median(np.asarray(durs))), 1),
    }


def _p99_excluding_stalls(ack_ms: np.ndarray, thresh_ms: float = 5.0):
    """p99 of the per-tick ack with ±2-tick stall neighborhoods removed."""
    stall = np.convolve((ack_ms > thresh_ms).astype(float), np.ones(5), "same") > 0
    keep = ack_ms[~stall]
    return round(float(np.percentile(keep, 99)), 4) if keep.size else None


def run_realtime_e2e(
    hz: float = 50.0,
    ticks: int = 10_000,
    K: int = 10_240,
    T: int = 50,
    seed: int = 0,
    fused_plant: bool = True,
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

    import jax.random as jrandom

    state_holder = [solver.init(jrandom.PRNGKey(seed))]
    x_holder = [jnp.zeros((3,), jnp.float32)]

    def read_state():
        return x_holder[0]

    if fused_plant:
        # Round-5 host-tail cut: solve + plant as ONE AOT-compiled dispatch
        # per tick, with the carried (state, x) buffers DONATED so XLA
        # reuses them in place — removes the second per-tick dispatch
        # (~0.4 ms of tunnel ack), the jit call-cache lookup and the pytree
        # flatten of params on the hot path (params are baked into the
        # compiled executable's signature once).
        # solver._step is the jitted step; wrap it in one jit with donation,
        # then AOT-compile so the per-tick call path is a plain compiled
        # executable invocation.
        def _tick(params_, st_, x_):
            u0, st2, _aux = solver._step(params_, st_, x_, None)
            return u0, st2, step_fn(x_, u0)

        compiled = (
            jax.jit(_tick, donate_argnums=(1, 2))
            .lower(params, state_holder[0], x_holder[0])
            .compile()
        )

        def controller(x):
            u0, st, xn = compiled(params, state_holder[0], x_holder[0])
            state_holder[0] = st
            x_holder[0] = xn
            u0.block_until_ready()  # ack: enqueue + dispatch-ack
            return u0

        def apply_control(u):
            pass  # the plant advanced inside the fused dispatch
    else:
        plant_step = jax.jit(step_fn)

        def controller(x):
            u0, st, _ = solver.step(params, state_holder[0], x)
            state_holder[0] = st
            u0.block_until_ready()  # ack: enqueue + dispatch-ack (tunnel modes)
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
        # Device-pace integrity check WITHOUT a fetch (a fetch flips the
        # tunnel to sync mode and retires the queued history at ~1 RTT/op —
        # it measures history length, not pace): profile a short paced
        # segment and read the DEVICE timeline — every tick must appear as
        # a device execution, spaced at the control period.
        pace = _traced_pace_check(loop, min(200, ticks)) if on_tpu else None
    finally:
        loop.close()

    period_ns = 1e9 / hz
    ack_ms = rec["solve_ns"] / 1e6
    late_ns = rec["late_ns"]
    misses = int(np.sum(late_ns > 0.1 * period_ns))
    # Through the remote-attach tunnel, dispatches are buffered and the
    # device executes them in deferred bursts (measured: host dispatch gaps
    # 24 ms, device execution gaps 0.43 ms) — on-tunnel realtime DEVICE
    # execution is not demonstrable from here. The honest decomposition:
    # all ticks execute (device_ticks == expected), each costs
    # device_tick_us (≪ the period), and the host loop is paced/real-time;
    # on co-located hardware dispatch→execute is immediate, so the loop is
    # realtime with device_tick_us/period of margin.
    all_executed = pace is None or (
        pace["device_ticks"] >= 0.98 * pace["expected_ticks"]
    )
    device_fits = pace is None or (
        pace["device_tick_us"] is not None
        and pace["device_tick_us"] * 1e3 < 0.1 * period_ns
    )
    defers = bool(
        pace is not None
        and pace["device_period_p50_ms"] is not None
        and pace["device_period_p50_ms"] < 0.5 * 1e3 / hz
    )
    return {
        "metric": "realtime_e2e",
        "hz": hz,
        "ticks": int(rec.shape[0]),
        "K": K,
        "T": T,
        "device": str(jax.devices()[0]),
        "solver_path": "pallas_fused_tick" if on_tpu else "xla_scan",
        # host enqueue cost per tick (dispatch ACK — docs/PERF.md tunnel
        # modes; device time per tick is the traced 54.5 µs, ≪ the period)
        "ack_p50_ms": round(float(np.percentile(ack_ms, 50)), 4),
        "ack_p99_ms": round(float(np.percentile(ack_ms, 99)), 4),
        "ack_max_ms": round(float(ack_ms.max()), 4),
        # the same tail with tunnel-stall neighborhoods excluded (every tick
        # within ±2 of a >5 ms ack): the host loop's OWN tail, separated
        # from the remote-attach transport's multi-ms bursts, which a
        # co-located deployment does not have. Both numbers stay in the
        # artifact so neither story hides the other.
        "ack_p99_ex_stall_ms": _p99_excluding_stalls(ack_ms),
        "late_p50_ms": round(float(np.percentile(late_ns, 50)) / 1e6, 4),
        "late_p99_ms": round(float(np.percentile(late_ns, 99)) / 1e6, 4),
        "late_max_ms": round(float(late_ns.max()) / 1e6, 4),
        "misses_per_10k": round(misses * 10_000 / max(rec.shape[0], 1), 1),
        "pacer_overruns": int(pacer_stats["overruns"]),
        "rt_scheduling": bool(pacer_stats.get("rt_scheduling", False)),
        # device-timeline evidence from the traced segment (None on CPU)
        "device_pace": pace,
        "all_ticks_executed": bool(all_executed),
        "device_fits_budget": bool(device_fits),
        "tunnel_defers_execution": defers,
        # diagnosis aid: where the >5 ms ack spikes landed (tick indices;
        # a fixed spacing implicates a periodic host/tunnel event, not load)
        "spike_ticks": [int(t) for t in rec["tick"][ack_ms > 5.0][:20]],
        "meets_budget_p99": bool(
            np.percentile(ack_ms, 99) < 1e3 / hz
            and np.percentile(late_ns, 99) < 0.1 * period_ns
            and all_executed
            and device_fits
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
