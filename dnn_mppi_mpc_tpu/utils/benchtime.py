"""Two-length chained-tick slope estimator — the throughput timing protocol.

The slope cancels all fixed per-call costs: run the full control tick
chained on-device (``lax.scan`` over the tick) at two chain lengths
n1 < n2 and take

    per_tick = (wall(n2) − wall(n1)) / (n2 − n1)

The distribution of per-chain walls gives p50/p99 of the *sustained*
per-tick time.

Runners MUST sync with a device→host **fetch** of a device-side reduction
(``float(jnp.sum(...))``), not bare ``block_until_ready``: in the tunnel's
initial async mode a block is only a dispatch ack (docs/PERF.md "tunnel
modes") and slopes would be meaningless. The first fetch switches the
process to sync mode permanently — true completion waits plus a constant
~30 ms RTT, which the slope cancels. Host dispatch cost is measured
separately in async mode (bench.py ``dispatch_ack_p*``).

This module is the single implementation used by ``bench.py``,
``examples/scaling_run.py`` and ``examples/dnn_mppi.py`` — protocol fixes
(e.g. the slope positivity guard) live here, once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List


@dataclass(frozen=True)
class SlopeTiming:
    """Result of :func:`slope_timing`. All times in seconds."""

    tau: float  # best-wall slope: sustained per-tick time (lower bound)
    p50: float  # median per-tick estimate over the long-chain walls
    p99: float  # tail per-tick estimate (upper-bounds device variation)
    n1: int
    n2: int
    walls_short: List[float]  # sorted per-chain walls at n1
    walls_long: List[float]  # sorted per-chain walls at n2

    @property
    def ticks_per_s(self) -> float:
        return 1.0 / self.tau


def slope_timing(
    make_runner: Callable[[int], Callable[[], None]],
    n1: int,
    n2: int,
    reps: int,
) -> SlopeTiming:
    """Estimate sustained per-tick time from two on-device chain lengths.

    ``make_runner(n)`` must return a zero-argument callable that executes an
    n-tick chain to completion, syncing with a FETCH of a device-side
    reduction of the output (module docstring — a bare block is only an ack
    in the tunnel's async mode). Each runner is invoked once for compile +
    warm-up, then ``reps`` times for timing.
    """
    if not (0 < n1 < n2):
        raise ValueError(f"need 0 < n1 < n2, got n1={n1} n2={n2}")
    run1, run2 = make_runner(n1), make_runner(n2)
    run1()
    run2()

    def wall(run: Callable[[], None]) -> float:
        t0 = time.perf_counter()
        run()
        return time.perf_counter() - t0

    w1 = sorted(wall(run1) for _ in range(reps))
    w2 = sorted(wall(run2) for _ in range(reps))

    # Robust slope from best walls (fixed costs cancel). Guard against
    # jitter making the long chain's best wall undercut the short chain's
    # (possible on noisy hosts at small n): a non-positive slope is noise,
    # floor it so downstream rates stay finite and positive.
    tau = max((w2[0] - w1[0]) / (n2 - n1), 1e-9)
    # Per-chain per-tick estimates with the median fixed overhead C removed.
    overhead = w1[len(w1) // 2] - n1 * tau
    per_tick = sorted(max((w - overhead) / n2, 1e-9) for w in w2)

    def pct(xs: List[float], q: float) -> float:
        return xs[min(len(xs) - 1, int(q * len(xs)))]

    return SlopeTiming(
        tau=tau,
        p50=pct(per_tick, 0.50),
        p99=pct(per_tick, 0.99),
        n1=n1,
        n2=n2,
        walls_short=w1,
        walls_long=w2,
    )


def scan_chain_runner(body, params, st0, x0, n, sync):
    """Build the standard timed runner: n ticks of ``body`` chained on-device.

    ``body(params, state, x) -> ((state, x), y)`` is the per-tick step; this
    helper owns the jit/scan/sync plumbing so every workload gets the two
    invariants exactly once (previously copy-pasted six times — bench.py +
    five benchsuite workloads — and a fix had to touch every copy):

    * ``params`` rides through jit as an ARGUMENT, never a captured closure
      constant (compiling a captured device constant performs a fetch and
      flips the tunnel into sync mode — docs/PERF.md "tunnel modes");
    * ``sync`` is the caller's barrier (a fetch-based one for slope timing).
    """
    import jax

    @jax.jit
    def chain(params, state, x):
        (state, x), ys = jax.lax.scan(
            lambda carry, _: body(params, *carry), (state, x), None, length=n
        )
        return x, ys

    return lambda: sync(*jax.tree.leaves(chain(params, st0, x0)))
