"""Profiling and roofline accounting (first-class, per SURVEY §5.1).

The reference's only instrumentation is wall-clock deltas around solver calls
(controllers/mpc_mlp_differential_drive.py:173-189). Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory.
* :class:`Timer` — blocking wall-clock timer with p50/p90/p99 percentiles,
  the Hz/ms reporting of the reference's harnesses done properly.
* :func:`mppi_roofline` — analytic FLOP/byte model of the fused rollout kernel
  to judge distance from the HBM/VPU roofline on a given chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace('/tmp/tb'): run()`` → profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Latency collector with percentile reporting.

    >>> t = Timer()
    >>> for _ in range(100):
    ...     with t:
    ...         jax.block_until_ready(step(...))
    >>> t.summary()  # {'p50_ms': ..., 'p99_ms': ..., 'hz': ...}
    """

    def __init__(self) -> None:
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.samples.append(time.perf_counter() - self._t0)

    def percentile(self, q: float) -> float:
        s = sorted(self.samples)
        return s[min(len(s) - 1, int(len(s) * q))]

    def summary(self) -> dict:
        if not self.samples:
            return {}
        p50 = self.percentile(0.5)
        return {
            "n": len(self.samples),
            "p50_ms": p50 * 1e3,
            "p90_ms": self.percentile(0.9) * 1e3,
            "p99_ms": self.percentile(0.99) * 1e3,
            "mean_ms": sum(self.samples) / len(self.samples) * 1e3,
            "hz": 1.0 / p50,
        }


def time_fn(fn: Callable, *args, iters: int = 50, warmup: int = 2) -> dict:
    """Benchmark a jitted function with full blocking; returns Timer summary."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t = Timer()
    for _ in range(iters):
        with t:
            jax.block_until_ready(fn(*args))
    return t.summary()


def mppi_roofline(
    K: int,
    T: int,
    W: int,
    dim_u: int = 2,
    n_obs: int = 0,
    hbm_gbps: float = 820.0,  # v5e HBM bandwidth
    vpu_gflops: float = 3900.0,  # v5e f32 VPU throughput (approx)
) -> dict:
    """Analytic cost model of the fused rollout (ops/pallas/rollout.py).

    Per (sample, step): ~10 dynamics/clamp flops + ~10·W window-search flops +
    ~8·n_obs obstacle flops. HBM traffic: ε in (K·T·dim_u·4 B) + S out (K·4 B).
    Returns minimum achievable time on each roofline axis.
    """
    flops = K * T * (10 + 10 * W + 8 * n_obs)
    bytes_moved = K * T * dim_u * 4 + K * 4
    t_compute = flops / (vpu_gflops * 1e9)
    t_memory = bytes_moved / (hbm_gbps * 1e9)
    return {
        "flops": flops,
        "bytes": bytes_moved,
        "t_compute_us": t_compute * 1e6,
        "t_memory_us": t_memory * 1e6,
        "bound": "compute" if t_compute > t_memory else "memory",
        "arithmetic_intensity": flops / bytes_moved,
    }


__all__ = ["trace", "Timer", "time_fn", "mppi_roofline"]
