"""Windowed nearest-waypoint lookup as a pure, batched op.

The reference implements this as a *stateful* search that mutates the
controller's ``prev_way_point_idx`` from inside the per-(k,t) cost evaluation
(controllers/mppi_differential_drive.py:201-220, called with
``update_prev_idx=True`` from ``_compute_cost`` at :228) — an order-dependent
behavior that cannot (and should not) be parallelized. Here the search window
start is fixed per control tick: every rollout state queries the same
``[start, start+W)`` window, which makes the op pure, vmappable, and shardable.
The tick-level carry (advancing the window as the vehicle progresses) lives in
the solver state instead (see solvers/mppi.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_waypoint(
    ref_path: jnp.ndarray,
    xy: jnp.ndarray,
    start_idx: jnp.ndarray,
    search_len: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find the closest waypoint to each query point within a window.

    Args:
      ref_path: (P, d) waypoint table; columns 0,1 are x,y (d=3 adds yaw,
        d=4 adds speed — mppi_race_car_obstacle.py:173-191).
      xy: (..., 2) query positions (any batch shape).
      start_idx: scalar int window start (the tick-level ``prev_idx``).
      search_len: static window length W (SEARCH_IDX_LEN=20 diff-drive,
        SEARCH_INDEX_LEN=200 race car).

    Returns:
      (idx, ref): idx is (...,) int32 global waypoint indices; ref is (..., d)
      the corresponding waypoint rows.
    """
    P = ref_path.shape[0]
    # A window longer than the path degenerates to a global search (the race-car
    # demo uses SEARCH_INDEX_LEN=200 over a 100-point path).
    search_len = min(search_len, P)
    start = jnp.clip(start_idx, 0, max(P - search_len, 0)).astype(jnp.int32)
    window = jax.lax.dynamic_slice_in_dim(ref_path, start, search_len, axis=0)
    # (..., W) squared distances — one broadcasted FMA, no gather per query.
    d2 = jnp.sum(
        (xy[..., None, :2] - window[..., :, :2]) ** 2,
        axis=-1,
    )
    local = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    idx = local + start
    ref = jnp.take(window, local, axis=0)
    return idx, ref


def nearest_waypoint_carried(
    ref_path: jnp.ndarray,
    xy: jnp.ndarray,
    start_idx: jnp.ndarray,
    search_len: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query-window nearest-waypoint lookup (``waypoint_carry="rollout"``).

    Like :func:`nearest_waypoint` but ``start_idx`` has the batch shape of
    ``xy`` (one window per rollout), so each sample's window can advance
    independently through the scan — the pure form of the reference's
    stateful in-cost search (mppi_differential_drive.py:222-238, which
    mutates ``prev_way_point_idx`` per evaluation). Monotone by construction:
    the window is forward-only from each carried index, exactly like the
    reference's ``[prev, prev+W)`` slice.

    Returns (idx, ref) with idx ≥ start_idx elementwise.
    """
    P = ref_path.shape[0]
    search_len = min(search_len, P)
    # Truncate at the path end like the reference's [prev : prev+W] slice —
    # clipping the START down (as the tick-level op does) would let a carried
    # index near the end regress by up to W−1, breaking the monotone contract.
    # Indices past P−1 gather duplicate last rows; argmin's first-tie rule
    # resolves them to the genuine index, so idx never regresses.
    start = jnp.clip(start_idx, 0, P - 1).astype(jnp.int32)
    offs = jnp.arange(search_len, dtype=jnp.int32)
    gidx = jnp.minimum(start[..., None] + offs, P - 1)  # (..., W)
    rows = jnp.take(ref_path, gidx, axis=0)  # (..., W, d)
    d2 = jnp.sum((xy[..., None, :2] - rows[..., :2]) ** 2, axis=-1)
    local = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    idx = jnp.minimum(start + local, P - 1)
    ref = jnp.take_along_axis(
        rows, local[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return idx, ref


__all__ = ["nearest_waypoint", "nearest_waypoint_carried"]
