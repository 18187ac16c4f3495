"""Headless trajectory / control plots (Agg backend, PNG artifacts).

Covers the visualization surface of the reference without its blocking
FuncAnimation windows: trajectory overview with sampled-rollout fans
(controllers/mppi_differential_drive.py:291-372), control-signal panels
(controllers/mppi_race_car_obstacle.py:301-321), state/error panels
(controllers/mpc_differential_dynamics.py:317-391), and training curves
(train/train_diff_mlp.py:139-159).
"""

from __future__ import annotations

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_trajectory(
    path: str,
    states: np.ndarray,
    ref_path: Optional[np.ndarray] = None,
    sampled_trajs: Optional[np.ndarray] = None,
    optimal_traj: Optional[np.ndarray] = None,
    obstacles: Optional[np.ndarray] = None,
    title: str = "trajectory",
) -> None:
    """Top-down view: driven path, reference, sampled fan, obstacles."""
    fig, ax = plt.subplots(figsize=(7, 7))
    if sampled_trajs is not None:
        for i, tr in enumerate(np.asarray(sampled_trajs)):
            alpha = max(0.05, 0.35 * (1.0 - i / max(1, len(sampled_trajs))))
            ax.plot(tr[:, 0], tr[:, 1], color="gray", lw=0.3, alpha=alpha, zorder=2)
    if ref_path is not None:
        ref_path = np.asarray(ref_path)
        ax.plot(ref_path[:, 0], ref_path[:, 1], "b--", lw=1.0, label="reference", zorder=3)
    if optimal_traj is not None:
        optimal_traj = np.asarray(optimal_traj)
        ax.plot(optimal_traj[:, 0], optimal_traj[:, 1], color="#990099", lw=1.5, label="planned", zorder=4)
    states = np.asarray(states)
    ax.plot(states[:, 0], states[:, 1], "g-", lw=1.5, label="driven", zorder=5)
    if states.shape[1] >= 3:
        draw_robot(ax, states[-1, 0], states[-1, 1], states[-1, 2])
    if obstacles is not None:
        for ox, oy, r in np.asarray(obstacles):
            ax.add_patch(plt.Circle((ox, oy), r, color="red", alpha=0.4, zorder=1))
    ax.set_xlabel("x [m]"), ax.set_ylabel("y [m]")
    ax.set_title(title), ax.axis("equal"), ax.grid(True), ax.legend()
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def draw_robot(ax, x: float, y: float, yaw: float, body_l: float = 0.6, body_w: float = 0.4) -> None:
    """Body + four wheels footprint at a pose — the headless equivalent of the
    DifferentialSimulation renderer (models/differentialSim.py:5-75)."""
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s], [s, c]])

    def poly(cx, cy, L, W):
        pts = np.array(
            [[-L / 2, -W / 2], [L / 2, -W / 2], [L / 2, W / 2], [-L / 2, W / 2]]
        )
        pts = pts @ R.T + np.array([cx, cy])
        return plt.Polygon(pts, closed=True, fill=False, ec="k", lw=1.0, zorder=6)

    ax.add_patch(poly(x, y, body_l, body_w))
    wl, ww = body_l * 0.35, body_w * 0.18
    for dx, dy in [
        (body_l * 0.3, body_w * 0.55),
        (body_l * 0.3, -body_w * 0.55),
        (-body_l * 0.3, body_w * 0.55),
        (-body_l * 0.3, -body_w * 0.55),
    ]:
        wx, wy = np.array([dx, dy]) @ R.T + np.array([x, y])
        ax.add_patch(poly(wx, wy, wl, ww))
    ax.plot(
        [x, x + 0.5 * body_l * c], [y, y + 0.5 * body_l * s], "k-", lw=1.2, zorder=6
    )


def plot_controls(
    path: str, controls: np.ndarray, dt: float, labels: Optional[Sequence[str]] = None
) -> None:
    """Per-channel control signals over time (mppi_race_car_obstacle.py:301-321)."""
    controls = np.asarray(controls)
    nu = controls.shape[1]
    t = np.arange(controls.shape[0]) * dt
    fig, axes = plt.subplots(1, nu, figsize=(5 * nu, 4))
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        ax.plot(t, controls[:, i], lw=2)
        ax.set_xlabel("time [s]")
        ax.set_ylabel(labels[i] if labels else f"u{i}")
        ax.grid(True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_training_curves(path: str, history: dict) -> None:
    """Loss/MAE curves (train/train_diff_mlp.py:139-159)."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for key in ("train_mse", "val_mse"):
        if key in history:
            axes[0].plot(history[key], label=key)
    for key in ("train_mae", "val_mae"):
        if key in history:
            axes[1].plot(history[key], label=key)
    for ax, t in zip(axes, ("MSE", "MAE")):
        ax.set_xlabel("epoch"), ax.set_ylabel(t), ax.grid(True), ax.legend()
        ax.set_yscale("log")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_animation(
    path: str,
    states: np.ndarray,
    ref_path: Optional[np.ndarray] = None,
    planned_trajs: Optional[np.ndarray] = None,
    obstacles: Optional[np.ndarray] = None,
    obstacle_trajs: Optional[np.ndarray] = None,
    fps: int = 10,
    stride: int = 1,
    title: str = "closed loop",
) -> None:
    """Animated closed-loop artifact — the reference's primary verification
    output (FuncAnimation drivers at controllers/mppi_differential_drive.py:
    291-372 and the 4-pane models/vehicle.py:45-83,247+), re-done headless.

    Per frame: driven path so far, robot footprint at the current pose, the
    tick's planned trajectory (``planned_trajs`` (n_ticks, T, ≥2)), and
    obstacles — static ``obstacles`` (n, 3) or per-tick ``obstacle_trajs``
    (n_ticks, n, 3) for moving-obstacle runs. Writes .gif via Pillow (this
    image has no ffmpeg; pass an .mp4 path on machines that do).
    """
    from matplotlib.animation import FuncAnimation, PillowWriter, FFMpegWriter

    states = np.asarray(states)
    frames = range(1, states.shape[0] + 1, stride)
    fig, ax = plt.subplots(figsize=(7, 7))

    pts = [states[:, :2]]
    if ref_path is not None:
        pts.append(np.asarray(ref_path)[:, :2])
    allp = np.concatenate(pts, axis=0)
    pad = 1.0
    xlim = (allp[:, 0].min() - pad, allp[:, 0].max() + pad)
    ylim = (allp[:, 1].min() - pad, allp[:, 1].max() + pad)

    def draw(i):
        ax.clear()
        ax.set_xlim(*xlim), ax.set_ylim(*ylim)
        ax.set_aspect("equal"), ax.grid(True, alpha=0.3)
        ax.set_title(f"{title} — tick {i}")
        if ref_path is not None:
            rp = np.asarray(ref_path)
            ax.plot(rp[:, 0], rp[:, 1], "b--", lw=1.0, zorder=3)
        obs_now = None
        if obstacle_trajs is not None:
            obs_now = np.asarray(obstacle_trajs)[min(i - 1, len(obstacle_trajs) - 1)]
        elif obstacles is not None:
            obs_now = np.asarray(obstacles)
        if obs_now is not None:
            for ox, oy, r in obs_now:
                ax.add_patch(plt.Circle((ox, oy), r, color="red", alpha=0.4, zorder=1))
        if planned_trajs is not None and i - 1 < len(planned_trajs):
            tr = np.asarray(planned_trajs)[i - 1]
            ax.plot(tr[:, 0], tr[:, 1], color="#990099", lw=1.5, zorder=4)
        ax.plot(states[:i, 0], states[:i, 1], "g-", lw=1.5, zorder=5)
        if states.shape[1] >= 3:
            draw_robot(ax, states[i - 1, 0], states[i - 1, 1], states[i - 1, 2])

    anim = FuncAnimation(fig, draw, frames=frames)
    writer = (
        FFMpegWriter(fps=fps) if path.endswith(".mp4") else PillowWriter(fps=fps)
    )
    anim.save(path, writer=writer)
    plt.close(fig)


__all__ = [
    "plot_trajectory",
    "draw_robot",
    "plot_controls",
    "plot_training_curves",
    "save_animation",
]
